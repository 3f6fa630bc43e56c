"""Inverted index + exact-integer BM25-shaped retrieval.

Corpus pipelines need lexical search as much as embedding ANN
(similarity.py): quality-classifier seed mining, contamination triage,
"find the docs about X" audits. The classic engine shape — inverted
index, per-term document frequency, tf-saturated scoring, top-k per
query — maps 1:1 onto DataFrame ops:

* :func:`build_postings` — the inverted index AS a relation:
  (term, id, tf, dl). Spark's hash partitioning on the groupBy key IS
  the index's term-sharding; persisting the postings bucketed by term
  makes every later retrieval a co-located join.
* :func:`doc_frequencies` — (term, df) from the postings.
* :func:`retrieve_topk` — BM25-shaped scoring, exact integers:

    contribution_micro(t, d) =
        idf_int(t) * (22000·tf) DIV (10000·tf + 3000 + 9·dlnorm_milli)

  where ``dlnorm_milli = (1000·dl·N) DIV S`` (document length over mean
  length, milli-units; S = total tokens, N = doc count) — this is
  BM25's tf-saturation term with k1 = 1.2, b = 0.75 expressed as the
  exact rational 22000·tf / (10000·tf + 3000 + 9·dlnorm_milli), and
  ``idf_int(t) = (N · 1000) DIV df(t)`` — a LINEAR idf surrogate
  (log-free: libm ulps can't cross engines; monotone in 1/df, so rare
  terms still dominate). Floor points are part of the contract, bit
  reproducible in any engine.

Scale shape: postings are one explode + two-level count (the
top_token_fraction path — map-side partials, (id, term, count) rows
only); the query side is tiny and BROADCAST into the postings join, so
the corpus is scored without moving; the only wide shuffle is the
(query_id, id) score aggregation, and top-k per query is the salted
two-phase pattern's little sibling (queries are many, so the plain
window partitions fine — a single mega-query would use
politeness.py's salted top-K instead). int64 headroom: contributions
are ≤ idf_int · 2200 ≤ N·2.2e6/df — overflow-safe while N/df < 4e12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlspark.operators.textops import words_of


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The inverted index as a relation: (term, id, tf, dl) — one row
    per distinct (doc, term), dl = the doc's total token count carried
    on every posting so scoring never re-joins a doc-stats table."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(words_of(F.col(text_col))).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("dl", F.sum("tf").over(Window.partitionBy("id")))
    )


def doc_frequencies(postings: DataFrame) -> DataFrame:
    """(term, df): how many docs contain each term."""
    return postings.groupBy("term").agg(F.count("*").alias("df"))


def retrieve_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    materialize: bool = True,
) -> DataFrame:
    """Top-``k`` docs per query under the exact-integer BM25-shaped
    score (module docstring): ``(query_id, rank, id, score_micro)``.
    Repeated query terms count once (set semantics, the common engine
    default); ties broken by doc id ascending for determinism.

    Scoring only ever reads postings whose term occurs in some query,
    so the index is built FILTERED: corpus words explode into the
    (id, term, tf) aggregate only after a broadcast semi-join against
    the distinct query-term set — the corpus-wide posting rows for
    non-query terms (the overwhelming majority) are never aggregated,
    shuffled, or checkpointed (guide §2.3 "shuffle fewer bytes" /
    §3.2 pre-filter-the-big-side). The corpus-wide constants the score
    needs (n_docs, s_tokens, per-doc dl) don't need the explode at
    all: dl = size of the row's non-empty token array, n_docs/s_tokens
    one aggregate over those per-row sizes — this also removes the
    dl window (one full extra shuffle+sort of the postings in the old
    shape). Results are identical to scoring against the full index:
    df/tf/dl/n_docs/s_tokens values are unchanged for every surviving
    (query term, doc) pair.

    ``materialize`` localCheckpoints the FILTERED postings (two
    consumers: doc frequencies and scoring — without the barrier
    Catalyst re-runs the explode per consumer). Callers that already
    persist a bucketed full postings table should score against that
    instead."""
    # identical query texts produce identical scores and identical
    # top-k (ties break on doc id, not query id) — score once per
    # DISTINCT qtext and fan the result back out. Real query logs are
    # heavy-tailed (a handful of texts dominate), so this cuts the
    # (query x doc) score expansion by the duplication factor exactly.
    qmap = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_text_col).alias("__qtext"),
    ).localCheckpoint(eager=True)  # tiny; consumed by reps + fan-out join
    reps = qmap.groupBy("__qtext").agg(F.min("query_id").alias("__rep"))
    qterms = (
        reps.select(
            F.col("__rep").alias("query_id"),
            F.explode(words_of(F.col("__qtext"))).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
        .localCheckpoint(eager=True)  # tiny; 3 consumers below
    )
    terms = qterms.select("term").distinct()
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.filter(words_of(F.col(text_col)), lambda w: w != "").alias("__w"),
    )
    # corpus constants from per-row token counts — no explode, no window
    stats = toks.select(F.size("__w").alias("__dl")).agg(
        F.count(F.when(F.col("__dl") > 0, 1)).alias("n_docs"),
        F.sum("__dl").cast("long").alias("s_tokens"),
    )
    postings = (
        toks.select("id", F.size("__w").alias("dl"), F.explode("__w").alias("term"))
        .join(F.broadcast(terms), "term", "left_semi")
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"), F.min("dl").alias("dl"))
    )
    if materialize:
        postings = postings.localCheckpoint(eager=True)
    # df over the whole corpus for query terms == df from the filtered
    # postings (they hold every (id, term) pair for those terms)
    dfreq = doc_frequencies(postings)
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "id",
            # all-DIV chain: every floor point is the documented contract
            F.expr(
                "(n_docs * 1000 DIV df)"
                " * (22000 * tf)"
                " DIV (10000 * tf + 3000 + 9 * ((1000 * dl * n_docs) DIV s_tokens))"
            ).cast("long").alias("c"),
        )
        # one exchange serves both the score aggregation and the top-k
        # window: hash-partitioning by query_id alone satisfies the
        # (query_id, id) grouping (subset rule) AND the window's
        # partitioning, so the candidate expansion crosses the wire
        # once instead of twice (guide §2.4 "share one exchange")
        .repartition(F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(F.sum("c").cast("long").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("id")
    )
    rep_top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumnRenamed("query_id", "__rep")
    )
    # fan the per-distinct-qtext results back out to every query id
    return (
        qmap.join(F.broadcast(reps), "__qtext")
        .join(rep_top, "__rep")
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("id").alias(id_col),
            "score_micro",
        )
    )


def retrieve_topk_sql(
    queries_cte: str,
    k: int = 5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`retrieve_topk`; ``queries_cte`` is a CTE
    body producing (query_id, qtext)."""
    return f"""
      WITH q AS ({queries_cte}),
      postings AS (
        SELECT id, term, count(*) AS tf FROM (
          SELECT {id_col} AS id, unnest(string_split({text_col}, ' ')) AS term
          FROM {table})
        WHERE term <> '' GROUP BY id, term),
      withdl AS (
        SELECT *, sum(tf) OVER (PARTITION BY id) AS dl FROM postings),
      stats AS (
        SELECT count(DISTINCT id) AS n_docs, sum(tf) AS s_tokens FROM postings),
      dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
      qterms AS (
        SELECT DISTINCT query_id, u.term
        FROM q, LATERAL unnest(string_split(qtext, ' ')) AS u(term)
        WHERE u.term <> ''),
      scored AS (
        SELECT qt.query_id, p.id,
               sum((s.n_docs * 1000 // d.df)
                   * (22000 * p.tf)
                   // (10000 * p.tf + 3000
                       + 9 * ((1000 * p.dl * s.n_docs) // s.s_tokens))) AS score
        FROM withdl p
        JOIN qterms qt ON qt.term = p.term
        JOIN dfreq d ON d.term = p.term
        CROSS JOIN stats s
        GROUP BY qt.query_id, p.id),
      ranked AS (
        SELECT query_id, id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, id AS {id_col},
             CAST(score AS BIGINT) AS score_micro
      FROM ranked WHERE rank <= {k}
    """
