"""Corpus language-model filtering signals on exact integer arithmetic.

The CCNet / RedPajama pipelines filter web text by perplexity under a
reference-corpus LM. A float perplexity cannot be compared exactly
across engines (libm log ulps), so this module exposes the integer
backbone of the same signal instead:

* :func:`bigram_counts` — the "LM": token-bigram occurrence counts over
  a reference corpus (two shuffles: one explode + hash-agg).
* :func:`oov_bigram_share` — per document, how many of its bigrams the
  reference LM has never seen; ``oov_micro`` (share × 1e6, integer
  division) is the micro-unit convention used repo-wide. High OOV share
  = text unlike the reference corpus — gibberish, boilerplate soup,
  wrong language — the same ordering a smoothed-LM perplexity gives at
  the quality-filter operating point, minus the float.
* :func:`ccnet_buckets` — CCNet's per-language head/middle/tail cut
  (Wenzek et al. 2020 §4.3): within each language, rank documents by
  the quality score and split into thirds by exact integer rank
  comparison (rank*3 <= n). CCNet keeps head (+middle) for training;
  the bucket column is the standard corpus-quality stratification.

Scale: counts are (word, word, n) — tiny vs the corpus (vocab², capped
by corpus bigram volume); the scoring join is a LEFT equi-join of the
doc-bigram explode against it (broadcast when the reference vocabulary
is small, shuffle hash otherwise — Spark picks by size). Everything is
built-in expressions; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlspark.operators.textops import words_of


def _bigrams_of(w: Column) -> Column:
    """Array of "w1 w2" bigram strings from a STAGED token-array column
    reference; docs with <2 tokens yield []. The caller must project
    ``words_of(text)`` into its own column first: a lambda closing over
    the raw split() subtree re-evaluates it per element (the repo's HOF
    gotcha — O(tokens²) per doc), while a staged reference used >= 2
    times here survives CollapseProject and splits once per row."""
    return F.when(F.size(w) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
        )
    )


def bigram_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Token-bigram counts over a reference corpus → (bigram, n). The
    training half of the quality filter; persist/broadcast the result
    and reuse it across scoring runs."""
    # explode_OUTER: plain explode triggers InferFiltersFromGenerate,
    # cloning the bigram battery into a size()>0 pre-filter (2x cost);
    # the cheap null filter below replaces it (sitemaps.py pattern)
    return (
        docs.select(words_of(text_col).alias("__w"))
        .select(F.explode_outer(_bigrams_of(F.col("__w"))).alias("bigram"))
        .where(F.col("bigram").isNotNull())
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, bigram)`` — one row per bigram occurrence, plus one
    NULL-bigram row for docs with < 2 tokens (explode_outer, so every
    doc stays representable downstream). The shared gram relation:
    callers composing a reference fit AND a scoring pass over the same
    corpus should build this once (and localCheckpoint it) instead of
    paying the explode per consumer."""
    return docs.select(
        F.col(id_col).alias("id"), words_of(text_col).alias("__w")
    ).select("id", F.explode_outer(_bigrams_of(F.col("__w"))).alias("bigram"))


def oov_bigram_share(
    docs: DataFrame,
    ref_counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ref_count: int = 1,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Per-document out-of-vocabulary bigram share vs a reference LM:
    ``(id, n_bigrams, n_oov, oov_micro)`` where ``oov_micro =
    n_oov * 1_000_000 / n_bigrams`` (integer division; 0-token and
    1-token docs score 0 OOV over 0 bigrams → oov_micro NULL so the
    caller can't mistake "no evidence" for "perfect"). A bigram is
    in-vocabulary when the reference saw it >= ``min_ref_count`` times
    (raise to ignore reference hapaxes). Pass a pre-built (and ideally
    checkpointed) ``grams`` relation (:func:`doc_bigrams`) to share the
    corpus explode with other consumers (e.g. the reference fit)."""
    if grams is None:
        grams = doc_bigrams(docs, id_col, text_col)
    ref = ref_counts.where(F.col("n") >= min_ref_count).select(
        "bigram", F.lit(True).alias("__in_ref")
    )
    scored = grams.join(ref, "bigram", "left")
    return (
        scored.groupBy("id")
        .agg(
            F.count("bigram").alias("n_bigrams"),
            F.sum(
                F.when(
                    F.col("bigram").isNotNull() & F.col("__in_ref").isNull(), 1
                ).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("n_oov").cast("long").alias("n_oov"),
            # `div` = exact integer division (DuckDB twin: `//`) — a
            # double divide + cast can differ in the last unit at large
            # counts
            F.when(
                F.col("n_bigrams") > 0,
                F.expr("(n_oov * 1000000) div n_bigrams"),
            )
            .cast("long")
            .alias("oov_micro"),
        )
    )


def ccnet_buckets(
    scored: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    score_col: str = "oov_micro",
) -> DataFrame:
    """CCNet-style per-language quality stratification: rank documents
    within each language by ``score_col`` ascending (lower = better,
    matching oov_micro / perplexity polarity; ties broken by id for
    determinism) and cut into exact thirds — ``(id, lang, score,
    lang_rank, lang_n, bucket)`` with bucket head/middle/tail decided by
    integer comparison (rank*3 <= n → head; rank*3 <= 2n → middle).
    NULL scores ("no evidence" docs — see oov_bigram_share) get a NULL
    bucket and consume no rank, so they can't dilute the thirds.

    One window shuffle on the language key. Language cardinality is
    tiny vs the corpus, so at 100 TB the per-lang partitions are huge
    but uniform-ish; if one language dominates (it does — English), the
    rank is a global sort WITHIN that partition — the same
    single-key-window consideration as ordering.py's deterministic
    total order, and the standard fix (range-partition by score within
    lang) preserves these exact semantics because rank is a pure
    function of (score, id) order."""
    from pyspark.sql import Window

    w = Window.partitionBy(lang_col)
    wo = w.orderBy(F.asc_nulls_last(score_col), F.asc(id_col))
    ranked = scored.select(
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("lang"),
        F.col(score_col).cast("long").alias("score"),
        F.row_number().over(wo).alias("lang_rank"),
        F.count(score_col).over(w).alias("lang_n"),
    )
    bucket = (
        F.when(F.col("score").isNull(), F.lit(None).cast("string"))
        .when(F.col("lang_rank") * 3 <= F.col("lang_n"), "head")
        .when(F.col("lang_rank") * 3 <= F.col("lang_n") * 2, "middle")
        .otherwise("tail")
    )
    return ranked.select(
        F.col("id").alias(id_col),
        F.col("lang").alias(lang_col),
        "score",
        F.col("lang_rank").cast("long").alias("lang_rank"),
        F.col("lang_n").cast("long").alias("lang_n"),
        bucket.alias("bucket"),
    )


def ccnet_buckets_sql(
    scored_cte: str,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    score_col: str = "oov_micro",
) -> str:
    """DuckDB twin of :func:`ccnet_buckets` over a CTE body producing
    (id, lang, score) rows. NULLS LAST is explicit on both engines —
    Spark's ASC default is nulls-FIRST, DuckDB's is nulls-last."""
    return f"""
      WITH scored AS ({scored_cte}),
      ranked AS (
        SELECT {id_col} AS id, {lang_col} AS lang,
               CAST({score_col} AS BIGINT) AS score,
               ROW_NUMBER() OVER (PARTITION BY {lang_col}
                                  ORDER BY {score_col} ASC NULLS LAST,
                                           {id_col} ASC) AS lang_rank,
               count({score_col}) OVER (PARTITION BY {lang_col}) AS lang_n
        FROM scored)
      SELECT id AS {id_col}, lang AS {lang_col}, score,
             CAST(lang_rank AS BIGINT) AS lang_rank,
             CAST(lang_n AS BIGINT) AS lang_n,
             CASE WHEN score IS NULL THEN NULL
                  WHEN lang_rank * 3 <= lang_n THEN 'head'
                  WHEN lang_rank * 3 <= lang_n * 2 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM ranked
    """
