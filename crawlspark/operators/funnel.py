"""Curation funnel: the staged keep/kill pipeline with per-stage
attribution.

Production webtext pipelines (C4, RefinedWeb, FineWeb) run their
filters as an ordered FUNNEL and report, per stage, how many documents
reached it and how many it killed — the number every pipeline paper
publishes, and the first thing an operator asks when a corpus comes out
10x smaller than expected. Running the repo's per-stage operators as
separate jobs means re-reading the corpus once per stage AND losing
attribution (a doc two stages would kill is double-counted); this
module computes every stage decision in one composed plan — each heavy
stage consumes one column-pruned (id, text) scan and shuffles narrow
rows only — and attributes each document to the FIRST stage that
killed it, so the funnel table is a single aggregation away.

Stage order (the conventional cheap-to-expensive ordering):

  1. ``lang``      — language gate (lang_col == target).
  2. ``length``    — whitespace token count within [min_words,
                     max_words] (the Gopher word-count bound).
  3. ``top_token`` — dominant-token share <= max_top_token_micro (the
                     Gopher repetition gate; textops.top_token_fraction).
  4. ``exact_dup`` — corpus-wide exact dedup, min-id keeper convention
                     (dedup_exact's rule): only the first copy survives.
  5. ``decontam``  — k-shingle overlap with a benchmark set
                     (decontam.decontaminate): contaminated docs die.

"First kill" attribution means later stages never claim a document an
earlier stage already rejected — per-stage counts sum to exactly
(total - survivors), so the funnel is an audit, not a correlation.

Scale shape (100 TB): per-row stages (1, 2) are free column exprs; the
heavy stages each shuffle narrow rows only — (id, token, count) for the
repetition gate, (md5-key, id) for the dedup window, (id, shingle-hash)
semi-join against the broadcast benchmark for decontamination — and
their per-doc verdicts re-join the base on the id key. All exact
integer/boolean arithmetic; the DuckDB twin composes the same stage
twins the standalone operators publish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlspark.operators.decontam import decontaminate, decontaminate_sql
from crawlspark.operators.textops import (
    token_count,
    top_token_fraction_sql,
    top_token_micro_of,
    words_of,
)

STAGES = ("lang", "length", "top_token", "exact_dup", "decontam")


def curation_funnel(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    lang: str = "en",
    min_words: int = 20,
    max_words: int = 100_000,
    max_top_token_micro: int = 200_000,
    k_shingle: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-document funnel verdicts: ``(id, n_words, top_token_micro,
    keep_lang, keep_length, keep_top_token, keep_exact_dup,
    keep_decontam, first_kill, kept)`` with ``first_kill`` the first
    failing stage name (NULL for survivors)."""
    # ONE corpus scan for every per-row stage signal: content key,
    # lang/length gates, and the repetition share (the within-row
    # top_token_micro_of fold — it used to be a separate scan + explode
    # + join). The dedup window then shuffles (id, 32-char hash, bools,
    # ints) — never the document text (guide §2.3). NULL-text docs drop
    # here exactly as the old inner join against the repetition relation
    # dropped them.
    base = docs.select(
        F.col(id_col).alias("id"),
        F.md5(text_col).alias("__h"),
        (F.col(lang_col) == lang).alias("keep_lang"),
        token_count(text_col).alias("n_words"),
        words_of(F.col(text_col)).alias("__w"),
    ).where(F.col("__w").isNotNull()).select(
        "id", "__h", "keep_lang", "n_words",
        top_token_micro_of(F.col("__w")).alias("top_token_micro"),
    )
    base = base.withColumn(
        "keep_length",
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words),
    )
    # corpus-wide exact dedup, min-id keeper: one window on the content key
    dupw = Window.partitionBy("__h")
    base = base.withColumn(
        "keep_exact_dup", F.col("id") == F.min("id").over(dupw)
    ).drop("__h")
    dec = decontaminate(
        docs, benchmark, k=k_shingle, id_col=id_col, text_col=text_col
    ).select(F.col(id_col).alias("id"), "contaminated")
    j = base.join(dec, "id")
    j = j.withColumn(
        "keep_top_token", F.col("top_token_micro") <= max_top_token_micro
    ).withColumn("keep_decontam", ~F.col("contaminated"))
    first_kill = (
        F.when(~F.col("keep_lang"), STAGES[0])
        .when(~F.col("keep_length"), STAGES[1])
        .when(~F.col("keep_top_token"), STAGES[2])
        .when(~F.col("keep_exact_dup"), STAGES[3])
        .when(~F.col("keep_decontam"), STAGES[4])
    )
    return j.select(
        F.col("id").alias(id_col),
        "n_words", "top_token_micro",
        "keep_lang", "keep_length", "keep_top_token", "keep_exact_dup",
        "keep_decontam",
        first_kill.alias("first_kill"),
        first_kill.isNull().alias("kept"),
    )


def funnel_summary(funnel: DataFrame) -> DataFrame:
    """The published-style funnel table: ``(stage_idx, stage, reached,
    killed)`` in stage order, plus a final ``survivors`` row. ``reached``
    = docs still alive entering the stage; per-stage ``killed`` sums to
    total - survivors by construction (first-kill attribution)."""
    # ONE action over the composed funnel plan: survivors land in the
    # NULL first_kill group, so total = sum of all group counts — the
    # separate count() was a second full evaluation of the unmaterialized
    # funnel (dedup window + repetition aggregate + decontam join)
    kills = {
        r["first_kill"]: r["n"]
        for r in funnel.groupBy("first_kill").agg(F.count("*").alias("n")).collect()
    }
    total = sum(kills.values())
    rows = []
    alive = total
    for i, s in enumerate(STAGES):
        k = kills.get(s, 0)
        rows.append((i, s, alive, k))
        alive -= k
    rows.append((len(STAGES), "survivors", alive, 0))
    return funnel.sparkSession.createDataFrame(
        rows, "stage_idx int, stage string, reached long, killed long"
    )


def curation_funnel_sql(
    table: str = "documents",
    *,
    lang: str = "en",
    min_words: int = 20,
    max_words: int = 100_000,
    max_top_token_micro: int = 200_000,
    k_shingle: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    bench_pred: str = "doc_id % 37 = 0",
) -> str:
    """DuckDB twin of :func:`curation_funnel` — composes the standalone
    stage twins (top_token_fraction_sql, decontaminate_sql) as CTEs with
    the same min-id dedup window and first-kill CASE ladder."""
    stages = ", ".join(f"'{s}'" for s in STAGES)  # noqa: F841 (doc aid)
    return f"""
      WITH base AS (
        SELECT {id_col} AS id,
               {lang_col} = '{lang}' AS keep_lang,
               CAST(length({text_col}) - length(replace({text_col}, ' ', '')) + 1
                 AS BIGINT) AS n_words,
               {id_col} = min({id_col}) OVER (PARTITION BY md5({text_col}))
                 AS keep_exact_dup
        FROM {table}),
      top AS ({top_token_fraction_sql(id_col=id_col, text_col=text_col, table=table)}),
      dec AS ({decontaminate_sql(k=k_shingle, table=table, id_col=id_col,
                                 text_col=text_col, bench_pred=bench_pred)}),
      j AS (
        SELECT b.id, b.n_words, t.top_token_micro,
               b.keep_lang,
               b.n_words >= {min_words} AND b.n_words <= {max_words} AS keep_length,
               t.top_token_micro <= {max_top_token_micro} AS keep_top_token,
               b.keep_exact_dup,
               NOT d.contaminated AS keep_decontam
        FROM base b
        JOIN top t ON t.{id_col} = b.id
        JOIN dec d ON d.{id_col} = b.id),
      fk AS (
        SELECT *,
               CASE WHEN NOT keep_lang THEN 'lang'
                    WHEN NOT keep_length THEN 'length'
                    WHEN NOT keep_top_token THEN 'top_token'
                    WHEN NOT keep_exact_dup THEN 'exact_dup'
                    WHEN NOT keep_decontam THEN 'decontam'
               END AS first_kill
        FROM j)
      SELECT id AS {id_col}, n_words, top_token_micro,
             keep_lang, keep_length, keep_top_token, keep_exact_dup,
             keep_decontam, first_kill, first_kill IS NULL AS kept
      FROM fk
    """
