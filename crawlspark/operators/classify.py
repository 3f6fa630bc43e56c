"""Hashed linear classifier inference: fastText-style quality scoring.

Production LLM pipelines gate documents with a learned quality
classifier (fastText in CCNet/LLaMA, logistic heads elsewhere); at
inference time that is a feature-hashing linear model — exactly the
shape implemented here: token → hash-bucket → weight, score = sum of
weights. The weights below are a deterministic function of the bucket
id (a fixed Knuth-multiplicative mix) rather than learned values, so
both engines can derive them closed-form and the oracle is exact; a
real model would broadcast a 2^20-row (bucket, weight) table and
replace the mix expression with a join — the plan shape (and its
shuffle profile) is identical.

All arithmetic is int64: bucket ids come from a 28-bit md5 prefix
(portable across engines, no unsigned wraparound), weights are
centered integers in [-32768, 32767], and the per-doc score is an
exact BIGINT sum — the repo's micro-unit convention, so the DuckDB
twin matches bit-for-bit.

Scale shape: explode tokens → per-row weight expression → two-level
hash aggregate on doc id. The exchange carries (id, int64) pairs —
never tokens, never text — and the partial aggregate collapses each
map partition to one row per doc before the shuffle, so network bytes
are O(#docs), not O(#tokens). This is the same proven shape as
textops.simhash64_agg; a higher-order-function fold would avoid the
explode but evaluates interpreted per element (see simhash64_udf's
docstring for the measured 40x) and is NOT worth the shuffle savings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark.operators.textops import words_of

N_BUCKETS = 1024
MIX = 2654435761          # Knuth's 2^32 / phi multiplier
WEIGHT_SPAN = 65536       # weights in [-32768, 32767]


def _bucket(tok) -> "F.Column":
    """28-bit md5 prefix mod N_BUCKETS (7 hex chars < 2^31, exact in
    int64 everywhere)."""
    return F.conv(F.substring(F.md5(tok), 1, 7), 16, 10).cast("bigint") % N_BUCKETS


def _weight(bucket) -> "F.Column":
    return (bucket * MIX) % WEIGHT_SPAN - WEIGHT_SPAN // 2


def classifier_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc hashed-linear-model score: ``(id, n_tok, score, keep)``
    with ``score`` = sum over tokens (with multiplicity) of
    ``weight(bucket(token))`` and ``keep`` = score > 0 (the pipeline's
    accept/reject gate). Empty-string tokens score like any other
    (words_of's split-on-single-space semantics, same as token_count)."""
    t = df.select(F.col(id_col).alias("id"), F.explode(words_of(F.col(text_col))).alias("tok"))
    scored = t.select("id", _weight(_bucket(F.col("tok"))).alias("w"))
    agg = scored.groupBy("id").agg(
        F.count("*").alias("n_tok"), F.sum("w").alias("score")
    )
    return agg.select(
        F.col("id").alias(id_col),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("score").cast("long").alias("score"),
        (F.col("score") > 0).alias("keep"),
    )


def classifier_score_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`classifier_score` — same md5-prefix bucket,
    same integer mix, same sum."""
    return f"""
      WITH toks AS (
        SELECT {id_col} AS id, unnest(string_split({text_col}, ' ')) AS tok
        FROM {table}),
      w AS (
        SELECT id,
               (CAST(('0x' || substr(md5(tok), 1, 7)) AS BIGINT) % {N_BUCKETS})
                 * {MIX} % {WEIGHT_SPAN} - {WEIGHT_SPAN // 2} AS w
        FROM toks)
      SELECT id AS {id_col},
             CAST(count(*) AS BIGINT) AS n_tok,
             CAST(sum(w) AS BIGINT) AS score,
             sum(w) > 0 AS keep
      FROM w GROUP BY id
    """


def calibration_bins(
    scored: DataFrame,
    labels: DataFrame,
    n_bins: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Reliability table for a score column against boolean labels:
    rank documents by (score, id), cut into ``n_bins`` equal-count bins
    (bin = (rank-1)*B DIV n — exact integers, no quantile estimation),
    and report per bin ``(bin, n, n_pos, pos_micro, score_min,
    score_max)``. A well-calibrated score shows pos_micro rising with
    the bin index; flat bins mean the score carries no signal — the
    first diagnostic before trusting a quality gate.

    Scale note: the global rank is one total sort of (score, id) pairs
    — narrow rows, the ordering.py total-order consideration; the bin
    rule is a pure function of rank so a range-partitioned sort
    preserves it exactly."""
    from pyspark.sql import Window

    j = scored.select(
        F.col(id_col).alias("id"), F.col(score_col).cast("long").alias("s")
    ).join(
        labels.select(F.col(id_col).alias("id"), F.col(label_col).alias("y")), "id"
    )
    w = Window.partitionBy().orderBy("s", "id")
    ranked = j.select(
        "s", "y",
        F.row_number().over(w).alias("__rk"),
        F.count("*").over(Window.partitionBy()).alias("__n"),
    )
    binned = ranked.select(
        "s", "y", F.expr(f"(__rk - 1) * {n_bins} DIV __n").alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("n_pos"),
            F.min("s").alias("score_min"),
            F.max("s").alias("score_max"),
        )
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("n"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.expr("(n_pos * 1000000) DIV n").cast("long").alias("pos_micro"),
            "score_min", "score_max",
        )
    )


def classifier_auc(
    scored: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Exact tie-aware ROC AUC in integer micro-units: one row
    ``(n_pos, n_neg, n_concordant, n_tied, auc_micro)`` where
    ``auc_micro = (2*concordant + tied) * 500000 DIV (n_pos*n_neg)`` —
    the Mann-Whitney U with ties counted half, floored once at the end
    (the documented exactness point; a float AUC's summation order
    can't cross engines).

    Plan: collapse to the distinct-score relation (one hash agg —
    positives/negatives per score), then an exclusive running sum of
    negatives over ascending score. The ordered window runs over
    DISTINCT scores, usually << corpus; if the score domain is itself
    huge, range-partition the sort (rank is order-determined, the
    result is unchanged)."""
    from pyspark.sql import Window

    j = scored.select(
        F.col(id_col).alias("id"), F.col(score_col).cast("long").alias("s")
    ).join(
        labels.select(F.col(id_col).alias("id"), F.col(label_col).alias("y")), "id"
    )
    per = j.groupBy("s").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("p"),
        F.sum(F.when(~F.col("y"), 1).otherwise(0)).alias("q"),
    )
    w = Window.partitionBy().orderBy("s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    staged = per.select(
        "p", "q", F.coalesce(F.sum("q").over(w), F.lit(0)).alias("q_below")
    )
    return staged.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("q").cast("long").alias("n_neg"),
        F.sum(F.col("p") * F.col("q_below")).cast("long").alias("n_concordant"),
        F.sum(F.col("p") * F.col("q")).cast("long").alias("n_tied"),
    ).select(
        "*",
        F.expr(
            "CASE WHEN n_pos > 0 AND n_neg > 0 THEN "
            "(2 * n_concordant + n_tied) * 500000 DIV (n_pos * n_neg) END"
        ).cast("long").alias("auc_micro"),
    )


def classifier_eval_sql(
    labels_expr: str,
    n_bins: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[str, str]:
    """DuckDB twins of (:func:`calibration_bins`, :func:`classifier_auc`)
    over :func:`classifier_score`'s scores and a label expression on the
    same table."""
    scored = classifier_score_sql(table, id_col, text_col)
    base = f"""
      WITH scored AS ({scored}),
      j AS (SELECT s.{id_col} AS id, s.score AS s, {labels_expr} AS y
            FROM scored s JOIN {table} d ON d.{id_col} = s.{id_col})"""
    bins = f"""{base},
      ranked AS (
        SELECT s, y,
               ROW_NUMBER() OVER (ORDER BY s, id) AS rk,
               count(*) OVER () AS n
        FROM j),
      binned AS (SELECT s, y, (rk - 1) * {n_bins} // n AS bin FROM ranked)
      SELECT CAST(bin AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) * 1000000 // count(*)
               AS BIGINT) AS pos_micro,
             min(s) AS score_min, max(s) AS score_max
      FROM binned GROUP BY bin"""
    auc = f"""{base},
      per AS (
        SELECT s,
               sum(CASE WHEN y THEN 1 ELSE 0 END) AS p,
               sum(CASE WHEN y THEN 0 ELSE 1 END) AS q
        FROM j GROUP BY s),
      staged AS (
        SELECT p, q,
               coalesce(sum(q) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS q_below
        FROM per),
      agg AS (
        SELECT CAST(sum(p) AS BIGINT) AS n_pos,
               CAST(sum(q) AS BIGINT) AS n_neg,
               CAST(sum(p * q_below) AS BIGINT) AS n_concordant,
               CAST(sum(p * q) AS BIGINT) AS n_tied
        FROM staged)
      SELECT n_pos, n_neg, n_concordant, n_tied,
             CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
               (2 * n_concordant + n_tied) * 500000 // (n_pos * n_neg) END
               AS BIGINT) AS auc_micro
      FROM agg"""
    return bins, auc
