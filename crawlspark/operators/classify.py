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
