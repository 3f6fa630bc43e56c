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


def oov_bigram_share(
    docs: DataFrame,
    ref_counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ref_count: int = 1,
) -> DataFrame:
    """Per-document out-of-vocabulary bigram share vs a reference LM:
    ``(id, n_bigrams, n_oov, oov_micro)`` where ``oov_micro =
    n_oov * 1_000_000 / n_bigrams`` (integer division; 0-token and
    1-token docs score 0 OOV over 0 bigrams → oov_micro NULL so the
    caller can't mistake "no evidence" for "perfect"). A bigram is
    in-vocabulary when the reference saw it >= ``min_ref_count`` times
    (raise to ignore reference hapaxes)."""
    grams = docs.select(
        F.col(id_col).alias("id"), words_of(text_col).alias("__w")
    ).select("id", F.explode_outer(_bigrams_of(F.col("__w"))).alias("bigram"))
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
