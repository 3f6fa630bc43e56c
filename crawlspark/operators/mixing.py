"""Training-corpus mixing: exact integer apportionment of a token
budget across sources.

Every LLM data recipe (The Pile, RedPajama, Dolma) ends in a mixing
table — per-source weights, a total token budget, and the resulting
per-source token allocations and epoch counts (how many passes over a
source its allocation implies). The arithmetic looks trivial and is
the classic place float rounding silently drops or invents tokens:
``target * w_i / W`` rounded per-source does NOT sum to the target.
This module does Hamilton (largest-remainder) apportionment in exact
integers, so ``sum(alloc_tokens) == target_tokens`` is an identity,
not a hope:

  quota_i   = target * w_i            (int64 product)
  base_i    = quota_i DIV W,   rem_i = quota_i % W
  leftover  = target - sum(base_i)    (< #sources by construction)
  alloc_i   = base_i + 1 for the ``leftover`` largest rem_i
              (ties by source name ascending), else base_i

``epochs_micro = alloc_i * 1e6 DIV n_tokens_i`` says how hard the
allocation leans on the source (>1e6 = multi-epoch repetition — the
number mixing papers report when up-weighting small high-quality
sources).

Scale shape: the corpus-scale work is ONE map-side-partial groupBy
(source → token sum); everything after operates on the per-source
rollup — tens of rows — so the unpartitioned windows the apportionment
uses are free by construction (documented here precisely because a
window without partitionBy is normally a red flag in this repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlspark.operators.textops import token_count


def source_token_stats(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source corpus volume: (source, n_docs, n_tokens). The only
    corpus-scale pass of the mixing computation."""
    return docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(text_col)).cast("long").alias("n_tokens"),
    )


def corpus_mix_plan(
    stats: DataFrame,
    weights: DataFrame,
    target_tokens: int,
    source_col: str = "source",
    weight_col: str = "weight",
) -> DataFrame:
    """Hamilton-apportion ``target_tokens`` across sources proportional
    to ``weights`` (integer weights, e.g. micro-units): ``(source,
    weight, n_tokens, alloc_tokens, epochs_micro)``; sources present in
    ``stats`` but absent from ``weights`` get weight 0 (they still
    appear, with alloc 0, so the plan accounts for the whole corpus).
    int64 headroom: target * w_i must fit — keep weights in micro-units
    and targets in tokens (1e6 * 1e12 is the edge; normalize weights
    down if both are huge).

    Degenerate input: if the weights table is empty or all-zero the
    total ``__W`` is 0, ``__quota DIV __W`` is NULL, and every
    ``alloc_tokens`` comes out NULL (it would raise under ANSI mode) —
    the sum(alloc) == target identity does not hold in that case. The
    caller owns validating that at least one positive weight exists;
    this function does not raise so the oracle twin (identical SQL
    arithmetic, identical NULL propagation) stays engine-exact."""
    j = stats.join(
        weights.select(
            F.col(source_col).alias("source"),
            F.col(weight_col).cast("long").alias("weight"),
        ),
        "source",
        "left",
    ).select(
        "source", "n_tokens", F.coalesce("weight", F.lit(0)).alias("weight")
    )
    wall = Window.partitionBy()  # per-source rollup: tens of rows (module doc)
    j = j.select(
        "*",
        F.sum("weight").over(wall).alias("__W"),
        (F.lit(target_tokens) * F.col("weight")).alias("__quota"),
    )
    j = j.select(
        "*",
        F.expr("__quota DIV __W").alias("__base"),
        F.expr("__quota % __W").alias("__rem"),
    )
    j = j.select(
        "*",
        (F.lit(target_tokens) - F.sum("__base").over(wall)).alias("__leftover"),
        F.row_number()
        .over(Window.partitionBy().orderBy(F.desc("__rem"), F.asc("source")))
        .alias("__rk"),
    )
    alloc = F.col("__base") + F.when(
        F.col("__rk") <= F.col("__leftover"), 1
    ).otherwise(0)
    out = j.select(
        "source",
        "weight",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        alloc.cast("long").alias("alloc_tokens"),
    )
    return out.select(
        "*",
        F.when(
            F.col("n_tokens") > 0,
            F.expr("(alloc_tokens * 1000000) DIV n_tokens"),
        ).cast("long").alias("epochs_micro"),
    )


def corpus_mix_plan_sql(
    target_tokens: int,
    table: str = "documents",
    source_col: str = "source",
    text_col: str = "text",
    weight_expr: str = "100 + length(source) * 37 % 400",
) -> str:
    """DuckDB twin of :func:`source_token_stats` + :func:`corpus_mix_plan`
    with weights derived per-source by ``weight_expr`` (how the query
    registration builds its deterministic weight table)."""
    return f"""
      WITH stats AS (
        SELECT {source_col} AS source, count(*) AS n_docs,
               CAST(sum(length({text_col}) - length(replace({text_col}, ' ', '')) + 1)
                 AS BIGINT) AS n_tokens
        FROM {table} GROUP BY 1),
      w AS (SELECT source, CAST({weight_expr} AS BIGINT) AS weight FROM stats),
      j AS (
        SELECT s.source, s.n_tokens, coalesce(w.weight, 0) AS weight
        FROM stats s LEFT JOIN w ON s.source = w.source),
      q AS (
        SELECT *, sum(weight) OVER () AS W,
               {target_tokens} * weight AS quota
        FROM j),
      b AS (
        SELECT *, quota // W AS base, quota % W AS rem FROM q),
      r AS (
        SELECT *, {target_tokens} - sum(base) OVER () AS leftover,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk
        FROM b)
      SELECT source, weight, n_tokens,
             CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS alloc_tokens,
             CAST(CASE WHEN n_tokens > 0 THEN
               ((base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END) * 1000000)
                 // n_tokens END AS BIGINT) AS epochs_micro
      FROM r
    """
