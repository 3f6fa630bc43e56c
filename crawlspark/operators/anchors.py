"""Inbound anchor-text aggregation over a link graph.

The classic web-graph text signal (search ranking, page quality, label
generation for classifier training): for every link target, aggregate
the anchor texts of its inbound links — total in-links, distinct
anchors, and the top-K anchors by frequency.

Scale shape (10^10-edge graphs):
  * phase 1 is a ``groupBy(dst, anchor)`` count — map-side partial
    aggregation collapses duplicate anchors (the common case: most
    in-links to a page carry one of a handful of texts) before the
    shuffle, so shuffle rows ≈ distinct (dst, anchor) pairs, not edges.
  * the top-K rank would hotspot on mega-indegree targets (a popular
    host can have millions of distinct anchors) if done as one window
    per dst. ``salt > 1`` applies the politeness dequeue's salted
    two-phase trick: rank within (dst, salt-of-anchor) partitions
    first, keep K per salt group, then rank the ≤ salt·K survivors per
    dst. The global top-K is contained in the union of per-salt top-Ks
    (each survivor's per-salt rank ≤ its global rank), so the result is
    identical while the biggest window partition shrinks by ~salt×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def aggregate_anchor_text(
    edges: DataFrame,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    k_top: int = 3,
    salt: int = 1,
    sep: str = "|",
) -> DataFrame:
    """Per-target anchor summary: (dst, n_inlinks, n_anchors,
    top_anchors) where top_anchors is the top-``k_top`` anchor texts by
    (count desc, anchor asc — deterministic tie-break), joined by
    ``sep`` in rank order.

    ``salt`` > 1 turns the rank into the salted two-phase form (see
    module docstring) — identical output, skew-safe.

    NULL anchors (links without text) are dropped up front — they carry
    no signal and would otherwise count as one more "distinct anchor".
    Totals are derived from the (dst, anchor) count relation, never by
    re-scanning edges: n_inlinks = sum of counts, n_anchors = count of
    count rows — one pass over the edges total.
    """
    counts = (
        edges.where(F.col(anchor_col).isNotNull())
        .groupBy(dst_col, anchor_col)
        .agg(F.count("*").alias("__n"))
    )
    totals = counts.groupBy(dst_col).agg(
        F.sum("__n").alias("n_inlinks"),
        F.count("*").alias("n_anchors"),
    )
    order = [F.col("__n").desc(), F.col(anchor_col).asc()]
    if salt > 1:
        w1 = Window.partitionBy(
            dst_col, F.pmod(F.xxhash64(anchor_col), F.lit(salt))
        ).orderBy(*order)
        counts = (
            counts.withColumn("__rn1", F.row_number().over(w1))
            .where(F.col("__rn1") <= k_top)
            .drop("__rn1")
        )
    w = Window.partitionBy(dst_col).orderBy(*order)
    ranked = counts.withColumn("__rn", F.row_number().over(w))
    top = (
        ranked.where(F.col("__rn") <= k_top)
        .groupBy(dst_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__rn"), F.col(anchor_col)))
                    ),
                    lambda s: s[anchor_col],
                ),
                sep,
            ).alias("top_anchors")
        )
    )
    return totals.join(top, dst_col).select(
        dst_col, "n_inlinks", "n_anchors", "top_anchors"
    )


def aggregate_anchor_text_sql(
    edges_sql: str,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    k_top: int = 3,
    sep: str = "|",
) -> str:
    """DuckDB twin of ``aggregate_anchor_text`` (unsalted form — the
    salted variant is output-identical by construction and pinned by
    test)."""
    return f"""
      WITH e AS ({edges_sql}),
      c AS (SELECT {dst_col}, {anchor_col}, count(*) AS n
            FROM e WHERE {anchor_col} IS NOT NULL
            GROUP BY {dst_col}, {anchor_col}),
      r AS (SELECT *, row_number() OVER (
              PARTITION BY {dst_col} ORDER BY n DESC, {anchor_col} ASC) AS rn
            FROM c),
      t AS (SELECT {dst_col},
              string_agg({anchor_col}, '{sep}' ORDER BY rn) AS top_anchors
            FROM r WHERE rn <= {k_top} GROUP BY {dst_col}),
      s AS (SELECT {dst_col}, CAST(sum(n) AS BIGINT) AS n_inlinks,
              CAST(count(*) AS BIGINT) AS n_anchors
            FROM c GROUP BY {dst_col})
      SELECT s.{dst_col}, s.n_inlinks, s.n_anchors, t.top_anchors
      FROM s JOIN t ON s.{dst_col} = t.{dst_col}
    """
