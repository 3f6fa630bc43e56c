"""Redirect-chain resolution — pointer-doubling over a (src → dst) map.

A crawler that records HTTP 3xx outcomes ends an epoch with a redirect
relation: one row per redirecting URL. Before the next frontier is
built, every discovered link must be rewritten to its FINAL target —
otherwise the frontier re-fetches each hop of every chain, the seen-set
fills with aliases, and politeness budgets are spent on non-content
URLs. HTTP clients cap chains (curl/browsers ~20 hops) and treat loops
as errors; this operator reproduces both behaviors as a batch job.

Reference parity: the reference follows HttpClient's built-in redirect
handling implicitly (one hop at a time, per request). At 10^10-URL
scale redirects are DATA, not control flow, so the resolution becomes a
relational fixpoint instead of a per-request loop.

Algorithm — pointer doubling (path halving), the standard O(log L)
trick for list ranking / find-root on massive graphs:

    m_0(src)      = (next=dst, hops=1)
    m_{r+1}(src)  = m_r(src) ∘ m_r(m_r(src).next)   -- jump 2^r hops

Each round is ONE self equi-join on the current mapping (shuffle keyed
on the jumped-to url), so resolving chains up to ``max_hops`` costs
ceil(log2(max_hops)) joins total — at 100 TB that is ~6 shuffles over a
relation that only SHRINKS as chains resolve, vs max_hops sequential
joins for the naive walk. Rows whose pointer still lands on a redirect
source after the final round exceeded the hop budget (a loop, or a
chain longer than the cap): ``unresolved=true``, final_url NULL,
hops -1 — exactly what an HTTP client reports for a redirect storm.

Hop counts stay EXACT under doubling: both sides of the join carry
their true distance-so-far, and a row only jumps while its pointer is a
redirect source, so the sum on arrival at a terminal equals the chain
length.

Lineage is truncated per round (localCheckpoint) — 6 iterations of
self-join otherwise stack a 2^6-deep plan that Catalyst re-analyzes on
every action (the round-2 iterative-algorithm gotcha, same fix as
operators/graph.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_HOPS = 64


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = DEFAULT_MAX_HOPS,
    truncate_lineage: bool = True,
) -> DataFrame:
    """Resolve every redirect source to its terminal URL.

    ``redirects`` must be a FUNCTION on src (one outgoing edge per
    source URL — a crawler's last-write-wins redirect log guarantees
    this). Duplicate srcs would make "the" final target ambiguous;
    dedupe upstream (e.g. max-ts per src) before calling.

    Returns one row per input src:
      (src, final_url, hops, unresolved)
    where unresolved=true marks loops and over-budget chains
    (final_url NULL, hops -1).
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    m = redirects.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("next"),
        F.lit(1).cast("long").alias("hops"),
    )
    rounds = max(1, math.ceil(math.log2(max_hops)))
    for _ in range(rounds):
        a, b = m.alias("a"), m.alias("b")
        m = (
            a.join(b, F.col("a.next") == F.col("b.src"), "left")
            .select(
                F.col("a.src").alias("src"),
                F.coalesce(F.col("b.next"), F.col("a.next")).alias("next"),
                F.when(F.col("b.src").isNull(), F.col("a.hops"))
                .otherwise(F.col("a.hops") + F.col("b.hops"))
                .alias("hops"),
            )
        )
        if truncate_lineage:
            m = m.localCheckpoint(eager=False)
    # a pointer still landing on a redirect source after 2^rounds >=
    # max_hops jumps is a loop or an over-budget chain
    srcs = redirects.select(F.col(src_col).alias("_rsrc")).distinct()
    out = m.join(srcs, m["next"] == srcs["_rsrc"], "left")
    return out.select(
        "src",
        F.when(F.col("_rsrc").isNull(), F.col("next")).alias("final_url"),
        F.when(F.col("_rsrc").isNull(), F.col("hops"))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("hops"),
        F.col("_rsrc").isNotNull().alias("unresolved"),
    )


def rewrite_links_through_redirects(
    links: DataFrame,
    redirects: DataFrame,
    url_col: str = "url",
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = DEFAULT_MAX_HOPS,
) -> DataFrame:
    """Rewrite a link relation so every URL that is a known redirect
    source becomes its final target; links into unresolved chains
    (loops / over-budget) are DROPPED, matching an HTTP client erroring
    out. Non-redirect URLs pass through untouched (left join keeps the
    links relation's partitioning pressure on the small resolved map,
    which is broadcastable when the redirect log is).
    """
    resolved = resolve_redirects(
        redirects, src_col=src_col, dst_col=dst_col, max_hops=max_hops
    ).select(F.col("src").alias("_r_src"), "final_url", "unresolved")
    out = links.join(resolved, links[url_col] == F.col("_r_src"), "left")
    return (
        out.where(~F.coalesce(F.col("unresolved"), F.lit(False)))
        .withColumn(url_col, F.coalesce(F.col("final_url"), F.col(url_col)))
        .drop("_r_src", "final_url", "unresolved")
    )


def resolve_redirects_sql(redirects_sql: str, max_hops: int = DEFAULT_MAX_HOPS) -> str:
    """DuckDB twin: recursive walk bounded at ``max_hops``; a src with
    no terminal row inside the budget is unresolved. Exact — hop counts
    and terminal urls are integers/strings, no floats anywhere."""
    return f"""
      WITH RECURSIVE r AS ({redirects_sql}),
      walk(src, cur, hops) AS (
        SELECT src, dst, CAST(1 AS BIGINT) FROM r
        UNION ALL
        SELECT w.src, r.dst, w.hops + 1
        FROM walk w JOIN r ON w.cur = r.src
        WHERE w.hops < {max_hops}
      ),
      term AS (
        SELECT w.src, w.cur AS final_url, w.hops
        FROM walk w
        WHERE w.cur NOT IN (SELECT src FROM r)
      )
      SELECT r.src,
             term.final_url,
             CAST(coalesce(term.hops, -1) AS BIGINT) AS hops,
             term.src IS NULL AS unresolved
      FROM r LEFT JOIN term ON r.src = term.src"""
