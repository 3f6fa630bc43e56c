"""Link-graph operators: fixed-iteration integer PageRank.

A crawler is also a link-graph machine: the frontier's priority column
(epoch.py dequeue ordering) is exactly where a rank signal plugs in,
and LLM corpus pipelines weight documents by link authority
(Common Crawl's harmonic-centrality dumps, OPIC crawl ordering).

Determinism/portability: ranks are integer MICRO-units with
floor-division at every step — addition, multiplication, and integer
division of int64 are bit-exact in any engine and any summation order,
so a DuckDB twin (``pagerank_sql``) can verify values exactly. A
float PageRank's sums would differ across engines by reduction order.

Semantics (documented, deliberately simple at the edges):
  * rank starts at 1_000_000 per node;
  * each of ``iterations`` rounds: every node divides its rank by its
    out-degree (floor), destinations sum received contributions, and
    new_rank = (1-d)*1e6 + floor(d * contrib_sum) with d = 0.85;
  * nodes with no outlinks (dangling) leak their mass by default;
    ``redistribute_dangling=True`` enables the classic full variant —
    each round the dangling mass is split evenly (floor) across all
    nodes via one tiny 1-row aggregate cross-broadcast into the
    update (never a driver collect);
  * floor-division truncation loses <1 micro-unit per edge per round —
    irrelevant for ranking, essential for exactness.

Scale shape: each round is ONE shuffle (group contributions by dst)
plus an equi-join of the rank table with the static (src, out_deg)
edges — the edges table never moves if both sides are pre-partitioned
by the join key (bucketed edges at 10^10 urls). Plans are chained
through localCheckpoint per round exactly like
dedup.connected_components, keeping plan depth O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMP_NUM, DAMP_DEN = 85, 100          # d = 0.85 as an exact ratio
BASE_MICRO = 1_000_000
TELEPORT_MICRO = BASE_MICRO * (DAMP_DEN - DAMP_NUM) // DAMP_DEN  # 150000


def pagerank_micro(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Fixed-``iterations`` PageRank over an edge list, integer
    micro-units. Returns (node, rank_micro). The node set is every id
    appearing as src or dst; duplicate edges should be pre-distinct'd
    by the caller (they'd double-count contributions).

    ``redistribute_dangling=True`` is the classic full variant: each
    round, the mass held by out-degree-0 nodes is split evenly across
    all nodes (floor per node) before damping, so total mass no longer
    leaks. Costs one extra tiny aggregate per round — a 1-row DataFrame
    cross-broadcast into the update, never a driver collect — plus one
    up-front node count."""
    # one materialization of the edge list: every round joins it, and
    # nodes/deg below are two more consumers — without the barrier the
    # caller's edge derivation (scan + union + distinct) re-runs per
    # round (guide §5: localCheckpoint to cut multi-consumer lineage)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).localCheckpoint(eager=True)
    n_nodes = nodes.count() if redistribute_dangling else 0
    ranks = nodes.select("node", F.lit(BASE_MICRO).cast("long").alias("rank_micro"))
    for _ in range(iterations):
        contrib = (
            ranks.join(deg, ranks.node == deg.src)
            # DIV, not `/`: Spark's / is double division, and a
            # correctly-rounded double quotient can land one ulp ABOVE
            # an integer boundary, breaking floor-exactness vs DuckDB //
            .select("src", F.expr("rank_micro DIV out_deg").alias("c"))
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        updated = nodes.join(contrib, nodes.node == contrib.dst, "left")
        if redistribute_dangling:
            # dangling mass this round: ranks of nodes with no outlinks
            # (1-row aggregate, broadcast — the whole rank table never
            # funnels through the driver)
            dang = (
                ranks.join(deg, ranks.node == deg.src, "left_anti")
                .agg(F.coalesce(F.sum("rank_micro"), F.lit(0)).cast("long").alias("__dang"))
            )
            share = f"__dang DIV {n_nodes}"
            updated = updated.crossJoin(F.broadcast(dang))
            recv = f"(coalesce(s, 0) + {share})"
        else:
            recv = "coalesce(s, 0)"
        ranks = (
            updated.select(
                "node",
                (
                    F.lit(TELEPORT_MICRO)
                    + F.expr(f"{recv} * {DAMP_NUM} DIV {DAMP_DEN}")
                ).cast("long").alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_sql(
    edges_cte: str, iterations: int = 5, redistribute_dangling: bool = False
) -> str:
    """DuckDB twin: ``edges_cte`` is the body of a CTE producing
    (src, dst); the fixed iteration count unrolls into chained CTEs —
    same integer arithmetic, bit-exact against :func:`pagerank_micro`,
    including the per-round dangling-mass scalar when
    ``redistribute_dangling``."""
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src)",
        "ncnt AS (SELECT count(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({BASE_MICRO} AS BIGINT) AS rank_micro FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        if redistribute_dangling:
            parts.append(
                f"""d{i} AS (
                  SELECT coalesce(sum(r.rank_micro), 0)
                         // (SELECT n FROM ncnt) AS share
                  FROM r{i - 1} r LEFT JOIN deg d ON r.node = d.src
                  WHERE d.src IS NULL)"""
            )
            recv = f"(coalesce(s.s, 0) + (SELECT share FROM d{i}))"
        else:
            recv = "coalesce(s.s, 0)"
        parts.append(
            f"""r{i} AS (
              SELECT n.node,
                     CAST({TELEPORT_MICRO} + {recv} * {DAMP_NUM} // {DAMP_DEN}
                          AS BIGINT) AS rank_micro
              FROM nodes n LEFT JOIN (
                SELECT e.dst, sum(r.rank_micro // d.out_deg) AS s
                FROM r{i - 1} r JOIN deg d ON r.node = d.src
                JOIN edges e ON e.src = d.src
                GROUP BY e.dst) s ON n.node = s.dst)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, rank_micro FROM r{iterations}"
    )


# ---------------------------------------------------------------------------
# OPIC: On-line Page Importance Computation (Abiteboul, Preda, Cobena,
# WWW 2003) — the importance estimate crawlers maintain WHILE crawling,
# no convergence wait: each page holds CASH; visiting a page banks its
# cash into HISTORY and distributes it equally to out-neighbors; a
# page's importance estimate is its history share. Unlike PageRank
# there is no damping — mass conservation comes from the VIRTUAL PAGE
# that every dangling node pays into and that redistributes uniformly.
# This is the synchronous-epoch adaptation (every page "visited" once
# per round — the batch shape a Spark crawler actually runs between
# epochs); the greedy visit-one-page-at-a-time variant is inherently
# sequential and pointless on a cluster.
# ---------------------------------------------------------------------------


def opic_micro(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-``iterations`` synchronous OPIC over an edge list, integer
    micro-units. Returns (node, history_micro, cash_micro): rank the
    frontier by history_micro + cash_micro (the paper's unbiased
    estimate adds the un-banked cash). Duplicate edges double-count —
    pre-distinct like :func:`pagerank_micro`.

    Per round, every node banks its cash (history += cash) and pays
    cash DIV out_deg to each out-neighbor; dangling nodes pay their
    whole cash to the virtual page, which splits it evenly (floor)
    across all nodes the same round. Floor truncation loses <1
    micro-unit per edge per round — monotonically shrinking total mass,
    never reordering ranks. Scale shape: identical to pagerank_micro —
    one contributions shuffle per round against static (src, out_deg)
    edges, state chained through localCheckpoint so plan depth is O(1).
    """
    # one materialization of the edge list: every round joins it, and
    # nodes/deg below are two more consumers — without the barrier the
    # caller's edge derivation (scan + union + distinct) re-runs per
    # round (guide §5: localCheckpoint to cut multi-consumer lineage)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).localCheckpoint(eager=True)
    n_nodes = nodes.count()
    state = nodes.select(
        "node",
        F.lit(0).cast("long").alias("history_micro"),
        F.lit(BASE_MICRO).cast("long").alias("cash_micro"),
    )
    for _ in range(iterations):
        contrib = (
            state.join(deg, state.node == deg.src)
            .select("src", F.expr("cash_micro DIV out_deg").alias("c"))
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        # virtual-page pot: the whole cash of out-degree-0 nodes,
        # split evenly the same round (1-row aggregate, broadcast)
        dang = (
            state.join(deg, state.node == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("cash_micro"), F.lit(0)).cast("long").alias("__dang"))
        )
        state = (
            state.join(contrib, state.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (F.col("history_micro") + F.col("cash_micro"))
                .cast("long").alias("history_micro"),
                (F.coalesce(F.col("s"), F.lit(0)) + F.expr(f"__dang DIV {n_nodes}"))
                .cast("long").alias("cash_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return state


def opic_sql(edges_cte: str, iterations: int = 5) -> str:
    """DuckDB twin of :func:`opic_micro` — unrolled CTE per round,
    bit-exact integer arithmetic including the per-round virtual-page
    scalar."""
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src)",
        "ncnt AS (SELECT count(*) AS n FROM nodes)",
        f"s0 AS (SELECT node, CAST(0 AS BIGINT) AS h, CAST({BASE_MICRO} AS BIGINT) AS c FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""d{i} AS (
              SELECT coalesce(sum(s.c), 0) // (SELECT n FROM ncnt) AS share
              FROM s{i - 1} s LEFT JOIN deg d ON s.node = d.src
              WHERE d.src IS NULL)"""
        )
        parts.append(
            f"""s{i} AS (
              SELECT n.node,
                     CAST(p.h + p.c AS BIGINT) AS h,
                     CAST(coalesce(r.s, 0) + (SELECT share FROM d{i}) AS BIGINT) AS c
              FROM nodes n
              JOIN s{i - 1} p ON p.node = n.node
              LEFT JOIN (
                SELECT e.dst, sum(s.c // d.out_deg) AS s
                FROM s{i - 1} s JOIN deg d ON s.node = d.src
                JOIN edges e ON e.src = d.src
                GROUP BY e.dst) r ON n.node = r.dst)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, h AS history_micro, c AS cash_micro FROM s{iterations}"
    )
