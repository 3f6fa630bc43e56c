"""Unit goldens for the round-4 operators: paragraph dedup, integer
PageRank, sequence packing — each checked against an independent
pure-Python derivation, not just the DuckDB oracle."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_paragraph_dedup_first_occurrence_golden(spark):
    from crawlspark.operators.dedup import paragraph_dedup

    boiler = "accept our cookies"
    docs = spark.createDataFrame([
        Row(doc_id=0, text=f"{boiler}\n\nunique zero\n\nshared tail"),
        Row(doc_id=1, text=f"{boiler}\n\nunique one"),
        Row(doc_id=2, text=f"shared tail\n\n{boiler}\n\nunique two"),
        Row(doc_id=3, text=boiler),                      # fully boilerplate
        Row(doc_id=4, text=f"unique four\n\n\n\nunique four b"),  # empty para dropped
    ])
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert out[0]["text_dedup"] == f"{boiler}\n\nunique zero\n\nshared tail"
    assert (out[0]["n_paras"], out[0]["n_kept"]) == (3, 3)   # first doc keeps all
    assert out[1]["text_dedup"] == "unique one"              # boiler seen in doc 0
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (2, 1)
    assert out[2]["text_dedup"] == "unique two"              # both repeats dropped
    assert out[3]["text_dedup"] == ""                        # reduced to nothing,
    assert (out[3]["n_paras"], out[3]["n_kept"]) == (1, 0)   # ...but still emitted
    assert out[4]["text_dedup"] == "unique four\n\nunique four b"
    assert (out[4]["n_paras"], out[4]["n_kept"]) == (2, 2)


def _pagerank_py(edges, iterations=5):
    """Independent integer PageRank: dict arithmetic, same documented
    semantics (floor div, dangling mass dropped)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        recv = {n: 0 for n in nodes}
        for s, d in edges:
            recv[d] += rank[s] // deg[s]
        rank = {n: 150_000 + recv[n] * 85 // 100 for n in nodes}
    return rank


def test_pagerank_micro_matches_python_reference(spark):
    from crawlspark.operators.graph import pagerank_micro

    # small graph with a hub (node 0), a dangling node (5), and a cycle
    edges = [(1, 0), (2, 0), (3, 0), (0, 1), (1, 2), (2, 3), (3, 4), (4, 1), (2, 5)]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r["node"]: r["rank_micro"] for r in pagerank_micro(df, iterations=5).collect()}
    assert got == _pagerank_py(edges)


def test_pagerank_sql_twin_matches(spark):
    import duckdb

    from crawlspark.operators.graph import pagerank_micro, pagerank_sql

    edges = [(i, (i * 3 + 1) % 7) for i in range(7)] + [(i, 0) for i in range(1, 7)]
    edges = sorted(set(edges))
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    spark_ranks = {r["node"]: r["rank_micro"] for r in pagerank_micro(df, 4).collect()}
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = pagerank_sql(f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", 4)
    duck_ranks = dict(duckdb.sql(sql).fetchall())
    assert spark_ranks == duck_ranks


def _pagerank_py_dangling(edges, iterations=5):
    """Independent integer PageRank WITH dangling-mass redistribution:
    per round, the summed rank of out-degree-0 nodes is split evenly
    (floor) across all nodes before damping."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        recv = {n: 0 for n in nodes}
        for s, d in edges:
            recv[d] += rank[s] // deg[s]
        share = sum(rank[n] for n in nodes if n not in deg) // len(nodes)
        rank = {n: 150_000 + (recv[n] + share) * 85 // 100 for n in nodes}
    return rank


def test_pagerank_dangling_redistribution_matches_python_reference(spark):
    from crawlspark.operators.graph import pagerank_micro

    # node 5 dangles; without redistribution its mass leaks every round
    edges = [(1, 0), (2, 0), (3, 0), (0, 1), (1, 2), (2, 3), (3, 4), (4, 1), (2, 5)]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_micro(df, iterations=5, redistribute_dangling=True).collect()
    }
    exp = _pagerank_py_dangling(edges)
    assert got == exp
    # redistribution retains strictly more total mass than the leaky
    # default (floor losses only), and can't exceed the initial total
    leaky = sum(_pagerank_py(edges).values())
    assert leaky < sum(exp.values()) <= len(exp) * 1_000_000


def test_pagerank_dangling_sql_twin_matches(spark):
    import duckdb

    from crawlspark.operators.graph import pagerank_micro, pagerank_sql

    edges = [(i, (i * 3 + 1) % 7) for i in range(7)] + [(7, 0), (0, 8)]  # 8 dangles
    edges = sorted(set(edges))
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    spark_ranks = {
        r["node"]: r["rank_micro"]
        for r in pagerank_micro(df, 4, redistribute_dangling=True).collect()
    }
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = pagerank_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", 4, redistribute_dangling=True
    )
    duck_ranks = dict(duckdb.sql(sql).fetchall())
    assert spark_ranks == duck_ranks


def test_sequence_pack_offsets_and_bins(spark):
    from crawlspark.operators.packing import sequence_pack

    rows = [Row(doc_id=i, n_tok=100 + i) for i in range(40)]
    df = spark.createDataFrame(rows)
    out = sequence_pack(df, max_tokens=256).collect()
    assert len(out) == 40
    # independent reconstruction: per-shard order is (md5(id), id)
    by_shard: dict[str, list] = {}
    for i in range(40):
        h = hashlib.md5(str(i).encode()).hexdigest()
        by_shard.setdefault(h[0], []).append((h, i))
    exp = {}
    for shard, docs in by_shard.items():
        off = 0
        for h, i in sorted(docs):
            exp[i] = (shard, off, off // 256)
            off += 100 + i
    got = {r["doc_id"]: (r["shard"], r["tok_offset"], r["bin"]) for r in out}
    assert got == exp
    # packing is deterministic under repartitioning
    got2 = {
        r["doc_id"]: (r["shard"], r["tok_offset"], r["bin"])
        for r in sequence_pack(df.repartition(7), max_tokens=256).collect()
    }
    assert got2 == got


def test_sequence_pack_single_shuffle(spark):
    """The packing plan must contain exactly one exchange (by shard) —
    the window and projections ride the same partitioning."""
    from crawlspark.operators.packing import sequence_pack

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("n_tok")
    )
    plan = sequence_pack(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def _opic_py(edges, iterations=5):
    """Independent synchronous OPIC: dict arithmetic, same documented
    semantics (bank cash into history, pay cash//out_deg per out-edge,
    dangling cash pools into the virtual page and splits evenly)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    h = {n: 0 for n in nodes}
    c = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        recv = {n: 0 for n in nodes}
        for s, d in edges:
            recv[d] += c[s] // deg[s]
        pot = sum(c[n] for n in nodes if n not in deg)
        share = pot // len(nodes)
        h = {n: h[n] + c[n] for n in nodes}
        c = {n: recv[n] + share for n in nodes}
    return h, c


def test_opic_matches_python_reference_and_conserves_mass(spark):
    from crawlspark.operators.graph import opic_micro

    # node 5 dangles -> virtual-page path exercised; 0 is a hub
    edges = [(1, 0), (2, 0), (3, 0), (0, 1), (1, 2), (2, 3), (3, 4), (4, 1), (2, 5)]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r["node"]: (r["history_micro"], r["cash_micro"])
           for r in opic_micro(df, iterations=5).collect()}
    eh, ec = _opic_py(edges)
    assert got == {n: (eh[n], ec[n]) for n in eh}
    # no damping: circulating cash only shrinks by floor crumbs
    total0 = len(eh) * 1_000_000
    assert total0 * 0.99 < sum(ec.values()) <= total0
    # hub 0 out-ranks the dangling leaf 5 on the paper's h+c estimate
    assert eh[0] + ec[0] > eh[5] + ec[5]


def test_opic_sql_twin_matches(spark):
    import duckdb

    from crawlspark.operators.graph import opic_micro, opic_sql

    edges = [(i, (i * 3 + 1) % 7) for i in range(7)] + [(i, 0) for i in range(1, 7)]
    edges = sorted(set(edges))
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = sorted(tuple(r) for r in opic_micro(df, 4).collect())
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    exp = sorted(
        tuple(r)
        for r in duckdb.sql(
            opic_sql(f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", 4)
        ).fetchall()
    )
    assert got == exp
