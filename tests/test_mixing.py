"""Corpus mixing apportionment (operators/mixing.py): exact-sum
invariant, largest-remainder behavior, zero-weight sources, twin."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from crawlspark.operators.mixing import (
    corpus_mix_plan,
    corpus_mix_plan_sql,
    source_token_stats,
)


def test_stats_and_exact_sum_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"src{i % 3}", "w " * 10 + "end") for i in range(9)],
        "doc_id long, source string, text string",
    )
    stats = source_token_stats(docs)
    got = {r.source: (r.n_docs, r.n_tokens) for r in stats.collect()}
    assert got == {f"src{k}": (3, 33) for k in range(3)}  # 11 tokens/doc
    weights = spark.createDataFrame(
        [("src0", 5), ("src1", 2), ("src2", 0)], "source string, weight long"
    )
    # 100 tokens over 5:2:0 -> quotas 71.43/28.57/0; Hamilton gives 71/29/0
    plan = {r.source: r for r in corpus_mix_plan(stats, weights, 100).collect()}
    assert plan["src0"].alloc_tokens == 71
    assert plan["src1"].alloc_tokens == 29      # larger remainder takes +1
    assert plan["src2"].alloc_tokens == 0
    assert sum(p.alloc_tokens for p in plan.values()) == 100
    # epochs: 71 tokens allocated over a 33-token source ≈ 2.15 epochs
    assert plan["src0"].epochs_micro == 71 * 1_000_000 // 33


def test_missing_weight_rows_survive_with_zero(spark):
    stats = spark.createDataFrame(
        [("a", 1, 10), ("b", 1, 10)], "source string, n_docs long, n_tokens long"
    )
    weights = spark.createDataFrame([("a", 7)], "source string, weight long")
    plan = {r.source: r for r in corpus_mix_plan(stats, weights, 50).collect()}
    assert plan["b"].weight == 0 and plan["b"].alloc_tokens == 0
    assert plan["a"].alloc_tokens == 50


def test_remainder_ties_break_by_source_name(spark):
    stats = spark.createDataFrame(
        [("x", 1, 5), ("y", 1, 5), ("z", 1, 5)],
        "source string, n_docs long, n_tokens long",
    )
    weights = spark.createDataFrame(
        [("x", 1), ("y", 1), ("z", 1)], "source string, weight long"
    )
    # 10 over 1:1:1 -> base 3 each, leftover 1 -> x (name asc) gets it
    plan = {r.source: r.alloc_tokens for r in corpus_mix_plan(stats, weights, 10).collect()}
    assert plan == {"x": 4, "y": 3, "z": 3}


def test_duckdb_twin_matches(spark):
    rows = [(i, f"s{i % 4}", ("tok " * (3 + i % 5)).strip()) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    stats = source_token_stats(docs)
    weights = stats.select(
        "source",
        (100 + F.length("source") * 37 % 400).cast("long").alias("weight"),
    )
    got = sorted(
        tuple(map(str, r))
        for r in corpus_mix_plan(stats, weights, 12345).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
    exp = sorted(
        tuple(map(str, r))
        for r in con.sql(corpus_mix_plan_sql(12345)).fetchall()
    )
    assert got == exp
