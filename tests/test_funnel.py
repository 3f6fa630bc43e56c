"""Curation funnel (operators/funnel.py): first-kill attribution,
conservation invariants, summary telescoping, DuckDB twin parity."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from crawlspark.operators.funnel import (
    STAGES,
    curation_funnel,
    curation_funnel_sql,
    funnel_summary,
)

LONG = " ".join(f"w{i}" for i in range(30))          # 30 distinct words
REPETITIVE = " ".join(["spam"] * 25)                  # top share = 10^6
BENCH_TEXT = " ".join(f"b{i}" for i in range(30))     # 13-shingles overlap


def _docs():
    # one doc per kill stage + two survivors + a duplicate pair
    return [
        (1, LONG, "en"),                   # survivor
        (2, LONG, "fr"),                   # killed: lang (dup of 1 too —
                                           #   lang wins: first-kill)
        (3, "too short", "en"),            # killed: length
        (4, REPETITIVE, "en"),             # killed: top_token
        (5, LONG, "en"),                   # killed: exact_dup (dup of 1)
        (6, BENCH_TEXT, "en"),             # killed: decontam
        (7, " ".join(f"x{i}" for i in range(40)), "en"),  # survivor
    ]


def _bench(spark):
    return spark.createDataFrame([(BENCH_TEXT,)], "text string")


def test_first_kill_attribution(spark):
    docs = spark.createDataFrame(_docs(), "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in curation_funnel(docs, _bench(spark)).collect()}
    assert out[1].kept and out[1].first_kill is None
    assert out[7].kept
    assert out[2].first_kill == "lang"      # not exact_dup: lang is earlier
    assert out[3].first_kill == "length"
    assert out[4].first_kill == "top_token"
    assert out[5].first_kill == "exact_dup"
    assert out[6].first_kill == "decontam"
    # doc 1 keeps the duplicate class (min-id keeper)
    assert out[1].keep_exact_dup and not out[5].keep_exact_dup


def test_summary_telescopes_and_conserves(spark):
    docs = spark.createDataFrame(_docs(), "doc_id long, text string, lang string")
    fun = curation_funnel(docs, _bench(spark))
    rows = funnel_summary(fun).orderBy("stage_idx").collect()
    assert [r.stage for r in rows] == list(STAGES) + ["survivors"]
    # reached telescopes: each stage's reached = previous reached - killed
    for prev, cur in zip(rows, rows[1:]):
        assert cur.reached == prev.reached - prev.killed
    assert rows[0].reached == 7
    assert rows[-1].reached == 2 and rows[-1].killed == 0
    assert sum(r.killed for r in rows) == 7 - 2


def test_duckdb_twin_matches_on_synthetic(spark):
    rows = _docs()
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    bench_pred = "doc_id = 6"               # doc 6 IS the benchmark text
    got = sorted(
        tuple(map(str, r))
        for r in curation_funnel(
            docs, docs.where(F.expr(bench_pred)).select("text")
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    exp = sorted(
        tuple(map(str, r))
        for r in con.sql(curation_funnel_sql(bench_pred=bench_pred)).fetchall()
    )
    assert got == exp
