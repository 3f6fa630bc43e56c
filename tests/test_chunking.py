"""Document chunking (operators/chunking.py): window arithmetic,
coverage invariants, short/empty docs, DuckDB twin."""

import duckdb
import pandas as pd
import pytest

from crawlspark.operators.chunking import chunk_documents, chunk_documents_sql


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_arithmetic_and_coverage(spark):
    text = " ".join(f"t{i}" for i in range(1, 11))           # 10 tokens
    out = chunk_documents(
        _docs(spark, [(0, text)]), chunk_tokens=8, overlap=2
    ).orderBy("chunk_idx").collect()
    assert [(r.chunk_idx, r.start_tok, r.n_tok) for r in out] == [(0, 1, 8), (1, 7, 4)]
    assert out[0].chunk_text == " ".join(f"t{i}" for i in range(1, 9))
    assert out[1].chunk_text == "t7 t8 t9 t10"
    # every token appears in some chunk; consecutive chunks overlap by 2
    assert out[0].chunk_text.split()[-2:] == out[1].chunk_text.split()[:2]


def test_exact_fit_and_short_and_empty_docs(spark):
    eight = " ".join(f"w{i}" for i in range(8))
    rows = [(0, eight), (1, "a b"), (2, "")]
    out = chunk_documents(_docs(spark, rows), chunk_tokens=8, overlap=2).collect()
    per = {}
    for r in out:
        per.setdefault(r.doc_id, []).append(r)
    assert len(per[0]) == 1 and per[0][0].n_tok == 8       # no redundant tail
    assert len(per[1]) == 1 and per[1][0].chunk_text == "a b"
    assert len(per[2]) == 1 and per[2][0].chunk_text == ""  # split('') -> ['']


def test_overlap_must_be_smaller(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(0, "x")]), chunk_tokens=4, overlap=4)


def test_duckdb_twin_matches(spark):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(3 + (i * 7) % 40)))
            for i in range(25)] + [(99, "")]
    got = sorted(
        tuple(map(str, r))
        for r in chunk_documents(
            _docs(spark, rows), chunk_tokens=16, overlap=4
        ).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = sorted(
        tuple(map(str, r))
        for r in con.sql(chunk_documents_sql(chunk_tokens=16, overlap=4)).fetchall()
    )
    assert got == exp
