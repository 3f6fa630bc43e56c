"""Encoding repair (operators/fixtext.py): mojibake map correctness,
count audit, control/NBSP handling, DuckDB twin parity."""

import duckdb
import pandas as pd

from crawlspark.operators.fixtext import (
    MOJIBAKE,
    repair_encoding,
    repair_encoding_sql,
)


def test_mojibake_map_is_real_cp1252_mojibake():
    # the table is computed, but pin the two highest-frequency entries
    assert MOJIBAKE["â€™"] == "’"
    assert MOJIBAKE["Ã©"] == "é"
    # every artifact is the cp1252 misdecode of its repair's UTF-8 bytes
    for artifact, char in MOJIBAKE.items():
        assert char.encode("utf-8").decode("cp1252") == artifact


def _rows():
    return [
        (0, "itâ€™s a â€œtestâ€¦ donâ€™t panic"),          # 4 artifacts
        (1, "rÃ©sumÃ© and cafÃ©"),                           # 3 artifacts
        (2, "plain ascii stays"),                            # untouched
        (3, "bad\x00ctrl\x1fhere\ttab ok\nnewline ok"),      # 2 ctrl, keep \t\n
        (4, "non breaking spaces"),                # 2 nbsp
        (5, ""),
    ]


def test_repair_goldens(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, text string")
    out = {r.doc_id: r for r in repair_encoding(df).collect()}
    assert out[0].text_fixed == "it’s a “test… don’t panic"
    assert out[0].n_mojibake == 4
    assert out[1].text_fixed == "résumé and café"
    assert out[1].n_mojibake == 3
    assert out[2].text_fixed == "plain ascii stays" and out[2].n_mojibake == 0
    assert out[3].text_fixed == "badctrlhere\ttab ok\nnewline ok"
    assert out[3].n_ctrl == 2
    assert out[4].text_fixed == "non breaking spaces" and out[4].n_nbsp == 2
    assert out[5].text_fixed == ""


def test_duckdb_twin_matches(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(map(str, r)) for r in repair_encoding(df).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = sorted(
        tuple(map(str, r)) for r in con.sql(repair_encoding_sql()).fetchall()
    )
    assert got == exp
