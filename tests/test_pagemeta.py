"""Page metadata extraction (operators/pagemeta.py)."""

import duckdb
import pandas as pd

from crawlspark.operators.pagemeta import page_metadata, page_metadata_sql


def _pages():
    return [
        (0, "<html><head><TITLE>Hello World</TITLE>"
            '<meta name="description" content="a page about things">'
            '<meta charset="UTF-8"></head><p>x</p></html>'),
        (1, '<meta property="og:title" content="OG Name">'
            '<meta NAME="Description" content="cased attrs">'
            "<title></title>"),                       # empty title != missing
        (2, '<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'),
        (3, "<p>no head metadata at all</p>"),
        (4, "<title>first</title><title>second</title>"
            '<meta name="description" content="first d">'
            '<meta name="description" content="second d">'),
    ]


def test_field_extraction(spark):
    df = spark.createDataFrame(_pages(), "doc_id long, html string")
    out = {r.doc_id: r for r in page_metadata(df).collect()}
    assert out[0].title == "Hello World"
    assert out[0].meta_description == "a page about things"
    assert out[0].charset == "utf-8"
    assert out[0].og_title is None
    assert out[1].title == "" and out[1].og_title == "OG Name"
    assert out[1].meta_description == "cased attrs"
    assert out[2].charset == "iso-8859-1"
    assert out[3].title is None and out[3].meta_description is None
    assert out[3].charset is None
    assert out[4].title == "first" and out[4].meta_description == "first d"


def test_duckdb_twin_matches(spark):
    rows = _pages()
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = sorted(tuple(map(str, r)) for r in page_metadata(df).collect())
    con = duckdb.connect()
    con.register("pages_v", pd.DataFrame(rows, columns=["doc_id", "html"]))
    exp = sorted(
        tuple(map(str, r))
        for r in con.sql(page_metadata_sql(table="pages_v", html_col="html")).fetchall()
    )
    assert got == exp
