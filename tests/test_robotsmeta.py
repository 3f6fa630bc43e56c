"""Robots-meta + nofollow link admission (operators/robotsmeta.py)."""

import duckdb
import pandas as pd

from crawlspark.operators.robotsmeta import (
    admissible_links,
    admissible_links_sql,
    robots_meta_flags,
)


def _pages():
    return [
        (0, '<html><a href="/a">x</a><a rel="nofollow" href="/b">y</a></html>'),
        (1, '<meta name="robots" content="noindex, nofollow">'
            '<a href="/c">z</a>'),
        (2, '<META CONTENT="NONE" NAME="robots"><a HREF="/d">w</a>'),   # order+case
        (3, '<meta name="robots" content="noarchive">'                  # irrelevant
            '<a href="/e" rel="me nofollow ugc">v</a><a href="">empty</a>'),
        (4, "<p>no tags at all</p>"),
        (5, '<meta name="viewport" content="nofollow">'                 # wrong name
            '<a href="/f">u</a>'),
    ]


def test_meta_flags(spark):
    df = spark.createDataFrame(_pages(), "doc_id long, html string")
    out = {r.doc_id: (r.noindex, r.nofollow_page)
           for r in robots_meta_flags(df).collect()}
    assert out[0] == (False, False)
    assert out[1] == (True, True)
    assert out[2] == (True, True)          # none == noindex+nofollow; attr order free
    assert out[3] == (False, False)        # noarchive is not ours
    assert out[4] == (False, False)
    assert out[5] == (False, False)        # name != robots never matches


def test_link_admission(spark):
    df = spark.createDataFrame(_pages(), "doc_id long, html string")
    out = {(r.doc_id, r.href): (r.link_nofollow, r.admissible)
           for r in admissible_links(df).collect()}
    assert out[(0, "/a")] == (False, True)
    assert out[(0, "/b")] == (True, False)          # rel=nofollow on the link
    assert out[(1, "/c")] == (False, False)         # page-level nofollow
    assert out[(2, "/d")] == (False, False)         # none implies nofollow
    assert out[(3, "/e")] == (True, False)          # nofollow inside multi-rel
    assert (3, "") not in out                        # empty href dropped
    assert not any(k[0] == 4 for k in out)           # no anchors -> no rows
    assert out[(5, "/f")] == (False, True)


def test_duckdb_twin_matches(spark):
    rows = _pages()
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = sorted(tuple(map(str, r)) for r in admissible_links(df).collect())
    con = duckdb.connect()
    con.register("pages_v", pd.DataFrame(rows, columns=["doc_id", "html"]))
    exp = sorted(
        tuple(map(str, r))
        for r in con.sql(
            admissible_links_sql(table="pages_v", html_col="html")
        ).fetchall()
    )
    assert got == exp
