"""jusText-style boilerplate removal: block split, context-free rules,
context pass, main-text reassembly, DuckDB twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from crawlspark.operators.boilerplate import (
    classify_blocks,
    classify_blocks_sql,
    extract_main_text,
)

# One page exercising every rule. Stopwords (textops.STOPWORDS):
# the a and of to in value table.
GOOD_PARA = (
    "the value of a table in the value of a table and the value of a "
    "table and the value of a table and the value of a table and the "
    "value of a table and the value of a table and the value of a "
    "table in the end of a row"
)  # > 200 chars, stopword-dense -> cf good
NEAR_PARA = (
    "a value of the table in a value and the value of a nice table in a value here"
)  # 70..200 chars, stopword-dense -> cf near_good
LOW_PARA = (
    "quick brown foxes jump over lazy dogs while seventeen astronauts "
    "calibrate gyroscopes beneath crimson skies watching meteor showers"
)  # long but stopword-free -> cf bad
NAV = '<a href="/x">home</a> <a href="/y">products</a> <a href="/z">contact</a>'
SHORT = "tiny fragment"  # < 70 chars, no links -> cf short


def _page(doc_id: int) -> tuple[int, str]:
    html = (
        f"<div>{NAV}</div>"
        f"<p>{GOOD_PARA}</p>"
        f"<p>{SHORT}</p>"
        f"<p>{NEAR_PARA}</p>"
        f"<p>{LOW_PARA}</p>"
        f"<p>&copy; 2020 example corp all rights reserved forever and ever</p>"
        "<footer></footer>"
    )
    return (doc_id, html)


@pytest.fixture(scope="module")
def page_df(spark):
    return spark.createDataFrame([_page(1)], "doc_id long, html string")


def test_context_free_rules_and_context_pass(spark, page_df):
    rows = sorted(
        classify_blocks(page_df).collect(), key=lambda r: r.block_idx
    )
    by_text = {r.block_text[:12]: r for r in rows}
    nav = by_text["home product"]
    # 19 linked chars / 21 text chars (inter-anchor spaces aren't linked)
    assert nav.label_cf == "bad" and nav.link_density_micro == 904_761
    good = by_text[GOOD_PARA[:12]]
    assert good.label_cf == "good" and good.label == "good"
    short = by_text["tiny fragmen"]
    assert short.label_cf == "short"
    # short sits between two confident-good-reachable neighbors -> good
    assert short.label == "good"
    assert good.n_chars > 200
    near = by_text[NEAR_PARA[:12]]
    assert 70 <= near.n_chars <= 200
    assert near.label_cf == "near_good" and near.label == "good"
    low = by_text[LOW_PARA[:12]]
    assert low.label_cf == "bad" and low.label == "bad"
    copyright_block = by_text["&copy; 2020 "]
    assert copyright_block.label_cf == "bad"
    # the empty <footer></footer> segment and tag-only gaps are dropped
    assert all(r.n_chars > 0 for r in rows)


def test_uncertain_blocks_with_no_good_neighbor_are_bad(spark):
    html = f"<div>{NAV}</div><p>{SHORT}</p><p>{LOW_PARA}</p>"
    rows = classify_blocks(
        spark.createDataFrame([(1, html)], "doc_id long, html string")
    ).collect()
    short = next(r for r in rows if r.label_cf == "short")
    assert short.label == "bad"  # neighbors are bad on both sides


def test_linked_short_block_is_bad_not_short(spark):
    html = '<p>see <a href="/m">more</a></p>'
    r = classify_blocks(
        spark.createDataFrame([(1, html)], "doc_id long, html string")
    ).collect()[0]
    assert r.label_cf == "bad" and r.link_density_micro > 0


def test_extract_main_text_reassembles_in_block_order(spark, page_df):
    classified = classify_blocks(page_df)
    out = extract_main_text(classified).collect()
    assert len(out) == 1
    main = out[0].main_text
    # good blocks in order: GOOD_PARA, SHORT (promoted), NEAR_PARA (promoted)
    assert main == f"{GOOD_PARA} {SHORT} {NEAR_PARA}"
    assert out[0].n_good_blocks == 3
    # an all-boilerplate page survives with empty main text
    nav_only = spark.createDataFrame(
        [(7, f"<div>{NAV}</div>")], "doc_id long, html string"
    )
    row = extract_main_text(classify_blocks(nav_only)).collect()[0]
    assert row.main_text == "" and row.n_good_blocks == 0


def test_duckdb_twin_matches_on_planted_pages(spark):
    pages = [_page(i) for i in range(6)] + [
        (100, f"<p>{SHORT}</p>"),
        (101, f"<ul><li>{NEAR_PARA}</li><li>{GOOD_PARA}</li></ul>"),
        (102, "<p></p><p></p>"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = sorted(
        tuple(map(str, r)) for r in classify_blocks(df).collect()
    )
    con = duckdb.connect()
    con.register("pages_v", df.toPandas())
    exp = sorted(
        tuple(map(str, r))
        for r in con.sql(classify_blocks_sql("pages_v")).fetchall()
    )
    assert got == exp
    assert len(got) > 10
