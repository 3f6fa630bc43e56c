"""Redirect-chain resolution: pointer doubling vs known chains/loops,
hop-budget boundary, and link rewrite semantics."""

from pyspark.sql import functions as F

from crawlspark.operators.redirects import (
    resolve_redirects,
    rewrite_links_through_redirects,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(f"u{a}", f"u{b}") for a, b in pairs], "src string, dst string"
    )


def test_chains_loops_and_hop_budget(spark):
    # chain 1->2->3->4 (3 hops), 2-loop 5<->6, self-loop 7->7,
    # 70-hop chain 10..80 (over the 64 budget), direct 100->200
    pairs = [(1, 2), (2, 3), (3, 4), (5, 6), (6, 5), (7, 7), (100, 200)]
    pairs += [(i, i + 1) for i in range(10, 80)]
    out = {r.src: r for r in resolve_redirects(_edges(spark, pairs)).collect()}
    assert len(out) == len(pairs)

    assert (out["u1"].final_url, out["u1"].hops, out["u1"].unresolved) == ("u4", 3, False)
    assert (out["u100"].final_url, out["u100"].hops) == ("u200", 1)
    for loop in ("u5", "u6", "u7"):
        assert out[loop].unresolved and out[loop].final_url is None
        assert out[loop].hops == -1
    # hop-budget boundary: 64 hops resolves exactly at the cap, 65+ does not
    assert (out["u16"].final_url, out["u16"].hops) == ("u80", 64)
    assert out["u15"].unresolved  # 65 hops
    assert out["u10"].unresolved  # 70 hops


def test_custom_max_hops_and_validation(spark):
    import pytest

    pairs = [(1, 2), (2, 3), (3, 4)]
    out = {
        r.src: r
        for r in resolve_redirects(_edges(spark, pairs), max_hops=2).collect()
    }
    assert out["u2"].final_url == "u4" and out["u2"].hops == 2
    assert out["u1"].unresolved  # 3 hops > budget 2
    with pytest.raises(ValueError):
        resolve_redirects(_edges(spark, pairs), max_hops=0)


def test_rewrite_links_drops_loops_and_passes_through(spark):
    redirects = _edges(spark, [(1, 2), (2, 3), (5, 6), (6, 5)])
    links = spark.createDataFrame(
        [("u1", 10), ("u5", 20), ("u99", 30), ("u3", 40)], "url string, w int"
    )
    got = sorted(
        (r.url, r.w)
        for r in rewrite_links_through_redirects(links, redirects).collect()
    )
    # u1 -> terminal u3; u5 (loop) dropped; u99 and u3 untouched
    assert got == [("u3", 10), ("u3", 40), ("u99", 30)]


def test_rewrite_preserves_extra_columns_and_duplicate_links(spark):
    redirects = _edges(spark, [(1, 2)])
    links = spark.createDataFrame(
        [("u1", 1, "a"), ("u1", 2, "b")], "url string, w int, tag string"
    )
    got = sorted(
        (r.url, r.w, r.tag)
        for r in rewrite_links_through_redirects(links, redirects).collect()
    )
    assert got == [("u2", 1, "a"), ("u2", 2, "b")]
