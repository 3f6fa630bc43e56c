"""Mirror-path formatting (O25/O26 + --format-paths): golden cases from
the reference's PathFormatterTests
(test/CatalogCrawler.Test/Logic/PathFormatterTests.cs:7-33), the URL →
destination mapping gates (Downloader.cs:246-279), the DuckDB twin, and
the physical disk mirror end-to-end through catalog_crawl."""

import datetime as dt
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawlspark.functions.paths import (  # noqa: E402
    format_leaf_path,
    format_page_path,
    mirror_path,
    mirror_path_oracle_sql,
)

# PathFormatterTests.FormatsPagePath golden table, verbatim
PAGE_CASES = [
    ("page-1.json", "page-1.json"),
    ("page0.json", "page0-page499/page0.json"),
    ("catalog/page0.json", "catalog/page0-page499/page0.json"),
    ("page498.json", "page0-page499/page498.json"),
    ("page499.json", "page0-page499/page499.json"),
    ("page500.json", "page500-page999/page500.json"),
    ("page1000.json", "page1000-page1499/page1000.json"),
]

# PathFormatterTests.FormatsLeafPath golden table, verbatim
LEAF_CASES = [
    ("2020.10.20.12.30/a.json", "2020.10.20.12.30/a.json"),
    ("2020/10/20/12/30.15/a.json", "2020/10/20/12/30.15/a.json"),
    ("2020.10.20.12.30.15/a.json", "2020/10/20/12/30.15/a.json"),
    ("catalog/2020.10.20.12.30.15/a.json", "catalog/2020/10/20/12/30.15/a.json"),
]


def _apply(spark, fn, cases):
    df = spark.createDataFrame([(p,) for p, _ in cases], "p string")
    return [r[0] for r in df.select(fn("p")).collect()]


def test_format_page_path_reference_goldens(spark):
    assert _apply(spark, format_page_path, PAGE_CASES) == [e for _, e in PAGE_CASES]


def test_format_leaf_path_reference_goldens(spark):
    assert _apply(spark, format_leaf_path, LEAF_CASES) == [e for _, e in LEAF_CASES]


URLS = [
    # valid, exercising both formatters
    "https://api.example.org/v3/catalog0/page0.json",
    "https://api.example.org/v3/catalog0/page499.json",
    "https://api.example.org/v3/catalog0/page500.json",
    "https://api.example.org/v3/catalog0/2020.10.20.12.30.15/pkg.a.1.0.0.json",
    "https://api.example.org:443/v3/index.json",  # explicit default port ok
    "https://api.example.org/v3/2020.10.20.12.30/a.json",  # 5-part ts: no explode
    # each invalid case hits a distinct Downloader.cs gate
    "http://api.example.org/v3/index.json",       # not https
    "https://api.example.org:8443/v3/index.json",  # non-default port
    "https://api.example.org/v3/x.json?q=1",       # query string
    "https://api.example.org",                     # empty path
    "https://api.example.org/.hidden/x.json",      # dot segment
]


def test_mirror_path_valid_and_invalid(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = dict(
        df.select("url", mirror_path("url", format_paths=True, strict=False).alias("d"))
        .collect()
    )
    assert got["https://api.example.org/v3/catalog0/page0.json"] == (
        "api.example.org/v3/catalog0/page0-page499/page0.json"
    )
    assert got["https://api.example.org/v3/catalog0/page500.json"] == (
        "api.example.org/v3/catalog0/page500-page999/page500.json"
    )
    assert got["https://api.example.org/v3/catalog0/2020.10.20.12.30.15/pkg.a.1.0.0.json"] == (
        "api.example.org/v3/catalog0/2020/10/20/12/30/15/pkg.a.1.0.0.json"
        .replace("/30/15/", "/30.15/")  # mm.ss stays one segment
    )
    assert got["https://api.example.org:443/v3/index.json"] == "api.example.org/v3/index.json"
    assert got["https://api.example.org/v3/2020.10.20.12.30/a.json"] == (
        "api.example.org/v3/2020.10.20.12.30/a.json"
    )
    for bad in URLS[6:]:
        assert got[bad] is None, bad


def test_mirror_path_strict_raises_in_plan(spark):
    from pyspark.errors import PySparkException

    df = spark.createDataFrame([("http://x.example/a.json",)], "url string")
    with pytest.raises(PySparkException):
        df.select(mirror_path("url", strict=True)).collect()


@pytest.mark.parametrize("fp", [False, True])
def test_mirror_path_matches_duckdb_twin(spark, fp):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = sorted(
        (r["url"], r["d"])
        for r in df.select(
            "url", mirror_path("url", format_paths=fp, strict=False).alias("d")
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{u}')" for u in URLS)
        + ") v(url)"
    )
    exp = sorted(con.sql(mirror_path_oracle_sql("t", "url", format_paths=fp)).fetchall())
    assert got == exp


def _mini_catalog(spark):
    """Two catalog pages, four leaves, reference-shaped https URLs."""
    base = dt.datetime(2020, 10, 20, 12, 0, 0)
    idx = spark.createDataFrame(
        [(0, base + dt.timedelta(minutes=30, seconds=15)),
         (1, base + dt.timedelta(hours=1))],
        "page_no int, page_ts timestamp",
    )
    leaves = [
        (f"https://cat.example.org/v3/catalog0/2020.10.20.12.30.15/pkg{i}.json",
         base + dt.timedelta(minutes=30, seconds=15),
         ('{"id": "pkg%d"}' % i).encode(), '{"id": "pkg%d"}' % i, "en")
        for i in range(2)
    ] + [
        (f"https://cat.example.org/v3/catalog0/2020.10.20.13.00.00/pkg{i}.json",
         base + dt.timedelta(hours=1),
         ('{"id": "late%d"}' % i).encode(), '{"id": "late%d"}' % i, "en")
        for i in range(2)
    ]
    pages = spark.createDataFrame(
        leaves, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    return pages, idx


def test_download_mirrors_formatted_paths(spark, tmp_path):
    from crawlspark.plans.epoch import catalog_crawl

    pages, idx = _mini_catalog(spark)
    mirror = str(tmp_path / "data")
    res = catalog_crawl(
        spark, pages, idx, str(tmp_path / "state"),
        depth="leaf", mirror_dir=mirror, format_paths=True,
    )
    assert res["leaves"] == 4
    p = os.path.join(
        mirror, "cat.example.org/v3/catalog0/2020/10/20/12/30.15/pkg0.json"
    )
    assert os.path.exists(p), sorted(
        os.path.join(r, f) for r, _, fs in os.walk(mirror) for f in fs
    )
    with open(p) as f:
        assert f.read() == '{"id": "pkg0"}'
    assert os.path.exists(os.path.join(
        mirror, "cat.example.org/v3/catalog0/2020/10/20/13/00.00/pkg1.json"
    ))


def test_download_mirror_unformatted_and_idempotent(spark, tmp_path):
    from crawlspark.plans.epoch import catalog_crawl

    pages, idx = _mini_catalog(spark)
    mirror = str(tmp_path / "data")
    catalog_crawl(spark, pages, idx, str(tmp_path / "s1"), depth="leaf",
                  mirror_dir=mirror)
    p = os.path.join(
        mirror, "cat.example.org/v3/catalog0/2020.10.20.12.30.15/pkg1.json"
    )
    assert os.path.exists(p)
    before = open(p).read()
    # fresh state dir → full re-download → same bytes, no tmp litter
    catalog_crawl(spark, pages, idx, str(tmp_path / "s2"), depth="leaf",
                  mirror_dir=mirror)
    assert open(p).read() == before
    litter = [
        f for r, _, fs in os.walk(mirror) for f in fs if "__tmp-" in f
    ]
    assert not litter


def test_mirror_rejects_path_escape(spark, tmp_path):
    from crawlspark.sources.mirror import write_mirror
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame(
        [("../outside.txt", "x")], "dest string, content string"
    )
    with pytest.raises(Py4JJavaError):
        write_mirror(df, str(tmp_path / "m"))
    assert not os.path.exists(str(tmp_path / "outside.txt"))
