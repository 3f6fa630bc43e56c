"""Spider-trap URL guards: feature exactness, each rule's boundary, and
the crawl-integration invariant (guard on == guard off over a clean
corpus — zero false positives in the real pipeline)."""

from pyspark.sql import functions as F

from crawlspark.operators.urltraps import (
    TRAP_MAX_PATH_DEPTH,
    filter_crawl_traps,
    url_trap_features,
)


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_feature_values(spark):
    rows = {
        r.url: r
        for r in url_trap_features(
            _urls(
                spark,
                [
                    "https://a.example/x/y/z",
                    "https://a.example/",
                    "https://a.example/p?a=1&b=2&c=3",
                    "https://a.example/cal/2024/2024/2024/2024/x",
                    "https://a.example/a/b/a/b",
                    "https://a.example/p?x=1#frag&not=param",
                ],
            )
        ).collect()
    }
    r = rows["https://a.example/x/y/z"]
    assert (r.path_depth, r.query_params, r.max_seg_repeat) == (3, 0, 1)
    r = rows["https://a.example/"]
    assert (r.path_depth, r.query_params, r.max_seg_repeat) == (0, 0, 0)
    assert rows["https://a.example/p?a=1&b=2&c=3"].query_params == 3
    assert rows["https://a.example/cal/2024/2024/2024/2024/x"].max_seg_repeat == 4
    assert rows["https://a.example/a/b/a/b"].max_seg_repeat == 2
    # fragment is not part of the query string
    assert rows["https://a.example/p?x=1#frag&not=param"].query_params == 1


def test_each_rule_boundary(spark):
    deep_ok = "https://a.example" + "/d" * 0 + "/" + "/".join(f"s{i}" for i in range(TRAP_MAX_PATH_DEPTH))
    deep_bad = deep_ok + "/one-more"
    qs_ok = "https://a.example/p?" + "&".join(f"k{i}=1" for i in range(8))
    qs_bad = "https://a.example/p?" + "&".join(f"k{i}=1" for i in range(9))
    rep_ok = "https://a.example/x/x/x"
    rep_bad = "https://a.example/x/x/x/x"
    len_bad = "https://a.example/l/" + "x" * 2048
    kept = {
        r.url
        for r in filter_crawl_traps(
            _urls(spark, [deep_ok, deep_bad, qs_ok, qs_bad, rep_ok, rep_bad, len_bad])
        ).collect()
    }
    assert kept == {deep_ok, qs_ok, rep_ok}


def test_filter_preserves_columns_and_rows(spark):
    df = spark.createDataFrame(
        [("https://a.example/ok", 1, "m"), ("https://a.example/" + "t/" * 20, 2, "n")],
        "url string, pri int, tag string",
    )
    out = filter_crawl_traps(df)
    assert out.columns == ["url", "pri", "tag"]
    assert [tuple(r) for r in out.collect()] == [("https://a.example/ok", 1, "m")]


def test_crawl_guard_no_false_positives(spark, tmp_path):
    """The synthetic corpus has clean URLs: a guard-on crawl must fetch
    the identical URL set as guard-off — zero false positives through
    the real link-admission path."""
    from crawlspark.plans.epoch import CrawlConfig, web_crawl
    from crawlspark.plans.state import CrawlState
    from crawlspark.testdata import write_corpus

    paths = write_corpus(spark, str(tmp_path / "corpus"), n_pages=150, n_hosts=6)
    pages = spark.read.parquet(paths["pages"])
    seeds = spark.read.parquet(paths["seeds"])

    outs = []
    for tag, guard in (("off", False), ("on", True)):
        state = str(tmp_path / f"s_{tag}")
        cfg = CrawlConfig(default_budget=3, max_epochs=2, trap_guard=guard)
        web_crawl(spark, pages, state, seeds, config=cfg)
        fetched = CrawlState(state).fetched.read(spark)
        outs.append(sorted(r.url for r in fetched.select("url").collect()))
    assert outs[0] == outs[1] and len(outs[0]) > 0
