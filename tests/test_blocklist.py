"""Domain blocklist: suffix-match semantics, plan shape (no shuffle of
the input, one reused broadcast), and crawl integration (blocked hosts
never fetched, from seeds or from discovered links)."""

from pyspark.sql import functions as F

from crawlspark.operators.blocklist import filter_blocked_hosts


def _df(spark, urls):
    return spark.createDataFrame([(u, i) for i, u in enumerate(urls)], "url string, id int")


def test_suffix_match_semantics(spark):
    urls = [
        "https://example.com/p",          # exact match -> blocked
        "https://www.example.com/p",      # subdomain -> blocked
        "https://a.b.c.example.com/p",    # deep subdomain -> blocked
        "https://notexample.com/p",       # suffix only on dot boundary -> kept
        "https://example.com.evil.org/p", # blocked domain as PREFIX -> kept
        "https://good.org/p",             # kept
    ]
    bl = spark.createDataFrame([("example.com",)], "domain string")
    kept = sorted(r.url for r in filter_blocked_hosts(_df(spark, urls), bl).collect())
    assert kept == sorted(
        ["https://notexample.com/p", "https://example.com.evil.org/p", "https://good.org/p"]
    )


def test_multi_label_and_empty_blocklist(spark):
    urls = ["https://x.co.uk/p", "https://bad.co.uk/p", "https://sub.bad.co.uk/p"]
    bl = spark.createDataFrame([("bad.co.uk",)], "domain string")
    kept = {r.url for r in filter_blocked_hosts(_df(spark, urls), bl).collect()}
    assert kept == {"https://x.co.uk/p"}
    empty = spark.createDataFrame([], "domain string")
    assert filter_blocked_hosts(_df(spark, urls), empty).count() == 3


def test_plan_no_shuffle_one_broadcast(spark):
    urls = [f"https://h{i}.example/p{i}" for i in range(20)]
    bl = spark.createDataFrame([("h3.example",), ("h4.example",)], "domain string")
    out = filter_blocked_hosts(_df(spark, urls), bl)
    out.collect()  # AQE folds exchange reuse in only at execution
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the adaptive plan string carries final + initial sections; only
    # the final one is what ran
    final = plan.split("== Initial Plan ==")[0]
    # all 8 levels are broadcast hash anti-joins; the input stream is
    # never exchanged — the only hashpartitioning belongs to the tiny
    # blocklist distinct, built once and reused per suffix level
    assert final.count("LeftAnti") == 8
    assert final.count("+- BroadcastExchange") == 1
    assert final.count("+- ReusedExchange") == 7
    assert "hashpartitioning(url" not in final and "hashpartitioning(__suf" not in final


def test_crawl_blocklist_integration(spark, tmp_path):
    """A host on the blocklist is never fetched — not from seeds, not
    via discovered links — and the rest of the crawl is unchanged."""
    from crawlspark.plans.epoch import CrawlConfig, web_crawl
    from crawlspark.plans.state import CrawlState
    from crawlspark.testdata import write_corpus

    paths = write_corpus(spark, str(tmp_path / "corpus"), n_pages=150, n_hosts=6)
    pages = spark.read.parquet(paths["pages"])
    seeds = spark.read.parquet(paths["seeds"])

    # pick a host that an unblocked crawl actually fetches
    sd0 = str(tmp_path / "s0")
    web_crawl(spark, pages, sd0, seeds, config=CrawlConfig(default_budget=4, max_epochs=3))
    f0 = CrawlState(sd0).fetched.read(spark)
    hosts0 = {r.host for r in f0.select("host").distinct().collect()}
    victim = sorted(hosts0)[0]

    bl = spark.createDataFrame([(victim,)], "domain string")
    sd1 = str(tmp_path / "s1")
    web_crawl(
        spark, pages, sd1, seeds,
        blocklist=bl, config=CrawlConfig(default_budget=4, max_epochs=3),
    )
    f1 = CrawlState(sd1).fetched.read(spark)
    hosts1 = {r.host for r in f1.select("host").distinct().collect()}
    assert victim not in hosts1
    assert hosts1 == hosts0 - {victim}
