"""Change-rate estimation + revisit scheduling (operators/recrawl.py)."""

from datetime import datetime, timedelta

import duckdb

from crawlspark.operators.recrawl import (
    change_history_sql,
    change_history_stats,
    schedule_recrawl_by_change_rate,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)
DAY = timedelta(days=1)


def _visits():
    rows = []
    # a: 3 visits, 1 change on the last -> ratio 0.5
    rows += [("a", T0, "x"), ("a", T0 + DAY, "x"), ("a", T0 + 2 * DAY, "y")]
    # b: single visit -> no evidence
    rows += [("b", T0 + DAY, "x")]
    # c: changes on every revisit -> ratio 1.0
    rows += [("c", T0 + i * DAY, f"f{i}") for i in range(5)]
    # d: static across a long span -> max interval
    rows += [("d", T0 + 10 * i * DAY, "same") for i in range(4)]
    return rows


def _stats_df(spark):
    df = spark.createDataFrame(
        _visits(), "url string, fetch_ts timestamp, content_fp string"
    )
    return change_history_stats(df)


def test_change_history_stats_goldens(spark):
    s = {r.url: r for r in _stats_df(spark).collect()}
    a = s["a"]
    assert (a.n_visits, a.n_changes, a.span_s) == (3, 1, 2 * 86400)
    assert a.change_ratio_micro == 500_000
    assert a.last_fp == "y"
    b = s["b"]
    assert (b.n_visits, b.n_changes, b.span_s) == (1, 0, 0)
    assert b.change_ratio_micro is None
    c = s["c"]
    assert (c.n_visits, c.n_changes) == (5, 4)
    assert c.change_ratio_micro == 1_000_000
    d = s["d"]
    assert (d.n_visits, d.n_changes) == (4, 0)


def test_schedule_policy_and_staleness(spark):
    sched = {
        r.url: r
        for r in schedule_recrawl_by_change_rate(
            _stats_df(spark),
            now="2024-01-20 00:00:00",
            min_interval_s=3600,
            max_interval_s=10 * 86400,
        ).collect()
    }
    a = sched["a"]
    # span 2d / (2*1 change) = 1 day
    assert a.interval_s == 86400
    assert a.elapsed_s == 17 * 86400
    assert a.staleness_micro == 17_000_000 and a.due
    c = sched["c"]
    # span 4d / (2*4) = half a day
    assert c.interval_s == 43200 and c.due
    # never-changed urls sit at the max interval
    assert sched["b"].interval_s == 10 * 86400 and sched["d"].interval_s == 10 * 86400
    # d's last visit was 2024-01-31 — in the future of `now`, elapsed < 0,
    # not due (a replayed schedule must not re-enqueue fresh fetches)
    assert not sched["d"].due and sched["d"].staleness_micro < 0
    # b: last visit Jan 2, elapsed 18d >= the 10d max interval -> due
    assert sched["b"].due


def test_min_interval_clamp(spark):
    sched = {
        r.url: r
        for r in schedule_recrawl_by_change_rate(
            _stats_df(spark),
            now="2024-01-20 00:00:00",
            min_interval_s=50_000,
            max_interval_s=10 * 86400,
        ).collect()
    }
    assert sched["c"].interval_s == 50_000  # 43200 clamped up


def test_duckdb_twin_matches(spark):
    import pandas as pd

    got = sorted(tuple(map(str, r)) for r in _stats_df(spark).collect())
    con = duckdb.connect()
    pdf = pd.DataFrame(_visits(), columns=["url", "fetch_ts", "content_fp"])
    con.register("visits_v", pdf)
    exp = sorted(
        tuple(map(str, r))
        for r in con.sql(change_history_sql("visits_v")).fetchall()
    )
    assert got == exp


def test_revalidate_fetched_end_to_end(spark, crawl_run):
    """Crawl -> mutate the source -> revalidate: the changed/unchanged/
    gone partition is exact, and unchanged rows carry no text."""
    from pyspark.sql import functions as F

    from crawlspark.operators.recrawl import revalidate_fetched
    from crawlspark.plans.state import CrawlState

    state_dir, _ = crawl_run
    fetched = (
        CrawlState(state_dir).fetched.read(spark)
        .where(F.col("status") == "ok")
        .select("url", "text", "warc_ts")
    )
    urls = [r.url for r in fetched.select("url").collect()]
    changed_set = set(urls[::7])
    gone_set = set(urls[3::13]) - changed_set
    # rebuild a pages snapshot from the stored text: same body for
    # unchanged urls (html chrome may differ - a <title> is prepended to
    # every page, which must NOT count as change), ' CHANGED' appended
    # inside the body for the changed set, rows dropped for the gone set
    base = fetched.select(
        "url",
        F.col("warc_ts").alias("new_ts"),
        F.when(F.col("url").isin(*changed_set),
               F.concat(F.lit("<title>x</title><p>"), F.col("text"), F.lit(" CHANGED</p>")))
         .otherwise(F.concat(F.lit("<title>x</title><p>"), F.col("text"), F.lit("</p>")))
         .alias("html_str"),
    )
    pages2 = (
        base.where(~F.col("url").isin(*gone_set))
        .select("url", F.encode("html_str", "utf-8").alias("html"),
                F.col("new_ts").alias("warc_ts"))
    )
    out = revalidate_fetched(pages2, fetched).collect()
    assert len(out) == len(urls)
    got = {r.url: r for r in out}
    for u in urls:
        r = got[u]
        if u in gone_set:
            assert r.status == "gone" and r.new_fp is None
        elif u in changed_set:
            assert r.status == "changed" and r.new_fp != r.old_fp
            assert r.new_text is not None and r.new_text.endswith(" CHANGED")
        else:
            assert r.status == "unchanged" and r.new_fp == r.old_fp
            assert r.new_text is None  # the 304 case moves no bodies


def test_revalidate_respects_url_subset(spark, crawl_run):
    from pyspark.sql import functions as F

    from crawlspark.operators.recrawl import revalidate_fetched
    from crawlspark.plans.state import CrawlState

    state_dir, _ = crawl_run
    fetched = (
        CrawlState(state_dir).fetched.read(spark)
        .where(F.col("status") == "ok")
        .select("url", "text", "warc_ts")
    )
    pages2 = fetched.select(
        "url",
        F.encode(F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")), "utf-8").alias("html"),
        "warc_ts",
    )
    some = fetched.select("url").limit(5)
    out = revalidate_fetched(pages2, fetched, urls=some)
    assert out.count() == 5
    assert out.where(F.col("status") != "unchanged").count() == 0
