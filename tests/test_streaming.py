"""Streaming report twins equal their batch counterparts."""

import os

from crawlspark.plans.reports import ReportStore, page_count_by_day
from crawlspark.streaming.reports import stream_count_by_day, stream_update_reports
from crawlspark.testdata import build_pages, pages_only


def _pages_dir(spark, tmp_path, n=160):
    d = str(tmp_path / "pages.parquet")
    pages_only(build_pages(spark, n, n_hosts=6)).write.mode("overwrite").parquet(d)
    return d


def test_stream_count_by_day_matches_batch(spark, tmp_path):
    d = _pages_dir(spark, tmp_path)
    q = stream_count_by_day(spark, d, query_name="t_day_stream")
    q.awaitTermination(120)
    got = {
        (r["day"], r["value"])
        for r in spark.sql("SELECT * FROM t_day_stream").collect()
    }
    exp = {(r["day"], r["value"]) for r in page_count_by_day(spark.read.parquet(d)).collect()}
    assert got == exp


def test_foreachbatch_merge_matches_batch_store(spark, tmp_path):
    d = _pages_dir(spark, tmp_path)
    root = str(tmp_path / "reports")
    q = stream_update_reports(spark, d, root, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {
        (r["day"], r["value"])
        for r in ReportStore(root).read(spark, "page_count_by_day").collect()
    }
    exp = {(r["day"], r["value"]) for r in page_count_by_day(spark.read.parquet(d)).collect()}
    assert got == exp
