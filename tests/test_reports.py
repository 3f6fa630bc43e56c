"""Incremental report updates (O16-O23): delta-merge must equal the
from-scratch aggregate, cursors are independent per report (O30)."""

import datetime as dt

from pyspark.sql import functions as F

from crawlspark.plans.reports import (
    ReportStore,
    page_count_by_day,
    page_count_by_day_kind,
    update_reports,
)
from crawlspark.testdata import build_pages, pages_only


def test_incremental_merge_equals_full_aggregate(spark, tmp_path):
    """Run reports over a growing log in two increments; the merged
    result must equal one-shot aggregation over everything (O21)."""
    full = pages_only(build_pages(spark, 240, n_hosts=8))
    cut = dt.datetime(2024, 3, 1, 0, 7)  # mid-log split
    first, rest = full.where(F.col("warc_ts") <= F.lit(cut)), full

    root = str(tmp_path / "reports")
    update_reports(spark, first, root)
    n2 = update_reports(spark, rest, root)
    assert n2["page_count_by_day"] > 0  # second run saw only the delta

    store = ReportStore(root)
    got = {
        (r["day"], r["value"]) for r in store.read(spark, "page_count_by_day").collect()
    }
    exp = {(r["day"], r["value"]) for r in page_count_by_day(full).collect()}
    assert got == exp

    got_kind = {
        (r["day"], r["details"], r["deletes"])
        for r in store.read(spark, "page_count_by_day_kind").collect()
    }
    exp_kind = {
        (r["day"], r["details"], r["deletes"])
        for r in page_count_by_day_kind(full).collect()
    }
    assert got_kind == exp_kind


def test_second_run_with_no_delta_is_noop(spark, tmp_path):
    full = pages_only(build_pages(spark, 100, n_hosts=5))
    root = str(tmp_path / "reports")
    update_reports(spark, full, root)
    before = sorted(ReportStore(root).read(spark, "page_count_by_day").collect())
    counts = update_reports(spark, full, root)
    assert all(v == 0 for v in counts.values())  # cursor skipped everything
    after = sorted(ReportStore(root).read(spark, "page_count_by_day").collect())
    assert before == after


def test_deleted_pages_append_report(spark, tmp_path):
    full = pages_only(build_pages(spark, 200, n_hosts=6))
    root = str(tmp_path / "reports")
    update_reports(spark, full, root, names=("deleted_pages",))
    got = ReportStore(root).read(spark, "deleted_pages")
    exp = full.where(F.col("url").rlike(r"^https://[^/]+/private/")).count()
    assert got.count() == exp
    # csv mirror exists with the round-trip timestamp format (O23)
    import glob
    csv = glob.glob(str(tmp_path / "reports" / "deleted_pages.csv" / "*.csv"))
    assert csv, "csv mirror missing"
    header = open(csv[0]).readline().strip().split(",")
    assert header == ["warc_ts", "url"]


def test_report_cursors_are_independent(spark, tmp_path):
    full = pages_only(build_pages(spark, 120, n_hosts=5))
    root = str(tmp_path / "reports")
    update_reports(spark, full, root, names=("page_count_by_day",))
    store = ReportStore(root)
    assert store.cursor("page_count_by_day") > dt.datetime(2000, 1, 1)
    assert store.cursor("deleted_pages") == dt.datetime(1, 1, 1)  # untouched (O29/O30)
