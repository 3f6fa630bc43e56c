"""Bucketed interval join: exact equality with the naive theta join
(reference semantics: Downloader.cs:120-131 leaf→page membership by
commit-timestamp range) and the BroadcastHashJoin plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from crawlspark.operators.intervals import bucketed_interval_join
from crawlspark.operators.ordering import EPOCH_MIN

BASE = dt.datetime(2024, 3, 1)


def _fixture(spark, n_rows=500, n_bounds=7):
    # disjoint half-open intervals (prev, page_ts]; first interval opens
    # at EPOCH_MIN like the catalog's first page
    cuts = [BASE + dt.timedelta(hours=3 * (i + 1)) for i in range(n_bounds)]
    bounds = spark.createDataFrame(
        [
            (i + 1, cuts[i], cuts[i - 1] if i else EPOCH_MIN)
            for i in range(n_bounds)
        ],
        "page_no int, page_ts timestamp, prev_ts timestamp",
    )
    # rows: spread inside the domain, some BEFORE the first cut (match
    # page 1), some exactly ON cuts (match that page, half-open), some
    # AFTER the last cut (match nothing)
    rows = spark.range(n_rows).select(
        F.col("id").alias("row_id"),
        (
            F.lit(BASE)
            + F.make_interval(mins=(F.col("id") * 37) % (60 * 3 * (7 + 2)) - 90)
        ).alias("ts"),
    )
    on_cuts = spark.createDataFrame(
        [(10_000 + i, cuts[i]) for i in range(n_bounds)], "row_id long, ts timestamp"
    )
    return rows.union(on_cuts), bounds


def _theta(rows, bounds):
    return (
        rows.alias("r")
        .join(
            F.broadcast(bounds).alias("b"),
            (F.col("r.ts") > F.col("b.prev_ts")) & (F.col("r.ts") <= F.col("b.page_ts")),
        )
        .select("r.row_id", "b.page_no")
    )


def test_equals_theta_join(spark):
    rows, bounds = _fixture(spark)
    got = bucketed_interval_join(rows, bounds, ts_col="ts").select("row_id", "page_no")
    want = _theta(rows, bounds)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # sanity: each matched row matched exactly one interval, and the
    # after-the-last-cut rows are absent
    n = got.count()
    assert got.select("row_id").distinct().count() == n
    assert n < rows.count()


@pytest.mark.parametrize("bpb", [1, 4, 16])
def test_bucket_width_invariance(spark, bpb):
    rows, bounds = _fixture(spark, n_rows=200, n_bounds=3)
    got = bucketed_interval_join(
        rows, bounds, ts_col="ts", buckets_per_bound=bpb
    ).select("row_id", "page_no")
    want = _theta(rows, bounds)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_single_interval_and_degenerate_domain(spark):
    bounds = spark.createDataFrame(
        [(1, BASE, EPOCH_MIN)], "page_no int, page_ts timestamp, prev_ts timestamp"
    )
    rows = spark.createDataFrame(
        [(1, BASE), (2, BASE - dt.timedelta(days=400)), (3, BASE + dt.timedelta(seconds=1))],
        "row_id long, ts timestamp",
    )
    got = bucketed_interval_join(rows, bounds, ts_col="ts").select("row_id").collect()
    assert sorted(r["row_id"] for r in got) == [1, 2]


def test_plan_is_broadcast_hash_join(spark):
    rows, bounds = _fixture(spark)
    plan = (
        bucketed_interval_join(rows, bounds, ts_col="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the membership join itself must be a hash join on the bucket key;
    # the only nested loops allowed are the 1-row stats cross joins
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2
