"""Incremental reports: cursor-driven derived aggregates over the pages log.

The reference's ``update-reports`` command re-runs the crawl loop with a
report visitor and merges per-page aggregates into CSVs
(Reports/CsvReportUpdater.cs:37-59). Here each report is a derived table
over the pages log with its **own watermark cursor** (O30), updated by:

    delta  = pages WHERE warc_ts ∈ (cursor, max]          (O5)
    agg    = groupBy(key).agg(...)                         (O10/O18/O19)
    merged = (existing ∪ agg).groupBy(key).sum(...)        (O21 merge)
    write  = orderBy(key) → atomic overwrite + CSV export  (O22/O17/O23)

The merge is the reference's only join-like operator: a full-outer
key-merge with element-wise sum (CsvAggregateReportVisitor.cs:21-74).
At scale the overwrite becomes an Iceberg ``MERGE INTO``; the delta agg
is map-side-partial and shuffles only the (tiny) key space.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlspark.operators.ordering import EPOCH_MIN

ISO_O_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSXXX"  # DateTimeOffset "O" analog (O23)


# -- report extractors (pure column logic) ----------------------------------

def deleted_pages(delta: DataFrame) -> DataFrame:
    """Append-style filter+project report (O16): /private/ pages are the
    'delete event' analog of nuget:PackageDelete
    (DeletedPackagesReportUpdater.cs:14-25)."""
    return (
        delta.where(F.col("url").rlike(r"^https://[^/]+/private/"))
        .select("warc_ts", "url")
    )


def page_count_by_day(delta: DataFrame) -> DataFrame:
    """Date-trunc group-count (O18, CatalogLeafCountReportUpdater.cs:18-25)."""
    return (
        delta.groupBy(F.date_trunc("DAY", F.col("warc_ts")).alias("day"))
        .agg(F.count("*").alias("value"))
    )


def page_count_by_day_kind(delta: DataFrame) -> DataFrame:
    """Conditional-count pivot (O19) + totals invariant (O20,
    CatalogLeafCountByTypeReportUpdater.cs:22-38): every page is exactly
    one of {details, delete}, so details+deletes == total."""
    kind = F.when(F.col("url").rlike(r"^https://[^/]+/private/"), "delete").otherwise("details")
    out = (
        delta.withColumn("kind", kind)
        .groupBy(F.date_trunc("DAY", F.col("warc_ts")).alias("day"))
        .agg(
            F.sum(F.when(F.col("kind") == "details", 1).otherwise(0)).alias("details"),
            F.sum(F.when(F.col("kind") == "delete", 1).otherwise(0)).alias("deletes"),
            F.count("*").alias("__total"),
        )
    )
    bad = out.where(F.col("details") + F.col("deletes") != F.col("__total")).count()
    if bad:
        raise ValueError(f"unknown page kind in {bad} day groups (O20 invariant)")
    return out.drop("__total")


# -- incremental store -------------------------------------------------------

class ReportStore:
    """Per-report parquet + CSV mirror + independent cursor file."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.root, f"_cursor.{name}.json")

    def cursor(self, name: str) -> dt.datetime:
        p = self._meta_path(name)
        if not os.path.exists(p):
            return EPOCH_MIN  # read-with-default (O29)
        with open(p) as f:
            return dt.datetime.fromisoformat(json.load(f)["cursor"])

    def _write_cursor(self, name: str, value: dt.datetime) -> None:
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"cursor": value.isoformat()}, f)
        os.replace(tmp, self._meta_path(name))

    def read(self, spark: SparkSession, name: str, schema=None) -> DataFrame | None:
        p = os.path.join(self.root, f"{name}.parquet")
        if not os.path.exists(p):
            return None
        return spark.read.parquet(p)

    def _overwrite(self, df: DataFrame, name: str, order_cols: list[str]) -> None:
        """Atomic read-merge-rewrite: stage, swap (the whole-file rewrite
        of CsvAggregateReportVisitor.cs:60-73, made atomic). The plan is
        executed exactly once, into the parquet stage; the CSV mirror is
        derived from the staged files — re-running the merged plan after
        the swap would read the (replaced) previous report."""
        final = os.path.join(self.root, f"{name}.parquet")
        stage = os.path.join(self.root, f"_stage.{name}.parquet")
        df.orderBy(*order_cols).write.mode("overwrite").parquet(stage)  # O22 sort
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(stage, final)
        # CSV mirror with round-trip timestamp format (O17/O23), from the
        # materialized parquet
        csv_stage = os.path.join(self.root, f"_stage.{name}.csv")
        csv_final = os.path.join(self.root, f"{name}.csv")
        out = df.sparkSession.read.parquet(final).orderBy(*order_cols)
        for field in out.schema.fields:
            if field.dataType.typeName() == "timestamp":
                out = out.withColumn(field.name, F.date_format(field.name, ISO_O_FMT))
        out.select(*df.columns).coalesce(1).write.mode("overwrite").option("header", True).csv(csv_stage)
        if os.path.exists(csv_final):
            shutil.rmtree(csv_final)
        os.rename(csv_stage, csv_final)

    def update_aggregate(
        self,
        spark: SparkSession,
        name: str,
        delta_agg: DataFrame,
        key_cols: list[str],
        sum_cols: list[str],
    ) -> None:
        """O21: full-outer key-merge with element-wise sum."""
        existing = self.read(spark, name)
        merged = (
            delta_agg if existing is None
            else existing.unionByName(delta_agg)
            .groupBy(*key_cols)
            .agg(*[F.sum(c).alias(c) for c in sum_cols])
        )
        self._overwrite(merged, name, key_cols)

    def update_append(self, spark: SparkSession, name: str, delta: DataFrame, order_cols: list[str]) -> None:
        """O17: append-style report (header-once CSV ≙ rewrite of the
        union — cheap because append reports are tiny projections)."""
        existing = self.read(spark, name)
        merged = delta if existing is None else existing.unionByName(delta)
        self._overwrite(merged, name, order_cols)


REPORTS = ("deleted_pages", "page_count_by_day", "page_count_by_day_kind")


def update_reports(
    spark: SparkSession,
    pages: DataFrame,
    report_root: str,
    names: tuple[str, ...] = REPORTS,
) -> dict[str, int]:
    """Incrementally update each selected report to the pages log's head,
    each under its own ``report.{name}`` cursor — independent consumers
    of one log (O30, UpdateReportsCommandHandler.cs:104-117)."""
    unknown = set(names) - set(REPORTS)
    if unknown:
        raise ValueError(f"unknown reports: {sorted(unknown)}")
    store = ReportStore(report_root)
    head = pages.agg(F.max("warc_ts")).first()[0]
    updated: dict[str, int] = {}
    for name in names:
        cursor = store.cursor(name)
        delta = pages.where(F.col("warc_ts") > F.lit(cursor)) if cursor > EPOCH_MIN else pages
        delta = delta.where(F.col("warc_ts") <= F.lit(head))
        n = delta.count()
        if n == 0:
            updated[name] = 0
            continue
        if name == "deleted_pages":
            store.update_append(spark, name, deleted_pages(delta), ["warc_ts", "url"])
        elif name == "page_count_by_day":
            store.update_aggregate(spark, name, page_count_by_day(delta), ["day"], ["value"])
        elif name == "page_count_by_day_kind":
            store.update_aggregate(
                spark, name, page_count_by_day_kind(delta), ["day"], ["details", "deletes"]
            )
        store._write_cursor(name, head)
        updated[name] = n
    return updated
