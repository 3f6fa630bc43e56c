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

from pyspark.sql import DataFrame, Observation, SparkSession
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
    # O20 totals invariant, enforced IN the plan (raise_error fires during
    # the write job, before the stage swap — the reference throws during
    # visiting, CatalogLeafCountByTypeReportUpdater.cs:30-36) instead of a
    # standalone count action per update.
    guarded = F.when(
        F.col("details") + F.col("deletes") == F.col("__total"), F.col("details")
    ).otherwise(F.raise_error("unknown page kind (O20 invariant)").cast("bigint"))
    return out.withColumn("details", guarded).drop("__total")


# -- incremental store -------------------------------------------------------

class ReportStore:
    """Per-report parquet + CSV mirror + independent cursor file."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.root, f"_cursor.{name}.json")

    def cursor(self, name: str, default: dt.datetime | None = None) -> dt.datetime:
        """Read-with-default (O29); ``default`` is the reference's
        --default-cursor-value (UpdateReportsCommandHandler.cs:38-40,
        Cursor.cs:12-27) — it seeds a BRAND-NEW report's cursor (e.g.
        'reports from 2015 onward only'); a committed cursor always
        wins. For append reports the manifest is the commit log: an
        update whose data landed but whose cursor write was lost to a
        crash is repaired here (effective cursor = max of the cursor
        file and every applied update's head), so a replay neither
        re-appends those rows nor skips rows that arrived after the
        crash."""
        p = self._meta_path(name)
        base = default if default is not None else EPOCH_MIN
        if os.path.exists(p):
            with open(p) as f:
                base = dt.datetime.fromisoformat(json.load(f)["cursor"])
        applied = self._manifest(name)["applied"]
        for head_iso in applied.values():
            h = dt.datetime.fromisoformat(head_iso)
            if h > base:
                base = h
        return base

    def _write_cursor(self, name: str, value: dt.datetime) -> None:
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"cursor": value.isoformat()}, f)
        os.replace(tmp, self._meta_path(name))

    def read(self, spark: SparkSession, name: str, schema=None) -> DataFrame | None:
        p = os.path.join(self.root, f"{name}.parquet")
        if not os.path.exists(p):
            return None
        # recursive: append-style reports are a directory of per-update
        # subdirs (u_<cursor>/part-*.parquet); aggregate reports stay flat
        return spark.read.option("recursiveFileLookup", "true").parquet(p)

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

    # -- true O(delta) append (O17) -----------------------------------------

    def _manifest(self, name: str) -> dict:
        p = os.path.join(self.root, f"_applied.{name}.json")
        if not os.path.exists(p):
            return {"applied": {}, "csv_len": 0}
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, name: str, man: dict) -> None:
        p = os.path.join(self.root, f"_applied.{name}.json")
        with open(p + ".tmp", "w") as f:
            json.dump(man, f)
        os.replace(p + ".tmp", p)

    def update_append(
        self,
        spark: SparkSession,
        name: str,
        delta: DataFrame,
        order_cols: list[str],
        update_key: str = "full",
        head: str = "",
    ) -> bool:
        """O17: append-style report, cost O(delta) per update — the
        reference APPENDS rows (CsvAppendReportVisitor.cs:20-41); the r2
        union-and-rewrite grew without bound with history.

        Layout: ``{name}.parquet/u_<update_key>/part-*.parquet`` — each
        update adds ONE subdir (atomic rename), history is never
        rewritten; readers get the union via recursive listing (at
        cluster scale this is an Iceberg fast-append snapshot). The CSV
        mirror is a single FILE appended in place, header-once, exactly
        the reference's shape; a manifest records applied update keys +
        the CSV byte length, so a crashed update replays idempotently
        (same key → same subdir; a torn CSV tail is truncated back to
        the last recorded length before re-appending)."""
        man = self._manifest(name)
        if update_key in man["applied"]:
            return False  # crash-replay of a fully applied update: no-op
        safe_key = "".join(ch if ch.isalnum() else "_" for ch in update_key)
        final_dir = os.path.join(self.root, f"{name}.parquet")
        sub = os.path.join(final_dir, f"u_{safe_key}")
        stage = os.path.join(self.root, f"_stage.{name}.u")
        delta.orderBy(*order_cols).write.mode("overwrite").parquet(stage)
        os.makedirs(final_dir, exist_ok=True)
        if os.path.exists(sub):  # torn previous attempt: replaced wholesale
            shutil.rmtree(sub)
        os.rename(stage, sub)
        self._csv_append(spark, name, sub, order_cols, man)
        man["applied"][update_key] = head
        self._write_manifest(name, man)
        return True

    def _csv_append(
        self, spark: SparkSession, name: str, delta_dir: str,
        order_cols: list[str], man: dict,
    ) -> None:
        """Append the staged delta's rows to the single-file CSV mirror.
        Driver-side byte concat is O(delta) — identical to the
        reference's own file-append cost (CsvAppendReportVisitor.cs) —
        and never touches history."""
        out = spark.read.parquet(delta_dir).orderBy(*order_cols)
        header = out.columns
        for field in out.schema.fields:
            if field.dataType.typeName() == "timestamp":
                out = out.withColumn(field.name, F.date_format(field.name, ISO_O_FMT))
        csv_stage = os.path.join(self.root, f"_stage.{name}.csv")
        out.select(*header).coalesce(1).write.mode("overwrite").csv(csv_stage)
        csv_final = os.path.join(self.root, f"{name}.csv")
        if os.path.isdir(csv_final):  # pre-r3 directory mirror: not migrated
            shutil.rmtree(csv_final)
        mode = "r+b" if os.path.exists(csv_final) else "wb"
        with open(csv_final, mode) as dst:
            dst.truncate(man["csv_len"])  # repair a torn tail from a crash
            dst.seek(0, os.SEEK_END)
            if dst.tell() == 0:
                dst.write((",".join(header) + "\n").encode())  # header-once
            for part in sorted(os.listdir(csv_stage)):
                if part.startswith("part-") and part.endswith(".csv"):
                    with open(os.path.join(csv_stage, part), "rb") as src:
                        shutil.copyfileobj(src, dst)
            man["csv_len"] = dst.tell()
        shutil.rmtree(csv_stage)


REPORTS = ("deleted_pages", "page_count_by_day", "page_count_by_day_kind")


def update_reports(
    spark: SparkSession,
    pages: DataFrame,
    report_root: str,
    names: tuple[str, ...] = REPORTS,
    default_cursor: dt.datetime | None = None,
) -> dict[str, int]:
    """Incrementally update each selected report to the pages log's head,
    each under its own ``report.{name}`` cursor — independent consumers
    of one log (O30, UpdateReportsCommandHandler.cs:104-117).
    ``default_cursor`` seeds brand-new report cursors (the reference's
    --default-cursor-value); committed cursors always win. Names match
    case-insensitively and unknowns list the valid set, mirroring
    UpdateReportsCommandHandler.cs:59-75's OrdinalIgnoreCase validator."""
    canon = {r.lower(): r for r in REPORTS}
    unknown = [n for n in names if n.lower() not in canon]
    if unknown:
        raise ValueError(
            f"Invalid report names: {', '.join(sorted(unknown))}. "
            f"Possible report names are: {', '.join(sorted(REPORTS))}"
        )
    names = tuple(dict.fromkeys(canon[n.lower()] for n in names))
    store = ReportStore(report_root)
    head = pages.agg(F.max("warc_ts")).first()[0]  # the loop's ONE standalone action
    updated: dict[str, int] = {}
    for name in names:
        cursor = store.cursor(name, default=default_cursor)
        # head == max(warc_ts), so head <= cursor ⇔ the delta is empty:
        # the skip decision needs no count action at all
        if head is None or head <= cursor:
            updated[name] = 0
            continue
        delta = pages.where(F.col("warc_ts") > F.lit(cursor)) if cursor > EPOCH_MIN else pages
        delta = delta.where(F.col("warc_ts") <= F.lit(head))
        # delta row count rides the write job as an Observation — no
        # standalone delta.count() per report (2·N actions → N writes)
        obs = Observation()
        delta = delta.observe(obs, F.count(F.lit(1)).alias("n"))
        if name == "deleted_pages":
            applied = store.update_append(
                spark, name, deleted_pages(delta), ["warc_ts", "url"],
                update_key=cursor.isoformat(), head=head.isoformat(),
            )
            if not applied:  # replay guard hit: obs never fired, don't block on it
                store._write_cursor(name, head)
                updated[name] = 0
                continue
        elif name == "page_count_by_day":
            store.update_aggregate(spark, name, page_count_by_day(delta), ["day"], ["value"])
        elif name == "page_count_by_day_kind":
            store.update_aggregate(
                spark, name, page_count_by_day_kind(delta), ["day"], ["details", "deletes"]
            )
        store._write_cursor(name, head)
        updated[name] = int(obs.get["n"])
    return updated
