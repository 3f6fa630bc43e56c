"""Structured Streaming twins of the incremental reports.

The engine is batch-incremental by design (SURVEY.md §1.3 — the
reference's crawl is "everything newer than the cursor, then exit"), but
the report layer maps naturally onto Structured Streaming: the pages log
is a file-stream source, the day-count report is a windowed aggregation
with a watermark for late pages, and the merge-into-store step is a
``foreachBatch`` that reuses the exact batch merge (ReportStore /
O21) — one code path for both execution modes.

``availableNow`` triggers give the same run-to-head-then-exit semantics
as the cursor loop, with checkpointed progress taking the cursor's role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def pages_stream(spark: SparkSession, pages_dir: str) -> DataFrame:
    return spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)


def stream_count_by_day(
    spark: SparkSession,
    pages_dir: str,
    *,
    query_name: str = "page_count_by_day_stream",
    watermark: str = "1 hour",
):
    """Windowed day-count with late-data watermark, materialized to a
    memory sink in complete mode; ``availableNow`` processes the log to
    head and stops (the streaming twin of one cursor run)."""
    agg = (
        pages_stream(spark, pages_dir)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "1 day").alias("w"))
        .agg(F.count("*").alias("value"))
        .select(F.col("w.start").alias("day"), "value")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_update_reports(
    spark: SparkSession,
    pages_dir: str,
    report_root: str,
    checkpoint_dir: str,
):
    """foreachBatch bridge: every micro-batch runs the SAME incremental
    merge as the batch path (ReportStore.update_aggregate), so streaming
    and cursor-batch runs converge to identical report tables."""
    from crawlspark.plans.reports import ReportStore, page_count_by_day

    store = ReportStore(report_root)

    def merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.update_aggregate(
            batch_df.sparkSession, "page_count_by_day",
            page_count_by_day(batch_df), ["day"], ["value"],
        )

    return (
        pages_stream(spark, pages_dir)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
