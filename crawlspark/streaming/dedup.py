"""Streaming exact dedup — the streaming twin of
``operators/dedup.py::exact_dedup`` for ingest-time duplicate dropping.

Batch dedup answers "which documents in this corpus are duplicates";
at ingest the question inverts: "is this NEW document's content already
seen across ALL previous runs". That is ``dropDuplicates`` on the
content fingerprint with checkpointed state: each micro-batch emits only
first-seen fingerprints, state survives across ``availableNow`` runs
sharing a checkpoint, so re-runs never re-emit a document whose content
arrived earlier — the streaming analog of the crawl's seen-set.

Scale note: plain ``dropDuplicates`` state grows with the distinct-
fingerprint count and never expires. At 10^10 docs run the state on the
RocksDB state store provider, or bound state with
``dropDuplicatesWithinWatermark`` when the dedup horizon is a time
window rather than all-history (both are config/one-line swaps on this
same plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def stream_exact_dedup(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """Run the ingest-dedup to the log's head (availableNow) appending
    first-seen documents to ``out_dir``. Re-running with the same
    checkpoint processes only new files and drops anything whose
    fingerprint was emitted in ANY earlier run."""
    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)
    firsts = (
        docs.withColumn("fp", F.md5(F.lower(F.col("text"))))
        .dropDuplicates(["fp"])
        .select("doc_id", "fp")
    )
    return (
        firsts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_deduped(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
