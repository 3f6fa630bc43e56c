"""Streaming near-dup gate — the streaming twin of
``operators/dedup.py::lsh_bucket_keepers`` for ingest-time near-duplicate
dropping.

The exact streaming dedup (streaming/dedup.py) drops byte-identical
re-arrivals; real ingest also sees NEAR-duplicates (mirrors, template
churn, trailing-junk variants) that only MinHash catches. This gate
admits a document iff none of its LSH band buckets ``(band_idx,
band_key)`` collides with anything seen in any earlier micro-batch or
run — first arrival wins — and, within a batch, iff no smaller-id doc
shares a bucket (the batch rule, so a batch of N is not order-sensitive
inside itself).

Equivalence contract (pinned by test): when documents arrive in id
order, the admitted set equals ``lsh_bucket_keepers`` over the union of
all runs — the min-per-bucket batch rule evaluated incrementally.
Out-of-id-order arrival keeps first-arrival-wins semantics (the
streaming-natural rule) and may admit a doc the batch rule would drop.

State is the seen band-key set, stored as append-only parquet
``(band_idx, band_key, min_id)`` under ``state_dir`` — band keys only,
never text; volume is n_docs × n_bands rows of (int, hash, long). At
10^10 docs move the state behind a bucket-partitioned table or the
RocksDB state store; the gate's joins are key-equi and stay shuffle-
bounded by the BATCH size, not the state size (state side is the build
side of a shuffled hash join Spark picks once state outgrows
broadcast).

Checkpointed via the foreachBatch stream: re-running with the same
checkpoint processes only new files. foreachBatch is at-least-once, so
both writes are made replay-idempotent explicitly: the admitted output
is partitioned by batch_id and dynamically OVERWRITTEN (a replayed
batch rewrites its own partition, never duplicates), and the state
append's duplicate rows are absorbed by the min() aggregate every
reader applies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawlspark.operators.dedup import minhash_bands

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def stream_lsh_dedup(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    state_dir: str,
    num_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
):
    """Run the near-dup gate to the log's head (availableNow), appending
    admitted ``(doc_id)`` rows to ``out_dir`` and band state to
    ``state_dir``. Re-running with the same checkpoint continues where
    the last run stopped and never re-admits a near-dup of anything
    admitted before."""
    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)

    def _gate(batch: DataFrame, batch_id: int) -> None:
        bands = minhash_bands(
            batch, "doc_id", "text", num_hashes, band_size, k
        ).localCheckpoint(eager=True)  # two consumers below: gate + state append
        if os.path.isdir(state_dir) and any(
            f.endswith(".parquet") for f in os.listdir(state_dir)
        ):
            prior = spark.read.parquet(state_dir).groupBy(
                "band_idx", "band_key"
            ).agg(F.min("min_id").alias("__m"))
        else:
            prior = spark.createDataFrame(
                [], "band_idx int, band_key string, __m long"
            )
        batch_min = bands.groupBy("band_idx", "band_key").agg(
            F.min("doc_id").alias("__m")
        )
        merged = prior.unionByName(batch_min).groupBy("band_idx", "band_key").agg(
            F.min("__m").alias("__m")
        )
        dropped = (
            bands.join(merged, ["band_idx", "band_key"])
            .where(F.col("__m") < F.col("doc_id"))
            .select("doc_id")
            .distinct()
        )
        admitted = batch.select("doc_id").join(dropped, "doc_id", "left_anti")
        # replay-idempotent: a replayed batch overwrites ITS partition
        (
            admitted.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        # state append LAST (idempotent under batch replay: min() absorbs
        # duplicate rows, see module doc)
        batch_min.withColumnRenamed("__m", "min_id").write.mode("append").parquet(
            state_dir
        )

    return (
        docs.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
