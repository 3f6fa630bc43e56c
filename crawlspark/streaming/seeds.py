"""Streaming seed ingestion — the discovery side's streaming twin.

Batch crawls take a fixed seed list; a live deployment discovers seeds
continuously (sitemap fetches, link submissions, recrawl schedules).
This is the ingest gate in front of the frontier: validate + optionally
canonicalize each candidate URL, then URL-SEEN semantics — the first
arrival of a url is emitted, every later arrival is dropped, across ALL
runs sharing the checkpoint (the crawl applies the same rule once a url
enters its frontier; ``dropDuplicates`` state is the streaming analog
of the seen-set, RocksDB/withinWatermark being the state-scale paths as
in streaming/dedup.py).

The output directory is a valid ``seeds`` input for ``web_crawl`` — an
epoch run between two ingest runs consumes exactly the seeds known so
far, and the commit-log crawl state guarantees later epochs pick up the
newly ingested rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawlspark.functions.urls import is_valid_http_url, normalize_url

SEEDS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("priority", T.IntegerType()),
])


def stream_seed_ingest(
    spark: SparkSession,
    seeds_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    canonicalize: bool = False,
):
    """Ingest seed files to the log's head (availableNow), appending
    first-seen valid URLs to ``out_dir``. Re-running with the same
    checkpoint processes only new files and never re-emits a url."""
    seeds = spark.readStream.schema(SEEDS_SCHEMA).parquet(seeds_dir)
    url = normalize_url(F.col("url")) if canonicalize else F.col("url")
    gated = (
        seeds.select(
            url.alias("url"),
            F.coalesce("priority", F.lit(0)).alias("priority"),
        )
        .where(is_valid_http_url(F.col("url")))
        .dropDuplicates(["url"])
    )
    return (
        gated.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_seeds(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
