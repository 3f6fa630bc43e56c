"""Bloom seen-set unit properties: distinct double-hash keys, the
shard-partitioned distributed fold equals the sequential build, and the
incremental fold-forward equals a one-shot build."""

import pandas as pd
from pyspark.sql import functions as F

from crawlspark.operators.bloom import _KEY1, _KEY2, _h, BloomShards, IncrementalSeen


def _urls_df(spark, n, prefix="https://h.example/p"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("url")
    ).repartition(4)


def test_hash_keys_are_distinct():
    s = pd.Series([f"u{i}" for i in range(64)])
    h1, h2 = _h(s, _KEY1), _h(s, _KEY2)
    assert (h1 != h2).all(), "double hashing collapsed: h1 == h2"


def test_distributed_fold_equals_sequential_add(spark):
    urls = [f"https://h.example/p{i}" for i in range(500)]
    bits, k = BloomShards.params(500, 0.01, 8)
    seq = BloomShards(8, bits, k)
    seq.add(pd.Series(urls))

    dist = BloomShards(8, bits, k)
    dist.fold_urls(_urls_df(spark, 500), "url")
    assert (seq.bitmaps == dist.bitmaps).all()


def test_incremental_equals_oneshot(spark):
    inc = IncrementalSeen(spark, capacity=2000, fpp=0.01, n_shards=8)
    for lo, hi in ((0, 300), (300, 700), (700, 1000)):
        delta = spark.range(lo, hi).select(
            F.concat(F.lit("https://h.example/p"), F.col("id").cast("string")).alias("url")
        )
        inc.fold(delta, n_new=hi - lo)
    assert inc.count == 1000

    bits, k = BloomShards.params(2000, 0.01, 8)
    oneshot = BloomShards(8, bits, k)
    oneshot.fold_urls(_urls_df(spark, 1000), "url")
    assert (inc.shards.bitmaps == oneshot.bitmaps).all()
    # no false negatives, ever
    probe = inc.shards.might_contain(pd.Series([f"https://h.example/p{i}" for i in range(1000)]))
    assert probe.all()


def test_rebuild_grows_capacity_and_keeps_members(spark):
    inc = IncrementalSeen(spark, capacity=1024, fpp=0.01, n_shards=4)
    inc.fold(_urls_df(spark, 3000), n_new=3000)
    assert inc.rebuild_if_needed(_urls_df(spark, 3000))
    assert inc.capacity >= 2 * 3000
    probe = inc.shards.might_contain(pd.Series([f"https://h.example/p{i}" for i in range(3000)]))
    assert probe.all()
    assert not inc.rebuild_if_needed(_urls_df(spark, 3000))
