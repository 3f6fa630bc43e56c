"""Partitioned bloom-filter URL-seen set.

north_star: "a partitioned bloom/cuckoo-filter URL-seen set (broadcast
shards rebuilt per epoch)". The shards are rebuilt from the ``fetched``
table at the start of every epoch and broadcast to executors; candidate
urls that are *definitely not seen* skip the exact anti-join entirely,
and only the "maybe seen" residue (true hits + false positives) pays
for the shuffle against the fetched table. The exact anti-join backstop
means bloom false positives can never change the visited set — property
pinned by tests/test_frontier.py.

Generalizes the reference's never-revisit guarantee (the cursor
predicate, Downloader.cs:239-240) to an unordered 10^10-url frontier.

Hashing: ``pd.util.hash_pandas_object`` with two fixed hash keys →
double hashing g_i = h1 + i·h2. Vectorized over Arrow batches; the
filter is rebuilt and probed within one session per epoch, never
persisted, so cross-version hash stability is not required.

Sizing: bits = -n·ln(fpp)/ln(2)², split over ``n_shards`` shards. At
10^10 urls and fpp=1%, that is ~12 GB of bitmaps — hence shards: each
executor only needs the shards of its candidate partition's hash range
if the frontier is pre-partitioned by the same url hash; in local mode
we simply broadcast all shards.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KEY1 = "crawlspark-bloom-key1"
_KEY2 = "crawlspark-bloom-key2"


def _h(urls: pd.Series, key: str) -> np.ndarray:
    return pd.util.hash_pandas_object(urls, index=False, hash_key=key.ljust(16)[:16]).to_numpy()


class BloomShards:
    def __init__(self, n_shards: int, bits_per_shard: int, n_hashes: int):
        self.n_shards = n_shards
        self.bits_per_shard = bits_per_shard
        self.n_hashes = n_hashes
        self.bitmaps = np.zeros((n_shards, (bits_per_shard + 7) // 8), dtype=np.uint8)

    @staticmethod
    def params(expected: int, fpp: float, n_shards: int) -> tuple[int, int]:
        bits_total = max(64 * n_shards, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
        bits_per_shard = (bits_total + n_shards - 1) // n_shards
        n_hashes = max(1, round(math.log(2) * bits_total / max(expected, 1)))
        return bits_per_shard, min(n_hashes, 8)

    def _positions(self, urls: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        h1 = _h(urls, _KEY1)
        h2 = _h(urls, _KEY2) | 1  # odd → full-period double hashing
        shard = (h1 % np.uint64(self.n_shards)).astype(np.int64)
        pos = np.empty((self.n_hashes, len(urls)), dtype=np.int64)
        for i in range(self.n_hashes):
            pos[i] = ((h1 + np.uint64(i) * h2) % np.uint64(self.bits_per_shard)).astype(np.int64)
        return shard, pos

    def add(self, urls: pd.Series) -> None:
        if len(urls) == 0:
            return
        shard, pos = self._positions(urls)
        flat = self.bitmaps.reshape(-1)
        row_bytes = self.bitmaps.shape[1]
        for i in range(self.n_hashes):
            idx = shard * row_bytes + (pos[i] >> 3)
            # bitwise_or.at is unbuffered: duplicate indices all land
            # (plain `flat[idx] |= v` silently drops duplicates)
            np.bitwise_or.at(flat, idx, np.uint8(1) << (pos[i] & 7).astype(np.uint8))

    def might_contain(self, urls: pd.Series) -> pd.Series:
        if len(urls) == 0:
            return pd.Series([], dtype=bool)
        shard, pos = self._positions(urls)
        out = np.ones(len(urls), dtype=bool)
        for i in range(self.n_hashes):
            bit = (self.bitmaps[shard, pos[i] >> 3] >> (pos[i] & 7).astype(np.uint8)) & 1
            out &= bit.astype(bool)
        return pd.Series(out)

    def merge(self, other: "BloomShards") -> "BloomShards":
        self.bitmaps |= other.bitmaps
        return self

    @staticmethod
    def build(
        seen: DataFrame,
        url_col: str = "url",
        *,
        expected: int | None = None,
        fpp: float = 0.01,
        n_shards: int = 32,
    ) -> "BloomShards":
        """Distributed build: every partition folds its urls into a local
        shard set (mapInPandas, Arrow batches), partials are OR-merged on
        the driver. One pass over ``seen``, no shuffle."""
        if expected is None:
            expected = seen.count()
        expected = max(expected, 1)
        bits, k = BloomShards.params(expected, fpp, n_shards)

        def fold(batches):
            local = BloomShards(n_shards, bits, k)
            for pdf in batches:
                local.add(pdf[url_col])
            yield pd.DataFrame({"bitmap": [local.bitmaps.tobytes()]})

        parts = seen.select(url_col).mapInPandas(fold, "bitmap binary").collect()
        merged = BloomShards(n_shards, bits, k)
        for row in parts:
            merged.bitmaps |= np.frombuffer(row["bitmap"], dtype=np.uint8).reshape(merged.bitmaps.shape)
        return merged


def build_seen_shards(
    spark: SparkSession,
    seen_urls: DataFrame,
    *,
    url_col: str = "url",
    seen_count: int | None = None,
    n_shards: int = 32,
    fpp: float = 0.01,
):
    """Build + broadcast the epoch's seen-set bloom shards. Returns None
    for an empty seen set (epoch 0)."""
    n_seen = seen_urls.count() if seen_count is None else seen_count
    if n_seen == 0:
        return None
    shards = BloomShards.build(seen_urls, url_col, expected=n_seen, fpp=fpp, n_shards=n_shards)
    return spark.sparkContext.broadcast(shards)


def seen_filter(
    spark: SparkSession,
    candidates: DataFrame,
    seen_urls: DataFrame,
    *,
    url_col: str = "url",
    use_bloom: bool = True,
    shards_bc=None,
    seen_count: int | None = None,
    n_shards: int = 32,
    fpp: float = 0.01,
) -> DataFrame:
    """candidates ∖ seen, exactly. With the bloom pre-filter, only the
    'maybe seen' residue joins against the seen table; 'definitely new'
    rows bypass the shuffle. Pass ``shards_bc`` (from build_seen_shards)
    to reuse one bloom build across several filters in the same epoch.
    Falls back to a plain left_anti when the seen set is empty or bloom
    is disabled."""
    if not use_bloom:
        return candidates.join(seen_urls.select(url_col), url_col, "left_anti")
    if shards_bc is None:
        shards_bc = build_seen_shards(
            spark, seen_urls, url_col=url_col, seen_count=seen_count,
            n_shards=n_shards, fpp=fpp,
        )
    if shards_bc is None:
        return candidates
    bc = shards_bc

    @F.pandas_udf("boolean")
    def maybe_seen(urls: pd.Series) -> pd.Series:
        return bc.value.might_contain(urls)

    tagged = candidates.withColumn("__maybe", maybe_seen(F.col(url_col)))
    new = tagged.where(~F.col("__maybe")).drop("__maybe")
    residue = (
        tagged.where(F.col("__maybe")).drop("__maybe")
        .join(seen_urls.select(url_col), url_col, "left_anti")
    )
    return new.unionByName(residue)
