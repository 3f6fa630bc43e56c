"""URL column functions — validation, normalization, host/path parsing,
hash-prefix binning.

Reference parity:
  * URL validation + host/path mapping — Downloader.cs:246-279 (O24)
  * SHA-256 hash-prefix directory binning — DirectoryBins.cs:18-38 (O27);
    here the same trick becomes the salt/partition key that kills host
    skew in the frontier shuffle.

All pure built-in expressions (JVM-side, whole-stage-codegen friendly);
``regexp_extract`` rather than ``parse_url`` so the DuckDB oracle can run
the byte-identical expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HOST_RE = r"https?://([^/?#]+)"
_PATH_RE = r"https?://[^/?#]+(/[^?#]*)"


def host_of(url: Column | str) -> Column:
    return F.regexp_extract(url, _HOST_RE, 1)


def path_of(url: Column | str) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def is_valid_http_url(url: Column | str) -> Column:
    """Reference rules (Downloader.cs:252-266): https scheme, non-empty
    host, non-empty path, no query string."""
    c = F.col(url) if isinstance(url, str) else url
    return (
        c.startswith("https://")
        & (host_of(c) != "")
        & (path_of(c) != "")
        & ~c.contains("?")
    )


def hash_prefix_bin(key: Column | str, levels: int = 1) -> Column:
    """SHA-256 hex prefix bins, 2 hex chars (≤256 fanout) per level —
    DirectoryBins.cs:16-38. Returns e.g. '2c/4c' for levels=2."""
    h = F.sha2(F.col(key) if isinstance(key, str) else key, 256)
    parts = [F.substring(h, 1 + 2 * i, 2) for i in range(levels)]
    return F.concat_ws("/", *parts)


def host_shard(url: Column | str, num_shards: int) -> Column:
    """Stable shard id for a url's host — the frontier partition key.
    Hot hosts are later salted on top of this (operators/politeness)."""
    return F.pmod(F.xxhash64(host_of(url)), F.lit(num_shards)).cast("int")
