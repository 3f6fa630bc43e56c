"""WARC source: read/write Common-Crawl-layout ``.warc.gz`` archives.

The BASELINE input_hint table ("Common-Crawl-style web pages with
columns url, warc_ts, html, text, lang") arrives, in the wild, as WARC
archives: each record is its OWN gzip member, members concatenated into
~1 GB ``.warc.gz`` files, plus a CDX index mapping url → (file, offset,
length) for random record access. This module provides that ingest edge
for the engine (the reference's ingest edge is its HTTP catalog client,
CatalogClient.cs; here the archive file IS the snapshot):

  * ``write_warc``   — distributed writer: one ``.warc.gz`` per input
                       partition (records each an independent gzip
                       member, Common Crawl's layout), returning the CDX
                       rows from the same pass. Deterministic bytes
                       (mtime=0, fixed header order) so tests can pin
                       round-trips.
  * ``read_warc``    — ``binaryFile`` scan → Arrow ``mapInPandas``
                       member-splitter/parser → the input_hint page
                       shape ``(url, warc_ts, html)``. Parallelism is
                       per-file, exactly how Spark jobs consume Common
                       Crawl (a 100 TB crawl is ~100k files → ~100k
                       tasks; no further split is needed and gzip
                       members can't be split mid-stream anyway).
  * ``fetch_cdx_records`` — CDX-driven random access: seek to the
                       member offset, inflate one record. On a cluster
                       this is the HTTP range-request path; a full-file
                       scan is never needed to fetch one url.

Corrupt members degrade per-record (skipped, counted), never fail the
task — same poison-blob contract as ``functions/extract._maybe_gunzip``
and ``operators/multimodal._decode_batch``.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"

PAGE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
])

CDX_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_file", T.StringType()),
    T.StructField("record_offset", T.LongType()),
    T.StructField("record_length", T.LongType()),
    T.StructField("payload_digest", T.StringType()),
    T.StructField("record_type", T.StringType()),   # response | revisit
])

READ_SCHEMA = T.StructType(
    PAGE_SCHEMA.fields + [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_offset", T.LongType()),
    ]
)


def _format_warc_ts(ts: pd.Timestamp) -> bytes:
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode()


def _record_bytes(url: str, ts: pd.Timestamp, html: bytes) -> bytes:
    """One WARC/1.0 response record: WARC headers + an HTTP/1.1 response
    block whose body is the html payload. Header order is fixed so the
    serialized bytes are deterministic."""
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF + html
    )
    headers = (
        _WARC_VERSION + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + _format_warc_ts(ts) + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return headers + http + _CRLF + _CRLF


def _gzip_member(raw: bytes) -> bytes:
    """Deterministic standalone gzip member (mtime=0, no filename)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(raw) + co.flush()


def _revisit_record_bytes(
    url: str, ts: pd.Timestamp, canon_url: str, canon_ts: pd.Timestamp,
    digest: str,
) -> bytes:
    """One WARC/1.1 ``revisit`` record (identical-payload-digest
    profile, the Heritrix/Common Crawl dedup convention): HTTP response
    headers are kept, the body is OMITTED — the record says "same bytes
    as the referred response", which is what makes digest-dedup'd
    archives small."""
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html" + _CRLF
        + _CRLF
    )
    headers = (
        _WARC_VERSION + _CRLF
        + b"WARC-Type: revisit" + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + _format_warc_ts(ts) + _CRLF
        + b"WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
          b"identical-payload-digest" + _CRLF
        + b"WARC-Refers-To-Target-URI: " + canon_url.encode() + _CRLF
        + b"WARC-Refers-To-Date: " + _format_warc_ts(canon_ts) + _CRLF
        + b"WARC-Payload-Digest: sha1:" + digest.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return headers + http + _CRLF + _CRLF


def write_warc(
    pages: DataFrame, out_dir: str, n_files: int = 4,
    dedup_revisits: bool = False,
) -> DataFrame:
    """Write ``(url, warc_ts, html)`` rows as ``n_files`` Common-Crawl-
    layout ``.warc.gz`` files under ``out_dir``; returns the CDX index
    DataFrame (url → file/offset/length/digest/record_type) produced by
    the SAME pass — one job, no second scan.

    ``dedup_revisits=True`` enables WARC 1.1 digest dedup (the
    Heritrix/Common Crawl convention): the earliest fetch of each
    distinct payload — (warc_ts, url) order, deterministic — is stored
    as a full ``response`` record; every other fetch of the same bytes
    becomes a body-less ``revisit`` record referring to it. Costs one
    window shuffle on the sha1 digest (narrow rows: the window ranks
    (digest, ts, url); payloads move only to their output file, as
    before).

    Files are url-hash partitioned and sorted within each file, so the
    output bytes are a pure function of the input set (stable across
    re-runs and executor placement). On a cluster ``out_dir`` is shared
    storage and each task streams its file; nothing is collected."""
    os.makedirs(out_dir, exist_ok=True)

    def _write_file(rows: pd.DataFrame) -> pd.DataFrame:
        pid = int(rows["_file_id"].iloc[0])
        rows = rows.sort_values("url", kind="mergesort")
        name = f"part-{pid:05d}.warc.gz"
        cdx = []
        offset = 0
        with open(os.path.join(out_dir, name), "wb") as f:
            for url, ts, html, canon_url, canon_ts, digest in zip(
                rows["url"], rows["warc_ts"], rows["html"],
                rows["_canon_url"], rows["_canon_ts"], rows["_digest"],
            ):
                html = bytes(html)
                is_canon = (url == canon_url) and (ts == canon_ts)
                if is_canon:
                    raw = _record_bytes(url, ts, html)
                    rtype = "response"
                else:
                    raw = _revisit_record_bytes(url, ts, canon_url, canon_ts, digest)
                    rtype = "revisit"
                member = _gzip_member(raw)
                f.write(member)
                cdx.append((url, name, offset, len(member), digest, rtype))
                offset += len(member)
        return pd.DataFrame(cdx, columns=[f.name for f in CDX_SCHEMA])

    staged = pages.select("url", "warc_ts", "html").withColumn(
        "_digest", F.sha1("html")
    )
    if dedup_revisits:
        from pyspark.sql import Window

        w = Window.partitionBy("_digest")
        canon = F.min(F.struct("warc_ts", "url")).over(w)
        staged = staged.withColumn("_canon_ts", canon["warc_ts"]).withColumn(
            "_canon_url", canon["url"]
        )
    else:
        staged = staged.withColumn("_canon_ts", F.col("warc_ts")).withColumn(
            "_canon_url", F.col("url")
        )
    staged = staged.withColumn(
        "_file_id", F.pmod(F.xxhash64("url"), F.lit(n_files))
    )
    # one shuffle: group == output file; the task both writes the
    # archive and emits that file's CDX rows
    cdx = staged.groupBy("_file_id").applyInPandas(_write_file, schema=CDX_SCHEMA)
    # materialize (the write is the side effect) into a parquet CDX
    cdx_path = os.path.join(out_dir, "cdx.parquet")
    cdx.write.mode("overwrite").parquet(cdx_path)
    return pages.sparkSession.read.parquet(cdx_path)


def _split_members(blob: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield (offset, inflated_record) per concatenated gzip member.
    A corrupt member aborts the remainder of THAT file only (offsets
    beyond a corrupt stream are unrecoverable without a CDX)."""
    pos = 0
    n = len(blob)
    while pos < n:
        do = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            raw = do.decompress(blob[pos:])
            raw += do.flush()
        except zlib.error:
            return
        if not do.eof:  # truncated trailing member
            return
        yield pos, raw
        consumed = (n - pos) - len(do.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _parse_record(raw: bytes) -> tuple[str, pd.Timestamp, bytes] | None:
    """Parse one inflated WARC record → (url, ts, html) or None for
    non-response / malformed records."""
    head_end = raw.find(_CRLF + _CRLF)
    if head_end < 0 or not raw.startswith(_WARC_VERSION):
        return None
    headers = {}
    for line in raw[:head_end].split(_CRLF)[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower()] = v.strip()
    if headers.get(b"warc-type") != b"response":
        return None
    url = headers.get(b"warc-target-uri")
    date = headers.get(b"warc-date")
    clen = headers.get(b"content-length")
    if not (url and date and clen and clen.isdigit()):
        return None
    http = raw[head_end + 4 : head_end + 4 + int(clen)]
    body_at = http.find(_CRLF + _CRLF)
    if body_at < 0:
        return None
    html = http[body_at + 4 :]
    try:
        ts = pd.Timestamp(date.decode())
    except ValueError:
        return None
    return url.decode(), ts.tz_localize(None), html


def read_warc(spark: SparkSession, warc_dir: str) -> DataFrame:
    """Scan ``*.warc.gz`` under ``warc_dir`` into the input_hint page
    shape plus provenance ``(warc_file, record_offset)``. Only
    ``response`` records carry payloads; ``revisit`` records (digest
    dedup, see ``write_warc``) are skipped here — reconstruct their
    payloads by joining the CDX on ``payload_digest`` against the
    response rows.

    ``binaryFile`` gives one row (path, content) per archive; the Arrow
    ``mapInPandas`` below splits gzip members and parses records. At
    Common Crawl scale each ~1 GB file is one task — the natural (and
    only possible) split granularity for member-concatenated gzip."""

    def _parse_files(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = {"url": [], "warc_ts": [], "html": [],
                   "warc_file": [], "record_offset": []}
            for path, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                for offset, raw in _split_members(bytes(blob)):
                    rec = _parse_record(raw)
                    if rec is None:
                        continue
                    url, ts, html = rec
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["html"].append(html)
                    out["warc_file"].append(name)
                    out["record_offset"].append(offset)
            yield pd.DataFrame(out)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(warc_dir)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_files, schema=READ_SCHEMA)


def fetch_cdx_records(spark: SparkSession, cdx: DataFrame, warc_dir: str) -> DataFrame:
    """Random access: inflate exactly the members the CDX rows point at
    (seek + bounded read — the HTTP range-request path on a real
    deployment; never a full-file scan). Input: CDX_SCHEMA rows."""

    def _fetch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = {"url": [], "warc_ts": [], "html": [],
                   "warc_file": [], "record_offset": []}
            # group by file so each archive is opened once per batch
            for name, grp in pdf.groupby("warc_file", sort=True):
                with open(os.path.join(warc_dir, name), "rb") as f:
                    for off, length in zip(grp["record_offset"], grp["record_length"]):
                        f.seek(int(off))
                        member = f.read(int(length))
                        try:
                            raw = zlib.decompress(member, 16 + zlib.MAX_WBITS)
                        except zlib.error:
                            continue
                        rec = _parse_record(raw)
                        if rec is None:
                            continue
                        url, ts, html = rec
                        out["url"].append(url)
                        out["warc_ts"].append(ts)
                        out["html"].append(html)
                        out["warc_file"].append(name)
                        out["record_offset"].append(int(off))
            yield pd.DataFrame(out)

    return cdx.repartition("warc_file").mapInPandas(_fetch, schema=READ_SCHEMA)
