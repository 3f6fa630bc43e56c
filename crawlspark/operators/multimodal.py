"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas``
pipelines. The Spark-side plumbing (schemas, batch iteration, partition
strategy) is real and tested, and so is the decode for two REAL
uncompressed image formats parseable in pure numpy — binary PPM (P6)
and uncompressed 24-bit BMP (BI_RGB) — no codec library needed.
Compressed formats (JPEG/PNG/video) still need PIL/libav on a real
cluster: they fall through to the metadata-only path here; the batch
loop, schema, and partitioning do not change when a codec is added.

Payload formats dispatched by magic bytes in ``_decode_batch``:
  b'P6'      binary PPM: ASCII header (dims, maxval, ``#`` comments),
             then raw RGB triples — the real format, fully decoded
  b'BM'      BMP, BITMAPINFOHEADER, 24bpp, BI_RGB: dims from the DIB
             header, pixels de-padded per 4-byte row alignment
  b'FAKE'    deterministic synthetic header for tests/benchmarks:
             bytes 4-7 width, 8-11 height (big-endian uint32), 12+ body
  otherwise  unknown codec → metadata only (n_bytes, whole-blob mean)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("mean_byte", T.DoubleType()),  # stand-in "feature"
])


def fake_media_payload(media_id: int, kind: str = "image") -> bytes:
    w = 16 + (media_id * 7) % 48
    h = 16 + (media_id * 13) % 32
    body = bytes(((media_id * 31 + i * 17) % 256) for i in range(w * h % 64 + 16))
    return b"FAKE" + struct.pack(">II", w, h) + body


def build_media_table(spark, n: int = 64) -> DataFrame:
    kinds = ["image", "audio", "video"]
    rows = [(i, kinds[i % 3], fake_media_payload(i, kinds[i % 3])) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def encode_ppm(width: int, height: int, pixels: np.ndarray) -> bytes:
    """Build a real binary-PPM (P6) payload from an (h, w, 3) uint8
    array — used by tests and usable by any producer."""
    if pixels.shape != (height, width, 3):
        raise ValueError(f"pixels must be ({height}, {width}, 3)")
    return f"P6\n{width} {height}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm(b: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-numpy binary-PPM (P6) decode: magic, up to three ASCII
    integers (width, height, maxval) separated by whitespace with
    ``#``-to-EOL comments, one whitespace byte, then raw RGB triples."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(b) and b[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        vals.append(int(b[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit-per-sample PPM not supported")
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, px.reshape(h, w, 3)


def decode_bmp(b: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-numpy uncompressed 24-bit BMP decode (BITMAPINFOHEADER,
    BI_RGB): dims from the DIB header, rows bottom-up (or top-down when
    height < 0) and padded to 4-byte boundaries."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    px_off = struct.unpack("<I", b[10:14])[0]
    w, h = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    compression = struct.unpack("<I", b[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp BI_RGB supported (got {bpp}bpp, c={compression})")
    top_down, ah = h < 0, abs(h)
    row_stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        b, dtype=np.uint8, count=row_stride * ah, offset=px_off
    ).reshape(ah, row_stride)[:, : w * 3]
    if not top_down:
        rows = rows[::-1]
    return w, ah, rows.reshape(ah, w, 3)[..., ::-1]  # BGR → RGB


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    payloads = pdf["payload"]
    widths, heights, nbytes, means = [], [], [], []
    for p in payloads:
        b = bytes(p)
        if b[:2] == b"P6":
            w, h, px = decode_ppm(b)
            body = px.ravel()
        elif b[:2] == b"BM":
            w, h, px = decode_bmp(b)
            body = px.ravel()
        elif b[:4] == b"FAKE":
            w, h = struct.unpack(">II", b[4:12])
            body = np.frombuffer(b[12:], dtype=np.uint8)
        else:  # unknown/compressed codec → metadata only
            w = h = 0
            body = np.frombuffer(b, dtype=np.uint8)
        widths.append(w)
        heights.append(h)
        nbytes.append(len(b))
        means.append(float(body.mean()) if len(body) else 0.0)
    return pd.DataFrame({
        "media_id": pdf["media_id"],
        "kind": pdf["kind"],
        "width": pd.array(widths, dtype="int32"),
        "height": pd.array(heights, dtype="int32"),
        "n_bytes": pd.array(nbytes, dtype="int64"),
        "mean_byte": pd.array(means, dtype="float64"),
    })


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads. The
    batch shape (columnar pandas in/out), schema, and partitioning are
    exactly what a real codec pipeline uses."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return media.mapInPandas(gen, DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 8) -> DataFrame:
    """'Frame sampling' stand-in: slice every Nth byte of the payload as
    a new binary column — same mapInPandas shape as real frame extraction
    (one row in → one row out with derived binary)."""
    out_schema = T.StructType(list(MEDIA_SCHEMA.fields) + [T.StructField("sampled", T.BinaryType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["sampled"] = pdf["payload"].map(lambda b: bytes(b)[12::every_n_bytes])
            yield pdf

    return media.mapInPandas(gen, out_schema)


def resize_media(media: DataFrame, max_dim: int = 16) -> DataFrame:
    """Resize stand-in: cap the longer side at ``max_dim`` preserving
    aspect ratio, emit a rebuilt payload (new FAKE header + nearest-
    neighbor subsampled body) — binary in → binary out, one row per
    row, the exact mapInPandas shape of a real thumbnailer (swap the
    body math for ``PIL.Image.resize`` on a cluster with codecs).
    Unknown codecs pass through unchanged."""
    out_schema = T.StructType(
        list(MEDIA_SCHEMA.fields) + [T.StructField("resized", T.BinaryType())]
    )

    def _resize_one(p) -> bytes:
        b = bytes(p)
        if b[:4] != b"FAKE":
            return b
        w, h = struct.unpack(">II", b[4:12])
        body = np.frombuffer(b[12:], dtype=np.uint8)
        scale = max(w, h, 1) / max_dim
        if scale <= 1.0:
            return b
        nw, nh = max(int(w / scale), 1), max(int(h / scale), 1)
        if len(body):
            idx = np.linspace(0, len(body) - 1, num=min(len(body), nw * nh)).astype(int)
            body = body[idx]
        return b"FAKE" + struct.pack(">II", nw, nh) + body.tobytes()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["resized"] = pdf["payload"].map(_resize_one)
            yield pdf

    return media.mapInPandas(gen, out_schema)


def media_stats(decoded: DataFrame) -> DataFrame:
    """Aggregate decoded metadata per kind — the typical QA rollup."""
    return decoded.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
        F.sum("n_bytes").alias("total_bytes"),
    )
