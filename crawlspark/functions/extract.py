"""Vectorized html→text extraction and outlink parsing.

The reference's only extension point is the per-page visitor callback
(IVisitor.cs:5-8, invoked Downloader.cs:148); here it is a pair of
Arrow-batched pandas UDFs (BASELINE.json input_hint: "vectorized
pandas/Arrow UDFs (no per-row Python)").

Determinism contract: ``extract_text`` must reproduce the corpus ``text``
column **byte-identically** (BASELINE.json: "byte-identical extracted
text per url"). The implementation is locale-free pure byte/str slicing
— no parser library, no unicode normalization — so the output is stable
across pandas/Arrow versions.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, StringType, StructField, StructType

_P_OPEN = b"<p>"
_P_CLOSE = b"</p>"
# bytes-level regex: no whole-document utf-8 decode (corrupt/binary
# payloads must degrade, not fail the task), and only matched hrefs are
# decoded — identical output for valid utf-8 documents
_HREF_RE = re.compile(rb'href="([^"]+)"')
_GZIP_MAGIC = b"\x1f\x8b"


def _maybe_gunzip(b: bytes | None) -> bytes | None:
    """Transparent gzip-member decompression (Common Crawl WARC payloads
    arrive gzipped): payloads starting with the gzip magic are inflated
    with stdlib zlib; anything else — including a corrupt gzip stream —
    passes through unchanged, so a poison blob degrades to "no <p> tag"
    instead of failing the fetch task. Uncompressed payloads take one
    two-byte compare, keeping the byte-identical extraction contract
    untouched for them."""
    if b is None or b[:2] != _GZIP_MAGIC:
        return b
    try:
        return zlib.decompress(b, 16 + zlib.MAX_WBITS)
    except zlib.error:
        return b


def _extract_text_bytes(html: bytes | None) -> str | None:
    if html is None:
        return None
    i = html.find(_P_OPEN)
    if i < 0:
        return ""
    j = html.find(_P_CLOSE, i)
    if j < 0:
        j = len(html)
    body = html[i + len(_P_OPEN) : j]
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        # poison blob that happens to contain b"<p>": degrade per-row
        # (valid corpus text is utf-8, so the strict path is unchanged)
        return body.decode("utf-8", "replace")


def _extract_links_bytes(html: bytes | None) -> list[str]:
    if html is None:
        return []
    out = []
    for m in _HREF_RE.findall(html):
        try:
            out.append(m.decode("utf-8"))
        except UnicodeDecodeError:
            continue  # non-utf8 href in a poison blob: drop that link
    return out


@F.pandas_udf(BinaryType())
def gunzip_udf(payload: pd.Series) -> pd.Series:
    """Standalone transparent-decompression column for pipelines that
    materialize inflated html (the extraction UDFs below already gunzip
    inline, so the fetch path never needs this extra pass)."""
    return payload.map(_maybe_gunzip)


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: _extract_text_bytes(_maybe_gunzip(b)))


@F.pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: _extract_links_bytes(_maybe_gunzip(b)))


@F.pandas_udf(StructType([
    StructField("text", StringType()),
    StructField("links", ArrayType(StringType())),
]))
def extract_page_udf(html: pd.Series) -> pd.DataFrame:
    """Single-pass extraction: decode (gunzip at most once) each html
    payload once, produce both the text and the outlink list. The fetch
    path uses this so the (large) html column is read exactly once and
    never cached."""
    inflated = html.map(_maybe_gunzip)
    return pd.DataFrame({
        "text": inflated.map(_extract_text_bytes),
        "links": inflated.map(_extract_links_bytes),
    })
