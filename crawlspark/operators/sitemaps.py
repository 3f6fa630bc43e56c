"""Sitemap parsing: XML sitemap / sitemap-index bodies → seed URL rows.

The discovery side of the crawl stack (reference analog: the catalog
*index* enumerating leaf documents to fetch — Downloader walks index →
page → leaf; a web crawl walks sitemap-index → sitemap → url). Bodies
arrive like robots.txt bodies do: one (host, xml) row per fetched
sitemap document.

Pure column expressions — split on closing ``</url>``/``</sitemap>``
tags, regexp-extract the child tags per block, no UDF and no shuffle
(the parse is a projection; one Generate for the per-block explode).
Deliberately NOT a conforming XML parser: no entity expansion, no
namespace resolution (tags match prefix-insensitively), CDATA is
unwrapped only around ``<loc>``. Real-world sitemaps are flat
machine-generated documents, and the tradeoff buys an expression-only
parse that runs at scan speed over billions of sitemap rows; a feed
that genuinely needs conforming XML goes through an Arrow UDF instead
(the multimodal mapInPandas shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one block per <url>…</url> (urlset) or <sitemap>…</sitemap> (index)
_BLOCK_SPLIT = r"(?i)</url\s*>|</sitemap\s*>"
_LOC = r"(?is)<loc\s*>(.*?)</loc\s*>"
_LASTMOD = r"(?is)<lastmod\s*>\s*([^<]*?)\s*</lastmod\s*>"
_CHANGEFREQ = r"(?is)<changefreq\s*>\s*([^<]*?)\s*</changefreq\s*>"
_PRIORITY = r"(?is)<priority\s*>\s*([^<]*?)\s*</priority\s*>"
_CDATA = r"(?s)^<!\[CDATA\[(.*)\]\]>$"


def parse_sitemaps(
    bodies: DataFrame, host_col: str = "host", body_col: str = "sitemap_xml"
) -> DataFrame:
    """Parse sitemap XML into one row per entry:
    ``(host, kind, loc, lastmod, changefreq, priority_milli)``.

    * ``kind``: ``'sitemapindex'`` when the document's root is a
      sitemap index (its ``loc`` values are MORE sitemaps to fetch),
      else ``'urlset'`` (its ``loc`` values are page seeds).
    * ``loc``: trimmed, CDATA-unwrapped URL; blocks without a loc are
      dropped (a document with none yields zero rows).
    * ``lastmod`` / ``changefreq``: raw trimmed strings, NULL when the
      tag is absent (lastmod stays a string — W3C datetime allows
      date-only and zoned forms; the caller decides how to coerce).
    * ``priority_milli``: priority × 1000 as an integer (micro-unit
      convention — cross-engine exact), NULL when absent/non-numeric.

    The per-block struct array is built in ONE projection and exploded
    in a second (the CollapseProject barrier), so the regexp battery
    runs once per block, not once per output column."""
    body = F.col(body_col)
    kind = F.when(
        body.rlike(r"(?is)<\s*sitemapindex"), F.lit("sitemapindex")
    ).otherwise(F.lit("urlset"))
    blocks = F.split(body, _BLOCK_SPLIT)
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_replace(
                F.trim(F.regexp_extract(b, _LOC, 1)), _CDATA, "$1"
            ).alias("loc"),
            F.nullif(F.regexp_extract(b, _LASTMOD, 1), F.lit("")).alias("lastmod"),
            F.nullif(F.regexp_extract(b, _CHANGEFREQ, 1), F.lit("")).alias(
                "changefreq"
            ),
            F.try_to_number(
                F.nullif(F.regexp_extract(b, _PRIORITY, 1), F.lit("")),
                F.lit("9.9999"),
            ).alias("prio"),
        ),
    )
    # explode_OUTER on purpose: plain explode triggers
    # InferFiltersFromGenerate, which clones the whole regexp battery
    # into a size()>0 pre-filter — doubling the parse cost per row. The
    # outer variant infers nothing; its extra null row per empty
    # document is dropped by the loc filter below anyway.
    exploded = bodies.select(
        F.col(host_col).alias("host"), kind.alias("kind"), entries.alias("__e")
    ).select("host", "kind", F.explode_outer("__e").alias("e"))
    return exploded.where(F.trim(F.col("e.loc")) != "").select(
        "host",
        "kind",
        F.trim(F.col("e.loc")).alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.changefreq").alias("changefreq"),
        F.round(F.col("e.prio") * 1000).cast("int").alias("priority_milli"),
    )


def seeds_from_sitemaps(parsed: DataFrame) -> DataFrame:
    """Turn parsed ``urlset`` entries into the crawl's seed shape
    ``(url, priority)``: sitemap priority 0.0-1.0 (higher = more
    important, 0.5 when absent per the protocol) maps onto the
    frontier's ASCENDING int priority as ``1000 - priority_milli``, so
    ``<priority>1.0</priority>`` dequeues first. ``sitemapindex`` rows
    are excluded — their locs are more sitemaps to fetch, not page
    seeds. Downstream ``_normalize_seeds`` validates URLs and dedupes
    (min priority wins), so feeding overlapping sitemaps is safe."""
    return parsed.where(F.col("kind") == "urlset").select(
        F.col("loc").alias("url"),
        (F.lit(1000) - F.coalesce("priority_milli", F.lit(500)))
        .cast("int")
        .alias("priority"),
    )
