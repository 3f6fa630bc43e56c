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
      convention — cross-engine exact), NULL when absent, non-numeric,
      or outside the protocol's 0.0-1.0 range (a hostile
      <priority>9.9</priority> must not jump the frontier queue).

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
    prio = F.col("e.prio")
    return exploded.where(F.trim(F.col("e.loc")) != "").select(
        "host",
        "kind",
        F.trim(F.col("e.loc")).alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.changefreq").alias("changefreq"),
        F.when((prio >= 0) & (prio <= 1), F.round(prio * 1000))
        .cast("int")
        .alias("priority_milli"),
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


# sitemap changefreq → recrawl interval in seconds ('never' is special-
# cased: recrawl only on a lastmod newer than our copy)
_CHANGEFREQ_S = {
    "always": 0,
    "hourly": 3_600,
    "daily": 86_400,
    "weekly": 604_800,
    "monthly": 2_592_000,
    "yearly": 31_536_000,
}


def schedule_recrawl(
    entries: DataFrame,
    fetched: DataFrame,
    now,
    default_interval_s: int = 604_800,
) -> DataFrame:
    """Freshness scheduling: which sitemap URLs are due for (re)crawl at
    ``now``? Returns ``(url, priority, reason)`` in the frontier's seed
    shape, with ``reason`` one of:

    * ``'new'``      — never fetched;
    * ``'modified'`` — sitemap ``lastmod`` is newer than our fetch (the
      publisher told us the copy is stale — applies even to
      ``changefreq=never`` pages);
    * ``'stale'``    — fetched longer ago than the ``changefreq``
      interval (``default_interval_s`` when absent/unknown; ``never``
      pages are only recrawled via ``lastmod``).

    ``entries`` is :func:`parse_sitemaps` output; ``fetched`` is
    ``(url, fetch_ts)`` — e.g. the crawl state's fetched table with its
    max fetch timestamp per url. ``now`` is an explicit parameter (ISO
    string or datetime), never the wall clock: scheduling must be
    deterministic and replayable. Left join on url (the fetched side is
    the big one at scale: shuffle equi-join, both sides prunable to two
    columns), everything else column expressions."""
    e = entries.where(F.col("kind") == "urlset").select(
        F.col("loc").alias("url"),
        F.try_to_timestamp("lastmod").alias("__lastmod_ts"),
        F.lower("changefreq").alias("__cf"),
        F.coalesce("priority_milli", F.lit(500)).alias("__pm"),
    )
    imap = F.create_map(
        *[x for k, v in _CHANGEFREQ_S.items() for x in (F.lit(k), F.lit(v))]
    )
    interval_s = F.coalesce(imap[F.col("__cf")], F.lit(default_interval_s))
    now_ts = F.lit(now).cast("timestamp")
    j = e.join(fetched.select("url", "fetch_ts"), "url", "left")
    reason = (
        F.when(F.col("fetch_ts").isNull(), "new")
        .when(F.col("__lastmod_ts") > F.col("fetch_ts"), "modified")
        .when(
            (F.coalesce(F.col("__cf"), F.lit("")) != "never")
            & (
                F.unix_timestamp(now_ts) - F.unix_timestamp("fetch_ts")
                >= interval_s
            ),
            "stale",
        )
    )
    return (
        j.withColumn("reason", reason)
        .where(F.col("reason").isNotNull())
        .select(
            "url",
            (F.lit(1000) - F.col("__pm")).cast("int").alias("priority"),
            "reason",
        )
    )
