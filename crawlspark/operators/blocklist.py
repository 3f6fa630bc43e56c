"""Domain blocklist filtering — registrable-suffix matching at link
admission.

Webtext pipelines carry curated domain blocklists (UT1-style category
lists, C4's bad-words domains, spam/SEO-farm lists). The match rule is
SUFFIX matching on dot boundaries: blocking ``example.com`` must block
``www.example.com`` and ``a.b.example.com`` but NOT
``notexample.com``.

Scale shape — per-label-depth broadcast hash anti-joins:

A url's host has at most ``max_labels`` dot-separated labels, so suffix
matching decomposes into ≤ max_labels EXACT-equality checks: "are the
last k labels, joined by dots, a blocklist row?" for k = 1..max_labels.
Each check is a broadcast hash LEFT ANTI join on a derived string key —
narrow (zero shuffle of the link stream), whole-stage codegen, O(1)
hash probe per row — and a domain of k labels can only ever equal a
k-label suffix, so every join uses the SAME broadcast blocklist. The
alternatives lose at scale: explode(suffixes) + semi + anti re-shuffles
the full link relation on url; a broadcast nested-loop join with
``array_contains`` scans the whole blocklist per row (fine at 10³
domains, dead at the 10⁶ of a real UT1 list). The chain keeps the cost
max_labels hash probes per link regardless of blocklist size (the
blocklist must fit in a broadcast — at 10⁶ domains · ~20 bytes that is
~20 MB, comfortably under default thresholds).

The suffix keys are derived once per row in a single staged projection
(the CollapseProject barrier idiom — see operators/urltraps.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark.functions.urls import host_of

DEFAULT_MAX_LABELS = 8


def filter_blocked_hosts(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    max_labels: int = DEFAULT_MAX_LABELS,
) -> DataFrame:
    """Drop rows whose url host equals, or is a subdomain of, any
    blocklist domain. Blocklist domains deeper than ``max_labels``
    labels never match (raise the cap if your list has them)."""
    labels = F.split(host_of(F.col(url_col)), r"\.")
    sufs = [f"__suf{k}" for k in range(1, max_labels + 1)]
    # stage the label array first so the k suffix expressions share ONE
    # split() evaluation per row instead of max_labels of them
    staged = df.select("*", labels.alias("__labels")).select(
        "*",
        *[
            F.when(
                F.size(F.col("__labels")) >= k,
                F.array_join(F.slice(F.col("__labels"), -k, k), "."),
            ).alias(name)
            for k, name in enumerate(sufs, start=1)
        ],
    )
    bl = F.broadcast(blocklist.select(F.col(domain_col).alias("__bldom")).distinct())
    out = staged
    for name in sufs:
        out = out.join(bl, out[name] == F.col("__bldom"), "left_anti")
    return out.select(*df.columns)


def filter_blocked_hosts_sql(
    src_sql: str,
    blocklist_sql: str,
    url_col: str = "url",
    max_labels: int = DEFAULT_MAX_LABELS,
) -> str:
    """DuckDB twin: NOT EXISTS over the suffix list (the oracle runs at
    test scale, so the quadratic list_contains shape is fine there)."""
    return f"""
      WITH src AS ({src_sql}),
      bl AS (SELECT DISTINCT domain FROM ({blocklist_sql})),
      hosts AS (
        SELECT *,
               string_split(regexp_extract({url_col}, 'https?://([^/?#]+)', 1), '.') AS __labels
        FROM src
      ),
      sufs AS (
        SELECT * EXCLUDE (__labels),
               list_filter(
                 list_transform(range(1, {max_labels} + 1),
                   k -> CASE WHEN len(__labels) >= k
                             THEN array_to_string(__labels[len(__labels) - k + 1:], '.')
                        END),
                 s -> s IS NOT NULL) AS __sufs
        FROM hosts
      )
      SELECT * EXCLUDE (__sufs) FROM sufs
      WHERE NOT EXISTS (SELECT 1 FROM bl WHERE list_contains(__sufs, bl.domain))"""
