"""DUST: learning content-irrelevant URL parameters from crawl evidence.

"Different URLs with Similar Text" (Bar-Yossef, Keidar, Schonfeld,
WWW 2007 — the DustBuster algorithm) — large sites serve the same
content under many URLs (session ids, tracking params, sort orders).
Static normalization (functions/urls.normalize_url) can only strip
universally-safe junk; which parameters are content-irrelevant is a
per-site fact that must be LEARNED from the crawl's own (url, content)
observations, then applied to collapse future frontier aliases. This
module is the query-parameter fragment of that loop, re-derived
Spark-first:

* :func:`parse_url_params` — canonical decomposition: base (scheme +
  host + path), sorted ``k=v`` parameter list, canonical url string.
* :func:`mine_dust_rules` — candidate rule "parameter ``k`` is
  irrelevant on host ``h``": for every url carrying ``k``, look up the
  SAME url with ``k`` removed among the observed canonical urls (one
  equi-join — never url x url); the rule is accepted when at least
  ``min_support`` such pairs exist and EVERY pair's content
  fingerprints agree (one disagreement is proof the parameter matters;
  DustBuster's "no counter-evidence" criterion).
* :func:`apply_dust_rules` — strip accepted (host, param) rules from a
  url column and re-canonicalize: one broadcast join of the per-host
  banned-key arrays, then pure per-row list expressions.

Scale shape (10^10 urls): parsing and reassembly are column
expressions; mining shuffles (cu_minus_k, host, k, fp) — short strings
+ a 16-byte fp, one row per (url, distinct param key), never page
content; the probe side joins against the distinct (canonical url, fp)
relation on a string key, a plain shuffled equi-join that AQE can
re-plan. Accepted rules are O(#hosts x #params) — broadcast material
by construction. Collapsing aliases BEFORE fetch is the payoff: every
stripped duplicate saves a whole fetch + parse + dedup round trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BASE_RE = r"^([^?#]*)"
QUERY_RE = r"\?([^#]*)"
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"


def _params_of(url: Column) -> Column:
    """Sorted non-empty ``k=v`` strings of the url's query part."""
    q = F.regexp_extract(url, QUERY_RE, 1)
    return F.array_sort(
        F.filter(F.split(q, "&"), lambda p: p != "")
    )


def parse_url_params(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Adds ``base`` / ``host`` / ``params`` (sorted) / ``canon`` (the
    canonical url: base + sorted params) to ``df``."""
    url = F.col(url_col)
    base = F.regexp_extract(url, BASE_RE, 1)
    params = _params_of(url)
    canon = F.concat(
        base,
        F.when(F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&")))
        .otherwise(F.lit("")),
    )
    return df.select(
        "*",
        base.alias("base"),
        F.regexp_extract(url, HOST_RE, 1).alias("host"),
        params.alias("params"),
        canon.alias("canon"),
    )


def mine_dust_rules(
    observed: DataFrame,
    url_col: str = "url",
    fp_col: str = "content_fp",
    min_support: int = 3,
) -> DataFrame:
    """Mine per-host irrelevant-parameter rules from ``(url,
    content_fp)`` observations: ``(host, param, n_pairs, n_agree,
    accepted)`` — one row per (host, param-key) candidate that had at
    least one probe pair; ``accepted`` = n_pairs >= min_support AND
    n_agree == n_pairs (any fingerprint disagreement kills the rule).

    Crawl logs observe the same (url, fingerprint) many times, and
    every count below is a pure function of the (url, fp) pair — so
    the stream is reduced to ``(url, fp, weight)`` FIRST (one map-side
    -partial aggregate) and the parse → explode → probe-join pipeline
    runs once per DISTINCT pair, ``n_pairs`` / ``n_agree`` summing the
    weights. Identical output: min(fp) per canon is the same over the
    distinct set, and each duplicate observation contributes exactly
    its url's key-explosion rows. The deduped parse is checkpointed —
    targets and probes are two consumers of the same tiny relation."""
    parsed = parse_url_params(
        observed.select(F.col(url_col).alias("url"), F.col(fp_col).alias("fp"))
        .groupBy("url", "fp")
        .agg(F.count("*").alias("__w")),
    ).localCheckpoint(eager=False)
    targets = parsed.groupBy("canon").agg(F.min("fp").alias("fp2"))
    keys = parsed.select(
        "base", "host", "params", "fp", "__w",
        F.explode(
            F.array_distinct(
                F.transform(F.col("params"), lambda p: F.substring_index(p, "=", 1))
            )
        ).alias("k"),
    )
    remaining = F.filter(
        F.col("params"),
        # closes over its element + the cheap k column only (HOF rule)
        lambda p: F.substring_index(p, "=", 1) != F.col("k"),
    )
    probes = keys.select(
        "host", "k", "fp", "__w",
        F.concat(
            F.col("base"),
            F.when(
                F.size(remaining) > 0,
                F.concat(F.lit("?"), F.array_join(remaining, "&")),
            ).otherwise(F.lit("")),
        ).alias("cu_minus_k"),
    )
    pairs = probes.join(
        targets, probes["cu_minus_k"] == targets["canon"], "inner"
    )
    agg = pairs.groupBy("host", F.col("k").alias("param")).agg(
        F.sum("__w").alias("n_pairs"),
        F.sum(F.when(F.col("fp") == F.col("fp2"), F.col("__w")).otherwise(0)).alias("n_agree"),
    )
    return agg.select(
        "host", "param",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_agree").cast("long").alias("n_agree"),
        (
            (F.col("n_pairs") >= min_support)
            & (F.col("n_agree") == F.col("n_pairs"))
        ).alias("accepted"),
    )


def apply_dust_rules(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "dust_url",
) -> DataFrame:
    """Strip accepted rule parameters and re-canonicalize: adds
    ``out_col``. One broadcast join of (host -> banned key array);
    everything else is per-row list expressions, so the url stream is
    never shuffled."""
    banned = (
        rules.where(F.col("accepted"))
        .groupBy("host")
        .agg(F.collect_set("param").alias("__banned"))
    )
    parsed = parse_url_params(df, url_col)
    joined = parsed.join(F.broadcast(banned), "host", "left")
    kept = F.filter(
        F.col("params"),
        lambda p: ~F.coalesce(
            F.array_contains(F.col("__banned"), F.substring_index(p, "=", 1)),
            F.lit(False),
        ),
    )
    out = F.concat(
        F.col("base"),
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&")))
        .otherwise(F.lit("")),
    )
    return joined.withColumn(out_col, out).drop(
        "base", "host", "params", "canon", "__banned"
    )


def mine_dust_rules_sql(
    observed_expr: str,
    url_expr: str = "url",
    fp_expr: str = "content_fp",
    min_support: int = 3,
) -> str:
    """DuckDB twin of :func:`mine_dust_rules` — same canonicalization
    (sorted params), same probe join, same acceptance rule."""
    return f"""
      WITH src AS (SELECT {url_expr} AS url, {fp_expr} AS fp FROM {observed_expr}),
      parsed AS (
        SELECT url, fp,
               regexp_extract(url, '^([^?#]*)', 1) AS base,
               regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
               list_sort(list_filter(
                   string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                   p -> p <> '')) AS params
        FROM src),
      canon AS (
        SELECT *,
               base || CASE WHEN len(params) > 0
                            THEN '?' || array_to_string(params, '&')
                            ELSE '' END AS canon
        FROM parsed),
      targets AS (SELECT canon, min(fp) AS fp2 FROM canon GROUP BY canon),
      keys AS (
        SELECT base, host, params, fp, u.k AS k
        FROM canon, LATERAL unnest(list_distinct(
               list_transform(params, p -> split_part(p, '=', 1)))) AS u(k)),
      probes AS (
        SELECT host, k, fp,
               base || CASE WHEN len(list_filter(params,
                                p -> split_part(p, '=', 1) <> k)) > 0
                            THEN '?' || array_to_string(list_filter(params,
                                p -> split_part(p, '=', 1) <> k), '&')
                            ELSE '' END AS cu_minus_k
        FROM keys),
      pairs AS (
        SELECT p.host, p.k, p.fp, t.fp2
        FROM probes p JOIN targets t ON p.cu_minus_k = t.canon),
      agg AS (
        SELECT host, k AS param,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN fp = fp2 THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
        FROM pairs GROUP BY host, k)
      SELECT host, param, n_pairs, n_agree,
             n_pairs >= {min_support} AND n_agree = n_pairs AS accepted
      FROM agg
    """
