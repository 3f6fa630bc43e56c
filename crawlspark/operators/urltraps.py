"""Spider-trap URL guards — the frontier's crawler-trap immune system.

Web-scale frontiers die by URL-space explosion, not by content volume:
calendar pages that link to the next day forever, session-id query
params that mint a fresh URL per request, and path-loop traps
(``/a/b/a/b/a/b/…``) each produce UNBOUNDED url sets from finite sites.
A 10^10-URL frontier budget is spent on garbage unless link admission
bounds the URL shape itself. These are the four standard guards
(Heritrix ships the same family: TooManyPathSegmentsDecideRule,
PathologicalPathDecideRule, max-url-length):

* ``path_depth``       — number of non-empty path segments
* ``query_params``     — number of ``&``-separated query params
* ``max_seg_repeat``   — max multiplicity of one path segment anywhere
  in the path (the path-loop / calendar signal; Heritrix matches
  CONSECUTIVE repeats via a backreference regex, but RE2-based engines
  (the DuckDB oracle) have no backreferences, so the guard uses the
  strictly-stronger any-position multiplicity — a segment repeated k
  times consecutively also has multiplicity k)
* ``url_len``          — total URL length

All pure column expressions (split/filter/transform/size — whole-stage
codegen, zero shuffle, zero UDF): the guard adds no measurable cost to
the link-admission stage at any corpus size. The segment array is
staged in its own projection and referenced from BOTH the depth and the
repeat computation so CollapseProject cannot inline the split+filter
into every transform-lambda element (the O(k²)→O(k³) HOF re-evaluation
gotcha — see operators/textops.py winnow_fingerprints).

Counts are exact integers — the DuckDB twin (``url_trap_features_sql``)
computes byte-identical values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlspark.functions.urls import path_of

TRAP_MAX_PATH_DEPTH = 12
TRAP_MAX_QUERY_PARAMS = 8
TRAP_MAX_SEGMENT_REPEAT = 3
TRAP_MAX_URL_LEN = 2048

_QS_RE = r"\?([^#]*)"


def _query_string(url: Column) -> Column:
    return F.regexp_extract(url, _QS_RE, 1)


def _segments(url: Column) -> Column:
    return F.filter(F.split(path_of(url), "/"), lambda x: x != "")


def url_trap_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append the four guard features as BIGINT columns
    (path_depth, query_params, max_seg_repeat, url_len)."""
    url = F.col(url_col)
    staged = df.select("*", _segments(url).alias("__segs"))
    segs = F.col("__segs")
    qs = _query_string(url)
    return staged.select(
        *df.columns,
        F.size(segs).cast("long").alias("path_depth"),
        F.when(qs == "", F.lit(0))
        .otherwise(F.size(F.split(qs, "&")))
        .cast("long")
        .alias("query_params"),
        F.coalesce(
            F.array_max(
                F.transform(segs, lambda s: F.size(F.filter(segs, lambda x: x == s)))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("max_seg_repeat"),
        F.length(url).cast("long").alias("url_len"),
    )


def is_probable_trap(
    max_path_depth: int = TRAP_MAX_PATH_DEPTH,
    max_query_params: int = TRAP_MAX_QUERY_PARAMS,
    max_segment_repeat: int = TRAP_MAX_SEGMENT_REPEAT,
    max_url_len: int = TRAP_MAX_URL_LEN,
) -> Column:
    """Predicate over the feature columns added by url_trap_features."""
    return (
        (F.col("path_depth") > max_path_depth)
        | (F.col("query_params") > max_query_params)
        | (F.col("max_seg_repeat") > max_segment_repeat)
        | (F.col("url_len") > max_url_len)
    )


def filter_crawl_traps(
    df: DataFrame,
    url_col: str = "url",
    max_path_depth: int = TRAP_MAX_PATH_DEPTH,
    max_query_params: int = TRAP_MAX_QUERY_PARAMS,
    max_segment_repeat: int = TRAP_MAX_SEGMENT_REPEAT,
    max_url_len: int = TRAP_MAX_URL_LEN,
) -> DataFrame:
    """Admit only non-trap rows; the feature columns do not survive."""
    feat = url_trap_features(df, url_col=url_col)
    return feat.where(
        ~is_probable_trap(
            max_path_depth, max_query_params, max_segment_repeat, max_url_len
        )
    ).select(*df.columns)


def url_trap_features_sql(urls_sql: str, url_col: str = "url") -> str:
    """DuckDB twin of url_trap_features over ``urls_sql`` (any relation
    with ``url_col``); emits every input column plus the four features."""
    u = url_col
    return f"""
      WITH src AS ({urls_sql}),
      staged AS (
        SELECT *,
               list_filter(string_split(regexp_extract({u}, 'https?://[^/?#]+(/[^?#]*)', 1), '/'),
                           x -> x <> '') AS __segs,
               regexp_extract({u}, '\\?([^#]*)', 1) AS __qs
        FROM src
      )
      SELECT * EXCLUDE (__segs, __qs),
             CAST(len(__segs) AS BIGINT) AS path_depth,
             CAST(CASE WHEN __qs = '' THEN 0 ELSE len(string_split(__qs, '&')) END AS BIGINT) AS query_params,
             CAST(coalesce(list_max(list_transform(__segs, s -> len(list_filter(__segs, x -> x = s)))), 0) AS BIGINT) AS max_seg_repeat,
             CAST(length({u}) AS BIGINT) AS url_len
      FROM staged"""
