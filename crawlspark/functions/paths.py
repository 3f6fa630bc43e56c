"""Mirror-path formatting for the disk-mirror sink (O25/O26).

Re-derives the reference's ``PathFormatter`` + ``GetDestinationPath``
semantics (src/CatalogCrawler/Logic/PathFormatter.cs:30-60,
Logic/Downloader.cs:246-279) as expression-only Spark columns — no
Python UDF anywhere, so the whole mapping stays inside whole-stage
codegen at any corpus size:

* ``format_page_path``: ``pageN.json`` leaf files gain a 500-wide
  ``page{lo}-page{hi}/`` bucket directory (PathFormatter.cs:45-59) so
  no directory level ever holds more than 500 page files.
* ``format_leaf_path``: a ``yyyy.MM.dd.HH.mm.ss`` commit-timestamp
  directory explodes into ``yyyy/MM/dd/HH/mm.ss`` (PathFormatter.cs:30-39)
  — the year/month/day/hour fan-out that keeps timestamp directories
  bounded (O25).
* ``mirror_path``: the full URL → relative destination path mapping with
  the reference's validation gates (https + default port, no query
  string, non-empty path, no dot-prefixed segment — Downloader.cs:249-263,
  PathFormatter.cs:17-20), applying both formatters when
  ``format_paths=True`` in the reference's order (page first, then leaf
  — Downloader.cs:267-271).

Validation failures raise IN the plan (``F.raise_error``, the O15/O20
guardrail pattern) under ``strict=True`` — the reference throws per URL
— or yield NULL under ``strict=False`` for quarantine-style flows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PAGE_BUCKET = 500

_PAGE_RE = r"^page([0-9]+)\.json$"
_TS_RE = r"^([0-9]{4})\.([0-9]{2})\.([0-9]{2})\.([0-9]{2})\.([0-9]{2}\.[0-9]{2})$"
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+(/[^?#]*)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def format_page_path(path: Column | str) -> Column:
    """PathFormatter.FormatPagePath (PathFormatter.cs:45-59): when the
    last segment is ``page<N>.json``, insert a ``page{lo}-page{hi}``
    bucket directory before it (bucket width 500, half-open on N)."""
    path = _col(path)
    segs = F.split(path, "/")
    n = F.size(segs)
    last = F.get(segs, n - 1)
    num = F.regexp_extract(last, _PAGE_RE, 1)
    pn = num.cast("long")
    lo = pn - pn % PAGE_BUCKET
    piece = F.concat(
        F.lit("page"), lo.cast("string"),
        F.lit("-page"), (lo + PAGE_BUCKET - 1).cast("string"),
    )
    rebuilt = F.array_join(
        F.concat(F.slice(segs, 1, n - 1), F.array(piece, last)), "/"
    )
    return F.when(num == "", path).otherwise(rebuilt)


def format_leaf_path(path: Column | str) -> Column:
    """PathFormatter.FormatLeafPath (PathFormatter.cs:30-39): when the
    second-to-last segment is a ``yyyy.MM.dd.HH.mm.ss`` commit
    timestamp, split it into ``yyyy/MM/dd/HH/mm.ss`` directories."""
    path = _col(path)
    segs = F.split(path, "/")
    n = F.size(segs)
    ts = F.get(segs, n - 2)  # NULL (not ANSI error) when n < 2
    new_ts = F.regexp_replace(ts, _TS_RE, r"$1/$2/$3/$4/$5")
    rebuilt = F.array_join(
        F.concat(F.slice(segs, 1, n - 2), F.array(new_ts), F.array(F.get(segs, n - 1))),
        "/",
    )
    return F.when(n >= 2, rebuilt).otherwise(path)


def mirror_path(
    url: Column | str, *, format_paths: bool = False, strict: bool = True
) -> Column:
    """Downloader.GetDestinationPath (Downloader.cs:246-279): map a
    document URL to its mirror-relative destination ``host/path``,
    optionally applying both directory-fanout formatters. The caller
    prepends the data directory (the reference's Path.Combine)."""
    url = _col(url)
    scheme = F.regexp_extract(url, _SCHEME_RE, 1)
    authority = F.regexp_extract(url, _AUTH_RE, 1)
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    host = F.regexp_replace(authority, r":[0-9]+$", "")
    has_query = F.regexp_extract(url, r"^[^#]*(\?)", 1) != ""
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"^/+", "")
    dot_seg = F.exists(F.split(path, "/"), lambda s: s.startswith("."))

    invalid = (
        F.when(F.lower(scheme) != "https", F.lit("must be HTTPS and use the default port"))
        .when(~port.isin("", "443"), F.lit("must be HTTPS and use the default port"))
        .when(has_query, F.lit("no query string is allowed"))
        .when(path == "", F.lit("must have a path"))
        .when(dot_seg, F.lit("must not have segments starting with a period"))
    )
    if format_paths:
        # reference order: page bucketing first, then timestamp fan-out
        # (Downloader.cs:267-271) — the inserted bucket dir never matches
        # the timestamp regex, so the two compose without interaction
        path = format_leaf_path(format_page_path(path))
    dest = F.concat_ws("/", host, path)
    if strict:
        return F.when(
            invalid.isNotNull(),
            F.raise_error(F.concat(F.lit("The URL '"), url, F.lit("' "), invalid)).cast("string"),
        ).otherwise(dest)
    return F.when(invalid.isNotNull(), F.lit(None).cast("string")).otherwise(dest)


def mirror_path_oracle_sql(table: str, url_col: str, *, format_paths: bool) -> str:
    """Full SELECT twin: (url, dest) rows with NULL dest for invalid
    URLs, page bucketing and timestamp fan-out matching mirror_path."""
    fmt_page = f"""
      CASE WHEN regexp_matches(segs[-1], '^page([0-9]+)\\.json$')
           THEN list_concat(segs[1:len(segs)-1],
                ['page' || CAST(pn - pn % {PAGE_BUCKET} AS VARCHAR) ||
                 '-page' || CAST(pn - pn % {PAGE_BUCKET} + {PAGE_BUCKET - 1} AS VARCHAR),
                 segs[-1]])
           ELSE segs END"""
    return f"""
      WITH u AS (
        SELECT {url_col} AS url,
               lower(regexp_extract({url_col}, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
               regexp_extract({url_col}, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]+)', 1) AS auth,
               regexp_replace(regexp_extract({url_col},
                 '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]+(/[^?#]*)', 1), '^/+', '') AS path
        FROM {table}),
      v AS (
        SELECT url, scheme, auth,
               regexp_replace(auth, ':[0-9]+$', '') AS host,
               regexp_extract(auth, ':([0-9]+)$', 1) AS port,
               regexp_extract(url, '^[^#]*(\\?)', 1) <> '' AS has_query,
               path, string_split(path, '/') AS segs,
               TRY_CAST(regexp_extract(path, '(?:^|/)page([0-9]+)\\.json$', 1) AS BIGINT) AS pn
        FROM u),
      f AS (
        SELECT *, {fmt_page if format_paths else 'segs'} AS segs2 FROM v),
      g AS (
        SELECT *,
               CASE WHEN len(segs2) >= 2
                      AND regexp_matches(segs2[-2],
                        '^[0-9]{{4}}\\.[0-9]{{2}}\\.[0-9]{{2}}\\.[0-9]{{2}}\\.[0-9]{{2}}\\.[0-9]{{2}}$')
                    THEN list_concat(segs2[1:len(segs2)-2],
                         [regexp_replace(segs2[-2],
                            '^([0-9]{{4}})\\.([0-9]{{2}})\\.([0-9]{{2}})\\.([0-9]{{2}})\\.([0-9]{{2}}\\.[0-9]{{2}})$',
                            '\\1/\\2/\\3/\\4/\\5'),
                          segs2[-1]])
                    ELSE segs2 END AS segs3
        FROM f)
      SELECT url,
             CASE
               WHEN scheme <> 'https' THEN NULL
               WHEN port NOT IN ('', '443') THEN NULL
               WHEN has_query THEN NULL
               WHEN path = '' THEN NULL
               WHEN len(list_filter(string_split(path, '/'), s -> s LIKE '.%')) > 0 THEN NULL
               ELSE host || '/' || list_aggregate({'segs3' if format_paths else 'segs'}, 'string_agg', '/')
             END AS dest
      FROM g"""
