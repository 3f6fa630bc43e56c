"""Page-level robots directives: ``<meta name="robots">`` and
``rel="nofollow"`` link admission.

RFC 9309 governs robots.txt (operators/politeness.py); page-LEVEL
crawl directives live in the HTML itself and every polite crawler
honors both: a ``<meta name="robots" content="noindex, nofollow">``
tag (Google/Bing robots-meta spec; ``none`` is shorthand for both
directives), and per-link ``rel="nofollow"`` attributes (rel spec,
microformats). A crawler that ignores them re-fetches pages site
owners excluded and follows links publishers disclaimed — the same
class of defect as ignoring Disallow.

Everything is column expressions over the raw HTML string — tag
arrays via ``regexp_extract_all``, per-tag attribute pulls inside
``transform``/``filter`` lambdas that touch ONLY their element (the
repo's HOF rule), and the directive/tag arrays STAGED as projected
columns so their multiple consumers don't clone the regexp battery
(CollapseProject barrier, winnow pattern). Case-insensitivity is
inline ``(?i)`` — identical semantics in Java regex and RE2, so the
DuckDB twin runs the byte-identical chain.

Scale shape: per-row, zero shuffle; rides the same scan as the rest
of the extraction battery. ``admissible_links`` output feeds the
crawl's link-admission chain (epoch.py) exactly where the trap guard
and blocklist anti-joins already sit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_TAG_RE = r"(?i)<meta\s[^>]*>"
A_TAG_RE = r"(?i)<a\s[^>]*>"
_NAME_ROBOTS_RE = r'(?i)name\s*=\s*"robots"'
_CONTENT_RE = r'(?i)content\s*=\s*"([^"]*)"'
_HREF_RE = r'(?i)href\s*=\s*"([^"]*)"'
_REL_NOFOLLOW_RE = r'(?i)rel\s*=\s*"[^"]*nofollow[^"]*"'


def robots_meta_flags(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Page-level robots directives: ``(id, noindex, nofollow_page)``.
    All ``<meta name="robots">`` tags on the page contribute (attribute
    order free); directives are comma-split, trimmed, lowercased;
    ``none`` implies both noindex and nofollow per the robots-meta
    spec. Pages with no robots meta get (false, false) — permissive
    default, same as the spec."""
    staged = df.select(
        F.col(id_col),
        F.flatten(
            F.transform(
                F.filter(
                    F.regexp_extract_all(F.col(html_col), F.lit(META_TAG_RE), F.lit(0)),
                    lambda t: t.rlike(_NAME_ROBOTS_RE),
                ),
                lambda t: F.split(
                    F.lower(F.regexp_extract(t, _CONTENT_RE, 1)), ","
                ),
            )
        ).alias("__dirs"),
    )
    d = F.transform(F.col("__dirs"), lambda s: F.trim(s))
    return staged.select(
        F.col(id_col),
        (
            F.exists(d, lambda s: s == "noindex")
            | F.exists(d, lambda s: s == "none")
        ).alias("noindex"),
        (
            F.exists(d, lambda s: s == "nofollow")
            | F.exists(d, lambda s: s == "none")
        ).alias("nofollow_page"),
    )


def admissible_links(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Per-link admission verdicts: ``(id, href, link_nofollow,
    nofollow_page, admissible)`` — one row per anchor tag carrying an
    href; ``admissible`` = neither the link nor the page says
    nofollow. Feed ``WHERE admissible`` into the crawl's link-admission
    chain alongside the trap/blocklist guards.

    Meta directives and anchor tags are pulled in ONE staged projection
    (the SQL twin's shape) — a join of robots_meta_flags against a
    separate link scan would read the html column twice."""
    staged = df.select(
        F.col(id_col),
        F.flatten(
            F.transform(
                F.filter(
                    F.regexp_extract_all(F.col(html_col), F.lit(META_TAG_RE), F.lit(0)),
                    lambda t: t.rlike(_NAME_ROBOTS_RE),
                ),
                lambda t: F.split(F.lower(F.regexp_extract(t, _CONTENT_RE, 1)), ","),
            )
        ).alias("__dirs"),
        F.regexp_extract_all(F.col(html_col), F.lit(A_TAG_RE), F.lit(0)).alias("__a"),
    )
    d = F.transform(F.col("__dirs"), lambda s: F.trim(s))
    flagged = staged.select(
        F.col(id_col),
        (
            F.exists(d, lambda s: s == "nofollow")
            | F.exists(d, lambda s: s == "none")
        ).alias("nofollow_page"),
        "__a",
    )
    links = flagged.select(
        F.col(id_col),
        "nofollow_page",
        F.explode_outer(
            F.transform(
                F.col("__a"),
                lambda t: F.struct(
                    F.regexp_extract(t, _HREF_RE, 1).alias("href"),
                    t.rlike(_REL_NOFOLLOW_RE).alias("link_nofollow"),
                ),
            )
        ).alias("__l"),
    ).where(F.col("__l.href").isNotNull() & (F.col("__l.href") != ""))
    return links.select(
        F.col(id_col),
        F.col("__l.href").alias("href"),
        F.col("__l.link_nofollow").alias("link_nofollow"),
        "nofollow_page",
        (~F.col("__l.link_nofollow") & ~F.col("nofollow_page")).alias("admissible"),
    )


def admissible_links_sql(
    table: str = "documents", id_col: str = "doc_id", html_col: str = "html"
) -> str:
    """DuckDB twin of :func:`admissible_links` — identical regex chain
    ((?i) inline, same patterns), list ops via list_filter /
    list_transform / flatten."""
    dirs = f"""flatten(list_transform(
        list_filter(regexp_extract_all({html_col}, '{META_TAG_RE}'),
                    t -> regexp_matches(t, '{_NAME_ROBOTS_RE}')),
        t -> string_split(lower(regexp_extract(t, '{_CONTENT_RE}', 1)), ',')))"""
    return f"""
      WITH staged AS (
        SELECT {id_col},
               list_transform({dirs}, s -> trim(s)) AS dirs,
               regexp_extract_all({html_col}, '{A_TAG_RE}') AS atags
        FROM {table}),
      flags AS (
        SELECT {id_col},
               len(list_filter(dirs, s -> s = 'noindex' OR s = 'none')) > 0
                 AS noindex,
               len(list_filter(dirs, s -> s = 'nofollow' OR s = 'none')) > 0
                 AS nofollow_page,
               atags
        FROM staged),
      links AS (
        SELECT {id_col}, nofollow_page,
               regexp_extract(u.t, '{_HREF_RE}', 1) AS href,
               regexp_matches(u.t, '{_REL_NOFOLLOW_RE}') AS link_nofollow
        FROM flags, LATERAL unnest(atags) AS u(t))
      SELECT {id_col}, href, link_nofollow, nofollow_page,
             NOT link_nofollow AND NOT nofollow_page AS admissible
      FROM links WHERE href IS NOT NULL AND href <> ''
    """
