"""Boilerplate removal: jusText-style block classification over HTML.

Between fetch and the document-level filters (C4/Gopher rules in
webfilters.py), a webtext pipeline must separate the page's MAIN text
from navigation, footers, link farms, and copyright chrome. jusText
(Pomikalek 2011, "Removing Boilerplate and Duplicate Content from Web
Corpora") is the canonical algorithm: split the page into block-level
segments, classify each block context-free by link density / length /
stopword density, then relabel the uncertain blocks from their nearest
confident neighbors (boilerplate clusters at page edges; main text is
contiguous). The reference engine has no analog — this is part of the
LLM-pipeline suite layered on the crawl, like the C4/Gopher filters.

Everything is column expressions — block split, tag strip, anchor-char
accounting, densities, and both classification passes — so the only
shuffle is the per-document window for the context pass (narrow rows:
id, idx, label), and the whole per-byte path stays in whole-stage
codegen. Ratios are integer micro-units (floor(x*1e6/y)): exact and
portable to the DuckDB twin.

Context-free rules (the jusText core, simplified to its published
defaults; the fine-grained 'copyright symbol' and link-density edge
rules are kept, the stoplist is the repo's corpus-aware one):

  * contains the copyright sign           -> bad
  * link_density > max_link_density       -> bad
  * n_chars < length_low                  -> bad if any linked chars,
                                             else short
  * stop_density >= stopwords_high        -> good if n_chars >
                                             length_high, else near_good
  * stop_density >= stopwords_low         -> near_good
  * otherwise                             -> bad

Context pass (simplified from jusText's edge-propagation): good/bad
stand; short/near_good become good iff the nearest context-free
good-or-bad block on EITHER side is good, else bad. One window per
direction with IGNORE NULLS — identical semantics in Spark and DuckDB.

Scale shape (100 TB of HTML): block split + densities are per-row; the
context window partitions by doc (bounded rows per doc — pages have
hundreds of blocks, not millions) and carries (id, idx, small ints),
never the HTML. ``extract_main_text`` reassembles per doc with
sort_array over collected (idx, text) structs — one hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawlspark.operators.textops import STOPWORDS

MICRO = 1_000_000

# jusText published defaults
MAX_LINK_DENSITY_MICRO = MICRO // 5          # 0.2
LENGTH_LOW = 70                              # chars
LENGTH_HIGH = 200                            # chars
STOPWORDS_LOW_MICRO = MICRO * 30 // 100      # 0.30
STOPWORDS_HIGH_MICRO = MICRO * 32 // 100     # 0.32

# Block-level elements that delimit jusText segments.
BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|article|section|"
    r"header|footer|nav|blockquote|pre)(?:\s[^>]*)?>"
)
ANCHOR_RE = r"(?is)<a\s[^>]*>(.*?)</a>"
TAG_RE = r"<[^>]*>"


def split_blocks(df: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """``(id, block_idx, raw)``: the HTML split on block-level tags,
    positions preserved from the split (stable across engines); empty
    segments survive here and are dropped by the classifier once
    stripped. Inline tags (``<a>``, ``<b>``…) stay inside their block."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(F.split(F.col(html_col), BLOCK_TAG_RE)).alias(
            "block_idx", "raw"
        ),
    )


def _block_features(df: DataFrame) -> DataFrame:
    """Adds block_text / n_chars / n_words / __link_chars /
    __stop_hits to a ``(…, raw)`` relation. The tag strip and the
    whitespace split are STAGED into their own projections (each is
    referenced by several feature columns, so an inlined expression
    re-runs the regexp per consuming column — the repo's
    CollapseProject staging rule); each HOF lambda closes only over
    its own element."""
    raw = F.col("raw")
    link_chars = F.aggregate(
        F.regexp_extract_all(raw, F.lit(ANCHOR_RE), 1),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )
    staged_text = df.select(
        "*",
        F.trim(F.regexp_replace(raw, TAG_RE, "")).alias("block_text"),
        link_chars.alias("__link_chars"),
    )
    staged_words = staged_text.select(
        "*",
        F.filter(F.split(F.col("block_text"), r"\s+"), lambda w: w != "").alias("__words"),
    )
    return staged_words.select(
        "*",
        F.length("block_text").alias("n_chars"),
        F.size("__words").alias("n_words"),
        F.size(
            F.filter(F.col("__words"), lambda w: F.lower(w).isin(*STOPWORDS))
        ).alias("__stop_hits"),
    ).drop("__words")


def classify_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density_micro: int = MAX_LINK_DENSITY_MICRO,
    length_low: int = LENGTH_LOW,
    length_high: int = LENGTH_HIGH,
    stopwords_low_micro: int = STOPWORDS_LOW_MICRO,
    stopwords_high_micro: int = STOPWORDS_HIGH_MICRO,
) -> DataFrame:
    """Per-block jusText classification: ``(id, block_idx, block_text,
    n_chars, n_words, link_density_micro, stop_density_micro, label_cf,
    label)`` with ``label`` the context-corrected one. Blocks that strip
    to empty text are dropped (tag-only segments between block tags)."""
    feats = _block_features(
        split_blocks(df, html_col, id_col).select("id", "block_idx", "raw")
    ).where(F.col("n_chars") > 0)
    link_density = F.floor(F.col("__link_chars") * MICRO / F.col("n_chars")).cast("long")
    stop_density = F.when(
        F.col("n_words") > 0,
        F.floor(F.col("__stop_hits") * MICRO / F.col("n_words")),
    ).otherwise(0).cast("long")
    d = feats.select(
        "id", "block_idx", "block_text", "n_chars", "n_words", "raw",
        link_density.alias("link_density_micro"),
        stop_density.alias("stop_density_micro"),
    )
    cf = (
        F.when(F.col("raw").contains("©") | F.col("raw").contains("&copy;"), "bad")
        .when(F.col("link_density_micro") > max_link_density_micro, "bad")
        .when(
            F.col("n_chars") < length_low,
            F.when(F.col("link_density_micro") > 0, "bad").otherwise("short"),
        )
        .when(
            F.col("stop_density_micro") >= stopwords_high_micro,
            F.when(F.col("n_chars") > length_high, "good").otherwise("near_good"),
        )
        .when(F.col("stop_density_micro") >= stopwords_low_micro, "near_good")
        .otherwise("bad")
    )
    labeled = d.withColumn("label_cf", cf).drop("raw")
    conf = F.when(F.col("label_cf").isin("good", "bad"), F.col("label_cf"))
    w = Window.partitionBy("id").orderBy("block_idx")
    prev_ctx = F.last(conf, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_ctx = F.first(conf, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    label = (
        F.when(F.col("label_cf").isin("good", "bad"), F.col("label_cf"))
        .when((prev_ctx == "good") | (next_ctx == "good"), "good")
        .otherwise("bad")
    )
    return labeled.withColumn("label", label).withColumnRenamed("id", id_col)


def extract_main_text(
    classified: DataFrame, id_col: str = "doc_id", sep: str = " "
) -> DataFrame:
    """``(id, main_text, n_good_blocks)``: the final-good blocks of each
    doc rejoined in block order. Docs whose every block is boilerplate
    yield an empty string (the row survives — dropping is the caller's
    policy). One hash aggregate; order restored driver-free via
    sort_array over (idx, text) structs."""
    good = classified.where(F.col("label") == "good")
    agg = good.groupBy(F.col(id_col).alias("id")).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("block_idx", "block_text"))
                ),
                lambda s: s["block_text"],
            ),
            sep,
        ).alias("main_text"),
        F.count("*").alias("n_good_blocks"),
    )
    ids = classified.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(agg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("main_text", F.lit("")).alias("main_text"),
            F.coalesce("n_good_blocks", F.lit(0)).cast("long").alias("n_good_blocks"),
        )
    )


def classify_blocks_sql(
    table_expr: str,
    html_expr: str = "html",
    id_expr: str = "doc_id",
    max_link_density_micro: int = MAX_LINK_DENSITY_MICRO,
    length_low: int = LENGTH_LOW,
    length_high: int = LENGTH_HIGH,
    stopwords_low_micro: int = STOPWORDS_LOW_MICRO,
    stopwords_high_micro: int = STOPWORDS_HIGH_MICRO,
) -> str:
    """DuckDB twin of :func:`classify_blocks` — same block regexp, same
    tag strip, same micro floors, same two passes (IGNORE NULLS windows).
    Independent derivation: LATERAL generate_series indexing instead of
    posexplode, list_* instead of HOFs."""
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
      WITH src AS (SELECT {id_expr} AS id, {html_expr} AS html FROM {table_expr}),
      segs AS (
        SELECT id, CAST(u.i - 1 AS INT) AS block_idx, arr[u.i] AS raw
        FROM (SELECT id, regexp_split_to_array(html,
                 '(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|article|section|header|footer|nav|blockquote|pre)(?:\\s[^>]*)?>') AS arr
              FROM src) t,
             LATERAL unnest(generate_series(1, len(arr))) AS u(i)),
      feat AS (
        SELECT id, block_idx, raw,
               trim(regexp_replace(raw, '<[^>]*>', '', 'g')) AS block_text
        FROM segs),
      feat2 AS (
        SELECT id, block_idx, raw, block_text,
               length(block_text) AS n_chars,
               len(list_filter(string_split_regex(block_text, '\\s+'), w -> w <> '')) AS n_words,
               coalesce(list_sum(list_transform(
                   regexp_extract_all(raw, '(?is)<a\\s[^>]*>(.*?)</a>', 1),
                   x -> length(x))), 0) AS link_chars,
               len(list_filter(string_split_regex(block_text, '\\s+'),
                   w -> list_contains([{stoplist}], lower(w)))) AS stop_hits
        FROM feat
        WHERE length(block_text) > 0),
      dens AS (
        SELECT id, block_idx, block_text, raw,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(floor(link_chars * {MICRO}.0 / n_chars) AS BIGINT) AS link_density_micro,
               CAST(CASE WHEN n_words > 0
                         THEN floor(stop_hits * {MICRO}.0 / n_words)
                         ELSE 0 END AS BIGINT) AS stop_density_micro
        FROM feat2),
      cf AS (
        SELECT id, block_idx, block_text, n_chars, n_words,
               link_density_micro, stop_density_micro,
               CASE
                 WHEN raw LIKE '%' || chr(169) || '%' OR raw LIKE '%&copy;%' THEN 'bad'
                 WHEN link_density_micro > {max_link_density_micro} THEN 'bad'
                 WHEN n_chars < {length_low} THEN
                   CASE WHEN link_density_micro > 0 THEN 'bad' ELSE 'short' END
                 WHEN stop_density_micro >= {stopwords_high_micro} THEN
                   CASE WHEN n_chars > {length_high} THEN 'good' ELSE 'near_good' END
                 WHEN stop_density_micro >= {stopwords_low_micro} THEN 'near_good'
                 ELSE 'bad'
               END AS label_cf
        FROM dens),
      ctx AS (
        SELECT *,
               last_value(CASE WHEN label_cf IN ('good','bad') THEN label_cf END IGNORE NULLS)
                 OVER (PARTITION BY id ORDER BY block_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_ctx,
               first_value(CASE WHEN label_cf IN ('good','bad') THEN label_cf END IGNORE NULLS)
                 OVER (PARTITION BY id ORDER BY block_idx
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_ctx
        FROM cf)
      SELECT id AS {id_expr}, CAST(block_idx AS INT) AS block_idx, block_text,
             n_chars, n_words, link_density_micro, stop_density_micro, label_cf,
             CASE WHEN label_cf IN ('good','bad') THEN label_cf
                  WHEN prev_ctx = 'good' OR next_ctx = 'good' THEN 'good'
                  ELSE 'bad' END AS label
      FROM ctx
    """
