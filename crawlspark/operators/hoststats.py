"""Host-level (domain-level) curation rollup for webtext pipelines.

Doc-level filters (C4/Gopher rules, LM perplexity, classifiers) miss
pathologies that only show up in aggregate: template farms where every
page is a near-copy, hosts that are 95% one boilerplate page, domains
whose entire output is too short to train on. Production pipelines
therefore also curate at the HOST level — RefinedWeb (Penedo et al.
2023 §3.1) blocks whole domains, and CCNet/Gopher-style corpora report
per-domain duplicate shares before admitting a site. This module is
that rollup: one relation with per-host document counts, corpus-wide
duplicate shares, token mass, and the dominant language, plus the
admit/deny decision as a column.

Reference tie-in: the reference engine's per-catalog page-count report
(joelverhagen/CatalogCrawler src/Logic/CsvAggregator.cs family) is the
same shape — group the crawled corpus by its container and emit one
decision row per container; here the container is the web host and the
metrics are the LLM-curation ones.

All arithmetic is exact: shares are micro-units (value x 1e6, floor —
the repo-wide convention), so the DuckDB twin matches bit-for-bit.

Scale shape (100 TB): two real shuffles, both narrow.

  1. duplicate marking — shuffle ``(key, host, lang, tokens)`` where
     ``key`` is md5 of the (optionally prefix-truncated) text: 32-byte
     keys + three small columns, never the text itself. A count window
     over ``key`` marks corpus-wide duplicates in the same exchange.
  2. (host, lang) partial rollup — hash aggregate with map-side
     combine; the exchange carries one row per (host, lang) per map
     partition, O(#hosts x #langs), not O(#docs).

The final per-host rollup and the dominant-language pick are ONE
aggregate over the (host, lang) relation — tiny at any corpus size —
with the language pick folded in as min(struct(-n, lang)) (max count,
ties to the smallest language) so Catalyst never re-scans the corpus
for a second window branch. A hot host (1e8 docs) is irrelevant to
both exchanges: dup-marking distributes by content hash, and the
rollup collapses the host to #langs rows map-side before it ever
crosses the network.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlspark.operators.textops import token_count

MICRO = 1_000_000


def host_curation_stats(
    df: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    key_prefix_len: int | None = None,
    min_docs: int = 1,
    max_dup_share_micro: int = MICRO,
) -> DataFrame:
    """Per-host curation rollup: ``(host, n_docs, n_dup_docs,
    dup_share_micro, total_tokens, mean_tokens_micro, top_lang,
    top_lang_share_micro, keep)``.

    A doc counts as duplicate when its content key (md5 of the text,
    prefix-truncated to ``key_prefix_len`` chars when given — the knob
    that turns exact dedup into prefix/boilerplate dedup) occurs >= 2
    times CORPUS-WIDE, not per host: a template farm whose copies are
    spread across mirrors still counts against every host serving it.

    ``top_lang`` is the host's most frequent language, ties broken to
    the lexicographically smallest so the pick is deterministic.

    ``keep`` = ``n_docs >= min_docs AND dup_share_micro <=
    max_dup_share_micro`` — the RefinedWeb-style domain admission gate.
    """
    text = F.col(text_col)
    if key_prefix_len is not None:
        text = F.substring(text, 1, key_prefix_len)
    docs = df.select(
        F.col(host_col).alias("host"),
        F.col(lang_col).alias("lang"),
        token_count(text_col).alias("tokens"),
        F.md5(text).alias("key"),
    )
    # corpus-wide dup mark: count window over the content key — one
    # shuffle by key, reused for the count (no self-join).
    marked = docs.withColumn(
        "is_dup", F.count("*").over(Window.partitionBy("key")) >= 2
    )
    hl = marked.groupBy("host", "lang").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup"),
        F.sum("tokens").alias("tok"),
    )
    # dominant language via min(struct(-n, lang)): max count, ties to the
    # lexicographically smallest language — ONE aggregate, so the rollup
    # and the language pick come from a single pass over hl (a row_number
    # window here forced Catalyst to scan + re-aggregate the corpus twice,
    # once per consumer branch; at 100 TB that is a whole extra pass)
    roll = hl.groupBy("host").agg(
        F.sum("n").alias("n_docs"),
        F.sum("n_dup").alias("n_dup_docs"),
        F.sum("tok").alias("total_tokens"),
        F.min(
            F.struct(
                (-F.col("n")).cast("long").alias("nn"),
                F.col("lang").alias("lg"),
            )
        ).alias("__tp"),
    )
    out = roll.withColumn("top_lang", F.col("__tp.lg")).withColumn(
        "top_n", -F.col("__tp.nn")
    )
    return out.select(
        "host",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_dup_docs").cast("long").alias("n_dup_docs"),
        F.floor(F.col("n_dup_docs") * MICRO / F.col("n_docs")).cast("long").alias("dup_share_micro"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.floor(F.col("total_tokens") * MICRO / F.col("n_docs")).cast("long").alias("mean_tokens_micro"),
        "top_lang",
        F.floor(F.col("top_n") * MICRO / F.col("n_docs")).cast("long").alias("top_lang_share_micro"),
        (
            (F.col("n_docs") >= min_docs)
            & (F.floor(F.col("n_dup_docs") * MICRO / F.col("n_docs")) <= max_dup_share_micro)
        ).alias("keep"),
    )


def host_curation_stats_sql(
    table: str = "documents",
    host_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    key_prefix_len: int | None = None,
    min_docs: int = 1,
    max_dup_share_micro: int = MICRO,
) -> str:
    """DuckDB twin of :func:`host_curation_stats` — same key, same
    count-window dup mark, same micro-unit floors, same tie-break."""
    text = text_col if key_prefix_len is None else f"substr({text_col}, 1, {key_prefix_len})"
    return f"""
      WITH docs AS (
        SELECT {host_col} AS host, {lang_col} AS lang,
               CAST(length({text_col}) - length(replace({text_col}, ' ', '')) + 1 AS BIGINT) AS tokens,
               md5({text}) AS key
        FROM {table}),
      marked AS (
        SELECT host, lang, tokens,
               count(*) OVER (PARTITION BY key) >= 2 AS is_dup
        FROM docs),
      hl AS (
        SELECT host, lang, count(*) AS n,
               sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup,
               sum(tokens) AS tok
        FROM marked GROUP BY host, lang),
      roll AS (
        SELECT host, sum(n) AS n_docs, sum(n_dup) AS n_dup_docs,
               sum(tok) AS total_tokens,
               min(struct_pack(nn := -n, lg := lang)) AS tp
        FROM hl GROUP BY host)
      SELECT host,
             CAST(n_docs AS BIGINT) AS n_docs,
             CAST(n_dup_docs AS BIGINT) AS n_dup_docs,
             CAST(floor(n_dup_docs * {MICRO}.0 / n_docs) AS BIGINT) AS dup_share_micro,
             CAST(total_tokens AS BIGINT) AS total_tokens,
             CAST(floor(total_tokens * {MICRO}.0 / n_docs) AS BIGINT) AS mean_tokens_micro,
             tp.lg AS top_lang,
             CAST(floor((-tp.nn) * {MICRO}.0 / n_docs) AS BIGINT) AS top_lang_share_micro,
             n_docs >= {min_docs}
               AND floor(n_dup_docs * {MICRO}.0 / n_docs) <= {max_dup_share_micro} AS keep
      FROM roll
    """
