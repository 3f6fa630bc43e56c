"""Deterministic synthetic Common-Crawl-style corpus generator.

Builds the ``pages(url, warc_ts, html, text, lang)`` table mandated by
BASELINE.json ``input_hint``, plus seed / host-budget / robots side
tables and a catalog ``index`` table of page pointers (the analog of the
reference's catalog index of ``{@id, commitTimeStamp}`` page items,
/root/reference/src/CatalogCrawler/Logic/Protocol/CatalogIndex.cs).

Everything is a pure function of the page id, computed with Spark
built-in expressions only (no Python UDFs, no wall-clock, no RNG state),
so the corpus is reproducible at any scale and any partitioning:

  * hosts are Zipf-skewed (u^3 over ~n_hosts) so a few hosts are hot —
    this deliberately exercises the politeness/window skew path;
  * ``html`` embeds the outlink graph as ``<a href=...>`` anchors and the
    exact ``text`` payload inside a single ``<p>...</p>`` — the
    extraction UDF must reproduce ``text`` byte-identically;
  * ``warc_ts`` groups rows into commits (fixed leaves per commit) and
    commits into catalog pages, mirroring the reference's
    commitTimeStamp semantics (BaseCatalogItem.cs:11).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "crawl", "frontier", "cursor", "epoch",
    "shard", "bloom",
]
LANGS = ["en", "de", "fr", "ja"]
BASE_TS = "2024-03-01 00:00:00"
COMMIT_SECONDS = 60  # one commit per minute


def _host_idx(id_col: Column, n_hosts: int) -> Column:
    """Zipf-ish host assignment: cube of a uniform hash → skewed to host 0."""
    u = F.pmod(F.xxhash64(F.concat(F.lit("h"), id_col.cast("string"))), F.lit(1_000_000)) / 1_000_000.0
    return F.floor(F.pow(u, F.lit(3.0)) * n_hosts).cast("int")


def url_for(id_col: Column, n_hosts: int) -> Column:
    """Deterministic URL for a page id; ids divisible by 13 live under
    a /private/ prefix that robots.txt disallows for some hosts."""
    host = F.concat(F.lit("host"), _host_idx(id_col, n_hosts).cast("string"), F.lit(".example"))
    path = F.when(
        id_col % 13 == 0,
        F.concat(F.lit("/private/p"), id_col.cast("string")),
    ).otherwise(F.concat(F.lit("/page/p"), id_col.cast("string")))
    return F.concat(F.lit("https://"), host, path)


def build_pages(
    spark: SparkSession,
    n_pages: int,
    *,
    n_hosts: int = 50,
    leaves_per_commit: int = 16,
    commits_per_page: int = 4,
    n_outlinks: int = 3,
    n_words_base: int = 20,
    n_words_spread: int = 41,
    id_offset: int = 0,
) -> DataFrame:
    """The pages table plus generation-internal columns.

    Returns columns ``(id, page_no, commit_ts, url, warc_ts, html, text,
    lang)``; callers select the input_hint subset for the final table.
    ``id_offset`` lets staged snapshots append later id ranges.
    """
    df = spark.range(id_offset, id_offset + n_pages).withColumnRenamed("id", "pid")
    pid = F.col("pid")

    commit_idx = (pid / leaves_per_commit).cast("long")
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_TS).cast("timestamp")) + commit_idx * COMMIT_SECONDS
    )

    n_words = (F.lit(n_words_base) + F.pmod(pid * 7919, F.lit(n_words_spread))).cast("int")
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda j: F.element_at(words_arr, (F.pmod(pid * 7 + j * 13, F.lit(len(WORDS)))).cast("int") + 1),
        ),
    )

    link_targets = F.transform(
        F.sequence(F.lit(0), F.lit(n_outlinks - 1)),
        lambda k: F.pmod(pid * 31 + k * 17 + 1, F.lit(id_offset + n_pages)),
    )
    links_html = F.aggregate(
        F.transform(link_targets, lambda t: F.concat(F.lit('<a href="'), url_for(t, n_hosts), F.lit('">l</a>'))),
        F.lit(""),
        lambda acc, x: F.concat(acc, x),
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>p"), pid.cast("string"), F.lit("</title></head><body>"),
            links_html,
            F.lit("<p>"), text, F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )

    return df.select(
        pid.alias("id"),
        (commit_idx / commits_per_page).cast("long").alias("page_no"),
        warc_ts.alias("commit_ts"),
        url_for(pid, n_hosts).alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        F.element_at(F.array(*[F.lit(lang) for lang in LANGS]), F.pmod(pid, F.lit(len(LANGS))).cast("int") + 1).alias("lang"),
    )


def pages_only(df: DataFrame) -> DataFrame:
    """Project the exact input_hint schema."""
    return df.select("url", "warc_ts", "html", "text", "lang")


def build_index(pages_full: DataFrame) -> DataFrame:
    """Catalog index: one pointer row per page with its advertised
    commit timestamp (max commit in the page) — the analog of
    CatalogIndex items (BaseCatalogList.cs:5-8)."""
    return pages_full.groupBy("page_no").agg(F.max("commit_ts").alias("page_ts"))


def build_seeds(pages_full: DataFrame, n_seeds: int = 16, stride: int = 7) -> DataFrame:
    """Seed list: every ``stride``-th page url (skipping /private/ ids),
    priority 0. Benchmarks use stride=2 for production-sized frontiers."""
    return (
        pages_full.where((F.col("id") % stride == 1) & (F.col("id") % 13 != 0))
        .orderBy("id")
        .limit(n_seeds)
        .select(F.col("url"), F.lit(0).alias("priority"))
    )


def build_host_budgets(pages_full: DataFrame, base_tokens: int = 4) -> DataFrame:
    """Per-host politeness budgets (tokens per epoch), deterministic per host."""
    hosts = pages_full.select(
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host")
    ).distinct()
    return hosts.select(
        "host",
        (F.lit(base_tokens) + F.pmod(F.xxhash64("host"), F.lit(5)) * 2).cast("int").alias("tokens_per_epoch"),
    )


def build_robots(pages_full: DataFrame) -> DataFrame:
    """robots.txt cache: every 5th host (by hash) disallows /private/."""
    hosts = pages_full.select(
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host")
    ).distinct()
    return hosts.select(
        "host",
        F.when(F.pmod(F.xxhash64("host"), F.lit(5)) == 0, F.array(F.lit("/private/")))
        .otherwise(F.array().cast("array<string>"))
        .alias("disallow_prefixes"),
    )


def write_corpus(
    spark: SparkSession,
    out_dir: str,
    n_pages: int = 2000,
    *,
    n_hosts: int = 50,
    leaves_per_commit: int = 16,
    commits_per_page: int = 4,
    n_seeds: int = 16,
    seed_stride: int = 7,
    n_outlinks: int = 3,
    n_words_base: int = 20,
    n_words_spread: int = 41,
) -> dict[str, str]:
    """Materialize pages + side tables as parquet under out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    full = build_pages(
        spark, n_pages, n_hosts=n_hosts,
        leaves_per_commit=leaves_per_commit, commits_per_page=commits_per_page,
        n_outlinks=n_outlinks, n_words_base=n_words_base, n_words_spread=n_words_spread,
    )
    paths = {}
    for name, df in {
        "pages": pages_only(full),
        "index": build_index(full),
        "seeds": build_seeds(full, n_seeds, seed_stride),
        "host_budgets": build_host_budgets(full),
        "robots": build_robots(full),
    }.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(p)
        paths[name] = p
    return paths


def write_staged_corpus(spark: SparkSession, out_dir: str, *, n_hosts: int = 20) -> dict[str, str]:
    """Staged catalog-evolution snapshots, mirroring the reference's
    Step1→Step4 fixtures (DownloadCommandHandlerIntegrationTests.cs:20-24):

      step1  — 1 page worth of commits
      step2a — new leaves appended to the *last existing page* while the
               index still advertises the OLD page_ts (tests the
               ``max = pageItem.CommitTimestamp`` bound, Downloader.cs:126)
      step2b — index catches up to the new leaves
      step3  — one more page of commits
      step4  — two more pages of commits

    Each step dir has pages.parquet + index.parquet.
    """
    lpc, cpp = 4, 2  # 4 leaves/commit, 2 commits/page → 8 rows per page
    steps: dict[str, str] = {}

    def snap(name: str, n: int, index_upto_id: int | None = None) -> None:
        full = build_pages(spark, n, n_hosts=n_hosts, leaves_per_commit=lpc, commits_per_page=cpp)
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        pages_only(full).write.mode("overwrite").parquet(os.path.join(d, "pages.parquet"))
        idx_src = full if index_upto_id is None else full.where(F.col("id") < index_upto_id)
        build_index(idx_src).write.mode("overwrite").parquet(os.path.join(d, "index.parquet"))
        build_seeds(full, n_seeds=4).write.mode("overwrite").parquet(os.path.join(d, "seeds.parquet"))
        steps[name] = d

    snap("step1", 8)
    snap("step2a", 12, index_upto_id=8)   # 4 new leaves exist, index doesn't advertise them
    snap("step2b", 12)
    snap("step3", 20)
    snap("step4", 36)
    return steps
