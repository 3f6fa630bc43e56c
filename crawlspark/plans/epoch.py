"""The epoch driver loops: web-frontier crawl and catalog-parity crawl.

Both are *batch-incremental*: each epoch is one DataFrame batch job whose
outputs commit atomically (SURVEY.md §1.3 — the reference processes
"everything newer than the cursor" then exits, Downloader.cs:37-80).

``web_crawl``   — the north_star engine: seeds → bloom seen-filter →
                  robots → salted per-host top-K dequeue → fetch (join
                  against the pages snapshot) → vectorized text extract →
                  link discovery → next-epoch frontier. Visit order is a
                  property of the data: (epoch, priority, discovery_ts,
                  url).

``catalog_crawl`` — reference-parity incremental catalog walk with
                  MaxPages / MaxCommits budget semantics pinned by the
                  reference's integration tests
                  (DownloadCommandHandlerIntegrationTests.cs:83-158).

Scale notes (100 TB / 10^10-frontier):
  * the frontier table holds only the *pending* set — each epoch reads
    the previous epoch's frontier partition, never the full history;
  * the seen-set check is bloom-prefiltered so only the maybe-seen
    residue shuffles against ``fetched``;
  * the per-host window is the salted two-phase top-K (politeness.py) —
    no hot-host task;
  * the fetch is an equi-join on ``url`` — AQE picks broadcast when the
    dequeued side is small and splits skewed partitions otherwise;
  * everything driver-side is O(#epochs), never O(#urls).
"""

from __future__ import annotations

import datetime as dt
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawlspark.functions.extract import extract_page_udf, extract_text_udf
from crawlspark.functions.urls import host_of, is_valid_http_url
from crawlspark.operators.bloom import build_seen_shards, seen_filter
from crawlspark.operators.ordering import (
    EPOCH_MIN,
    commit_budget_cutoff,
    cursor_filter,
    ordered_limit,
)
from crawlspark.operators.politeness import (
    ORDER_COLS,
    apply_robots,
    topk_per_host,
    topk_per_host_split,
)
from crawlspark.plans.state import CrawlState

DISCOVERY_BASE = dt.datetime(2024, 1, 1)


def _discovery_ts(epoch: int) -> dt.datetime:
    """Deterministic discovery timestamp per epoch (no wall-clock)."""
    return DISCOVERY_BASE + dt.timedelta(minutes=epoch)


def _lineage_from_files(epoch_dir: str) -> list[tuple]:
    """Per-partition lineage from the written epoch's parquet files:
    (partition_id, cursor_ts, urls_fetched, urls_missing, bytes) per
    file. Driver-side pyarrow over three narrow columns — the written
    files are the authoritative record, so lineage can never disagree
    with the data."""
    import glob as _glob

    import pyarrow.parquet as pq

    rows: list[tuple] = []
    for pid, path in enumerate(sorted(_glob.glob(os.path.join(epoch_dir, "*.parquet")))):
        t = pq.read_table(path, columns=["warc_ts", "status", "content_bytes"])
        status = t.column("status").to_pylist()
        ok = sum(1 for s in status if s == "ok")
        warc = [v for v in t.column("warc_ts").to_pylist() if v is not None]
        rows.append((
            pid,
            max(warc) if warc else None,
            ok,
            len(status) - ok,
            int(sum(v or 0 for v in t.column("content_bytes").to_pylist())),
        ))
    return rows


@dataclass
class CrawlConfig:
    """Engine knobs + the reference's config guardrails (O15,
    Downloader.cs:55-63)."""

    default_budget: int = 4          # per-host tokens per epoch
    salt: int = 8                    # pseudo-hosts per host in phase-1 top-K
    max_epochs: int = 100
    global_budget_per_epoch: int | None = None
    max_total_urls: int | None = None
    use_bloom: bool = True
    bloom_fpp: float = 0.01
    bloom_shards: int = 32
    analyze: bool = False            # inline text analysis on fetch (tokens/simhash/quality)
    broadcast_threshold: int = 100_000  # dequeues larger than this use a shuffle-hash join
    local_checkpoint: bool = False   # truncate plan lineage at dequeue/fetch: the
    # epoch plan tree is deep, and every downstream action pays Catalyst
    # analysis of the whole tree; checkpointing caps driver-side planning
    # cost per epoch (use reliable checkpoints on a real cluster)

    def validate(self) -> None:
        if self.default_budget < 1:
            raise ValueError("default_budget must be >= 1")
        if self.salt < 1:
            raise ValueError("salt must be >= 1")
        if self.global_budget_per_epoch is not None and self.global_budget_per_epoch < 1:
            raise ValueError("global_budget_per_epoch must be >= 1")


def _normalize_seeds(seeds: DataFrame) -> DataFrame:
    cols = seeds.columns
    out = seeds.select(
        F.col("url"),
        (F.col("priority") if "priority" in cols else F.lit(0)).cast("int").alias("priority"),
        F.lit(_discovery_ts(0)).alias("discovery_ts"),
    )
    return out.where(is_valid_http_url(F.col("url")))


def web_crawl(
    spark: SparkSession,
    pages: DataFrame,
    state_dir: str,
    seeds: DataFrame,
    *,
    robots: DataFrame | None = None,
    host_budgets: DataFrame | None = None,
    config: CrawlConfig | None = None,
) -> list[dict]:
    """Run the frontier crawl to exhaustion (or budget), resuming from
    the last committed epoch. Returns per-epoch stats dicts."""
    cfg = config or CrawlConfig()
    cfg.validate()
    state = CrawlState(state_dir)
    start = state.next_epoch()
    stats_out: list[dict] = []
    total_fetched = sum(s.get("urls_fetched", 0) for s in state.epoch_stats())

    trace = os.environ.get("CRAWLSPARK_TRACE") == "1"
    tmark = [time.time()]

    def _t(label: str) -> None:
        if trace:
            now = time.time()
            print(f"    [epoch trace] {label}: {now - tmark[0]:.2f}s", flush=True)
            tmark[0] = now

    for epoch in range(start, cfg.max_epochs):
        if cfg.max_total_urls is not None and total_fetched >= cfg.max_total_urls:
            break
        tmark[0] = time.time()

        # 1. pending frontier: previous epoch's remainder, or the seeds.
        if epoch == 0:
            pending = _normalize_seeds(seeds)
        else:
            pending = state.frontier.read(spark, epochs=[epoch - 1]).drop("epoch") \
                .select("url", "priority", "discovery_ts")
        # width-normalize: a small frontier file read yields fewer input
        # splits than cores, starving every pre-shuffle step (bloom UDF,
        # robots). One cheap narrow-row shuffle fixes it; skipped when the
        # source is already wide (the at-scale case).
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if pending.rdd.getNumPartitions() < max(2, n_shuffle // 2):
            pending = pending.repartition(n_shuffle, "url")
        seen = state.seen_urls(spark)
        seen_count = sum(
            s.get("urls_fetched", 0) + s.get("urls_missing", 0) for s in state.epoch_stats()
        )

        # 2. seen-set: bloom shards rebuilt once per epoch from `fetched`,
        #    broadcast; exact anti-join backstop on the maybe-seen residue.
        #    The same shards also pre-filter this epoch's discoveries.
        shards_bc = (
            build_seen_shards(
                spark, seen, seen_count=seen_count,
                n_shards=cfg.bloom_shards, fpp=cfg.bloom_fpp,
            )
            if cfg.use_bloom
            else None
        )
        _t("bloom build")
        candidates = seen_filter(
            spark, pending, seen,
            use_bloom=cfg.use_bloom, shards_bc=shards_bc, seen_count=seen_count,
        ).withColumn("host", host_of(F.col("url")))

        # 3. robots + politeness dequeue (salted two-phase per-host top-K).
        #    The split variant yields the selected set AND the remainder
        #    from one cached phase-1 pass — no remainder anti-join.
        allowed = apply_robots(candidates, robots)
        if cfg.global_budget_per_epoch is None:
            dequeued, remaining, phase1 = topk_per_host_split(
                allowed, host_budgets, cfg.default_budget, salt=cfg.salt
            )
        else:
            phase1 = allowed.cache()
            dequeued = topk_per_host(phase1, host_budgets, cfg.default_budget, salt=cfg.salt)
            dequeued = ordered_limit(dequeued, cfg.global_budget_per_epoch, list(ORDER_COLS))
            remaining = None  # derived below from the final dequeued set
        if cfg.local_checkpoint:
            dequeued = dequeued.localCheckpoint(eager=True)
            n_dequeued = dequeued.count()
        else:
            dequeued = dequeued.cache()
            n_dequeued = dequeued.count()
        if remaining is None:
            remaining = phase1.join(dequeued.select("url"), "url", "left_anti")
        _t("dequeue count")
        if n_dequeued == 0:
            dequeued.unpersist()
            phase1.unpersist()
            break

        # 4. "fetch": equi-join against the pages snapshot. Small dequeues
        #    broadcast (one pages scan, no shuffle of the 100 TB table,
        #    misses via a cheap anti-join); large dequeues use ONE
        #    right-outer shuffle-hash join that yields hits and misses
        #    together — building a multi-hundred-MB broadcast relation is
        #    single-threaded driver work and anti-scales. At production
        #    scale the pages table is bucketed by url hash so this join
        #    co-locates without shuffling pages.
        small = n_dequeued <= cfg.broadcast_threshold
        if small:
            joined = pages.join(F.broadcast(dequeued), "url", "inner")
        else:
            joined = pages.join(dequeued.hint("SHUFFLE_HASH"), "url", "right")
        base = joined.select(
            "url", "host", "priority", "discovery_ts", "warc_ts",
            extract_page_udf(F.col("html")).alias("page"),
            "lang",
            F.when(F.col("html").isNull(), "missing").otherwise("ok").alias("status"),
            F.coalesce(F.length("html").cast("long"), F.lit(0)).alias("content_bytes"),
        ).select(
            "url", "host", "priority", "discovery_ts", "warc_ts",
            F.col("page.text").alias("text"), F.col("page.links").alias("links"),
            "lang", "status", "content_bytes",
        )
        # analysis in a second projection so the extraction UDF column is
        # referenced (and evaluated) exactly once
        if cfg.analyze:
            from crawlspark.operators.textops import quality_micro, simhash16, token_count

            base = base.withColumns({
                "n_tokens": token_count(F.col("text")),
                "simhash": simhash16(F.col("text")),
                "quality_micro": quality_micro(F.col("text")),
            })
        else:
            base = base.withColumns({
                "n_tokens": F.lit(None).cast("long"),
                "simhash": F.lit(None).cast("int"),
                "quality_micro": F.lit(None).cast("long"),
            })
        hits = base.select(
            "url", "host", "priority", "discovery_ts", "warc_ts", "text", "lang",
            "status", "content_bytes", "n_tokens", "simhash", "quality_micro", "links",
        )
        # single pages scan + single html decode; html never cached
        hits = hits.localCheckpoint(eager=False) if cfg.local_checkpoint else hits.cache()
        if small:
            misses = dequeued.join(hits.select("url"), "url", "left_anti").select(
                "url", "host", "priority", "discovery_ts",
                F.lit(None).cast("timestamp").alias("warc_ts"),
                F.lit(None).cast("string").alias("text"),
                F.lit(None).cast("string").alias("lang"),
                F.lit("missing").alias("status"),
                F.lit(0).cast("long").alias("content_bytes"),
                F.lit(None).cast("long").alias("n_tokens"),
                F.lit(None).cast("int").alias("simhash"),
                F.lit(None).cast("long").alias("quality_micro"),
                F.lit(None).cast("array<string>").alias("links"),
            )
            fetched_rows = hits.unionByName(misses)
        else:
            fetched_rows = hits  # right-outer join already carries misses

        # 5. discover outlinks → next frontier (priority decays by depth).
        #    next = dedupe(remaining ∪ links) ∖ dequeued, where dedupe
        #    keeps the min (discovery_ts, priority) entry — an existing
        #    pending row always beats a fresh re-discovery (its
        #    discovery_ts is older), matching the sequential-reference
        #    semantics. Links to urls seen in EARLIER epochs may linger
        #    in the frontier for one epoch; the seen-filter at the next
        #    dequeue removes them, so the visited set is unaffected and
        #    this epoch saves a whole seen-join. One shuffle (the
        #    groupBy), one broadcast anti-join.
        links = (
            hits.select(
                F.explode("links").alias("url"),
                (F.col("priority") + 1).alias("priority"),
            )
            .where(is_valid_http_url(F.col("url")))
            .withColumn("discovery_ts", F.lit(_discovery_ts(epoch + 1)))
        )
        next_frontier = (
            remaining.select("url", "priority", "discovery_ts")
            .unionByName(links)
            .groupBy("url")
            .agg(F.min(F.struct("discovery_ts", "priority")).alias("s"))
            .select(
                "url",
                F.col("s.priority").alias("priority"),
                F.col("s.discovery_ts").alias("discovery_ts"),
            )
            .join(dequeued.select("url"), "url", "left_anti")
            .withColumn("host", host_of(F.col("url")))
            .select("url", "host", "priority", "discovery_ts")
        )

        # 6. per-partition lineage + fetch metrics (north_star checkpoint).
        #    Derived from the just-written parquet files driver-side
        #    (pyarrow over 3 narrow columns, one file ≙ one partition) —
        #    no extra Spark action; the write itself is the only pass.
        fetched_out = fetched_rows.drop("links")

        # 7. stage all three tables, then ONE atomic commit. Lineage rows
        #    are tiny and derived/written on the driver — no job.
        state.fetched.write_epoch(fetched_out, epoch)
        _t("write fetched")
        state.frontier.write_epoch(next_frontier, epoch)
        _t("write frontier")
        lineage_rows = _lineage_from_files(state.fetched._epoch_dir(epoch))
        lineage_tuples = [("download", *r) for r in lineage_rows]
        state.lineage.write_epoch_rows(lineage_tuples, epoch)
        _t("write lineage")

        max_warc = max((r[1] for r in lineage_rows if r[1]), default=EPOCH_MIN)
        cursor = max(state.cursor("download"), max_warc)
        epoch_stats = {
            "epoch": epoch,
            "urls_dequeued": n_dequeued,
            "urls_fetched": int(sum(r[2] for r in lineage_rows)),
            "urls_missing": int(sum(r[3] for r in lineage_rows)),
            "bytes": int(sum(r[4] for r in lineage_rows)),
        }
        state.commit_epoch(epoch, cursors={"download": cursor}, stats=epoch_stats)
        stats_out.append(epoch_stats)
        total_fetched += epoch_stats["urls_fetched"] + epoch_stats["urls_missing"]

        dequeued.unpersist()
        hits.unpersist()
        phase1.unpersist()
    return stats_out


def visited_trace(spark: SparkSession, state_dir: str) -> DataFrame:
    """The reproducible visit order — the golden-trace artifact. Order is
    recovered from data, never from execution timing (SURVEY.md §4)."""
    state = CrawlState(state_dir)
    return state.fetched.read(spark).orderBy("epoch", "priority", "discovery_ts", "url")


# ---------------------------------------------------------------------------
# Reference-parity catalog crawl (depths + MaxPages/MaxCommits budgets)
# ---------------------------------------------------------------------------

DEPTHS = ("index", "page", "leaf")


def catalog_crawl(
    spark: SparkSession,
    pages: DataFrame,
    index: DataFrame,
    state_dir: str,
    *,
    depth: str = "leaf",
    max_pages: int | None = None,
    max_commits: int | None = None,
    consumer: str = "download",
) -> dict:
    """One incremental run over the catalog: the set-based equivalent of
    the reference's sequential page loop (Downloader.cs:91-195).

    * pages newer than the cursor, ordered by (page_ts, page_no), first
      ``max_pages`` (O5+O6+O7);
    * leaves bounded by *their page's advertised* page_ts — leaves newer
      than the index claims defer to the next run (Downloader.cs:126);
    * ``max_commits`` keeps only the first N whole commits of the global
      commit order — never splits a commit (O8+O9, dense_rank cutoff);
    * cursor advances to the max fully-included commit (min-watermark
      collapses to this under atomic epoch commits, O12/O13).

    Assumes commits do not span catalog pages and page order equals
    commit order — true of the NuGet catalog and of our corpus.
    """
    if depth not in DEPTHS:
        raise ValueError(f"depth must be one of {DEPTHS}")
    if max_commits is not None and DEPTHS.index(depth) < DEPTHS.index("page"):
        raise ValueError("max_commits requires depth >= page (Downloader.cs:55-63)")
    state = CrawlState(state_dir)
    run = state.next_epoch()
    cursor = state.cursor(consumer)

    sel_pages = cursor_filter(index, cursor, ts_col="page_ts")
    sel_pages = ordered_limit(sel_pages, max_pages, ["page_ts", "page_no"]).cache()
    n_pages = sel_pages.count()
    if n_pages == 0:
        sel_pages.unpersist()
        return {"run": run, "pages": 0, "leaves": 0, "cursor": cursor}

    if depth == "index":
        new_cursor = sel_pages.agg(F.max("page_ts")).first()[0]
        state.commit_epoch(run, cursors={consumer: new_cursor}, stats={"pages": n_pages})
        sel_pages.unpersist()
        return {"run": run, "pages": n_pages, "leaves": 0, "cursor": new_cursor}

    # Leaf→page membership from the index's advertised timestamp ranges:
    # a leaf belongs to page p iff warc_ts ∈ (prev page_ts, page_ts].
    # Leaves newer than every advertised page_ts match no page and defer
    # to the next run — the reference's `max = pageItem.CommitTimestamp`
    # rule (Downloader.cs:126). The bounds relation is one row per page
    # (tiny vs leaves) → broadcast range join; at 10^10 scale this
    # becomes an equi-join on a precomputed page-bucket key instead.
    w_idx = Window.orderBy("page_ts", "page_no")
    bounds = index.withColumn(
        "prev_ts", F.coalesce(F.lag("page_ts").over(w_idx), F.lit(EPOCH_MIN))
    )
    leaves = (
        pages.alias("l")
        .join(
            F.broadcast(bounds).alias("b"),
            (F.col("l.warc_ts") > F.col("b.prev_ts")) & (F.col("l.warc_ts") <= F.col("b.page_ts")),
        )
        .where(F.col("l.warc_ts") > F.lit(cursor) if cursor > EPOCH_MIN else F.lit(True))
        .select("l.*", "b.page_no", "b.page_ts")
        .join(F.broadcast(sel_pages.select("page_no")), "page_no", "left_semi")
    )

    if depth == "page":
        new_cursor = sel_pages.agg(F.max("page_ts")).first()[0]
        state.commit_epoch(run, cursors={consumer: new_cursor}, stats={"pages": n_pages})
        sel_pages.unpersist()
        return {"run": run, "pages": n_pages, "leaves": 0, "cursor": new_cursor}

    if max_commits is not None:
        leaves = commit_budget_cutoff(leaves, max_commits, ts_col="warc_ts")
    leaves = leaves.cache()

    fetched_rows = leaves.select(
        "url",
        host_of(F.col("url")).alias("host"),
        F.lit(0).alias("priority"),
        F.lit(_discovery_ts(run)).alias("discovery_ts"),
        "warc_ts",
        extract_text_udf(F.col("html")).alias("text"),
        "lang",
        F.lit("ok").alias("status"),
        F.length("html").cast("long").alias("content_bytes"),
        F.lit(None).cast("long").alias("n_tokens"),
        F.lit(None).cast("int").alias("simhash"),
        F.lit(None).cast("long").alias("quality_micro"),
    )
    state.fetched.write_epoch(fetched_rows, run)

    agg = leaves.agg(F.max("warc_ts").alias("mx"), F.count("*").alias("n")).first()
    new_cursor = max(cursor, agg["mx"] or EPOCH_MIN)
    n_leaves = int(agg["n"])
    state.commit_epoch(
        run, cursors={consumer: new_cursor},
        stats={"pages": n_pages, "urls_fetched": n_leaves},
    )
    sel_pages.unpersist()
    leaves.unpersist()
    return {"run": run, "pages": n_pages, "leaves": n_leaves, "cursor": new_cursor}
