"""Crawl-throughput bench worker: run the full epoch loop at one
parallelism level and print one JSON line.

Invoked as a subprocess by bench.py (one clean JVM per level):

    python -m crawlspark.bench_crawl --cpus 8 --corpus /tmp/corpus \
        --state /tmp/state8 [--gen-pages 200000 --gen-hosts 200]

Throughput metric (BASELINE.md protocol): (URLs scheduled + URLs
fetched) / wall-clock seconds of the epoch loop, excluding corpus
generation and session startup.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--master", default=None,
                    help="override master, e.g. local-cluster[2,4,6144] for "
                         "true multi-executor scaling evidence")
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--gen-pages", type=int, default=0, help="generate corpus if missing")
    ap.add_argument("--gen-hosts", type=int, default=200)
    ap.add_argument("--gen-seeds", type=int, default=20000)
    ap.add_argument("--gen-words", type=int, default=80,
                    help="base words of body text per page; 0 generates the "
                         "ZERO-PAYLOAD control corpus (same url space, same "
                         "link graph, same plan — pages carry only the link "
                         "anchors) used to separate plan-scaling from "
                         "payload-bandwidth ceiling in BENCH/BASELINE.md")
    ap.add_argument("--budget", type=int, default=256)
    ap.add_argument("--max-epochs", type=int, default=6)
    ap.add_argument("--phase1-checkpoint", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="politeness phase-1: localCheckpoint(eager=False) "
                         "instead of cache (round-5 A/B: 0.783 vs 0.760 "
                         "criterion efficiency, never worse — adopted)")
    ap.add_argument("--analyze", action=argparse.BooleanOptionalAction, default=False,
                    help="inline text analysis during fetch")
    ap.add_argument("--shuffle-partitions", type=int, default=64,
                    help="FIXED across parallelism levels: the scaling "
                         "comparison must run the identical job (same plan, "
                         "same task counts), varying only executor slots")
    ap.add_argument("--bucket-pages", type=int, default=64,
                    help="read pages via a url-bucketed table (0 = plain "
                         "parquet). The production layout: the fetch join "
                         "co-locates on the bucket key and the huge pages "
                         "side is NEVER shuffled — at 100 TB that shuffle "
                         "is impossible, and in the sandbox it is the "
                         "single largest memory-bandwidth item")
    args = ap.parse_args()

    from crawlspark.plans.epoch import CrawlConfig, web_crawl
    from crawlspark.session import get_spark
    from crawlspark.testdata import write_corpus

    spark = get_spark(
        f"crawl-bench-{args.cpus}",
        master=args.master or f"local[{args.cpus}]",
        shuffle_partitions=args.shuffle_partitions,
        # sandbox corpora are ~1 GB; the 128 MB default split would give
        # the heavy fetch+extract scan fewer tasks than cores. On a real
        # cluster at 100 TB the default is correct. AQE partition
        # coalescing is off so intermediate tables keep full-width
        # parallelism for the NEXT epoch's reads (at real data volumes
        # coalescing never bites — partitions stay above its target).
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            # AQE off for the crawl loop: partition counts are FIXED by
            # protocol, joins/skew are hand-managed (SHUFFLE_HASH hints,
            # salted top-K), so adaptive re-planning buys nothing — and
            # it executes every exchange as its own per-stage job, adding
            # a driver re-optimization gap between stages. Measured on
            # the zero-payload control: one consolidated job per epoch
            # instead of ~12, and the serial driver share of an epoch
            # drops (42.1k vs 38.7k urls/s at local[8]).
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            # catalog for the bucketed pages table; derby home per state
            # dir so sequential subprocess runs never fight over locks
            "spark.sql.warehouse.dir": os.path.join(args.corpus, "warehouse"),
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={args.state}_derby",
            # tuning overrides for A/B experiments, e.g.
            # CRAWLSPARK_EXTRA_CONF="spark.io.compression.codec=zstd;k=v"
            **dict(
                kv.split("=", 1)
                for kv in os.environ.get("CRAWLSPARK_EXTRA_CONF", "").split(";")
                if "=" in kv
            ),
        },
    )

    if args.gen_pages and not os.path.exists(os.path.join(args.corpus, "pages.parquet")):
        write_corpus(
            spark, args.corpus, n_pages=args.gen_pages, n_hosts=args.gen_hosts,
            leaves_per_commit=64, commits_per_page=16, n_seeds=args.gen_seeds,
            seed_stride=2, n_outlinks=8,
            n_words_base=args.gen_words, n_words_spread=max(2 * args.gen_words, 1),
        )

    pages = spark.read.parquet(os.path.join(args.corpus, "pages.parquet"))
    if args.bucket_pages:
        bdir = os.path.join(args.corpus, "pages_bucketed")
        if not os.path.exists(bdir):
            (pages.write.mode("overwrite").bucketBy(args.bucket_pages, "url")
             .sortBy("url").option("path", bdir).saveAsTable("pages_bucketed_gen"))
        # fresh JVM per level: re-register the external bucketed table so
        # Catalyst sees the layout (Bucketed: true, no pages Exchange)
        spark.sql(
            f"""CREATE TABLE IF NOT EXISTS pages_b
                (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
                USING PARQUET CLUSTERED BY (url) SORTED BY (url)
                INTO {args.bucket_pages} BUCKETS LOCATION '{bdir}'"""
        )
        pages = spark.table("pages_b")
    seeds = spark.read.parquet(os.path.join(args.corpus, "seeds.parquet"))
    robots = spark.read.parquet(os.path.join(args.corpus, "robots.parquet"))
    budgets = spark.read.parquet(os.path.join(args.corpus, "host_budgets.parquet"))
    # scale the per-host budgets up to bench size (corpus defaults are tiny)
    from pyspark.sql import functions as F
    budgets = budgets.select("host", (F.col("tokens_per_epoch") * 0 + args.budget).alias("tokens_per_epoch"))

    # warm the OS page cache so both parallelism levels measure compute,
    # not first-touch disk reads. (Production note: the pages table would
    # be bucketed by url hash in the metastore so the per-epoch fetch
    # join co-locates without shuffling the 100 TB side.)
    pages.count()
    seeds.count()
    # warm the python worker pool + Arrow/pandas imports per slot so the
    # timed window measures steady-state throughput, not cold-start —
    # both parallelism levels get the identical warmup
    from crawlspark.functions.extract import extract_text_udf

    spark.range(args.cpus * 64).repartition(args.cpus).select(
        extract_text_udf(F.encode(F.lit("<p>warm</p>"), "UTF-8")).alias("t")
    ).count()
    # warm whole-stage-codegen (janino) + JIT with an epoch-shaped dry
    # run over a tiny in-memory corpus: the first timed epoch otherwise
    # pays ~3-5 s of one-time class compilation that epoch 1 doesn't
    # (event-log write-job planning gap 1.3 s -> 0.34 s), a serial cost
    # that distorts the scaling comparison at 2-epoch bench length.
    # Identical at every parallelism level; steady-state is the regime
    # that matters at production epoch counts.
    import shutil as _sh
    import tempfile as _tf

    from crawlspark.testdata import build_pages, pages_only

    _wpages = pages_only(build_pages(spark, 2000, n_hosts=20, n_outlinks=4))
    _wseeds = _wpages.select("url").limit(400).select(
        "url", F.lit(0).alias("priority")
    )
    _wdir = _tf.mkdtemp(prefix="warmcrawl")
    try:
        web_crawl(
            spark, _wpages, os.path.join(_wdir, "s"), _wseeds,
            # broadcast_threshold=0 forces the LARGE-dequeue fetch path
            # (shuffle-hash right join) so the warmup compiles the same
            # generated classes the timed epochs execute
            config=CrawlConfig(default_budget=1000, max_epochs=2,
                               local_checkpoint=True, broadcast_threshold=0),
        )
    finally:
        _sh.rmtree(_wdir, ignore_errors=True)

    t0 = time.time()
    stats = web_crawl(
        spark, pages, args.state, seeds, robots=robots, host_budgets=budgets,
        config=CrawlConfig(
            default_budget=args.budget, max_epochs=args.max_epochs, salt=8,
            analyze=args.analyze, local_checkpoint=True,
            phase1_checkpoint=args.phase1_checkpoint,
        ),
    )
    wall = time.time() - t0
    scheduled = sum(s["urls_dequeued"] for s in stats)
    fetched = sum(s["urls_fetched"] + s["urls_failed"] for s in stats)
    print(json.dumps({
        "cpus": args.cpus,
        "epochs": len(stats),
        "urls_scheduled": scheduled,
        "urls_fetched": fetched,
        "wall_sec": round(wall, 3),
        "urls_per_sec": round((scheduled + fetched) / wall, 2),
    }))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
