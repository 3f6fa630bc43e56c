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
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--gen-pages", type=int, default=0, help="generate corpus if missing")
    ap.add_argument("--gen-hosts", type=int, default=200)
    ap.add_argument("--gen-seeds", type=int, default=20000)
    ap.add_argument("--budget", type=int, default=256)
    ap.add_argument("--max-epochs", type=int, default=6)
    ap.add_argument("--analyze", action="store_true", default=True,
                    help="inline text analysis during fetch (the realistic pipeline)")
    args = ap.parse_args()

    from crawlspark.plans.epoch import CrawlConfig, web_crawl
    from crawlspark.session import get_spark
    from crawlspark.testdata import write_corpus

    spark = get_spark(
        f"crawl-bench-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
        # sandbox corpora are ~1 GB; the 128 MB default split would give
        # the heavy fetch+extract scan fewer tasks than cores. On a real
        # cluster at 100 TB the default is correct.
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )

    if args.gen_pages and not os.path.exists(os.path.join(args.corpus, "pages.parquet")):
        write_corpus(
            spark, args.corpus, n_pages=args.gen_pages, n_hosts=args.gen_hosts,
            leaves_per_commit=64, commits_per_page=16, n_seeds=args.gen_seeds,
            n_outlinks=8, n_words_base=150, n_words_spread=250,
        )

    pages = spark.read.parquet(os.path.join(args.corpus, "pages.parquet"))
    seeds = spark.read.parquet(os.path.join(args.corpus, "seeds.parquet"))
    robots = spark.read.parquet(os.path.join(args.corpus, "robots.parquet"))
    budgets = spark.read.parquet(os.path.join(args.corpus, "host_budgets.parquet"))
    # scale the per-host budgets up to bench size (corpus defaults are tiny)
    from pyspark.sql import functions as F
    budgets = budgets.select("host", (F.col("tokens_per_epoch") * 0 + args.budget).alias("tokens_per_epoch"))

    # warm the OS page cache so both parallelism levels measure compute,
    # not first-touch disk reads
    pages.count()
    seeds.count()

    t0 = time.time()
    stats = web_crawl(
        spark, pages, args.state, seeds, robots=robots, host_budgets=budgets,
        config=CrawlConfig(
            default_budget=args.budget, max_epochs=args.max_epochs, salt=8,
            analyze=args.analyze,
        ),
    )
    wall = time.time() - t0
    scheduled = sum(s["urls_dequeued"] for s in stats)
    fetched = sum(s["urls_fetched"] + s["urls_missing"] for s in stats)
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
