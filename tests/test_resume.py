"""Checkpoint/resume: a killed run resumes with no duplicate or dropped
URLs (north_star). The commit-log protocol mirrors the reference's crash
contract: cursor never passes incomplete work — re-crawl, never skip
(Downloader.cs:222-224)."""

import os
import shutil

from pyspark.sql import functions as F

from crawlspark.plans.epoch import CrawlConfig, web_crawl
from crawlspark.plans.state import CrawlState
from crawlspark.testdata import write_corpus


def _trace(spark, state_dir):
    return [
        (r["epoch"], r["url"])
        for r in CrawlState(state_dir).fetched.read(spark).orderBy("epoch", "url").collect()
    ]


def _inputs(spark, tmp_path):
    d = str(tmp_path / "corpus")
    paths = write_corpus(spark, d, n_pages=150, n_hosts=6)
    return (
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["seeds"]),
    )


def test_resume_equals_uninterrupted(spark, tmp_path):
    pages, seeds = _inputs(spark, tmp_path)
    cfg_all = CrawlConfig(default_budget=6, max_epochs=12)

    sd_full = str(tmp_path / "full")
    web_crawl(spark, pages, sd_full, seeds, config=cfg_all)

    # interrupted: stop after 2 epochs, then resume to completion
    sd_resume = str(tmp_path / "resume")
    web_crawl(spark, pages, sd_resume, seeds, config=CrawlConfig(default_budget=6, max_epochs=2))
    assert CrawlState(sd_resume).next_epoch() == 2
    web_crawl(spark, pages, sd_resume, seeds, config=cfg_all)

    assert _trace(spark, sd_full) == _trace(spark, sd_resume)


def test_crash_mid_epoch_never_skips_or_duplicates(spark, tmp_path):
    """Simulate a crash after data staging but before the atomic commit:
    the staged epoch is invisible, and the re-run reproduces it exactly."""
    pages, seeds = _inputs(spark, tmp_path)
    cfg = CrawlConfig(default_budget=6, max_epochs=12)

    sd_full = str(tmp_path / "full2")
    web_crawl(spark, pages, sd_full, seeds, config=cfg)

    sd_crash = str(tmp_path / "crash")
    web_crawl(spark, pages, sd_crash, seeds, config=CrawlConfig(default_budget=6, max_epochs=3))
    state = CrawlState(sd_crash)

    # "crash": epoch 3's data dirs exist on disk but the commit log never
    # advanced — exactly what a kill between stage and commit leaves.
    fetched3 = os.path.join(sd_crash, "fetched", "epoch=3")
    shutil.copytree(os.path.join(sd_crash, "fetched", "epoch=2"), fetched3)
    assert state.next_epoch() == 3  # uncommitted dir is invisible
    assert state.fetched.read(spark).where("epoch = 3").count() == 0

    web_crawl(spark, pages, sd_crash, seeds, config=cfg)  # resume overwrites
    assert _trace(spark, sd_full) == _trace(spark, sd_crash)
    # no dropped urls, no duplicates
    fetched = CrawlState(sd_crash).fetched.read(spark)
    assert fetched.count() == fetched.select("url").distinct().count()


def test_lineage_metrics_recorded_per_epoch(spark, tmp_path):
    pages, seeds = _inputs(spark, tmp_path)
    sd = str(tmp_path / "lin")
    stats = web_crawl(spark, pages, sd, seeds, config=CrawlConfig(default_budget=6, max_epochs=3))
    state = CrawlState(sd)
    lineage = state.lineage.read(spark)
    assert lineage.where("consumer = 'download'").count() > 0
    # lineage row sums equal the committed epoch stats
    per_epoch = {
        r["epoch"]: r["total"]
        for r in lineage.groupBy("epoch").sum("urls_fetched").withColumnRenamed("sum(urls_fetched)", "total").collect()
    }
    for s in stats:
        assert per_epoch[s["epoch"]] == s["urls_fetched"]
    # cursor is monotone across epochs
    cursors = [m.get("cursors", {}).get("download") for m in
               (state.log.read()["meta"][str(e)] for e in state.log.committed_epochs())]
    assert cursors == sorted(cursors)


def test_time_travel_and_rollback(spark, tmp_path):
    """Iceberg-semantics parity on the commit-log tables: VERSION AS OF
    (read_as_of pins a snapshot epoch) and rollback_to_snapshot
    (rollback_to truncates the log; later data becomes invisible and a
    resumed crawl re-executes from there, converging to the same
    state — the crash contract, via the rollback path)."""
    pages, seeds = _inputs(spark, tmp_path)
    cfg = CrawlConfig(default_budget=6, max_epochs=4)
    sd = str(tmp_path / "tt")
    web_crawl(spark, pages, sd, seeds, config=cfg)
    state = CrawlState(sd)
    epochs = state.log.committed_epochs()
    assert len(epochs) >= 3
    full = state.fetched.read(spark)

    # time travel: as-of epoch 1 sees exactly epochs 0-1, and matches a
    # filtered read of the full table row-for-row
    asof = state.fetched.read_as_of(spark, 1)
    assert {r.epoch for r in asof.select("epoch").distinct().collect()} == {0, 1}
    a = sorted(map(tuple, asof.collect()))
    b = sorted(map(tuple, full.where(F.col("epoch") <= 1).collect()))
    assert a == b

    # rollback: drop everything after epoch 1, later rows turn invisible
    dropped = state.log.rollback_to(1)
    assert dropped == [e for e in epochs if e > 1]
    assert CrawlState(sd).log.committed_epochs() == [0, 1]
    visible = CrawlState(sd).fetched.read(spark)
    assert sorted(map(tuple, visible.collect())) == a
    # rollback is idempotent
    assert CrawlState(sd).log.rollback_to(1) == []

    # a resumed crawl re-executes from the rollback point and converges
    # to the uninterrupted run's final state
    web_crawl(spark, pages, sd, seeds, config=cfg)
    resumed = CrawlState(sd).fetched.read(spark)
    ref_sd = str(tmp_path / "ref")
    web_crawl(spark, pages, ref_sd, seeds, config=cfg)
    ref = CrawlState(ref_sd).fetched.read(spark)
    key = lambda df: sorted((r.epoch, r.url) for r in df.select("epoch", "url").collect())
    assert key(resumed) == key(ref)
