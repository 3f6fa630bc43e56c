"""Streaming report twins equal their batch counterparts."""

import os

from crawlspark.plans.reports import ReportStore, page_count_by_day
from crawlspark.streaming.reports import stream_count_by_day, stream_update_reports
from crawlspark.testdata import build_pages, pages_only


def _pages_dir(spark, tmp_path, n=160):
    d = str(tmp_path / "pages.parquet")
    pages_only(build_pages(spark, n, n_hosts=6)).write.mode("overwrite").parquet(d)
    return d


def test_stream_count_by_day_matches_batch(spark, tmp_path):
    d = _pages_dir(spark, tmp_path)
    q = stream_count_by_day(spark, d, query_name="t_day_stream")
    q.awaitTermination(120)
    got = {
        (r["day"], r["value"])
        for r in spark.sql("SELECT * FROM t_day_stream").collect()
    }
    exp = {(r["day"], r["value"]) for r in page_count_by_day(spark.read.parquet(d)).collect()}
    assert got == exp


def test_foreachbatch_merge_matches_batch_store(spark, tmp_path):
    d = _pages_dir(spark, tmp_path)
    root = str(tmp_path / "reports")
    q = stream_update_reports(spark, d, root, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {
        (r["day"], r["value"])
        for r in ReportStore(root).read(spark, "page_count_by_day").collect()
    }
    exp = {(r["day"], r["value"]) for r in page_count_by_day(spark.read.parquet(d)).collect()}
    assert got == exp


def _events(spark, id_lo, id_hi, base_min=0):
    """Deterministic events: 6 users, one event per id, ts spaced so that
    every 5th event per user opens a >30-min gap (new session)."""
    from pyspark.sql import functions as F

    return spark.range(id_lo, id_hi).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 6).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000 + base_min * 60)
            + (F.col("id") / 6).cast("long") * 60                      # 1 min apart
            + ((F.col("id") / 30).cast("long") * 3600)                 # hourly gap each 5th
        ).alias("ts"),
        F.lit("click").alias("event_type"),
        (F.col("id") % 7).cast("double").alias("value"),
    )


def _batch_sessions(spark, events):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        events.withColumn("new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_id", F.sum("new").over(w))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
    )


def test_stateful_sessionize_incremental_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: two incremental availableNow
    runs over a growing log (shared checkpoint) — sessions spanning the
    run boundary continue from state; final answer equals batch."""
    from crawlspark.streaming.sessions import read_sessions, stream_sessionize

    d = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    a = _events(spark, 0, 168)
    a.write.mode("append").parquet(d)
    q = stream_sessionize(spark, d, ckpt, out)
    q.awaitTermination(120)

    # second run: later events, some continuing the last open sessions
    b = _events(spark, 168, 300)
    b.write.mode("append").parquet(d)
    q2 = stream_sessionize(spark, d, ckpt, out)
    q2.awaitTermination(120)

    got = {
        (r["user_id"], r["session_id"], r["n_events"])
        for r in read_sessions(spark, out).collect()
    }
    exp = {
        (r["user_id"], r["session_id"], r["n_events"])
        for r in _batch_sessions(spark, spark.read.parquet(d)).collect()
    }
    assert got == exp
    # statefulness actually exercised: >= 2 micro-batches emitted, and at
    # least one session id was UPDATED across batches (spans the runs —
    # the 0..168 split point is deliberately not a session boundary)
    raw = spark.read.parquet(out)
    assert raw.select("batch_id").distinct().count() >= 2
    spanning = (
        raw.groupBy("user_id", "session_id")
        .count().where("count > 1").count()
    )
    assert spanning > 0


def test_stream_exact_dedup_incremental_never_reemits(spark, tmp_path):
    """Ingest-time exact dedup: two availableNow runs over a growing doc
    log (second batch re-sends half of the first batch's contents plus
    new ones) emit exactly one doc per distinct fingerprint, and the
    emitted fingerprint set equals the batch-dedup distinct set."""
    import hashlib

    from pyspark.sql import Row

    from crawlspark.operators.dedup import exact_dedup
    from crawlspark.streaming.dedup import read_deduped, stream_exact_dedup

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    texts1 = [f"doc body {i % 8}" for i in range(20)]       # 8 distinct
    spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts1)]
    ).write.mode("overwrite").parquet(docs_dir)
    q = stream_exact_dedup(spark, docs_dir, ckpt, out_dir)
    q.awaitTermination(120)
    first = read_deduped(spark, out_dir).collect()
    assert len(first) == 8

    # second delivery: 4 repeated contents + 3 genuinely new
    texts2 = [f"doc body {i % 8}" for i in range(4)] + [f"fresh {j}" for j in range(3)]
    spark.createDataFrame(
        [Row(doc_id=100 + i, text=t) for i, t in enumerate(texts2)]
    ).write.mode("append").parquet(docs_dir)
    q = stream_exact_dedup(spark, docs_dir, ckpt, out_dir)
    q.awaitTermination(120)

    got = read_deduped(spark, out_dir).collect()
    assert len(got) == 11  # 8 + 3, repeats never re-emitted
    all_texts = texts1 + texts2
    exp_fps = {hashlib.md5(t.lower().encode()).hexdigest() for t in all_texts}
    assert {r["fp"] for r in got} == exp_fps
    # ...and equals the batch operator's distinct clusters
    batch = exact_dedup(spark.read.parquet(docs_dir)).collect()
    assert {r["text_hash"] for r in batch} == {r["fp"] for r in got}


def test_stream_seed_ingest_gate_and_crawl_handoff(spark, tmp_path):
    """Streaming seed ingestion: invalid URLs dropped, first arrival of
    a url wins across two availableNow runs (later duplicates — even
    with better priority — never re-emit), and the ingested directory
    is a valid web_crawl seeds input."""
    from pyspark.sql import Row

    from crawlspark.plans.epoch import CrawlConfig, web_crawl
    from crawlspark.plans.state import CrawlState
    from crawlspark.streaming.seeds import read_seeds, stream_seed_ingest
    from crawlspark.testdata import write_corpus

    seeds_dir = str(tmp_path / "seed_log")
    out_dir = str(tmp_path / "seeds_out")
    ckpt = str(tmp_path / "seeds_ckpt")

    corpus = str(tmp_path / "corpus")
    paths = write_corpus(spark, corpus, n_pages=120, n_hosts=6)
    pages = spark.read.parquet(paths["pages"])
    real = [r.url for r in spark.read.parquet(paths["seeds"]).limit(8).collect()]

    batch1 = [Row(url=u, priority=5) for u in real[:5]] + [
        Row(url="not a url", priority=0),
        Row(url="ftp://wrong.scheme/x", priority=0),
    ]
    spark.createDataFrame(batch1, "url string, priority int").write.mode(
        "overwrite"
    ).parquet(seeds_dir)
    stream_seed_ingest(spark, seeds_dir, ckpt, out_dir).awaitTermination(120)
    first = {r.url: r.priority for r in read_seeds(spark, out_dir).collect()}
    assert set(first) == set(real[:5])  # invalids gated out

    # second delivery: 3 repeats at a "better" priority + 3 new
    batch2 = [Row(url=u, priority=0) for u in real[:3]] + [
        Row(url=u, priority=7) for u in real[5:8]
    ]
    spark.createDataFrame(batch2, "url string, priority int").write.mode(
        "append"
    ).parquet(seeds_dir)
    stream_seed_ingest(spark, seeds_dir, ckpt, out_dir).awaitTermination(120)
    got = {r.url: r.priority for r in read_seeds(spark, out_dir).collect()}
    assert set(got) == set(real[:8])
    assert all(got[u] == 5 for u in real[:3])  # first arrival won

    # the ingested log is a drop-in web_crawl seeds input
    sd = str(tmp_path / "state")
    web_crawl(
        spark, pages, sd, read_seeds(spark, out_dir),
        config=CrawlConfig(default_budget=6, max_epochs=3),
    )
    fetched = CrawlState(sd).fetched.read(spark)
    assert fetched.count() > 0
    assert fetched.count() == fetched.select("url").distinct().count()


def test_stream_lsh_dedup_equals_batch_bucket_rule(spark, tmp_path):
    """Streaming near-dup gate: two id-ordered availableNow runs — the
    second re-delivers near-duplicates (shared shingles) of run-1 docs
    plus genuinely new ones — admit exactly the docs the batch
    min-per-bucket rule (lsh_bucket_keepers) admits over the union."""
    from pyspark.sql import Row

    from crawlspark.operators.dedup import lsh_bucket_keepers
    from crawlspark.streaming.lsh import stream_lsh_dedup

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "lsh_out")
    state_dir = str(tmp_path / "lsh_state")
    ckpt = str(tmp_path / "lsh_ckpt")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    run1 = [
        Row(doc_id=0, text=base),
        Row(doc_id=1, text=base + " lambda"),              # near-dup of 0
        Row(doc_id=2, text="totally different words entirely here now"),
    ]
    spark.createDataFrame(run1).write.mode("overwrite").parquet(docs_dir)
    q = stream_lsh_dedup(spark, docs_dir, ckpt, out_dir, state_dir)
    q.awaitTermination(120)
    first = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert 0 in first and 2 in first and 1 not in first

    run2 = [
        Row(doc_id=10, text=base + " mu"),                 # near-dup across runs
        Row(doc_id=11, text="another fresh document with its own tokens"),
    ]
    spark.createDataFrame(run2).write.mode("append").parquet(docs_dir)
    q = stream_lsh_dedup(spark, docs_dir, ckpt, out_dir, state_dir)
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert 10 not in got and 11 in got

    batch = lsh_bucket_keepers(spark.read.parquet(docs_dir))
    exp = {r.doc_id for r in batch.collect() if r.admitted}
    assert got == exp
