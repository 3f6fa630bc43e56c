"""History-driven recrawl scheduling: change-rate estimation per URL.

Sitemap metadata (operators/sitemaps.schedule_recrawl) covers sites
that publish lastmod/changefreq; everything else needs the crawler's
OWN observations. The classic result (Cho & Garcia-Molina 2003,
"Estimating Frequency of Change", ACM TOIT) is to estimate each page's
change rate from repeated visits and revisit proportionally — pages
that change hourly get short intervals, static pages converge to the
maximum. This module is the integer-exact core of that loop:

* :func:`change_history_stats` folds a visit log ``(url, fetch_ts,
  content_fp)`` into per-url ``n_visits / n_changes / span_s`` — a
  change is a visit whose fingerprint differs from the previous
  visit's (lag over the per-url time order), which LOWER-BOUNDS the
  true change count (changes between visits collapse; the paper's
  bias-corrected estimator divides by a log term — float, so the SQL
  twin could not hash-match; the monotone integer statistics order
  URLs identically, which is all the scheduler consumes).
* :func:`schedule_recrawl_by_change_rate` turns the stats into a
  revisit decision at an explicit ``now``: revisit at HALF the mean
  observed change interval (the sampling-theorem heuristic), clamped
  to ``[min_interval_s, max_interval_s]``; never-changed URLs sit at
  the maximum. ``staleness_micro`` = elapsed/interval in micro-units
  orders the frontier (highest expected staleness first); ``due`` =
  staleness >= 1.0.

Scale shape (10^10 URLs): the lag window and the rollup both partition
by url — one shuffle of (url, ts, 16-byte fp), rows per url bounded by
the visit history length (tens, not millions); the schedule pass is
pure per-row expressions over the per-url stats relation, which is
#urls rows — the same size as the frontier it feeds. ``now`` is an
explicit parameter, never the wall clock: scheduling must be
deterministic and replayable (the sitemaps module's convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def change_history_stats(
    visits: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    fp_col: str = "content_fp",
) -> DataFrame:
    """Per-url change statistics from a visit log: ``(url, n_visits,
    n_changes, first_ts, last_ts, last_fp, span_s, change_ratio_micro)``
    where ``change_ratio_micro`` = floor(1e6 * n_changes / (n_visits-1))
    — the observed per-revisit change probability — NULL below two
    visits (no evidence). Visits must be unique per (url, ts); the lag
    order (and so the change count) is undefined under duplicate
    timestamps, so callers dedupe first."""
    w = Window.partitionBy("url").orderBy("ts")
    prev = F.lag("fp").over(w)
    marked = visits.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.col(fp_col).alias("fp"),
    ).withColumn(
        "__chg",
        F.when(prev.isNull(), 0)
        .when(F.col("fp") != prev, 1)
        .otherwise(0),
    )
    agg = marked.groupBy("url").agg(
        F.count("*").alias("n_visits"),
        F.sum("__chg").alias("n_changes"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.max_by("fp", "ts").alias("last_fp"),
    )
    span = (
        F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")
    ).cast("long")
    ratio = F.when(
        F.col("n_visits") > 1,
        F.floor(F.col("n_changes") * MICRO / (F.col("n_visits") - 1)),
    ).cast("long")
    return agg.select(
        F.col("url").alias(url_col),
        F.col("n_visits").cast("long").alias("n_visits"),
        F.col("n_changes").cast("long").alias("n_changes"),
        "first_ts", "last_ts", "last_fp",
        span.alias("span_s"),
        ratio.alias("change_ratio_micro"),
    )


def schedule_recrawl_by_change_rate(
    stats: DataFrame,
    now,
    min_interval_s: int = 21_600,
    max_interval_s: int = 1_209_600,
    url_col: str = "url",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Revisit decisions at ``now``: ``(url, n_visits, n_changes,
    interval_s, elapsed_s, staleness_micro, due[, carry...])``.

    ``interval_s`` = clamp(span_s div (2 * n_changes), min, max) — half
    the mean observed change interval; URLs with zero observed changes
    (or a single visit, span 0) take ``max_interval_s`` /
    ``min_interval_s`` respectively via the same clamp. ``due`` when
    elapsed >= interval; ``staleness_micro`` = floor(1e6 * elapsed /
    interval) ranks the frontier by expected staleness.

    ``carry`` passes extra ``stats`` columns through unchanged — doing
    it here instead of re-joining the schedule back onto ``stats``
    matters: a url self-join recomputes the whole visit-log aggregation
    on both branches (verified in the plan), one extra corpus pass for
    what is a projection."""
    now_ts = F.lit(now).cast("timestamp")
    interval = F.when(F.col("n_changes") == 0, F.lit(max_interval_s)).otherwise(
        F.greatest(
            F.lit(min_interval_s),
            F.least(
                F.lit(max_interval_s),
                F.expr("span_s div (2 * n_changes)"),
            ),
        )
    ).cast("long")
    elapsed = (
        F.unix_timestamp(now_ts) - F.unix_timestamp("last_ts")
    ).cast("long")
    extra = [c for c in carry if c not in ("url", "last_ts")]
    d = stats.select(
        F.col(url_col).alias("url"), "n_visits", "n_changes", "last_ts",
        interval.alias("interval_s"), elapsed.alias("elapsed_s"),
        *extra,
    )
    staleness = F.floor(F.col("elapsed_s") * MICRO / F.col("interval_s")).cast("long")
    return d.select(
        F.col("url").alias(url_col),
        "n_visits", "n_changes", "interval_s", "elapsed_s",
        staleness.alias("staleness_micro"),
        (F.col("elapsed_s") >= F.col("interval_s")).alias("due"),
        *([c for c in carry if c != "url"]),
    )


def revalidate_fetched(
    pages: DataFrame,
    fetched: DataFrame,
    urls: DataFrame | None = None,
) -> DataFrame:
    """Conditional revalidation — the crawler's If-Modified-Since /
    ETag analog for a snapshot source: refetch previously-crawled URLs
    and report what actually changed, WITHOUT paying the full pipeline
    for unchanged content.

    ``fetched`` is the crawl state's fetched table (url unique — the
    frontier invariant); ``urls`` optionally restricts the revisit set
    (e.g. the ``due`` rows from :func:`schedule_recrawl_by_change_rate`).
    Output, one row per revisited url:

      * ``status`` — ``'unchanged'`` (content fingerprint equal: the
        304 case; downstream extraction/dedup/index stages skip it),
        ``'changed'`` (new text attached for re-processing), or
        ``'gone'`` (url no longer in the source: the 404/410 case).
      * ``old_fp`` / ``new_fp`` — md5 of the stored vs refetched text
        (fingerprints compare EXTRACTED text, so html-level churn that
        does not alter content — rotated ads, timestamps outside the
        body — still counts as unchanged only if the text is identical).
      * ``new_text`` — populated ONLY for changed rows: unchanged pages
        never carry their body past this operator (at 100 TB the whole
        point is that the common case moves fingerprints, not text).

    Plan shape: the pages side is never shuffled for large revisit sets
    (SHUFFLE_HASH right join on the url-partitioned side, the epoch
    fetch join's convention); extraction is the same single-pass Arrow
    UDF the crawl uses, so text fingerprints are byte-identical to the
    stored crawl's."""
    from crawlspark.functions.extract import extract_text_udf

    old = fetched.select(
        "url",
        F.md5("text").alias("old_fp"),
        F.col("warc_ts").alias("old_warc_ts"),
    )
    if urls is not None:
        old = old.join(urls.select("url"), "url", "left_semi")
    p = pages.select("url", "html", F.col("warc_ts").alias("new_warc_ts"))
    j = p.join(old.hint("SHUFFLE_HASH"), "url", "right")
    ext = j.withColumn("new_text", extract_text_udf(F.col("html")))
    new_fp = F.md5("new_text")  # null-safe: md5(NULL) is NULL
    status = (
        F.when(F.col("new_text").isNull(), "gone")
        .when(new_fp == F.col("old_fp"), "unchanged")
        .otherwise("changed")
    )
    return ext.select(
        "url",
        status.alias("status"),
        "old_fp",
        new_fp.alias("new_fp"),
        "old_warc_ts", "new_warc_ts",
        F.when(status == "changed", F.col("new_text")).alias("new_text"),
    )


def change_history_sql(
    visits_expr: str,
    url_expr: str = "url",
    ts_expr: str = "fetch_ts",
    fp_expr: str = "content_fp",
) -> str:
    """DuckDB twin of :func:`change_history_stats` (stats columns only;
    callers append the schedule arithmetic — see the registered
    ``recrawl_schedule`` oracle)."""
    return f"""
      WITH v AS (SELECT {url_expr} AS url, {ts_expr} AS ts, {fp_expr} AS fp
                 FROM {visits_expr}),
      m AS (SELECT url, ts, fp,
                   CASE WHEN lag(fp) OVER (PARTITION BY url ORDER BY ts) IS NULL THEN 0
                        WHEN fp <> lag(fp) OVER (PARTITION BY url ORDER BY ts) THEN 1
                        ELSE 0 END AS chg
            FROM v),
      s AS (SELECT url,
                   CAST(count(*) AS BIGINT) AS n_visits,
                   CAST(sum(chg) AS BIGINT) AS n_changes,
                   min(ts) AS first_ts, max(ts) AS last_ts,
                   arg_max(fp, ts) AS last_fp
            FROM m GROUP BY url)
      SELECT url, n_visits, n_changes, first_ts, last_ts, last_fp,
             -- per-side floor to whole seconds BEFORE the diff: Spark's
             -- unix_timestamp truncates each timestamp; DuckDB epoch()
             -- keeps fractional microseconds and CAST would round
             CAST((epoch_us(last_ts) // 1000000)
                  - (epoch_us(first_ts) // 1000000) AS BIGINT) AS span_s,
             CAST(CASE WHEN n_visits > 1
                       THEN floor(n_changes * {MICRO}.0 / (n_visits - 1)) END
                  AS BIGINT) AS change_ratio_micro
      FROM s
    """
