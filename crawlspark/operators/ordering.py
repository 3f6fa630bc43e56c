"""Cursor, ordering, and budget operators — the reference's crawl core.

Each function is one operator from SURVEY.md §2, expressed as a lazy
DataFrame transformation (Catalyst sees the whole plan; filters push down
to the parquet scan, aggregates get map-side partials, windows get a
single shuffle on their partition keys).

Reference parity citations:
  cursor_filter         — Downloader.cs:232-244 (O5): half-open (cursor, max]
  crawl_order           — Downloader.cs:241-242 (O6): ORDER BY commit_ts, url
  ordered_limit         — Downloader.cs:101-110 (O7): MaxPages take-K
  distinct_commits      — Downloader.cs:129-135 (O8)
  commit_budget_cutoff  — Downloader.cs:137-146 (O9): whole commits only
  pending_per_commit    — Downloader.cs:160-164 (O10)
  max_cursor            — Downloader.cs:197-205 (O13)
  min_watermark         — Downloader.cs:207-230 (O12)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EPOCH_MIN = dt.datetime(1, 1, 1)  # DateTimeOffset.MinValue analog (Cursor.cs:28)


def cursor_filter(
    df: DataFrame,
    cursor: dt.datetime | None,
    max_ts: dt.datetime | Column | None = None,
    ts_col: str = "commit_ts",
) -> DataFrame:
    """Keep rows in the half-open interval (cursor, max_ts]. Either bound
    may be None/open. Plain comparison predicates → parquet pushdown and
    partition pruning do the incremental-scan skipping."""
    out = df
    if cursor is not None and cursor > EPOCH_MIN:
        out = out.where(F.col(ts_col) > F.lit(cursor))
    if max_ts is not None:
        bound = max_ts if isinstance(max_ts, Column) else F.lit(max_ts)
        out = out.where(F.col(ts_col) <= bound)
    return out


def crawl_order(df: DataFrame, ts_col: str = "commit_ts", url_col: str = "url") -> DataFrame:
    """The reproducible total crawl order: (commit_ts, url). At scale
    order is a *property of the data* recovered by this sort at
    verification/emission time — never by execution timing."""
    return df.orderBy(ts_col, url_col)


def ordered_limit(df: DataFrame, k: int | None, order_cols: list[str]) -> DataFrame:
    """Top-K of a total order (MaxPages). Spark plans orderBy+limit as
    TakeOrderedAndProject — per-partition heaps + driver merge, no full
    sort, no full shuffle."""
    if k is None:
        return df.orderBy(*order_cols)
    return df.orderBy(*order_cols).limit(k)


def distinct_commits(df: DataFrame, ts_col: str = "commit_ts") -> DataFrame:
    return df.select(ts_col).distinct().orderBy(ts_col)


def commit_budget_cutoff(df: DataFrame, remaining: int, ts_col: str = "commit_ts") -> DataFrame:
    """Keep only the first ``remaining`` whole commits of the global
    commit order — a commit is never split (Downloader.cs:137-146).
    The first N distinct commit timestamps are an ordered limit
    (TakeOrderedAndProject: per-partition heaps + driver merge, no
    single-partition window), semi-joined back against the rows.

    ``remaining`` is clamped at 0: a driver computing
    ``budget - consumed`` may go negative, and the total function
    returns an empty frame there (the pre-r2 rank-filter behavior)
    instead of raising inside ``limit``."""
    commits = df.select(ts_col).distinct().orderBy(ts_col).limit(max(remaining, 0))
    return df.join(F.broadcast(commits), ts_col, "left_semi")


def pending_per_commit(df: DataFrame, ts_col: str = "commit_ts") -> DataFrame:
    return df.groupBy(ts_col).agg(F.count("*").alias("pending"))


def max_cursor(df: DataFrame, ts_col: str = "commit_ts") -> dt.datetime | None:
    row = df.agg(F.max(ts_col).alias("m")).first()
    return row["m"] if row else None


def min_watermark(pending: DataFrame, ts_col: str = "commit_ts") -> dt.datetime | None:
    """Min still-pending commit: the cursor may advance to just before
    it. In the epoch model the whole epoch commits atomically, so this
    degenerates to 'min of commits not in this epoch's completed set' —
    kept as an operator for parity tests (Downloader.cs:222-224)."""
    row = pending.agg(F.min(ts_col).alias("m")).first()
    return row["m"] if row else None
