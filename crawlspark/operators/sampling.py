"""Deterministic sampling + dataset splits for training pipelines.

A 100 TB corpus needs sampling that is a *pure function of the row key*:
stable under repartitioning, re-runs, and cluster size (``df.sample``
is none of those — it draws per-partition and changes with the split
layout), and consistent across engines so held-out membership can be
recomputed anywhere.

Mechanism: the first 8 hex chars of ``md5(seed ':' key)`` are a
uniform draw in [0, 16^8). Comparing that FIXED-WIDTH lowercase hex
string against a precomputed hex threshold is the same total order as
the numeric compare — so membership is one codegen'd string compare,
no UDF, no hex→int conversion, and byte-identical semantics in any SQL
dialect with md5 (the DuckDB oracles reuse the exact expression).

No reference twin (the reference crawls, it doesn't split corpora);
this family comes from the task brief's training-data pipeline scope.
All operators are single narrow projections/filters — no shuffle, no
driver state, linear at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 8
_SPACE = 16**_HEX_WIDTH


def _threshold_hex(fraction: float) -> str:
    """Largest-prefix hex threshold: draws < threshold ≙ a ``fraction``
    share of the key space (exact to 1/16^8 ≈ 6e-10)."""
    t = min(max(int(round(fraction * _SPACE)), 0), _SPACE)
    return format(t, f"0{_HEX_WIDTH}x") if t < _SPACE else "g" * _HEX_WIDTH  # 'g' > 'f'


def hash_draw(key: Column | str, seed: str = "0") -> Column:
    """The row's uniform draw: first 8 hex chars of md5(seed ':' key).
    Pure column expr; identical text in the SQL oracle."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), c.cast("string"))), 1, _HEX_WIDTH)


def hash_draw_sql(key: str, seed: str = "0") -> str:
    """The DuckDB-side twin of :func:`hash_draw` (md5 is lowercase hex
    in both engines; fixed width makes string order = numeric order)."""
    return f"substring(md5('{seed}' || ':' || {key}), 1, {_HEX_WIDTH})"


def deterministic_sample(
    df: DataFrame, key: str, rate: float, *, seed: str = "0"
) -> DataFrame:
    """Keep a stable ``rate`` fraction of rows by key hash. Same row set
    on every run, any partitioning, any engine."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.where(hash_draw(key, seed) < F.lit(_threshold_hex(rate)))


def hash_split(
    df: DataFrame,
    key: str,
    splits: dict[str, float],
    *,
    seed: str = "0",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (e.g. train/val/test)
    by consecutive threshold ranges of the key draw. Fractions must sum
    to 1 (±1e-9); assignment is a CASE ladder of string compares.

    Rows with a NULL key get a NULL split (they have no draw) instead of
    silently concentrating in the last-named split — filter or repair
    null keys upstream if every row must land somewhere."""
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {sum(splits.values())}")
    draw = hash_draw(key, seed)
    expr, acc = None, 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = draw < F.lit(_threshold_hex(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    expr = F.when(F.col(key).isNull(), F.lit(None).cast("string")).otherwise(expr)
    return df.withColumn(out_col, expr)


def hash_split_sql(key: str, splits: dict[str, float], *, seed: str = "0") -> str:
    """DuckDB CASE-ladder twin of :func:`hash_split` (incl. NULL-key →
    NULL split)."""
    draw = hash_draw_sql(key, seed)
    parts, acc = [], 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        parts.append(f"WHEN {draw} < '{_threshold_hex(acc)}' THEN '{name}'")
    body = " ".join(parts)
    inner = f"CASE {body} ELSE '{names[-1]}' END" if parts else f"'{names[-1]}'"
    return f"CASE WHEN {key} IS NULL THEN NULL ELSE {inner} END"


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    seed: str = "0",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of rare
    languages, 5% of English): the stratum picks the threshold, the key
    hash picks the rows. One filter, no shuffle — unlike
    ``sampleBy``, stable under repartitioning and reproducible in SQL."""
    thr = None
    for value, rate in rates.items():
        cond = F.col(strata) == F.lit(value)
        t = F.lit(_threshold_hex(rate))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = F.lit(_threshold_hex(default_rate)) if thr is None else thr.otherwise(
        F.lit(_threshold_hex(default_rate))
    )
    return df.where(hash_draw(key, seed) < thr)
