"""Local replica of the driver's correctness gate: run every
__spark_entry__ query against its DuckDB oracle on sf0.001 and require
identical (order-insensitive) results — column names, row counts, and
exact values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


def _kind(t: str) -> str:
    """Coarse type class for the cross-engine dtype check. The driver's
    hash compare is dtype-aware (a DuckDB HUGEINT sum vs a Spark BIGINT
    hashes differently even when values match), so the local gate must
    compare type kinds too, not just stringified values."""
    t = t.lower()
    if "int" in t and "interval" not in t:
        return "int128" if "hugeint" in t or "decimal128" in t else "int"
    if any(k in t for k in ("float", "double", "real")):
        return "float"
    if "decimal" in t or "numeric" in t:
        return "decimal"
    if "timestamp" in t:
        return "timestamp"
    if "date" in t:
        return "date"
    if "bool" in t:
        return "bool"
    if any(k in t for k in ("string", "varchar", "char", "text")):
        return "string"
    return t


# windowed oracles (driver contract) + tail oracles (pytest-only; the
# driver's 50-entry window is full) get the identical value compare
_ALL_SQL = {**entrymod.oracle_sql(), **entrymod.tail_oracle_sql()}
ORACLED = sorted(_ALL_SQL.keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = entrymod.queries()[name](spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    rel = duck.sql(_ALL_SQL[name])
    duck_cols = [c for c in rel.columns]
    duck_types = {c: _kind(str(t)) for c, t in zip(rel.columns, rel.types)}
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    spark_types = {f.name: _kind(f.dataType.simpleString()) for f in sdf.schema.fields}
    mismatched = {
        c: (spark_types[c], duck_types[c])
        for c in spark_cols
        if spark_types[c] != duck_types[c]
        # arrays/structs only need to agree structurally, values are compared below
        and not duck_types[c].startswith(("list", "struct"))
        and not spark_types[c].startswith(("array", "struct"))
    }
    assert not mismatched, f"{name}: column type kinds differ (spark, duck): {mismatched}"
    assert len(spark_rows) == len(duck_rows), f"{name}: row counts differ"
    got = _rowset(spark_cols, [[r[c] for c in spark_cols] for r in spark_rows])
    exp = _rowset(duck_cols, duck_rows)
    mism = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e][:3]
    assert got == exp, f"{name}: values differ, e.g. rows {[(got[i], exp[i]) for i in mism]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
