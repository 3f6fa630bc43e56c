"""Deterministic sampling/splits: key-pure membership (stable under
repartitioning), exact split accounting, DuckDB expression parity."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawlspark.operators.sampling import (
    deterministic_sample,
    hash_draw_sql,
    hash_split,
    hash_split_sql,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame({
        "doc_id": range(2000),
        "lang": [["en", "en", "en", "de", "fr"][i % 5] for i in range(2000)],
    })
    return spark.createDataFrame(pdf)


def test_sample_is_stable_under_repartitioning(spark, docs):
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.3, seed="s").collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(
            docs.repartition(7, "lang"), "doc_id", 0.3, seed="s"
        ).collect()
    }
    assert a == b
    assert 0.25 < len(a) / 2000 < 0.35
    # rate edges: 0 keeps nothing, 1 keeps everything
    assert deterministic_sample(docs, "doc_id", 0.0).count() == 0
    assert deterministic_sample(docs, "doc_id", 1.0).count() == 2000


def test_hash_split_partitions_exactly(spark, docs):
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="42")
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 2000          # exhaustive + disjoint
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert 0.7 < counts["train"] / 2000 < 0.9
    # sampling the train threshold range reproduces the train split
    tr = {r.doc_id for r in out.where(F.col("split") == "train").collect()}
    sa = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.8, seed="42").collect()}
    assert tr == sa


def test_hash_split_bad_fractions_rejected(spark, docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        deterministic_sample(docs, "doc_id", 1.5)


def test_stratified_rates_per_language(spark, docs):
    out = stratified_sample(
        docs, "doc_id", "lang", {"de": 1.0, "en": 0.25}, default_rate=0.0, seed="q"
    )
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert got["de"] == 400                      # rate 1.0: every de row
    assert "fr" not in got                       # default 0.0: dropped
    assert 0.15 < got["en"] / 1200 < 0.35        # ~25% of en


def test_duckdb_expression_parity(spark, docs):
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(docs, "doc_id", splits, seed="42")
    spark_rows = sorted((r.doc_id, r.split) for r in out.collect())
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    duck_rows = sorted(
        con.sql(
            f"SELECT doc_id, {hash_split_sql('doc_id', splits, seed='42')} AS s FROM docs"
        ).fetchall()
    )
    assert spark_rows == duck_rows
    draw_s = sorted(
        r[0]
        for r in spark.createDataFrame(pd.DataFrame({"k": ["a", "b", "c"]}))
        .select(F.substring(F.md5(F.concat(F.lit("0"), F.lit(":"), F.col("k"))), 1, 8))
        .collect()
    )
    draw_d = sorted(
        r[0]
        for r in con.sql(
            f"SELECT {hash_draw_sql('k')} FROM (VALUES ('a'),('b'),('c')) t(k)"
        ).fetchall()
    )
    assert draw_s == draw_d


def test_hash_split_null_key_gets_null_split(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": pd.array([1, 2, None], dtype="Int64")})
    )
    out = {r.doc_id: r.split for r in hash_split(
        df, "doc_id", {"train": 0.5, "test": 0.5}
    ).collect()}
    assert out[1] in {"train", "test"} and out[2] in {"train", "test"}
    assert out[None] is None  # NULL key never lands in a named split
