"""Classifier evaluation (operators/classify.py): exact tie-aware AUC,
reliability bins, DuckDB twins."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from crawlspark.operators.classify import (
    calibration_bins,
    classifier_auc,
    classifier_eval_sql,
    classifier_score,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score long")


def _labels(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, label boolean")


def test_auc_hand_computed_with_ties(spark):
    # pos scores [3, 5, 5], neg scores [1, 5, 7]
    scored = _scored(spark, [(0, 3), (1, 5), (2, 5), (3, 1), (4, 5), (5, 7)])
    labels = _labels(
        spark, [(0, True), (1, True), (2, True), (3, False), (4, False), (5, False)]
    )
    r = classifier_auc(scored, labels).first()
    assert (r.n_pos, r.n_neg) == (3, 3)
    assert r.n_concordant == 3          # (3>1), (5>1), (5>1)
    assert r.n_tied == 2                # two pos at 5 vs one neg at 5
    assert r.auc_micro == (2 * 3 + 2) * 500_000 // 9   # 444444


def test_auc_extremes(spark):
    scored = _scored(spark, [(0, 10), (1, 20), (2, 1), (3, 2)])
    perfect = _labels(spark, [(0, True), (1, True), (2, False), (3, False)])
    assert classifier_auc(scored, perfect).first().auc_micro == 1_000_000
    inverted = _labels(spark, [(0, False), (1, False), (2, True), (3, True)])
    assert classifier_auc(scored, inverted).first().auc_micro == 0
    onesided = _labels(spark, [(0, True), (1, True), (2, True), (3, True)])
    assert classifier_auc(scored, onesided).first().auc_micro is None


def test_calibration_bins_conserve_and_order(spark):
    rows = [(i, i) for i in range(100)]                 # score == id
    scored = _scored(spark, rows)
    labels = _labels(spark, [(i, i >= 50) for i in range(100)])  # top half pos
    bins = calibration_bins(scored, labels, n_bins=4).orderBy("bin").collect()
    assert [b.bin for b in bins] == [0, 1, 2, 3]
    assert sum(b.n for b in bins) == 100 and all(b.n == 25 for b in bins)
    assert [b.pos_micro for b in bins] == [0, 0, 1_000_000, 1_000_000]
    assert bins[0].score_min == 0 and bins[3].score_max == 99


def test_duckdb_twins_match_on_real_scores(spark):
    rows = [(i, f"tok{i % 7} tok{i % 5} tok{(i * 3) % 11} end") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labels_expr = "(d.doc_id * 2654435761) % 97 < 48"
    scored = classifier_score(docs)
    labels = docs.select(
        "doc_id", ((F.col("doc_id") * 2654435761) % 97 < 48).alias("label")
    )
    got_bins = sorted(
        tuple(map(str, r)) for r in calibration_bins(scored, labels, n_bins=5).collect()
    )
    got_auc = sorted(tuple(map(str, r)) for r in classifier_auc(scored, labels).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    bins_sql, auc_sql = classifier_eval_sql(labels_expr, n_bins=5)
    exp_bins = sorted(tuple(map(str, r)) for r in con.sql(bins_sql).fetchall())
    exp_auc = sorted(tuple(map(str, r)) for r in con.sql(auc_sql).fetchall())
    assert got_bins == exp_bins
    assert got_auc == exp_auc
