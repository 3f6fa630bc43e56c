"""DSIR hashed-bigram importance selection: fit/score exactness on a
planted two-domain corpus, monotone target-likeness, edge docs, and the
plan-shape guarantees (broadcast score join, TakeOrderedAndProject cut,
no text through an exchange)."""

from pyspark.sql import functions as F

from crawlspark.operators.dsir import (
    MICRO,
    bucket_scores,
    dsir_select,
    dsir_weights,
    hashed_bigram_fit,
)


def _corpus(spark):
    # target-ish docs repeat "alpha beta" bigrams; off-target docs are
    # "gamma delta" soup; one 1-token doc and one empty doc as edges
    rows = [
        (0, "alpha beta alpha beta alpha", "en"),
        (1, "alpha beta gamma", "en"),
        (2, "gamma delta gamma delta", "zh"),
        (3, "delta gamma delta", "zh"),
        (4, "solo", "en"),
        (5, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_fit_counts_bigrams_with_multiplicity(spark):
    d = _corpus(spark)
    fit = hashed_bigram_fit(d, n_buckets=1 << 20)  # huge B: no collisions
    # corpus bigram volume: 4 + 2 + 3 + 2 + 0 + 0 = 11
    assert fit.agg(F.sum("cnt")).collect()[0][0] == 11


def test_scores_and_weights_exact(spark):
    d = _corpus(spark)
    tfit = hashed_bigram_fit(d.where(F.col("lang") == "en"), n_buckets=1 << 20)
    rfit = hashed_bigram_fit(d, n_buckets=1 << 20)
    w = {
        r.doc_id: r.asDict()
        for r in dsir_weights(
            d, bucket_scores(tfit, rfit), n_buckets=1 << 20
        ).collect()
    }
    # "alpha beta" occurs 2+1=3x in target, 3x in raw -> s = 1e6*4//4 = 1e6
    # "beta alpha" 2x target, 2x raw -> 1e6*3//3 = 1e6
    # "beta gamma" 1x target, 1x raw -> 1e6
    # doc 0: 2x"alpha beta" + 2x"beta alpha" -> 4e6, per-gram 1e6
    assert w[0]["weight"] == 4 * MICRO and w[0]["w_per_gram_micro"] == MICRO
    # "gamma delta": 0 target, 3 raw -> 1e6*1//4 = 250000
    # "delta gamma": 0 target, 2 raw -> 1e6*1//3 = 333333
    # doc 2: 2x gd + 1x dg = 500000 + 333333 = 833333, 3 grams
    assert w[2]["weight"] == 2 * 250_000 + 333_333
    assert w[2]["w_per_gram_micro"] == w[2]["weight"] // 3
    # on-target docs outrank off-target per-gram
    assert w[0]["w_per_gram_micro"] > w[2]["w_per_gram_micro"]
    # edge docs: no bigrams -> NULL weight
    assert w[4]["n_bigrams"] == 0 and w[4]["weight"] is None
    assert w[5]["weight"] is None and w[5]["w_per_gram_micro"] is None


def test_select_is_deterministic_and_skips_empty(spark):
    d = _corpus(spark)
    tfit = hashed_bigram_fit(d.where(F.col("lang") == "en"), n_buckets=1 << 20)
    rfit = hashed_bigram_fit(d, n_buckets=1 << 20)
    w = dsir_weights(d, bucket_scores(tfit, rfit), n_buckets=1 << 20)
    got = [(r.doc_id, r.rank) for r in dsir_select(w, k=3).collect()]
    # ties on w_per_gram break to smaller doc_id; docs 4/5 never selected
    assert [x[1] for x in got] == [1, 2, 3]
    assert {x[0] for x in got} <= {0, 1, 2, 3}
    ids = [x[0] for x in got]
    assert ids == sorted(ids, key=lambda i: got[ids.index(i)][1])


def test_plan_shape(spark):
    d = _corpus(spark)
    tfit = hashed_bigram_fit(d.where(F.col("lang") == "en"))
    rfit = hashed_bigram_fit(d)
    sel = dsir_select(dsir_weights(d, bucket_scores(tfit, rfit)), k=2)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # the k-cut, not a global sort
    assert "BroadcastHashJoin" in plan      # B-row score table broadcast
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_pair_fit_equals_two_fits(spark):
    """hashed_bigram_fit_pair (one gram pass) produces the identical
    score table to the two-fit FULL-join path."""
    from pyspark.sql import functions as F

    from crawlspark.operators.dsir import (
        bucket_scores, bucket_scores_pair, hashed_bigram_fit,
        hashed_bigram_fit_pair,
    )

    docs = _corpus(spark)
    two = bucket_scores(
        hashed_bigram_fit(docs.where(F.col("lang") == "en")),
        hashed_bigram_fit(docs),
    )
    one = bucket_scores_pair(hashed_bigram_fit_pair(docs, F.col("lang") == "en"))
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, one.collect()))
