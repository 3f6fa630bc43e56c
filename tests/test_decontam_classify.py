"""Unit goldens for decontamination and hashed-classifier inference —
independent pure-Python derivations, plus plan-shape pins (the oracle
parity suite covers the DuckDB twins corpus-wide)."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F


def _shingle_hashes_py(text: str, k: int) -> set:
    toks = text.split(" ")
    if len(toks) < k:
        grams = [text]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return {int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams}


def test_decontaminate_golden(spark):
    from crawlspark.operators.decontam import decontaminate

    docs = spark.createDataFrame([
        Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=1, text="a quick brown fox jumps over a fence"),   # shares 3-gram
        Row(doc_id=2, text="completely different words here now"),
        Row(doc_id=3, text="short"),                                  # < k words
    ])
    bench = docs.where(F.col("doc_id") == 0)
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, k=3).collect()}
    bench_sh = _shingle_hashes_py("the quick brown fox jumps over the lazy dog", 3)
    for i, text in [(0, "the quick brown fox jumps over the lazy dog"),
                    (1, "a quick brown fox jumps over a fence"),
                    (2, "completely different words here now"),
                    (3, "short")]:
        sh = _shingle_hashes_py(text, 3)
        assert out[i]["n_shingles"] == len(sh)
        assert out[i]["n_hit"] == len(sh & bench_sh), i
        assert out[i]["contaminated"] == (len(sh & bench_sh) > 0)
    assert out[0]["contaminated"] and out[1]["contaminated"]
    assert not out[2]["contaminated"] and not out[3]["contaminated"]


def test_decontaminate_benchmark_side_broadcasts(spark):
    """The corpus side must NOT shuffle for the semi-join: the benchmark
    shingle set broadcasts (BroadcastHashJoin/BroadcastExchange), so the
    only Exchange keys on the doc id for the hit-count aggregate."""
    from crawlspark.operators.decontam import decontaminate

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.lit("w"), F.col("id").cast("string"), F.lit("x y z")).alias("text"),
    )
    bench = docs.where(F.col("doc_id") % 50 == 0)
    plan = decontaminate(docs, bench, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def _classifier_py(text: str):
    score = 0
    toks = text.split(" ")
    for t in toks:
        b = int(hashlib.md5(t.encode()).hexdigest()[:7], 16) % 1024
        score += (b * 2654435761) % 65536 - 32768
    return len(toks), score


def test_classifier_score_golden(spark):
    from crawlspark.operators.classify import classifier_score

    texts = [
        "alpha beta gamma delta",
        "alpha alpha alpha",          # multiplicity counts
        "one",
        "x  y",                       # empty token from double space
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    out = {r["doc_id"]: r for r in classifier_score(df).collect()}
    for i, t in enumerate(texts):
        n, s = _classifier_py(t)
        assert (out[i]["n_tok"], out[i]["score"]) == (n, s), (i, t)
        assert out[i]["keep"] == (s > 0)


def test_classifier_score_single_shuffle_partial_agg(spark):
    """One exchange (by doc id), preceded by a map-side partial
    aggregate — the shuffle carries per-doc partials, not tokens."""
    from crawlspark.operators.classify import classifier_score

    df = spark.range(100).select(
        (F.col("id") % 30).alias("doc_id"), F.lit("a b c d e").alias("text")
    )
    plan = classifier_score(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "partial_sum" in plan, plan
