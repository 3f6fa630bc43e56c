"""Winnowing fingerprints (MOSS): the shared-substring guarantee,
local-overlap detection that whole-doc similarity misses, bucket cap."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from crawlspark.operators.dedup import winnow_overlap_pairs
from crawlspark.operators.textops import winnow_fingerprints, winnow_fingerprints_sql

K, W = 8, 4


def _fps(spark, docs):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(docs)])
    out = winnow_fingerprints(df, k=K, w=W).collect()
    by_doc: dict[int, set] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    return by_doc


def test_shared_substring_guarantees_shared_fingerprint(spark):
    # any common substring of length >= k+w-1 must produce >= 1 shared
    # selected fingerprint (the winnowing guarantee)
    quote = "zq4 shared passage xv9"          # len 22 >= K+W-1
    a = "left context words here " + quote + " and a tail"
    b = "completely different opening text " + quote + " other ending"
    fps = _fps(spark, [a, b])
    assert fps[0] & fps[1], "guaranteed shared fingerprint missing"


def test_disjoint_texts_share_nothing(spark):
    fps = _fps(spark, ["aaaa bbbb cccc dddd eeee", "ffff gggg hhhh iiii jjjj"])
    assert not (fps[0] & fps[1])


def test_short_doc_yields_single_whole_text_gram(spark):
    fps = _fps(spark, ["tiny"])               # shorter than k
    assert len(fps[0]) == 1


def test_overlap_pairs_catch_containment(spark):
    # doc 2 contains doc 0's middle — local overlap, low whole-doc
    # Jaccard; winnowing must pair them, and the unrelated doc pairs
    # with nobody
    core = "the quoted paragraph that travels between documents"
    docs = [
        "intro " + core + " outro",
        "unrelated content entirely made of other words and phrases",
        "different frame before " + core + " different frame after",
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(docs)])
    pairs = {
        (r.id_a, r.id_b)
        for r in winnow_overlap_pairs(df, k=K, w=W, min_shared=2).collect()
    }
    assert (0, 2) in pairs
    assert not any(1 in p for p in pairs)


def test_bucket_cap_drops_hot_fingerprints(spark):
    # 30 docs sharing only a common template prefix: every shared gram
    # lands in all 30 docs, so uncapped pairs everyone and cap=10 drops
    # the hot fps and pairs nobody. Tails are per-doc unique letter
    # patterns with no 8-char substring in common.
    docs = [
        "common template prefix text "
        + (chr(97 + i // 26) + chr(97 + i % 26)) * 4
        for i in range(30)
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(docs)])
    uncapped = winnow_overlap_pairs(df, k=K, w=W, min_shared=1).count()
    capped = winnow_overlap_pairs(df, k=K, w=W, min_shared=1, max_bucket_size=10).count()
    # uncapped: the hot template fps pair every doc with every other.
    # capped: hot fps drop; only the few prefix grams that happened to
    # win window-selection in < cap docs still pair — a small residue
    # (selection frequency != gram frequency), not a dense clique.
    assert uncapped == 30 * 29 // 2
    assert capped < uncapped * 0.2


def test_duckdb_fingerprint_parity_small(spark):
    docs = ["alpha beta gamma delta epsilon", "beta gamma delta epsilon zeta"]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(docs)])
    s = sorted((r.doc_id, r.fp) for r in winnow_fingerprints(df, k=K, w=W).collect())
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    d = sorted(map(tuple, con.sql(winnow_fingerprints_sql(k=K, w=W)).fetchall()))
    assert s == d
