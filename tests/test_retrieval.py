"""Inverted index + exact-integer retrieval (operators/retrieval.py):
postings shape, python-reference score parity, ranking behavior,
DuckDB twin."""

import duckdb
import pandas as pd

from crawlspark.operators.retrieval import (
    build_postings,
    retrieve_topk,
    retrieve_topk_sql,
)


def _corpus():
    return [
        (0, "apple banana apple cherry"),
        (1, "apple apple apple apple apple apple"),   # tf-saturation target
        (2, "banana cherry durian"),
        (3, "cherry cherry cherry"),
        (4, "unrelated words only here"),
        (5, "apple"),                                  # short doc, low dl
    ]


def _queries():
    return [(100, "apple"), (101, "banana cherry"), (102, "apple apple")]


def _retrieve_py(corpus, queries, k=5):
    """Independent dict/int reference of the documented score."""
    postings, dl = {}, {}
    for i, text in corpus:
        toks = [t for t in text.split(" ") if t]
        dl[i] = len(toks)
        for t in toks:
            postings.setdefault(t, {}).setdefault(i, 0)
            postings[t][i] += 1
    n = len([i for i in dl if dl[i] > 0])
    s = sum(dl.values())
    out = []
    for qid, qtext in queries:
        scores = {}
        for t in set(x for x in qtext.split(" ") if x):
            if t not in postings:
                continue
            idf = n * 1000 // len(postings[t])
            for i, tf in postings[t].items():
                dlnorm = (1000 * dl[i] * n) // s
                c = idf * (22000 * tf) // (10000 * tf + 3000 + 9 * dlnorm)
                scores[i] = scores.get(i, 0) + c
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out += [(qid, r + 1, i, sc) for r, (i, sc) in enumerate(ranked)]
    return sorted(out)


def test_postings_shape(spark):
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string")
    p = {(r.term, r.id): (r.tf, r.dl) for r in build_postings(docs).collect()}
    assert p[("apple", 0)] == (2, 4)
    assert p[("apple", 1)] == (6, 6)
    assert p[("cherry", 3)] == (3, 3)
    assert ("", 0) not in p


def test_scores_match_python_reference_and_rank_sanely(spark):
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string")
    qs = spark.createDataFrame(_queries(), "query_id long, qtext string")
    got = sorted(
        (r.query_id, r.rank, r.doc_id, r.score_micro)
        for r in retrieve_topk(docs, qs, k=5).collect()
    )
    assert got == _retrieve_py(_corpus(), _queries(), k=5)
    by_q = {}
    for qid, rank, i, sc in got:
        by_q.setdefault(qid, []).append((rank, i, sc))
    # tf-saturation: doc 1 (6x apple, long) wins over doc 5 (1x, tiny),
    # but by less than 6x the score
    apple = {i: sc for _, i, sc in by_q[100]}
    assert max(apple, key=apple.get) == 1
    assert apple[1] < 6 * apple[5]
    # repeated query terms count once: q102 == q100
    assert [x[1:] for x in by_q[102]] == [x[1:] for x in by_q[100]]
    # multi-term query sums per-term contributions: doc 2 has both
    assert by_q[101][0][1] == 2


def test_duckdb_twin_matches(spark):
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string")
    qs = spark.createDataFrame(_queries(), "query_id long, qtext string")
    got = sorted(tuple(map(str, r)) for r in retrieve_topk(docs, qs, k=3).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(_corpus(), columns=["doc_id", "text"]))
    con.register("qsrc", pd.DataFrame(_queries(), columns=["query_id", "qtext"]))
    exp = sorted(
        tuple(map(str, r))
        for r in con.sql(
            retrieve_topk_sql("SELECT query_id, qtext FROM qsrc", k=3)
        ).fetchall()
    )
    assert got == exp
