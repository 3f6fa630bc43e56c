"""LM quality-filter signals: bigram counts + OOV share edge cases the
sf corpora don't exercise (0/1-token docs, hapax thresholds)."""

from crawlspark.operators.lm import bigram_counts, oov_bigram_share


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "a b c a b"),     # reference doc: bigrams a-b(x2), b-c, c-a
            (1, "a b z z"),       # half in-ref (a-b), half OOV (b-z? no: a-b, b-z, z-z)
            (2, "solo"),          # 1 token → 0 bigrams
            (3, ""),              # empty string → 1 empty token → 0 bigrams
            (4, "q r"),           # fully OOV
        ],
        "doc_id long, text string",
    )


def test_bigram_counts_golden(spark):
    ref = bigram_counts(_docs(spark).where("doc_id = 0"))
    got = {r.bigram: r.n for r in ref.collect()}
    assert got == {"a b": 2, "b c": 1, "c a": 1}


def test_oov_share_goldens_and_null_for_no_evidence(spark):
    d = _docs(spark)
    ref = bigram_counts(d.where("doc_id = 0"))
    out = {r.doc_id: (r.n_bigrams, r.n_oov, r.oov_micro)
           for r in oov_bigram_share(d, ref).collect()}
    assert out[0] == (4, 0, 0)
    assert out[1] == (3, 2, 666666)        # a-b in ref; b-z, z-z OOV; exact int div
    assert out[2] == (0, 0, None)          # no bigrams → NULL, not 0
    assert out[3] == (0, 0, None)
    assert out[4] == (1, 1, 1_000_000)


def test_min_ref_count_ignores_hapaxes(spark):
    d = _docs(spark)
    ref = bigram_counts(d.where("doc_id = 0"))
    out = {r.doc_id: r.n_oov
           for r in oov_bigram_share(d, ref, min_ref_count=2).collect()}
    # only "a b" (n=2) stays in-vocab; doc 0's own b-c and c-a turn OOV
    assert out[0] == 2
    assert out[1] == 2


def test_ccnet_buckets_exact_thirds_and_null_handling(spark):
    from crawlspark.operators.lm import ccnet_buckets

    # en: 7 scored docs -> head 2 (r*3<=7), middle 2 (r*3<=14), tail 3;
    # fr: 3 scored -> one per bucket; one NULL-score doc per lang
    rows = (
        [(i, "en", i * 10) for i in range(7)]
        + [(7, "en", None)]
        + [(10, "fr", 5), (11, "fr", 5), (12, "fr", 99)]  # tie on score
        + [(13, "fr", None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, oov_micro long")
    out = {r.doc_id: r for r in ccnet_buckets(df).collect()}
    assert [out[i].bucket for i in range(7)] == [
        "head", "head", "middle", "middle", "tail", "tail", "tail"]
    assert out[7].bucket is None and out[7].lang_n == 7
    # fr: tie on score=5 broken by id -> 10 head, 11 middle, 12 tail
    assert (out[10].bucket, out[11].bucket, out[12].bucket) == (
        "head", "middle", "tail")
    assert out[13].bucket is None and out[13].lang_n == 3


def test_ccnet_buckets_sql_twin_matches(spark):
    import duckdb
    import pandas as pd

    from crawlspark.operators.lm import ccnet_buckets, ccnet_buckets_sql

    rows = (
        [(i, "en", (i * 37) % 11) for i in range(9)]
        + [(9, "en", None), (20, "fr", 1), (21, "fr", None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, oov_micro long")
    got = sorted(tuple(map(str, r)) for r in ccnet_buckets(df).collect())
    con = duckdb.connect()
    con.register(
        "scored_src",
        pd.DataFrame(rows, columns=["doc_id", "lang", "oov_micro"]).astype(
            {"oov_micro": "Int64"}
        ),
    )
    exp = sorted(
        tuple(map(str, r))
        for r in con.sql(
            ccnet_buckets_sql("SELECT * FROM scored_src")
        ).fetchall()
    )
    assert got == exp
