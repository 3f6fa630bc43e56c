"""Property tests (hypothesis): Spark text operators agree with plain
Python on arbitrary word sequences, and dedup primitives behave."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from crawlspark.operators.dedup import word_shingles
from crawlspark.operators.textops import fingerprint, token_count

WORD = st.text(alphabet="abcdefghij", min_size=1, max_size=6)
TEXTS = st.lists(WORD, min_size=1, max_size=30).map(" ".join)

PROP_SETTINGS = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=st.lists(TEXTS, min_size=1, max_size=6))
@PROP_SETTINGS
def test_token_count_matches_python(spark, texts):
    df = spark.createDataFrame([Row(i=i, text=t) for i, t in enumerate(texts)])
    got = {r["i"]: r["n"] for r in df.select("i", token_count("text").alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == len(t.split(" ")), repr(t)


@given(texts=st.lists(TEXTS, min_size=1, max_size=6))
@PROP_SETTINGS
def test_fingerprint_is_md5_of_lower(spark, texts):
    df = spark.createDataFrame([Row(i=i, text=t) for i, t in enumerate(texts)])
    got = {r["i"]: r["fp"] for r in df.select("i", fingerprint("text").alias("fp")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == hashlib.md5(t.lower().encode()).hexdigest()


@given(text=TEXTS, k=st.integers(min_value=2, max_value=4))
@PROP_SETTINGS
def test_word_shingles_match_python(spark, text, k):
    df = spark.createDataFrame([Row(text=text)])
    got = df.select(word_shingles("text", k).alias("sh")).first()["sh"]
    words = text.split(" ")
    exp = (
        [text] if len(words) < k
        else [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    )
    assert list(got) == exp


MIXED_WORD = st.text(alphabet="ab3.,!x9-", min_size=1, max_size=8)
MIXED_TEXTS = st.lists(MIXED_WORD, min_size=1, max_size=20).map(" ".join)


@given(texts=st.lists(MIXED_TEXTS, min_size=1, max_size=6))
@PROP_SETTINGS
def test_token_count_bpe_matches_python(spark, texts):
    import re

    from crawlspark.operators.textops import BPE_TOKEN_RE, token_count_bpe

    df = spark.createDataFrame([Row(i=i, text=t) for i, t in enumerate(texts)])
    got = {
        r["i"]: r["n"]
        for r in df.select("i", token_count_bpe("text").alias("n")).collect()
    }
    pat = re.compile(BPE_TOKEN_RE)
    for i, t in enumerate(texts):
        assert got[i] == len(pat.findall(t)), repr(t)


def test_simhash_udf_matches_hof_expression(spark):
    """simhash64_udf (Arrow/numpy) must be BIT-EXACT with the simhash64
    column expression — including multi-space runs (empty tokens), empty
    strings, non-ASCII, and nulls."""
    from pyspark.sql import Row

    from crawlspark.operators.textops import simhash64, simhash64_udf

    texts = ["hello world", "a  b", "", "café über  naïve", "x", None,
             "the quick brown fox jumps over the lazy dog " * 8,
             # one token repeated >32767 times: the int16 weight-multiply
             # overflow class (ADVICE r3) — must stay bit-exact
             "spam " * 40000 + "tail"]
    df = spark.createDataFrame([Row(i=i, t=t) for i, t in enumerate(texts)])
    rows = df.select(
        "i", simhash64(F.col("t")).alias("hof"), simhash64_udf(F.col("t")).alias("udf")
    ).collect()
    for r in rows:
        assert r.hof == r.udf, f"row {r.i}: {r.hof} != {r.udf}"


def test_repetition_profile_counts_duplicate_bigrams(spark):
    from pyspark.sql import Row

    from crawlspark.operators.textops import repetition_profile

    df = spark.createDataFrame([
        Row(doc_id=0, text="a b a b a b"),     # bigrams: ab,ba,ab,ba,ab -> 5 total, 2 distinct
        Row(doc_id=1, text="all words differ here"),  # 3 distinct of 3
        Row(doc_id=2, text="x"),               # shorter than n: 1 gram ("x"), 0 dup
    ])
    got = {r.doc_id: r for r in repetition_profile(df, n=2).collect()}
    assert (got[0].n_ngrams, got[0].n_distinct, got[0].dup_frac_micro) == (5, 2, 600000)
    assert (got[1].n_ngrams, got[1].n_distinct, got[1].dup_frac_micro) == (3, 3, 0)
    assert (got[2].n_ngrams, got[2].n_distinct, got[2].dup_frac_micro) == (1, 1, 0)


def test_top_token_fraction(spark):
    from pyspark.sql import Row

    from crawlspark.operators.textops import top_token_fraction

    df = spark.createDataFrame([
        Row(doc_id=0, text="spam spam spam eggs"),   # 3/4
        Row(doc_id=1, text="a b c d"),               # 1/4
    ])
    got = {r.doc_id: r.top_token_micro for r in top_token_fraction(df).collect()}
    assert got[0] == 750000
    assert got[1] == 250000


def test_redact_pii_goldens_and_duckdb_parity(spark):
    import duckdb
    from pyspark.sql import Row

    from crawlspark.operators.textops import redact_pii, redact_pii_sql

    texts = [
        "contact bob.smith+x@corp.example.com or (555) 123-4567 now",
        "server at 192.168.1.250 port 8080, backup 10.0.0.1",
        "call +1 555-867-5309 before 2024-03-01 05:12:00",
        "no pii here, id 123456789 and date 2024-03-01",
        "two mails a@b.co c@d.io one ip 8.8.8.8",
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    assert got[0].text_redacted == "contact [EMAIL] or [PHONE] now"
    assert (got[0].n_emails, got[0].n_phones, got[0].n_ips) == (1, 1, 0)
    assert got[1].text_redacted == "server at [IP] port 8080, backup [IP]"
    assert got[1].n_ips == 2
    assert got[2].text_redacted == "call [PHONE] before 2024-03-01 05:12:00"
    assert got[2].n_phones == 1
    assert got[3].text_redacted == texts[3]  # digit runs / dates untouched
    assert (got[3].n_emails, got[3].n_phones, got[3].n_ips) == (0, 0, 0)
    assert got[4].n_emails == 2 and got[4].n_ips == 1

    con = duckdb.connect()
    con.register("documents", df.toPandas())
    duck = sorted(map(tuple, con.sql(redact_pii_sql()).fetchall()))
    mine = sorted(
        (r.doc_id, r.text_redacted, r.n_emails, r.n_phones, r.n_ips)
        for r in redact_pii(df).collect()
    )
    assert mine == duck


# -- exact substring dedup vs a pure-Python model ---------------------------

def _py_duplicate_spans(texts: dict, k: int) -> dict:
    """Independent model: count k-grams corpus-wide, mark positions
    whose gram occurs >1 time, merge positions within k into spans."""
    from collections import Counter

    c = Counter()
    for t in texts.values():
        for i in range(len(t) - k + 1):
            c[t[i:i + k]] += 1
    spans = {}
    for did, t in texts.items():
        out = []
        for p in range(len(t) - k + 1):
            if c[t[p:p + k]] > 1:
                if out and p <= out[-1][1]:
                    out[-1][1] = p + k
                else:
                    out.append([p, p + k])
        if out:
            spans[did] = [tuple(x) for x in out]
    return spans


def _py_strip(texts: dict, spans: dict) -> dict:
    out = {}
    for did, t in texts.items():
        kept, cur = [], 0
        for s, e in spans.get(did, []):
            kept.append(t[cur:s])
            cur = e
        kept.append(t[cur:])
        out[did] = "".join(kept)
    return out


# tiny alphabet + short texts force genuine cross-doc and intra-doc
# duplicate k-grams (incl. repeated-char runs, the self-dup case)
SUBSTR_TEXTS = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=24), min_size=1, max_size=5
)


@given(texts=SUBSTR_TEXTS)
@PROP_SETTINGS
def test_duplicate_spans_matches_python_model(spark, texts):
    from crawlspark.operators.dedup import duplicate_spans

    k = 5
    tmap = dict(enumerate(texts))
    df = spark.createDataFrame(list(tmap.items()), "doc_id long, text string")
    got = {}
    for r in duplicate_spans(df, k=k).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        assert r.span_len == r.span_end - r.span_start
    got = {d: sorted(v) for d, v in got.items()}
    assert got == _py_duplicate_spans(tmap, k)


@given(texts=SUBSTR_TEXTS)
@PROP_SETTINGS
def test_strip_duplicate_spans_matches_python_model(spark, texts):
    from crawlspark.operators.dedup import strip_duplicate_spans

    k = 5
    tmap = dict(enumerate(texts))
    df = spark.createDataFrame(list(tmap.items()), "doc_id long, text string")
    expect = _py_strip(tmap, _py_duplicate_spans(tmap, k))
    rows = {r.doc_id: r for r in strip_duplicate_spans(df, k=k).collect()}
    assert set(rows) == set(tmap)
    for did, t in tmap.items():
        assert rows[did].text_clean == expect[did], (did, t)
        assert rows[did].removed_chars == len(t) - len(expect[did])


# -- JPEG codec roundtrip bounds ---------------------------------------------

@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    subsample=st.booleans(),
)
@PROP_SETTINGS
def test_jpeg_roundtrip_structural_properties(h, w, seed, subsample):
    """Arbitrary-size random images: encode→decode preserves dims and
    stays within quantization error of the q95 tables; bytes are a
    well-formed SOI..EOI stream. (No spark fixture — pure codec.)"""
    import numpy as np

    from crawlspark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    b = encode_jpeg(img, quality=95, subsample=subsample, restart_interval=2)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    w2, h2, out = decode_jpeg(b)
    assert (w2, h2) == (w, h) and out.shape == img.shape
    # q95 luma quant steps are tiny → luma must track closely ALWAYS
    # (it is never subsampled); RGB error under 4:2:0 on random colors
    # is dominated by legitimate chroma box-averaging (a 1x2 image
    # averages its only two chroma samples), so bound RGB for 4:4:4 only
    def luma(a):
        return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]

    y_err = np.abs(luma(out.astype(float)) - luma(img.astype(float))).mean()
    assert y_err < 12, y_err
    if not subsample:
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        assert err < 12, err
