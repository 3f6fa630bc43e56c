"""C4 line filter + Gopher quality rules: planted fixtures trip each
rule individually, so every flag is pinned non-vacuously (the synthetic
documents table can't exercise terminal punctuation or bullets — the
oracle-parity gate covers the corpus-parameterized variants instead)."""

from pyspark.sql import functions as F

from crawlspark.operators.webfilters import (
    c4_line_filter,
    gopher_quality_flags,
    lineify,
    lineify_sql,
)

GOOD_LINE = "This line has enough words and punctuation."


def _c4(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in c4_line_filter(df, **kw).collect()}


def test_c4_terminal_punctuation_rule(spark):
    out = _c4(spark, [(0, "no terminal punctuation here\n" + GOOD_LINE)])
    assert out[0]["n_lines"] == 2
    assert out[0]["n_kept"] == 1
    assert out[0]["kept_text"] == GOOD_LINE


def test_c4_all_terminal_marks_accepted(spark):
    text = 'Ends with period words here.\nEnds with bang words here!\nEnds with question words here?\nEnds with quote words here."'
    out = _c4(spark, [(0, text)])
    assert out[0]["n_kept"] == 4


def test_c4_min_words_per_line(spark):
    out = _c4(spark, [(0, "Too short.\n" + GOOD_LINE)])
    assert out[0]["n_kept"] == 1  # "Too short." has 2 words < 3


def test_c4_javascript_line_dropped_case_insensitive(spark):
    text = "Please enable JavaScript to continue.\n" + GOOD_LINE
    out = _c4(spark, [(0, text)])
    assert out[0]["n_kept"] == 1
    assert "JavaScript" not in out[0]["kept_text"]


def test_c4_blockword_is_word_bounded(spark):
    # 'javascripting' contains the substring but not the word
    text = "We discuss javascripting techniques at length here."
    out = _c4(spark, [(0, text)])
    assert out[0]["n_kept"] == 1


def test_c4_doc_level_drops(spark):
    five_good = "\n".join(
        f"Sentence number {w} is long enough." for w in ["one", "two", "three", "four", "five"]
    )
    out = _c4(
        spark,
        [
            (0, five_good),
            (1, five_good + "\nLorem Ipsum dolor sit amet."),
            (2, five_good + "\nCode sample: function() { return; }"),
            (3, "Only one good line here."),
        ],
    )
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False  # lorem ipsum, case-insensitive
    assert out[2]["keep"] is False  # curly brace
    assert out[3]["keep"] is False  # < 5 kept lines
    # line rules still ran on dropped docs
    assert out[1]["n_kept"] == 6


def test_c4_empty_kept_text_is_empty_string(spark):
    out = _c4(spark, [(0, "nothing survives\nhere either")])
    assert out[0]["n_kept"] == 0
    assert out[0]["kept_text"] == ""


GOPHER_PASS = (
    "the quick brown fox jumps over and over with plenty of good words "
    "to pass all of the rules just fine today " * 3
).strip()


def _gopher(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in gopher_quality_flags(df, **kw).collect()}


def test_gopher_passing_doc(spark):
    out = _gopher(spark, [(0, GOPHER_PASS)])
    r = out[0]
    assert r["keep"] is True
    assert r["n_words"] >= 50
    assert 3_000_000 <= r["mean_word_len_micro"] <= 10_000_000
    assert r["stop_hits"] >= 2


def test_gopher_word_count_bounds(spark):
    out = _gopher(spark, [(0, "the of and with few words")])
    assert out[0]["n_words"] == 6
    assert out[0]["keep"] is False


def test_gopher_mean_word_length(spark):
    # 60 two-char words: mean 2.0 < 3.0 minimum
    short = ("of to " * 30).strip()
    out = _gopher(spark, [(0, short)])
    assert out[0]["mean_word_len_micro"] == 2_000_000
    assert out[0]["keep"] is False


def test_gopher_symbol_ratio(spark):
    base = GOPHER_PASS
    spam = base + " " + "# " * 10 + "..."
    out = _gopher(spark, [(0, base), (1, spam)])
    assert out[0]["symbol_ratio_micro"] == 0
    assert out[1]["symbol_ratio_micro"] > 100_000
    assert out[1]["keep"] is False


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join("- " + GOPHER_PASS for _ in range(3))
    ellipsis = "\n".join(GOPHER_PASS + "..." for _ in range(2)) + "\n" + GOPHER_PASS
    out = _gopher(spark, [(0, bullets), (1, ellipsis)])
    assert out[0]["bullet_line_frac_micro"] == 1_000_000
    assert out[0]["keep"] is False
    assert out[1]["ellipsis_line_frac_micro"] == 666_666  # floor(2e6/3)
    assert out[1]["keep"] is False


def test_gopher_alpha_word_fraction(spark):
    digits = ("1234 " * 60).strip() + " the of and with"
    out = _gopher(spark, [(0, digits)])
    assert out[0]["alpha_word_frac_micro"] < 800_000
    assert out[0]["keep"] is False


def test_gopher_stopword_presence(spark):
    # enough words, right lengths, but zero Gopher stopwords
    nostop = ("brown quick foxes jumping around happily " * 10).strip()
    out = _gopher(spark, [(0, nostop)])
    assert out[0]["stop_hits"] == 0
    assert out[0]["keep"] is False
    # custom corpus-aware set rescues it
    out2 = _gopher(spark, [(0, nostop)], stopwords=("brown", "quick"))
    assert out2[0]["stop_hits"] == 2


def test_lineify_spark_duckdb_parity(spark):
    import duckdb

    text = "a b c d e f g h i j k l m n o p"
    s = spark.range(1).select(lineify(F.lit(text), 7).alias("l")).collect()[0]["l"]
    con = duckdb.connect()
    d = con.sql("SELECT " + lineify_sql(f"'{text}'", 7)).fetchone()[0]
    assert s == d == "a b c d e f g\nh i j k l m n\no p"


def test_filters_stay_whole_stage_codegen(spark):
    """No UDF, no shuffle: the physical plan for both filters over a
    parquet-less local relation must be a single projection — any
    Exchange or BatchEvalPython node is a scale regression."""
    df = spark.createDataFrame([(0, GOPHER_PASS)], ["doc_id", "text"])
    for out in (c4_line_filter(df), gopher_quality_flags(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
