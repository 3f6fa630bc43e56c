"""Host-level curation rollup: planted-fixture exactness (corpus-wide
dup marking, micro floors, deterministic language tie-break, admission
gate) plus the plan-shape guarantee that the text column never reaches
an exchange."""

from pyspark.sql import functions as F

from crawlspark.operators.hoststats import host_curation_stats


def _docs(spark):
    # host a: 4 docs — two share a full-text duplicate that ALSO lives
    # on host b (corpus-wide marking must count all three), langs
    # 3 en / 1 de. host b: 4 docs — 2 en / 2 fr language TIE (top must
    # break to 'en', the lexicographically smaller), one doc in the
    # cross-host dup group.
    rows = [
        ("a", "dup dup dup", "en"),
        ("a", "dup dup dup", "en"),
        ("a", "three tokens here", "en"),
        ("a", "zwei worte", "de"),
        ("b", "dup dup dup", "fr"),
        ("b", "un deux trois quatre", "fr"),
        ("b", "five little words right here", "en"),
        ("b", "six more little words right here", "en"),
    ]
    return spark.createDataFrame(rows, "source string, text string, lang string")


def test_host_curation_stats_exact(spark):
    got = {
        r.host: r.asDict()
        for r in host_curation_stats(
            _docs(spark), min_docs=4, max_dup_share_micro=400_000
        ).collect()
    }
    a, b = got["a"], got["b"]
    # host a: dup group of 3 corpus-wide -> both a-copies marked
    assert (a["n_docs"], a["n_dup_docs"], a["dup_share_micro"]) == (4, 2, 500_000)
    assert a["total_tokens"] == 3 + 3 + 3 + 2
    assert a["mean_tokens_micro"] == (11 * 1_000_000) // 4
    assert (a["top_lang"], a["top_lang_share_micro"]) == ("en", 750_000)
    assert a["keep"] is False  # dup share 50% > 40% gate
    # host b: one marked dup, 2-2 language tie -> 'en'
    assert (b["n_docs"], b["n_dup_docs"], b["dup_share_micro"]) == (4, 1, 250_000)
    assert (b["top_lang"], b["top_lang_share_micro"]) == ("en", 500_000)
    assert b["keep"] is True


def test_min_docs_gate(spark):
    got = {r.host: r.keep for r in host_curation_stats(_docs(spark), min_docs=5).collect()}
    assert got == {"a": False, "b": False}


def test_prefix_key_collapses_boilerplate(spark):
    rows = [
        ("h", "PREFIX--" + "x" * 10 + " tail one", "en"),
        ("h", "PREFIX--" + "x" * 10 + " tail two", "en"),
        ("h", "totally different body", "en"),
    ]
    df = spark.createDataFrame(rows, "source string, text string, lang string")
    full = host_curation_stats(df).collect()[0]
    assert full.n_dup_docs == 0  # exact texts all distinct
    pref = host_curation_stats(df, key_prefix_len=12).collect()[0]
    assert pref.n_dup_docs == 2  # shared 12-char boilerplate prefix


def test_text_never_shuffled(spark):
    plan = host_curation_stats(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    # every exchange's output must be key/host/lang/tokens — the text
    # column is projected away before the first exchange
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
