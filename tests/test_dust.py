"""DUST rule mining (operators/dust.py): planted evidence, acceptance
criteria, application, DuckDB twin parity."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from crawlspark.operators.dust import (
    apply_dust_rules,
    mine_dust_rules,
    mine_dust_rules_sql,
    parse_url_params,
)


def _observed():
    rows = []
    # host a: sid is content-irrelevant (fp depends on id only); both the
    # with-sid and without-sid forms were observed -> 8 agreeing pairs
    for i in range(4):
        fp = f"fp-a-{i}"
        rows.append((f"http://a.com/x?id={i}", fp))
        for s in range(2):
            rows.append((f"http://a.com/x?sid={s}&id={i}", fp))
    # host a: v matters (fp depends on v); the without-v form exists, so
    # pairs form and DISAGREE -> rule rejected despite support
    rows.append(("http://a.com/y", "fp-y-base"))
    for v in range(3):
        rows.append((f"http://a.com/y?v={v}", f"fp-y-{v}"))
    # host a: rare param agrees but support < 3 -> rejected
    rows.append(("http://a.com/z?id=9", "fp-z"))
    rows.append(("http://a.com/z?id=9&rare=1", "fp-z"))
    # host b: sid MATTERS here (per-host rules are the point)
    rows.append(("http://b.com/x?id=0", "fp-b-0"))
    rows.append(("http://b.com/x?id=0&sid=1", "fp-b-OTHER"))
    return rows


def test_mined_rules_acceptance_matrix(spark):
    obs = spark.createDataFrame(_observed(), "url string, content_fp string")
    rules = {
        (r.host, r.param): r for r in mine_dust_rules(obs, min_support=3).collect()
    }
    sid_a = rules[("a.com", "sid")]
    assert sid_a.accepted and sid_a.n_pairs == 8 and sid_a.n_agree == 8
    v_a = rules[("a.com", "v")]
    assert not v_a.accepted and v_a.n_pairs == 3 and v_a.n_agree == 0
    rare = rules[("a.com", "rare")]
    assert not rare.accepted and rare.n_pairs == 1 and rare.n_agree == 1
    sid_b = rules[("b.com", "sid")]
    assert not sid_b.accepted and sid_b.n_agree == 0
    # id is never a candidate: no observed url lacks it on those bases
    assert ("a.com", "id") not in rules and ("b.com", "id") not in rules


def test_apply_strips_only_accepted_host_rules(spark):
    obs = spark.createDataFrame(_observed(), "url string, content_fp string")
    rules = mine_dust_rules(obs, min_support=3)
    frontier = spark.createDataFrame(
        [
            ("http://a.com/x?sid=7&id=3",),
            ("http://a.com/x?id=3&sid=0",),      # same alias class
            ("http://a.com/y?v=2",),             # v rule rejected: kept
            ("http://b.com/x?sid=1&id=0",),      # sid matters on b: kept
            ("http://a.com/nop",),               # no query: unchanged
        ],
        "url string",
    )
    out = {r.url: r.dust_url for r in apply_dust_rules(frontier, rules).collect()}
    assert out["http://a.com/x?sid=7&id=3"] == "http://a.com/x?id=3"
    assert out["http://a.com/x?id=3&sid=0"] == "http://a.com/x?id=3"
    assert out["http://a.com/y?v=2"] == "http://a.com/y?v=2"
    assert out["http://b.com/x?sid=1&id=0"] == "http://b.com/x?id=0&sid=1"
    assert out["http://a.com/nop"] == "http://a.com/nop"


def test_parse_canonicalizes_param_order(spark):
    df = spark.createDataFrame(
        [("http://h.com/p?b=2&a=1",), ("http://h.com/p?a=1&b=2",)], "url string"
    )
    canons = {r.canon for r in parse_url_params(df).collect()}
    assert canons == {"http://h.com/p?a=1&b=2"}


def test_duckdb_twin_matches(spark):
    obs = spark.createDataFrame(_observed(), "url string, content_fp string")
    got = sorted(tuple(map(str, r)) for r in mine_dust_rules(obs).collect())
    con = duckdb.connect()
    con.register("obs_v", pd.DataFrame(_observed(), columns=["url", "content_fp"]))
    exp = sorted(
        tuple(map(str, r))
        for r in con.sql(mine_dust_rules_sql("obs_v")).fetchall()
    )
    assert got == exp
