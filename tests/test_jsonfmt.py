"""O3 JSON rewrite modes (JsonFileHelper.cs:47-89) — mode semantics,
reference head-probe parity, and DuckDB minify byte-parity."""

import json

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from crawlspark.operators.jsonfmt import MODES, is_indented, rewrite_json

DOCS = [
    '{"a": 1, "b": [1, 2], "c": {"d": "café"}}',   # unindented object
    '[1, 2, {"k": null}]',                               # unindented array
    '{\n  "a": 1\n}',                                    # already indented (LF)
    '{\r\n  "a": 1\r\n}',                                # already indented (CRLF)
    '{"t": "2024-01-01T00:00:00Z", "f": 1.5}',           # date string untouched
]


def _df(spark, docs=DOCS):
    rows = [Row(i=i, j=d) for i, d in enumerate(docs)] + [Row(i=len(docs), j=None)]
    return spark.createDataFrame(rows)


def test_unchanged_is_identity(spark):
    out = rewrite_json(_df(spark), "j", mode="unchanged").orderBy("i").collect()
    assert [r.j_fmt for r in out] == DOCS + [None]
    assert all(r.j_fmt_rewritten is False for r in out)


def test_pretty_matches_python_golden_and_preserves_key_order(spark):
    out = rewrite_json(_df(spark), "j", mode="pretty").orderBy("i").collect()
    for r in out[:-1]:
        assert r.j_fmt == json.dumps(
            json.loads(DOCS[r.i]), indent=2, ensure_ascii=False
        )
        assert r.j_fmt_rewritten is True
        # key order preserved through the round-trip (JToken analog)
        assert list(json.loads(r.j_fmt)) == list(json.loads(DOCS[r.i]))
    assert out[-1].j_fmt is None and out[-1].j_fmt_rewritten is False
    # explicit golden for the first doc
    assert out[0].j_fmt == (
        '{\n  "a": 1,\n  "b": [\n    1,\n    2\n  ],'
        '\n  "c": {\n    "d": "café"\n  }\n}'
    )


def test_pretty_when_unindented_gate_matches_reference_probe(spark):
    # JsonFileHelper.cs:55-61: rewrite only when the first 4 chars do
    # NOT match ^({|[)[\r\n]+ +  — both LF and CRLF heads count as
    # already-indented and must pass through untouched.
    out = rewrite_json(_df(spark), "j", mode="pretty_when_unindented").orderBy("i").collect()
    assert out[0].j_fmt_rewritten is True and out[1].j_fmt_rewritten is True
    assert out[2].j_fmt_rewritten is False and out[2].j_fmt == DOCS[2]
    assert out[3].j_fmt_rewritten is False and out[3].j_fmt == DOCS[3]
    assert out[4].j_fmt_rewritten is True
    # rewriting is idempotent: a second pass touches nothing
    again = rewrite_json(
        _df(spark, [r.j_fmt for r in out[:-1]]), "j", mode="pretty_when_unindented"
    ).collect()
    assert all(r.j_fmt_rewritten is False for r in again)


def test_pretty_when_unindented_skips_indented_invalid_without_parsing(spark):
    # The reference probes the head and returns false WITHOUT parsing
    # (JsonFileHelper.cs:55-61): an indented-but-invalid document must
    # pass through verbatim, not raise inside the rewrite UDF. This
    # pins the split-union plan (probe-skipped rows never reach Python).
    bad = '{\n  "a": oops not json'
    out = rewrite_json(
        _df(spark, DOCS + [bad]), "j", mode="pretty_when_unindented"
    ).orderBy("i").collect()
    row = out[len(DOCS)]
    assert row.j_fmt == bad and row.j_fmt_rewritten is False


def test_is_indented_column_is_jvm_side(spark):
    # the gate must stay a codegen'd expression — no Python eval node
    plan = (
        _df(spark)
        .select(is_indented("j"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan


def test_minify_idempotent_and_normalizes_pretty(spark):
    pretty = [json.dumps(json.loads(d), indent=2) for d in DOCS]
    out = rewrite_json(_df(spark, pretty), "j", mode="minify").orderBy("i").collect()
    for r in out[:-1]:
        compact = json.dumps(
            json.loads(DOCS[r.i]), separators=(",", ":"), ensure_ascii=False
        )
        assert r.j_fmt == compact
        assert json.loads(r.j_fmt) == json.loads(DOCS[r.i])


def test_minify_byte_parity_with_duckdb(spark):
    # the cross-engine contract the registered oracle depends on
    out = rewrite_json(_df(spark), "j", mode="minify").orderBy("i").collect()
    con = duckdb.connect()
    for r in out[:-1]:
        duck = con.sql(
            "SELECT json_extract(?::JSON, '$')::VARCHAR", params=[DOCS[r.i]]
        ).fetchone()[0]
        assert r.j_fmt == duck, f"doc {r.i}: {r.j_fmt!r} != {duck!r}"


def test_bad_mode_rejected(spark):
    with pytest.raises(ValueError):
        rewrite_json(_df(spark), "j", mode="compact")
    assert set(MODES) == {"unchanged", "pretty", "pretty_when_unindented", "minify"}
