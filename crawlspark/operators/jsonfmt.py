"""JSON rewrite modes — the reference's ``RewriteJson`` presentation
layer (O3, ``Logic/JsonFileHelper.cs:47-89``, modes
``Logic/JsonFormatting.cs:6-27``) re-expressed over a DataFrame column
of JSON documents instead of files on disk.

Reference semantics pinned here:

* ``unchanged`` — no-op, ``rewritten = false`` (JsonFileHelper.cs:52-53).
* ``pretty`` — always re-serialize indented (JsonFileHelper.cs:62-64).
* ``pretty_when_unindented`` — probe the document head; re-serialize
  indented only when it does NOT already start with ``{`` or ``[``
  followed by newline(s) + indent (the reference regex
  ``^({|[)[\\r\\n]+ +`` over the first 4 chars,
  JsonFileHelper.cs:55-61,76-83).
* ``minify`` — always re-serialize compact (JsonFileHelper.cs:66-68).

The rewrite round-trips through a parser with key order preserved and
date strings untouched (the reference uses ``JToken`` +
``DateParseHandling.None``, JsonFileHelper.cs:86-89; Python dicts
preserve insertion order and ``json`` never munges string values).
Invalid JSON raises, as the reference's parser throws.

Spark-first split: the head-probe gate is a pure JVM regexp column (no
Python round-trip for already-indented rows); only rows that actually
need re-serialization pass through the Arrow-batched pandas UDF.
Minify output is byte-identical to DuckDB's
``json_extract(doc::JSON, '$')::VARCHAR`` (both yyjson and cpython emit
``,``/``:`` separators, no trailing space, unescaped non-ASCII), which
carries the exact cross-engine oracle for this operator.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

MODES = ("unchanged", "pretty", "pretty_when_unindented", "minify")

# JsonFileHelper.cs:57 — the probe reads 4 chars and tests
# ^({|[)[\r\n]+ +  (object/array opener, newline run, at least one space)
_INDENTED_HEAD_RE = "^[\\{\\[][\\r\\n]+ +"


def is_indented(col: Column | str) -> Column:
    """JVM-side twin of the reference's first-4-chars indentation probe
    (JsonFileHelper.cs:55-61, 76-83). Codegen'd; no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, 4).rlike(_INDENTED_HEAD_RE)


@pandas_udf(StringType())
def json_pretty_udf(s: pd.Series) -> pd.Series:
    """Indented re-serialization (Formatting.Indented analog): 2-space
    indent, key order preserved, non-ASCII left unescaped."""
    return s.map(
        lambda v: None
        if v is None
        else json.dumps(json.loads(v), indent=2, ensure_ascii=False)
    )


@pandas_udf(StringType())
def json_minify_udf(s: pd.Series) -> pd.Series:
    """Compact re-serialization (Formatting.None analog). Byte-equal to
    DuckDB ``json_extract(v::JSON,'$')::VARCHAR`` — the oracle relies
    on this."""
    return s.map(
        lambda v: None
        if v is None
        else json.dumps(json.loads(v), separators=(",", ":"), ensure_ascii=False)
    )


def rewrite_json(
    df: DataFrame,
    col: str = "json",
    *,
    mode: str = "pretty_when_unindented",
    out_col: str | None = None,
    flag_col: str | None = None,
) -> DataFrame:
    """Rewrite a JSON string column per the reference's formatting mode,
    adding ``out_col`` (the possibly-rewritten document) and
    ``flag_col`` (the reference's bool return: did a rewrite happen).

    Null documents pass through with ``rewritten = false``; invalid
    JSON raises inside the UDF (the reference's parser throws too) —
    pre-filter with a validity check if the corpus may contain garbage.
    """
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    out_col = out_col or f"{col}_fmt"
    flag_col = flag_col or f"{out_col}_rewritten"
    c = F.col(col)
    if mode == "unchanged":
        return df.withColumns({out_col: c, flag_col: F.lit(False)})
    if mode == "minify":
        return df.withColumns(
            {out_col: json_minify_udf(c), flag_col: c.isNotNull()}
        )
    if mode == "pretty":
        return df.withColumns(
            {out_col: json_pretty_udf(c), flag_col: c.isNotNull()}
        )
    # pretty_when_unindented. Spark extracts Python UDFs out of CASE WHEN
    # and evaluates them eagerly on every row, so a `F.when(needs,
    # udf(c))` gate is ineffective: indented rows would still round-trip
    # through Python, and an indented-but-INVALID document would raise
    # inside the UDF where the reference's probe-then-skip never parses
    # it (JsonFileHelper.cs:55-61). Split-and-union instead: only rows
    # the JVM probe says need rewriting ever reach the UDF; probe-skipped
    # rows are passed through verbatim, unparsed — exactly the reference.
    needs = c.isNotNull() & ~is_indented(c)
    rewritten = df.where(needs).withColumns(
        {out_col: json_pretty_udf(c), flag_col: F.lit(True)}
    )
    passed = df.where(~needs).withColumns({out_col: c, flag_col: F.lit(False)})
    return rewritten.unionByName(passed)
