"""Sequence packing: assign documents to fixed-token training examples.

GPT-style pretraining concatenates documents into a token stream and
cuts it into fixed-length examples; the data pipeline's job is to
decide, deterministically and in parallel, which example ("bin") each
document's first token lands in. This is the distributed shape of that
step:

  * documents are ordered by (md5(id), id) — a deterministic shuffle
    that decorrelates adjacent docs (packing correlated neighbors into
    one example hurts training);
  * the stream is SHARDED by the first hex nibble of the hash (16
    shards): each shard is an independent token stream, so the
    cumulative sum — the one inherently sequential step — parallelizes
    across shards while staying reproducible run-to-run;
  * within a shard, ``tok_offset`` = exclusive running sum of token
    counts and ``bin`` = tok_offset DIV max_tokens. A doc may straddle
    a bin boundary (it is split across examples at training time —
    standard for GPT-style packing).

Scale: ONE shuffle (by shard) + a running-sum window per shard. With 16
shards a 10^10-doc corpus puts ~6·10^8 docs per shard through a single
ordered window — at that scale raise the shard-nibble width (two hex
chars = 256 shards); the semantics and oracle change only in the
substring length. The window carries (id, n_tok) only, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_pack(
    docs: DataFrame,
    max_tokens: int = 512,
    id_col: str = "doc_id",
    tok_col: str = "n_tok",
) -> DataFrame:
    """(id, shard, tok_offset, bin) — deterministic packing assignment.
    ``docs`` must already carry a token count column (``tok_col``)."""
    h = F.md5(F.col(id_col).cast("string"))
    base = docs.select(
        F.col(id_col),
        F.col(tok_col).cast("long").alias("n_tok"),
        h.alias("h"),
        F.substring(h, 1, 1).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.select(
        id_col,
        "shard",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("tok_offset"),
        F.expr(f"coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY h, {id_col} "
               f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
               f"DIV {max_tokens}").alias("bin"),
    )


def sequence_pack_sql(
    max_tokens: int = 512,
    table: str = "documents",
    id_col: str = "doc_id",
    tok_expr: str = "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)",
) -> str:
    """DuckDB twin of :func:`sequence_pack` (token expr defaults to the
    whitespace token_count twin)."""
    return f"""
      WITH b AS (
        SELECT {id_col},
               {tok_expr} AS n_tok,
               md5(CAST({id_col} AS VARCHAR)) AS h,
               substr(md5(CAST({id_col} AS VARCHAR)), 1, 1) AS shard
        FROM {table})
      SELECT {id_col}, shard,
             CAST(coalesce(sum(n_tok) OVER w, 0) AS BIGINT) AS tok_offset,
             CAST(coalesce(sum(n_tok) OVER w, 0) // {max_tokens} AS BIGINT) AS bin
      FROM b
      WINDOW w AS (PARTITION BY shard ORDER BY h, {id_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """
