"""Document chunking: sliding token windows for embedding pipelines.

Embedding models cap input length, so every retrieval / semantic-dedup
/ RAG pipeline runs documents through a chunker first: fixed-size token
windows with overlap, chunk provenance kept so hits map back to their
document and offset. The whole computation is per-row array algebra —
stage the token array once, compute window starts with ``sequence``
(stride = chunk − overlap), slice per start — then one explode; no
shuffle, no UDF.

Start generation: ``sequence(1, greatest(n - overlap, 1), stride)``.
The last window may be shorter than ``chunk_tokens``; the upper bound
``n - overlap`` guarantees a late window always contains at least one
NEW token (no window fully contained in its predecessor), while the
``greatest(…, 1)`` floor keeps exactly one window for docs shorter than
the overlap — including the empty-text doc, which chunks to its single
empty token (words_of's split-on-space semantics, same as token_count).

Scale shape: output rows ≈ input tokens / stride — the explode is the
point (downstream embeds per chunk); everything else is narrow. The
chunk text duplicates ~overlap/stride of the corpus bytes, the
standard, accepted cost of overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark.operators.textops import words_of


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, chunk_idx, start_tok, n_tok, chunk_text)`` — one row per
    sliding window; ``start_tok`` is 1-based, ``chunk_idx`` 0-based,
    ``n_tok`` the window's actual token count (last window may be
    short)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    staged = docs.select(
        F.col(id_col), words_of(F.col(text_col)).alias("__w")
    ).select(
        id_col, "__w", F.size("__w").alias("__n"),
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("__n") - overlap, F.lit(1)), F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            s.alias("start_tok"),
            F.least(F.lit(chunk_tokens), F.col("__n") - s + 1).alias("n_tok"),
            F.array_join(F.slice("__w", s, chunk_tokens), " ").alias("chunk_text"),
        ),
    )
    # explode_outer + null filter: plain explode would let
    # InferFiltersFromGenerate clone the transform into a size()>0
    # pre-filter (the sitemaps.py planner trap) — and starts is never
    # empty anyway (greatest floor), so nothing is dropped
    return (
        staged.select(id_col, F.explode_outer(chunks).alias("__c"))
        .where(F.col("__c").isNotNull())
        .select(
            id_col,
            F.col("__c.chunk_idx").cast("long").alias("chunk_idx"),
            F.col("__c.start_tok").cast("long").alias("start_tok"),
            F.col("__c.n_tok").cast("long").alias("n_tok"),
            F.col("__c.chunk_text").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    chunk_tokens: int = 128,
    overlap: int = 16,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`chunk_documents` — same start arithmetic
    via generate_series, 1-based list slices."""
    stride = chunk_tokens - overlap
    return f"""
      WITH staged AS (
        SELECT {id_col}, string_split({text_col}, ' ') AS w,
               len(string_split({text_col}, ' ')) AS n
        FROM {table}),
      chunks AS (
        SELECT {id_col}, w, n, u.s AS s,
               ROW_NUMBER() OVER (PARTITION BY {id_col} ORDER BY u.s) - 1
                 AS chunk_idx
        FROM staged,
             LATERAL unnest(generate_series(1, greatest(n - {overlap}, 1),
                                            {stride})) AS u(s))
      SELECT {id_col},
             CAST(chunk_idx AS BIGINT) AS chunk_idx,
             CAST(s AS BIGINT) AS start_tok,
             CAST(least({chunk_tokens}, n - s + 1) AS BIGINT) AS n_tok,
             array_to_string(w[s : s + {chunk_tokens} - 1], ' ') AS chunk_text
      FROM chunks
    """
