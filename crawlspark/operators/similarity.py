"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-K as the exact baseline, and an LSH-bucketed
(random-hyperplane / SimHash-for-vectors) variant as the scale path:
at 10^9 vectors the cross join is impossible; sign-projection buckets
make the candidate set per query ~bucket-sized, then the exact cosine
re-ranks candidates only.

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM-side array math,
no Python. The hyperplane weights are deterministic functions of
(plane, dim) via a hash, so bucketing is reproducible with no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force top-K by cosine: broadcast the (small) query set
    against the corpus — one corpus scan, then a per-query top-K window.
    Output (query_id, neighbor_id, cos_sim, rank)."""
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _plane_weight(plane: int, dim_idx: Column) -> Column:
    """Deterministic pseudo-random weight in [-1,1) for (plane, dim)."""
    h = F.pmod(F.xxhash64(F.concat_ws(":", F.lit(str(plane)), dim_idx.cast("string"))), F.lit(10_000))
    return (h - 5_000) / 5_000.0


def hyperplane_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Sign-random-projection bucket id (0 .. 2^n_planes-1)."""
    def weighted(p: int):
        # two-arg lambda factory (a default arg would add a third param,
        # which zip_with rejects)
        return lambda x, i: x.cast("double") * _plane_weight(p, i)

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), weighted(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(2 ** p)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0]).cast("int")


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-K: candidates share the query's hyperplane bucket,
    re-ranked by exact cosine. The join is an equi-join on bucket —
    shuffle-partitionable, no cross join."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dups(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join:
    (id_a, id_b, cos_sim) with cos_sim >= threshold, id_a < id_b."""
    b = df.select(
        F.col(id_col), F.col(vec_col),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(y, "bucket")
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.round(cosine(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
