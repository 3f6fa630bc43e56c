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

    # norms precomputed once per SIDE, not once per pair (r6): the
    # cosine denominator sqrt-folds are pure per-row work, and inlining
    # them into the join output re-ran both for every (query, corpus)
    # pair. Bit-identical doubles — the staged norm is the same
    # expression over the same values, only evaluated earlier.
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn")), 6
            ).alias("cos_sim"),
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


def hyperplane_bucket(vec: Column, n_planes: int = 8, table: int = 0) -> Column:
    """Sign-random-projection bucket id (0 .. 2^n_planes-1). ``table``
    selects an independent plane set (for multi-table LSH)."""
    def weighted(p: int):
        # two-arg lambda factory (a default arg would add a third param,
        # which zip_with rejects)
        return lambda x, i: x.cast("double") * _plane_weight(table * 1009 + p, i)

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


def _bucket_keys(vec: Column, n_planes: int, n_tables: int) -> Column:
    """Array of (table, bucket) structs — one LSH key per table."""
    return F.array(*[
        F.struct(
            F.lit(t).alias("table"),
            hyperplane_bucket(vec, n_planes, table=t).alias("bucket"),
        )
        for t in range(n_tables)
    ])


def lsh_cosine_topk_multi(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 6,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Multi-table ANN — the 10^9-vector scale path.

    A single hash table of 2^n_planes buckets fails at scale twice over:
    recall drops for any fixed n_planes (one unlucky sign flip loses the
    neighbor), and hot buckets make the within-bucket join quadratic.
    This variant fixes both:

      * ``n_tables`` INDEPENDENT plane sets — a true neighbor is missed
        only if it disagrees with the query in EVERY table, so recall is
        1-(1-p^n_planes)^n_tables (≈1 for near-dups at these defaults);
      * ``max_bucket_size`` drops corpus rows from degenerate buckets
        (hot buckets contain mutually-similar boilerplate that exact
        dedup handles better), bounding every join task;
      * candidate (query, neighbor) pairs are DEDUPED across tables
        BEFORE the exact cosine re-rank, so the expensive array math
        runs once per candidate, not once per table.

    The corpus side is exploded n_tables-fold but only as (id, key) +
    one carried vector column; all joins are equi-joins."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(_bucket_keys(F.col(vec_col), n_planes, n_tables)).alias("kb"),
    ).select("query_id", "qv", F.col("kb.table").alias("table"), F.col("kb.bucket").alias("bucket"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        F.explode(_bucket_keys(F.col(vec_col), n_planes, n_tables)).alias("kb"),
    ).select("neighbor_id", "cv", F.col("kb.table").alias("table"), F.col("kb.bucket").alias("bucket"))
    if max_bucket_size is not None:
        sizes = c.groupBy("table", "bucket").agg(F.count("*").alias("__n"))
        c = c.join(sizes.where(F.col("__n") <= max_bucket_size), ["table", "bucket"], "left_semi")
    cand = (
        c.join(F.broadcast(q.select("query_id", "table", "bucket")), ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")      # dedupe across tables
        .agg(F.first("cv").alias("cv"))
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = cand.join(F.broadcast(qv), "query_id").select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _centroid_scores(vec_col: str, centroids: list[tuple[int, list[float]]]) -> Column:
    """array<struct<sim,cid>>: cosine of ``vec_col`` against every
    centroid, as one JVM-side expression (centroids are literals — the
    IVF analog of a broadcast variable)."""
    cents = F.array(*[
        F.struct(
            F.lit(int(cid)).alias("cid"),
            F.array(*[F.lit(float(x)) for x in cv]).alias("cv"),
        )
        for cid, cv in centroids
    ])
    return F.transform(
        cents,
        lambda s: F.struct(
            F.round(cosine(F.col(vec_col), s["cv"]), 9).alias("sim"),
            s["cid"].alias("cid"),
        ),
    )


def _assign_list(vec_col: str, centroids: list[tuple[int, list[float]]]) -> Column:
    # struct max is lexicographic: highest sim, ties broken by cid
    return F.array_max(_centroid_scores(vec_col, centroids))["cid"]


def ivf_fit_centroids(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 3,
    sample_size: int = 4096,
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer for IVF: Lloyd's k-means on a
    hash-ordered sample. Returns the centroids driver-side — k×dim
    floats, the IVF analog of a broadcast codebook (NOT a data collect;
    MLlib's KMeans aggregates the same state to the driver).

    Determinism: the training sample and the initial centroids are the
    ``sample_size`` / ``n_centroids`` rows with smallest
    (xxhash64(id), id) — no RNG state; identical inputs give identical
    codebooks. At 10^10 vectors the sample bound keeps the fit O(1)
    jobs over a few thousand rows regardless of corpus size."""
    sample = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_id")), F.col("_id"))
        .limit(sample_size)
        .cache()
    )
    init = sample.limit(n_centroids).select("_v").collect()
    centroids = [(i, list(r["_v"])) for i, r in enumerate(init)]
    for _ in range(n_iters):
        assigned = sample.select(_assign_list("_v", centroids).alias("cid"), "_v")
        # element-wise mean per cluster: posexplode → (cid, pos) avg →
        # re-assemble in pos order (the standard DataFrame array-mean)
        means = (
            assigned.select("cid", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.col("pm.m").alias("cv"))
            .collect()
        )
        new = {r["cid"]: [float(x) for x in r["cv"]] for r in means}
        # empty clusters keep their previous centroid
        centroids = [(cid, new.get(cid, cv)) for cid, cv in centroids]
    sample.unpersist()
    return centroids


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 3,
    sample_size: int = 4096,
) -> DataFrame:
    """IVF ANN — the data-adaptive scale path next to the LSH tables.

    Fit a coarse quantizer (``ivf_fit_centroids``), give every corpus
    vector its inverted-list id in ONE expression-only pass (no shuffle
    of the vectors), probe each query's ``n_probe`` best lists, and
    exact-cosine re-rank only the probed lists' members. All joins are
    equi-joins on ``list_id``; per-query work is ~n_probe/n_centroids of
    the corpus instead of all of it — and unlike the hyperplane tables
    the partition of the corpus follows the DATA (k-means cells), so
    recall holds on clustered corpora where fixed random planes split
    clusters. Output (query_id, neighbor_id, cos_sim, rank)."""
    from pyspark.sql import Window

    cents = ivf_fit_centroids(
        corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids,
        n_iters=n_iters, sample_size=sample_size,
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        _assign_list(vec_col, cents).alias("list_id"),
    )
    probed = F.slice(
        F.reverse(F.array_sort(_centroid_scores(vec_col, cents))), 1, n_probe
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(probed["cid"]).alias("list_id"),
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def semdedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 16,
    n_iters: int = 3,
    sample_size: int = 4096,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + within-cluster cosine.

    The paper's recipe: cluster the embeddings with a k-means coarse
    quantizer, then inside each cluster drop every item whose max
    cosine to any EARLIER-ordered cluster member reaches ``threshold``
    (the released code's upper-triangular-max formulation). The order
    is deterministic — centroid similarity DESC, id ASC — so the most
    central exemplar of each semantic group survives and reruns are
    bit-identical.

    Output: ``(id, cluster, ctr_rank, kept)`` — one row per input, with
    ``kept = false`` exactly when some earlier-ranked SAME-CLUSTER item
    is >= threshold similar.

    Plan shape: one expression-only assignment pass (the codebook is a
    literal, no shuffle of the vectors), one within-cluster self
    equi-join on the cluster id for the pairwise cosines, one left-anti
    membership mark. The quadratic term is per-cluster: at scale,
    ``n_centroids`` grows with the corpus (the paper uses 50k clusters
    for LAION) so clusters stay ~constant-sized; ``max_cluster_size``
    is the explicit guardrail that skips degenerate mega-clusters (kept
    wholesale, never silently dropped — dedup inside them belongs to
    exact/MinHash stages).

    NOT TRANSITIVE CLOSURE: c similar only to a DROPPED b is still
    dropped here (b precedes c), but chains longer than the threshold
    radius are not merged — semantic groups are defined by similarity
    to earlier members, not by connected components (that operator is
    dedup.connected_components).
    """
    from pyspark.sql import Window

    cents = ivf_fit_centroids(
        df, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids,
        n_iters=n_iters, sample_size=sample_size,
    )
    best = F.array_max(_centroid_scores(vec_col, cents))
    assigned = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        best["cid"].alias("cluster"), best["sim"].alias("ctr_sim"),
    )
    w = Window.partitionBy("cluster").orderBy(F.col("ctr_sim").desc(), F.col("id").asc())
    ranked = assigned.withColumn("ctr_rank", F.row_number().over(w))
    if max_cluster_size is not None:
        sizes = ranked.groupBy("cluster").agg(F.count("*").alias("__n"))
        eligible = ranked.join(
            F.broadcast(sizes.where(F.col("__n") <= max_cluster_size)),
            "cluster", "left_semi",
        )
    else:
        eligible = ranked
    x, y = eligible.alias("x"), eligible.alias("y")
    # upper-triangular max: item i is dropped when ANY earlier-ranked
    # cluster member j has cos(i, j) >= threshold — one within-cluster
    # equi-join, no iterative kept-set recurrence
    dropped = (
        x.join(
            y,
            (F.col("x.cluster") == F.col("y.cluster"))
            & (F.col("y.ctr_rank") < F.col("x.ctr_rank")),
        )
        .where(F.round(cosine(F.col("x.v"), F.col("y.v")), 6) >= threshold)
        .select(F.col("x.id").alias("id"))
        .distinct()
    )
    return (
        ranked.join(dropped.withColumn("__d", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            "ctr_rank",
            F.col("__d").isNull().alias("kept"),
        )
    )


def embedding_near_dups(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    n_tables: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table bucketed
    self-join: (id_a, id_b, cos_sim) with cos_sim >= threshold,
    id_a < id_b. Same scale shape as ``lsh_cosine_topk_multi``:
    ``n_tables`` independent plane sets multiply recall, candidate pairs
    are DEDUPED across tables before the exact cosine verify.

    ``max_bucket_size`` (default None = no cap, full recall) is the
    opt-in scale lever: it drops degenerate hot buckets (all-identical
    embeddings belong to exact dedup) so no join task goes quadratic —
    at the explicit cost of losing pairs whose ONLY collisions are in
    capped buckets. No silent caps: callers at 100 TB set it knowingly."""
    b = df.select(
        F.col(id_col), F.col(vec_col),
        F.explode(_bucket_keys(F.col(vec_col), n_planes, n_tables)).alias("kb"),
    ).select(
        id_col, vec_col,
        F.col("kb.table").alias("table"), F.col("kb.bucket").alias("bucket"),
    )
    if max_bucket_size is not None:
        sizes = b.groupBy("table", "bucket").agg(F.count("*").alias("__n"))
        b = b.join(
            sizes.where(F.col("__n") <= max_bucket_size), ["table", "bucket"], "left_semi"
        )
    x, y = b.alias("x"), b.alias("y")
    cand = (
        x.join(y, ["table", "bucket"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .groupBy(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )  # dedupe across tables before the expensive array math
        .agg(F.first(f"x.{vec_col}").alias("va"), F.first(f"y.{vec_col}").alias("vb"))
    )
    return (
        cand.select(
            "id_a", "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
