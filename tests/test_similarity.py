"""Similarity search: brute-force correctness vs numpy, LSH consistency
and recall, embedding near-dup pairs."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from crawlspark.operators.similarity import (
    cosine,
    cosine_topk,
    embedding_near_dups,
    hyperplane_bucket,
    lsh_cosine_topk,
    lsh_cosine_topk_multi,
)


def _vectors(n=80, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    base = rng.randn(n // 4, dim)
    # clusters of near-duplicates → guaranteed high-cosine pairs
    vecs = np.concatenate([base + rng.randn(n // 4, dim) * 0.05 for _ in range(4)])
    return vecs.astype(np.float32)


@pytest.fixture(scope="module")
def emb(spark):
    vecs = _vectors()
    rows = [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows), vecs


def test_cosine_matches_numpy(spark, emb):
    df, vecs = emb
    got = (
        df.alias("a").join(df.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .where((F.col("a.vec_id") == 0) & (F.col("b.vec_id") <= 5))
        .select(
            F.col("b.vec_id").alias("j"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("c"),
        )
        .collect()
    )
    for r in got:
        a, b = vecs[0].astype(np.float64), vecs[r["j"]].astype(np.float64)
        exp = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r["c"] - exp) < 1e-9


def test_brute_force_topk_matches_numpy(spark, emb):
    df, vecs = emb
    got = cosine_topk(df.where("vec_id < 3"), df, k=4).collect()
    v = vecs.astype(np.float64)
    sims = (v @ v.T) / (np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :])
    for q in range(3):
        order = [
            int(j) for j in sorted(
                (j for j in range(len(v)) if j != q),
                key=lambda j: (-round(sims[q, j], 6), j),
            )
        ][:4]
        mine = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == q]
        assert mine == order, f"query {q}"


def test_lsh_topk_is_consistent_and_recalls_near_dups(spark, emb):
    df, vecs = emb
    exact = cosine_topk(df.where("vec_id < 8"), df, k=1).collect()
    approx = lsh_cosine_topk(df.where("vec_id < 8"), df, k=1, n_planes=4).collect()
    # the nearest neighbor of a clustered vector is its near-duplicate
    # (cos ~0.99+): sign-projection buckets must keep most of them
    exact_nn = {r["query_id"]: r["neighbor_id"] for r in exact}
    approx_nn = {r["query_id"]: r["neighbor_id"] for r in approx}
    hits = sum(1 for q, n in exact_nn.items() if approx_nn.get(q) == n)
    assert hits >= len(exact_nn) * 0.5, f"LSH recall too low: {hits}/{len(exact_nn)}"
    # internal consistency: every approx neighbor shares the query bucket
    b = df.select("vec_id", hyperplane_bucket(F.col("embedding"), 4).alias("bk")).collect()
    bucket = {r["vec_id"]: r["bk"] for r in b}
    for r in approx:
        assert bucket[r["query_id"]] == bucket[r["neighbor_id"]]


def test_multi_table_ann_recall_at_10k(spark):
    """Scale-path ANN: 6 independent hyperplane tables + bucket caps must
    recover >= 90% of true nearest neighbors on a 10k planted-cluster
    corpus (single-table LSH recalls ~50-70% here)."""
    rng = np.random.RandomState(11)
    base = rng.randn(2500, 24)
    vecs = np.concatenate(
        [base + rng.randn(2500, 24) * 0.03 for _ in range(4)]
    ).astype(np.float32)
    rows = [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows)
    n_q = 25
    approx = lsh_cosine_topk_multi(
        df.where(f"vec_id < {n_q}"), df, k=1,
        n_planes=8, n_tables=6, max_bucket_size=2000,
    ).collect()
    approx_nn = {r["query_id"]: r["neighbor_id"] for r in approx if r["rank"] == 1}
    v = vecs.astype(np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    sims = v[:n_q] @ v.T
    hits = 0
    for q in range(n_q):
        s = sims[q].copy()
        s[q] = -2.0
        best = float(s.max())
        got = approx_nn.get(q)
        # value-based hit: the returned neighbor is AS GOOD as the true
        # nearest (6-dp rounding can tie several near-copies)
        if got is not None and s[got] >= best - 1e-6:
            hits += 1
    assert hits >= int(n_q * 0.9), f"multi-table ANN recall too low: {hits}/{n_q}"


def test_multi_table_ann_bucket_cap_bounds_degenerate_buckets(spark):
    """All-identical vectors collapse into one bucket per table; the cap
    drops them from the corpus side (boilerplate policy — exact dedup
    owns those), leaving no candidates instead of a quadratic join."""
    rows = [Row(vec_id=i, embedding=[1.0, 2.0, 3.0, 4.0]) for i in range(300)]
    df = spark.createDataFrame(rows)
    out = lsh_cosine_topk_multi(
        df.where("vec_id < 2"), df, k=3, n_planes=4, n_tables=2, max_bucket_size=100,
    )
    assert out.count() == 0


def test_embedding_near_dups_finds_planted_pairs(spark, emb):
    df, vecs = emb
    pairs = embedding_near_dups(df, threshold=0.95, n_planes=4).collect()
    assert len(pairs) > 0
    v = vecs.astype(np.float64)
    for r in pairs:
        a, b = v[r["id_a"]], v[r["id_b"]]
        sim = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert sim >= 0.95 - 1e-6


def test_ivf_topk_recall_at_10k(spark):
    """IVF (k-means coarse quantizer + n_probe inverted lists) must
    recover >= 90% of true nearest neighbors on the same 10k
    planted-cluster corpus as the multi-table LSH test — the
    data-adaptive cells should capture clusters that fixed random
    hyperplanes can split."""
    from crawlspark.operators.similarity import ivf_cosine_topk

    rng = np.random.RandomState(11)
    base = rng.randn(2500, 24)
    vecs = np.concatenate(
        [base + rng.randn(2500, 24) * 0.03 for _ in range(4)]
    ).astype(np.float32)
    rows = [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows)
    n_q = 25
    approx = ivf_cosine_topk(
        df.where(f"vec_id < {n_q}"), df, k=1,
        n_centroids=16, n_probe=3, n_iters=2, sample_size=1024,
    ).collect()
    approx_nn = {r["query_id"]: r["neighbor_id"] for r in approx if r["rank"] == 1}
    v = vecs.astype(np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    sims = v[:n_q] @ v.T
    hits = 0
    for q in range(n_q):
        s = sims[q].copy()
        s[q] = -2.0
        best = float(s.max())
        got = approx_nn.get(q)
        if got is not None and s[got] >= best - 1e-6:
            hits += 1
    assert hits >= int(n_q * 0.9), f"IVF recall too low: {hits}/{n_q}"


def test_ivf_fit_is_deterministic(spark):
    from crawlspark.operators.similarity import ivf_fit_centroids

    rng = np.random.RandomState(3)
    vecs = rng.randn(400, 8).astype(np.float32)
    rows = [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows)
    a = ivf_fit_centroids(df, n_centroids=8, n_iters=2, sample_size=256)
    b = ivf_fit_centroids(df, n_centroids=8, n_iters=2, sample_size=256)
    assert a == b
    # probing ALL lists makes IVF exact: equals brute force top-1
    from crawlspark.operators.similarity import cosine_topk, ivf_cosine_topk

    exact = {r["query_id"]: r["neighbor_id"]
             for r in cosine_topk(df.where("vec_id < 6"), df, k=1).collect()}
    full = {r["query_id"]: r["neighbor_id"]
            for r in ivf_cosine_topk(df.where("vec_id < 6"), df, k=1,
                                     n_centroids=8, n_probe=8, n_iters=2,
                                     sample_size=256).collect()}
    assert full == exact


def test_embedding_near_dups_bucket_cap_and_multitable(spark):
    """Degenerate corpus (300 identical vectors) + a few genuine near-dup
    pairs: the cap drops the identical block (exact dedup's job), the
    multi-table join still recovers the planted pairs."""
    rng = np.random.RandomState(5)
    pair_base = rng.randn(10, 12)
    planted = np.concatenate([pair_base, pair_base + rng.randn(10, 12) * 0.01])
    rows = [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(planted)]
    rows += [Row(vec_id=1000 + i, embedding=[1.0] * 12) for i in range(300)]
    df = spark.createDataFrame(rows)
    got = embedding_near_dups(
        df, threshold=0.95, n_planes=6, n_tables=4, max_bucket_size=100
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in got}
    # every planted near-dup pair recovered, identical block absent
    assert {(i, i + 10) for i in range(10)} <= ids
    assert all(a < 1000 and b < 1000 for a, b in ids)


def test_embedding_near_dups_lsh_recall_vs_exact_on_real_corpus(spark):
    """The registered rows-only query's config (3 planes × 8 tables)
    must recover >= 0.9 of the exact brute-force pair set at its own
    threshold on the ACTUAL sf0.001 embeddings — the corpus tail sits
    near cos 0.42, much harder for hyperplane LSH than planted
    0.95-dup clusters."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a, b = df.alias("a"), df.alias("b")
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("c"),
        )
        .where(F.col("c") >= 0.42)
        .collect()
    }
    assert len(exact) > 0
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(
            df, threshold=0.42, n_planes=3, n_tables=8
        ).collect()
    }
    assert got <= exact  # never a false positive (exact verify stage)
    assert len(got & exact) / len(exact) >= 0.9


def test_ivf_recall_cost_tradeoff_on_sf01_corpus(spark):
    """r4 verdict task 8: measure the registered IVF query on the REAL
    sf0.1 embeddings table (2000 x 64d), not just the 10k synthetic
    corpus, and record the candidate-set-size vs brute-force cost ratio.

    Finding, pinned here: this corpus is ISOTROPIC at the NN level —
    the median true-nearest-neighbor cosine is ~0.40 and essentially no
    query's NN clears 0.5 (asserted below). In that regime argmax-NN
    has no cluster structure for a coarse quantizer to exploit, so
    recall scales roughly with the probed fraction — a property of the
    data, not the operator (the >=0.9 pins live on the clustered 10k
    corpus above, where IVF's cells capture real structure, and
    full-probe == brute force is pinned by test_ivf_fit_is_deterministic
    / the exactness tests). The floors below are deterministic (k-means
    init and sampling are seeded) and document the honest tradeoff:
    probing half the cells buys ~0.85 recall at ~0.5x brute-force cost."""
    from crawlspark.operators.similarity import (
        _assign_list,
        _centroid_scores,
        ivf_cosine_topk,
        ivf_fit_centroids,
    )

    df = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = df.count()
    n_q = 50
    queries = df.where(F.col("vec_id") < n_q)

    rows = df.select("vec_id", "embedding").collect()
    vecs = np.zeros((n, len(rows[0]["embedding"])))
    for r in rows:
        vecs[r["vec_id"]] = r["embedding"]
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = v[:n_q] @ v.T

    # isotropy witness: true-NN cosines cluster around 0.4 — there is
    # no near-dup structure for cell-probing ANN to exploit here
    nn_cos = []
    for q in range(n_q):
        s = sims[q].copy()
        s[q] = -2.0
        nn_cos.append(float(s.max()))
    assert np.median(nn_cos) < 0.5, "corpus grew NN structure; retighten floors"

    def recall(n_probe: int, n_iters: int) -> int:
        approx = ivf_cosine_topk(
            queries, df, k=1, n_centroids=16, n_probe=n_probe,
            n_iters=n_iters, sample_size=2048,
        ).collect()
        nn = {r["query_id"]: r["neighbor_id"] for r in approx if r["rank"] == 1}
        hits = 0
        for q in range(n_q):
            s = sims[q].copy()
            s[q] = -2.0
            got = nn.get(q)
            if got is not None and s[got] >= float(s.max()) - 1e-6:
                hits += 1
        return hits

    r4 = recall(4, 2)   # the registered query's config: 1/4 of the cells
    r8 = recall(8, 3)   # half the cells
    assert r4 >= int(n_q * 0.55), f"probe-4 recall regressed: {r4}/{n_q}"
    assert r8 >= int(n_q * 0.80), f"probe-8 recall regressed: {r8}/{n_q}"

    # candidate-set cost of the registered config: rows entering the
    # exact re-rank = sum over queries of probed-list sizes; brute
    # force = n_q * (n - 1)
    cents = ivf_fit_centroids(df, n_centroids=16, n_iters=2, sample_size=2048)
    list_sizes = {
        r["list_id"]: r["cnt"]
        for r in df.select(_assign_list("embedding", cents).alias("list_id"))
        .groupBy("list_id").agg(F.count("*").alias("cnt")).collect()
    }
    probed = F.slice(
        F.reverse(F.array_sort(_centroid_scores("embedding", cents))), 1, 4
    )
    cand = sum(
        list_sizes.get(r["lid"], 0)
        for r in queries.select(F.explode(probed["cid"]).alias("lid")).collect()
    )
    ratio = cand / (n_q * (n - 1))
    print(f"IVF sf0.1: NN-cos median {np.median(nn_cos):.3f}, "
          f"recall probe4 {r4}/{n_q} probe8 {r8}/{n_q}, "
          f"candidates {cand}, cost ratio {ratio:.3f} vs brute force")
    assert ratio < 0.45, f"probe-4 candidate set too large: {ratio:.3f}"


def test_semdedup_matches_bruteforce_reference(spark, emb):
    """SemDeDup semantics pinned against an independent numpy replay:
    same deterministic codebook, same in-cluster order, same
    upper-triangular-max drop rule."""
    from crawlspark.operators.similarity import ivf_fit_centroids, semdedup

    df, vecs = emb
    got = {
        r.vec_id: (r.cluster, r.ctr_rank, r.kept)
        for r in semdedup(df, threshold=0.9, n_centroids=8, n_iters=2).collect()
    }
    assert len(got) == len(vecs)

    # numpy replay using the SAME (deterministic) centroids
    cents = ivf_fit_centroids(df, n_centroids=8, n_iters=2)
    C = np.array([cv for _, cv in cents], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    V = vecs.astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = np.round(Vn @ Cn.T, 9)
    # array_max over struct(sim, cid): ties on sim pick the LARGEST cid
    assign, ctr_sim = [], []
    for i in range(len(V)):
        best = max(range(len(cents)), key=lambda c: (sims[i, c], c))
        assign.append(cents[best][0])
        ctr_sim.append(sims[i, best])
    for cl in set(assign):
        members = sorted(
            [i for i in range(len(V)) if assign[i] == cl],
            key=lambda i: (-ctr_sim[i], i),
        )
        for pos, i in enumerate(members):
            exp_kept = all(
                round(float(Vn[i] @ Vn[j]), 6) < 0.9 for j in members[:pos]
            )
            assert got[i] == (cl, pos + 1, exp_kept), (i, got[i], cl, pos, exp_kept)
    # the planted 4x-duplicated corpus must actually dedup
    n_kept = sum(1 for _, _, k in got.values() if k)
    assert n_kept < len(vecs)


def test_semdedup_max_cluster_size_keeps_megacluster_wholesale(spark, emb):
    from crawlspark.operators.similarity import semdedup

    df, vecs = emb
    # cap below every cluster size -> nothing eligible -> all kept
    out = semdedup(df, threshold=0.9, n_centroids=8, n_iters=2, max_cluster_size=1)
    assert out.where(~F.col("kept")).count() == 0
    assert out.count() == len(vecs)
