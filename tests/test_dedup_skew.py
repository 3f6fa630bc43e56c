"""LSH bucket-cap guardrail under boilerplate skew: a corpus where
thousands of docs share identical text must NOT produce a quadratic
band bucket — the cap drops the degenerate bucket (its members belong
to exact dedup) while distinct near-dup pairs still come through."""

from pyspark.sql import functions as F

from crawlspark.operators.dedup import exact_dedup, minhash_bands, minhash_lsh_pairs


def _skew_corpus(spark, n_boiler=2000, n_unique=60):
    """n_boiler identical boilerplate docs + n_unique distinct docs, of
    which pairs (2i, 2i+1) are near-duplicates (one word appended)."""
    boiler = spark.range(n_boiler).select(
        F.col("id").alias("doc_id"),
        F.lit("lorem ipsum dolor sit amet consectetur adipiscing elit sed do").alias("text"),
    )
    common = " ".join(
        f"w{i} alpha bravo charlie delta echo foxtrot golf hotel" for i in range(6)
    )
    uniq = spark.range(n_unique).select(
        (F.col("id") + n_boiler).alias("doc_id"),
        F.concat(
            F.lit(common + " pair"),
            F.floor(F.col("id") / 2).cast("string"),
            # near-dup pair (2i, 2i+1): one trailing word differs out of
            # ~55 — Jaccard ~0.95, so every band collides w.h.p. and the
            # md5-fixed outcome is deterministic
            F.when(F.col("id") % 2 == 1, F.lit(" extra")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return boiler.unionByName(uniq)


def test_bucket_cap_bounds_boilerplate_buckets(spark):
    docs = _skew_corpus(spark)
    bands = minhash_bands(docs)
    top = (
        bands.groupBy("band_idx", "band_key").count()
        .agg(F.max("count")).first()[0]
    )
    assert top >= 2000  # the skew is real: one band key holds all boilerplate

    pairs = minhash_lsh_pairs(docs, max_bucket_size=100).collect()
    ids = {i for r in pairs for i in (r["id_a"], r["id_b"])}
    # no boilerplate doc survives into the candidate join …
    assert all(i >= 2000 for i in ids), "boilerplate bucket leaked through the cap"
    # … but the distinct near-dup pairs are all found
    expect = {(2000 + 2 * i, 2000 + 2 * i + 1) for i in range(30)}
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert expect <= got
    # and the dropped boilerplate is exactly what exact dedup owns
    clusters = exact_dedup(docs).where(F.col("n_dups") > 1).collect()
    assert any(r["n_dups"] == 2000 for r in clusters)


def test_cap_none_keeps_exact_semantics_on_small_corpus(spark):
    docs = _skew_corpus(spark, n_boiler=30, n_unique=20)
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, max_bucket_size=10_000).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    assert capped == uncapped
