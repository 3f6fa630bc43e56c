"""DSIR-style data selection via hashed-bigram importance weights.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", NeurIPS) select pretraining data by fitting bag-of-hashed-
n-gram distributions over a small TARGET corpus (the domain you want
more of) and the RAW pool, weighting every raw document by the
likelihood ratio of its features, and resampling by weight. The float
formulation scores sum_g log(p_target[bucket(g)] / p_raw[bucket(g)]).

Cross-engine float logs cannot hash-match (libm ulps), so this module
keeps DSIR's exact feature space — hashed bigram buckets with
Laplace-smoothed counts — and replaces the per-bucket log-ratio with
the exact integer micro-unit ratio

    s[b] = (1_000_000 * (cnt_target[b] + 1)) div (cnt_raw[b] + 1)

summed over the document's bigrams WITH multiplicity. That is a
monotone target-likeness score with the identical plan shape; on a
real cluster where resampling theory matters more than bit-exactness,
swap the ``score`` expression in :func:`bucket_scores` for
``log((cnt_t+1)/(t_total+B)) - log((cnt_r+1)/(r_total+B))`` — one
line, same joins.

Scale shape (100 TB raw pool):

* fitting is one explode + hash-aggregate per corpus, and the result
  is ``n_buckets`` rows — constant size, independent of corpus size;
  when the target is a predicate subset of the pool (the usual DSIR
  setup), :func:`hashed_bigram_fit_pair` fits BOTH distributions in
  one pass;
* the score table (bucket, s) is a FULL join of the two fits (or a
  projection of the pair fit), B rows, always broadcast;
* scoring is explode → bucket expression → broadcast-join → two-level
  hash agg on doc id. The exchange carries (id, int64) partial sums,
  O(#docs) bytes — never bigrams, never text (classify.py's proven
  shape).

Length bias: the raw sum grows with document length, so selection uses
``w_per_gram_micro = weight div n_bigrams`` (the per-feature mean —
DSIR's normalized log-ratio analog). Documents with no bigrams carry
NULL weights (no evidence ≠ on-target; lm.py's convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawlspark.operators.lm import _bigrams_of
from crawlspark.operators.textops import words_of

MICRO = 1_000_000
DEFAULT_BUCKETS = 1024


def _bucket(gram: Column, n_buckets: int) -> Column:
    """28-bit md5 prefix mod n_buckets — portable across engines, no
    unsigned wraparound (classify.py's hashing convention)."""
    return F.conv(F.substring(F.md5(gram), 1, 7), 16, 10).cast("bigint") % n_buckets


def hashed_bigram_fit(
    docs: DataFrame, text_col: str = "text", n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Fit a hashed-bigram distribution: ``(bucket, cnt)`` with one row
    per OCCUPIED bucket (join sides coalesce absent buckets to 0). One
    explode + hash-agg; output size <= n_buckets regardless of corpus."""
    return (
        docs.select(words_of(text_col).alias("__w"))
        .select(F.explode_outer(_bigrams_of(F.col("__w"))).alias("g"))
        .where(F.col("g").isNotNull())
        .select(_bucket(F.col("g"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def hashed_bigram_fit_pair(
    docs: DataFrame,
    target_filter,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Both distributions from ONE explode + hash-agg pass:
    ``(bucket, cnt_target, cnt_raw)`` where the target corpus is the
    rows satisfying ``target_filter`` (a boolean Column). Whenever the
    target is a predicate-defined subset of the raw pool — DSIR's usual
    setup — this halves the fit cost vs two :func:`hashed_bigram_fit`
    calls (the plan audit showed Catalyst running the full explode+agg
    once per fit, i.e. two extra corpus passes at 100 TB); results are
    identical because every target bucket is by construction present in
    the raw fit."""
    return (
        docs.select(
            target_filter.alias("__is_t"), words_of(text_col).alias("__w")
        )
        .select("__is_t", F.explode_outer(_bigrams_of(F.col("__w"))).alias("g"))
        .where(F.col("g").isNotNull())
        .select("__is_t", _bucket(F.col("g"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.when(F.col("__is_t"), 1)).alias("cnt_target"),
            F.count("*").alias("cnt_raw"),
        )
    )


def bucket_scores_pair(pair: DataFrame) -> DataFrame:
    """Per-bucket score from a :func:`hashed_bigram_fit_pair` relation —
    the same Laplace micro-ratio as :func:`bucket_scores`, no join
    needed."""
    s = F.expr(f"({MICRO} * (cnt_target + 1)) div (cnt_raw + 1)")
    return pair.select("bucket", s.cast("long").alias("s"))


def bucket_scores(
    target_fit: DataFrame, raw_fit: DataFrame
) -> DataFrame:
    """Per-bucket integer importance score ``(bucket, s)`` =
    ``(1e6 * (cnt_target+1)) div (cnt_raw+1)`` (Laplace-smoothed
    micro-ratio). FULL join so a bucket seen by either fit scores; a
    bucket seen by neither is handled at scoring time (s = 1e6 exactly,
    the smoothed ratio of two zero counts)."""
    t = target_fit.select("bucket", F.col("cnt").alias("__ct"))
    r = raw_fit.select("bucket", F.col("cnt").alias("__cr"))
    j = t.join(r, "bucket", "full")
    s = F.expr(
        f"({MICRO} * (coalesce(__ct, 0) + 1)) div (coalesce(__cr, 0) + 1)"
    )
    return j.select("bucket", s.cast("long").alias("s"))


def dsir_weights(
    docs: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-document DSIR weight: ``(id, n_bigrams, weight,
    w_per_gram_micro)`` where ``weight`` = sum over the doc's bigrams
    (with multiplicity) of the bucket score, absent buckets scoring the
    smoothed-zero ratio 1e6. 0-bigram docs → NULL weight."""
    grams = docs.select(
        F.col(id_col).alias("id"), words_of(text_col).alias("__w")
    ).select("id", F.explode_outer(_bigrams_of(F.col("__w"))).alias("g"))
    scored = grams.withColumn(
        "bucket",
        F.when(F.col("g").isNotNull(), _bucket(F.col("g"), n_buckets)),
    ).join(F.broadcast(scores), "bucket", "left")
    agg = scored.groupBy("id").agg(
        F.count("g").alias("n_bigrams"),
        F.sum(
            F.when(F.col("g").isNotNull(), F.coalesce(F.col("s"), F.lit(MICRO)))
        ).alias("weight"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("weight").cast("long").alias("weight"),
        F.when(
            F.col("n_bigrams") > 0, F.expr("weight div n_bigrams")
        ).cast("long").alias("w_per_gram_micro"),
    )


def dsir_pair_weights(
    docs: DataFrame,
    target_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Fit + score + weigh from ONE bucketed-gram pass — output is
    bit-identical to ``dsir_weights(docs,
    bucket_scores_pair(hashed_bigram_fit_pair(docs, target_filter)))``
    but the corpus bigrams are exploded, hashed, and bucketed ONCE: the
    narrow ``(id, is_target, bucket)`` relation is localCheckpointed
    and consumed by both the per-bucket fit and the per-doc weight
    aggregate (the two-call composition ran the full gram pass twice —
    two corpus reads and 2x the md5/conv work at 100 TB)."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        target_filter.alias("__is_t"),
        words_of(text_col).alias("__w"),
    ).select("id", "__is_t", F.explode_outer(_bigrams_of(F.col("__w"))).alias("g"))
    r = grams.select(
        "id", "__is_t",
        F.when(F.col("g").isNotNull(), _bucket(F.col("g"), n_buckets)).alias("bucket"),
    ).localCheckpoint(eager=True)
    pair = (
        r.where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(
            F.count(F.when(F.col("__is_t"), 1)).alias("cnt_target"),
            F.count("*").alias("cnt_raw"),
        )
    )
    scores = bucket_scores_pair(pair)
    agg = r.join(F.broadcast(scores), "bucket", "left").groupBy("id").agg(
        F.count("bucket").alias("n_bigrams"),
        F.sum(
            F.when(F.col("bucket").isNotNull(), F.coalesce(F.col("s"), F.lit(MICRO)))
        ).alias("weight"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("weight").cast("long").alias("weight"),
        F.when(
            F.col("n_bigrams") > 0, F.expr("weight div n_bigrams")
        ).cast("long").alias("w_per_gram_micro"),
    )


def dsir_select(
    weights: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic top-k selection by per-gram weight (ties → smaller
    id): the integer-exact stand-in for DSIR's Gumbel-top-k resample.
    NULL-weight (0-bigram) docs are never selected.

    Scale: the k-row cut is ``orderBy().limit(k)`` — Spark plans
    TakeOrderedAndProject (per-partition heaps, no global sort, no
    single-task window); only the k survivors pass through the global
    row_number, which a k-row relation makes trivial."""
    order = [F.col("w_per_gram_micro").desc(), F.col(id_col).asc()]
    top = (
        weights.where(F.col("w_per_gram_micro").isNotNull())
        .orderBy(*order)
        .limit(k)
    )
    return (
        top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .select(id_col, "n_bigrams", "weight", "w_per_gram_micro", "rank")
    )


def dsir_sql(
    raw_table: str = "documents",
    target_predicate: str = "lang = 'en'",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    k: int | None = None,
) -> str:
    """DuckDB twin of fit → score → weigh (→ select when ``k``): same
    md5-prefix bucket, same Laplace micro-ratio, same `//` floors.
    Independent derivation: LATERAL generate_series bigrams (the
    oov_bigram_share oracle's pattern) instead of transform/slice.
    ``target_predicate`` may reference ``id`` and ``lang``."""
    sql = f"""
      WITH toks AS (
        SELECT {id_col} AS id, lang, string_split({text_col}, ' ') AS w
        FROM {raw_table}),
      grams AS (
        SELECT id, lang,
               CAST(('0x' || substr(md5(w[i] || ' ' || w[i + 1]), 1, 7)) AS BIGINT)
                 % {n_buckets} AS bucket
        FROM toks, LATERAL unnest(generate_series(1, len(w) - 1)) AS u(i)
        WHERE len(w) >= 2),
      sc AS (SELECT bucket,
                    ({MICRO} * (count(*) FILTER (WHERE {target_predicate}) + 1))
                      // (count(*) + 1) AS s
             FROM grams GROUP BY bucket),
      wt AS (
        SELECT g.id, count(*) AS n_bigrams,
               sum(coalesce(sc.s, {MICRO})) AS weight
        FROM grams g LEFT JOIN sc ON g.bucket = sc.bucket
        GROUP BY g.id),
      out AS (
        SELECT d.{id_col},
               CAST(coalesce(wt.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(wt.weight AS BIGINT) AS weight,
               CAST(CASE WHEN wt.n_bigrams > 0
                         THEN wt.weight // wt.n_bigrams END AS BIGINT)
                 AS w_per_gram_micro
        FROM {raw_table} d LEFT JOIN wt ON wt.id = d.{id_col})
    """
    if k is None:
        return sql + "  SELECT * FROM out"
    return sql + f"""
      SELECT {id_col}, n_bigrams, weight, w_per_gram_micro,
             CAST(rank AS BIGINT) AS rank
      FROM (SELECT *, row_number() OVER (ORDER BY w_per_gram_micro DESC, {id_col} ASC) AS rank
            FROM out WHERE w_per_gram_micro IS NOT NULL)
      WHERE rank <= {k}"""
