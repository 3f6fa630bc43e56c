"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, fingerprinting, simhash.

All pure built-in column expressions (JVM-side, codegen'd, no UDFs), and
all deterministic + dialect-portable: the same logic is expressible in
ANSI SQL for the DuckDB oracle (md5 / replace / length / ascii /
substring agree byte-for-byte between engines).

Design note: everything aggregates *within* the row's token array
(``aggregate``/``transform``) rather than exploding — one narrow
projection, no shuffle, scales linearly with corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny fixed marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "value", "table"],
    "de": ["der", "und", "nicht", "das"],
    "fr": ["les", "une", "est", "pas"],
    "es": ["los", "una", "que", "por"],
}
STOPWORDS = ["the", "a", "and", "of", "to", "in", "value", "table"]


def words_of(text: Column | str) -> Column:
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count via the replace trick — identical in any
    SQL dialect: len(text) - len(replace(text,' ','')) + 1."""
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit(""))) + 1).cast("long")


def occurrences(text: Column | str, token: str) -> Column:
    """Count occurrences of ``' token '`` in ``' text '`` (word-bounded)."""
    padded = F.concat(F.lit(" "), F.col(text) if isinstance(text, str) else text, F.lit(" "))
    needle = f" {token} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def stopword_ratio(text: Column | str) -> Column:
    total = token_count(text)
    hits = sum((occurrences(text, w) for w in STOPWORDS), F.lit(0))
    return F.round(hits / total, 6)


def quality_score(text: Column | str) -> Column:
    """Length / mean-word-length / stopword-ratio composite in [0, ~1]."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c)
    mean_len = (F.length(c) - (n_tok - 1)) / n_tok  # chars sans separators
    ratio = stopword_ratio(c)
    return F.round(
        F.least(n_tok / 400.0, F.lit(1.0)) * 0.5
        + F.least(mean_len / 8.0, F.lit(1.0)) * 0.3
        + F.least(ratio * 5.0, F.lit(1.0)) * 0.2,
        6,
    )


def stop_ratio_micro(text: Column | str) -> Column:
    """Stopword ratio in integer micro-units: floor(hits·10^6 / tokens).
    Pure integer arithmetic — exact and engine-portable (float rounding
    at half boundaries differs between engines)."""
    total = token_count(text)
    hits = sum((occurrences(text, w) for w in STOPWORDS), F.lit(0))
    return F.floor(hits * 1_000_000 / total).cast("long")


def quality_micro(text: Column | str) -> Column:
    """quality_score in integer micro-units (0..10^6), exact arithmetic:
      0.5·min(n_tok/400,1) + 0.3·min(mean_word_len/8,1) + 0.2·min(5·stop_ratio,1)
    with every term as floor-divided integers."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c)
    chars = F.length(c) - (n_tok - 1)  # chars sans separators
    hits = sum((occurrences(c, w) for w in STOPWORDS), F.lit(0))
    t1 = F.least(n_tok, F.lit(400)) * 1250                       # ≤ 500_000
    t2 = F.least(F.floor(chars * 37_500 / n_tok), F.lit(300_000))
    t3 = F.least(F.floor(hits * 1_000_000 / n_tok), F.lit(200_000))
    return (t1 + t2 + t3).cast("long")


def lang_scores(text: Column | str) -> dict[str, Column]:
    return {
        lang: sum((occurrences(text, w) for w in markers), F.lit(0))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column | str) -> Column:
    """Argmax of marker-word counts with a fixed tie-break order
    (en > de > fr > es) — deterministic and SQL-portable as a CASE."""
    s = lang_scores(text)
    langs = list(LANG_MARKERS)
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = s[lang] >= s[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, lang).otherwise(expr)
    return expr


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the lowercased text (the rolling-hash
    analog; md5 keeps it byte-identical across engines)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(c))


def _nibble_val(ch: Column) -> Column:
    a = F.ascii(ch)
    return F.when(a >= 97, a - 87).otherwise(a - 48)


def simhash16(text: Column | str) -> Column:
    """16-bit SimHash over whitespace tokens. Bit i of a token's hash is
    the top bit of hex nibble i of md5(token); per-bit weights sum +1/-1
    over tokens; fingerprint bit = (weight >= 0). Small enough to stay
    dialect-portable, same structure as a 64-bit production simhash."""
    w = words_of(text)

    def bit_sign(i: int):
        # single-arg lambda factory: a default-arg closure would make
        # Spark bind the second param to the array index instead
        return lambda t: F.when(
            _nibble_val(F.substring(F.md5(t), i + 1, 1)) >= 8, 1
        ).otherwise(-1)

    bits = []
    for i in range(16):
        contrib = F.aggregate(
            F.transform(w, bit_sign(i)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(contrib >= 0, F.lit(2 ** i)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0]).cast("int")


def simhash16_agg(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> Column:
    """DataFrame-level simhash: explode tokens, hash each token ONCE
    (the column variant computes md5 16× per token), then 16 conditional
    sums in one map-side-partial aggregate. Same result as
    ``simhash16``; the scale-right shape."""
    w = (
        df.select(F.col(id_col), F.explode(words_of(F.col(text_col))).alias("t"))
        .withColumn("h", F.md5("t"))
    )
    aggs = [
        F.sum(
            F.when(_nibble_val(F.substring("h", i + 1, 1)) >= 8, 1).otherwise(-1)
        ).alias(f"w{i}")
        for i in range(16)
    ]
    g = w.groupBy(id_col).agg(*aggs)
    bits = [F.when(F.col(f"w{i}") >= 0, F.lit(2 ** i)).otherwise(F.lit(0)) for i in range(16)]
    return g.select(F.col(id_col), sum(bits[1:], bits[0]).cast("int").alias("simhash"))


def hamming16(a: Column, b: Column) -> Column:
    """Popcount of a XOR b for 16-bit ints, via nibble lookup."""
    x = a.bitwiseXOR(b)
    nib_pop = F.array(*[F.lit(bin(i).count("1")) for i in range(16)])
    return sum(
        (F.element_at(nib_pop, (F.shiftright(x, s) % 16).cast("int") + 1) for s in (4, 8, 12)),
        F.element_at(nib_pop, (x % 16).cast("int") + 1),
    )


def text_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection over a documents table."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        stopword_ratio(text_col).alias("stop_ratio"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fp"),
        simhash16(text_col).alias("simhash"),
    )
