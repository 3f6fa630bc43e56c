"""C4 line-level cleaning and the Gopher document-quality rule battery.

The two canonical webtext curation filters a 100 TB training-data
pipeline runs between crawl and dedup:

* ``c4_line_filter`` — C4 (Raffel et al. 2020, "Exploring the Limits of
  Transfer Learning…", §2.2): per-LINE rules (terminal punctuation,
  minimum words, blockword) applied inside each document, the surviving
  lines reassembled, plus the page-level drops (too few kept lines,
  "lorem ipsum", curly brace). The reference repo has no analog — this
  is part of the LLM-pipeline operator suite, like dedup/lang-id.
* ``gopher_quality_flags`` — Gopher (Rae et al. 2021, Appendix A1.1)
  document rules: word-count bounds, mean-word-length bounds,
  symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic-word
  fraction, stopword presence. Repetition rules live separately in
  ``textops.repetition_profile`` / ``top_token_fraction``.

Both are pure per-row column expressions — no UDF, no shuffle, whole
stage codegen end to end — so they scale linearly with input splits at
any corpus size. Ratios are integer micro-units (floor(x·10^6 / y)):
exact and portable to the DuckDB oracle, where float rounding is not.

HOF-lambda discipline (the round-2/3 gotcha): every lambda below closes
only over its own element and cheap literals — never over an expensive
array expression that CollapseProject would inline per element.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlspark.operators.textops import STOPWORDS

MICRO = 1_000_000

# Gopher A1.1 defaults
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN_MICRO = 3 * MICRO
GOPHER_MAX_MEAN_WORD_LEN_MICRO = 10 * MICRO
GOPHER_MAX_SYMBOL_RATIO_MICRO = MICRO // 10       # '#' + '...' per word <= 0.1
GOPHER_MAX_BULLET_FRAC_MICRO = MICRO * 9 // 10    # <= 90% lines start with a bullet
GOPHER_MAX_ELLIPSIS_FRAC_MICRO = MICRO * 3 // 10  # <= 30% lines end with '...'
GOPHER_MIN_ALPHA_FRAC_MICRO = MICRO * 8 // 10     # >= 80% words contain a letter
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_HITS = 2

# C4 defaults (Raffel et al. 2020 §2.2)
C4_MIN_WORDS_PER_LINE = 3
C4_MIN_KEPT_LINES = 5
C4_LINE_BLOCKWORDS = ("javascript",)
C4_DOC_BLOCKLIST = ("lorem ipsum", "{")
TERMINAL_PUNCT = (".", "!", "?", '"')


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def _word_contains(line: Column, word: str) -> Column:
    """Word-bounded containment: ' word ' inside ' lower(line) '."""
    return F.instr(F.concat(F.lit(" "), F.lower(line), F.lit(" ")), f" {word} ") > 0


def _count_substr(text: Column, needle: str) -> Column:
    """Non-overlapping substring count via the replace trick — identical
    left-to-right greedy semantics in Spark and DuckDB."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)
    ).cast("long")


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
    min_kept_lines: int = C4_MIN_KEPT_LINES,
    require_terminal_punct: bool = True,
    line_blockwords: tuple[str, ...] = C4_LINE_BLOCKWORDS,
    doc_blocklist: tuple[str, ...] = C4_DOC_BLOCKLIST,
) -> DataFrame:
    """C4 line-level cleaning: keep lines that end in terminal
    punctuation, have >= ``min_words_per_line`` whitespace words, and
    contain none of ``line_blockwords`` (word-bounded, case-insensitive);
    reassemble survivors. ``keep`` additionally applies the page-level
    rules: >= ``min_kept_lines`` surviving lines and none of
    ``doc_blocklist`` present anywhere (case-insensitive substring —
    C4's "lorem ipsum" and curly-brace drops).

    Returns (id, n_lines, n_kept, kept_text, keep). Per-row expressions
    only: the line array is built once per doc and each lambda touches
    one line — no shuffle at any scale.
    """
    text = _col(text_col)
    lines = F.split(text, "\n")

    def line_ok(line: Column) -> Column:
        trimmed = F.trim(line)
        ok = F.length(trimmed) > 0
        if require_terminal_punct:
            punct = None
            for p in TERMINAL_PUNCT:
                c = F.endswith(trimmed, F.lit(p))
                punct = c if punct is None else (punct | c)
            ok = ok & punct
        n_words = F.size(F.split(trimmed, " "))
        ok = ok & (n_words >= min_words_per_line)
        for w in line_blockwords:
            ok = ok & ~_word_contains(trimmed, w)
        return ok

    # line array and survivor array STAGED in their own projections:
    # inlined, the filter battery (trim + word split + blockword scan
    # per line) re-runs for each of its three consumers (n_kept,
    # kept_text, keep) — the repo's CollapseProject staging rule
    doc_ok = F.lit(True)
    for phrase in doc_blocklist:
        doc_ok = doc_ok & ~F.contains(F.col("__lt"), F.lit(phrase.lower()))
    return (
        df.select(
            F.col(id_col), lines.alias("__lines"), F.lower(text).alias("__lt")
        )
        .select(
            F.col(id_col), "__lines", "__lt",
            F.filter(F.col("__lines"), line_ok).alias("__kept"),
        )
        .select(
            F.col(id_col),
            F.size("__lines").cast("long").alias("n_lines"),
            F.size("__kept").cast("long").alias("n_kept"),
            F.array_join(F.col("__kept"), "\n").alias("kept_text"),
            ((F.size("__kept") >= min_kept_lines) & doc_ok).alias("keep"),
        )
    )


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mean_word_len_micro: int = GOPHER_MIN_MEAN_WORD_LEN_MICRO,
    max_mean_word_len_micro: int = GOPHER_MAX_MEAN_WORD_LEN_MICRO,
    max_symbol_ratio_micro: int = GOPHER_MAX_SYMBOL_RATIO_MICRO,
    max_bullet_frac_micro: int = GOPHER_MAX_BULLET_FRAC_MICRO,
    max_ellipsis_frac_micro: int = GOPHER_MAX_ELLIPSIS_FRAC_MICRO,
    min_alpha_frac_micro: int = GOPHER_MIN_ALPHA_FRAC_MICRO,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stop_hits: int = GOPHER_MIN_STOP_HITS,
) -> DataFrame:
    """Gopher A1.1 document-quality rules as one flags table.

    All measurements are exact integers: counts, and ratios in
    micro-units (floor(x·10^6 / y)). ``keep`` is the conjunction of the
    rules at the given thresholds (paper defaults). The tokenization
    convention is whitespace words, matching ``textops.token_count``.

    Bullet lines start with '-' or '*'; ellipsis lines end with '...'
    (the paper's symbols restricted to ASCII so Spark and the DuckDB
    oracle agree byte-for-byte). ``stopwords`` defaults to the paper's
    set; pass a corpus-aware set when the corpus vocabulary is synthetic
    (the registered query does — otherwise the presence rule is
    all-false and vacuous).

    Scale: per-row expressions only, no UDF, no shuffle.
    """
    # words/lines arrays and n_words STAGED in their own projections —
    # each is referenced by several measurement columns, and inlined
    # expressions re-split the text once per consuming column (the
    # repo's CollapseProject staging rule)
    text = _col(text_col)
    t = F.col("__t")
    w = F.col("__words")
    ls = F.col("__lines")
    n_words = F.col("n_words")
    # chars excluding the single-space separators (split convention)
    word_chars = F.length(t) - (n_words - 1)
    mean_wl_micro = F.floor(word_chars * MICRO / n_words).cast("long")

    n_symbols = _count_substr(t, "#") + _count_substr(t, "...")
    symbol_micro = F.floor(n_symbols * MICRO / n_words).cast("long")

    n_lines = F.size(ls).cast("long")

    def starts_bullet(line: Column) -> Column:
        t = F.trim(line)
        return F.startswith(t, F.lit("-")) | F.startswith(t, F.lit("*"))

    def ends_ellipsis(line: Column) -> Column:
        return F.endswith(F.trim(line), F.lit("..."))

    n_bullet = F.size(F.filter(ls, starts_bullet)).cast("long")
    n_ellipsis = F.size(F.filter(ls, ends_ellipsis)).cast("long")
    bullet_micro = F.floor(n_bullet * MICRO / n_lines).cast("long")
    ellipsis_micro = F.floor(n_ellipsis * MICRO / n_lines).cast("long")

    n_alpha = F.size(
        F.filter(w, lambda x: F.regexp_like(x, F.lit("[A-Za-z]")))
    ).cast("long")
    alpha_micro = F.floor(n_alpha * MICRO / n_words).cast("long")

    stop_hits = sum(
        (_word_contains(t, s).cast("long") for s in stopwords), F.lit(0)
    ).cast("long")

    flags = (
        df.select(
            F.col(id_col), text.alias("__t"),
            F.split(text, " ").alias("__words"), F.split(text, "\n").alias("__lines"),
        )
        .select(
            F.col(id_col), "__t", "__words", "__lines",
            F.size("__words").cast("long").alias("n_words"),
        )
        .select(
            F.col(id_col),
            "n_words",
            mean_wl_micro.alias("mean_word_len_micro"),
            symbol_micro.alias("symbol_ratio_micro"),
            bullet_micro.alias("bullet_line_frac_micro"),
            ellipsis_micro.alias("ellipsis_line_frac_micro"),
            alpha_micro.alias("alpha_word_frac_micro"),
            stop_hits.alias("stop_hits"),
        )
    )
    return flags.withColumn(
        "keep",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len_micro") >= min_mean_word_len_micro)
        & (F.col("mean_word_len_micro") <= max_mean_word_len_micro)
        & (F.col("symbol_ratio_micro") <= max_symbol_ratio_micro)
        & (F.col("bullet_line_frac_micro") <= max_bullet_frac_micro)
        & (F.col("ellipsis_line_frac_micro") <= max_ellipsis_frac_micro)
        & (F.col("alpha_word_frac_micro") >= min_alpha_frac_micro)
        & (F.col("stop_hits") >= min_stop_hits),
    )


def lineify(text: Column | str, words_per_line: int = 7) -> Column:
    """Deterministically fold a single-line text into lines of
    ``words_per_line`` words (newline replaces every Nth space). Used by
    the registered c4 query: the synthetic documents table carries no
    newlines, so the line rules would be vacuous on the raw text. Pure
    regexp — the DuckDB twin replays it with the 'g' flag."""
    n = words_per_line
    pattern = "((?:\\S+ ){%d})" % (n - 1) + "(\\S+) "
    return F.regexp_replace(_col(text), pattern, "$1$2\n")


def lineify_sql(expr: str, words_per_line: int = 7) -> str:
    """DuckDB twin of ``lineify`` (RE2 backrefs are \\1-style and
    replacement is first-match unless the 'g' flag is passed)."""
    n = words_per_line
    pattern = "((?:\\S+ ){%d})" % (n - 1) + "(\\S+) "
    return f"regexp_replace({expr}, '{pattern}', '\\1\\2' || chr(10), 'g')"
