"""Encoding-artifact repair: the ftfy-shaped cleanup every web-text
pipeline runs before tokenization.

Web pages lie about their encodings; the single most common corruption
in crawled text is UTF-8 bytes decoded as Windows-1252 ("mojibake":
``â€™`` where ``’`` belongs, ``Ã©`` for ``é``), plus stray C0 control
characters and non-breaking spaces that confuse whitespace-based
tokenizers and quality filters downstream. ftfy (Speer 2019) is the
standard fixer; this module re-derives its high-frequency core as pure
column expressions with an exact DuckDB twin:

* ``MOJIBAKE`` — the repair table, COMPUTED (not hand-typed) as
  ``chr(cp).encode('utf-8').decode('cp1252')`` for the punctuation and
  Latin-1 letters that dominate real corpora; only codepoints whose
  UTF-8 bytes are all defined in cp1252 are included, so every artifact
  is printable and byte-exact in both engines.
* :func:`repair_encoding` — ``(id, text_fixed, n_mojibake, n_ctrl,
  n_nbsp)``: replace-chain the artifacts, convert NBSP to plain space,
  strip C0 controls (except tab/newline/CR); counts are taken on the
  ORIGINAL text so the caller can audit corruption rates per source.

No entry of the repair table is a substring of another (asserted at
import), so the replace chain is order-independent and a single-pass
alternation can count hits without double-counting.

Scale shape: one narrow projection, zero shuffle, whole-stage codegen —
the same per-row cost class as redact_pii; at 100 TB this rides the
same scan as the rest of the per-row filter battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# codepoints worth repairing: curly quotes, dashes, ellipsis, common
# Latin-1 letters. 0x201D (right double quote) is EXCLUDED — its UTF-8
# tail byte 0x9D is undefined in cp1252, so its mojibake form contains
# an unmappable byte and never round-trips to a printable artifact.
_REPAIR_CODEPOINTS = [
    0x2018, 0x2019, 0x201C, 0x2013, 0x2014, 0x2026,  # ‘ ’ “ – — …
    0x00E9, 0x00E8, 0x00EA, 0x00E7, 0x00F1,          # é è ê ç ñ
    0x00E4, 0x00F6, 0x00FC, 0x00DF,                  # ä ö ü ß
]

MOJIBAKE: dict[str, str] = {
    chr(cp).encode("utf-8").decode("cp1252"): chr(cp)
    for cp in _REPAIR_CODEPOINTS
}

# No artifact contains another (checked below) — but that alone does
# NOT make the replace chain order-independent: an earlier replace can
# SYNTHESIZE a later artifact from adjacent fragments. Verified case:
# 'â€' + 'â€œ' → the 'â€œ'→'“' replace leaves 'â€' adjacent to the
# result? no — it yields 'â€“', which the 0x2013 ('–') rule then
# consumes, so 'â€â€œ' repairs to '–' and n_mojibake (counted on the
# ORIGINAL text via the alternation) can disagree with the number of
# replacements actually applied. The chain order is therefore part of
# the operator's contract (the DuckDB twin runs the identical chain in
# the identical order); reordering MOJIBAKE would change results on
# adversarial fragment-adjacent inputs.
assert not any(
    a != b and a in b for a in MOJIBAKE for b in MOJIBAKE
), "mojibake artifacts must not nest"

_MOJIBAKE_ALT = "|".join(MOJIBAKE)            # no regex metachars by construction
NBSP = " "
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def repair_encoding(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repair mojibake / NBSP / control characters in ``text_col``:
    ``(id, text_fixed, n_mojibake, n_ctrl, n_nbsp)`` with counts from
    the original text (audit the corruption, then use the fix)."""
    c = F.col(text_col)
    fixed = c
    for artifact, char in MOJIBAKE.items():
        fixed = F.replace(fixed, F.lit(artifact), F.lit(char))
    fixed = F.replace(fixed, F.lit(NBSP), F.lit(" "))
    fixed = F.regexp_replace(fixed, _CTRL_RE, "")
    return df.select(
        F.col(id_col),
        fixed.alias("text_fixed"),
        F.regexp_count(c, F.lit(_MOJIBAKE_ALT)).cast("long").alias("n_mojibake"),
        F.regexp_count(c, F.lit(_CTRL_RE)).cast("long").alias("n_ctrl"),
        F.regexp_count(c, F.lit(NBSP)).cast("long").alias("n_nbsp"),
    )


def repair_encoding_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`repair_encoding` — the identical replace
    chain generated from the same MOJIBAKE dict (single source of
    truth), regexp counts on the original column."""
    fixed = text_col
    for artifact, char in MOJIBAKE.items():
        fixed = f"replace({fixed}, '{artifact}', '{char}')"
    fixed = f"replace({fixed}, '{NBSP}', ' ')"
    fixed = f"regexp_replace({fixed}, '{_CTRL_RE}', '', 'g')"
    return f"""
      SELECT {id_col},
             {fixed} AS text_fixed,
             CAST(len(regexp_extract_all({text_col}, '{_MOJIBAKE_ALT}')) AS BIGINT)
               AS n_mojibake,
             CAST(len(regexp_extract_all({text_col}, '{_CTRL_RE}')) AS BIGINT)
               AS n_ctrl,
             CAST(len(regexp_extract_all({text_col}, '{NBSP}')) AS BIGINT)
               AS n_nbsp
      FROM {table}
    """
