"""Text-analysis primitives shared by the text / dedup / fingerprint queries.

Everything here is built from JVM-side ``pyspark.sql.functions`` (no Python
UDFs in the hot path) and has an exact ANSI-SQL twin used by the DuckDB
oracles, so the driver's value-hash gate can verify the whole pipeline.

Cross-engine determinism notes:
- The portable hash is ``md5`` (identical bytes-in/hex-out in Spark and
  DuckDB) with a hex→int conversion: Spark ``conv(substring(md5(x),1,k),16,10)``
  vs DuckDB ``('0x' || substring(md5(x),1,k))::BIGINT``.  k=8 gives a 32-bit
  non-negative value, k=15 a 60-bit value — both inside signed-64 range.
- DuckDB ``regexp_replace`` replaces only the FIRST match unless the ``'g'``
  flag is passed; Spark replaces all.  The SQL twins below always pass ``'g'``.

No counterpart exists in the reference (SURVEY.md §2 Part B: text analysis is
a driver-mandated extension); the tokenizer reuses the reference's
whitespace model (``etl.py:694`` strip + split semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokens the reference treats as null are unrelated here; these are the
# stopword/marker lists for quality scoring and language ID.  Marker lists are
# intentionally tiny n-gram-style cues: language ID at 100 TB must be a cheap
# projection, not a model call.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "y"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "de", "et"],
    "zh": ["的", "是", "了", "和"],
}
# Deterministic argmax tiebreak order (first wins on equal scores).
LANG_ORDER = ["en", "es", "de", "fr", "zh"]


# --- Spark side ------------------------------------------------------------

def norm_text(col: Column) -> Column:
    """Lowercase, collapse whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the trimmed text (array<string>)."""
    return F.split(F.trim(col), r"\s+")


def hex_int(col: Column, k: int = 8) -> Column:
    """First *k* hex digits of md5(col) as a non-negative BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, k), 16, 10).cast("long")


def count_in(tok_col: Column, words: list[str]) -> Column:
    """How many tokens are in *words* (with multiplicity)."""

    def _pred(x):
        c = x == F.lit(words[0])
        for w in words[1:]:
            c = c | (x == F.lit(w))
        return c

    return F.size(F.filter(tok_col, _pred))


# --- SQL twins (DuckDB oracle fragments) -----------------------------------

def sql_norm_text(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def sql_tokens(expr: str) -> str:
    return f"string_split_regex(trim({expr}), '\\s+')"


def sql_hex_int(expr: str, k: int = 8) -> str:
    return f"(('0x' || substring(md5({expr}), 1, {k}))::BIGINT)"


def sql_count_in(tok_expr: str, words: list[str]) -> str:
    ors = " OR ".join(f"t = '{w}'" for w in words)
    return f"len(list_filter({tok_expr}, t -> {ors}))"
