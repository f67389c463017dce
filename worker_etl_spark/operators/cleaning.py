"""Cleaning / normalization operators (reference SURVEY.md §2 A.3: C1-C7, D1).

Every operator is a composable ``DataFrame -> DataFrame`` function built from
JVM-side expressions (``F.when``/``F.trim``/``isin`` — whole-stage codegen'd
projections, no Python in the hot path), so each one is a single narrow
transformation that scales linearly: no shuffle, no driver materialization,
except the two aggregate-gated ops (all-null column drop needs one count
pass; header promotion reads exactly one row).

Semantics are pinned to the reference implementation:
- null-token vocabularies: ``etl.py:365-366`` (detection set) and
  ``etl.py:700-705`` (cleaning set, case-insensitive whole-cell);
- whitespace strip: ``etl.py:688-696``;
- all-null drops: ``etl.py:680-681``;
- identifier sanitization + duplicate suffixing: ``etl.py:206-222, 660-676``;
- header-promotion heuristic: ``etl.py:627-653``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from worker_etl_spark.config import CLEAN_NULL_TOKENS, DETECT_NULL_TOKENS

#: Reserved column carrying the 0-based physical row position of grid rows.
ROW_ID = "_row_id"


def _string_cols(df: DataFrame, cols: list[str] | None) -> list[str]:
    if cols is not None:
        return cols
    return [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
            and f.name != ROW_ID]


# --- D1: detection-time null mask ------------------------------------------------
def null_mask_expr(col):
    """Boolean Column: True where the cell counts as EMPTY for detection.

    Reference semantics (``etl.py:365-366``): all-whitespace cells (regex
    ``^\\s*$``) or an exact, case-SENSITIVE match of the detection token set.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | c.rlike(r"^\s*$") | c.isin(*DETECT_NULL_TOKENS)


# --- C7: cleaning-time null-token normalization ----------------------------------
def normalize_null_tokens(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Whole-cell, case-INSENSITIVE match of the cleaning token set → NULL.

    Reference (``etl.py:700-705``) replaces ``(?i)^token$`` for token in
    ``['', 'none', 'null', 'nan', '<na>', 'nat']`` after stripping.
    """
    tokens = [t for t in CLEAN_NULL_TOKENS if t]
    out = df
    for name in _string_cols(df, cols):
        c = F.col(name)
        out = out.withColumn(
            name, F.when((c == "") | F.lower(c).isin(tokens), None).otherwise(c)
        )
    return out


# --- C6: whitespace strip --------------------------------------------------------
def trim_strings(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """``str.strip()`` on every string column (``etl.py:688-696``).

    Note: NOT ``F.trim`` — Spark's (and DuckDB's) ``trim`` strips only ASCII
    spaces, while pandas ``.str.strip()`` strips all whitespace (tabs,
    newlines, …).  A regex replace preserves the reference semantics.
    """
    out = df
    for name in _string_cols(df, cols):
        out = out.withColumn(
            name, F.regexp_replace(F.col(name), r"^\s+|\s+$", "")
        )
    return out


# --- C5: drop all-null rows ------------------------------------------------------
def drop_all_null_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """``df.dropna(axis=0, how='all')`` (``etl.py:681``) — built-in, no shuffle."""
    cols = subset or [c for c in df.columns if c != ROW_ID]
    return df.na.drop(how="all", subset=cols)


# --- C4: drop all-null columns ---------------------------------------------------
def drop_all_null_cols(df: DataFrame) -> DataFrame:
    """``df.dropna(axis=1, how='all')`` (``etl.py:680``).

    One aggregate pass (``count(col)`` per column = non-null count, computed
    map-side then merged) decides the projection; at 100 TB this is a single
    column-pruned scan, not N per-column jobs.
    """
    cols = [c for c in df.columns if c != ROW_ID]
    if not cols:
        return df
    counts = df.agg(*[F.count(F.col(c)).alias(c) for c in cols]).first()
    empty = [c for c in cols if counts[c] == 0]
    return df.drop(*empty) if empty else df


# --- C2: identifier sanitization (pure Python, applied to schema) ----------------
def sanitize_identifier(name: str) -> str:
    """Sanitize a string for use as a sink column/table identifier.

    Exact reference semantics (``etl.py:206-222``): strip → non-word chars to
    ``_`` → prefix ``_`` unless starting with letter/underscore → empty becomes
    ``_unnamed`` → truncate to 300.
    """
    if not isinstance(name, str):
        name = str(name)
    name = name.strip()
    name = re.sub(r"[^\w]", "_", name)
    if name and not re.match(r"^[a-zA-Z_]", name):
        name = "_" + name
    if not name:
        name = "_unnamed"
    return name[:300]


# --- C3: duplicate-name suffixing ------------------------------------------------
def dedupe_identifiers(names: list[str]) -> list[str]:
    """First occurrence keeps the bare name; later ones get ``_1``, ``_2``…
    (``etl.py:660-676``), re-truncated to 300."""
    final: list[str] = []
    counts: dict[str, int] = {}
    for name in names:
        seen = counts.get(name, 0)
        final.append((f"{name}_{seen}" if seen else name)[:300])
        counts[name] = seen + 1
    return final


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Apply C2+C3 to a DataFrame's column names in one ``toDF`` projection."""
    keep_row_id = ROW_ID in df.columns
    cols = [c for c in df.columns if c != ROW_ID]
    new_names = dedupe_identifiers([sanitize_identifier(c) for c in cols])
    out = df.select(
        *([F.col(ROW_ID)] if keep_row_id else []),
        *[F.col(f"`{c}`").alias(n) for c, n in zip(cols, new_names)],
    )
    return out


# --- C1: header promotion --------------------------------------------------------
_GENERIC_NAME_RE = re.compile(r"^(Unnamed: \d+|\d+)$")
_HEADER_NULLISH = {"None", "nan", "NaN", "NA", "<NA>"}


def header_decision(first_row: list, current_names: list[str]) -> tuple[bool, list[str]]:
    """The reference's header heuristic (``etl.py:627-653``), driver-side.

    Returns ``(promote?, new_names)`` where ``new_names`` are the raw first-row
    values stringified (the reference sets ``df.columns = first_row_values``
    with pandas' ``astype(str)`` semantics: missing cells become ``'nan'``).
    """
    as_str = ["nan" if v is None else str(v) for v in first_row]
    valid = [v for v in as_str if v not in _HEADER_NULLISH]
    non_null = len(valid)
    distinct = len(set(valid))
    num_cols = len(current_names)
    generic = all(_GENERIC_NAME_RE.match(str(c)) for c in current_names)
    current_distinct = len(set(current_names))
    promote = (
        (distinct / max(1, non_null)) > 0.8
        and (non_null / max(1, num_cols)) > 0.6
        and distinct > 1
        and (generic or distinct > current_distinct)
    )
    return promote, as_str


def promote_header(df: DataFrame) -> DataFrame:
    """Promote the first physical row to column names iff the heuristic fires.

    Grid DataFrames carry ``_row_id`` (0-based physical position); the
    candidate header is the minimum-``_row_id`` row — exactly one row is read
    onto the driver, the rest of the plan stays distributed.
    """
    if ROW_ID not in df.columns:
        raise ValueError(f"promote_header requires a '{ROW_ID}' column")
    cols = [c for c in df.columns if c != ROW_ID]
    head = df.orderBy(ROW_ID).limit(1).collect()
    if not head:
        return df
    first = head[0]
    promote, new_names = header_decision([first[c] for c in cols], cols)
    if not promote:
        return df
    min_id = first[ROW_ID]
    out = df.filter(F.col(ROW_ID) != min_id).select(
        F.col(ROW_ID),
        *[F.col(f"`{c}`").alias(n) for c, n in zip(cols, new_names)],
    )
    return out


# --- composed cleaner (the reference's clean_dataframe, etl.py:624-709) ----------
def clean_table(df: DataFrame) -> DataFrame:
    """C1 → C2/C3 → C4/C5 → C6 → C7, the reference's cleaning pipeline order."""
    if ROW_ID in df.columns:
        df = promote_header(df)
    df = sanitize_columns(df)
    df = drop_all_null_cols(df)
    df = drop_all_null_rows(df)
    df = trim_strings(df)
    df = normalize_null_tokens(df)
    return df
