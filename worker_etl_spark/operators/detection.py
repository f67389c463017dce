"""Grid → table discovery: the reference's most distinctive operator family.

Reimplements, Spark-first, the semantics of the reference's
connected-component table detection (SURVEY.md §2 A.2; reference evidence
``etl.py:329-438``): a spreadsheet sheet is a 2-D grid of untyped cells;
contiguous regions of non-empty cells (8-connectivity) are table candidates,
filtered by size (``etl.py:380-384``) and density (``etl.py:386-394``),
scored (``etl.py:279-324``), and greedily selected non-overlapping by score
(``etl.py:411-438``).

Architecture: a sheet is a bounded, spreadsheet-sized 2-D grid — spatial
connectivity is not relational — so detection runs inside ``applyInPandas``
grouped by (file, sheet): each sheet is one pandas group processed by
vectorized numpy, and Spark parallelizes **across** sheets/files.  At 100 TB
(millions of sheets) the group key spreads groups uniformly across
executors; no single sheet ever needs to be distributed (the reference has
the same per-sheet memory envelope, ``etl.py:537-617``).

scipy is unavailable in this environment, so the 8-connectivity labeling is
a self-contained vectorized numpy fixpoint (max-label propagation over the 8
shifted neighbor views) — O(diameter) vectorized sweeps, no Python-per-cell
loops.  Scoring reproduces the documented behavior (density/header/size
terms with the same thresholds and hard floors); the header heuristic is a
fresh formulation of the documented signals (first-row distinctness,
non-nullness, "<40% numeric"), pinned by unit tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Null-token vocabulary of the mask (reference D1, ``etl.py:365-366``).
NULL_TOKENS = {
    "none", "null", "nan", "<na>", "na", "n/a",
}
_WS_RE = re.compile(r"^\s*$")

# Defaults mirror the reference's env knobs (``etl.py:72-75``).
MIN_TABLE_ROWS = 3
MIN_TABLE_COLS = 2
BLOCK_DENSITY_THRESHOLD = 0.25
MIN_HEADER_CONFIDENCE = 0.6

DETECTION_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("sheet", StringType()),
        StructField("table_id", StringType()),
        StructField("min_row", LongType()),
        StructField("max_row", LongType()),
        StructField("min_col", LongType()),
        StructField("max_col", LongType()),
        StructField("n_rows", LongType()),
        StructField("n_cols", LongType()),
        StructField("density", DoubleType()),
        StructField("score", DoubleType()),
    ]
)


def content_mask(grid: pd.DataFrame) -> np.ndarray:
    """Boolean mask: cell has real content (not NA / blank / null token)."""
    def cell_has_content(s: pd.Series) -> pd.Series:
        isna = s.isna()
        txt = s.astype(str).str.strip().str.lower()
        return ~(isna | txt.eq("") | txt.isin(NULL_TOKENS))

    return np.column_stack([cell_has_content(grid[c]).to_numpy() for c in grid.columns])


def label_components(mask: np.ndarray) -> np.ndarray:
    """8-connectivity connected-component labels (0 = background).

    Vectorized max-propagation fixpoint: seed each content cell with a unique
    positive id, then repeatedly take the max over the 8 neighbor shifts
    until stable.  Each sweep is pure numpy; iteration count is bounded by
    the longest connected path in the sheet.
    """
    h, w = mask.shape
    labels = np.where(mask, np.arange(1, h * w + 1).reshape(h, w), 0)
    if not mask.any():
        return labels

    def shifted_max(lab: np.ndarray) -> np.ndarray:
        padded = np.zeros((h + 2, w + 2), dtype=lab.dtype)
        padded[1:-1, 1:-1] = lab
        views = [
            padded[1 + dr : h + 1 + dr, 1 + dc : w + 1 + dc]
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
        ]
        return np.maximum.reduce(views)

    while True:
        new = np.where(mask, shifted_max(labels), 0)
        if np.array_equal(new, labels):
            break
        labels = new

    # Compact label ids to 1..K in first-seen (row-major) order.
    uniq = [int(v) for v in pd.unique(labels[labels > 0].ravel())]
    remap = {v: i + 1 for i, v in enumerate(sorted(uniq))}
    out = labels.copy()
    for v, i in remap.items():
        out[labels == v] = i
    return out


def bounding_boxes(labels: np.ndarray) -> list[tuple[int, int, int, int]]:
    """(min_row, max_row, min_col, max_col) per label id 1..K, inclusive."""
    boxes = []
    for lab in range(1, labels.max() + 1):
        rows, cols = np.nonzero(labels == lab)
        if rows.size:
            boxes.append((int(rows.min()), int(rows.max()), int(cols.min()), int(cols.max())))
    return boxes


_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _header_score(block_mask: np.ndarray, block: pd.DataFrame) -> float:
    """Header confidence of the block's first row.

    Signals (documented in SURVEY.md §2 D5, reference ``etl.py:296-314``):
    distinctness of row-0 values, row-0 non-null coverage, and a "<40%
    numeric" guard (a header made of numbers is probably data).
    """
    first = block.iloc[0]
    vals = [str(v).strip() for v, m in zip(first.tolist(), block_mask[0]) if m]
    width = block.shape[1]
    if not vals:
        return 0.0
    nonnull_ratio = len(vals) / width
    distinct_ratio = len(set(vals)) / len(vals)
    numeric_frac = sum(1 for v in vals if _NUM_RE.match(v)) / len(vals)
    score = distinct_ratio * nonnull_ratio
    if numeric_frac >= 0.4:
        score *= 0.3
    return float(score)


def score_candidate(
    block_mask: np.ndarray,
    block: pd.DataFrame,
    min_header_confidence: float = MIN_HEADER_CONFIDENCE,
    min_data_rows: int = MIN_TABLE_ROWS,
    density_threshold: float = BLOCK_DENSITY_THRESHOLD,
) -> float:
    """Candidate score = density·0.5 + header·0.3 + log1p(cells)·0.01, with
    the reference's hard floors (density < thr/2 → −1; too few rows → −1)."""
    n_rows, n_cols = block_mask.shape
    density = float(block_mask.sum()) / float(n_rows * n_cols)
    if density < density_threshold / 2:
        return -1.0
    if n_rows < min_data_rows:
        return -1.0
    hdr = _header_score(block_mask, block)
    data_points = int(block_mask.sum())
    return density * 0.5 + hdr * 0.3 + float(np.log1p(data_points)) * 0.01


@dataclass
class DetectedTable:
    table_id: str
    min_row: int
    max_row: int
    min_col: int
    max_col: int
    density: float
    score: float


def find_tables_in_grid(
    grid: pd.DataFrame,
    min_rows: int = MIN_TABLE_ROWS,
    min_cols: int = MIN_TABLE_COLS,
    density_threshold: float = BLOCK_DENSITY_THRESHOLD,
    header_confidence: float = MIN_HEADER_CONFIDENCE,
    detect_components: bool = True,
) -> list[DetectedTable]:
    """All accepted tables in one sheet grid, greedy non-overlapping by score.

    ``detect_components=False`` is the fallback mode (reference D7): score
    the whole sheet as a single candidate.
    """
    mask = content_mask(grid)
    if not mask.any():
        return []
    if detect_components:
        labels = label_components(mask)
        boxes = bounding_boxes(labels)
    else:
        rows, cols = np.nonzero(mask)
        boxes = [(int(rows.min()), int(rows.max()), int(cols.min()), int(cols.max()))]

    candidates = []
    for (r0, r1, c0, c1) in boxes:
        n_rows, n_cols = r1 - r0 + 1, c1 - c0 + 1
        if n_rows < min_rows or n_cols < min_cols:
            continue
        bmask = mask[r0 : r1 + 1, c0 : c1 + 1]
        density = float(bmask.sum()) / float(n_rows * n_cols)
        if density < density_threshold:
            continue
        score = score_candidate(bmask, grid.iloc[r0 : r1 + 1, c0 : c1 + 1],
                                header_confidence, min_rows, density_threshold)
        if score <= 0:
            continue
        candidates.append((score, density, r0, r1, c0, c1))

    # Greedy non-overlap selection, best score first (ties: top-left first).
    candidates.sort(key=lambda t: (-t[0], t[2], t[4]))
    covered = np.zeros(mask.shape, dtype=bool)
    out: list[DetectedTable] = []
    for score, density, r0, r1, c0, c1 in candidates:
        if covered[r0 : r1 + 1, c0 : c1 + 1].any():
            continue
        covered[r0 : r1 + 1, c0 : c1 + 1] = True
        out.append(
            DetectedTable(
                table_id=f"table_{len(out) + 1}",
                min_row=r0, max_row=r1, min_col=c0, max_col=c1,
                density=round(density, 6), score=round(score, 6),
            )
        )
    return out


def detect_tables(
    grid_df: DataFrame,
    value_cols: Iterable[str] | None = None,
    row_col: str = "row_idx",
    **kwargs,
) -> DataFrame:
    """Distributed detection over a long-format grid DataFrame.

    ``grid_df`` schema: (file, sheet, row_idx, c0..cN string cells) — one row
    per sheet row.  Groups by (file, sheet); each group becomes a pandas
    grid (rows ordered by ``row_idx``) and is labeled/scored with the numpy
    kernel above.  Output: one row per detected table with its bbox + score.
    """
    cell_cols = [c for c in grid_df.columns if c not in ("file", "sheet", row_col)] \
        if value_cols is None else list(value_cols)

    def per_sheet(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(row_col)
        grid = pdf[cell_cols].reset_index(drop=True)
        found = find_tables_in_grid(grid, **kwargs)
        return pd.DataFrame(
            [
                {
                    "file": pdf["file"].iloc[0],
                    "sheet": pdf["sheet"].iloc[0],
                    "table_id": t.table_id,
                    "min_row": t.min_row,
                    "max_row": t.max_row,
                    "min_col": t.min_col,
                    "max_col": t.max_col,
                    "n_rows": t.max_row - t.min_row + 1,
                    "n_cols": t.max_col - t.min_col + 1,
                    "density": t.density,
                    "score": t.score,
                }
                for t in found
            ],
            columns=[f.name for f in DETECTION_SCHEMA.fields],
        )

    return grid_df.groupBy("file", "sheet").applyInPandas(per_sheet, DETECTION_SCHEMA)


def extract_table(grid_df: DataFrame, bbox: dict, row_col: str = "row_idx") -> DataFrame:
    """Slice one detected table out of the long-format grid (lazy, no collect).

    ``bbox`` is one row of ``detect_tables`` output as a dict.  Column slice
    happens by position over the grid's cell columns; row slice is a pushed
    filter on ``row_idx``.
    """
    from pyspark.sql import functions as F

    cell_cols = [c for c in grid_df.columns if c not in ("file", "sheet", row_col)]
    keep = cell_cols[bbox["min_col"] : bbox["max_col"] + 1]
    return (
        grid_df.filter(
            (F.col("file") == bbox["file"])
            & (F.col("sheet") == bbox["sheet"])
            & (F.col(row_col) >= bbox["min_row"])
            & (F.col(row_col) <= bbox["max_row"])
        )
        .select(row_col, *keep)
    )
