"""Grid table-detection unit tests (SURVEY.md §5.2 strategy).

Synthetic sheets with known block layouts pin the labeling, filtering,
scoring, and greedy-selection behavior — including 8-connectivity diagonal
touching and sub-threshold rejection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from worker_etl_spark.operators.detection import (
    DETECTION_SCHEMA,
    content_mask,
    detect_tables,
    extract_table,
    find_tables_in_grid,
    label_components,
)


def grid(rows: list[list]) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=range(max(len(r) for r in rows)))


def test_empty_sheet():
    g = grid([[None, None], [None, None]])
    assert find_tables_in_grid(g) == []


def test_null_tokens_are_background():
    g = grid([["null", "NaN"], ["  ", "N/A"], ["<NA>", "none"]])
    assert not content_mask(g).any()


def test_single_block():
    g = grid(
        [
            [None, None, None, None],
            [None, "h1", "h2", None],
            [None, "a", "1", None],
            [None, "b", "2", None],
            [None, "c", "3", None],
            [None, None, None, None],
        ]
    )
    found = find_tables_in_grid(g)
    assert len(found) == 1
    t = found[0]
    assert (t.min_row, t.max_row, t.min_col, t.max_col) == (1, 4, 1, 2)
    assert t.table_id == "table_1"
    assert t.density == 1.0


def test_two_separate_blocks():
    g = grid(
        [
            ["h1", "h2", None, None, "x1", "x2"],
            ["a", "1", None, None, "p", "9"],
            ["b", "2", None, None, "q", "8"],
            ["c", "3", None, None, "r", "7"],
        ]
    )
    found = find_tables_in_grid(g)
    assert len(found) == 2
    boxes = sorted((t.min_col, t.max_col) for t in found)
    assert boxes == [(0, 1), (4, 5)]


def test_diagonal_touch_is_one_component():
    # Two 3x2 blocks touching only at one diagonal corner: 8-connectivity
    # merges them into a single component (reference uses a 3x3 structure,
    # etl.py:369-373).
    g = grid(
        [
            ["a", "b", None, None],
            ["c", "d", None, None],
            ["e", "f", None, None],
            [None, None, "p", "q"],
            [None, None, "r", "s"],
            [None, None, "t", "u"],
        ]
    )
    labels = label_components(content_mask(g))
    assert labels.max() == 1
    found = find_tables_in_grid(g)
    assert len(found) == 1
    assert (found[0].min_row, found[0].max_row) == (0, 5)


def test_too_small_block_rejected():
    g = grid(
        [
            ["a", "b"],
            ["c", "d"],  # only 2 rows < MIN_TABLE_ROWS=3
        ]
    )
    assert find_tables_in_grid(g) == []

    g2 = grid([["a"], ["b"], ["c"], ["d"]])  # 1 col < MIN_TABLE_COLS=2
    assert find_tables_in_grid(g2) == []


def test_low_density_rejected():
    # 6x6 bbox with content only on the diagonal → density 6/36 < 0.25.
    rows = [[None] * 6 for _ in range(6)]
    for i in range(6):
        rows[i][i] = "x"
    assert find_tables_in_grid(grid(rows)) == []


def test_fallback_whole_sheet_mode():
    g = grid(
        [
            ["h1", "h2", None, "x1"],
            ["a", "1", None, "9"],
            ["b", "2", None, "8"],
        ]
    )
    found = find_tables_in_grid(g, detect_components=False)
    assert len(found) == 1
    assert (found[0].min_row, found[0].max_row, found[0].min_col, found[0].max_col) == (0, 2, 0, 3)


def test_header_block_scores_higher_than_numeric_header():
    with_header = grid(
        [
            ["name", "qty"],
            ["a", "1"],
            ["b", "2"],
            ["c", "3"],
        ]
    )
    numeric_first = grid(
        [
            ["7", "8"],
            ["7", "1"],
            ["7", "2"],
            ["7", "3"],
        ]
    )
    s1 = find_tables_in_grid(with_header)[0].score
    s2 = find_tables_in_grid(numeric_first)[0].score
    assert s1 > s2


def test_detect_tables_spark(spark):
    rows = []
    layout = [
        [None, None, None, None],
        [None, "h1", "h2", None],
        [None, "a", "1", None],
        [None, "b", "2", None],
        [None, "c", "3", None],
    ]
    for i, r in enumerate(layout):
        rows.append(("f.xlsx", "Sheet1", i, *r))
    sdf = spark.createDataFrame(
        rows, schema="file string, sheet string, row_idx long, c0 string, c1 string, c2 string, c3 string"
    )
    out = detect_tables(sdf)
    assert out.schema == DETECTION_SCHEMA
    found = out.collect()
    assert len(found) == 1
    bbox = found[0].asDict()
    assert (bbox["min_row"], bbox["max_row"], bbox["min_col"], bbox["max_col"]) == (1, 4, 1, 2)

    block = extract_table(sdf, bbox).orderBy("row_idx").collect()
    assert [tuple(r)[1:] for r in block] == [("h1", "h2"), ("a", "1"), ("b", "2"), ("c", "3")]


def test_multiple_sheets_parallel(spark):
    rows = []
    for sheet in ["S1", "S2", "S3"]:
        for i in range(4):
            rows.append(("f.xlsx", sheet, i, "h" if i == 0 else "v", str(i)))
    sdf = spark.createDataFrame(rows, schema="file string, sheet string, row_idx long, c0 string, c1 string")
    out = detect_tables(sdf).collect()
    assert len(out) == 3
    assert {r.sheet for r in out} == {"S1", "S2", "S3"}
