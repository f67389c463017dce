"""Local replica of the driver's correctness gate.

For every registry entry that declares an oracle, run the Spark query and the
DuckDB SQL on the same parquet tables (sf0.001 for speed) and compare:
row count, column names, and order-insensitive values (columns sorted by
name, rows sorted, floats rounded).  Catches cross-engine drift before the
driver's sf0.01 run does.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from worker_etl_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return round(val, 6)
    if isinstance(val, list):
        return tuple(_canon(v) for v in val)
    return val


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _pairs():
    return [(n, s) for n, s in load_all().items() if s.oracle is not None]


@pytest.mark.parametrize("name", [n for n, _ in _pairs()])
def test_oracle_parity(spark, name):
    from worker_etl_spark.queries import release_persists

    spec = load_all()[name]
    try:
        sdf = spec.fn(spark, SF_DIR)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
    finally:
        release_persists()  # bounded intra-query persists, session hygiene

    con = _duck()
    rel = con.sql(spec.oracle)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    assert _canon_rows(s_cols, s_rows) == _canon_rows(d_cols, d_rows), f"{name}: value mismatch"
