"""Dedup-family guardrail tests."""

from __future__ import annotations

import pytest

from worker_etl_spark.queries.dedup_q import (
    MAX_BROADCAST_CATALOG_ROWS,
    _check_catalog_size,
)


def test_catalog_size_guard_passes_small():
    _check_catalog_size(10)
    _check_catalog_size(MAX_BROADCAST_CATALOG_ROWS)


def test_catalog_size_guard_rejects_large_and_routes_to_lsh():
    with pytest.raises(ValueError, match="s02_topk_lsh"):
        _check_catalog_size(MAX_BROADCAST_CATALOG_ROWS + 1)


def test_d06_runs_under_guard(spark):
    from worker_etl_spark.queries.dedup_q import d06_embedding_neardup

    out = d06_embedding_neardup(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 10


def test_connected_components_two_chains(spark):
    from worker_etl_spark.operators.graph import connected_components

    # chain 1-2-3-4 (diameter 3, needs >1 propagation round) + pair 10-11
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    got = {
        (r.node, r.lbl) for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_no_edges(spark):
    from worker_etl_spark.operators.graph import connected_components

    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0
