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
