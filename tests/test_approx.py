"""Error bounds for the sketch-based aggregates (q29's real gate)."""

from __future__ import annotations

from worker_etl_spark.queries import load_all

SF = "/root/testdata/sf0.01"


def test_approx_stats_error_bounds(spark):
    rows = load_all()["q29_approx_stats"].fn(spark, SF).collect()
    assert len(rows) == 3  # A / N / R
    for r in rows:
        # HLL++ at rsd=0.01 — allow 5x headroom on the configured error.
        assert abs(r.approx_parts - r.exact_parts) <= max(0.05 * r.exact_parts, 2)
        # GK sketch at accuracy=10000 over ~60k rows: the returned value is
        # a real data point near the true median.
        assert abs(r.approx_median_price - r.exact_median_price) <= (
            0.01 * r.exact_median_price
        )


def test_query_set_guard_passes_small():
    from worker_etl_spark.queries.similarity_q import (
        MAX_BROADCAST_QUERY_ROWS,
        _check_query_set_size,
    )

    _check_query_set_size(10, "x")
    _check_query_set_size(MAX_BROADCAST_QUERY_ROWS, "x")


def test_query_set_guard_rejects_large_and_routes_to_lsh():
    import pytest

    from worker_etl_spark.queries.similarity_q import (
        MAX_BROADCAST_QUERY_ROWS,
        _check_query_set_size,
    )

    with pytest.raises(ValueError, match="s02_topk_lsh"):
        _check_query_set_size(MAX_BROADCAST_QUERY_ROWS + 1, "oversized matrix")


def test_s01_oversized_query_set_fails_loudly(spark, monkeypatch):
    """An 'oversized' corpus (limit shrunk below the sf0.001 query count)
    must raise the contract error BEFORE the driver materializes the
    matrix — the round-4 verdict's loud-failure requirement."""
    import pytest

    from worker_etl_spark.queries import similarity_q

    monkeypatch.setattr(similarity_q, "MAX_BROADCAST_QUERY_ROWS", 1)
    with pytest.raises(ValueError, match="broadcast\ncontract".replace("\n", " ")):
        similarity_q.s01_topk_bruteforce(spark, "/root/testdata/sf0.001").collect()
