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
