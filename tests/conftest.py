from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from worker_etl_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("worker_etl_spark_tests", cpus=8, shuffle_partitions=8,
                      driver_memory="8g")
    yield spark


# --- two-tier suite (round-6 verdict #6) ------------------------------------
# The full suite (~21 min) stays the round gate; the fast gate
# ``pytest -m "not slow"`` (<5 min) is for inner-loop work.  Membership is
# duration-measured (--durations at round-7 HEAD), not guessed: whole modules
# whose cost is structural (micro-batch streaming waits, hypothesis fuzz, the
# 250-query parity sweep that tools/check_oracle.py also provides), plus the
# individually-slow graph/guard tests.
_SLOW_MODULES = {
    "test_oracle_parity",    # per-query oracle parity, ~10 min for 250 queries
    "test_event_time",       # real streaming micro-batches (241 s stateful test)
    "test_streaming_worker",  # end-to-end worker micro-batches
    "test_biff_fuzz",        # hypothesis fuzz over the BIFF reader
    "test_xlsx_fuzz",        # hypothesis fuzz over the xlsx reader
}
_SLOW_TESTS = {
    ("test_dedup", "test_cc_algorithms_agree_on_random_graphs"),
    ("test_dedup", "test_star_contraction_matches_propagation"),
    ("test_dedup", "test_connected_components_two_chains"),
    ("test_dedup", "test_connected_components_no_edges"),
    ("test_dedup", "test_d06_runs_under_guard"),
    ("test_dedup", "test_d10_band_blocking_is_complete_for_threshold"),
    ("test_dedup", "test_propagation_raises_instead_of_truncating"),
    ("test_dedup", "test_d10_output_invariant_across_band_widths"),
    ("test_cleaning", "test_normalize_and_trim"),
    ("test_approx", "test_approx_stats_error_bounds"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        name = getattr(item, "originalname", None) or item.name
        if mod in _SLOW_MODULES or (mod, name) in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
