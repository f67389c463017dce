"""Invariant tests for the round-7 operators (q87, evt15, i20, p14, v04).

Cross-engine value parity is pinned by the oracle gate
(tests/test_oracle_parity.py); these assert the MATHEMATICAL invariants the
statistics must satisfy regardless of data, which a hash compare can't see.
"""

from __future__ import annotations

import math

from worker_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def test_market_basket_rule_invariants(spark):
    rows = load_all()["q87_market_basket"].fn(spark, SF).collect()
    assert rows, "sf0.001 baskets must yield at least one pair with n>=3"
    for r in rows:
        assert r.part_a < r.part_b  # canonical pair orientation
        assert r.n_both >= 3
        assert 0 < r.support <= r.confidence <= 1  # P(a,b) <= P(b|a)
        assert r.lift > 0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_ewma_fold_matches_sequential_recurrence(spark):
    rows = load_all()["evt15_ewma_smoothing"].fn(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for seq in by_type.values():
        assert [r.hour for r in seq] == sorted(r.hour for r in seq)
        # replay s_t = 0.5*s_{t-1} + 0.5*x_t over the full (untruncated)
        # series; the 32-term window truncation is below the 1e-4 rounding
        s = 0.0
        for r in seq:
            s = 0.5 * s + 0.5 * r.hourly_value
            assert abs(r.ewma - s) < 2e-4, (r.event_type, r.hour)


def test_chi_square_margins_and_terms(spark):
    rows = load_all()["i20_chi_square"].fn(spark, SF).collect()
    n_orders = (
        spark.read.parquet(f"{SF}/orders.parquet").count()
    )
    assert sum(r.observed for r in rows) == n_orders
    # expected margins reproduce observed margins (independence model fits
    # the margins by construction)
    assert abs(sum(r.expected for r in rows) - n_orders) < 0.01 * len(rows)
    for r in rows:
        assert r.chi2_term >= 0
        e = r.expected
        assert abs(r.chi2_term - (r.observed - e) ** 2 / e) < 1e-2


def test_target_encoding_shrinks_toward_prior(spark):
    rows = load_all()["p14_target_encoding"].fn(spark, SF).collect()
    # reconstruct the global mean from the orderpriority slice (it
    # partitions all orders)
    pri = [r for r in rows if r.feature == "orderpriority"]
    gmean = sum(r.raw_mean * r.n for r in pri) / sum(r.n for r in pri)
    for r in rows:
        lo, hi = min(r.raw_mean, gmean), max(r.raw_mean, gmean)
        assert lo - 0.01 <= r.encoded <= hi + 0.01, r
        # shrinkage weight is n/(n+m): bigger n -> closer to raw_mean
        expected = (r.raw_mean * r.n + gmean * 100) / (r.n + 100)
        assert abs(r.encoded - expected) < 0.02, r


def test_feature_hashing_unit_norm_and_dims(spark):
    rows = load_all()["v04_feature_hashing"].fn(spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.bucket < 16
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        sq = sum(r.weight**2 for r in rs)
        assert math.isclose(sq, 1.0, rel_tol=1e-3), (lang, sq)
        assert len({r.bucket for r in rs}) == len(rs)
