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


def test_holt_convolution_matches_sequential_recurrence(spark):
    """ADVICE round-3: validate evt16's quantized-weight convolution
    against a sequential Python replay of the Holt recurrence.  The
    1e-10 weight grid keeps the lowering within ~1e-5 of the exact
    recurrence at test scale, well under the 1e-4 emit grid."""
    rows = load_all()["evt16_holt_trend"].fn(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for seq in by_type.values():
        assert [r.hour for r in seq] == sorted(r.hour for r in seq)
        lvl = trd = 0.0
        for r in seq:
            lvl, prev = 0.5 * r.hourly_value + 0.5 * (lvl + trd), lvl
            trd = 0.3 * (lvl - prev) + 0.7 * trd
            assert abs(r.level - lvl) < 3e-4, (r.event_type, r.hour)
            assert abs(r.trend - trd) < 3e-4, (r.event_type, r.hour)
            assert abs(r.forecast_next - (lvl + trd)) < 5e-4


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


def test_supplier_affinity_bounds(spark):
    rows = load_all()["q88_supplier_affinity"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.supp_a < r.supp_b
        assert 0 < r.n_common <= min(r.deg_a, r.deg_b)
        assert 0 < r.jaccard <= r.cosine <= 1  # AM-GM: union >= geo-mean
    js = [r.jaccard for r in rows]
    assert js == sorted(js, reverse=True)


def test_covariance_matrix_psd_and_symmetric_diag(spark):
    import numpy as np

    rows = load_all()["v05_covariance_matrix"].fn(spark, SF).collect()
    d = max(r.j for r in rows)
    assert len(rows) == d * (d + 1) // 2  # full upper triangle
    m = np.zeros((d, d))
    for r in rows:
        m[r.i - 1, r.j - 1] = m[r.j - 1, r.i - 1] = r.corr
    assert np.allclose(np.diag(m), 1.0)
    # correlation matrices are PSD up to the emitted rounding
    assert np.linalg.eigvalsh(m).min() > -1e-3


def test_weighted_sample_is_deterministic_topk(spark):
    fn = load_all()["p15_weighted_sample"].fn
    a = [tuple(r) for r in fn(spark, SF).collect()]
    b = [tuple(r) for r in fn(spark, SF).collect()]
    assert a == b  # pure function of the data, not rand()
    langs = {t[0] for t in a}
    for lang in langs:
        ranks = [t[1] for t in a if t[0] == lang]
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_equi_depth_bins_are_equal_and_ordered(spark):
    rows = load_all()["i21_equi_depth_bins"].fn(spark, SF).collect()
    assert [r.bin for r in rows] == list(range(1, 11))
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1  # equi-depth up to remainder
    for prev, cur in zip(rows, rows[1:]):
        assert prev.hi <= cur.lo  # non-overlapping, ordered ranges
        assert prev.lo <= prev.hi
