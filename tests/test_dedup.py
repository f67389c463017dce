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


SF001 = "/root/testdata/sf0.001"


def test_d10_band_blocking_is_complete_for_threshold(spark):
    """Pigeonhole guarantee, adversarially checked: every pair within
    hamming <= _HAM_MAX of the all-pairs ground truth must be found by the
    band-blocked join (and nothing extra)."""
    from worker_etl_spark.queries.dedup_q import (
        _HAM_MAX,
        _simhash_df,
        d10_simhash_hamming,
    )

    sims = {r.doc_id: r.simhash for r in _simhash_df(spark, SF001).collect()}
    ids = sorted(sims)
    truth = {
        (a, b, bin(sims[a] ^ sims[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sims[a] ^ sims[b]).count("1") <= _HAM_MAX
    }
    blocked = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in d10_simhash_hamming(spark, SF001).collect()
    }
    assert blocked == truth
    assert len(truth) > 0


def test_d10_output_invariant_across_band_widths(spark, monkeypatch):
    """The corpus-adaptive split (round-5 verdict #2) must not change the
    answer: every exact banding — B=4 (15-bit keys), B=5 (24-bit 2-band
    keys), B=6 (30-bit 3-band keys) — emits the identical pair set, and
    the plan picker's thresholds follow buckets >= n/τ."""
    import itertools

    from worker_etl_spark.queries import dedup_q

    results = []
    for bands in (4, 5, 6):
        band_bits = dedup_q._SIM_BITS // bands
        subsets = list(itertools.combinations(range(bands), bands - dedup_q._HAM_MAX))
        monkeypatch.setattr(
            dedup_q,
            "_ham_band_plan",
            lambda n, b=bands, bb=band_bits, s=subsets: (b, bb, s),
        )
        results.append(
            sorted(
                (r.doc_a, r.doc_b, r.hamming)
                for r in dedup_q.d10_simhash_hamming(spark, SF001).collect()
            )
        )
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0


def test_ham_band_plan_thresholds():
    """Smallest exact split with buckets >= n/τ; exactness invariants on
    every returned plan (equal split, subsets of size B-_HAM_MAX, all
    enumerated)."""
    import math

    from worker_etl_spark.queries.dedup_q import (
        _HAM_MAX,
        _HAM_TARGET_LOAD,
        _SIM_BITS,
        _ham_band_plan,
    )

    assert _ham_band_plan(1_000)[0] == 4
    assert _ham_band_plan(_HAM_TARGET_LOAD * (1 << 15))[0] == 4
    assert _ham_band_plan(_HAM_TARGET_LOAD * (1 << 15) + 1)[0] == 5
    assert _ham_band_plan(_HAM_TARGET_LOAD * (1 << 24))[0] == 5
    assert _ham_band_plan(_HAM_TARGET_LOAD * (1 << 24) + 1)[0] == 6
    assert _ham_band_plan(10**10)[0] == 6  # documented ceiling: stays exact
    for n in (0, 10**4, 10**6, 10**8, 10**10):
        bands, band_bits, subsets = _ham_band_plan(n)
        assert bands * band_bits == _SIM_BITS
        assert len(subsets) == math.comb(bands, _HAM_MAX)
        assert all(len(s) == bands - _HAM_MAX for s in subsets)
        assert len(set(subsets)) == len(subsets)


def test_d11_survivor_invariants(spark):
    """One survivor per cluster; survivor is a member; n_dropped is
    members-1; every d07 cluster is represented."""
    from worker_etl_spark.queries.dedup_q import d07_dup_clusters, d11_dedup_survivors

    clusters = {r.cluster_id: r.n_members for r in d07_dup_clusters(spark, SF001).collect()}
    surv = d11_dedup_survivors(spark, SF001).collect()
    assert {r.cluster_id for r in surv} == set(clusters)
    for r in surv:
        assert r.n_dropped == clusters[r.cluster_id] - 1
        assert r.keep_len > 0


def test_s04_recall_bounds(spark):
    from worker_etl_spark.queries.similarity_q import _TOP_K, s04_ann_recall

    rows = s04_ann_recall(spark, SF001).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_exact <= _TOP_K
        assert r.n_hit <= min(r.n_exact, r.n_ann)
        assert 0.0 <= r.recall <= 1.0


def test_p03_no_cluster_spans_splits(spark):
    """Leakage guard, checked at doc granularity: every member of a d07
    cluster must land in the same train/eval split as its cluster head."""
    from worker_etl_spark.functions.text import hex_int
    from worker_etl_spark.queries.dedup_q import _cluster_labels
    from pyspark.sql import functions as F

    labels = _cluster_labels(spark, SF001)
    split = labels.select(
        "node",
        "lbl",
        (hex_int(F.col("lbl").cast("string")) % 10 < 8).alias("is_train"),
    )
    per_cluster = split.groupBy("lbl").agg(
        F.countDistinct("is_train").alias("n_sides")
    )
    assert per_cluster.filter(F.col("n_sides") > 1).count() == 0
    assert per_cluster.count() > 0


def test_star_contraction_matches_propagation(spark):
    """Both CC algorithms must label identically: component id = min node.
    Shapes chosen to stress each: a 64-node chain (diameter 63 — the case
    star contraction exists for), two stars, a 4-cycle, random edges, and
    an isolated pair."""
    import random

    from pyspark.sql import functions as F

    from worker_etl_spark.operators.graph import connected_components

    rng = random.Random(7)
    chain = [(i, i + 1) for i in range(100, 164)]
    star_a = [(0, i) for i in range(1, 6)]
    star_b = [(50, i) for i in range(51, 55)]
    cycle = [(70, 71), (71, 72), (72, 73), (73, 70)]
    rand = [(rng.randrange(200, 240), rng.randrange(200, 240)) for _ in range(60)]
    pair = [(300, 301)]
    all_edges = chain + star_a + star_b + cycle + rand + pair
    edges = spark.createDataFrame(all_edges, "src long, dst long").filter(
        F.col("src") != F.col("dst")
    )

    prop = {
        (r.node, r.lbl)
        for r in connected_components(edges, max_iterations=80).collect()
    }
    star = {
        (r.node, r.lbl)
        for r in connected_components(edges, algorithm="star").collect()
    }
    assert star == prop and len(prop) > 0
    # Every label must be the component minimum (spot: chain + pair).
    lbl = dict(prop)
    assert all(lbl[n] == 100 for n in range(100, 165))
    assert lbl[300] == 300 and lbl[301] == 300


def test_star_contraction_empty_edges(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from worker_etl_spark.operators.graph import connected_components

    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges, algorithm="star").count() == 0


def test_propagation_raises_instead_of_truncating(spark):
    """A diameter deeper than max_iterations must raise, never silently
    return half-propagated labels."""
    import pytest

    from worker_etl_spark.operators.graph import connected_components

    chain = [(i, i + 1) for i in range(30)]
    edges = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=3)
    ok = connected_components(edges, algorithm="star", max_iterations=10)
    assert {r.lbl for r in ok.collect()} == {0}


def test_cc_algorithms_agree_on_random_graphs(spark):
    """Property: star contraction and min-label propagation produce the
    SAME (node → component-min) labeling on arbitrary graphs.  hypothesis
    drives edge lists through both; examples bounded because every check
    runs real Spark jobs."""
    from hypothesis import given, settings, strategies as st

    from worker_etl_spark.operators.graph import connected_components

    edge = st.tuples(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=0, max_value=40),
    )

    @settings(max_examples=8, deadline=None)
    @given(st.lists(edge, min_size=1, max_size=50))
    def check(pairs):
        edges = spark.createDataFrame(pairs, "src long, dst long").filter(
            "src != dst"
        )
        if not edges.take(1):
            return
        prop = {
            (r.node, r.lbl)
            for r in connected_components(edges, max_iterations=60).collect()
        }
        star = {
            (r.node, r.lbl)
            for r in connected_components(edges, algorithm="star").collect()
        }
        assert star == prop

    check()
