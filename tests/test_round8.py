"""Round-8 surfaces: Q22-shape global-balance anti join (q98),
conversion-latency histogram (q99), OHLC conflation (evt18), centroid
distance matrix (v06).  Cross-engine parity is
covered by test_oracle_parity; these pin semantics and plan properties
parity can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from worker_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def test_q98_threshold_and_anti_semantics(spark):
    """Every surviving customer must beat the positive-balance mean AND be
    order-less — recomputed independently row-by-row at sf0.001."""
    from worker_etl_spark.sources.tables import read_table

    got = {r.nation: (r.n_custs, r.bal_cents)
           for r in load_all()["q98_global_balance_anti"].fn(spark, SF).collect()}
    cust = read_table(spark, SF, "customer").collect()
    orders = {r.o_custkey for r in
              read_table(spark, SF, "orders")
              .filter(F.col("o_orderdate") >= "2000-01-01")
              .select("o_custkey").collect()}
    nation = {r.n_nationkey: r.n_name
              for r in read_table(spark, SF, "nation").collect()}
    import math
    bc = {r.c_custkey: math.floor(r.c_acctbal * 100 + 0.5) for r in cust}
    pos = [v for v in bc.values() if v > 0]
    s, c = sum(pos), len(pos)
    expect: dict[str, list[int]] = {}
    for r in cust:
        if bc[r.c_custkey] * c > s and r.c_custkey not in orders:
            agg = expect.setdefault(nation[r.c_nationkey], [0, 0])
            agg[0] += 1
            agg[1] += bc[r.c_custkey]
    assert got == {k: tuple(v) for k, v in expect.items()}


def test_q98_plan_anti_join_and_broadcasts(spark):
    plan = (
        load_all()["q98_global_balance_anti"].fn(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q99_conversion_latency_semantics(spark):
    """Per-bucket counts equal a row-by-row recomputation: first signup,
    first purchase at-or-after it, exact microsecond floor-div to days,
    -1 for never-converted; shares are floor ppm of all signups."""
    from worker_etl_spark.sources.tables import read_table

    got = {r.days_to_convert: (r.n_users, r.share_ppm)
           for r in load_all()["q99_conversion_latency"].fn(spark, SF).collect()}
    ev = read_table(spark, SF, "events").collect()
    signups, purchases = {}, {}
    for e in ev:
        if e.event_type == "signup":
            if e.user_id not in signups or e.ts < signups[e.user_id]:
                signups[e.user_id] = e.ts
        elif e.event_type == "purchase":
            purchases.setdefault(e.user_id, []).append(e.ts)
    import datetime
    hist: dict[int, int] = {}
    for u, s in signups.items():
        after = [p for p in purchases.get(u, []) if p >= s]
        if not after:
            hist[-1] = hist.get(-1, 0) + 1
        else:
            us = int((min(after) - s) / datetime.timedelta(microseconds=1))
            d = us // 86_400_000_000
            hist[d] = hist.get(d, 0) + 1
    n = len(signups)
    expect = {d: (c, c * 1_000_000 // n) for d, c in hist.items()}
    assert got == expect and got  # (-1 appears only when someone never converts)


def test_evt18_bar_invariants_and_exact_first_last(spark):
    """low <= open, close <= high per bar; bar event counts sum to the
    table total; open/close equal the true (ts, event_id)-ordered
    first/last values recomputed independently for every bar."""
    from worker_etl_spark.sources.tables import read_table

    rows = load_all()["evt18_ohlc_conflation"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.low_cents <= r.open_cents <= r.high_cents
        assert r.low_cents <= r.close_cents <= r.high_cents
    ev = read_table(spark, SF, "events").collect()
    assert sum(r.n_events for r in rows) == len(ev)
    import math
    bars: dict = {}
    for e in ev:
        key = (e.event_type, e.ts.date().isoformat())
        bars.setdefault(key, []).append(
            ((e.ts, e.event_id), math.floor(e.value * 100 + 0.5))
        )
    for r in rows:
        seq = sorted(bars[(r.event_type, r.day)])
        assert r.open_cents == seq[0][1] and r.close_cents == seq[-1][1]


def test_v06_matrix_shape_and_numpy_parity(spark):
    """Full upper triangle over the label set; one pair re-derived with an
    independent numpy computation of the same quantized floor-div mean."""
    import numpy as np

    from worker_etl_spark.queries.similarity_q import _V06_SHIFT
    from worker_etl_spark.sources.tables import read_table

    rows = load_all()["v06_centroid_distance_matrix"].fn(spark, SF).collect()
    labels = sorted({r.label_a for r in rows} | {r.label_b for r in rows})
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    assert all(r.dist2_q >= 0 for r in rows)
    emb = read_table(spark, SF, "embeddings").collect()
    la, lb = rows[0].label_a, rows[0].label_b

    def centroid(lbl):
        vecs = [
            np.floor(np.asarray(e.embedding, dtype=np.float64) * 10000 + 0.5)
            .astype(np.int64) + _V06_SHIFT
            for e in emb if e.label == lbl
        ]
        s = np.sum(vecs, axis=0)
        return s // len(vecs), len(vecs)

    ma, na = centroid(la)
    mb, nb = centroid(lb)
    assert rows[0].n_a == na and rows[0].n_b == nb
    assert rows[0].dist2_q == int(np.sum((ma - mb) ** 2))
