"""Round-7 second wave: Q13-shape histogram (q93), largest-remainder
proration (q94), linear interpolation (i24), CUSUM change-point (evt17),
BM25 retrieval (t29), incremental dedup (d16), grid fixed-radius NN (s08).
Cross-engine value parity is covered by test_oracle_parity; these pin plan
shapes and the properties parity can't see (per-order conservation, grid
exactness vs brute force, interpolation on a hand-built series)."""

from __future__ import annotations

from pyspark.sql import functions as F

from worker_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q93_histogram_keeps_zero_order_customers(spark):
    """The LEFT join must keep customers with no (non-urgent) orders as the
    c_count = 0 bucket, and the histogram must account for every customer
    exactly once."""
    reg = load_all()
    df = reg["q93_order_count_distribution"].fn(spark, SF)
    rows = {r.c_count: r.custdist for r in df.collect()}
    from worker_etl_spark.sources.tables import read_table

    n_cust = read_table(spark, SF, "customer").count()
    assert sum(rows.values()) == n_cust
    # the zero bucket must agree with an independent anti-join count
    # (may legitimately be absent when every customer ordered)
    n_zero = (
        read_table(spark, SF, "customer")
        .join(
            read_table(spark, SF, "orders")
            .filter(F.col("o_orderpriority") != "1-URGENT")
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct(),
            "c_custkey",
            "left_anti",
        )
        .count()
    )
    assert rows.get(0, 0) == n_zero
    assert "CartesianProduct" not in _plan(df)


def test_q94_allocations_conserve_every_order_pool(spark):
    """The invariant the operator exists for: per order, allocations sum
    EXACTLY to the pool — no leaked or conjured cents, on every order."""
    from worker_etl_spark.sources.tables import read_table

    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("w"),
    )
    pool = read_table(spark, SF, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 10 + 0.5).cast("long").alias("pool_cents"),
    )
    j = li.join(pool, li.l_orderkey == pool.o_orderkey)
    shares = j.selectExpr(
        "l_orderkey",
        "pool_cents",
        "pool_cents * w DIV sum(w) OVER (PARTITION BY l_orderkey) AS base",
        "(pool_cents * w) % sum(w) OVER (PARTITION BY l_orderkey) AS srem",
        "row_number() OVER (PARTITION BY l_orderkey"
        "                   ORDER BY (pool_cents * w) % sum(w) OVER"
        "                   (PARTITION BY l_orderkey) DESC, l_linenumber) AS rk",
    )
    per_order = (
        shares.selectExpr(
            "l_orderkey",
            "pool_cents",
            "base",
            "rk",
            "pool_cents - sum(base) OVER (PARTITION BY l_orderkey) AS leftover",
        )
        .selectExpr(
            "l_orderkey",
            "pool_cents",
            "base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc",
        )
        .groupBy("l_orderkey", "pool_cents")
        .agg(F.sum("alloc").alias("total_alloc"))
    )
    bad = per_order.filter(F.col("total_alloc") != F.col("pool_cents")).count()
    assert bad == 0
    assert per_order.count() > 0


def test_q94_one_exchange_for_join_and_windows(spark):
    """The join and both window passes all key on l_orderkey — Catalyst must
    plan exactly ONE exchange for the lineitem side (plus the orders side of
    the join), not one per window."""
    reg = load_all()
    plan = _plan(reg["q94_rebate_allocation"].fn(spark, SF))
    # exchanges: lineitem->join, orders->join, final returnflag agg (+AQE
    # reads); the window passes must NOT add hashpartitioning exchanges
    n_hash_exch = plan.count("Exchange hashpartitioning")
    assert n_hash_exch <= 3, f"window passes added exchanges:\n{plan}"


def test_i24_interpolation_on_hand_series(spark):
    """Hand-built series: known days 1,4 with values 100, 400 — masked days
    2,3 must repair to exactly 200 and 300 (integer line), and an edge
    masked day with no following known point carries the previous value."""
    from worker_etl_spark.queries.inference_q import i24_linear_interpolation  # noqa: F401

    # replicate the operator's window program on a tiny frame
    rows = [
        ("a", "2024-01-01", 100, True),
        ("a", "2024-01-02", 999, False),  # true value 999 is hidden
        ("a", "2024-01-03", 999, False),
        ("a", "2024-01-04", 400, True),
        ("a", "2024-01-05", 999, False),  # edge: no next known
    ]
    df = spark.createDataFrame(
        rows, "event_type string, day_s string, c long, known boolean"
    ).selectExpr(
        "event_type",
        "CAST(day_s AS DATE) AS day",
        "c",
        "datediff(day_s, '1970-01-01') AS d",
        "known",
    )
    ctx = df.selectExpr(
        "event_type",
        "day",
        "c",
        "d",
        "known",
        "last(CASE WHEN known THEN c END, true) OVER"
        " (PARTITION BY event_type ORDER BY day"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv",
        "last(CASE WHEN known THEN d END, true) OVER"
        " (PARTITION BY event_type ORDER BY day"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd",
        "first(CASE WHEN known THEN c END, true) OVER"
        " (PARTITION BY event_type ORDER BY day"
        "  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv",
        "first(CASE WHEN known THEN d END, true) OVER"
        " (PARTITION BY event_type ORDER BY day"
        "  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd",
    ).selectExpr(
        "day",
        "CASE WHEN known THEN c"
        "     WHEN pv IS NOT NULL AND nv IS NOT NULL"
        "       THEN (pv * (nd - d) + nv * (d - pd)) DIV (nd - pd)"
        "     WHEN pv IS NOT NULL THEN pv ELSE nv END AS r",
    )
    got = {str(r.day): r.r for r in ctx.collect()}
    assert got["2024-01-02"] == 200
    assert got["2024-01-03"] == 300
    assert got["2024-01-05"] == 400  # carry-forward edge


def test_evt17_finds_a_planted_level_shift(spark):
    """A planted series flat at 100 for 10 days then flat at 1000 for 10
    days must localize the change at the last low day (t=10) — the argmax
    of |n*S_t - t*S_n| for a clean step is the boundary."""
    rows = [("x", f"2024-01-{d:02d}", 100 if d <= 10 else 1000) for d in range(1, 21)]
    df = spark.createDataFrame(rows, "event_type string, day_s string, c long")
    pre = df.selectExpr(
        "event_type",
        "CAST(day_s AS DATE) AS day",
        "sum(c) OVER (PARTITION BY event_type ORDER BY day_s"
        "             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t",
        "row_number() OVER (PARTITION BY event_type ORDER BY day_s) AS t",
        "sum(c) OVER (PARTITION BY event_type) AS s_n",
        "count(*) OVER (PARTITION BY event_type) AS n",
    ).filter("t < n")
    best = (
        pre.selectExpr("day", "t", "abs(n * s_t - t * s_n) AS dev")
        .orderBy(F.desc("dev"), "day")
        .first()
    )
    assert best.t == 10, f"change localized at t={best.t}, expected 10"


def test_t29_no_full_token_explode(spark):
    """The explode's input must be the query-term-filtered array (fan-out
    |matches|), and df/totals must arrive broadcast — the retrieval plan, not
    a corpus-wide token shuffle feeding the score join."""
    reg = load_all()
    plan = _plan(reg["t29_bm25_retrieval"].fn(spark, SF))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # the generator's input contains the filter lambda, not the raw array
    assert "filter(toks" in plan.replace("\n", " ") or "Generate explode" in plan


def test_d16_classifies_a_planted_exact_dup(spark):
    """Plant a new-batch doc (id % 10 == 7) whose normalized text equals a
    corpus doc's: it must classify exact_dup; a garbage doc classifies
    unique."""
    import worker_etl_spark.queries.dedup_q as dq

    rows = [
        (7, "Alpha  Beta\tGamma", "en", "s", 10),   # new, exact dup of 12
        (12, "alpha beta gamma", "en", "s", 10),    # corpus
        (17, "zzz qqq completely unrelated xxyyzz", "en", "s", 20),  # new
        (3, "some corpus filler text here", "en", "s", 20),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        # the shingle memo is keyed by (session, sf_dir) — a temp dir is a
        # fresh key, so no cross-test pollution
        out = {
            r.status: r.n_docs
            for r in dq.d16_incremental_dedup(spark, td).collect()
        }
    assert out.get("exact_dup") == 1
    assert out.get("unique") == 1


def test_s08_grid_matches_brute_force(spark):
    """The 3x3 cell probe must return the SAME nearest neighbor as the
    brute-force all-pairs search restricted to radius R — the grid is a
    blocking strategy, never an approximation."""
    reg = load_all()
    from worker_etl_spark.queries.similarity_q import _S08_R
    from worker_etl_spark.sources.tables import read_table

    got = {
        (r.query_id): (r.nn_id, r.d2)
        for r in reg["s08_grid_nearest_neighbor"].fn(spark, SF).collect()
    }
    p = read_table(spark, SF, "embeddings").selectExpr(
        "vec_id",
        "CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000) AS BIGINT) AS x",
        "CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS y",
    )
    import itertools

    pts = {r.vec_id: (r.x, r.y) for r in p.collect()}
    want = {}
    for q, (qx, qy) in pts.items():
        if q % 37 != 0:
            continue
        best = None
        for v, (x, y) in pts.items():
            if v == q:
                continue
            d2 = (qx - x) ** 2 + (qy - y) ** 2
            if d2 <= _S08_R * _S08_R and (best is None or (d2, v) < best):
                best = (d2, v)
        if best is not None:
            want[q] = (best[1], best[0])
    assert got == want


def test_p17_quotas_spend_the_budget_exactly(spark):
    """Largest-remainder apportionment: per-lang quotas must sum to exactly
    floor(N/10), every n_eval must equal its quota, and the two-level
    bucketed rank must select the same members as a naive per-lang window
    (the md5 prefix is a prefix of the sort key)."""
    reg = load_all()
    rows = reg["p17_stratified_split"].fn(spark, SF).collect()
    n_total = sum(r.n_docs for r in rows)
    assert sum(r.quota for r in rows) == n_total // 10
    assert all(r.n_eval == r.quota for r in rows)
    # naive-window replay of the selection at this SF
    from worker_etl_spark.sources.tables import read_table

    d = read_table(spark, SF, "documents").selectExpr(
        "doc_id", "lang", "n_chars", "md5(CAST(doc_id AS STRING)) AS h"
    )
    naive = d.selectExpr(
        "lang",
        "n_chars",
        "row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk",
    )
    quotas = {r.lang: r.quota for r in rows}
    for r in rows:
        got_chars = r.eval_chars
        want_chars = (
            naive.filter(
                (F.col("lang") == r.lang) & (F.col("rk") <= int(quotas[r.lang]))
            )
            .agg(F.coalesce(F.sum("n_chars"), F.lit(0)).alias("c"))
            .first()
            .c
        )
        assert got_chars == want_chars, r.lang
