"""Round-7 third wave: shallow clone (w18), windowed funnel (q95), n-gram
novelty (t30), multi-char-delimiter CSV (src22).  Cross-engine parity is
covered by test_oracle_parity; these pin the storage semantics and plan
properties parity can't see."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from worker_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def test_shallow_clone_is_metadata_only_and_diverges(spark, tmp_path):
    """The clone must borrow the source's files (no data copy), read equal
    to the source at birth, and diverge copy-on-write: a write to the clone
    claims version 2 (the manifest counts in the version sequence) and
    never touches the source."""
    from worker_etl_spark.sinks.writer import (
        read_snapshot,
        shallow_clone,
        snapshot_write,
    )

    wh = str(tmp_path)
    base = spark.range(100).selectExpr("id", "id * 2 AS v")
    assert snapshot_write(base, wh, "ds", "t") == 1
    assert shallow_clone(wh, "ds", "t", "t_dev") == 1
    loc = os.path.join(wh, "ds", "t_dev")
    # metadata only: a manifest file, no _v1 data dir
    assert os.path.exists(os.path.join(loc, "_v1.manifest"))
    assert not os.path.isdir(os.path.join(loc, "_v1"))
    got = read_snapshot(spark, wh, "ds", "t_dev")
    assert got.agg(F.sum("v")).first()[0] == base.agg(F.sum("v")).first()[0]
    # copy-on-write divergence: next write claims v2, source untouched
    v2 = snapshot_write(
        spark.range(100).selectExpr("id", "id * 3 AS v"), wh, "ds", "t_dev"
    )
    assert v2 == 2, "manifest version was not counted in the claim sequence"
    assert (
        read_snapshot(spark, wh, "ds", "t").agg(F.sum("v")).first()[0]
        == base.agg(F.sum("v")).first()[0]
    )
    assert (
        read_snapshot(spark, wh, "ds", "t_dev").agg(F.sum("v")).first()[0]
        == 3 * 99 * 100 // 2
    )
    # birth version still readable after divergence (time travel on clones)
    assert (
        read_snapshot(spark, wh, "ds", "t_dev", version=1).count() == 100
    )


def test_shallow_clone_refuses_nonempty_destination(spark, tmp_path):
    from worker_etl_spark.sinks.writer import shallow_clone, snapshot_write

    wh = str(tmp_path)
    snapshot_write(spark.range(10), wh, "ds", "src")
    snapshot_write(spark.range(10), wh, "ds", "dst")
    with pytest.raises(ValueError, match="not empty"):
        shallow_clone(wh, "ds", "src", "dst")


def test_vacuum_handles_manifest_versions(spark, tmp_path):
    """vacuum on a cloned table must be able to retire the manifest version
    (deleting only the file LIST, never the borrowed source bytes)."""
    from worker_etl_spark.sinks.writer import (
        read_snapshot,
        shallow_clone,
        snapshot_write,
        vacuum_snapshots,
    )

    wh = str(tmp_path)
    snapshot_write(spark.range(50).selectExpr("id", "id AS v"), wh, "ds", "t")
    shallow_clone(wh, "ds", "t", "t_dev")
    for k in (2, 3):
        snapshot_write(
            spark.range(50).selectExpr("id", f"id * {k} AS v"), wh, "ds", "t_dev"
        )
    removed = vacuum_snapshots(wh, "ds", "t_dev", keep=2)
    assert removed == [1]
    assert not os.path.exists(os.path.join(wh, "ds", "t_dev", "_v1.manifest"))
    # the SOURCE's data is untouched by vacuuming the clone
    assert read_snapshot(spark, wh, "ds", "t").count() == 50


def test_q95_funnel_stages_shrink_and_respect_the_window(spark):
    """Stage counts must be monotonically non-increasing, and a hand-built
    journey where the click lands 8 days after the view must NOT convert."""
    reg = load_all()
    row = reg["q95_windowed_funnel"].fn(spark, SF).first()
    assert row.n_view >= row.n_click_7d >= row.n_purchase_7d
    # hand journey: view day 1, click day 9 (expired), purchase day 10
    rows = [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-09 00:00:00", "click"),
        (1, "2024-01-10 00:00:00", "purchase"),
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-03 00:00:00", "click"),
        (2, "2024-01-04 00:00:00", "purchase"),
    ]
    e = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")
    v = e.filter("event_type = 'view'").groupBy("user_id").agg(
        F.min("ts").alias("ts0")
    )
    c = (
        e.filter("event_type = 'click'")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("ts0"))
            & (F.col("ts") <= F.col("ts0") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    assert [r.user_id for r in c.collect()] == [2]


def test_t30_novelty_totals_are_consistent(spark):
    """Every gram is novel in exactly one doc, so summed novel_total must
    equal the number of DISTINCT grams corpus-wide, and ppm is bounded."""
    reg = load_all()
    rows = reg["t30_ngram_novelty"].fn(spark, SF).collect()
    assert all(0 < r.novelty_ppm <= 1_000_000 for r in rows)
    assert all(r.novel_total <= r.grams_total for r in rows)
    from worker_etl_spark.functions.text import hex_int, norm_text, tokens
    from worker_etl_spark.sources.tables import read_table

    d = read_table(spark, SF, "documents")
    toks = d.select(
        "doc_id", tokens(norm_text(F.col("text"))).alias("toks")
    ).filter(F.size("toks") >= 8)
    n_distinct_grams = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 7),"
                    " i -> array_join(slice(toks, i, 8), ' '))"
                )
            ).alias("g"),
        )
        .select(hex_int(F.col("g")).alias("h"))
        .distinct()
        .count()
    )
    assert sum(r.novel_total for r in rows) == n_distinct_grams


def test_src22_single_pipes_do_not_split(spark):
    """The tag field embeds single '|' characters; a single-char split
    would produce 4+ columns and corrupt every row — parity of the column
    count and the reconstructed tag proves multi-char semantics."""
    reg = load_all()
    df = reg["src22_multichar_delim_csv"].fn(spark, SF)
    rows = df.collect()
    assert df.columns == ["s_suppkey", "tag", "acctbal_cents"]
    assert all("|" in r.tag for r in rows)
    assert all(r.acctbal_cents is not None for r in rows)


def test_q96_listagg_order_is_revenue_ranked(spark):
    """The concatenated string must list nations in exact-cents revenue
    order (name tiebreak) — the WITHIN GROUP ordering, not input order."""
    reg = load_all()
    rows = reg["q96_listagg_top_nations"].fn(spark, SF).collect()
    from worker_etl_spark.sources.tables import read_table

    o = read_table(spark, SF, "orders").selectExpr(
        "o_custkey", "CAST(round(o_totalprice * 100) AS LONG) AS cents"
    )
    c = read_table(spark, SF, "customer")
    n = read_table(spark, SF, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(F.sum("cents").alias("cents"))
        .collect()
    )
    by_seg = {}
    for r in rev:
        by_seg.setdefault(r.c_mktsegment, []).append((-r.cents, r.n_name))
    for row in rows:
        want = [nm for _, nm in sorted(by_seg[row.c_mktsegment])[:3]]
        assert row.top_nations == ", ".join(want), row.c_mktsegment


def test_d17_excludes_text_neardups_and_orders_by_distance(spark):
    """Every emitted pair must be embedding-close AND text-far: no pair may
    also appear in the rare-shingle Jaccard >= 0.5 set, and d2 must be
    within the radius bound and ascending."""
    reg = load_all()
    rows = reg["d17_semantic_neardup"].fn(spark, SF).collect()
    assert rows, "sf0.001 should still produce grid-close pairs"
    assert all(r.d2 <= 2500 for r in rows)
    assert [r.d2 for r in rows] == sorted(r.d2 for r in rows)
    from worker_etl_spark.queries.dedup_q import _jaccard_pairs

    text = {
        (r.doc_a, r.doc_b)
        for r in _jaccard_pairs(spark, SF).filter("jaccard >= 0.5").collect()
    }
    assert all((r.doc_a, r.doc_b) not in text for r in rows)
