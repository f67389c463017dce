"""Empty-input robustness: operators must yield empty/closed-form results,
never crash, when a table filter leaves zero rows (at 100 TB, partitions
and date slices are routinely empty)."""

from __future__ import annotations

from pyspark.sql import functions as F

from worker_etl_spark.functions.text import norm_text, tokens
from worker_etl_spark.operators.graph import connected_components
from worker_etl_spark.operators.inference import align_to_schema, infer_schema
from worker_etl_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_connected_components_no_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0


def test_infer_and_align_empty_frame(spark):
    d = read_table(spark, SF, "nation").filter(F.lit(False)).select(
        F.col("n_nationkey").cast("string").alias("k"),
        F.col("n_name").alias("v"),
    )
    schema = infer_schema(d)
    # No evidence → STRING for every column, and alignment yields 0 rows.
    assert {s["type"] for s in schema} == {"STRING"}
    assert align_to_schema(d, schema).count() == 0


def test_text_pipeline_empty_documents(spark):
    d = read_table(spark, SF, "documents").filter(F.lit(False))
    out = (
        d.select("doc_id", F.size(tokens(norm_text(F.col("text")))).alias("n"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .collect()
    )
    assert out[0].n_docs == 0


def test_session_windows_empty_events(spark):
    from worker_etl_spark.streaming.event_time import session_window_aggregate

    e = read_table(spark, SF, "events").filter(F.lit(False))
    assert session_window_aggregate(e).count() == 0


def test_interval_join_empty_side(spark):
    from worker_etl_spark.streaming.event_time import interval_join

    e = read_table(spark, SF, "events")
    left = e.filter(F.lit(False)).select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    )
    right = e.select("user_id", F.col("ts").alias("r_ts"))
    assert interval_join(
        left, right, key_col="user_id", left_ts="l_ts", right_ts="r_ts"
    ).count() == 0


def test_cusum_closed_form_single_event_user(spark):
    """A user with one event must get S = max(0, c - k) exactly — the
    closed form's P_0 = 0 anchor (min includes the implicit empty prefix)."""
    from worker_etl_spark.queries import load_all

    rows = {
        r.user_id: r
        for r in load_all()["evt08_cusum_alerts"].fn(spark, SF).collect()
    }
    assert rows  # sanity
    for r in rows.values():
        assert r.final_s >= 0 and r.max_s >= 0
        assert r.n_alerts <= r.n_events


def test_pagerank_mass_is_conserved_modulo_truncation(spark):
    """Fixed-point PageRank: total rank can only LOSE mass to integer
    truncation (never gain), and every rank is positive."""
    from worker_etl_spark.queries import load_all
    from worker_etl_spark.queries.relational import _PR_SCALE

    rows = load_all()["q54_pagerank_transitions"].fn(spark, SF).collect()
    total = sum(r.rank_scaled for r in rows)
    assert 0 < total <= _PR_SCALE
    # truncation loss is bounded: per node per stage ≤ a few units of the
    # last place times edge count; at this scale < 0.1% of total mass
    assert total > _PR_SCALE * 0.99
    assert all(r.rank_scaled > 0 for r in rows)


def test_substring_dup_share_tiny_docs_drop_out(spark):
    """Docs shorter than the gram width must be absent from t14's output,
    not crash the window transform."""
    from worker_etl_spark.queries.text_q import _SUB_N

    d = read_table(spark, SF, "documents")
    short_ids = {
        r.doc_id
        for r in d.select(
            "doc_id", F.size(tokens(norm_text(F.col("text")))).alias("n")
        )
        .filter(F.col("n") < _SUB_N)
        .collect()
    }
    from worker_etl_spark.queries import load_all

    out_ids = {
        r.doc_id for r in load_all()["t14_substring_dup_share"].fn(spark, SF).collect()
    }
    assert not (out_ids & short_ids)


def test_gapfill_empty_revenue_days_carry_forward(spark):
    """q55: gap days carry the last observed value and flag is_gap."""
    from worker_etl_spark.queries import load_all

    rows = load_all()["q55_calendar_gapfill"].fn(spark, SF).collect()
    assert rows
    last = 0.0
    for r in rows:
        if r.is_gap:
            assert r.rev is None and r.n_sales == 0
            assert r.filled_rev == last
        else:
            assert r.rev is not None and r.filled_rev == r.rev
            last = r.rev


def test_ranks_helpers_on_empty_frames(spark):
    """global_row_number / global_running_min on zero-row inputs: no
    boundaries, no offsets, empty output, zero total — not an exception
    (the degenerate case a filtered-to-nothing upstream produces)."""
    from pyspark.sql import functions as F

    from worker_etl_spark.operators.ranks import (
        codepoint_surrogate,
        global_row_number,
        global_running_min,
        ntile_from_rn,
    )

    empty = spark.createDataFrame([], "k long, p long, id long")
    ranked, total = global_row_number(empty, ["k", "id"])
    assert total == 0 and ranked.count() == 0
    assert "rn" in ranked.columns

    rm = global_running_min(
        empty, [F.asc("k")], "p", surrogate=F.col("k"), out_name="m"
    )
    assert rm.count() == 0 and "m" in rm.columns

    # string-surrogate path, empty too
    sempty = spark.createDataFrame([], "k string, id long")
    sranked, stotal = global_row_number(
        sempty, ["k", "id"], surrogate=codepoint_surrogate(F.col("k"))
    )
    assert stotal == 0 and sranked.count() == 0

    # ntile closed form degenerates to rn when n < k
    one = spark.createDataFrame([(1, 1)], "k long, id long")
    r1, t1 = global_row_number(one, ["k", "id"])
    assert t1 == 1
    assert r1.select(ntile_from_rn(F.col("rn"), t1, 10).alias("b")).collect()[
        0
    ]["b"] == 1


def test_xlsgrid_empty_dir_and_sheetless_workbook(spark, tmp_path):
    """Zero partitions must be a clean empty frame, not a crash: an empty
    input directory plans no partitions; a workbook with no sheets (or an
    empty sheet) yields zero rows for that file."""
    from worker_etl_spark.sources.excel import write_minimal_xlsx
    from worker_etl_spark.sources.pyds import XlsGridReader, register_xlsgrid

    empty_dir = tmp_path / "none"
    empty_dir.mkdir()
    assert XlsGridReader({"path": str(empty_dir)}).partitions() == []
    register_xlsgrid(spark)
    df = spark.read.format("xlsgrid").option("path", str(empty_dir)).load()
    assert df.count() == 0 and df.columns == ["file", "sheet", "row_idx", "cells"]

    p = str(tmp_path / "empty_sheet.xlsx")
    write_minimal_xlsx(p, {"Blank": []})
    df2 = spark.read.format("xlsgrid").option("path", p).load()
    assert df2.count() == 0
    assert df2.rdd.getNumPartitions() == 1  # the sheet still plans a partition
