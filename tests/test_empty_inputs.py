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
