"""Salted-join equivalence: salting must be semantics-invisible."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from worker_etl_spark.operators.joins import salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed big side: 90% of rows share key 1
    big = spark.createDataFrame(
        [(1 if i % 10 else i, float(i)) for i in range(1000)], "k long, v double"
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(0, 1000, 7)],
                                  "k long, name string")
    plain = big.join(small, ["k"]).groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv")
    )
    salted = salted_join(big, small, ["k"], salt=8).groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b")], "k long, x string")
    small = spark.createDataFrame([(1, "dim")], "k long, name string")
    rows = sorted(
        map(tuple, salted_join(big, small, ["k"], how="left", salt=4).collect())
    )
    assert rows == [(1, "a", "dim"), (2, "b", None)]


def test_salted_join_rejects_bad_salt(spark):
    df = spark.range(1).selectExpr("id AS k")
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], salt=0)


def test_bucketed_join_has_no_shuffle_before_join(spark):
    from worker_etl_spark.queries.relational import q25_bucketed_join

    # force a shuffle-family join (tiny test tables would broadcast) so the
    # bucketing claim is visible in the plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q25_bucketed_join(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # bucketed scans feed the join directly: no hash-partition exchange
        # on either join key (the only exchanges are the post-join agg on
        # o_orderpriority and the final range sort)
        assert "hashpartitioning(l_orderkey" not in plan, plan[:2000]
        assert "hashpartitioning(o_orderkey" not in plan, plan[:2000]
        assert "SelectedBucketsCount: 8 out of 8" in plan
        rows = df.collect()
        assert len(rows) == 5
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
