"""Round-7 extension surfaces: multi-EXISTS decorrelation (q90), the
polymorphic UDTF (q91), WAP gating (w17), and the sequence gap audit (i23).
Cross-engine value parity for each is covered by test_oracle_parity; these
pin the properties parity can't see (plan shapes, schema polymorphism, the
negative WAP path, synthetic-gap arithmetic)."""

from __future__ import annotations

import pytest

from worker_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def test_q90_decorrelates_to_semi_and_anti_joins(spark):
    """The EXISTS / NOT EXISTS pair must lower to hash-partitioned LEFT SEMI
    and LEFT ANTI equi-joins on l_orderkey — never a per-row subquery
    re-scan, never a Cartesian product."""
    df = load_all()["q90_sole_late_supplier"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, "EXISTS did not decorrelate to a semi join"
    assert "LeftAnti" in plan, "NOT EXISTS did not decorrelate to an anti join"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q91_udtf_schema_is_polymorphic(spark):
    """analyze() must resolve the output schema from the literal k — the
    point of the Spark-4 polymorphic UDTF surface (q47 is the static half)."""
    from pyspark.sql.functions import udtf

    from worker_etl_spark.queries.relational import _LeadWordsUDTF

    spark.udtf.register("t_lead_words", udtf(_LeadWordsUDTF))
    five = spark.sql(
        "SELECT t.* FROM (SELECT array('a','b','c') AS toks) d, "
        "LATERAL t_lead_words(d.toks, 5) t"
    )
    assert five.columns == ["w1", "w2", "w3", "w4", "w5", "n_tokens"]
    row = five.first()
    assert (row.w1, row.w2, row.w3, row.w4, row.w5, row.n_tokens) == (
        "a", "b", "c", None, None, 3,
    )
    two = spark.sql(
        "SELECT t.* FROM (SELECT array('x') AS toks) d, "
        "LATERAL t_lead_words(d.toks, 2) t"
    )
    assert two.columns == ["w1", "w2", "n_tokens"]
    with pytest.raises(Exception, match="positive literal k"):
        spark.sql(
            "SELECT t.* FROM (SELECT array('x') AS toks) d, "
            "LATERAL t_lead_words(d.toks, 0) t"
        ).collect()


def test_w17_dirty_batch_is_never_published(spark, tmp_path):
    """The negative WAP path: a batch that fails its audit must leave NO
    readable published state at all (not a previous version, not a partial
    one) when it is the only batch — the gate, not a warning."""
    from pyspark.sql import functions as F

    from worker_etl_spark.sinks.writer import read_snapshot, snapshot_write

    wh = str(tmp_path)
    dirty = spark.range(100).select(
        F.col("id").alias("o_orderkey"),
        F.when(F.col("id") % 10 == 0, -1.0).otherwise(5.0).alias("o_totalprice"),
    )
    staging = str(tmp_path / "staging")
    dirty.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    bad = staged.filter(F.col("o_totalprice") <= 0).count()
    assert bad > 0
    # the audit fails → publish is skipped (w17's gate) → nothing readable
    published = False
    if bad == 0:  # pragma: no cover — the gate under test
        snapshot_write(staged, wh, "ds", "t")
        published = True
    assert not published
    with pytest.raises(Exception):
        read_snapshot(spark, wh, "ds", "t").count()


def test_i23_gap_audit_on_synthetic_gaps(spark, tmp_path):
    """Synthetic dense domain 0..99 with child rows missing exactly
    {10..14, 50, 90..92}: the audit must report 9 missing keys in 3 gaps,
    widest 5 long starting at 10."""
    from pyspark.sql import functions as F

    from worker_etl_spark.queries.inference_q import i23_sequence_gap_audit

    missing = set(range(10, 15)) | {50} | set(range(90, 93))
    spark.range(100).select(F.col("id").alias("o_orderkey")).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    (
        spark.range(100)
        .filter(~F.col("id").isin(*missing))
        .select(F.col("id").alias("l_orderkey"))
        .write.parquet(str(tmp_path / "lineitem.parquet"))
    )
    row = i23_sequence_gap_audit(spark, str(tmp_path)).first()
    assert row.n_expected == 100
    assert row.n_present == 91
    assert row.n_missing == 9
    assert row.n_gaps == 3
    assert row.max_gap_len == 5
    assert row.widest_gap_start == 10


def test_i23_no_missing_keys_edge(spark, tmp_path):
    """A complete child table must yield zero missing / zero gaps with NULL
    gap metrics (not a crash on the empty aggregate)."""
    from pyspark.sql import functions as F

    from worker_etl_spark.queries.inference_q import i23_sequence_gap_audit

    spark.range(50).select(F.col("id").alias("o_orderkey")).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.range(50).select(F.col("id").alias("l_orderkey")).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    row = i23_sequence_gap_audit(spark, str(tmp_path)).first()
    assert row.n_expected == 50
    assert row.n_present == 50
    assert row.n_missing == 0
    assert row.n_gaps == 0
    assert row.max_gap_len is None
    assert row.widest_gap_start is None


def test_src21_variant_path_extraction_is_typed(spark):
    """variant_get must return NATIVE typed columns (bigint/string/double),
    and nested-path traversal must reach inside the encoded binary."""
    from pyspark.sql import functions as F

    df = spark.sql(
        """SELECT parse_json(
             '{"key": 7, "meta": {"status": "F", "priority": "1-URGENT"},
               "price": 123.45}') AS v"""
    ).select(
        F.expr("variant_get(v, '$.key', 'bigint')").alias("k"),
        F.expr("variant_get(v, '$.meta.status', 'string')").alias("st"),
        F.expr("variant_get(v, '$.price', 'double')").alias("p"),
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "double",
    ]
    row = df.first()
    assert (row.k, row.st, row.p) == (7, "F", 123.45)
