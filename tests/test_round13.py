"""Round-13 optimization contracts: spread() plan-walk hardening, the
inference kernel's preimage/regex-fallback alignment, and the restructured
query shapes (d13 single-pass audit, d15 ids-only blocking, q21 single
array-percentile buffer, t09's pinned negative HOF result)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from worker_etl_spark.operators.inference import _lower_preimage
from worker_etl_spark.sources.tables import spread

from tests.conftest import SF_SMOKE


# --- spread() -----------------------------------------------------------------


def test_spread_skips_aggregate_frames_without_probe(spark):
    """A frame whose plan holds an exchange-implying node (here an
    Aggregate) must come back UNTOUCHED — no added repartition, and by
    construction no .rdd probe (which would execute the exchange eagerly)."""
    df = spark.range(100).groupBy((F.col("id") % 3).alias("k")).count()
    assert spread(df) is df


def test_spread_skips_join_frames(spark):
    a = spark.range(50).select(F.col("id").alias("k"))
    b = spark.range(50).select(F.col("id").alias("k"))
    j = a.join(b, "k")
    assert spread(j) is j


def test_spread_literal_containing_repartition_still_spreads(spark):
    """Round-12 ADVICE: the old substring match on the plan string would
    treat a LITERAL containing 'Repartition' as already-spread."""
    df = spark.range(10).coalesce(1).select(
        "id", F.lit("Repartition").alias("marker")
    )
    out = spread(df, min_partitions=4)
    assert out is not df
    assert out.rdd.getNumPartitions() >= 4


def test_spread_restores_width_after_narrow_repartition(spark):
    """Round-12 ADVICE: repartition(1) used to read as 'already spread'."""
    df = spark.range(100).repartition(1)
    out = spread(df, min_partitions=4)
    assert out is not df
    assert out.rdd.getNumPartitions() >= 4


def test_spread_respects_wide_repartition(spark):
    df = spark.range(100).repartition(8)
    assert spread(df, min_partitions=4) is df


def test_spread_map_columns_fall_back_to_round_robin(spark):
    """Round-12 ADVICE: xxhash64 over a MapType column raises at analysis
    time; spread must fall back to keyless repartition, not crash."""
    df = spark.range(20).coalesce(1).select(
        "id", F.create_map(F.lit("k"), F.col("id")).alias("m")
    )
    out = spread(df, min_partitions=4)
    assert out.rdd.getNumPartitions() >= 4
    assert sorted(r.id for r in out.collect()) == list(range(20))


def test_spread_scan_probe_path_unchanged(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread(df, min_partitions=4)
    assert out.rdd.getNumPartitions() >= 4
    assert out.count() == 1000


# --- inference kernel preimage / regex fallback ---------------------------------


def test_lower_preimage_mixed_case_token_rejected():
    # str.lower() never emits an uppercase letter, so 'True' has an EMPTY
    # preimage; enumerating case variants would overcount vs str.lower().
    assert _lower_preimage(("True",)) is None


def test_lower_preimage_k_and_non_ascii_rejected():
    assert _lower_preimage(("ok",)) is None  # U+212A KELVIN lowers to 'k'
    assert _lower_preimage(("café",)) is None


def test_lower_preimage_is_exact_preimage():
    variants = _lower_preimage(("true", "no"))
    assert variants is not None
    # every variant lowers into the token set…
    assert all(v.lower() in ("true", "no") for v in variants)
    # …and the enumeration is complete for the ASCII domain
    assert {"true", "True", "TRUE", "tRuE", "no", "No", "NO", "nO"} <= set(variants)
    # exhaustive-scan fact the fast path rests on: no non-ASCII codepoint
    # except U+212A lowercases to a single ASCII char
    assert "ſ".lower() == "ſ"  # long s is a casefold mapping, not lower()


def test_digit_counter_trailing_newline_agrees_across_paths(spark):
    """'123\\n' must NOT count as all-digits — RE2's '$' is end-of-text;
    the pandas fallback now fullmatches instead of re.match + '$'."""
    from worker_etl_spark.operators.inference import column_stats

    df = spark.createDataFrame(
        [("123",), ("123\n",), ("7",)], "c string"
    )
    stats = column_stats(df, ["c"])
    assert stats["c"].digits == 2


# --- restructured query shapes ---------------------------------------------------


def _plan(spark, name):
    from worker_etl_spark.queries import load_all

    df = load_all()[name].fn(spark, SF_SMOKE)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_t09_keeps_codegen_explode_shape(spark):
    """r13 negative result pinned: the in-row HOF-filter variant is
    CodegenFallback (interpreted md5 per position, measured 5.3 s vs 3.6 s)
    — t09 stays the codegen'd explode + map-side-combined aggregate."""
    plan = _plan(spark, "t09_cdc_chunking")
    assert "Generate" in plan and "HashAggregate" in plan
    assert "filter(sequence" not in plan


def test_q21_single_percentile_buffer(spark):
    """One array-percentile aggregate expression, not three scalar ones
    (the before-plan carried percentile(…0.25…), (…0.5…), (…0.75…) as three
    independent aggregate buffers)."""
    plan = _plan(spark, "q21_price_quantiles")
    assert "[0.25,0.5,0.75]" in plan
    assert "percentile(cents" in plan
    # no scalar-percentile buffer survives
    assert "0.25, 1, 0" not in plan and "0.5, 1, 0" not in plan


def test_d15_blocking_join_carries_ids_not_names(spark):
    """The variant equi-join output flows to a pair-distinct on ids only;
    names re-attach through broadcast joins afterwards."""
    plan = _plan(spark, "d15_fuzzy_entity_join")
    assert "BroadcastHashJoin" in plan


def test_q21_values_match_scalar_percentiles(spark):
    """The array-percentile rewrite is value-identical to the old three
    scalar percentile() calls on the same data."""
    from worker_etl_spark.queries import load_all
    from worker_etl_spark.sources.tables import read_table

    new = load_all()["q21_price_quantiles"].fn(spark, SF_SMOKE).collect()
    l = read_table(spark, SF_SMOKE, "lineitem")
    c = l.select(
        "l_returnflag", F.round(F.col("l_extendedprice") * 100, 0).alias("cents")
    )
    p25 = F.expr("percentile(cents, 0.25)")
    p75 = F.expr("percentile(cents, 0.75)")
    old = (
        c.groupBy("l_returnflag")
        .agg(
            F.round(p25 / 100.0, 2).alias("p25"),
            F.round(F.expr("percentile(cents, 0.5)") / 100.0, 2).alias("median"),
            F.round(p75 / 100.0, 2).alias("p75"),
            F.round((p75 - p25) / 100.0, 2).alias("iqr"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [tuple(r) for r in new] == [tuple(r) for r in old]
