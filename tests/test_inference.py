"""Inference-precedence and coercion tests — the reference's quirks pinned
(FIXTURES.md F1; etl.py:860-913 precedence, etl.py:1053-1152 casts)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from worker_etl_spark.operators import inference


def _infer_one(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "c string")
    return inference.infer_schema(df)[0]["type"]


def test_all_digit_strings_stay_integer_never_date(spark):
    # FIXTURES F1 'order id' / 'zip': the ^\d+$ guard (etl.py:884)
    assert _infer_one(spark, ["20240101", "20240102", "19991231"]) == "INTEGER"
    assert _infer_one(spark, ["01234", "05678"]) == "INTEGER"


def test_zero_one_column_is_integer_not_boolean(spark):
    # int wins before the boolean check (etl.py:864-871)
    assert _infer_one(spark, ["1", "0", "1", "0"]) == "INTEGER"


def test_integral_float_strings_are_integer(spark):
    # pandas safe-casts 1.0 → Int64 (etl.py:864-871)
    assert _infer_one(spark, ["1.0", "2.0", "3.0"]) == "INTEGER"


def test_mixed_decimals_are_float(spark):
    assert _infer_one(spark, ["1.5", "2.0", "-3.25", "1e3"]) == "FLOAT"


def test_boolean_token_column(spark):
    assert _infer_one(spark, ["yes", "NO", "TRUE", "f", "Y"]) == "BOOLEAN"


def test_timestamps_and_dates(spark):
    assert _infer_one(spark, ["2024-03-01 12:34:56", "2024-03-02 00:00:00"]) == "TIMESTAMP"
    assert _infer_one(spark, ["1990-07-15", "2000-01-01"]) == "TIMESTAMP"


def test_garbage_and_fully_null_are_string(spark):
    assert _infer_one(spark, ["abc", "1", "2024-01-01"]) == "STRING"
    assert _infer_one(spark, [None, None]) == "STRING"


def test_nulls_do_not_break_numeric_inference(spark):
    assert _infer_one(spark, ["1", None, "3"]) == "INTEGER"
    assert _infer_one(spark, ["1.5", None]) == "FLOAT"


def test_typed_columns_map_directly(spark):
    df = spark.createDataFrame(
        [(1, 1.5, True, datetime.datetime(2024, 1, 1), datetime.date(2024, 1, 1))],
        "a long, b double, c boolean, d timestamp, e date",
    )
    types = {f["name"]: f["type"] for f in inference.infer_schema(df)}
    assert types == {"a": "INTEGER", "b": "FLOAT", "c": "BOOLEAN",
                     "d": "TIMESTAMP", "e": "DATE"}


def test_align_to_schema_projection(spark):
    df = spark.createDataFrame([("1", "x"), ("2.5", "y")], "a string, extra string")
    out = inference.align_to_schema(
        df, [{"name": "a", "type": "INTEGER"}, {"name": "b", "type": "FLOAT"}]
    )
    assert out.columns == ["a", "b"]  # extra dropped, b added, order = schema
    rows = out.collect()
    assert [r.a for r in rows] == [1, None]  # '2.5' not integral → NULL cell
    assert all(r.b is None for r in rows)


def test_coerce_boolean_token_map(spark):
    df = spark.createDataFrame(
        [("yes",), ("NO",), ("1.0",), ("0",), ("junk",), ("",), (None,)], "b string"
    )
    out = inference.align_to_schema(df, [{"name": "b", "type": "BOOLEAN"}])
    assert [r.b for r in out.collect()] == [True, False, True, False, None, None, None]


def test_coerce_time_normalizes_hhmmss(spark):
    df = spark.createDataFrame([("12:34:56",), ("9:05:00",), ("junk",)], "t string")
    out = inference.align_to_schema(df, [{"name": "t", "type": "TIME"}])
    assert [r.t for r in out.collect()] == ["12:34:56", "09:05:00", None]


def test_coercion_metrics_warns_on_mass_nulling(spark):
    df = spark.createDataFrame([(f"junk{i}",) for i in range(100)], "x string")
    m = inference.coercion_metrics(df, [{"name": "x", "type": "INTEGER"}])
    assert m[0]["new_nulls"] == 100 and m[0]["warn"] is True


def test_determine_schema_chain(spark):
    df = spark.createDataFrame([("1", "a")], "n string, s string")
    # pandas path
    schema = inference.determine_schema(spark, df, "nonexistent.tbl", "existing_or_pandas")
    assert {f["name"]: f["type"] for f in schema} == {"n": "INTEGER", "s": "STRING"}
    assert all(f["mode"] == "NULLABLE" for f in schema)
    # gemini path with no client → None (no heuristic fallback, etl.py:1318-1320)
    assert inference.determine_schema(spark, df, "nonexistent.tbl", "existing_or_gemini") is None
    # llm path with a fake client: hallucinated name skipped, bad type → STRING
    fake = lambda sample: [  # noqa: E731
        {"name": "n", "type": "INT64"},
        {"name": "ghost", "type": "FLOAT"},
        {"name": "s", "type": "WEIRD"},
    ]
    schema = inference.determine_schema(
        spark, df, "nonexistent.tbl", "existing_or_gemini", llm_infer=fake
    )
    assert schema == [
        {"name": "n", "type": "INT64", "mode": "NULLABLE"},
        {"name": "s", "type": "STRING", "mode": "NULLABLE"},
    ]


def test_determine_schema_no_common_columns_raises(spark):
    df = spark.createDataFrame([("1",)], "only string")
    fake = lambda sample: [{"name": "only", "type": "FLOAT"}]  # noqa: E731
    # validate drops nothing here; simulate disjoint via llm returning a name
    # not in df → validate filters it → None → chain returns None
    fake2 = lambda sample: [{"name": "ghost", "type": "FLOAT"}]  # noqa: E731
    assert (
        inference.determine_schema(spark, df, "t", "gemini_only", llm_infer=fake2) is None
    )
    assert inference.determine_schema(spark, df, "t", "gemini", llm_infer=fake) is not None


# --- widening lattice --------------------------------------------------------
def test_widen_logical_lattice():
    from worker_etl_spark.operators.inference import widen_logical

    assert widen_logical("INTEGER", "INTEGER") == "INTEGER"
    assert widen_logical("INTEGER", "FLOAT") == "FLOAT"
    assert widen_logical("FLOAT", "INTEGER") == "FLOAT"
    assert widen_logical("INTEGER", "NUMERIC") == "NUMERIC"
    assert widen_logical("FLOAT", "NUMERIC") == "FLOAT"
    assert widen_logical("TIMESTAMP", "STRING") == "STRING"
    assert widen_logical("BOOLEAN", "INTEGER") == "STRING"
    assert widen_logical("TIMESTAMP", "DATE") == "STRING"


def test_widen_schemas_union_and_order():
    from worker_etl_spark.operators.inference import widen_schemas

    s1 = [{"name": "a", "type": "INTEGER"}, {"name": "b", "type": "TIMESTAMP"}]
    s2 = [{"name": "b", "type": "STRING"}, {"name": "c", "type": "FLOAT"}]
    out = widen_schemas(s1, s2)
    assert out == [
        {"name": "a", "type": "INTEGER"},
        {"name": "b", "type": "STRING"},
        {"name": "c", "type": "FLOAT"},
    ]


def test_infer_schema_sample_knob(spark):
    """The sample knob (fraction or deterministic predicate) must decide the
    same types as the full scan on a homogeneous frame."""
    from pyspark.sql import functions as F

    from worker_etl_spark.operators.inference import infer_schema

    df = spark.range(2000).select(
        F.col("id").cast("string").alias("k"),
        (F.col("id") / 4).cast("string").alias("v"),
        F.when(F.col("id") % 2 == 0, "true").otherwise("no").alias("b"),
    )
    full = infer_schema(df)
    frac = infer_schema(df, sample=0.2, sample_seed=7)
    pred = infer_schema(df, sample=F.col("id").cast("long") % 10 == 0)
    assert full == frac == pred
    assert {f["name"]: f["type"] for f in full} == {
        "k": "INTEGER", "v": "FLOAT", "b": "BOOLEAN"
    }

    import pytest

    with pytest.raises(ValueError):
        infer_schema(df, sample=1.5)


def test_infer_schema_file_level_sample(spark, tmp_path):
    """sample_level='files' prunes whole input files (the only mode that
    saves IO at 100 TB): deterministic file choice, same decisions, and the
    scanned row count proves unselected files were never read."""
    from pyspark.sql import functions as F

    from worker_etl_spark.operators.inference import (
        _sample_input_files,
        infer_schema,
    )

    path = str(tmp_path / "multi")
    spark.range(4000).select(
        F.col("id").cast("string").alias("k"),
        (F.col("id") / 4).cast("string").alias("v"),
    ).repartition(8).write.parquet(path)
    df = spark.read.parquet(path)

    sampled = _sample_input_files(df, 0.25)
    assert len(sampled.inputFiles()) == 2  # ceil(0.25 * 8)
    assert sampled.count() < df.count()
    # deterministic: same files every call
    again = _sample_input_files(df, 0.25)
    assert sorted(sampled.inputFiles()) == sorted(again.inputFiles())
    # projection layers above the scan are preserved
    proj = df.select(F.col("k"), F.col("v"))
    assert infer_schema(proj, sample=0.25, sample_level="files") == infer_schema(df)

    import pytest

    with pytest.raises(ValueError):
        infer_schema(
            spark.range(3).select(F.col("id").cast("string").alias("s")),
            sample=0.5,
            sample_level="files",
        )


def test_file_level_sample_validates_preconditions(spark, tmp_path):
    """Round-4 ADVICE (medium): _sample_input_files must REJECT frames its
    re-read cannot faithfully reproduce — filtered lineage, renamed or
    computed columns, and non-parquet sources — with actionable errors,
    instead of silently sampling filtered-out rows or failing with a
    parquet-footer error."""
    import pytest
    from pyspark.sql import functions as F

    from worker_etl_spark.operators.inference import _sample_input_files

    path = str(tmp_path / "pq")
    spark.range(100).select(
        F.col("id").cast("string").alias("k"),
        (F.col("id") % 7).cast("string").alias("v"),
    ).repartition(4).write.parquet(path)
    df = spark.read.parquet(path)

    # a filter in the lineage would be silently dropped by the re-read
    with pytest.raises(ValueError, match="Filter"):
        _sample_input_files(df.filter(F.col("v") != "3"), 0.5)
    # a .limit(n) would likewise be silently dropped (ADVICE r5): the
    # sample would contain rows beyond the caller's limit
    with pytest.raises(ValueError, match="Limit"):
        _sample_input_files(df.limit(10), 0.5)
    # df.sample in the lineage likewise
    with pytest.raises(ValueError, match="Sample"):
        _sample_input_files(df.sample(0.5, seed=1), 0.5)
    # a renamed column cannot be recovered from the file schema
    with pytest.raises(ValueError, match="renamed or computed"):
        _sample_input_files(df.select(F.col("k").alias("key"), "v"), 0.5)
    # non-parquet sources re-read wrong: loud refusal, row-mode pointer
    csv_path = str(tmp_path / "csv")
    df.write.option("header", True).csv(csv_path)
    cdf = spark.read.option("header", True).csv(csv_path)
    with pytest.raises(ValueError, match="sample_level='rows'"):
        _sample_input_files(cdf, 0.5)
    # the happy path still works: scan + cast-projection, same names
    ok = _sample_input_files(
        df.select(*[F.col(c).cast("string").alias(c) for c in df.columns]), 0.5
    )
    assert len(ok.inputFiles()) == 2
