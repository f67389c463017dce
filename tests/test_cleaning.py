"""Unit tests for cleaning operators — semantics pinned to the reference
(clean_dataframe etl.py:624-709, sanitize_bq_name etl.py:206-222)."""

from __future__ import annotations

from pyspark.sql import functions as F

from worker_etl_spark.operators import cleaning


def test_sanitize_identifier_reference_cases():
    s = cleaning.sanitize_identifier
    assert s("  Customer Name ") == "Customer_Name"
    assert s("Customer-Name") == "Customer_Name"
    assert s("order id") == "order_id"
    assert s("9lives") == "_9lives"
    assert s("") == "_unnamed"
    assert s("   ") == "_unnamed"
    assert s("!!!") == "___"  # non-word -> _, starts with _ already
    assert s("a" * 400) == "a" * 300
    assert s(42) == "42" == "42"[:300] or s(42) == "_42"  # non-str input
    assert s(42) == "_42"


def test_dedupe_identifiers_suffixing():
    out = cleaning.dedupe_identifiers(["a", "b", "a", "a", "b"])
    assert out == ["a", "b", "a_1", "a_2", "b_1"]


def test_null_token_sets_distinct():
    # Detection set is case-sensitive and includes 'N/A'; cleaning set is
    # case-insensitive and includes 'nat' (reference uses two different sets).
    from worker_etl_spark.config import CLEAN_NULL_TOKENS, DETECT_NULL_TOKENS

    assert "N/A" in DETECT_NULL_TOKENS and "nat" not in DETECT_NULL_TOKENS
    assert "nat" in CLEAN_NULL_TOKENS and "N/A".lower() not in CLEAN_NULL_TOKENS


def test_normalize_and_trim(spark):
    df = spark.createDataFrame(
        [(" x ",), ("NULL",), ("NoNe",), ("nullable",), ("<NA>",), ("nat",), ("",), (None,)],
        "v string",
    )
    out = cleaning.normalize_null_tokens(cleaning.trim_strings(df))
    vals = [r.v for r in out.collect()]
    assert vals == ["x", None, None, "nullable", None, None, None, None]


def test_drop_all_null_rows_and_cols(spark):
    df = spark.createDataFrame(
        [(None, None, "a"), (None, None, None), (None, "b", "c")],
        "x string, y string, z string",
    )
    no_rows = cleaning.drop_all_null_rows(df)
    assert no_rows.count() == 2
    no_cols = cleaning.drop_all_null_cols(df)
    assert no_cols.columns == ["y", "z"]


def _grid(spark, rows):
    data = [(i, *r) for i, r in enumerate(rows)]
    ncols = len(rows[0])
    schema = f"{cleaning.ROW_ID} long, " + ", ".join(f"`{j}` string" for j in range(ncols))
    return spark.createDataFrame(data, schema)


def test_promote_header_generic_cols(spark):
    df = _grid(spark, [["region", "sales", "dt"], ["e", "1", "2024-01-01"], ["w", "2", "2024-01-02"]])
    out = cleaning.promote_header(df)
    assert [c for c in out.columns if c != cleaning.ROW_ID] == ["region", "sales", "dt"]
    assert out.count() == 2


def test_promote_header_rejects_low_distinct_first_row(spark):
    # first row all-identical -> distinct ratio fails -> no promotion
    df = _grid(spark, [["x", "x", "x"], ["a", "b", "c"], ["d", "e", "f"]])
    out = cleaning.promote_header(df)
    assert [c for c in out.columns if c != cleaning.ROW_ID] == ["0", "1", "2"]
    assert out.count() == 3


def test_promote_header_rejects_sparse_first_row(spark):
    # only 1 of 3 cells populated -> non-null ratio 1/3 < 0.6 -> no promotion
    df = _grid(spark, [["only", None, None], ["a", "b", "c"], ["d", "e", "f"]])
    out = cleaning.promote_header(df)
    assert out.count() == 3


def test_clean_table_end_to_end(spark):
    df = _grid(
        spark,
        [
            ["  Name ", "Name", "amount "],
            [" alice ", "NULL", " 1.5"],
            ["bob", "x", "none"],
        ],
    )
    out = cleaning.clean_table(df)
    cols = [c for c in out.columns if c != cleaning.ROW_ID]
    # header promoted, sanitized, duplicate suffixed
    assert cols == ["Name", "Name_1", "amount"]
    rows = {r["Name"]: r for r in out.collect()}
    assert rows["alice"]["Name_1"] is None  # 'NULL' token normalized
    assert rows["bob"]["amount"] is None  # 'none' token normalized
    assert rows["alice"]["amount"] == "1.5"  # trimmed
