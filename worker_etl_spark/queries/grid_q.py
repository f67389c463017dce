"""Grid-detection queries: the full messy-sheet → typed-table ingest path.

g01 is the flagship *ingest* slice: a spreadsheet-like grid is synthesized
from ``lineitem`` rows (padding + header row + stringified data cells, with
generic ``0..N`` column names exactly like the reference's sheet grids,
``etl.py:242-263``), then pushed through the whole pipeline —

    detect_tables (applyInPandas numpy labeling)
    → extract_table (pushed row/col slice)
    → clean_table (header promotion C1, sanitize C2/C3, null drops C4/C5,
      trim C6, null tokens C7)
    → infer_schema (I4 counter scan) → align_to_schema (I5+I6 coercion)

— and because the grid is derived from lineitem, the DuckDB oracle can state
the expected typed output directly from the source table.  A value-hash
match here certifies the entire ingest pipeline end-to-end.

g02 pins the detector's geometry on a constant multi-block sheet (two
blocks, a sub-threshold stray cell); expected bboxes/scores are literal.
Detection metadata is tiny (rows = tables, not cells), so the only collect()
in g01 moves a handful of bbox rows to the driver — the cell data itself
never leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from worker_etl_spark.operators.cleaning import ROW_ID, clean_table
from worker_etl_spark.operators.detection import detect_tables, extract_table
from worker_etl_spark.operators.inference import align_to_schema, infer_schema
from worker_etl_spark.queries import bounded_persist, local_frame, register
from worker_etl_spark.sources.tables import read_table

_N_SAMPLE = 20


def _lineitem_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Messy sheet: blank padding row, header row, stringified data rows,
    flanked by all-null columns; cell columns named '0'..'4' (grid style)."""
    l = read_table(spark, sf_dir, "lineitem")
    w = W.orderBy("l_orderkey", "l_linenumber")
    data = (
        l.select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(_N_SAMPLE)
        .select(
            F.lit("ingest.xlsx").alias("file"),
            F.lit("Sheet1").alias("sheet"),
            (F.row_number().over(w) + 1).cast("long").alias("row_idx"),
            F.lit(None).cast("string").alias("0"),
            F.col("l_orderkey").cast("string").alias("1"),
            F.col("l_quantity").cast("string").alias("2"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("3"),
            F.lit(None).cast("string").alias("4"),
        )
    )
    fixed = local_frame(
        spark,
        [
            ("ingest.xlsx", "Sheet1", 0, None, None, None, None, None),
            ("ingest.xlsx", "Sheet1", 1, None, "order key", "qty", "ship date", None),
        ],
        schema="file string, sheet string, row_idx long, "
        "`0` string, `1` string, `2` string, `3` string, `4` string",
    )
    # A sheet grid is small by nature (bounded by spreadsheet limits); one
    # partition keeps every downstream Python stage (detection, counter scan)
    # at one real task instead of ~33 near-empty ones.
    return fixed.unionByName(data).repartition(1)


@register(
    "g01_grid_ingest_e2e",
    oracle=f"""
    WITH sample AS (
      SELECT l_orderkey, l_quantity, l_shipdate
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT {_N_SAMPLE}
    )
    SELECT l_orderkey                                    AS order_key,
           CAST(l_quantity AS BIGINT)                    AS qty,
           CAST(strftime(l_shipdate, '%Y-%m-%d') AS TIMESTAMP) AS ship_date
    FROM sample ORDER BY order_key, qty, ship_date
    """,
)
def g01_grid_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The grid is tiny (N_SAMPLE+2 rows) but the pipeline makes several
    # metadata passes over it (header probe, null-col counts, type-inference
    # scan, final projection); persist so the lineitem sort + grid assembly
    # runs once, not once per pass.
    grid = bounded_persist(_lineitem_grid(spark, sf_dir), "N_SAMPLE+2-row grid")
    boxes = [r.asDict() for r in detect_tables(grid).collect()]  # metadata only
    best = max(boxes, key=lambda b: b["score"])
    block = extract_table(grid, best).withColumnRenamed("row_idx", ROW_ID)
    cleaned = clean_table(block).drop(ROW_ID)
    schema = infer_schema(cleaned)
    typed = align_to_schema(cleaned, schema)
    return typed.orderBy("order_key", "qty", "ship_date")


_G02_LAYOUT = [
    ["h1", "h2", None, None, "x1", "x2", "x3"],
    ["a", "1", None, None, "p", "9", None],
    ["b", "2", None, None, "q", None, "8"],
    ["c", "3", None, None, "r", "7", "6"],
    [None, None, None, None, "s", "5", "4"],
    [None, None, None, None, None, None, None],
    [None, None, None, "zz", None, None, None],
]


@register(
    "g02_grid_detection",
    headline=True,
    oracle="""
    SELECT * FROM (VALUES
      ('multi.xlsx', 'Sheet1', 'table_1', 0::BIGINT, 3::BIGINT, 0::BIGINT, 1::BIGINT,
       4::BIGINT, 2::BIGINT, 1.0::DOUBLE, 0.821972::DOUBLE),
      ('multi.xlsx', 'Sheet1', 'table_2', 0::BIGINT, 4::BIGINT, 4::BIGINT, 6::BIGINT,
       5::BIGINT, 3::BIGINT, 0.866667::DOUBLE, 0.759724::DOUBLE)
    ) AS t(file, sheet, table_id, min_row, max_row, min_col, max_col,
           n_rows, n_cols, density, score)
    ORDER BY table_id
    """,
)
def g02_grid_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        ("multi.xlsx", "Sheet1", i, *r) for i, r in enumerate(_G02_LAYOUT)
    ]
    grid = local_frame(
        spark,
        rows,
        schema="file string, sheet string, row_idx long, "
        + ", ".join(f"`{i}` string" for i in range(7)),
    ).repartition(1)
    return detect_tables(grid).orderBy("table_id")


# --- D7: no-detection fallback (whole-sheet single candidate) --------------------
@register(
    "g03_grid_fallback_whole_sheet",
    oracle="""
    SELECT * FROM (VALUES
      ('multi.xlsx', 'Sheet1', 'table_1', 0::BIGINT, 6::BIGINT, 0::BIGINT, 6::BIGINT,
       7::BIGINT, 7::BIGINT, 0.44898::DOUBLE, 0.47013::DOUBLE)
    ) AS t(file, sheet, table_id, min_row, max_row, min_col, max_col,
           n_rows, n_cols, density, score)
    """,
)
def g03_grid_fallback_whole_sheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 fallback mode (``detect_components=False``, reference
    ``etl.py:204`` path): the whole sheet's content bbox is scored as ONE
    candidate — same multi-block layout as g02, which in component mode
    yields two tables but here one spanning block (density 22/49)."""
    rows = [
        ("multi.xlsx", "Sheet1", i, *r) for i, r in enumerate(_G02_LAYOUT)
    ]
    grid = local_frame(
        spark,
        rows,
        schema="file string, sheet string, row_idx long, "
        + ", ".join(f"`{i}` string" for i in range(7)),
    ).repartition(1)
    return detect_tables(grid, detect_components=False).orderBy("table_id")


# --- O4: env-knob config surface drives detection end-to-end ---------------------
@register(
    "g04_detection_config_knobs",
    oracle="""
    SELECT * FROM (VALUES
      ('multi.xlsx', 'Sheet1', 'table_1', 0::BIGINT, 4::BIGINT, 4::BIGINT, 6::BIGINT,
       5::BIGINT, 3::BIGINT, 0.866667::DOUBLE, 0.759724::DOUBLE)
    ) AS t(file, sheet, table_id, min_row, max_row, min_col, max_col,
           n_rows, n_cols, density, score)
    """,
)
def g04_detection_config_knobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 live-knob surface: ``WORKER_MIN_TABLE_ROWS=5`` read through
    ``EngineConfig`` (same env names/defaults as reference ``etl.py:72-75``)
    rejects g02's 4-row block, so the SAME sheet yields ONE table — the
    5-row block, renumbered table_1.  Pins env → config → operator wiring,
    not just the dataclass defaults."""
    import os as _os

    from worker_etl_spark.config import EngineConfig

    _os.environ["WORKER_MIN_TABLE_ROWS"] = "5"
    try:
        cfg = EngineConfig()
    finally:
        del _os.environ["WORKER_MIN_TABLE_ROWS"]
    rows = [
        ("multi.xlsx", "Sheet1", i, *r) for i, r in enumerate(_G02_LAYOUT)
    ]
    grid = local_frame(
        spark,
        rows,
        schema="file string, sheet string, row_idx long, "
        + ", ".join(f"`{i}` string" for i in range(7)),
    ).repartition(1)
    return detect_tables(
        grid,
        min_rows=cfg.min_table_rows,
        min_cols=cfg.min_table_cols,
        density_threshold=cfg.block_density_threshold,
        header_confidence=cfg.min_header_confidence,
    ).orderBy("table_id")
