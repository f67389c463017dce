"""Oracle-checked queries for schema inference + coercion (I4, I5, I6).

i01 runs the engine's one-pass inference over an all-stringified ``lineitem``
and the oracle re-implements the same counter program in DuckDB SQL — so the
reference's precedence quirks (int before datetime, digit guard, 0/1 →
INTEGER) are verified engine-vs-SQL, not engine-vs-hardcoded-list.

i02 injects deterministic garbage into stringified columns and coerces them
back through ``align_to_schema`` — proving the bad-cell→NULL contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from worker_etl_spark.queries.fixtures import fixture_dir
from worker_etl_spark.config import BOOL_FALSE_TOKENS, BOOL_TRUE_TOKENS
from worker_etl_spark.operators import inference
from worker_etl_spark.queries import local_frame, register
from worker_etl_spark.sinks.writer import write_catalog_table
from worker_etl_spark.sources.tables import read_table

_LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate",
]

_BOOL_SQL = ", ".join(f"'{t}'" for t in (BOOL_TRUE_TOKENS + BOOL_FALSE_TOKENS))


def _infer_oracle_sql(source: str = "lineitem") -> str:
    """DuckDB program equivalent to the one-pass counter inference, over
    *source* (a table name or parenthesized subquery)."""
    parts = []
    for c in _LINEITEM_COLS:
        parts.append(
            f"""
    SELECT '{c}' AS column_name,
           CASE
             WHEN nn = 0 THEN 'STRING'
             WHEN num = nn AND intk = nn THEN 'INTEGER'
             WHEN num = nn THEN 'FLOAT'
             WHEN dig < total AND ts = nn THEN 'TIMESTAMP'
             WHEN boolk = nn THEN 'BOOLEAN'
             ELSE 'STRING'
           END AS inferred_type
    FROM (
      SELECT count(*) AS total,
             count(s) AS nn,
             count(TRY_CAST(s AS DOUBLE)) AS num,
             count(CASE WHEN TRY_CAST(s AS DOUBLE) = floor(TRY_CAST(s AS DOUBLE))
                         AND NOT isnan(TRY_CAST(s AS DOUBLE)) THEN 1 END) AS intk,
             count(CASE WHEN regexp_full_match(s, '\\d+') THEN 1 END) AS dig,
             count(CASE WHEN regexp_matches(s, '^\\d{{4}}-\\d{{2}}-\\d{{2}}')
                        THEN TRY_CAST(s AS TIMESTAMP) END) AS ts,
             count(CASE WHEN lower(s) IN ({_BOOL_SQL}) THEN 1 END) AS boolk
      FROM (SELECT CAST({c} AS VARCHAR) AS s FROM {source})
    )"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


@register("i01_infer_types", oracle=_infer_oracle_sql(), headline=True)
def i01_infer_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from worker_etl_spark.sources.tables import spread

    l = read_table(spark, sf_dir, "lineitem")
    # spread BEFORE the stringify (opt r12, guide §2.3/§2.4): with the
    # projection inside the repartition the cast-to-string of every cell ran
    # BELOW the exchange — serialized on the source's (single) input split —
    # and the shuffle moved the fat strings.  Exchanging the raw typed
    # columns moves fewer bytes and runs the 6.6M-cell stringify on all
    # cores after the exchange.
    stringified = spread(l.select(*_LINEITEM_COLS)).select(
        *[F.col(c).cast("string").alias(c) for c in _LINEITEM_COLS]
    )
    schema = inference.infer_schema(stringified)
    return local_frame(
        spark,
        [(f["name"], f["type"]) for f in schema],
        "column_name string, inferred_type string",
    ).orderBy("column_name")


# Deterministic ~10% sample by a Knuth multiplicative hash of the row key —
# pure 64-bit integer arithmetic, identical in any engine, no md5 hex-string
# materialization per row (the round-3 verdict measured the md5 predicate
# costing MORE than the full scan it was meant to shortcut).
#
# Mixing + overflow discipline (round-4 ADVICE): the naive
# ``(k*2654435761 + l) % 100`` never mixes — mod 100 sees only a fixed
# residue permutation of ``k % 100`` — and ``k*2654435761`` overflows
# int64 once orderkeys pass ~3.5e9 (large SF), where Spark wraps
# silently while DuckDB raises.  So: reduce the key mod 2^31-1 first
# (product ≤ (2^31-2)*2654435761 ≈ 5.7e18 < 2^63-1, exact on both
# engines), then take bits 16+ of the product (``>> 16`` — arithmetic
# shift of a non-negative value, identical in Spark and DuckDB) before
# the mod, so all key bits reach the sample decision.
_SAMPLED_LINEITEM = """(
      SELECT * FROM lineitem
      WHERE ((((l_orderkey % 2147483647) * 2654435761
               + l_linenumber) >> 16) % 100) < 10
    ) AS smp"""


@register("i07_sampled_infer", oracle=_infer_oracle_sql(_SAMPLED_LINEITEM), headline=True)
def i07_sampled_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i01's inference through the ``sample`` knob — the 100 TB posture
    (SURVEY §4.2): the counter scan decides types from a deterministic
    ~10% sample (Knuth multiplicative hash of the integer row key,
    high-bits-before-mod — a few integer instructions, reproducible on
    any engine or cluster layout) and must still decide the identical
    types.  The
    oracle re-runs the full counter program over the SAME sample, so the
    knob's filter semantics are value-checked, not just the final types.

    IO honesty at 100 TB: a row predicate prunes CPU, not reads — every
    byte still comes off disk.  The reads-pruning variant is
    ``infer_schema(..., sample=0.1, sample_level="files")``, which
    prunes whole input files before the scan (unit-tested in
    tests/test_inference.py); it is not oracle-checkable because the
    file split is engine-specific, so this query pins the row-predicate
    contract instead."""
    from worker_etl_spark.sources.tables import spread

    l = read_table(spark, sf_dir, "lineitem")
    # spread before the stringify — same single-split-cast fix as i01.
    stringified = spread(l.select(*_LINEITEM_COLS)).select(
        *[F.col(c).cast("string").alias(c) for c in _LINEITEM_COLS]
    )
    # the knob filters the already-stringified frame, so cast the key back
    # (exact for integer-valued strings; still no hashing, no hex strings).
    # Same mix as _SAMPLED_LINEITEM above: reduce mod 2^31-1 (no int64
    # overflow at any SF), multiply, take bits 16+ so mod 100 sees mixed
    # bits instead of k % 100's fixed residue permutation.
    pred = (
        F.shiftright(
            (F.col("l_orderkey").cast("bigint") % F.lit(2147483647))
            * F.lit(2654435761)
            + F.col("l_linenumber").cast("bigint"),
            16,
        ) % 100
    ) < 10
    schema = inference.infer_schema(stringified, sample=pred)
    return local_frame(
        spark,
        [(f["name"], f["type"]) for f in schema],
        "column_name string, inferred_type string",
    ).orderBy("column_name")


_I02_TARGET = [
    {"name": "qty", "type": "INTEGER"},
    {"name": "price", "type": "FLOAT"},
    {"name": "ship", "type": "TIMESTAMP"},
    {"name": "flag", "type": "BOOLEAN"},
    {"name": "disc", "type": "INTEGER"},
    {"name": "missing_col", "type": "FLOAT"},  # schema-only → NULL column (I5)
]


def _i02_messy_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic garbage-injected stringification of lineitem (i02/i04)."""
    l = read_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return l.select(
        F.when(k % 97 == 0, "garbage").otherwise(F.col("l_quantity").cast("string")).alias("qty"),
        F.when(k % 89 == 0, "").otherwise(F.col("l_extendedprice").cast("string")).alias("price"),
        F.when(k % 83 == 0, "not-a-date").otherwise(F.col("l_shipdate").cast("string")).alias("ship"),
        F.when(k % 5 == 0, "yes")
        .when(k % 5 == 1, "NO")
        .when(k % 5 == 2, "1.0")
        .when(k % 5 == 3, "junk")
        .otherwise("TRUE")
        .alias("flag"),
        F.col("l_discount").cast("string").alias("disc"),
        # extra column NOT in the target schema → must be dropped (I5)
        F.col("l_returnflag").alias("extra_col"),
    )


@register(
    "i02_align_coerce",
    oracle=f"""
    WITH messy AS (
      SELECT CASE WHEN l_orderkey % 97 = 0 THEN 'garbage' ELSE CAST(l_quantity AS VARCHAR) END AS qty_s,
             CASE WHEN l_orderkey % 89 = 0 THEN '' ELSE CAST(l_extendedprice AS VARCHAR) END AS price_s,
             CASE WHEN l_orderkey % 83 = 0 THEN 'not-a-date' ELSE CAST(l_shipdate AS VARCHAR) END AS ship_s,
             CASE CAST(l_orderkey % 5 AS INTEGER)
               WHEN 0 THEN 'yes' WHEN 1 THEN 'NO' WHEN 2 THEN '1.0'
               WHEN 3 THEN 'junk' ELSE 'TRUE' END AS flag_s,
             CAST(l_discount AS VARCHAR) AS disc_s
      FROM lineitem
    ),
    coerced AS (
      SELECT CASE WHEN TRY_CAST(qty_s AS DOUBLE) = floor(TRY_CAST(qty_s AS DOUBLE))
                   AND NOT isnan(TRY_CAST(qty_s AS DOUBLE))
                   AND abs(TRY_CAST(qty_s AS DOUBLE)) < 9.2e18
                  THEN CAST(TRY_CAST(qty_s AS DOUBLE) AS BIGINT) END AS qty,
             TRY_CAST(price_s AS DOUBLE) AS price,
             TRY_CAST(ship_s AS TIMESTAMP) AS ship,
             CASE WHEN lower(flag_s) IN ({", ".join(f"'{t}'" for t in BOOL_TRUE_TOKENS)}) THEN TRUE
                  WHEN lower(flag_s) IN ({", ".join(f"'{t}'" for t in BOOL_FALSE_TOKENS)}) THEN FALSE
                  END AS flag,
             CASE WHEN TRY_CAST(disc_s AS DOUBLE) = floor(TRY_CAST(disc_s AS DOUBLE))
                   AND NOT isnan(TRY_CAST(disc_s AS DOUBLE))
                   AND abs(TRY_CAST(disc_s AS DOUBLE)) < 9.2e18
                  THEN CAST(TRY_CAST(disc_s AS DOUBLE) AS BIGINT) END AS disc,
             CAST(NULL AS DOUBLE) AS missing_col
      FROM messy
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(qty) AS BIGINT) AS n_qty,
           CAST(sum(qty) AS BIGINT) AS sum_qty,
           CAST(count(price) AS BIGINT) AS n_price,
           round(sum(price), 2) AS sum_price,
           CAST(count(ship) AS BIGINT) AS n_ship,
           min(ship) AS min_ship,
           CAST(count(flag) AS BIGINT) AS n_flag,
           CAST(count(CASE WHEN flag THEN 1 END) AS BIGINT) AS n_true,
           CAST(count(disc) AS BIGINT) AS n_disc,
           CAST(count(missing_col) AS BIGINT) AS n_missing
    FROM coerced
    """,
)
def i02_align_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    messy = _i02_messy_frame(spark, sf_dir)
    aligned = inference.align_to_schema(messy, _I02_TARGET)
    return aligned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("qty").alias("n_qty"),
        F.sum("qty").cast("long").alias("sum_qty"),
        F.count("price").alias("n_price"),
        F.round(F.sum("price"), 2).alias("sum_price"),
        F.count("ship").alias("n_ship"),
        F.min("ship").alias("min_ship"),
        F.count("flag").alias("n_flag"),
        F.count(F.when(F.col("flag"), 1)).alias("n_true"),
        F.count("disc").alias("n_disc"),
        F.count("missing_col").alias("n_missing"),
    )


# --- I1+I2: catalog-schema precedence over re-inference --------------------------
@register(
    "i03_catalog_schema_reingest",
    oracle="""
    WITH src AS (
      SELECT CAST(l_orderkey AS VARCHAR) AS order_key,
             CAST(l_quantity AS VARCHAR) AS qty,
             CAST(l_shipdate AS VARCHAR) AS ship_date
      FROM lineitem WHERE l_orderkey <= 500
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_rows,
           CAST(sum(CAST(order_key AS BIGINT)) AS BIGINT) AS sum_order_key,
           round(sum(CAST(qty AS DOUBLE)), 2)             AS sum_qty,
           min(CAST(ship_date AS TIMESTAMP))              AS min_ship
    FROM src
    """,
)
def i03_catalog_schema_reingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``existing_or_*`` chain end-to-end (etl.py:934-948):
    a sink table's schema wins over re-inference on the next ingest.

    First load: the stringified source is aligned to a target where ``qty``
    is FLOAT and written with ``saveAsTable`` (catalog-registered).  Second
    load of the SAME strings uses ``determine_schema(existing_or_pandas)``:
    the schema must come from the catalog lookup (I2) — heuristic inference
    (I4) would type integral-string ``qty`` as INTEGER, so ``sum_qty``
    arriving as DOUBLE in the result schema is the proof the catalog won.
    """
    l = read_table(spark, sf_dir, "lineitem")
    src = l.filter(F.col("l_orderkey") <= 500).select(
        F.col("l_orderkey").cast("string").alias("order_key"),
        F.col("l_quantity").cast("string").alias("qty"),
        F.col("l_shipdate").cast("string").alias("ship_date"),
    )
    first_load = inference.align_to_schema(
        src,
        [
            {"name": "order_key", "type": "INTEGER"},
            {"name": "qty", "type": "FLOAT"},
            {"name": "ship_date", "type": "TIMESTAMP"},
        ],
    )
    ident = write_catalog_table(
        first_load, "ingest_ws", "reingest_demo", "WRITE_TRUNCATE"
    )
    schema = inference.determine_schema(spark, src, ident, "existing_or_pandas")
    assert {f["name"]: f["type"] for f in schema} == {
        "order_key": "INTEGER", "qty": "FLOAT", "ship_date": "TIMESTAMP",
    }, "catalog lookup (I2) must supply the schema, not re-inference"
    aligned = inference.align_to_schema(src, schema)
    return aligned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("order_key").cast("long").alias("sum_order_key"),
        F.round(F.sum("qty"), 2).alias("sum_qty"),
        F.min("ship_date").alias("min_ship"),
    )


# --- I7: coercion-quality metrics -------------------------------------------------
@register(
    "i04_coercion_metrics",
    oracle="""
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(CASE WHEN l_orderkey % 97 = 0 THEN 1 END) AS BIGINT) AS qty_new,
             CAST(count(CASE WHEN l_orderkey % 89 = 0 THEN 1 END) AS BIGINT) AS price_new,
             CAST(count(CASE WHEN l_orderkey % 83 = 0 THEN 1 END) AS BIGINT) AS ship_new,
             CAST(count(CASE WHEN l_orderkey % 5 = 3 THEN 1 END) AS BIGINT) AS flag_new,
             CAST(count(CASE WHEN l_discount <> floor(l_discount) THEN 1 END) AS BIGINT) AS disc_new
      FROM lineitem
    )
    SELECT name, CAST(0 AS BIGINT) AS original_nulls, new_nulls, n_rows,
           (new_nulls > 0.1 * n_rows AND new_nulls > 5) AS warn
    FROM (
      SELECT 'qty' AS name, qty_new AS new_nulls, n_rows FROM base
      UNION ALL SELECT 'price', price_new, n_rows FROM base
      UNION ALL SELECT 'ship', ship_new, n_rows FROM base
      UNION ALL SELECT 'flag', flag_new, n_rows FROM base
      UNION ALL SELECT 'disc', disc_new, n_rows FROM base
    )
    ORDER BY name
    """,
)
def i04_coercion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I7: per-column new-NULL accounting for a coercion, one scan
    (reference warn rule: >10% and >5 new NULLs, etl.py:1121-1126).

    The i02 messy frame is the fixture: 'junk' booleans null ~20% of
    ``flag`` and fractional discounts bulk-null under the INTEGER target
    (both warn); qty/price/ship garbage stays ~1% (no warn).
    """
    messy = _i02_messy_frame(spark, sf_dir)
    metrics = inference.coercion_metrics(messy, _I02_TARGET)
    return local_frame(
        spark,
        [
            (m["name"], m["original_nulls"], m["new_nulls"], m["rows"], m["warn"])
            for m in metrics
        ],
        "name string, original_nulls long, new_nulls long, n_rows long, warn boolean",
    ).orderBy("name")


# --- i05: schema evolution across file batches (mergeSchema + align) ---------
@register(
    "i05_schema_evolution",
    oracle="""
    SELECT n_nationkey::BIGINT AS n_nationkey, n_name,
           CASE WHEN n_nationkey < 10 THEN NULL
                ELSE n_regionkey END::BIGINT AS n_regionkey
    FROM nation ORDER BY n_nationkey
    """,
)
def i05_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema DRIFT between ingest batches: batch 1 lands without
    ``n_regionkey``, batch 2 adds it.  ``mergeSchema`` unions the file
    footers (old rows read as NULL for the new column), then I5 alignment
    pins the evolved frame to the declared target — the standard
    append-only evolution path a long-lived warehouse table needs.  Footer
    merging is metadata-scale work; no data pass happens until the scan."""
    import os as _os

    from worker_etl_spark.operators.inference import align_to_schema

    n = read_table(spark, sf_dir, "nation")
    tmp = fixture_dir("i05")
    loc = _os.path.join(tmp, "evolving")
    n.filter(F.col("n_nationkey") < 10).select("n_nationkey", "n_name").write.mode(
        "overwrite"
    ).parquet(loc)
    n.filter(F.col("n_nationkey") >= 10).select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("append").parquet(loc)
    merged = spark.read.option("mergeSchema", "true").parquet(loc)
    target = [
        {"name": "n_nationkey", "type": "INTEGER"},
        {"name": "n_name", "type": "STRING"},
        {"name": "n_regionkey", "type": "INTEGER"},
    ]
    return align_to_schema(merged, target).orderBy("n_nationkey")


# --- i06: conflicting-batch type widening ------------------------------------
@register(
    "i06_type_widening",
    oracle="""
    SELECT n_nationkey::BIGINT AS id,
           CASE WHEN n_nationkey < 13 THEN n_nationkey::DOUBLE
                ELSE n_nationkey + 0.5 END AS v,
           CASE WHEN n_nationkey < 13
                THEN '2024-01-' || lpad((n_nationkey % 27 + 1)::VARCHAR, 2, '0')
                ELSE 'n/a-' || n_name END AS w
    FROM nation ORDER BY id
    """,
)
def i06_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type DRIFT between ingest batches (the case i05's column-add drift
    doesn't cover): batch 1 infers ``v`` INTEGER and ``w`` TIMESTAMP, batch
    2 infers ``v`` FLOAT and ``w`` STRING.  The widening lattice
    (``operators/inference.py:widen_logical``) joins them — numerics widen
    to FLOAT, TIMESTAMP/STRING conflicts fall back to STRING — and BOTH
    batches re-align to the widened schema before the union, so the
    long-lived table's type never depends on batch arrival order.  One
    inference scan per batch + one union; no data collected."""
    from worker_etl_spark.operators.inference import (
        align_to_schema,
        infer_schema,
        widen_schemas,
    )

    n = read_table(spark, sf_dir, "nation")
    key_s = F.col("n_nationkey").cast("string")
    a = n.filter(F.col("n_nationkey") < 13).select(
        key_s.alias("id"),
        key_s.alias("v"),
        F.concat(
            F.lit("2024-01-"),
            F.lpad((F.col("n_nationkey") % 27 + 1).cast("string"), 2, "0"),
        ).alias("w"),
    )
    b = n.filter(F.col("n_nationkey") >= 13).select(
        key_s.alias("id"),
        F.concat(key_s, F.lit(".5")).alias("v"),
        F.concat(F.lit("n/a-"), F.col("n_name")).alias("w"),
    )
    widened = widen_schemas(infer_schema(a), infer_schema(b))
    out = align_to_schema(a, widened).unionByName(align_to_schema(b, widened))
    return out.orderBy("id")


def _profile_oracle_sql() -> str:
    parts = []
    for c in _LINEITEM_COLS:
        parts.append(
            f"""
    SELECT '{c}' AS column_name,
           CAST(count(*) AS BIGINT)          AS n_rows,
           CAST(count(v) AS BIGINT)          AS n_non_null,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
           min(v)                            AS min_value,
           max(v)                            AS max_value
    FROM (SELECT CAST({c} AS VARCHAR) AS v FROM lineitem)"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


@register("i08_column_profile", oracle=_profile_oracle_sql(), headline=True)
def i08_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time column profiling — the stats pane every data catalog
    shows next to an inferred schema: per column, row/non-null/distinct
    counts plus lexicographic min/max over the untyped (string) view.

    Scale shape: the wide frame MELTS to (column_idx, value) with the native
    ``stack`` (an Expand node — no shuffle, no UDF), then an EXPLICIT
    two-stage aggregate: first (column, value) with map-side combine — the
    distinct-collapsing shuffle carries one row per distinct cell value,
    not per cell — then a |columns|-key rollup where every stat (counts
    via summed multiplicities, distinct via count, min/max) rides for
    free.  ~2× faster than the planner's expand-based multi-distinct for
    the same answer.  The oracle restates each column's profile
    independently with UNION ALL."""
    from worker_etl_spark.sources.tables import spread

    l = read_table(spark, sf_dir, "lineitem")
    # spread BEFORE the stringify (opt r12): the cast of 6.6M cells otherwise
    # runs below the exchange on the source's single input split, and the
    # shuffle moves strings instead of the narrower typed columns.
    stringified = spread(l.select(*_LINEITEM_COLS)).select(
        *[F.col(c).cast("string").alias(c) for c in _LINEITEM_COLS]
    )
    # Melt on a TINYINT column index, not the name string (opt r12, guide
    # §2.3 "shuffle fewer bytes"): the Expand and both aggregate exchanges
    # then carry 1 byte of column id per melted row instead of the repeated
    # name, and the column-grain SortAggregate partial sorts by an int key
    # instead of a string.  The name is re-attached from an 11-element
    # literal array AFTER the final 11-row aggregate.  (A round-12 attempt
    # that split min/max/counts into a separate scalar aggregate to dodge
    # that SortAggregate re-scanned lineitem — measured 2.05 s vs 1.49 s for
    # this single-scan shape, and it broke the one-scan plan contract
    # pinned by tests/test_plans.py.)
    n_cols = len(_LINEITEM_COLS)
    stack_args = ", ".join(
        f"CAST({i} AS TINYINT), `{c}`" for i, c in enumerate(_LINEITEM_COLS)
    )
    melted = stringified.select(
        F.expr(f"stack({n_cols}, {stack_args}) AS (ci, v)")
    )
    per_value = melted.groupBy("ci", "v").agg(F.count(F.lit(1)).alias("cnt"))
    name = F.element_at(
        F.array(*[F.lit(c) for c in _LINEITEM_COLS]), F.col("ci").cast("int") + 1
    )
    return (
        per_value.groupBy("ci")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("v").isNotNull(), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_non_null"),
            F.count("v").alias("n_distinct"),
            F.min("v").alias("min_value"),
            F.max("v").alias("max_value"),
        )
        .select(
            name.alias("column_name"),
            "n_rows",
            "n_non_null",
            "n_distinct",
            "min_value",
            "max_value",
        )
        .orderBy("column_name")
    )


# --- i09: schema evolution ON READ (mergeSchema parquet scan) ----------------
@register(
    "i09_merge_schema_scan",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT)                       AS n,
           CAST(count(o_totalprice) AS BIGINT)            AS n_with_price,
           round(sum(o_totalprice), 2)                    AS total_price
    FROM (
      SELECT o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 1
    )
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def i09_merge_schema_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution ON READ: two parquet batches of one logical table —
    an old batch written BEFORE a column existed and a new batch carrying
    it — scanned as one dataset with ``mergeSchema=true``: the footer
    schemas union, and the old batch's missing column nulls in (i05/i06
    prove WRITE-side evolution through the inference tail; this is the
    read-side half a 100 TB lake needs every time a producer adds a
    field).  The oracle reconstructs the same union arithmetically."""

    o = read_table(spark, sf_dir, "orders")
    tmp = fixture_dir("i09")
    loc = os.path.join(tmp, "orders_evolved")
    (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_orderstatus")  # old schema: no price yet
        .write.mode("overwrite")
        .parquet(os.path.join(loc, "batch=old"))
    )
    (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite")
        .parquet(os.path.join(loc, "batch=new"))
    )
    merged = spark.read.option("mergeSchema", "true").parquet(loc)
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("o_totalprice").alias("n_with_price"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


# --- i10: distribution-drift detection (PSI over fixed price bins) -------------
_PSI_BIN_W = 50_000   # fixed o_totalprice bin width (price range ≈ 0–500k);
_PSI_BINS = 10        # fixed boundaries, NOT quantiles — keeps binning exact
_PSI_SMOOTH = 1       # Laplace add-one so empty bins never hit ln(0)


@register(
    "i10_drift_psi",
    oracle=f"""
    WITH binned AS (
      SELECT o_orderkey % 2 AS split,
             least(CAST(floor(o_totalprice / {_PSI_BIN_W}) AS BIGINT),
                   {_PSI_BINS - 1}) AS bin
      FROM orders
    ),
    counts AS (
      SELECT bin,
             count(*) FILTER (WHERE split = 0) AS n_a,
             count(*) FILTER (WHERE split = 1) AS n_b
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(n_a) AS t_a, sum(n_b) AS t_b FROM counts),
    probs AS (
      SELECT bin, n_a, n_b,
             (n_a + {_PSI_SMOOTH}) / CAST(t_a + {_PSI_BINS * _PSI_SMOOTH} AS DOUBLE) AS p_a,
             (n_b + {_PSI_SMOOTH}) / CAST(t_b + {_PSI_BINS * _PSI_SMOOTH} AS DOUBLE) AS p_b
      FROM counts, tot
    )
    SELECT bin,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(p_a, 6) AS p_a,
           round(p_b, 6) AS p_b,
           round((p_a - p_b) * ln(p_a / p_b), 6) AS psi_term
    FROM probs ORDER BY bin
    """,
)
def i10_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift check between two halves of the
    orders feed (the ingest-monitoring primitive that catches a schema-
    compatible but DISTRIBUTION-shifted upstream change before it poisons a
    training run).  Bins are FIXED price intervals, not quantiles — so
    binning is exact integer arithmetic and the two engines can't disagree
    on bin edges; add-one smoothing keeps ln() defined on empty bins.  The
    per-bin PSI term (p_a − p_b)·ln(p_a/p_b) is emitted per bin (Σ over the
    output is the headline PSI).

    Scale shape: one scan → one |bins|-key aggregate (map-side combined) —
    counts are the only thing shuffled; probabilities and logs happen on
    |bins| rows.  The split here is a deterministic orderkey parity so the
    oracle can replay it; in production it is yesterday's batch vs today's.
    No reference counterpart (driver-mandated extension, SURVEY.md §2)."""
    o = read_table(spark, sf_dir, "orders")
    binned = o.select(
        (F.col("o_orderkey") % 2).alias("split"),
        F.least(
            F.floor(F.col("o_totalprice") / _PSI_BIN_W).cast("long"),
            F.lit(_PSI_BINS - 1).cast("long"),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("split") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("split") == 1, 1)).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    probs = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        (
            (F.col("n_a") + _PSI_SMOOTH)
            / (F.col("t_a") + _PSI_BINS * _PSI_SMOOTH).cast("double")
        ).alias("p_a"),
        (
            (F.col("n_b") + _PSI_SMOOTH)
            / (F.col("t_b") + _PSI_BINS * _PSI_SMOOTH).cast("double")
        ).alias("p_b"),
    )
    return probs.select(
        "bin",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("p_a", 6).alias("p_a"),
        F.round("p_b", 6).alias("p_b"),
        F.round(
            (F.col("p_a") - F.col("p_b")) * F.log(F.col("p_a") / F.col("p_b")),
            6,
        ).alias("psi_term"),
    ).orderBy("bin")


# --- i11: declarative constraint audit (data-quality gate) ---------------------
@register(
    "i11_constraint_audit",
    oracle="""
    WITH checks AS (
      SELECT 'lineitem.quantity_in_1_50' AS rule,
             count(*) AS n_checked,
             count(*) FILTER (WHERE NOT (l_quantity >= 1 AND l_quantity <= 50))
               AS n_violations
      FROM lineitem
      UNION ALL
      SELECT 'lineitem.discount_in_0_0p1', count(*),
             count(*) FILTER (WHERE NOT (l_discount >= 0 AND l_discount <= 0.1))
      FROM lineitem
      UNION ALL
      SELECT 'lineitem.price_positive', count(*),
             count(*) FILTER (WHERE NOT (l_extendedprice > 0))
      FROM lineitem
      UNION ALL
      SELECT 'lineitem.orderkey_fk', count(*),
             count(*) FILTER (WHERE o_orderkey IS NULL)
      FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT 'orders.custkey_fk', count(*),
             count(*) FILTER (WHERE c_custkey IS NULL)
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    )
    SELECT rule,
           CAST(n_checked AS BIGINT)    AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           round(n_violations / CAST(n_checked AS DOUBLE), 6) AS violation_rate
    FROM checks ORDER BY rule
    """,
)
def i11_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit — the ingest-time data-quality gate
    (dbt-test / Great-Expectations shape, public practice): range checks,
    positivity, and referential-integrity rules each report
    (checked, violations, rate) in one result.  Range rules share ONE scan
    per table via conditional aggregation; each FK rule runs at KEY grain
    (i22's rule, round-4 verdict #3): the child is pre-aggregated to
    (key, rows_per_key), then LEFT-joined to the parent's distinct keys
    as a plain shuffle join — NEVER a broadcast of a fact-sized key set
    (orders/customer grow with the data; broadcasting them is a
    driver/executor OOM at 100 TB).  AQE is free to pick broadcast at
    small SF, but the plan must not force it (pinned in
    tests/test_plans.py::test_i11_no_fact_broadcast).  Equivalence with
    the oracle's row-grain LEFT JOIN is exact because parent keys are
    unique (TPC-H PKs) and a NULL child key — its own group — never
    equi-joins, so it counts as a violation on both sides.

    No reference counterpart: the reference ingests whatever coerces and
    only counts coercion failures (`etl.py:1047-1075`, mirrored in i04);
    declarative row-level rules are the missing guardrail a production
    pipeline adds first (SURVEY.md §2 Part B)."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")

    def _rule(df, name, bad):
        return df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
            F.count(F.when(bad, 1)).alias("n_violations"),
        )

    def _fk_rule(child, ckey, parent, pkey, name):
        # Key-grain FK probe: aggregate the child to (key, rows_per_key)
        # first, shuffle-LEFT-join the parent's distinct keys, and sum
        # rows_per_key over unmatched keys.  Shuffle size is bounded by
        # key cardinality, and no fact-sized frame is ever broadcast.
        keys = child.groupBy(F.col(ckey).alias("k")).agg(
            F.count(F.lit(1)).alias("rows_per_key")
        )
        parent_keys = (
            parent.select(F.col(pkey).alias("pk"))
            .filter(F.col("pk").isNotNull())
            .distinct()
        )
        joined = keys.join(parent_keys, keys.k == parent_keys.pk, "left")
        # coalesce: SUM over an empty child is NULL, but the count-based
        # contract (and the scalar-rule branch) reports 0 (ADVICE r5)
        return joined.agg(
            F.lit(name).alias("rule"),
            F.coalesce(F.sum("rows_per_key"), F.lit(0)).alias("n_checked"),
            F.coalesce(
                F.sum(F.when(F.col("pk").isNull(), F.col("rows_per_key"))),
                F.lit(0),
            ).alias("n_violations"),
        )

    li_rules = [
        _rule(l, "lineitem.quantity_in_1_50",
              ~((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50))),
        _rule(l, "lineitem.discount_in_0_0p1",
              ~((F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1))),
        _rule(l, "lineitem.price_positive", ~(F.col("l_extendedprice") > 0)),
        _fk_rule(l, "l_orderkey", o, "o_orderkey", "lineitem.orderkey_fk"),
        _fk_rule(o, "o_custkey", c, "c_custkey", "orders.custkey_fk"),
    ]
    out = li_rules[0]
    for r in li_rules[1:]:
        out = out.unionByName(r)
    return out.select(
        "rule",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.round(
            F.col("n_violations") / F.col("n_checked").cast("double"), 6
        ).alias("violation_rate"),
    ).orderBy("rule")


# --- i13: functional-dependency discovery (data profiling) ---------------------
_I13_CANDIDATES = [  # (table, lhs, rhs) — candidate "lhs determines rhs" FDs
    ("orders", "o_orderkey", "o_orderpriority"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderstatus", "o_orderpriority"),
    ("nation", "n_nationkey", "n_name"),
    ("nation", "n_regionkey", "n_name"),
    ("customer", "c_nationkey", "c_mktsegment"),
]


@register(
    "i13_fd_discovery",
    oracle="""
    WITH checks AS (
    """
    + "\n      UNION ALL\n    ".join(
        f"""
      SELECT '{t}.{lhs}->{rhs}' AS fd,
             count(*) AS n_groups,
             count(*) FILTER (WHERE nd > 1) AS n_violating
      FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS nd
            FROM {t} GROUP BY {lhs})"""
        for t, lhs, rhs in _I13_CANDIDATES
    )
    + """
    )
    SELECT fd,
           CAST(n_groups AS BIGINT)    AS n_groups,
           CAST(n_violating AS BIGINT) AS n_violating,
           (n_violating = 0)           AS holds
    FROM checks ORDER BY fd
    """,
)
def i13_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery — the data-profiling step that finds
    candidate keys and denormalization opportunities before schema design
    (the public TANE/profiling literature's core primitive, checked here
    for an explicit candidate set): "lhs → rhs" holds iff no lhs group
    contains two distinct rhs values.  Each check is one (lhs)-grain
    aggregate counting distinct rhs; violating-group counts quantify HOW
    broken a failed FD is (an `n_violating` of 2 is a data bug, 50% is a
    wrong hypothesis).

    Scale shape: one map-side-combined aggregate per candidate over only
    its two columns (scan prunes the rest); results are candidate-count
    rows.  A full lattice search would batch candidates per scan the same
    way.  No reference counterpart (SURVEY.md §2 Part B)."""
    frames = []
    for t, lhs, rhs in _I13_CANDIDATES:
        df = read_table(spark, sf_dir, t)
        g = (
            df.groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("nd"))
            .agg(
                F.lit(f"{t}.{lhs}->{rhs}").alias("fd"),
                F.count(F.lit(1)).alias("n_groups"),
                F.count(F.when(F.col("nd") > 1, 1)).alias("n_violating"),
            )
        )
        frames.append(g)
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.select(
        "fd",
        F.col("n_groups").cast("long").alias("n_groups"),
        F.col("n_violating").cast("long").alias("n_violating"),
        (F.col("n_violating") == 0).alias("holds"),
    ).orderBy("fd")


# --- i14: group-median imputation ----------------------------------------------
_I14_NULL_STRIDE = 13  # o_orderkey % stride == 0 → price masked to NULL


@register(
    "i14_median_imputation",
    oracle=f"""
    WITH masked AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % {_I14_NULL_STRIDE} = 0 THEN NULL
                  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS c
      FROM orders
    ),
    med AS (
      SELECT o_orderpriority,
             -- interpolated median of cents lands on whole or half cents:
             -- double it into exact BIGINT half-cent units
             CAST(round(quantile_cont(c, 0.5) * 2) AS BIGINT) AS med_hc
      FROM masked WHERE c IS NOT NULL GROUP BY o_orderpriority
    )
    SELECT m.o_orderpriority,
           CAST(count(*) AS BIGINT)                          AS n_rows,
           CAST(count(*) FILTER (WHERE m.c IS NULL) AS BIGINT) AS n_imputed,
           d.med_hc / 200.0                                  AS imputed_value,
           (sum(coalesce(m.c, 0)) * 2
              + count(*) FILTER (WHERE m.c IS NULL) * d.med_hc) / 200.0
                                                             AS total_after
    FROM masked m JOIN med d USING (o_orderpriority)
    GROUP BY m.o_orderpriority, d.med_hc
    ORDER BY m.o_orderpriority
    """,
)
def i14_median_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation — the standard numeric missing-value repair
    (median, not mean: robust to the skewed totals a mean would chase):
    deterministically masked prices impute from their order-priority
    group's EXACT interpolated median.  Determinism engineering: an
    interpolated median of integer cents is always a whole or half cent,
    so it is carried as BIGINT half-cent units and the post-imputation
    total is pure integer arithmetic — no float rounding boundary for a
    x.xx5 tie to flip (the q52 lesson, applied to percentiles).

    Scale shape: pass 1 computes per-group medians (an exact percentile —
    sort-based within the aggregate; the sketch path q29 is the 100 TB
    alternative); the group-grain result broadcasts back for pass 2's
    imputation + totals, the same two-pass broadcast-back plan as q56.
    No reference counterpart: the reference NULLs failed coercions and
    moves on (`etl.py:1047-1075`); imputation is the downstream repair."""
    o = read_table(spark, sf_dir, "orders")
    masked = o.select(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % _I14_NULL_STRIDE == 0, None)
        .otherwise(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("c"),
    )
    med = (
        masked.filter(F.col("c").isNotNull())
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(c, 0.5)") * 2, 0)
            .cast("long")
            .alias("med_hc")
        )
    )
    return (
        masked.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority", "med_hc")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("c").isNull(), 1)).alias("n_imputed"),
            F.sum(F.coalesce(F.col("c"), F.lit(0))).alias("sum_c"),
        )
        .select(
            "o_orderpriority",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_imputed").cast("long").alias("n_imputed"),
            (F.col("med_hc") / F.lit(200.0)).alias("imputed_value"),
            (
                (F.col("sum_c") * 2 + F.col("n_imputed") * F.col("med_hc"))
                / F.lit(200.0)
            ).alias("total_after"),
        )
        .orderBy("o_orderpriority")
    )


# --- i16: per-column value-distribution entropy --------------------------------
_I16_SCALE = 1_000_000_000  # ln terms rounded to 1e-9, summed as BIGINTs
_I16_COLS = ["o_orderstatus", "o_orderpriority"]


@register(
    "i16_column_entropy",
    oracle=f"""
    WITH counts AS (
      {" UNION ALL ".join(
          f'''SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS v,
                     count(*) AS cnt FROM orders GROUP BY 2'''
          for c in _I16_COLS
      )}
    ),
    tot AS (
      SELECT column_name, sum(cnt) AS n, count(*) AS n_distinct
      FROM counts GROUP BY column_name
    ),
    terms AS (
      SELECT c.column_name, t.n, t.n_distinct,
             -- p·log2(p) at 1e-9 fixed point: exact-integer ratio into log,
             -- rounded before the cross-value sum (order-independent)
             CAST(round((c.cnt / CAST(t.n AS DOUBLE))
                        * log2(c.cnt / CAST(t.n AS DOUBLE))
                        * {_I16_SCALE}) AS BIGINT) AS term_e9
      FROM counts c JOIN tot t USING (column_name)
    )
    SELECT column_name,
           CAST(any_value(n) AS BIGINT)          AS n_rows,
           CAST(any_value(n_distinct) AS BIGINT) AS n_distinct,
           CAST(-sum(term_e9) AS BIGINT)         AS entropy_bits_e9
    FROM terms GROUP BY column_name ORDER BY column_name
    """,
)
def i16_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column value-distribution Shannon entropy — the profiling
    number that ranks columns by information content (near-zero entropy =
    constant column, log2(n_distinct) = uniform key-like column; the
    input a feature-selection or encoding-choice pass reads next to
    i08's min/max/distinct stats).  Each −p·log2(p) term computes from an
    exact integer ratio, rounds to 1e-9, and sums as BIGINT fixed point —
    bit-identical across engines regardless of value order (t13's doc-
    grain trick at column grain).

    Scale: one (column, value)-grain counting aggregate per column (the
    UNION batches them in one job), marginals re-joined at value grain —
    distinct-value-sized, not row-sized.  No reference counterpart."""
    o = read_table(spark, sf_dir, "orders")
    counts = None
    for c in _I16_COLS:
        g = (
            o.groupBy(F.col(c).cast("string").alias("v"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(c).alias("column_name"), "v", "cnt")
        )
        counts = g if counts is None else counts.unionByName(g)
    tot = counts.groupBy("column_name").agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("n_distinct")
    )
    terms = counts.join(F.broadcast(tot), "column_name").select(
        "column_name",
        "n",
        "n_distinct",
        F.round(
            (F.col("cnt") / F.col("n").cast("double"))
            * F.log2(F.col("cnt") / F.col("n").cast("double"))
            * _I16_SCALE,
            0,
        )
        .cast("long")
        .alias("term_e9"),
    )
    return (
        terms.groupBy("column_name")
        .agg(
            F.first("n").cast("long").alias("n_rows"),
            F.first("n_distinct").cast("long").alias("n_distinct"),
            (-F.sum("term_e9")).cast("long").alias("entropy_bits_e9"),
        )
        .orderBy("column_name")
    )


# --- i17: mutual information between categorical columns -----------------------
_I17_SCALE = 1_000_000_000


@register(
    "i17_mutual_information",
    oracle=f"""
    WITH joint AS (
      SELECT o_orderstatus AS x, o_orderpriority AS y, count(*) AS cxy
      FROM orders GROUP BY 1, 2
    ),
    mx AS (SELECT x, sum(cxy) AS cx FROM joint GROUP BY x),
    my AS (SELECT y, sum(cxy) AS cy FROM joint GROUP BY y),
    n AS (SELECT sum(cxy) AS nn FROM joint),
    terms AS (
      SELECT j.x, j.y,
             -- p_xy·log2(p_xy/(p_x·p_y)) at 1e-9 fixed point from exact
             -- integer ratios; rounded per term, summed as BIGINTs
             CAST(round((j.cxy / CAST(n.nn AS DOUBLE))
                        * log2((j.cxy * n.nn) / CAST(mx.cx * my.cy AS DOUBLE))
                        * {_I17_SCALE}) AS BIGINT) AS term_e9
      FROM joint j JOIN mx USING (x) JOIN my USING (y), n
    )
    SELECT 'o_orderstatus|o_orderpriority' AS pair,
           CAST(count(*) AS BIGINT)        AS n_cells,
           CAST(sum(term_e9) AS BIGINT)    AS mi_bits_e9
    FROM terms
    """,
)
def i17_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns — the graded
    dependency measure completing the profiling ladder (i13's functional
    dependencies are the MI=H(Y) extreme; near-zero MI says the columns
    are independent and a denormalization/feature pairing buys nothing).
    Each p·log2 term computes from exact integer count ratios at 1e-9
    fixed point, so the MI estimate is bit-identical cross-engine.

    Scale: one (x, y)-grain counting aggregate; marginals re-aggregate
    FROM the joint (never rescan the fact), the 1-row total broadcasts,
    and the term table is contingency-sized.  No reference counterpart."""
    o = read_table(spark, sf_dir, "orders")
    joint = o.groupBy(
        F.col("o_orderstatus").alias("x"), F.col("o_orderpriority").alias("y")
    ).agg(F.count(F.lit(1)).alias("cxy"))
    mx = joint.groupBy("x").agg(F.sum("cxy").alias("cx"))
    my = joint.groupBy("y").agg(F.sum("cxy").alias("cy"))
    nn = joint.agg(F.sum("cxy").alias("nn"))
    terms = (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(nn))
        .select(
            F.round(
                (F.col("cxy") / F.col("nn").cast("double"))
                * F.log2(
                    (F.col("cxy") * F.col("nn"))
                    / (F.col("cx") * F.col("cy")).cast("double")
                )
                * _I17_SCALE,
                0,
            )
            .cast("long")
            .alias("term_e9"),
        )
    )
    return terms.agg(
        F.lit("o_orderstatus|o_orderpriority").alias("pair"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("term_e9").cast("long").alias("mi_bits_e9"),
    )


# --- i18: PII column detection --------------------------------------------------
_I18_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_I18_PHONE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
_I18_FLAG_SHARE = 0.10  # column is PII-likely above this match rate


@register(
    "i18_pii_column_scan",
    oracle=f"""
    WITH synth AS (
      -- deterministic mixed-content frame: a clean column, a dirty column
      -- with embedded emails/phones on key strides, and a numeric column
      SELECT c_name AS clean_name,
             CASE WHEN c_custkey % 4 = 0
                  THEN 'contact me at user' || CAST(c_custkey AS VARCHAR)
                       || '@example.com'
                  WHEN c_custkey % 7 = 0
                  THEN 'call +1-555-' || CAST(1000 + c_custkey % 9000 AS VARCHAR)
                  ELSE 'no contact info here' END AS notes,
             CAST(c_acctbal AS VARCHAR) AS balance
      FROM customer
    ),
    melted AS (
      SELECT 'clean_name' AS column_name, clean_name AS v FROM synth
      UNION ALL SELECT 'notes', notes FROM synth
      UNION ALL SELECT 'balance', balance FROM synth
    )
    SELECT column_name,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(count(*) FILTER (WHERE regexp_matches(v, '{_I18_EMAIL}')) AS BIGINT)
             AS n_email,
           CAST(count(*) FILTER (WHERE regexp_matches(v, '{_I18_PHONE}')) AS BIGINT)
             AS n_phone,
           (count(*) FILTER (WHERE regexp_matches(v, '{_I18_EMAIL}')
                                OR regexp_matches(v, '{_I18_PHONE}'))
            / CAST(count(*) AS DOUBLE) > {_I18_FLAG_SHARE}) AS pii_likely
    FROM melted GROUP BY column_name ORDER BY column_name
    """,
)
def i18_pii_column_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII COLUMN detection — the schema-level privacy scanner that runs
    BEFORE cell-level redaction (t06) makes sense: a column whose content
    matches identifier patterns above a rate threshold gets flagged for
    the redaction/quarantine policy, catching PII that landed in
    free-text columns no schema annotation covers.  Patterns are the
    shared Java-regex ∩ RE2 dialect (t06's), counting is exact, and the
    synthetic mixed-content frame is deterministic so the oracle replays
    the scan.

    Scale shape: unpivot-melt (Expand, no shuffle — i08's plan) then one
    (column)-grain conditional-count aggregate: the scanner costs one
    scan for ANY number of columns.  Composes: i18 flags → t06 redacts →
    p11 audits what remains."""
    c = read_table(spark, sf_dir, "customer")
    synth = c.select(
        F.col("c_name").alias("clean_name"),
        F.when(
            F.col("c_custkey") % 4 == 0,
            F.concat(
                F.lit("contact me at user"),
                F.col("c_custkey").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(
            F.col("c_custkey") % 7 == 0,
            F.concat(
                F.lit("call +1-555-"),
                (1000 + F.col("c_custkey") % 9000).cast("string"),
            ),
        )
        .otherwise(F.lit("no contact info here"))
        .alias("notes"),
        F.col("c_acctbal").cast("string").alias("balance"),
    )
    melted = synth.unpivot(
        ids=[], values=["clean_name", "notes", "balance"],
        variableColumnName="column_name", valueColumnName="v",
    )
    email = F.col("v").rlike(_I18_EMAIL)
    phone = F.col("v").rlike(_I18_PHONE)
    return (
        melted.groupBy("column_name")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.count(F.when(email, 1)).alias("n_email"),
            F.count(F.when(phone, 1)).alias("n_phone"),
            (
                F.count(F.when(email | phone, 1))
                / F.count(F.lit(1)).cast("double")
                > _I18_FLAG_SHARE
            ).alias("pii_likely"),
        )
        .select(
            "column_name",
            F.col("n_values").cast("long").alias("n_values"),
            F.col("n_email").cast("long").alias("n_email"),
            F.col("n_phone").cast("long").alias("n_phone"),
            "pii_likely",
        )
        .orderBy("column_name")
    )


# --- i19: Benford first-digit audit ---------------------------------------------
_I19_SCALE = 1_000_000


@register(
    "i19_benford_audit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT sum(n) AS nn FROM obs),
    spine AS (SELECT unnest(range(1, 10)) AS d)
    SELECT s.d,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n_observed,
           -- observed and Benford-expected shares at 1e-6 fixed point
           CAST(round(coalesce(o.n, 0) * {_I19_SCALE} / CAST(t.nn AS DOUBLE))
                AS BIGINT) AS obs_share_e6,
           CAST(round(log10(1.0 + 1.0 / s.d) * {_I19_SCALE}) AS BIGINT)
                AS benford_share_e6
    FROM spine s LEFT JOIN obs o ON o.d = s.d, tot t
    ORDER BY s.d
    """,
)
def i19_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (public forensic-accounting test): organic
    multi-scale amounts put ~30.1% of first digits on 1 and ~4.6% on 9
    (log10(1+1/d)); synthetic, capped, or fabricated feeds deviate — a
    one-scan fingerprint that catches generated test data masquerading as
    production, price-floor artifacts, and unit-mix bugs before any
    statistical model sees the column.  Both the observed share and the
    Benford expectation are emitted at 1e-6 fixed point from exact counts
    (log10 of the 9 constant ratios is identical IEEE on both engines),
    leaving the deviation judgment — and its threshold — to the consumer.

    Scale: first digit is a string projection of the cent integer (no
    float log in the hot path); one 9-key counting aggregate."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("nn"))
    spine = o.sparkSession.range(1, 10).select(F.col("id").alias("d"))
    return (
        spine.join(obs, "d", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_observed"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0))
                * _I19_SCALE
                / F.col("nn").cast("double"),
                0,
            )
            .cast("long")
            .alias("obs_share_e6"),
            F.round(F.log10(1.0 + 1.0 / F.col("d")) * _I19_SCALE, 0)
            .cast("long")
            .alias("benford_share_e6"),
        )
        .orderBy("d")
    )


# --- i20: chi-square independence audit between two categorical columns ---------
@register(
    "i20_chi_square",
    oracle="""
    WITH cell AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b,
             count(*) AS o FROM orders GROUP BY 1, 2
    ),
    rowt AS (SELECT a, sum(o) AS ra FROM cell GROUP BY a),
    colt AS (SELECT b, sum(o) AS cb FROM cell GROUP BY b),
    n AS (SELECT sum(o) AS n FROM cell),
    terms AS (
      SELECT cell.a, cell.b, cell.o,
             round(ra * cb / CAST(n AS DOUBLE), 4) AS expected,
             -- (o - e)^2 / e with e = ra*cb/n, all inputs exact BIGINTs
             (CAST(o AS DOUBLE) - ra * cb / CAST(n AS DOUBLE)) ** 2
               / (ra * cb / CAST(n AS DOUBLE)) AS t
      FROM cell JOIN rowt USING (a) JOIN colt USING (b) CROSS JOIN n
    )
    SELECT a AS o_orderpriority, b AS o_orderstatus,
           CAST(o AS BIGINT) AS observed, expected,
           round(t, 4)       AS chi2_term
    FROM terms
    ORDER BY a, b
    """,
)
def i20_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between two categorical columns
    (order priority x order status), reported per contingency cell:
    observed count, expected count under independence (row_total x
    col_total / N), and the cell's chi-square term (o-e)^2/e.  The full
    statistic is the sum of the last column; emitting per-cell terms
    keeps every float op a SINGLE expression over exact BIGINT counts —
    no float summation whose order could differ across engines — so the
    audit is value-hash-checked exactly.  This is the column-pair
    dependence scan a profiling pass runs before treating features as
    independent (i17's mutual information is the information-theoretic
    twin; this is the classical-statistics one).

    Scale: one hash aggregate to cell grain (cells = |A| x |B|, tiny),
    row/col margins re-aggregated from the CELL frame (never a second
    fact scan), margins broadcast back."""
    o = read_table(spark, sf_dir, "orders")
    cell = (
        o.groupBy(
            F.col("o_orderpriority").alias("a"),
            F.col("o_orderstatus").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    # No persist: cell is a deterministic tiny aggregate; re-deriving the
    # margins from its plan is cheaper than pinning executor memory for the
    # lifetime of a session that runs hundreds of registry queries
    # (round-3 ADVICE: persisted-and-never-unpersisted leak).
    rowt = cell.groupBy("a").agg(F.sum("o").alias("ra"))
    colt = cell.groupBy("b").agg(F.sum("o").alias("cb"))
    n = cell.agg(F.sum("o").alias("n"))
    e = F.col("ra") * F.col("cb") / F.col("n").cast("double")
    return (
        cell.join(F.broadcast(rowt), "a")
        .join(F.broadcast(colt), "b")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("a").alias("o_orderpriority"),
            F.col("b").alias("o_orderstatus"),
            F.col("o").cast("long").alias("observed"),
            F.round(e, 4).alias("expected"),
            F.round((F.col("o").cast("double") - e) ** 2 / e, 4).alias(
                "chi2_term"
            ),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


# --- i21: equi-depth binning (quantile discretization) ---------------------------
@register(
    "i21_equi_depth_bins",
    oracle="""
    WITH ranked AS (
      SELECT o_totalprice,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT bin,
           CAST(count(*) AS BIGINT)       AS n,
           round(min(o_totalprice), 2)    AS lo,
           round(max(o_totalprice), 2)    AS hi,
           round(sum(cents) / 100.0, 2)   AS total,
           round(sum(cents) / (100.0 * count(*)), 4) AS mean
    FROM ranked GROUP BY bin ORDER BY bin
    """,
)
def i21_equi_depth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) discretization of a numeric column into 10
    bins — the binning a feature pipeline runs before WOE encoding,
    monotonic-constraint models, or histogram-based drift checks
    (i10's PSI consumes exactly these bin edges).  The (value, key)
    tiebreak gives every engine the same bin boundaries even across
    duplicate values; per-bin totals stay exact cents.

    Scale: exact ntile needs GLOBAL ranks, but a bare `ntile() OVER
    (ORDER BY ...)` window collapses to one reducer.  The ranks come
    from `operators/ranks.py` (this query is where the pattern was
    born; it is now shared with d14/p08): deterministic range
    boundaries → parallel per-range windows → broadcast offsets.
    Determinism of the partition id also removed the old `persist()`
    that pinned executor memory across the session (round-3 ADVICE).
    Ranks then map to ntile's first-bins-get-the-remainder sizing
    closed-form.  For approximate edges at a fraction of the cost,
    q21's approx-quantile path is the sketch-based alternative."""
    from worker_etl_spark.operators.ranks import global_row_number, ntile_from_rn

    o = read_table(spark, sf_dir, "orders")
    k = 10
    parts = o.select(
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderkey",
    )
    ranked, n_rows = global_row_number(parts, ["o_totalprice", "o_orderkey"])
    return (
        ranked.withColumn("bin", ntile_from_rn(F.col("rn"), n_rows, k))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.sum("cents") / 100.0, 2).alias("total"),
            F.round(F.sum("cents") / (100.0 * F.count(F.lit(1))), 4).alias(
                "mean"
            ),
        )
        .orderBy("bin")
    )


# --- i22: referential-integrity audit over every FK edge -------------------------
_I22_EDGES = [
    # (edge label, child table, child key, parent table, parent key)
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _i22_edge_sql(label, child, ckey, parent, pkey) -> str:
    return f"""
    SELECT '{label}' AS edge,
           (SELECT count(*) FROM {child}) AS n_child_rows,
           (SELECT count(DISTINCT {ckey}) FROM {child}) AS n_child_keys,
           (SELECT count(*) FROM (
              SELECT DISTINCT {ckey} FROM {child}
              WHERE {ckey} IS NOT NULL
                AND {ckey} NOT IN (SELECT {pkey} FROM {parent}
                                   WHERE {pkey} IS NOT NULL)
           )) AS n_orphan_keys,
           (SELECT count(*) FROM {child}
            WHERE {ckey} IS NOT NULL
              AND {ckey} NOT IN (SELECT {pkey} FROM {parent}
                                 WHERE {pkey} IS NOT NULL)
           ) AS n_orphan_rows
    """


@register(
    "i22_referential_integrity",
    oracle="""
    WITH edges AS (
    """
    + "\n    UNION ALL\n".join(_i22_edge_sql(*e) for e in _I22_EDGES)
    + """
    )
    SELECT edge,
           CAST(n_child_rows AS BIGINT)  AS n_child_rows,
           CAST(n_child_keys AS BIGINT)  AS n_child_keys,
           CAST(n_orphan_keys AS BIGINT) AS n_orphan_keys,
           CAST(n_orphan_rows AS BIGINT) AS n_orphan_rows,
           round(n_orphan_rows / CAST(n_child_rows AS DOUBLE), 6)
             AS orphan_row_rate
    FROM edges ORDER BY edge
    """,
)
def i22_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across EVERY foreign-key edge of the
    schema in one report: child row/key counts, orphan keys (distinct
    child keys with no parent), orphan rows, and the orphan-row rate —
    the load-time gate a warehouse runs because distributed file drops
    and partial loads break FKs silently (no engine enforces them at
    this scale).  i11's constraint audit checks single-table invariants;
    this is the CROSS-table half.

    NULL semantics (round-3 ADVICE fix): n_child_rows counts EVERY
    child row — including NULL-FK rows, which are exactly the dirty
    data the audit exists to surface — so the orphan-row rate's
    denominator matches the oracle's `count(*)`.  Orphans are
    anti-join-semantics on both sides: NULL child keys are never
    orphans, and NULL parent keys are filtered before the NOT IN so the
    oracle can't collapse to empty when a parent key is NULL.

    Scale: each edge costs one LEFT ANTI join of the child's DISTINCT
    keys (key-grain, shuffle bounded by key cardinality) against the
    parent's distinct keys — broadcast ONLY when the parent is a true
    dim (nation/region/supplier); orders and part key sets grow with
    the fact tables, so they take the shuffle anti join and let AQE
    pick the strategy.  Child row-grain counts come from ONE aggregate
    per child table, reused across edges sharing a child.  Orphan ROW
    counts come from the per-key row counts — never a second
    full-table anti join."""
    tables = {
        t: read_table(spark, sf_dir, t)
        for t in {"lineitem", "orders", "customer", "supplier",
                  "part", "nation", "region"}
    }
    dim_parents = {"nation", "region", "supplier"}
    child_rows: dict[str, DataFrame] = {}
    out = None
    for label, child, ckey, parent, pkey in _I22_EDGES:
        cdf, pdf = tables[child], tables[parent]
        if child not in child_rows:
            child_rows[child] = cdf.agg(
                F.count(F.lit(1)).alias("n_child_rows")
            )
        keys = (
            cdf.select(F.col(ckey).alias("k"))
            .filter(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("rows_per_key"))
        )
        parent_keys = (
            pdf.select(F.col(pkey).alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
        )
        if parent in dim_parents:
            parent_keys = F.broadcast(parent_keys)
        orphans = keys.join(parent_keys, "k", "left_anti")
        stats = keys.agg(F.count(F.lit(1)).alias("n_child_keys"))
        ostats = orphans.agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_orphan_keys"),
            F.coalesce(F.sum("rows_per_key"), F.lit(0)).alias("n_orphan_rows"),
        )
        row = (
            child_rows[child]
            .crossJoin(stats)
            .crossJoin(ostats)
            .select(
                F.lit(label).alias("edge"),
                F.col("n_child_rows").cast("long"),
                F.col("n_child_keys").cast("long"),
                F.col("n_orphan_keys").cast("long"),
                F.col("n_orphan_rows").cast("long"),
                F.round(
                    F.col("n_orphan_rows")
                    / F.col("n_child_rows").cast("double"),
                    6,
                ).alias("orphan_row_rate"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("edge")


# --- i23: sequence gap audit (gaps-and-islands over an expected-dense key) ----
@register(
    "i23_sequence_gap_audit",
    oracle="""
    WITH dom AS (
      SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi FROM orders
    ),
    missing AS (
      SELECT o.o_orderkey AS k
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey)
    ),
    runs AS (
      SELECT k, k - row_number() OVER (ORDER BY k) AS grp FROM missing
    ),
    gaps AS (
      SELECT min(k) AS gap_start, CAST(count(*) AS BIGINT) AS gap_len
      FROM runs GROUP BY grp
    )
    SELECT CAST(d.hi - d.lo + 1 AS BIGINT)          AS n_expected,
           CAST(d.hi - d.lo + 1
                - (SELECT count(*) FROM missing) AS BIGINT) AS n_present,
           CAST((SELECT count(*) FROM missing) AS BIGINT)   AS n_missing,
           CAST((SELECT count(*) FROM gaps) AS BIGINT)      AS n_gaps,
           CAST((SELECT max(gap_len) FROM gaps) AS BIGINT)  AS max_gap_len,
           CAST((SELECT min(gap_start) FROM gaps
                 WHERE gap_len = (SELECT max(gap_len) FROM gaps)) AS BIGINT)
                                                            AS widest_gap_start
    FROM dom d
    """,
)
def i23_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit: which stretches of an expected-dense key
    domain have NO child rows — the "did the loader drop a chunk?" check for
    invoice numbers, kafka offsets, page ids.  Single missing keys are easy
    (i22 counts orphans); operations needs the GAPS: how many contiguous
    runs, how wide, where the widest starts — a run of 500 missing keys is
    a dead loader partition, 500 scattered keys are ordinary voids.

    Lowering: missing keys = the parent domain anti-joined against child
    keys (both pre-collapsed to key grain), then gaps-and-islands via the
    key − row_number() difference — computed with the shared DISTRIBUTED
    rank (``operators/ranks.py:global_row_number``: range-partitioned
    parallel windows + broadcast offsets), because missing keys are O(|domain|)
    in the worst case and a bare global row_number would serialize them
    through one task (the d14/p08/i21 rule; no single-partition window,
    checked by tools/audit_windows.py).  The final report is one row of
    exact BIGINTs folded from the ≤|gaps|-row aggregate.

    Scale: two key-grain shuffles (child distinct + anti join) and the
    rank's bounded driver actions.  No reference counterpart (the reference
    audits cell coercions, never key-domain completeness —
    ``etl.py:1121-1126``)."""
    from worker_etl_spark.operators.ranks import global_row_number

    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    dom = o.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    )
    missing = o.join(li, "o_orderkey", "left_anti").select(
        F.col("o_orderkey").alias("k")
    )
    ranked, n_missing = global_row_number(missing, ["k"], rn_name="rn")
    gaps = (
        ranked.withColumn("grp", F.col("k") - F.col("rn"))
        .groupBy("grp")
        .agg(
            F.min("k").alias("gap_start"),
            F.count(F.lit(1)).cast("long").alias("gap_len"),
        )
    )
    # argmax via struct ordering: (gap_len, -gap_start) maximizes length,
    # then minimizes start on ties — one aggregate, same tie rule as the
    # oracle's correlated min-where-max
    gap_stats = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.max("gap_len").cast("long").alias("max_gap_len"),
        F.max(
            F.struct(
                F.col("gap_len"), (-F.col("gap_start")).alias("neg_start")
            )
        ).alias("m"),
    ).select(
        "n_gaps",
        "max_gap_len",
        (-F.col("m.neg_start")).cast("long").alias("widest_gap_start"),
    )
    return (
        dom.crossJoin(F.broadcast(gap_stats))
        .select(
            (F.col("hi") - F.col("lo") + 1).cast("long").alias("n_expected"),
            (F.col("hi") - F.col("lo") + 1 - F.lit(n_missing))
            .cast("long")
            .alias("n_present"),
            F.lit(n_missing).cast("long").alias("n_missing"),
            "n_gaps",
            "max_gap_len",
            "widest_gap_start",
        )
    )


# --- i24: linear-interpolation gap repair (time-series imputation) ---------------
@register(
    "i24_linear_interpolation",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    flagged AS (
      SELECT event_type, day, c,
             (day - DATE '1970-01-01') AS d,
             (dayofmonth(day) % 5 <> 2) AS known
      FROM daily
    ),
    ctx AS (
      SELECT *,
             last_value(CASE WHEN known THEN c END IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN known THEN d END IGNORE NULLS) OVER w_prev AS pd,
             first_value(CASE WHEN known THEN c END IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN known THEN d END IGNORE NULLS) OVER w_next AS nd
      FROM flagged
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        w_next AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ),
    repaired AS (
      SELECT event_type, c, known,
             CASE
               WHEN known THEN c
               WHEN pv IS NOT NULL AND nv IS NOT NULL
                 THEN (pv * (nd - d) + nv * (d - pd)) // (nd - pd)
               WHEN pv IS NOT NULL THEN pv
               ELSE nv
             END AS r
      FROM ctx
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)                              AS n_days,
           CAST(sum(CASE WHEN NOT known THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
           CAST(sum(r) AS BIGINT)                                AS repaired_total,
           CAST(max(CASE WHEN NOT known THEN abs(r - c) END) AS BIGINT) AS max_abs_err
    FROM repaired
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def i24_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation repair of masked points in a daily series — the
    between-neighbors imputation i14's group-median (column-wise) and q55's
    carry-forward (step function) both lack: a masked day repairs to the
    straight line between its nearest KNOWN neighbors.  Days where
    day-of-month % 5 == 2 are deterministically masked (synthetic outage),
    which makes the truth available, so the result also reports the repair's
    max absolute error — the audit a real imputation ships with.  The
    interpolated value (pv·(nd−d) + nv·(d−pd)) over (nd−pd) is one exact
    FLOOR division of cent/epoch-day BIGINTs — Spark's truncating DIV plus
    an explicit negative-remainder correction, so it matches DuckDB's
    flooring // for ANY numerator sign rather than relying on daily sums
    staying non-negative — bit-exact cross-engine, the i14
    integer-percentile lesson applied to interpolation.

    Scale: the only event-scale stage is the daily aggregate (one shuffle,
    map-side partials); all four IGNORE-NULLS context windows share ONE
    event_type-partitioned day-grain sort (bounded |types|·|days| rows), and
    Catalyst plans the two frames in one exchange.  No reference counterpart
    (SURVEY.md §2 Part B: windows absent)."""
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("c"))
    flagged = daily.select(
        "event_type",
        "day",
        "c",
        F.datediff("day", F.lit("1970-01-01").cast("date")).cast("long").alias("d"),
        (F.dayofmonth("day") % 5 != 2).alias("known"),
    )
    w_prev = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_next = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(1, W.unboundedFollowing)
    )
    ck = F.when(F.col("known"), F.col("c"))
    dk = F.when(F.col("known"), F.col("d"))
    ctx = flagged.select(
        "event_type",
        "c",
        "d",
        "known",
        F.last(ck, ignorenulls=True).over(w_prev).alias("pv"),
        F.last(dk, ignorenulls=True).over(w_prev).alias("pd"),
        F.first(ck, ignorenulls=True).over(w_next).alias("nv"),
        F.first(dk, ignorenulls=True).over(w_next).alias("nd"),
    )
    repaired = ctx.select(
        "event_type",
        "c",
        "known",
        F.when(F.col("known"), F.col("c"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            # explicit FLOOR division (denominator nd-pd > 0 by window
            # construction): Spark's DIV truncates toward zero, DuckDB's //
            # floors — identical only for non-negative numerators.  The
            # correction term makes the Spark side floor for ANY sign, so
            # bit-exactness no longer rests on events.value never producing
            # a negative daily sum (round-8 ADVICE).
            F.expr(
                "(pv * (nd - d) + nv * (d - pd)) DIV (nd - pd)"
                " - CASE WHEN (pv * (nd - d) + nv * (d - pd)) % (nd - pd) != 0"
                "        AND (pv * (nd - d) + nv * (d - pd)) < 0 THEN 1 ELSE 0 END"
            ),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
        .alias("r"),
    )
    return (
        repaired.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.when(~F.col("known"), 1).otherwise(0))
            .cast("long")
            .alias("n_masked"),
            F.sum("r").cast("long").alias("repaired_total"),
            F.max(F.when(~F.col("known"), F.abs(F.col("r") - F.col("c"))))
            .cast("long")
            .alias("max_abs_err"),
        )
        .orderBy("event_type")
    )


# --- I3: the LLM leg of the strategy chain, oracle-checked end-to-end ------------
@register(
    "i25_llm_schema_strategy",
    oracle="""
    WITH src AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 50 = 0 THEN NULL
                  ELSE TRY_CAST(c_acctbal AS DECIMAL(38,9)) END AS acct,
             c_mktsegment
      FROM customer
    )
    SELECT CAST(count(*) AS BIGINT)                    AS n_rows,
           CAST(sum(c_custkey) AS BIGINT)              AS sum_custkey,
           round(CAST(sum(acct) AS DOUBLE), 2)         AS sum_acctbal,
           CAST(count(CASE WHEN acct IS NULL THEN 1 END) AS BIGINT)
                                                       AS n_coerced_null,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
           'c_custkey:INTEGER,c_name:STRING,c_acctbal:NUMERIC,c_mktsegment:STRING'
                                                       AS schema_types
    FROM src
    """,
)
def i25_llm_schema_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 end-to-end: the reference's ``existing_or_gemini`` default strategy
    (etl.py:934-948 dispatch, etl.py:712-848 LLM client) run through a CANNED
    deterministic transport — no network, but every other leg of the chain is
    the production code path: catalog miss (I2) → sample preparation →
    prompt build → transport retry (first attempt fails) → markdown-fence
    strip (etl.py:778-790) → ``validate_llm_schema`` (hallucinated column
    skipped, off-whitelist VARCHAR degraded to STRING, etl.py:793-836) →
    alignment projection + cell coercion I5/I6 (DF-only ``c_nationkey`` dropped,
    bad 'N/A' cells → NULL).

    The validated schema itself is emitted as the ``schema_types`` column so
    the LLM-validation outcome is hash-checked against the oracle's expected
    literal — not just asserted.  At 100 TB the chain's cost model is
    unchanged from the reference: the LLM sees ``llm_sample_size`` rows via
    ``df.limit(n).toPandas()`` (a driver-sized sample, never a data pass),
    and the schema it yields is applied as one Catalyst projection."""
    import json as _json

    from worker_etl_spark.operators.llm_schema import gemini_schema_client

    c = read_table(spark, sf_dir, "customer")
    src = c.select(
        F.col("c_custkey").cast("string").alias("c_custkey"),
        F.col("c_name").alias("c_name"),
        F.when(F.col("c_custkey") % 50 == 0, F.lit("N/A"))
        .otherwise(F.col("c_acctbal").cast("string"))
        .alias("c_acctbal"),
        F.col("c_mktsegment").alias("c_mktsegment"),
        F.col("c_nationkey").alias("c_nationkey"),  # absent from reply → dropped
    )

    reply = (
        "```json\n"
        + _json.dumps(
            [
                {"name": "c_custkey", "type": "INTEGER"},
                {"name": "c_name", "type": "STRING"},
                {"name": "c_acctbal", "type": "NUMERIC"},
                {"name": "c_mktsegment", "type": "VARCHAR"},  # → STRING
                {"name": "ghost_col", "type": "INTEGER"},  # hallucinated → skip
            ]
        )
        + "\n```"
    )
    calls = {"n": 0}

    def canned_transport(prompt: str) -> str:
        # deterministic stand-in for the Gemini REST call: first attempt
        # fails (exercises the retry loop, etl.py:838-848), second returns a
        # fence-wrapped body (exercises the fence-strip fallback)
        assert "JSON schema:" in prompt  # the production prompt reached us
        calls["n"] += 1
        if calls["n"] == 1:
            raise TimeoutError("canned transient failure")
        return reply

    schema = inference.determine_schema(
        spark,
        src,
        "ingest_ws.no_such_llm_table",
        strategy="existing_or_gemini",
        llm_infer=gemini_schema_client(transport=canned_transport, attempts=2),
    )
    assert schema is not None and [f["name"] for f in schema] == [
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment",
    ], "validation must skip ghost_col and keep sample order"
    schema_types = ",".join(f"{f['name']}:{f['type']}" for f in schema)

    aligned = inference.align_to_schema(src, schema)
    return aligned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").cast("long").alias("sum_custkey"),
        F.round(F.sum("c_acctbal").cast("double"), 2).alias("sum_acctbal"),
        F.count(F.when(F.col("c_acctbal").isNull(), 1))
        .cast("long")
        .alias("n_coerced_null"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.lit(schema_types).alias("schema_types"),
    )
