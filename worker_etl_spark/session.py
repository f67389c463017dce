"""SparkSession factory.

Single place that encodes the engine's Spark runtime posture:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing) —
  this is what lets the same declarative plans survive a 100×-1000× scale-up
  without hand-retuning every shuffle;
- shuffle partitions sized to cores for local mode (the 200 default is wrong
  in both directions — over-parallelized locally, under-parallelized on a
  real 100 TB cluster where AQE coalescing takes over);
- Arrow enabled so the few Pandas-UDF operators (grid detection, Excel
  decode, multimodal feature extraction) move batches, not rows;
- session timezone pinned to UTC so timestamp semantics match the DuckDB
  correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "worker_etl_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession."""
    if cpus is None:
        cpus = int(os.getenv("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = int(os.getenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus)))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Wide counter aggregates (schema inference, coercion metrics) exceed
        # the 100-field default and silently fall out of whole-stage codegen
        # into interpreted eval with no subexpression elimination — ~7× slower
        # on an 11-column scan.  Codegen compiles once per stage; at 100 TB
        # that's noise, interpreted eval is not.
        .config("spark.sql.codegen.maxFields", "200")
        # Write timestamps as TIMESTAMP_MICROS, not the legacy INT96 default:
        # INT96 columns carry NO parquet min/max statistics, so every
        # time-range predicate over a written table degrades to a full scan
        # (no row-group skipping) — fatal for the sorted/clustered layout
        # (w05) and any 100 TB time-series fact.  Micros also round-trips
        # the engine's microsecond event-time semantics exactly.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_memory or os.getenv("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def shuffle_width(spark: SparkSession) -> int:
    """The session's shuffle parallelism as an int, robust to deployments
    where ``spark.sql.shuffle.partitions`` is set to ``"auto"`` (AQE
    auto-partitioning platforms — ADVICE r5): a tuning knob must never turn
    into a query crash, so non-integer values fall back to the cluster's
    ``defaultParallelism``."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Read the driver's parquet tables from *sf_dir* into a dict of DataFrames.

    Plain ``spark.read.parquet`` — columnar scan with predicate pushdown and
    column pruning handled by Catalyst downstream.
    """
    all_names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for name in names or all_names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out
