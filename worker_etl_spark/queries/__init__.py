"""Query registry — the driver-facing surface of the engine.

Every implemented operator from SURVEY.md §2 registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs on
the same parquet tables.  The driver hash-compares the two at sf=0.01 — so
every computed column is aliased identically on both sides, and floating
aggregates are explicitly rounded on both sides so the hashes are stable
across summation orders.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    headline: bool = False  # include in bench.py's headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, headline: bool = False):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY) and return it."""
    from worker_etl_spark.queries import (  # noqa: F401
        relational,
        cleaning_q,
        inference_q,
        dedup_q,
        similarity_q,
        text_q,
        curation_q,
        multimodal_q,
        grid_q,
        sources_q,
        streaming_q,
    )

    return REGISTRY
