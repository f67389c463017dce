"""Vector primitives for the embedding similarity / near-dup operators.

Dot products and norms are expressed with Spark's higher-order functions
(``zip_with`` + ``aggregate``) so they run JVM-side inside whole-stage
codegen — no Python UDF, no Arrow hop.  The DuckDB twins cast to DOUBLE[]
first so both engines accumulate in float64 in the same left-to-right order,
keeping the driver's value-hash stable.

Driver-mandated extension; no reference counterpart (SURVEY.md §2 Part B).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    """Dot product of two array<float|double> columns, accumulated in double."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    """L2 norm of an array column."""
    return F.sqrt(dot(a, a))


def sql_dot(a: str, b: str) -> str:
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"
