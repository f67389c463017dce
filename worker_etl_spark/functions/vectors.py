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


def dot(a: str, b: str, dim: int | None = None) -> Column:
    """Dot product of two array<float|double> columns, accumulated in double.

    With *dim* given (the engine's vector columns are fixed-width), the fold
    is unrolled into an explicit left-associated sum over literal indices:
    higher-order functions (``aggregate``/``zip_with``) are CodegenFallback
    in Spark — every element pays an interpreted lambda dispatch — while the
    unrolled expression whole-stage-codegens (opt r12, guide §1.2 step 2;
    measured ~10× on the quantized-kmeans assignment stage).  The unrolled
    chain starts from the same ``0D`` seed and adds left-to-right in array
    order, so every intermediate IEEE double — including the 0.0 + (-0.0)
    corner — is bit-identical to the fold it replaces.
    """
    if dim is not None:
        expr = "CAST(0 AS DOUBLE)"
        for i in range(dim):
            expr += (
                f" + (CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))"
            )
        return F.expr(expr)
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v)"
    )


def norm(a: str, dim: int | None = None) -> Column:
    """L2 norm of an array column."""
    return F.sqrt(dot(a, a, dim))


def sql_dot(a: str, b: str) -> str:
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"
