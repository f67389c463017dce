"""Ad-hoc profiling harness for i01 (schema-inference counter scan).

Times the full query plus isolated counter variants at sf0.1 so we can see
which expression family pays the 69.7 s observed in BENCH_r01.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from worker_etl_spark.session import get_spark  # noqa: E402
from worker_etl_spark.sources.tables import read_table  # noqa: E402
from worker_etl_spark.operators import inference  # noqa: E402
from worker_etl_spark.queries.inference_q import _LINEITEM_COLS  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:40s} {dt:8.2f}s  -> {out}")
    return dt


def main():
    spark = get_spark()
    l = read_table(spark, SF_DIR, "lineitem")
    s = l.select(*[F.col(c).cast("string").alias(c) for c in _LINEITEM_COLS])
    s.count()  # warm

    # full current implementation
    timed("full column_stats (67 exprs)", lambda: len(inference.column_stats(s)))

    # isolate families: run ONE aggregate with only a single counter family
    def family(label, make):
        exprs = []
        for c in _LINEITEM_COLS:
            exprs.extend(make(F.col(f"`{c}`"), c))
        timed(label, lambda: s.agg(*exprs).first() is not None)

    family("count only", lambda col, c: [F.count(col).alias(f"{c}_nn")])
    family("try_cast double count", lambda col, c: [F.count(col.try_cast("double")).alias(f"{c}_num")])

    def intexpr(col, c):
        d = col.try_cast("double")
        return [F.sum((d.isNotNull() & ~F.isnan(d) & (d == F.floor(d))).cast("long")).alias(f"{c}_int")]

    family("integral sum", intexpr)
    family("digit rlike", lambda col, c: [F.sum(col.rlike(r"^\d+$").cast("long")).alias(f"{c}_dig")])
    family(
        "digit translate",
        lambda col, c: [
            F.sum(((F.length(col) > 0) & (F.translate(col, "0123456789", "") == "")).cast("long")).alias(f"{c}_dig")
        ],
    )
    family(
        "ts gate rlike + try_to_timestamp",
        lambda col, c: [F.count(F.when(col.rlike(inference.TS_GATE_RE), F.try_to_timestamp(col))).alias(f"{c}_ts")],
    )
    family(
        "ts gate substr + try_to_timestamp",
        lambda col, c: [
            F.count(
                F.when(
                    (F.substring(col, 5, 1) == "-")
                    & (F.substring(col, 8, 1) == "-")
                    & (F.translate(F.substring(col, 1, 4), "0123456789", "") == "")
                    & (F.length(col) >= 10),
                    F.try_to_timestamp(col),
                )
            ).alias(f"{c}_ts")
        ],
    )
    family(
        "bool isin",
        lambda col, c: [F.sum(F.lower(col).isin(*inference._BOOL_TOKENS).cast("long")).alias(f"{c}_bool")],
    )

    spark.stop()


if __name__ == "__main__":
    main()
