"""Capture .explain('formatted') for named queries into plans/<round>/.

Usage: python tools/capture_plans.py before|after name [name ...]

Writes plans/r12/<name>_<tag>.txt.  For queries whose fn() executes driver
work eagerly (i01/i07 collect counters), the captured plan is the returned
frame's — the internal job plans are captured separately by the opt log.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from worker_etl_spark.queries import load_all, release_persists  # noqa: E402
from worker_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    registry = load_all()
    spark = get_spark("capture_plans")
    for name in names:
        if name not in registry:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        try:
            df = registry[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR capturing plan: {exc}"
        finally:
            release_persists()
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
