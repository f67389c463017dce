"""Quick per-query timing for a SET of queries: one warmed session, N reps
each (noop sink, persists released between reps), median + min reported.

Usage: python tools/time_queries.py [-n REPS] name [name ...]
Emits one JSON line {name: {"median": s, "min": s, "runs": [...]}, ...}.

This is the optimization loop's inner timer (guide §1: isolate each
expensive query with the noop sink); bench.py stays the cross-round
artifact with its idle-gate protocol.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from worker_etl_spark.queries import load_all, release_persists  # noqa: E402
from worker_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    names = args
    registry = load_all()
    spark = get_spark("time_queries")
    # bench.py's warm-up discipline: footers, codegen, python-worker pool
    for t in ("documents", "embeddings", "lineitem", "orders", "events"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()

    def _warm_imports(df):
        import worker_etl_spark.operators.detection  # noqa: F401
        import worker_etl_spark.operators.inference  # noqa: F401
        import worker_etl_spark.operators.multimodal  # noqa: F401
        return df

    warm = spark.range(256).selectExpr("id", "CAST(id AS double) AS v")
    warm.mapInPandas(lambda it: map(_warm_imports, it), schema="id long, v double").count()
    warm.groupBy("id").applyInPandas(_warm_imports, schema="id long, v double").count()
    if os.path.exists(os.path.join(SF_DIR, "documents.parquet")):
        from worker_etl_spark.queries.dedup_q import _shingles, _simhash_df

        _shingles(spark, SF_DIR).count()
        _simhash_df(spark, SF_DIR).count()

    out: dict[str, dict] = {}
    for name in names:
        if name not in registry:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"time:{name}")
        runs: list[float] = []
        for _ in range(reps + 1):  # rep 0 is the warm pass, kept but marked
            t0 = time.time()
            try:
                registry[name].fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.time() - t0, 3))
            except Exception as exc:  # noqa: BLE001
                print(f"error in {name}: {exc}", file=sys.stderr)
                runs.append(-1.0)
                break
            finally:
                release_persists()
        steady = [r for r in runs[1:] if r >= 0]
        out[name] = {
            "cold": runs[0] if runs else -1.0,
            "median": round(statistics.median(steady), 3) if steady else -1.0,
            "min": min(steady) if steady else -1.0,
            "runs": runs,
        }
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
