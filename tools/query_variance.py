"""Pin ANY registry query's run-time distribution (generalizes
tools/d06_variance.py, round-9 verdict #2).

The per-round >2x-bench-mover rule loses its teeth if "host variance" is
accepted without a recorded experiment.  This tool runs one query standalone
N times in ONE warmed session (the sweep's environment) and writes the
distribution to ``<QUERY-PREFIX>_VARIANCE.json`` so future sweeps have a
pinned reference distribution the >2x rule can consult mechanically: a sweep
reading inside [min, max] of this artifact is variance; outside it is a
finding.

Usage: python tools/query_variance.py <query_name> [n_runs] [out_json]
e.g.   python tools/query_variance.py d02_minhash_signatures 10 D02_VARIANCE.json
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
    qname = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    default_out = f"{qname.split('_')[0].upper()}_VARIANCE.json"
    out_json = sys.argv[3] if len(sys.argv) > 3 else default_out
    registry = load_all()
    if qname not in registry:
        raise SystemExit(f"unknown query {qname!r}")
    spark = get_spark("query_variance")
    # bench.py's warm-up discipline: footers, codegen, python-worker pool
    for t in ("documents", "embeddings", "lineitem"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()
    warm = spark.range(256).selectExpr("id", "CAST(id AS double) AS v")
    warm.mapInPandas(lambda it: it, schema="id long, v double").count()

    fn = registry[qname].fn
    # one UNTIMED invocation first: in the sweep every query runs after its
    # family's session-lifetime memo frames are already built (d01 precedes
    # d02 etc.), so billing the memo build to sample #1 would inflate the
    # pinned max into toothlessness.  The build cost is recorded separately.
    t0 = time.time()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    warm_run_sec = round(time.time() - t0, 3)
    release_persists()
    samples: list[float] = []
    for _ in range(n_runs):
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
        release_persists()
    result = {
        "query": qname,
        "sf_dir": SF_DIR,
        "n_runs": n_runs,
        "warm_run_sec": warm_run_sec,
        "samples_sec": samples,
        "min": min(samples),
        "median": round(statistics.median(samples), 3),
        "max": max(samples),
        "load_avg": [round(x, 2) for x in os.getloadavg()],
        "note": (
            "single warmed session, release_persists between runs — the "
            "full-sweep environment; a future sweep reading inside "
            "[min, max] is host/python-fan-out variance, not a plan change"
        ),
    }
    print(json.dumps(result))
    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
