"""Pin d06_embedding_neardup's run-time distribution (round-6 verdict #3).

d06 was the only >2x full-sweep mover two rounds running (0.82 -> 5.11 s at
sf0.1) with code unchanged — the builder attributed it to variance of the
catalog broadcast + python-worker fan-out, but the >2x-regression rule loses
its teeth if "variance" is accepted without a recorded experiment.  This
tool runs d06 standalone N times in ONE warmed session (the sweep's
environment) and writes the distribution to ``D06_VARIANCE.json`` so future
sweeps have a pinned reference distribution the >2x rule can consult:
a sweep reading inside [min, max] of this artifact is variance; outside it
is a finding.

Usage: python tools/d06_variance.py [n_runs] [out_json]
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
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = sys.argv[2] if len(sys.argv) > 2 else "D06_VARIANCE.json"
    registry = load_all()
    spark = get_spark("d06_variance")
    # bench.py's warm-up discipline: footers, codegen, python-worker pool
    spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).count()
    warm = spark.range(256).selectExpr("id", "CAST(id AS double) AS v")
    warm.mapInPandas(lambda it: it, schema="id long, v double").count()

    fn = registry["d06_embedding_neardup"].fn
    samples: list[float] = []
    for _ in range(n_runs):
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
        release_persists()
    result = {
        "query": "d06_embedding_neardup",
        "sf_dir": SF_DIR,
        "n_runs": n_runs,
        "samples_sec": samples,
        "min": min(samples),
        "median": round(statistics.median(samples), 3),
        "max": max(samples),
        "load_avg": [round(x, 2) for x in os.getloadavg()],
        "note": (
            "single warmed session, release_persists between runs — the "
            "full-sweep environment; a future sweep's d06 reading inside "
            "[min, max] is variance of the catalog broadcast + 32-worker "
            "python fan-out, not a plan change"
        ),
    }
    print(json.dumps(result))
    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
