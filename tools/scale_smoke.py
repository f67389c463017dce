"""Scale smoke: run representative queries at ~10x the bench scale factor.

Synthesizes an sf~1 dataset by unioning the sf0.1 tables 10 times with
key offsets (so keys stay unique and join fan-outs stay realistic), writes
it to a temp dir, then wall-clocks a representative query slice. The point
is not a benchmark number — it is evidence that every plan shape survives a
10x scale-up with sub-linear-or-linear cost (no hidden quadratic, no
driver-side materialization, no state blow-up).

Usage: python tools/scale_smoke.py [copies] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from worker_etl_spark.queries import load_all  # noqa: E402
from worker_etl_spark.session import get_spark  # noqa: E402
from worker_etl_spark.sources.tables import read_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"

# (table, [key columns to offset]) — offsets keep keys globally unique so
# joins keep their real selectivity instead of becoming 10x-fan-out storms.
TABLES = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # dimension tables stay 1x — scaling facts against fixed dims is the
    # realistic shape (and keeps broadcast joins broadcast-able).
    "region": [],
    "nation": [],
    "supplier": [],
    "part": ["p_partkey"],
}

OFFSET = 100_000_000

SMOKE_QUERIES = [
    "q01_pricing_summary",   # full-fact scan + agg
    "q02_forecast_revenue",  # pushdown + scalar agg
    "q05_region_revenue",    # star broadcast join
    "q28_hash_sample",       # hash-predicate sampling
    "i01_infer_types",       # Arrow counter kernel
    "d02_minhash_signatures",  # shingle explode + map-side combine
    "d03_lsh_buckets",       # banding + bucket join
    "s01_topk_bruteforce",   # broadcast BLAS kernel
    "s03_topk_ivf",          # IVF probe path
    "t04_fingerprint",       # rolling-hash fingerprint
    "t07_bigram_stats",      # array transform + explode
    "t09_cdc_chunking",      # content-defined chunk boundaries
    "p01_curation_pipeline", # one-scan funnel
    "p03_leakage_safe_split",  # CC labels + hash split
    "q34_full_outer_reconcile",  # pre-aggregated full-outer
    "m05_magic_byte_quarantine",  # binary-prefix projection
    "evt02_session_windows", # native session windows
    "evt03_interval_join",   # time-bounded self-join
]
# NOT in the smoke: d10_simhash_hamming. The key-offset build replicates
# document TEXT verbatim (only ids shift), so every doc gains `copies`
# exact twins and hamming-0 pairs grow quadratically in the copy count —
# a property of the synthetic corpus, not of the band-join plan (real
# corpora don't 10x their duplicate multiplicity when they 10x in size).


def build(spark, out_dir: str, copies: int) -> None:
    for name, keys in TABLES.items():
        src = read_table(spark, BASE_SF, name)
        if keys and copies > 1:
            parts = []
            for i in range(copies):
                part = src
                for k in keys:
                    part = part.withColumn(k, F.col(k) + F.lit(i * OFFSET))
                parts.append(part)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        else:
            df = src
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("scale_smoke")
    tmp = tempfile.mkdtemp(prefix="scale_smoke_")
    try:
        t0 = time.time()
        build(spark, tmp, copies)
        build_s = round(time.time() - t0, 1)
        registry = load_all()
        timings: dict[str, float] = {}
        for name in SMOKE_QUERIES:
            t0 = time.time()
            try:
                registry[name].fn(spark, tmp).write.format("noop").mode(
                    "overwrite"
                ).save()
                timings[name] = round(time.time() - t0, 2)
            except Exception as exc:  # noqa: BLE001
                print(f"smoke error in {name}: {exc}", file=sys.stderr)
                timings[name] = -1.0
        result = {
            "metric": "scale_smoke_total_wall",
            "value": round(sum(v for v in timings.values() if v >= 0), 2),
            "unit": "sec",
            "copies": copies,
            "build_sec": build_s,
            "queries": timings,
        }
        print(json.dumps(result))
        if out_json:
            with open(out_json, "w") as fh:
                json.dump(result, fh, indent=2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
