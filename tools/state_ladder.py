"""State-growth ladder for the stateful streaming surface (verdict r7 #7).

The scale-smoke ladders measure TIME vs data for the batch families; the one
axis they do not cover is streaming STATE vs key cardinality.  This tool
runs the custom stateful CUSUM operator (``cusum_stateful``,
``applyInPandasWithState`` — the evt08 closed form's online twin) over
synthetic event streams at 1k / 10k / 100k distinct keys (10x / 100x rungs)
and records, from the engine's own progress metrics
(``lastProgress["stateOperators"]``):

- ``numRowsTotal`` after full ingest — must equal the key count exactly
  (state is O(keys): the operator carries five longs per key, never
  history);
- state-store bytes per key — must stay ~constant across rungs (no
  per-key growth with data volume: events-per-key is fixed, so a flat
  bytes/key across 100x keys is the O(1)-per-key proof);
- eviction: after the processing-time timeout lapses, no-data micro-batches
  must flush every key and drain ``numRowsTotal`` to 0 — the guarantee that
  a quiet key's state is reclaimed, not leaked, on a stream that runs for
  months.

Unlike the timing ladders this measures engine-reported state SIZE, which is
deterministic — no subprocess-per-rung or multi-pass protocol needed.

Usage: python tools/state_ladder.py [out_json]   (default STATE_LADDER.json)
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

from worker_etl_spark.session import get_spark  # noqa: E402
from worker_etl_spark.streaming.event_time import cusum_stateful  # noqa: E402

KEY_LADDER = (1_000, 10_000, 100_000)
EVENTS_PER_KEY = 5
N_FILES = 4  # maxFilesPerTrigger=1 → N_FILES micro-batches per rung
#: Must exceed worst-case INGEST wall (100k pandas groups per micro-batch):
#: a timeout shorter than a batch evicts keys mid-ingest, so the
#: state-rows == keys invariant would be measured on a moving target
#: (observed at 3 s: 9676/10000 rows live, 10300 flushes for 10k keys —
#: some keys flushed, re-created, flushed again).  Eviction is then
#: measured AFTER ingest completes, exactly once per key.
TIMEOUT_MS = 90_000


def _build_events(spark, path: str, n_keys: int) -> int:
    """Deterministic event corpus: EVENTS_PER_KEY rows per key, timestamps
    strictly increasing so every micro-batch touches every key (the
    worst-case state-update pattern, not a key-partitioned easy case)."""
    n = n_keys * EVENTS_PER_KEY
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % n_keys).alias("user_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            # deterministic cents around the CUSUM reference drift so both
            # branches (S rising, S clamped at 0) exercise per key
            ((F.col("id") * 37 % 200) + 4_900).cast("double").alias("value"),
        )
        .withColumn("value", F.col("value") / 100.0)
    )
    df.repartition(N_FILES).write.mode("overwrite").parquet(path)
    return n


def _state_op(progress) -> dict:
    ops = (progress or {}).get("stateOperators") or []
    return ops[0] if ops else {}


def run_rung(spark, n_keys: int) -> dict:
    src = tempfile.mkdtemp(prefix=f"state_ladder_src_{n_keys}_")
    ckpt = tempfile.mkdtemp(prefix=f"state_ladder_ckpt_{n_keys}_")
    qname = f"state_ladder_{n_keys}"
    try:
        n_rows = _build_events(spark, src, n_keys)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            cusum_stateful(stream, timeout_ms=TIMEOUT_MS)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        rung: dict = {"keys": n_keys, "input_rows": n_rows}
        try:
            # Phase 1 — ingest: wait until every input row is processed,
            # then read the engine's state metrics for the loaded store.
            deadline = time.time() + 600
            seen = 0
            while time.time() < deadline:
                seen = sum(
                    p["numInputRows"] for p in q.recentProgress if p
                )
                if seen >= n_rows:
                    break
                time.sleep(1)
            if seen < n_rows:
                return {**rung, "error": f"ingest stalled at {seen}/{n_rows}"}
            op = _state_op(q.lastProgress)
            rung["state_rows_after_ingest"] = op.get("numRowsTotal")
            bytes_used = op.get("memoryUsedBytes")
            custom = op.get("customMetrics") or {}
            disk = custom.get("stateOnCurrentVersionSizeBytes")
            rung["state_memory_bytes"] = bytes_used
            rung["state_disk_bytes"] = disk
            if disk and n_keys:
                rung["disk_bytes_per_key"] = round(disk / n_keys, 1)
            # Phase 2 — eviction: the source is exhausted; no-data
            # micro-batches (on the 1 s trigger) must fire the
            # processing-time timeouts, flush one summary per key, and
            # REMOVE the state.  Poll until numRowsTotal drains to 0.
            deadline = time.time() + 600
            drained = None
            while time.time() < deadline:
                op = _state_op(q.lastProgress)
                total = op.get("numRowsTotal")
                if total == 0:
                    drained = op
                    break
                time.sleep(2)
            if drained is None:
                rung["error"] = "state did not drain within 600 s"
            else:
                rung["state_rows_after_timeout"] = 0
                rung["flushed_summaries"] = spark.sql(
                    f"SELECT count(*) AS c FROM {qname}"
                ).collect()[0].c
        finally:
            q.stop()
        return rung
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.catalog.dropTempView(qname)


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "STATE_LADDER.json"
    spark = get_spark("state_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    rungs = {}
    for k in KEY_LADDER:
        t0 = time.time()
        rungs[str(k)] = {**run_rung(spark, k), "wall_sec": round(time.time() - t0, 1)}
        print(f"rung {k}: {rungs[str(k)]}", file=sys.stderr)
    result: dict = {
        "metric": "stateful_streaming_state_ladder",
        "operator": "cusum_stateful (applyInPandasWithState, evt08 online twin)",
        "events_per_key": EVENTS_PER_KEY,
        "rungs": rungs,
        "claims": {},
    }
    lo, mid, hi = (rungs[str(k)] for k in KEY_LADDER)
    ok_rows = all(
        r.get("state_rows_after_ingest") == r["keys"] for r in (lo, mid, hi)
    )
    result["claims"]["state_rows_equal_keys"] = ok_rows
    bpk = [r.get("disk_bytes_per_key") for r in (lo, mid, hi)]
    if all(isinstance(b, (int, float)) and b > 0 for b in bpk):
        result["claims"]["bytes_per_key"] = bpk
        # flat within 2x across 100x keys = O(1) per key (small-rung values
        # carry fixed store overhead amortized over fewer keys)
        result["claims"]["bytes_per_key_flat_within_2x"] = (
            max(bpk) / min(bpk) <= 2.0
        )
    result["claims"]["evicted_to_zero"] = all(
        r.get("state_rows_after_timeout") == 0 for r in (lo, mid, hi)
    )
    result["claims"]["every_key_flushed_once"] = all(
        r.get("flushed_summaries") == r["keys"] for r in (lo, mid, hi)
    )
    print(json.dumps(result))
    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
