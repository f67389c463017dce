"""Measured fan-out/parallelism audit: catch explode-heavy stages that run
on too few tasks (the q79 class).

AQE sizes post-shuffle partitions by INPUT bytes, so a stage whose join
EXPLODES a small input (day-blocked self-joins, band joins, codebook
probes) can end up doing millions of rows of work in one task — invisible
to plan-shape audits (tools/audit_windows.py sees a healthy equi-join) and
to small-SF correctness runs.  Round 5 found exactly this in
q79_triangle_count: a 40k-row distinct coalesced to ONE partition, then
exploded ~700x single-task (8.8 s of the query's 11.3 s).

This tool measures instead of guessing: it runs every registered query at
$SPARK_GRAFT_SF_DIR (default sf0.1) on a UI-enabled session and pulls
per-stage task counts + record metrics from Spark's status REST API.  A
stage is flagged when ALL hold:

- emitted records (shuffle write) >= MIN_ROWS        (real work, not noise)
- expansion     = emitted / max(1, consumed) >= MIN_EXPANSION
- task count   <= MAX_TASKS                          (the work didn't fan out)

Flags are starting points for a human: some explosions are genuinely
small-input-bounded (a 30-day calendar spine) and fine on one task.

Usage: python tools/audit_fanout.py [out_json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from worker_etl_spark.queries import load_all, release_persists  # noqa: E402
from worker_etl_spark.session import get_spark  # noqa: E402

MIN_ROWS = 1_000_000
MIN_EXPANSION = 20.0
MAX_TASKS = 2


def _stages(ui: str, app: str) -> list[dict]:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_json = None
    names: list[str] = []
    for arg in sys.argv[1:]:
        if arg.endswith(".json"):
            out_json = arg
        else:
            names.append(arg)
    spark = get_spark("audit_fanout", extra_conf={"spark.ui.enabled": "true"})
    ui, app = spark.sparkContext.uiWebUrl, spark.sparkContext.applicationId
    registry = load_all()
    todo = names or sorted(registry)

    flagged: dict[str, list[dict]] = {}
    errors: dict[str, str] = {}
    seen_stage = -1
    for name in todo:
        try:
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"
        finally:
            release_persists()
        # Fetch stages and advance the watermark even when the query raised
        # (ADVICE r5): stages a failed query completed before erroring must
        # not be attributed to the NEXT query's flag report.
        stages = [s for s in _stages(ui, app) if s["stageId"] > seen_stage]
        if stages:
            seen_stage = max(s["stageId"] for s in stages)
        if name in errors:
            continue
        hits = []
        for s in stages:
            consumed = (s.get("inputRecords") or 0) + (s.get("shuffleReadRecords") or 0)
            emitted = s.get("shuffleWriteRecords") or 0
            tasks = s.get("numCompleteTasks") or 0
            if (
                emitted >= MIN_ROWS
                and emitted / max(1, consumed) >= MIN_EXPANSION
                and tasks <= MAX_TASKS
            ):
                hits.append(
                    {
                        "stage": s["stageId"],
                        "tasks": tasks,
                        "consumed": consumed,
                        "emitted": emitted,
                        "expansion": round(emitted / max(1, consumed), 1),
                    }
                )
        if hits:
            flagged[name] = hits
    out = {
        "what": (
            "measured single-task explosion audit (q79 class): stages with "
            f">= {MIN_ROWS} emitted rows, >= {MIN_EXPANSION}x expansion, "
            f"<= {MAX_TASKS} tasks, per query at {sf_dir}"
        ),
        "flagged": flagged,
        "errors": errors,
        "n_queries": len(todo),
    }
    print(json.dumps(out, indent=1))
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
