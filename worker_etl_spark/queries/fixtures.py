"""Bounded fixture directories for registry queries (round-9 ADVICE fix).

Several registry queries materialize small deterministic fixtures (CSV/
Excel/Avro/PNG files, snapshot warehouses, stream checkpoints) before
handing them to Spark.  They used to ``tempfile.mkdtemp`` a fresh directory
per invocation and never remove it, so repeated gate runs accumulated
unbounded temp files (~200 PNGs per m11 call, parquet warehouses per w-run).

``fixture_dir(name)`` replaces that pattern with two bounds:

- every fixture lives under ONE per-process root that is removed at
  interpreter exit (``atexit``), so no bytes outlive the run;
- within a process the directory is DETERMINISTIC per *name* — a re-run of
  the same query wipes and rebuilds its own directory instead of leaving a
  sibling behind, so a long-lived session holds at most one live fixture
  per query.

Contract: callers are sequential (the driver, bench, replica, and audits
all run registry queries one at a time — there is no threaded runner), and
a query collects/materializes its result before the registry invokes the
same query again, so wipe-and-rebuild never deletes files under an active
scan.  Fixture CONTENT is deterministic per (name, sf_dir), so even a
stale lazy plan re-reading a rebuilt directory sees identical values.

Cluster posture: these directories are driver-local by design — they stand
in for the object-store landing zones the reference consumes; the queries'
own docstrings carry the 100 TB posture for the real sources.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading

_ROOT: str | None = None
_LOCK = threading.Lock()


def _root() -> str:
    global _ROOT
    with _LOCK:
        if _ROOT is None:
            _ROOT = tempfile.mkdtemp(prefix="spark_graft_fx_")
            atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
        return _ROOT


def fixture_dir(name: str) -> str:
    """Return an empty directory deterministic per *name* for this process;
    wipes any previous contents (rerun == overwrite, not accumulate)."""
    d = os.path.join(_root(), name)
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d)
    return d
