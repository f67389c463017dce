"""Manifest-based append-only segment store for maintained indexes.

Round-10's maintained dedup index (``operators/dedup_index.py``) stored each
LSM table as a bare parquet directory and compacted it with a
rename-live-to-old / rename-staging-to-live swap.  Two real defects followed
(round-10 ADVICE + VERDICT "Next round" #6):

1. **Crash window**: between the two renames the live directory is absent,
   and a reader that treats "absent dir" as "empty table" silently
   classifies against nothing.
2. **Concurrent readers**: a Spark plan holds concrete file paths from the
   moment the relation is created; renaming the directory out from under a
   running classifier fails its tasks (or worse, the rmtree destroys the
   only copy mid-read).

This module is the standard LSM/table-format answer (the same commit
protocol Iceberg/Delta build on, re-expressed with stdlib primitives for a
filesystem store): a table is a set of immutable parquet **segment
directories** plus a tiny **MANIFEST** text file naming the live segments.

- Every write creates a NEW segment dir (staged under a dot-prefixed temp
  name, published by one atomic ``os.rename``) and then replaces MANIFEST
  via ``os.replace`` — readers see either the old or the new segment list,
  never a partial state, and no table directory is ever absent.
- Compaction (``replace``) publishes the folded segment and points MANIFEST
  at it; the superseded segments STAY ON DISK so any reader still holding
  the old manifest keeps reading consistent data.  ``vacuum`` reclaims
  unreferenced segments later, after a grace period longer than any
  reader's plan lifetime.
- A crashed writer leaves only an unreferenced temp/segment dir —
  invisible to every reader, reclaimed by ``vacuum``.  There is no state
  that reads as silently empty.
- Writers (appends, compactions) serialize through one ``fcntl`` lock per
  store (``writer_lock``); readers never lock and never block.

Scale notes: MANIFEST is O(segments) lines of text — the ingest cadence
bounds it (one segment per table per batch) and compaction folds it back to
one line; segment dirs are ordinary parquet, so at cluster scale the same
protocol works on any rename-atomic filesystem (HDFS, POSIX).  On S3-class
object stores the manifest swap would ride a conditional PUT — same
protocol, different primitive.

No reference counterpart (the reference keeps no indexes at all —
SURVEY.md §2); the protocol itself is public table-format practice.
"""

from __future__ import annotations

import fcntl
import os
import shutil
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "MANIFEST"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, MANIFEST)


def segments(table_dir: str) -> list[str]:
    """Live segment dir names, in manifest order.  Absent table → []."""
    try:
        with open(_manifest_path(table_dir), encoding="utf-8") as fh:
            return [ln.strip() for ln in fh if ln.strip()]
    except FileNotFoundError:
        return []


def _write_manifest(table_dir: str, segs: list[str]) -> None:
    tmp = os.path.join(table_dir, f".{MANIFEST}.tmp.{os.getpid()}")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("\n".join(segs) + ("\n" if segs else ""))
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, _manifest_path(table_dir))


def _publish_segment(df: DataFrame, table_dir: str) -> str:
    """Write *df* as a new immutable segment: parquet into a dot-prefixed
    staging dir (invisible to any lister), then one atomic rename to the
    final name.  Returns the published segment name (not yet in MANIFEST)."""
    os.makedirs(table_dir, exist_ok=True)
    name = f"seg-{uuid.uuid4().hex}"
    staging = os.path.join(table_dir, f".tmp-{name}")
    df.write.mode("overwrite").parquet(staging)
    os.rename(staging, os.path.join(table_dir, name))
    return name


def append(df: DataFrame, table_dir: str) -> None:
    """Append *df* as a new segment (caller holds the store's writer lock)."""
    name = _publish_segment(df, table_dir)
    _write_manifest(table_dir, segments(table_dir) + [name])


def replace(df: DataFrame, table_dir: str) -> None:
    """Compaction publish: *df* becomes the table's ONLY live segment.
    Superseded segments stay on disk for in-flight readers until
    ``vacuum`` (caller holds the store's writer lock)."""
    name = _publish_segment(df, table_dir)
    _write_manifest(table_dir, [name])


def read(spark: SparkSession, table_dir: str, schema: str) -> DataFrame:
    """Union-read the live segments.  A table with no manifest reads as an
    empty frame (it was never created — compaction never removes MANIFEST,
    so absence cannot mean a crashed swap); a manifest naming a MISSING
    segment raises instead of silently dropping data."""
    segs = segments(table_dir)
    if not segs:
        return spark.createDataFrame([], schema)
    paths = []
    for s in segs:
        p = os.path.join(table_dir, s)
        if not os.path.isdir(p):
            raise RuntimeError(
                f"segment store corruption: {table_dir} MANIFEST names "
                f"{s!r} but the segment dir is missing"
            )
        paths.append(p)
    return spark.read.schema(schema).parquet(*paths)


def vacuum(table_dir: str, grace_sec: float = 0.0) -> int:
    """Delete unreferenced segment/staging dirs older than *grace_sec*
    (mtime).  Returns how many dirs were reclaimed.  Safe to run any time
    the grace period exceeds the longest reader plan lifetime; caller holds
    the writer lock so the manifest cannot move underneath the sweep."""
    if not os.path.isdir(table_dir):
        return 0
    live = set(segments(table_dir))
    now = time.time()
    reclaimed = 0
    for entry in os.listdir(table_dir):
        if entry == MANIFEST or entry in live:
            continue
        p = os.path.join(table_dir, entry)
        if not os.path.isdir(p):
            continue
        if now - os.path.getmtime(p) < grace_sec:
            continue
        shutil.rmtree(p, ignore_errors=True)
        reclaimed += 1
    return reclaimed


@contextmanager
def writer_lock(store_dir: str):
    """Exclusive writer lock for a store (a directory of tables): appends
    and compactions serialize; readers never take it.  Held across a whole
    multi-table maintenance write so cross-table invariants (e.g. the dedup
    index's postings-before-df read ordering) hold under concurrency."""
    os.makedirs(store_dir, exist_ok=True)
    fd = os.open(os.path.join(store_dir, ".writer.lock"), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
