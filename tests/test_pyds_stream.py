"""Python streaming data source (pyqueue) — offset contract + recovery.

The unit tests drive the SimpleDataSourceStreamReader contract directly
(no Spark needed for the cursor math); the integration tests pin the two
properties the module claims: one queue file per micro-batch, and
exactly-once delivery across a stop/restart from the same checkpoint
(Spark replays the committed-but-unfinalized range via
``readBetweenOffsets``).
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql.types import StructType

from worker_etl_spark.sources.pyds_stream import (
    QueueStreamReader,
    register_pyqueue,
)

SCHEMA = (
    "object_name string, n long, _queue_file string, _queue_seq long"
)


def _write_file(queue: str, i: int, n_rows: int) -> None:
    with open(os.path.join(queue, f"m{i:03d}.jsonl"), "w") as fh:
        for j in range(n_rows):
            fh.write(json.dumps({"object_name": f"o{i}_{j}", "n": i * 100 + j}) + "\n")


def _reader(queue: str) -> QueueStreamReader:
    # built by hand: DDL parsing needs an active SparkContext, and the
    # cursor unit tests deliberately run without one
    from pyspark.sql.types import LongType, StringType, StructField

    st = StructType(
        [
            StructField("object_name", StringType()),
            StructField("n", LongType()),
            StructField("_queue_file", StringType()),
            StructField("_queue_seq", LongType()),
        ]
    )
    return QueueStreamReader(st, {"path": queue})


# --- unit: cursor contract ----------------------------------------------------


def test_cursor_advances_one_file_per_read(tmp_path):
    queue = str(tmp_path)
    for i in range(3):
        _write_file(queue, i, 2)
    r = _reader(queue)
    off = r.initialOffset()
    assert off == {"last_file": ""}
    rows, off = r.read(off)
    rows = list(rows)
    assert [t[2] for t in rows] == ["m000.jsonl"] * 2
    assert off == {"last_file": "m000.jsonl"}
    rows, off = r.read(off)
    assert {t[2] for t in rows} == {"m001.jsonl"}
    assert off == {"last_file": "m001.jsonl"}


def test_idle_queue_holds_cursor_and_returns_no_rows(tmp_path):
    queue = str(tmp_path)
    _write_file(queue, 0, 1)
    r = _reader(queue)
    _, off = r.read(r.initialOffset())
    rows, off2 = r.read(off)
    assert list(rows) == [] and off2 == off
    # late arrival resumes from the held cursor
    _write_file(queue, 1, 3)
    rows, off3 = r.read(off2)
    assert len(list(rows)) == 3 and off3 == {"last_file": "m001.jsonl"}


def test_read_between_offsets_replays_committed_range(tmp_path):
    queue = str(tmp_path)
    for i in range(4):
        _write_file(queue, i, 2)
    r = _reader(queue)
    lo, hi = {"last_file": "m000.jsonl"}, {"last_file": "m002.jsonl"}
    replay = list(r.readBetweenOffsets(lo, hi))
    assert [t[2] for t in replay] == ["m001.jsonl"] * 2 + ["m002.jsonl"] * 2
    # a fresh reader instance replays identically (recovery happens in a
    # new executor/driver process)
    assert replay == list(_reader(queue).readBetweenOffsets(lo, hi))


def test_name_cursor_is_stable_under_ack_deletion_and_late_names(tmp_path):
    """Round-9 review: a positional cursor shifts when the ack deletes
    consumed files or a late file lands with an earlier-sorting name —
    duplicating or skipping messages.  The NAME cursor must do neither."""
    queue = str(tmp_path)
    for i in range(3):
        _write_file(queue, i, 1)
    r = _reader(queue)
    _, off = r.read(r.initialOffset())
    _, off = r.read(off)  # consumed m000, m001
    # the ack deletes the consumed prefix — cursor must not shift
    os.unlink(os.path.join(queue, "m000.jsonl"))
    rows, off = r.read(off)
    assert [t[2] for t in list(rows)] == ["m002.jsonl"]
    # a producer violating monotonic naming lands BELOW the cursor: never
    # delivered (documented contract), and crucially never DUPLICATES m002
    _write_file(queue, 1, 1)  # re-create m001 below cursor m002
    rows, off2 = r.read(off)
    assert list(rows) == [] and off2 == off


def test_missing_path_option_is_loud():
    with pytest.raises(ValueError, match="path"):
        QueueStreamReader(StructType([]), {})


# --- integration: per-file batches + exactly-once restart ----------------------


def _drain(spark, qname: str, expect: int, timeout_s: int = 120) -> None:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if spark.sql(f"SELECT count(*) c FROM {qname}").collect()[0].c >= expect:
            return
        time.sleep(0.5)
    raise AssertionError(f"sink never reached {expect} rows")


def test_stream_delivers_per_file_batches(spark, tmp_path):
    queue = str(tmp_path / "q")
    os.makedirs(queue)
    for i in range(3):
        _write_file(queue, i, 4)
    register_pyqueue(spark)
    q = (
        spark.readStream.format("pyqueue")
        .schema(SCHEMA)
        .option("path", queue)
        .load()
        .writeStream.format("memory")
        .queryName("pyq_batches")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        _drain(spark, "pyq_batches", 12)
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT _queue_file, count(*) c, count(DISTINCT _queue_seq) s "
        "FROM pyq_batches GROUP BY _queue_file"
    ).collect()
    assert {r._queue_file: (r.c, r.s) for r in rows} == {
        f"m{i:03d}.jsonl": (4, 4) for i in range(3)
    }


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Stop/restart against the SAME checkpoint must neither re-deliver the
    committed prefix nor lose files that arrived while the consumer was
    down.  Uses a parquet sink — the memory sink rejects checkpoint
    recovery by design."""
    queue = str(tmp_path / "q")
    out = str(tmp_path / "out")
    os.makedirs(queue)
    for i in range(2):
        _write_file(queue, i, 3)
    register_pyqueue(spark)

    def start():
        return (
            spark.readStream.format("pyqueue")
            .schema(SCHEMA)
            .option("path", queue)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="250 milliseconds")
            .start()
        )

    def sink_count() -> int:
        try:
            return spark.read.parquet(out).count()
        except Exception:  # noqa: BLE001 — sink dir not created yet
            return 0

    def drain_to(expect: int, timeout_s: int = 120) -> None:
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if sink_count() >= expect:
                return
            time.sleep(0.5)
        raise AssertionError(f"sink never reached {expect} rows")

    q = start()
    try:
        drain_to(6)
    finally:
        q.stop()
    # more arrives while the consumer is DOWN
    for i in range(2, 4):
        _write_file(queue, i, 3)
    q = start()
    try:
        drain_to(12)
        time.sleep(1.5)  # a few extra idle triggers: would surface dupes
    finally:
        q.stop()
    df = spark.read.parquet(out)
    rows = df.groupBy("_queue_file", "_queue_seq").count().collect()
    # all 12 (file, seq) pairs across the outage, each exactly once
    assert len(rows) == 12
    assert all(r["count"] == 1 for r in rows)
    assert {r._queue_file for r in rows} == {f"m{i:03d}.jsonl" for i in range(4)}


# --- property: cursor correctness over arbitrary histories ---------------------
from hypothesis import given, settings, strategies as st  # noqa: E402

_names = st.lists(
    st.integers(0, 999).map(lambda i: f"m{i:03d}.jsonl"),
    min_size=1, max_size=12, unique=True,
)


@given(names=_names, n_deletions=st.integers(0, 3))
@settings(max_examples=60, deadline=None)
def test_cursor_walk_delivers_each_file_exactly_once(names, n_deletions):
    """Walking read() to quiescence delivers every file exactly once in
    name order, regardless of arrival order — and deleting already-consumed
    files mid-walk never duplicates or skips the remainder (the round-9
    positional-cursor defect, generalized)."""
    import shutil
    import tempfile

    queue = tempfile.mkdtemp(prefix="pyq_prop_")
    try:
        for n in names:
            with open(os.path.join(queue, n), "w") as fh:
                fh.write(json.dumps({"object_name": n, "n": 1}) + "\n")
        r = _reader(queue)
        off = r.initialOffset()
        seen = []
        deletions = n_deletions
        while True:
            rows, off2 = r.read(off)
            rows = list(rows)
            if not rows:
                assert off2 == off
                break
            assert len(rows) == 1
            seen.append(rows[0][2])
            # delete an already-consumed file mid-walk
            if deletions and len(seen) >= 2:
                victim = seen[-2]
                try:
                    os.unlink(os.path.join(queue, victim))
                except FileNotFoundError:
                    pass
                deletions -= 1
            off = off2
        assert seen == sorted(names)
    finally:
        shutil.rmtree(queue, ignore_errors=True)
