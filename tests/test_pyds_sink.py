"""Python streaming sink (txnjsonl) — manifest-commit protocol.

Unit tests drive the DataSourceStreamWriter contract directly (executor
``write`` and driver ``commit``/``abort`` are plain methods); the
integration test runs the reader->writer pipeline and the recovery case:
a replayed batch's superseded parts must be invisible to readers.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql.types import LongType, Row, StringType, StructField, StructType

from worker_etl_spark.sinks.pyds_sink import (
    TxnJsonlStreamWriter,
    committed_parts,
    read_committed,
    register_txnjsonl,
)
from worker_etl_spark.sources.pyds_stream import register_pyqueue

ST = StructType(
    [StructField("k", StringType()), StructField("n", LongType())]
)


def _writer(path: str) -> TxnJsonlStreamWriter:
    return TxnJsonlStreamWriter(ST, {"path": path})


def _rows(*pairs):
    return iter(Row(k=k, n=n) for k, n in pairs)


def test_write_then_commit_makes_parts_visible(tmp_path):
    w = _writer(str(tmp_path))
    m1 = w.write(_rows(("a", 1), ("b", 2)))
    m2 = w.write(_rows(("c", 3)))
    assert committed_parts(str(tmp_path)) == []  # written but invisible
    w.commit([m1, m2], batchId=0)
    parts = committed_parts(str(tmp_path))
    assert len(parts) == 2 and all(os.path.exists(p) for p in parts)
    lines = []
    for p in parts:
        with open(p, encoding="utf-8") as fh:
            lines += [json.loads(ln) for ln in fh]
    assert sorted(d["k"] for d in lines) == ["a", "b", "c"]


def test_unmanifested_orphan_is_invisible(tmp_path):
    w = _writer(str(tmp_path))
    m = w.write(_rows(("a", 1)))
    w.commit([m], batchId=0)
    # a failed attempt's orphan part sits in data/ but no manifest names it
    orphan = os.path.join(str(tmp_path), "data", "part-orphan.jsonl")
    with open(orphan, "w", encoding="utf-8") as fh:
        fh.write(json.dumps({"k": "GHOST", "n": 99}) + "\n")
    assert committed_parts(str(tmp_path)) == [
        os.path.join(str(tmp_path), "data", m.part)
    ]


def test_replayed_batch_manifest_supersedes_first_attempt(tmp_path):
    """Crash between sink commit and checkpoint advance: the batch re-runs
    with NEW part names; the manifest rename replaces the listing, so the
    first attempt's rows are orphaned, never double-counted."""
    w = _writer(str(tmp_path))
    first = w.write(_rows(("a", 1), ("b", 2)))
    w.commit([first], batchId=0)
    replay = w.write(_rows(("a", 1), ("b", 2)))
    w.commit([replay], batchId=0)
    parts = committed_parts(str(tmp_path))
    assert parts == [os.path.join(str(tmp_path), "data", replay.part)]
    # both physical files exist (orphan cleanup is vacuum's job), but only
    # the replay's rows are served
    assert os.path.exists(os.path.join(str(tmp_path), "data", first.part))


def test_abort_removes_reported_parts(tmp_path):
    w = _writer(str(tmp_path))
    m = w.write(_rows(("a", 1)))
    w.abort([m, None], batchId=0)  # None = task that never reported
    assert not os.path.exists(os.path.join(str(tmp_path), "data", m.part))
    w.abort([m], batchId=0)  # idempotent on already-missing parts


def test_missing_path_option_is_loud():
    with pytest.raises(ValueError, match="path"):
        TxnJsonlStreamWriter(ST, {})


def test_pipeline_reader_to_sink_exactly_once(spark, tmp_path):
    queue, sink = str(tmp_path / "q"), str(tmp_path / "s")
    os.makedirs(queue)
    for i in range(3):
        with open(os.path.join(queue, f"m{i:03d}.jsonl"), "w") as fh:
            for j in range(4):
                fh.write(json.dumps({"k": f"o{i}_{j}", "n": i * 100 + j}) + "\n")
    register_pyqueue(spark)
    register_txnjsonl(spark)
    q = (
        spark.readStream.format("pyqueue")
        .schema("k string, n long")
        .option("path", queue)
        .load()
        .writeStream.format("txnjsonl")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if read_committed(spark, sink, "k string, n long").count() >= 12:
                break
            time.sleep(0.5)
        time.sleep(1.0)  # idle triggers: would surface duplicate commits
    finally:
        q.stop()
    df = read_committed(spark, sink, "k string, n long")
    assert df.count() == 12
    assert df.select("k").distinct().count() == 12
    # one manifest per micro-batch, each batch = one queue file
    manifests = sorted(os.listdir(os.path.join(sink, "_commits")))
    assert len(manifests) >= 3


def test_commit_with_missing_message_refuses_partial_manifest(tmp_path):
    """Round-9 review: a None entry in COMMIT means a succeeded task's
    message vanished — writing a manifest without its part would be silent
    row loss behind an advancing checkpoint.  Must raise, not filter."""
    w = _writer(str(tmp_path))
    m = w.write(_rows(("a", 1)))
    with pytest.raises(RuntimeError, match="missing commit message"):
        w.commit([m, None], batchId=0)
    assert committed_parts(str(tmp_path)) == []  # nothing became visible


def test_failed_write_does_not_leak_temp_file(tmp_path):
    """Round-9 review: an iterator that raises mid-write must unlink its
    mkstemp temp — abort() only knows reported part names."""
    w = _writer(str(tmp_path))

    def boom():
        yield Row(k="a", n=1)
        raise RuntimeError("upstream died")

    with pytest.raises(RuntimeError, match="upstream died"):
        w.write(boom())
    data_dir = os.path.join(str(tmp_path), "data")
    assert [f for f in os.listdir(data_dir) if f.endswith(".tmp")] == []
