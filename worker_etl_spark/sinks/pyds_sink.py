"""Spark 4 Python STREAMING sink: a transactional JSON-lines writer as a
first-class ``writeStream.format("txnjsonl")`` sink.

Complement of ``sources/pyds_stream.py`` (the Python streaming reader): this
is the ``DataSourceStreamWriter`` leg of the Spark 4 Python data-source API,
implementing the manifest-commit protocol every exactly-once file sink uses
(Spark's own parquet sink keeps the same ledger under ``_spark_metadata``):

- ``write(iterator)`` runs PER PARTITION on executors: rows land in a
  uniquely-named part file under ``<path>/data/`` and the part name travels
  back to the driver as the ``WriterCommitMessage`` — a task retry writes a
  DIFFERENT unique name, so failed attempts can never collide with
  committed data;
- ``commit(messages, batchId)`` runs once on the driver after every task
  succeeded: the batch's part names are written to
  ``<path>/_commits/batch-<id>.json`` via tempfile + ``os.replace`` (atomic
  on POSIX) — the batch becomes visible all-or-nothing.  A batch REPLAYED
  after a crash (sink commit didn't land before the checkpoint advanced)
  re-runs with fresh part names and the manifest rename supersedes the old
  listing, orphaning — never double-counting — the first attempt's parts;
- ``abort(messages, batchId)`` deletes whatever parts the failed attempt
  reported, and readers ignore unmanifested parts regardless (abort is
  best-effort cleanup, not a correctness dependency).

``read_committed`` is the serving contract: ONLY parts named by a manifest
are read.  Orphans from failed/replayed attempts sit invisible until a
vacuum removes them (the w16-style retention job's responsibility).

Scale: parts are written where the partitions are (executor-side), one
manifest write per micro-batch on the driver — the same commit-path cost
class as the built-in file sinks.  ``path`` must be storage every executor
and the driver share (the standard file-sink contract).
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


@dataclass
class PartCommit(WriterCommitMessage):
    part: str
    n_rows: int


class TxnJsonlDataSource(DataSource):
    """``format("txnjsonl")``: option ``path`` (sink root, required)."""

    @classmethod
    def name(cls) -> str:
        return "txnjsonl"

    def schema(self) -> str:  # pragma: no cover - writer never infers
        return "value string"

    def streamWriter(self, schema: StructType, overwrite: bool) -> "TxnJsonlStreamWriter":
        return TxnJsonlStreamWriter(schema, self.options)


class TxnJsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, schema: StructType, options) -> None:  # noqa: ANN001
        path = options.get("path")
        if not path:
            raise ValueError("txnjsonl requires option 'path' (sink root)")
        self._path = path
        self._fields = schema.fieldNames()

    # -- executor side -------------------------------------------------------
    def write(self, iterator: Iterator[Row]) -> PartCommit:
        data_dir = os.path.join(self._path, "data")
        os.makedirs(data_dir, exist_ok=True)
        part = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        # temp-then-rename inside data/ so a mid-write task death never
        # leaves a half-written file under a name a later manifest could
        # reference
        fd, tmp = tempfile.mkstemp(dir=data_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                for row in iterator:
                    fh.write(
                        json.dumps({f: row[f] for f in self._fields}, default=str)
                        + "\n"
                    )
                    n += 1
            os.replace(tmp, os.path.join(data_dir, part))
        except BaseException:
            # a task whose upstream iterator raises must not leak its temp
            # file: abort() only knows REPORTED part names, and vacuum
            # reasons about unmanifested parts — an orphaned mkstemp name
            # would sit in data/ forever (round-9 review)
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass
            raise
        return PartCommit(part=part, n_rows=n)

    # -- driver side ----------------------------------------------------------
    def commit(self, messages, batchId: int) -> None:  # noqa: ANN001, N803
        if any(m is None for m in messages):
            # a None commit message in COMMIT is a protocol violation: the
            # engine claims every task succeeded, yet a task's message is
            # missing — writing a manifest without that task's part would
            # be silent row loss behind an advancing checkpoint.  Fail the
            # batch so the engine retries it.  (None is legitimate in
            # abort(), where failed tasks never reported.)
            raise RuntimeError(
                f"txnjsonl commit for batch {batchId} received "
                f"{sum(m is None for m in messages)} missing commit "
                "message(s); refusing a partial manifest"
            )
        commits = os.path.join(self._path, "_commits")
        os.makedirs(commits, exist_ok=True)
        manifest = {
            "batch_id": batchId,
            "parts": [
                {"part": m.part, "n_rows": m.n_rows} for m in messages
            ],
        }
        fd, tmp = tempfile.mkstemp(dir=commits, suffix=".tmp")
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(commits, f"batch-{batchId:020d}.json"))

    def abort(self, messages, batchId: int) -> None:  # noqa: ANN001, N803
        for m in messages:
            if m:
                try:
                    os.unlink(os.path.join(self._path, "data", m.part))
                except FileNotFoundError:
                    pass


def committed_parts(path: str) -> list[str]:
    """Absolute paths of every manifested part, manifest order."""
    commits = os.path.join(path, "_commits")
    out: list[str] = []
    if not os.path.isdir(commits):
        return out
    for name in sorted(os.listdir(commits)):
        if not (name.startswith("batch-") and name.endswith(".json")):
            continue
        with open(os.path.join(commits, name), encoding="utf-8") as fh:
            manifest = json.load(fh)
        out.extend(
            os.path.join(path, "data", p["part"]) for p in manifest["parts"]
        )
    return out


def read_committed(spark, path: str, schema: str):  # noqa: ANN001
    """Serve ONLY manifest-named parts (unmanifested orphans invisible)."""
    parts = committed_parts(path)
    if not parts:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(parts)


def register_txnjsonl(spark) -> None:  # noqa: ANN001
    """Idempotent per-session registration (same pattern as pyqueue)."""
    key = "_txnjsonl_registered"
    if not getattr(spark, key, False):
        spark.dataSource.register(TxnJsonlDataSource)
        setattr(spark, key, True)
