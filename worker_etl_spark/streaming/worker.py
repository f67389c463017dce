"""Streaming ingest worker: the reference's Pub/Sub loop as Structured
Streaming (SURVEY.md §2 S8/O1-O3; reference ``etl.py:1238-1459``).

Model: the work queue is a landing directory of JSON-lines message files —
each line ``{"object_name": ..., "target_dataset_id": ...}`` is one work
item, exactly the reference's message payload (``etl.py:1374-1383``).  A
``readStream.text`` file source discovers new message files per micro-batch;
``foreachBatch`` processes each message through the batch ingest pipeline
(read → detect → clean → infer → coerce → write).

Delivery semantics: the file source + checkpoint give at-least-once per
micro-batch — the moral equivalent of the reference's ack/nack
(``etl.py:1392-1407``) with one deliberate improvement: a message whose
processing fails goes to a dead-letter file instead of poisoning batch
retries forever (the reference nacks → redelivers forever; SURVEY.md §7
notes this divergence as intentional).  A missing source object is
ACK-equivalent: logged + dead-lettered with reason, never retried
(``etl.py:1346-1348``).

Scale posture: messages are tiny (a path + a dataset id), so collecting a
micro-batch of them to the driver is O(messages), never O(data); each
object's actual data flows through distributed scans/writes.  Independent
objects in one batch could be processed by concurrent jobs; kept sequential
here for deterministic tests.
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession

from worker_etl_spark.config import EngineConfig
from worker_etl_spark.operators.cleaning import ROW_ID, clean_table
from worker_etl_spark.operators.detection import detect_tables, extract_table
from worker_etl_spark.operators.inference import (
    align_to_schema,
    determine_schema,
    infer_schema,
)
from worker_etl_spark.sinks.writer import (
    sink_table_name,
    write_catalog_table,
    write_table,
)
from worker_etl_spark.sources.excel import read_excel_grids
from worker_etl_spark.sources.files import read_csv_grid, require_exists, widen_grid
from worker_etl_spark.sources.tables import ALL_TABLES  # noqa: F401  (re-export convenience)

_DATASET_RE = re.compile(r"^[a-zA-Z0-9_]+$")  # O2 validation (etl.py:1242-1244)


def parse_message(raw: str) -> tuple[str, str] | None:
    """JSON message → (object_name, target_dataset_id); None if malformed."""
    try:
        msg = json.loads(raw)
        obj, ds = msg["object_name"], msg["target_dataset_id"]
    except (json.JSONDecodeError, KeyError, TypeError):
        return None
    if not isinstance(obj, str) or not isinstance(ds, str):
        return None
    return obj, ds


def _resolve_schema(
    spark: SparkSession,
    cleaned: DataFrame,
    dataset_id: str,
    table: str,
    cfg: EngineConfig,
    llm_infer,
    catalog_sink: bool,
) -> list[dict] | None:
    """I1 per-table schema resolution, exactly the reference's per-message
    chain (etl.py:934-948): catalog lookup first under ``existing_or_*``
    (reachable only in catalog-sink mode, where earlier ingests registered
    the table — I2), then the LLM client if the strategy names it, then the
    heuristic if it names ``pandas``.  None → the caller skips the table
    (the reference default's LLM-failure behavior)."""
    if not catalog_sink and cfg.schema_strategy == "existing_or_pandas":
        # path-sink mode has no catalog to consult; the chain degenerates to
        # the heuristic — skip the lookup round-trip.
        return infer_schema(cleaned)
    return determine_schema(
        spark,
        cleaned,
        f"{dataset_id}.{table}",
        strategy=cfg.schema_strategy,
        llm_infer=llm_infer,
        llm_sample_size=cfg.llm_sample_size,
    )


def _write(
    typed: DataFrame,
    warehouse_root: str,
    dataset_id: str,
    table: str,
    disposition: str,
    catalog_sink: bool,
) -> str:
    if catalog_sink:
        return write_catalog_table(typed, dataset_id, table, disposition)
    return write_table(typed, warehouse_root, dataset_id, table, disposition)


def process_object(
    spark: SparkSession,
    object_name: str,
    dataset_id: str,
    source_root: str,
    warehouse_root: str,
    cfg: EngineConfig | None = None,
    llm_infer=None,
    catalog_sink: bool = False,
) -> list[str]:
    """O1 per-object pipeline; returns locations written.

    CSV objects go through the full grid pipeline (untyped scan → detection
    → per-table clean/infer/coerce); Excel objects route their per-sheet
    grids through the same pipeline with sheet-aware table naming
    (``etl.py:526-529``, sheet loop ``etl.py:1273``); parquet objects are
    already typed, so cleaning skips header promotion and inference maps the
    existing types.  Per-table failures skip that table but keep the object
    going (``etl.py:1298-1300, 1318-1320``); zero tables written raises.

    Schema resolution runs the I1 strategy chain per table
    (``cfg.schema_strategy``; reference etl.py:934-948): with
    ``catalog_sink=True`` the sink registers tables in the session catalog,
    so a LATER message for the same table resolves its schema from the
    catalog (I2) instead of re-inferring — sink-table schema wins, exactly
    the reference's per-message loop.  ``llm_infer`` is the pluggable I3
    client (OFF by default for determinism)."""
    cfg = cfg or EngineConfig()
    if not _DATASET_RE.match(dataset_id):
        raise ValueError(f"invalid dataset id: {dataset_id!r}")
    path = os.path.join(source_root, object_name)
    base, ext = os.path.splitext(os.path.basename(object_name))
    ext = ext.lower()

    if ext == ".parquet":
        require_exists(path)  # S1 gate → ACK-skip, same as the grid branches
        df = spark.read.parquet(path)
        cleaned = clean_table(df)
        table = sink_table_name(base)
        schema = _resolve_schema(
            spark, cleaned, dataset_id, table, cfg, llm_infer, catalog_sink
        )
        if schema is None:
            raise RuntimeError(
                f"no schema resolved for {object_name!r} "
                f"(strategy {cfg.schema_strategy!r})"
            )
        typed = align_to_schema(cleaned, schema)
        return [
            _write(typed, warehouse_root, dataset_id, table,
                   cfg.write_disposition, catalog_sink)
        ]

    if ext in (".xlsx", ".xls"):
        require_exists(path)  # S1 gate → ACK-skip, matching the CSV branch
        grid = widen_grid(read_excel_grids(spark, path))
        return _ingest_grid(grid, object_name, base, dataset_id,
                            warehouse_root, cfg, sheet_aware=True,
                            llm_infer=llm_infer, catalog_sink=catalog_sink)

    if ext != ".csv":
        raise ValueError(f"unsupported object type: {object_name!r}")

    grid = read_csv_grid(spark, path)
    return _ingest_grid(grid, object_name, base, dataset_id,
                        warehouse_root, cfg, sheet_aware=False,
                        llm_infer=llm_infer, catalog_sink=catalog_sink)


def _ingest_grid(
    grid: DataFrame,
    object_name: str,
    base: str,
    dataset_id: str,
    warehouse_root: str,
    cfg: EngineConfig,
    sheet_aware: bool,
    llm_infer=None,
    catalog_sink: bool = False,
) -> list[str]:
    """Detect → per-table clean/infer/coerce/write over an untyped grid.

    Shared by the CSV branch (one synthetic sheet, ``sheet_aware=False``)
    and the Excel branch, where sheet/table suffixes appear in target names
    only when the workbook really has multiple sheets / detected tables —
    the reference's naming (``etl.py:1302-1313``).
    """
    written: list[str] = []
    errors: list[str] = []
    grid = grid.persist()
    try:
        boxes = [r.asDict() for r in detect_tables(
            grid,
            min_rows=cfg.min_table_rows,
            min_cols=cfg.min_table_cols,
            density_threshold=cfg.block_density_threshold,
            header_confidence=cfg.min_header_confidence,
            detect_components=cfg.multi_table_detection,
        ).collect()]
        multi_sheet = sheet_aware and len({b["sheet"] for b in boxes}) > 1
        tables_per_sheet: dict[str, int] = {}
        for b in boxes:
            tables_per_sheet[b["sheet"]] = tables_per_sheet.get(b["sheet"], 0) + 1
        for bbox in boxes:
            try:
                block = extract_table(grid, bbox).withColumnRenamed("row_idx", ROW_ID)
                cleaned = clean_table(block).drop(ROW_ID)
                if not cleaned.columns or cleaned.isEmpty():
                    continue
                table = sink_table_name(
                    base, bbox["sheet"], bbox["table_id"],
                    multi_sheet=multi_sheet,
                    multi_table=tables_per_sheet[bbox["sheet"]] > 1,
                )
                spark = cleaned.sparkSession
                schema = _resolve_schema(
                    spark, cleaned, dataset_id, table, cfg, llm_infer,
                    catalog_sink,
                )
                if schema is None:
                    # reference default (existing_or_gemini): LLM failure
                    # skips the table, no heuristic fallback (etl.py:948)
                    errors.append(f"{bbox.get('table_id')}: no schema resolved")
                    continue
                typed = align_to_schema(cleaned, schema)
                written.append(
                    _write(typed, warehouse_root, dataset_id, table,
                           cfg.write_disposition, catalog_sink)
                )
            except Exception as exc:  # noqa: BLE001 — per-table isolation (O1)
                errors.append(f"{bbox.get('table_id')}: {exc}")
    finally:
        grid.unpersist()

    if not written and errors:
        raise RuntimeError(f"no tables loaded from {object_name}: {errors}")
    return written


def start_worker(
    spark: SparkSession,
    queue_dir: str,
    source_root: str,
    warehouse_root: str,
    checkpoint_dir: str,
    dead_letter_dir: str,
    available_now: bool = True,
    cfg: EngineConfig | None = None,
    llm_infer=None,
    catalog_sink: bool = False,
):
    """Start the streaming worker; returns the StreamingQuery.

    ``available_now=True`` drains the current queue and stops (deterministic
    for tests/backfills); ``False`` runs continuously, picking up new message
    files as they land.  ``cfg``/``llm_infer``/``catalog_sink`` flow through
    to ``process_object`` so the worker can run the reference's
    ``existing_or_gemini`` schema chain per message (srm05).
    """
    os.makedirs(dead_letter_dir, exist_ok=True)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.collect():  # messages are tiny — O(messages)
            raw = row["value"]
            parsed = parse_message(raw)
            if parsed is None:
                _dead_letter(dead_letter_dir, raw, "malformed message")
                continue
            obj, ds = parsed
            try:
                process_object(spark, obj, ds, source_root, warehouse_root,
                               cfg=cfg, llm_infer=llm_infer,
                               catalog_sink=catalog_sink)
            except FileNotFoundError:
                _dead_letter(dead_letter_dir, raw, "object not found")  # ACK-skip
            except Exception as exc:  # noqa: BLE001
                _dead_letter(dead_letter_dir, raw, f"failed: {exc}")

    reader = spark.readStream.format("text").load(queue_dir)
    writer = (
        reader.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _dead_letter(dead_letter_dir: str, raw: str, reason: str) -> None:
    rec = json.dumps({"message": raw, "reason": reason, "ts": time.time()})
    with open(os.path.join(dead_letter_dir, "dead_letter.jsonl"), "a") as fh:
        fh.write(rec + "\n")
