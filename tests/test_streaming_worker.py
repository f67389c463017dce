"""Streaming worker end-to-end: queue → ingest → warehouse, with
checkpointed exactly-once-per-message-file and dead-lettering."""

from __future__ import annotations

import json
import os

from worker_etl_spark.streaming.worker import parse_message, process_object, start_worker


def test_parse_message():
    ok = parse_message('{"object_name": "a.csv", "target_dataset_id": "ds"}')
    assert ok == ("a.csv", "ds")
    assert parse_message("not json") is None
    assert parse_message('{"object_name": "a.csv"}') is None
    assert parse_message('{"object_name": 5, "target_dataset_id": "ds"}') is None


def _write_csv(root, name):
    p = os.path.join(root, name)
    with open(p, "w") as fh:
        fh.write("item,qty,price\nwidget,3,1.5\ngadget,5,2.25\nsprocket,2,0.75\n")
    return p


def test_process_object_csv(spark, tmp_path):
    src = tmp_path / "src"
    wh = tmp_path / "wh"
    src.mkdir()
    _write_csv(str(src), "inventory.csv")
    written = process_object(spark, "inventory.csv", "ds1", str(src), str(wh))
    assert len(written) == 1
    out = spark.read.parquet(written[0])
    assert set(out.columns) == {"item", "qty", "price"}
    types = dict(out.dtypes)
    assert types["qty"] == "bigint" and types["price"] == "double"
    assert out.count() == 3


def test_process_object_invalid_dataset(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        process_object(spark, "x.csv", "bad-id!", str(tmp_path), str(tmp_path))


def test_worker_end_to_end(spark, tmp_path):
    queue = tmp_path / "queue"
    src = tmp_path / "src"
    wh = tmp_path / "wh"
    ckpt = tmp_path / "ckpt"
    dl = tmp_path / "dead"
    for d in (queue, src):
        d.mkdir()
    _write_csv(str(src), "inventory.csv")

    msgs = [
        {"object_name": "inventory.csv", "target_dataset_id": "ds1"},
        {"object_name": "missing.csv", "target_dataset_id": "ds1"},  # ACK-skip
    ]
    (queue / "batch1.jsonl").write_text("\n".join(json.dumps(m) for m in msgs) + "\n")

    q = start_worker(spark, str(queue), str(src), str(wh), str(ckpt), str(dl))
    q.awaitTermination(120)

    out = spark.read.parquet(str(wh / "ds1" / "inventory"))
    assert out.count() == 3

    dead = (dl / "dead_letter.jsonl").read_text().strip().splitlines()
    assert len(dead) == 1 and "not found" in json.loads(dead[0])["reason"]

    # Second run with a new message file: checkpoint must not re-ingest the
    # first file (count stays 3 + new object's rows only).
    _write_csv(str(src), "other.csv")
    (queue / "batch2.jsonl").write_text(
        json.dumps({"object_name": "other.csv", "target_dataset_id": "ds1"}) + "\n"
    )
    q2 = start_worker(spark, str(queue), str(src), str(wh), str(ckpt), str(dl))
    q2.awaitTermination(120)

    assert spark.read.parquet(str(wh / "ds1" / "inventory")).count() == 3  # not doubled
    assert spark.read.parquet(str(wh / "ds1" / "other")).count() == 3


def test_process_object_excel_multisheet_multitable(spark, tmp_path):
    """O1 Excel routing: one workbook, two sheets, one sheet carrying TWO
    tables separated by blank rows — every naming axis at once
    (multi-sheet suffix + per-sheet multi-table suffix)."""
    from worker_etl_spark.sources.excel import write_minimal_xlsx

    src = tmp_path / "src"
    wh = tmp_path / "wh"
    src.mkdir()
    write_minimal_xlsx(
        str(src / "book.xlsx"),
        {
            "Inv": [
                ["item", "qty"],
                ["widget", 3],
                ["gadget", 5],
                [None, None],
                [None, None],
                ["city", "pop"],
                ["lyon", 513000],
                ["nice", 342000],
            ],
            "Prices": [
                ["sku", "price"],
                ["a1", 1.5],
                ["b2", 2.25],
            ],
        },
    )
    written = process_object(spark, "book.xlsx", "ds1", str(src), str(wh))
    assert len(written) == 3
    tables = {os.path.basename(p) for p in written}
    # multi-sheet → sheet suffix everywhere; Inv has 2 tables → table suffix too
    assert any(t.startswith("book_Inv_") for t in tables)
    assert "book_Prices" in tables

    prices = spark.read.parquet(str(wh / "ds1" / "book_Prices"))
    assert set(prices.columns) == {"sku", "price"}
    assert dict(prices.dtypes)["price"] == "double"
    assert prices.count() == 2

    inv_tables = sorted(t for t in tables if t.startswith("book_Inv_"))
    assert len(inv_tables) == 2
    cols = set()
    for t in inv_tables:
        cols |= set(spark.read.parquet(str(wh / "ds1" / t)).columns)
    assert {"item", "qty", "city", "pop"} <= cols


def test_process_object_excel_missing_file(spark, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        process_object(spark, "nope.xlsx", "ds1", str(tmp_path), str(tmp_path))


def test_process_object_parquet_missing_file(spark, tmp_path):
    """S1 parity: a missing parquet object ACK-skips (FileNotFoundError),
    matching the CSV/Excel branches, instead of surfacing AnalysisException."""
    import pytest

    with pytest.raises(FileNotFoundError):
        process_object(spark, "nope.parquet", "ds1", str(tmp_path), str(tmp_path))


def test_process_object_parquet(spark, tmp_path):
    """Typed parquet objects skip grid detection: clean -> infer maps the
    existing types and the table lands under the file base name."""
    src = tmp_path / "src"
    wh = tmp_path / "wh"
    src.mkdir()
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, score double"
    ).write.parquet(str(src / "scores.parquet"))
    written = process_object(spark, "scores.parquet", "ds1", str(src), str(wh))
    assert len(written) == 1 and written[0].endswith("scores")
    out = spark.read.parquet(written[0])
    assert dict(out.dtypes) == {"id": "bigint", "name": "string", "score": "double"}
    assert out.count() == 2
