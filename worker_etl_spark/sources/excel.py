"""Excel multi-sheet source (reference S3, ``etl.py:242-271``).

PySpark has no native Excel reader, so the bridge is: a distributed
``binaryFile`` scan delivers (path, bytes) rows to executors, and a
``mapInPandas`` stage parses each workbook into per-sheet cell grids — one
Python hop per workbook, Arrow-batched on the way out.  Each output row is
one sheet row: (file, sheet, row_idx, cells array<string>), ragged rows
allowed; ``widen_grid`` converts to the '0'..'N-1' wide grid the detector
consumes (the reference renames sheet columns to 0..N-1 ints,
``etl.py:242-263``).

Scale posture: one workbook must fit one executor's memory — the same
envelope as the reference's whole-file materialization (``etl.py:537-617``);
workbooks parallelize across executors.  Partition size is governed by
``spark.sql.files.maxPartitionBytes`` on the binaryFile scan.

The actual xlsx codec (openpyxl/xlrd) is NOT installed in this container, so
the default parser raises a clear error; tests inject a plain-bytes parser
to drive the full distributed plumbing.  With openpyxl present the default
parser is pandas ``read_excel(sheet_name=None, dtype=str, header=None)`` —
exactly the reference's untyped multi-sheet read.
"""

from __future__ import annotations

import io
import os
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# parser: workbook bytes → {sheet_name: rows as list[list[str|None]]}
SheetParser = Callable[[bytes], dict[str, list[list[object]]]]

GRID_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("sheet", StringType()),
        StructField("row_idx", LongType()),
        StructField("cells", ArrayType(StringType())),
    ]
)


def pandas_xlsx_parser(content: bytes) -> dict[str, list[list[object]]]:
    """Default parser: pandas read_excel, untyped, all sheets.  Requires
    openpyxl (xlsx) / xlrd (xls) — absent in this container."""
    try:
        sheets = pd.read_excel(
            io.BytesIO(content), sheet_name=None, dtype=str, header=None
        )
    except ImportError as exc:
        raise NotImplementedError(
            "no Excel codec (openpyxl/xlrd) installed; inject a SheetParser"
        ) from exc
    return {
        name: df.where(df.notna(), None).values.tolist() for name, df in sheets.items()
    }


def demo_text_parser(content: bytes) -> dict[str, list[list[object]]]:
    """Reference SheetParser for tests/demos (no codec needed): parses the
    plain-bytes format ``sheet:r1c1|r1c2;r2c1|r2c2`` (newline between
    sheets, ';' between rows, '|' between cells, '' → None)."""
    out: dict[str, list[list[object]]] = {}
    for sheet_blob in content.decode().strip().split("\n"):
        name, rows = sheet_blob.split(":", 1)
        out[name] = [
            [c if c != "" else None for c in r.split("|")] for r in rows.split(";")
        ]
    return out


def read_excel_grids(
    spark: SparkSession,
    path_glob: str,
    parser: SheetParser | None = None,
) -> DataFrame:
    """Distributed Excel read → long grid (file, sheet, row_idx, cells)."""
    parse = parser or pandas_xlsx_parser
    binaries = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(path)
                for sheet, rows in parse(bytes(content)).items():
                    for i, row in enumerate(rows):
                        out.append(
                            {
                                "file": fname,
                                "sheet": sheet,
                                "row_idx": i,
                                "cells": [None if v is None else str(v) for v in row],
                            }
                        )
            yield pd.DataFrame(
                out, columns=["file", "sheet", "row_idx", "cells"]
            )

    return binaries.mapInPandas(decode, schema=GRID_SCHEMA)
