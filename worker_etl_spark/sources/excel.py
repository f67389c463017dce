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

The default parser chain matches the reference where possible and degrades
gracefully: pandas ``read_excel(sheet_name=None, dtype=str, header=None)``
(exactly the reference's untyped multi-sheet read, ``etl.py:242-263``) when
an Excel codec is installed, else a self-contained stdlib reader — .xlsx is
just a zip of OOXML worksheets (ECMA-376, a public format), so
``stdlib_xlsx_parser`` reads shared strings, inline strings, numbers and
booleans with ``zipfile`` + ``ElementTree`` and no third-party codec.
Legacy binary ``.xls`` (BIFF8 in an OLE2 container, both published specs)
is handled by the stdlib reader in ``sources/biff.py``.  A parser stays
injectable for custom formats.
"""

from __future__ import annotations

import io
import os
import zipfile
from collections.abc import Callable, Iterator
from xml.etree import ElementTree as ET

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
    """Reference-exact parser: pandas read_excel, untyped, all sheets.
    Requires openpyxl (xlsx) / xlrd (xls)."""
    sheets = pd.read_excel(
        io.BytesIO(content), sheet_name=None, dtype=str, header=None
    )
    return {
        name: df.where(df.notna(), None).values.tolist() for name, df in sheets.items()
    }


# --- stdlib OOXML reader (no codec dependency) ------------------------------------
_M = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _col_index(cell_ref: str) -> int:
    """'BC12' → 0-based column 54."""
    n = 0
    for ch in cell_ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _text_runs(el) -> str:
    """Concatenated <t> text under an <si>/<is> (plain or rich-text runs)."""
    return "".join(t.text or "" for t in el.iter(f"{_M}t"))


def stdlib_xlsx_parser(content: bytes) -> dict[str, list[list[object]]]:
    """Self-contained .xlsx reader: zipfile + ElementTree over ECMA-376 XML.

    Covers the untyped-scan semantics the reference needs
    (``pd.read_excel(dtype=str, header=None)``, ``etl.py:242-263``): shared
    strings (incl. rich-text runs), inline strings, formula-string and
    numeric cells (raw stored text, so '1' stays '1' and '1.5' stays
    '1.5'), booleans as 'True'/'False', skipped rows/cells as None gaps.
    Documented divergence: date-styled numeric cells stay raw serial
    numbers (style-table date conversion needs a full codec).
    """
    if not zipfile.is_zipfile(io.BytesIO(content)):
        raise NotImplementedError(
            "not an OOXML (.xlsx) workbook — legacy .xls routes through "
            "sources/biff.py (OLE2 magic) or xlrd; inject a SheetParser "
            "for other formats"
        )
    zf = zipfile.ZipFile(io.BytesIO(content))
    shared = _xlsx_shared_strings(zf)
    out: dict[str, list[list[object]]] = {}
    for name, target in _xlsx_sheet_targets(zf).items():
        out[name] = _xlsx_parse_sheet(zf, shared, target)
    return out


def _xlsx_shared_strings(zf: "zipfile.ZipFile") -> list[str]:
    if "xl/sharedStrings.xml" not in set(zf.namelist()):
        return []
    sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    return [_text_runs(si) for si in sst.findall(f"{_M}si")]


def _xlsx_sheet_targets(zf: "zipfile.ZipFile") -> dict[str, str]:
    """{sheet name: zip member} in workbook order — metadata-scale (reads
    only workbook.xml + its rels, never a worksheet member), so the Python
    DataSource's planner-side sheet listing stays cheap on big workbooks."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        r.get("Id"): r.get("Target") for r in rels.findall(f"{_R}Relationship")
    }
    out: dict[str, str] = {}
    for sh in wb.find(f"{_M}sheets").findall(f"{_M}sheet"):
        target = target_by_rid.get(sh.get(_RID)) or ""
        target = target.lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target
        out[sh.get("name")] = target
    return out


def _xlsx_parse_sheet(
    zf: "zipfile.ZipFile", shared: list[str], target: str
) -> list[list[object]]:
    """One worksheet member → rows (the per-sheet unit the Python
    DataSource decodes per partition)."""
    ws = ET.fromstring(zf.read(target))
    sheet_data = ws.find(f"{_M}sheetData")
    rows_out: list[list[object]] = []
    for row in [] if sheet_data is None else sheet_data.findall(f"{_M}row"):
        r_attr = row.get("r")
        r_idx = int(r_attr) - 1 if r_attr else len(rows_out)
        while len(rows_out) < r_idx:  # skipped rows → empty (all-None)
            rows_out.append([])
        cells: list[object] = []
        next_col = 0
        for c in row.findall(f"{_M}c"):
            ref = c.get("r")
            ci = _col_index(ref) if ref else next_col
            next_col = ci + 1
            while len(cells) < ci:  # skipped cells → None gaps
                cells.append(None)
            t = c.get("t", "n")
            val: object
            if t == "inlineStr":
                is_el = c.find(f"{_M}is")
                val = _text_runs(is_el) if is_el is not None else None
            else:
                v = c.find(f"{_M}v")
                if v is None or v.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v.text)]
                elif t == "b":
                    val = "True" if v.text.strip() == "1" else "False"
                else:  # numeric / formula-string / error: raw stored text
                    val = v.text
            cells.append(val)
        rows_out.append(cells)
    return rows_out


def default_xlsx_parser(content: bytes) -> dict[str, list[list[object]]]:
    """Parser chain: reference-exact pandas read when a codec is installed;
    otherwise dispatch on magic bytes — zip → stdlib OOXML (.xlsx) reader,
    OLE2 → stdlib BIFF8 (.xls) reader (``sources/biff.py``)."""
    try:
        return pandas_xlsx_parser(content)
    except ImportError:
        pass
    from worker_etl_spark.sources.biff import is_cfb, stdlib_xls_parser

    if is_cfb(content):
        return stdlib_xls_parser(content)
    return stdlib_xlsx_parser(content)


# --- minimal OOXML writer (fixtures/demos) ----------------------------------------
def _col_ref(ci: int) -> str:
    """0-based column → letters ('A', …, 'AA', …)."""
    ci += 1
    ref = ""
    while ci:
        ci, rem = divmod(ci - 1, 26)
        ref = chr(65 + rem) + ref
    return ref


def write_minimal_xlsx(path: str, sheets: dict[str, list[list[object]]]) -> str:
    """Write a minimal real .xlsx (fixtures/demos — the reference only reads
    Excel).  str cells go through the shared-strings table, int/float become
    numeric cells, bools boolean cells, None is skipped — exercising every
    branch of ``stdlib_xlsx_parser``."""
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sst_id(s: str) -> int:
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    sheet_xml: list[str] = []
    for rows in sheets.values():
        body = []
        for ri, row in enumerate(rows, start=1):
            cs = []
            for ci, val in enumerate(row):
                if val is None:
                    continue
                ref = f"{_col_ref(ci)}{ri}"
                if isinstance(val, bool):
                    cs.append(f'<c r="{ref}" t="b"><v>{1 if val else 0}</v></c>')
                elif isinstance(val, (int, float)):
                    cs.append(f'<c r="{ref}"><v>{val}</v></c>')
                else:
                    cs.append(f'<c r="{ref}" t="s"><v>{sst_id(str(val))}</v></c>')
            body.append(f'<row r="{ri}">{"".join(cs)}</row>')
        sheet_xml.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(body)}</sheetData></worksheet>'
        )

    def esc(s: str) -> str:
        # quote/apos included: sheet names land in XML ATTRIBUTE values
        return (
            s.replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
            .replace('"', "&quot;")
            .replace("'", "&apos;")
        )

    n = len(sheets)
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(n)
        )
        + '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        + "".join(
            f'<sheet name="{esc(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, name in enumerate(sheets)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n)
        )
        + f'<Relationship Id="rId{n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{esc(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, xml in enumerate(sheet_xml):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
    return path


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
    parse = parser or default_xlsx_parser
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
