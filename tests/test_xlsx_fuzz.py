"""Property-based round-trip fuzz for the stdlib OOXML (.xlsx) codec.

Mirrors tests/test_biff_fuzz.py for the modern generation: hypothesis
drives arbitrary cell grids through ``write_minimal_xlsx`` →
``stdlib_xlsx_parser`` AND through the per-sheet path the xlsgrid Python
DataSource uses (``_xlsx_sheet_targets`` + ``_xlsx_parse_sheet``), so the
partition-at-a-time decode is pinned equivalent to the whole-workbook
parse for every generated workbook."""

from __future__ import annotations

import io
import os
import zipfile

from hypothesis import given, settings, strategies as st

from worker_etl_spark.sources.excel import (
    _xlsx_parse_sheet,
    _xlsx_shared_strings,
    _xlsx_sheet_targets,
    stdlib_xlsx_parser,
    write_minimal_xlsx,
)

# XML 1.0 forbids most C0 controls; surrogates excluded as always.
_text = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0xFFFF, blacklist_categories=("Cs",)
    ),
    max_size=40,
)
_cell = st.one_of(
    st.none(),
    _text,
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)
_sheet_name = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0xFFFF, blacklist_categories=("Cs",)
    ),
    min_size=1,
    max_size=20,
)
_grid = st.lists(st.lists(_cell, max_size=6), max_size=8)


def _expected(rows):
    """Untyped-scan surface for a written grid: numeric cells keep their
    literal XML text (str(v) — '1.0' stays '1.0', unlike BIFF doubles),
    bools are 'True'/'False', trailing unwritten cells/rows are absent."""
    out = []
    for row in rows:
        conv = []
        for v in row:
            if v is None:
                conv.append(None)
            elif isinstance(v, bool):
                conv.append("True" if v else "False")
            elif isinstance(v, (int, float)):
                conv.append(str(v))
            else:
                conv.append(v)
        while conv and conv[-1] is None:
            conv.pop()
        out.append(conv)
    while out and not out[-1]:
        out.pop()
    return out


def _norm(rows):
    norm = []
    for r in rows:
        rr = list(r)
        while rr and rr[-1] is None:
            rr.pop()
        norm.append(rr)
    while norm and not norm[-1]:
        norm.pop()
    return norm


@settings(max_examples=60, deadline=None)
@given(sheets=st.dictionaries(_sheet_name, _grid, min_size=1, max_size=3))
def test_xlsx_roundtrip_fuzz(tmp_path_factory, sheets):
    tmp = tmp_path_factory.mktemp("xlsxfuzz")
    p = write_minimal_xlsx(os.path.join(str(tmp), "f.xlsx"), sheets)
    content = open(p, "rb").read()

    out = stdlib_xlsx_parser(content)
    assert list(out) == list(sheets)
    for name, rows in sheets.items():
        assert _norm(out[name]) == _expected(rows), name

    # per-sheet path (what each xlsgrid partition runs) ≡ whole-workbook
    zf = zipfile.ZipFile(io.BytesIO(content))
    targets = _xlsx_sheet_targets(zf)
    assert list(targets) == list(sheets)
    shared = _xlsx_shared_strings(zf)
    for name, target in targets.items():
        assert _xlsx_parse_sheet(zf, shared, target) == out[name], name
