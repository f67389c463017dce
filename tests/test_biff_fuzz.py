"""Property-based round-trip fuzz for the BIFF8 codec.

The writer and reader are independent encodings of the published [MS-XLS]/
[MS-CFB] layouts; hypothesis drives arbitrary cell grids through both to
catch encoding edges the hand-written fixtures miss (BMP unicode in SST
strings and sheet names, negative/fractional doubles, ragged rows, None
gaps, both container layouts)."""

from __future__ import annotations

import os

from hypothesis import given, settings, strategies as st

from worker_etl_spark.sources.biff import stdlib_xls_parser, write_minimal_xls

# BMP text only (BIFF8 strings are UTF-16LE code units; the minimal codec
# does not handle surrogate pairs' length accounting) — and no control chars.
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
    """What the untyped scan surfaces for a written grid: dtype=str semantics
    with trailing-None truncation per row (unwritten cells never get a
    record, so the reader cannot distinguish them from absent columns)."""
    out = []
    for row in rows:
        conv = []
        for v in row:
            if v is None:
                conv.append(None)
            elif isinstance(v, bool):
                conv.append("True" if v else "False")
            elif isinstance(v, int):
                conv.append(str(v))
            elif isinstance(v, float):
                conv.append(str(int(v)) if v.is_integer() else repr(v))
            else:
                conv.append(v)
        while conv and conv[-1] is None:
            conv.pop()
        out.append(conv)
    while out and not out[-1]:
        out.pop()
    n = max((len(r) for r in out), default=0)  # noqa: F841  (documentation)
    return out


@settings(max_examples=60, deadline=None)
@given(sheets=st.dictionaries(_sheet_name, _grid, min_size=1, max_size=3),
       pad=st.booleans())
def test_roundtrip_fuzz(tmp_path_factory, sheets, pad):
    tmp = tmp_path_factory.mktemp("bifffuzz")
    p = write_minimal_xls(os.path.join(str(tmp), "f.xls"), sheets, pad=pad)
    out = stdlib_xls_parser(open(p, "rb").read())
    assert list(out) == list(sheets)
    for name, rows in sheets.items():
        exp = _expected(rows)
        got = [list(r) + [None] * 0 for r in out[name]]
        # reader emits rows up to the last written cell; compare after
        # normalizing trailing empties on both sides
        while got and not [c for c in got[-1] if c is not None]:
            got.pop()
        norm_got = []
        for r in got:
            rr = list(r)
            while rr and rr[-1] is None:
                rr.pop()
            norm_got.append(rr)
        while norm_got and not norm_got[-1]:
            norm_got.pop()
        assert norm_got == exp, (name, norm_got, exp)


@settings(max_examples=40, deadline=None)
@given(
    strings=st.lists(_text, min_size=1, max_size=8),
    limit=st.integers(min_value=8, max_value=96),
)
def test_sst_continue_split_fuzz(tmp_path_factory, strings, limit):
    """Arbitrary BMP strings through arbitrary CONTINUE record limits: the
    segmented SST writer and the continuation-aware reader must agree for
    every split position (mid-string, at a header, multi-record spans)."""
    tmp = tmp_path_factory.mktemp("sstfuzz")
    rows = [[s] for s in strings]
    p = write_minimal_xls(
        os.path.join(str(tmp), "c.xls"), {"S": rows}, sst_continue_limit=limit
    )
    out = stdlib_xls_parser(open(p, "rb").read())
    # every row has exactly one written string cell ('' included — it still
    # gets a LABELSST record), so the readback is positionally exact
    assert [r[0] for r in out["S"]] == strings


_latin1_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0xFF),
    max_size=30,
)


@settings(max_examples=40, deadline=None)
@given(
    sheets=st.dictionaries(
        st.text(
            alphabet=st.characters(min_codepoint=0x20, max_codepoint=0xFF),
            min_size=1,
            max_size=12,
        ),
        st.lists(st.lists(st.one_of(st.none(), _latin1_text), max_size=4), max_size=5),
        min_size=1,
        max_size=2,
    ),
    pad=st.booleans(),
)
def test_biff5_roundtrip_fuzz(tmp_path_factory, sheets, pad):
    """BIFF5 inline-label roundtrip over the cp1252-represratable range."""
    # cp1252 cannot encode 0x80-0x9F block's gaps; keep encodable payloads
    def enc_ok(s):
        try:
            s.encode("cp1252")
            return True
        except UnicodeEncodeError:
            return False

    sheets = {
        n: [[c for c in row if c is None or enc_ok(c)] for row in rows]
        for n, rows in sheets.items()
        if enc_ok(n)
    }
    if not sheets:
        return
    tmp = tmp_path_factory.mktemp("b5fuzz")
    p = write_minimal_xls(
        os.path.join(str(tmp), "b5.xls"), sheets, pad=pad, biff_version=5
    )
    out = stdlib_xls_parser(open(p, "rb").read())
    assert list(out) == list(sheets)
    for name, rows in sheets.items():
        exp = _expected(rows)
        norm_got = []
        for r in out[name]:
            rr = list(r)
            while rr and rr[-1] is None:
                rr.pop()
            norm_got.append(rr)
        while norm_got and not norm_got[-1]:
            norm_got.pop()
        assert norm_got == exp, (name, norm_got, exp)
