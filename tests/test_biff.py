"""Legacy .xls codec: CFB container + BIFF8 record reader round trips.

The fixture writer and the reader are independent implementations of the
published [MS-CFB]/[MS-XLS] layouts (regular-FAT vs ministream containers,
SST/LABELSST vs NUMBER records), so a round trip exercises both sides of
each format decision; RK decoding is additionally pinned to spec worked
examples, independent of the writer (which never emits RK).
"""

from __future__ import annotations

import struct

import pytest

from worker_etl_spark.sources.biff import (
    _decode_rk,
    _rec,
    cfb_open_stream,
    is_cfb,
    parse_biff8,
    stdlib_xls_parser,
    write_minimal_xls,
)

_DATA = {
    "S1": [
        ["item", "qty", "price", "ok"],
        ["widget", 3, 1.5, True],
        [None, None, None, None],
        ["gadget", 12345678, -2.25, False],
    ],
    "Füü": [["a"], ["ünïcødé"]],
}
_EXPECT_S1 = [
    ["item", "qty", "price", "ok"],
    ["widget", "3", "1.5", "True"],
    [],
    ["gadget", "12345678", "-2.25", "False"],
]


def test_roundtrip_regular_fat(tmp_path):
    p = write_minimal_xls(str(tmp_path / "big.xls"), _DATA, pad=True)
    content = open(p, "rb").read()
    assert is_cfb(content)
    out = stdlib_xls_parser(content)
    assert list(out) == ["S1", "Füü"]
    assert out["S1"] == _EXPECT_S1
    assert out["Füü"] == [["a"], ["ünïcødé"]]


def test_roundtrip_ministream(tmp_path):
    """Small workbooks live in the ministream — the layout Excel itself uses
    below the 4096-byte cutoff; the reader must walk miniFAT chains."""
    p = write_minimal_xls(str(tmp_path / "small.xls"), _DATA, pad=False)
    out = stdlib_xls_parser(open(p, "rb").read())
    assert out["S1"] == _EXPECT_S1


def test_rk_decode_spec_examples():
    # [MS-XLS] 2.5.122: low bit = /100, second bit = 30-bit int vs double-high
    assert _decode_rk((30 << 2) | 0x02) == 30
    assert _decode_rk((3000 << 2) | 0x03) == 30.0
    as_bits = struct.unpack("<Q", struct.pack("<d", 2.5))[0]
    assert _decode_rk((as_bits >> 32) & 0xFFFFFFFC) == 2.5
    assert _decode_rk(((-7 & 0x3FFFFFFF) << 2) | 0x02) == -7


def test_rk_and_mulrk_records(tmp_path):
    """Hand-built sheet substream with RK and MULRK cells (records the
    fixture writer never emits, so this is reader-only coverage)."""
    p = write_minimal_xls(str(tmp_path / "host.xls"), {"S": [["x"]]})
    content = open(p, "rb").read()
    stream = bytearray(cfb_open_stream(content, "Workbook"))
    # splice RK + MULRK records into the sheet substream before its EOF
    rk_rec = _rec(0x027E, struct.pack("<HHHI", 1, 0, 0, (42 << 2) | 0x02))
    mulrk = _rec(
        0x00BD,
        struct.pack("<HH", 2, 0)
        + struct.pack("<HI", 0, (7 << 2) | 0x02)
        + struct.pack("<HI", 0, (800 << 2) | 0x03)
        + struct.pack("<H", 1),
    )
    eof = struct.pack("<HH", 0x000A, 0)
    idx = stream.rindex(eof)
    patched = bytes(stream[:idx]) + rk_rec + mulrk + bytes(stream[idx:])
    out = parse_biff8(patched)
    assert out["S"][1] == ["42"]
    assert out["S"][2] == ["7", "8"]


def test_unsupported_inputs(tmp_path):
    with pytest.raises(ValueError):
        cfb_open_stream(b"not a compound file at all" * 40, "Workbook")
    # pre-BIFF5 version word → actionable refusal, not silent misread
    p = write_minimal_xls(str(tmp_path / "v4.xls"), {"S": [["x"]]})
    stream = bytearray(cfb_open_stream(open(p, "rb").read(), "Workbook"))
    struct.pack_into("<H", stream, 4, 0x0400)
    with pytest.raises(NotImplementedError):
        parse_biff8(bytes(stream))


def test_biff5_roundtrip(tmp_path):
    """BIFF5 ('Book' stream, inline cp1252 labels, no SST) — the xlrd-era
    generation the reference reads via etl.py:527; previously a documented
    refusal, now a first-class read path."""
    data = {
        "Hoja1": [
            ["ítem", "qty"],
            ["café", 3],
            ["naïve", -2.25],
            [True, None],
        ],
        "S2": [["x"], ["1"]],
    }
    p = write_minimal_xls(str(tmp_path / "legacy.xls"), data, biff_version=5)
    content = open(p, "rb").read()
    assert is_cfb(content)
    out = stdlib_xls_parser(content)  # dispatches via the 'Book' stream name
    assert list(out) == ["Hoja1", "S2"]
    assert out["Hoja1"] == [
        ["ítem", "qty"],
        ["café", "3"],
        ["naïve", "-2.25"],
        ["True"],
    ]
    assert out["S2"] == [["x"], ["1"]]


def test_biff5_ministream_and_grid_pipeline(tmp_path):
    p = write_minimal_xls(
        str(tmp_path / "small5.xls"), {"S": [["v"], ["7"]]},
        pad=False, biff_version=5,
    )
    assert stdlib_xls_parser(open(p, "rb").read()) == {"S": [["v"], ["7"]]}


def test_sst_continue_split_roundtrip(tmp_path):
    """SST strings split across CONTINUE records — including a string much
    longer than the record limit (multiple continuations) and non-ASCII
    payloads — must reconstruct character-for-character."""
    long_s = "lorem-ipsum-" * 40  # 480 chars -> ~960 bytes of UTF-16
    data = {
        "S": [
            [long_s, "short"],
            ["ünïcødé-" + "x" * 50, long_s],  # SST dedups the repeat
            ["tail"],
        ]
    }
    p = write_minimal_xls(
        str(tmp_path / "cont.xls"), data, sst_continue_limit=64
    )
    content = open(p, "rb").read()
    stream = cfb_open_stream(content, "Workbook")
    # the stream really does carry CONTINUE records (0x003C)
    n_cont = 0
    pos = 0
    while pos + 4 <= len(stream):
        rid, rlen = struct.unpack_from("<HH", stream, pos)
        n_cont += rid == 0x003C
        pos += 4 + rlen
        if rid == 0x000A and pos > 200:
            break
    assert n_cont >= 3
    out = stdlib_xls_parser(content)
    assert out["S"][0] == [long_s, "short"]
    assert out["S"][1] == ["ünïcødé-" + "x" * 50, long_s]
    assert out["S"][2] == ["tail"]


def test_sst_continue_limit_validation(tmp_path):
    with pytest.raises(ValueError):
        write_minimal_xls(
            str(tmp_path / "bad.xls"), {"S": [["x"]]}, sst_continue_limit=4
        )


def test_default_parser_chain_dispatches_on_magic(tmp_path):
    from worker_etl_spark.sources.excel import default_xlsx_parser, write_minimal_xlsx

    xls = write_minimal_xls(str(tmp_path / "a.xls"), {"S": [["v"], ["1"]]})
    xlsx = write_minimal_xlsx(str(tmp_path / "a.xlsx"), {"S": [["v"], ["1"]]})
    assert default_xlsx_parser(open(xls, "rb").read()) == {"S": [["v"], ["1"]]}
    assert default_xlsx_parser(open(xlsx, "rb").read()) == {"S": [["v"], ["1"]]}


def test_biff5_codepage_after_boundsheet():
    """Round-4 ADVICE: globals record order isn't guaranteed — a workbook
    whose CODEPAGE record FOLLOWS its BOUNDSHEETs must still decode sheet
    names in the declared codepage (two-pass globals scan), not cp1252."""
    import struct

    from worker_etl_spark.sources.biff import (
        _BOF,
        _BOUNDSHEET,
        _CODEPAGE,
        _EOF,
        _LABEL,
        _parse_biff5,
        _rec,
    )

    name = "Лист1"  # Cyrillic: cp1251 bytes decode differently under cp1252
    enc = name.encode("cp1251")
    cell = "привет".encode("cp1251")

    body = bytearray()
    body += _rec(_BOF, struct.pack("<HHHHII", 0x0500, 0x0010, 0, 0, 0, 0))
    body += _rec(_LABEL, struct.pack("<HHHH", 0, 0, 0, len(cell)) + cell)
    body += _rec(_EOF, b"")

    def globals_block(off: int) -> bytes:
        g = bytearray()
        g += _rec(_BOF, struct.pack("<HHHHII", 0x0500, 0x0005, 0, 0, 0, 0))
        # BOUNDSHEET first, CODEPAGE last — the adversarial order
        g += _rec(_BOUNDSHEET, struct.pack("<IBBB", off, 0, 0, len(enc)) + enc)
        g += _rec(_CODEPAGE, struct.pack("<H", 1251))
        g += _rec(_EOF, b"")
        return bytes(g)

    glen = len(globals_block(0))
    stream = globals_block(glen) + bytes(body)
    out = _parse_biff5(stream)
    assert list(out) == [name]
    assert out[name] == [["привет"]]
