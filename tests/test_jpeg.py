"""Baseline JPEG codec conformance tests.

No third-party JPEG implementation exists in this environment, so — as with
the PNG and Avro codecs — the decoder is pinned against HAND-DERIVED spec
vectors: entropy-coded bytes assembled by hand from the T.81 Annex K
canonical Huffman codes (derived manually from BITS/HUFFVAL below),
independently of the encoder.  A matching encode/decode bug pair cannot
cancel out here (and cannot hide in m13 either, whose oracle recomputes
statistics from the block formula without seeing a JPEG byte).

Hand derivation used below (Annex C canonical assignment):
- DC luminance: cat0=00(2), cat1=010, cat2=011, cat3=100, cat4=101,
  cat5=110 (3 bits each), cat6=1110, cat7=11110, ...
- AC luminance: 0x01=00, 0x02=01 (2 bits), 0x03=100 (3), 0x00/EOB=1010,
  0x04=1011, 0x11=1100 (4 bits), ...
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from worker_etl_spark.operators.jpeg import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    QTABLE_LUM,
    ZIGZAG,
    _build_huffman_codes,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _assemble(width: int, height: int, qtable: list[int], scan: bytes) -> bytes:
    """Hand-assemble a baseline grayscale JPEG around *scan* entropy bytes
    (qtable given in RASTER order, written in zigzag per spec)."""
    return (
        b"\xff\xd8"
        + _seg(0xFFDB, bytes([0x00]) + bytes(qtable[ZIGZAG[k]] for k in range(64)))
        + _seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
        + _seg(0xFFC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
        + _seg(0xFFC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
        + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )


def test_huffman_canonical_assignment_matches_hand_derivation():
    dc = _build_huffman_codes(DC_LUM_BITS, DC_LUM_VALS)
    assert dc[0] == (0b00, 2)
    assert dc[1] == (0b010, 3)
    assert dc[5] == (0b110, 3)
    assert dc[6] == (0b1110, 4)
    ac = _build_huffman_codes(AC_LUM_BITS, AC_LUM_VALS)
    assert ac[0x01] == (0b00, 2)
    assert ac[0x02] == (0b01, 2)
    assert ac[0x03] == (0b100, 3)
    assert ac[0x00] == (0b1010, 4)  # EOB
    assert ac[0x11] == (0b1100, 4)
    assert ac[0xF0] == (0b11111111001, 11)  # ZRL (from the spec table)


def test_decode_hand_assembled_dc_only_block():
    """One 8x8 block, Annex K quant (DC quantum 16).  DC diff = +16
    (category 5): code 110 + bits 10000; EOB 1010.  Bit string
    110 10000 1010 padded with 1s -> 0xD0 0xAF.  Reconstruction:
    DC=16*16=256, DC-only IDCT pixel = 256/8 + 128 = 160 everywhere."""
    data = _assemble(8, 8, QTABLE_LUM, bytes([0xD0, 0xAF]))
    w, h, px = decode_jpeg_gray(data)
    assert (w, h) == (8, 8)
    assert set(px) == {160}


def test_decode_hand_assembled_dc_plus_ac_block():
    """All-ones quant table; DC diff=8 (cat 4: 101 1000), one AC at zigzag
    k=1 (raster u0v1) value 3, run 0 -> symbol 0x02: 01 + bits 11; EOB
    1010.  Bits: 101 1000 01 11 1010 (15 bits, pad 1) -> 0xB0 0xF5.  Expected
    pixels from an independently computed IDCT."""
    data = _assemble(8, 8, [1] * 64, bytes([0xB0, 0xF5]))
    w, h, px = decode_jpeg_gray(data)
    # independent orthonormal IDCT reference, written here from the formula
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1 / 8) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    coef = np.zeros((8, 8))
    coef[0, 0] = 8.0
    coef[0, 1] = 3.0
    ref = np.clip(np.rint(m.T @ coef @ m + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(np.frombuffer(px, dtype=np.uint8).reshape(8, 8), ref)


def test_constant_blocks_roundtrip_exactly():
    """Even (level-128) offsets survive the Annex K DC quantum of 16
    exactly — lossless despite JPEG being lossy (the m13 fixture design)."""
    for w, h in ((8, 8), (24, 16), (40, 24)):
        rows = [
            [
                128 + 2 * ((((y // 8) * 5 + (x // 8) * 3) % 120) - 60)
                for x in range(w)
            ]
            for y in range(h)
        ]
        dw, dh, px = decode_jpeg_gray(encode_jpeg_gray(rows, w, h))
        assert (dw, dh) == (w, h)
        assert np.array_equal(
            np.frombuffer(px, dtype=np.uint8).reshape(h, w),
            np.array(rows, dtype=np.uint8),
        )


def test_non_multiple_of_8_dims_are_padded_then_cropped():
    rows = [[(x * 5 + y * 9) % 256 for x in range(13)] for y in range(11)]
    dw, dh, px = decode_jpeg_gray(encode_jpeg_gray(rows, 13, 11))
    assert (dw, dh) == (13, 11)
    assert len(px) == 13 * 11


def test_lossy_roundtrip_stays_close_and_entropy_path_roundtrips():
    """Smooth gradient: decode(encode(img)) must reproduce the encoder's own
    quantized coefficients EXACTLY (Huffman/ZRL/EOB/stuffing roundtrip),
    checked via an independent re-encode-free reference: reconstruct
    expected pixels from the test's own FDCT+quantize of the source."""
    w, h = 32, 24
    rows = [[min(255, x * 4 + y * 2) for x in range(w)] for y in range(h)]
    dw, dh, px = decode_jpeg_gray(encode_jpeg_gray(rows, w, h))
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(np.int64)
    # independent reference reconstruction
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1 / 8) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    q = np.array(QTABLE_LUM, dtype=np.float64).reshape(8, 8)
    src = np.array(rows, dtype=np.float64)
    ref = np.empty((h, w))
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = src[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            qc = np.rint((m @ blk @ m.T) / q)
            ref[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
                np.rint(m.T @ (qc * q) @ m + 128.0), 0, 255
            )
    assert np.array_equal(arr, ref.astype(np.int64))


def test_byte_stuffing_roundtrip():
    """Content chosen to produce 0xFF bytes in the entropy stream (dense
    high-frequency noise makes them statistically certain across blocks);
    assert a stuffed 0xFF00 actually occurs, then roundtrip-decode."""
    v = 99991
    img = []
    for y in range(64):
        r = []
        for x in range(64):
            v = (v * 1103515245 + 12345) % (1 << 31)
            r.append(v % 256)
        img.append(r)
    data = encode_jpeg_gray(img, 64, 64)
    scan = data[data.index(b"\xff\xda") + 14:-2]
    assert b"\xff\x00" in scan, "noise scan produced no stuffed byte"
    dw, dh, px = decode_jpeg_gray(data)
    assert (dw, dh, len(px)) == (64, 64, 64 * 64)


def test_refusals_are_loud():
    rows = [[0] * 8] * 8
    good = encode_jpeg_gray(rows, 8, 8)
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x00\x01" + good[2:])  # no SOI
    # progressive: flip SOF0 -> SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(prog)
    # color frame: rewrite SOF with Nf=3 (payload len grows by 6)
    i = good.index(b"\xff\xc0")
    sof_color = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, 8, 8, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    seglen = struct.unpack_from(">H", good, i + 2)[0]
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(good[:i] + sof_color + good[i + 2 + seglen:])
    # restart interval
    dri = good[:i] + _seg(0xFFDD, struct.pack(">H", 4)) + good[i:]
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(dri)


def test_fill_bytes_before_markers_are_consumed():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a marker
    code; a conformant foreign encoder's padding must not break the parse
    (round-9 review)."""
    rows = [[128 + 2 * (x // 8) for x in range(16)] for y in range(8)]
    good = encode_jpeg_gray(rows, 16, 8)
    # inject fill bytes before the DQT and SOS markers
    padded = good.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1).replace(
        b"\xff\xda", b"\xff\xff\xff\xff\xda", 1
    )
    w, h, px = decode_jpeg_gray(padded)
    assert (w, h) == (16, 8)
    _, _, ref = decode_jpeg_gray(good)
    assert px == ref
