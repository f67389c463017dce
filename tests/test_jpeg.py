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


# --- color (YCbCr 4:2:0) path -------------------------------------------------


def _constant_mcu_planes(vals: dict, nmx: int, nmy: int):
    """(y, cb, cr) planes with constant 16x16 MCUs from vals[(mx,my)]."""
    h, w = nmy * 16, nmx * 16
    y = np.zeros((h, w))
    cb = np.zeros((h // 2, w // 2))
    cr = np.zeros((h // 2, w // 2))
    for (mx, my), (yv, cbv, crv) in vals.items():
        y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = yv
        cb[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = cbv
        cr[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = crv
    return y, cb, cr


def test_color_constant_mcus_roundtrip_exactly():
    """Even (Y-128) offsets and multiple-of-17 (C-128) offsets survive the
    Annex K DC quanta exactly — every pixel of every MCU must equal the
    closed-form BT.601 inverse of the encoded YCbCr triple (m15's oracle
    contract)."""
    from worker_etl_spark.operators.jpeg import decode_jpeg_color, encode_jpeg_ycbcr420

    vals = {}
    for my in range(2):
        for mx in range(3):
            vals[(mx, my)] = (
                128 + 2 * (((7 * mx + 5 * my) % 50) - 25),
                128 + 17 * (((mx + my) % 5) - 2),
                128 + 17 * (((2 * mx + my) % 5) - 2),
            )
    data = encode_jpeg_ycbcr420(*_constant_mcu_planes(vals, 3, 2))
    w, h, rgb = decode_jpeg_color(data)
    assert (w, h) == (48, 32)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    for (mx, my), (yv, cbv, crv) in vals.items():
        exp = (
            int(np.rint(yv + 1.402 * (crv - 128))),
            int(np.rint(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128))),
            int(np.rint(yv + 1.772 * (cbv - 128))),
        )
        block = arr[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16]
        assert block.min(axis=(0, 1)).tolist() == list(exp)
        assert block.max(axis=(0, 1)).tolist() == list(exp)


def test_color_smooth_image_decodes_close():
    """General RGB encode->decode: smooth gradients survive 4:2:0 chroma
    subsampling + Annex K quantization with small mean error (lossy, so a
    bounded-error check, not equality)."""
    from worker_etl_spark.operators.jpeg import decode_jpeg_color, encode_jpeg_rgb

    xs, ys = np.meshgrid(np.arange(48), np.arange(32))
    img = np.stack(
        [(xs * 3) % 200 + 20, (ys * 4) % 180 + 30, ((xs + ys) * 2) % 160 + 40],
        axis=2,
    )
    w, h, rgb = decode_jpeg_color(encode_jpeg_rgb(img.tolist(), 48, 32))
    assert (w, h) == (48, 32)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(32, 48, 3).astype(int)
    assert np.abs(arr - img).mean() < 5.0


def test_color_non_mcu_multiple_dims_crop():
    """SOF carries true dims; the decoder crops the padded MCU grid back."""
    from worker_etl_spark.operators.jpeg import decode_jpeg_color, encode_jpeg_rgb

    rng = np.random.default_rng(11)
    img = rng.integers(40, 200, size=(19, 21, 3))
    w, h, rgb = decode_jpeg_color(encode_jpeg_rgb(img.tolist(), 21, 19))
    assert (w, h) == (21, 19)
    assert len(rgb) == 21 * 19 * 3


def test_gray_file_through_color_entry():
    from worker_etl_spark.operators.jpeg import decode_jpeg_color

    rows = [[(x * 7 + y * 5) % 256 for x in range(24)] for y in range(16)]
    w, h, rgb = decode_jpeg_color(encode_jpeg_gray(rows, 24, 16))
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(16, 24, 3)
    assert (arr[..., 0] == arr[..., 1]).all()
    assert (arr[..., 1] == arr[..., 2]).all()
    gw, gh, gpx = decode_jpeg_gray(encode_jpeg_gray(rows, 24, 16))
    assert arr[..., 0].tobytes() == gpx


def test_gray_entry_still_refuses_color():
    from worker_etl_spark.operators.jpeg import encode_jpeg_ycbcr420

    y = np.full((16, 16), 130.0)
    c = np.full((8, 8), 128.0)
    data = encode_jpeg_ycbcr420(y, c, c)
    with pytest.raises(NotImplementedError, match="multi-component"):
        decode_jpeg_gray(data)


def test_color_encoder_rejects_bad_planes():
    from worker_etl_spark.operators.jpeg import encode_jpeg_ycbcr420

    with pytest.raises(ValueError, match="16-multiple"):
        encode_jpeg_ycbcr420(np.zeros((8, 8)), np.zeros((4, 4)), np.zeros((4, 4)))
    with pytest.raises(ValueError, match="chroma planes"):
        encode_jpeg_ycbcr420(np.zeros((16, 16)), np.zeros((16, 16)), np.zeros((8, 8)))


def test_color_444_decodes():
    """A hand-assembled 4:4:4 frame (all sampling 0x11) exercises the
    one-block-per-component MCU path the 4:2:0 encoder never emits."""
    from worker_etl_spark.operators.jpeg import (
        AC_CHROM_BITS,
        AC_CHROM_VALS,
        DC_CHROM_BITS,
        DC_CHROM_VALS,
        QTABLE_CHROM,
        decode_jpeg_color,
        _BitWriter,
        _encode_block,
    )

    ql = np.array(QTABLE_LUM, dtype=np.float64).reshape(8, 8)
    qc = np.array(QTABLE_CHROM, dtype=np.float64).reshape(8, 8)
    dc_l = _build_huffman_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _build_huffman_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _build_huffman_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _build_huffman_codes(AC_CHROM_BITS, AC_CHROM_VALS)
    yv, cbv, crv = 132, 128 + 34, 128 - 17
    bw = _BitWriter()
    _encode_block(bw, np.full((8, 8), float(yv)), ql, dc_l, ac_l, 0)
    _encode_block(bw, np.full((8, 8), float(cbv)), qc, dc_c, ac_c, 0)
    _encode_block(bw, np.full((8, 8), float(crv)), qc, dc_c, ac_c, 0)
    scan = bw.flush()
    data = (
        b"\xff\xd8"
        + _seg(0xFFDB, bytes([0x00]) + bytes(QTABLE_LUM[ZIGZAG[k]] for k in range(64)))
        + _seg(0xFFDB, bytes([0x01]) + bytes(QTABLE_CHROM[ZIGZAG[k]] for k in range(64)))
        + _seg(
            0xFFC0,
            struct.pack(">BHHB", 8, 8, 8, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        + _seg(0xFFC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
        + _seg(0xFFC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
        + _seg(0xFFC4, bytes([0x01]) + bytes(DC_CHROM_BITS) + bytes(DC_CHROM_VALS))
        + _seg(0xFFC4, bytes([0x11]) + bytes(AC_CHROM_BITS) + bytes(AC_CHROM_VALS))
        + _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )
    w, h, rgb = decode_jpeg_color(data)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(8, 8, 3)
    exp = (
        int(np.rint(yv + 1.402 * (crv - 128))),
        int(np.rint(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128))),
        int(np.rint(yv + 1.772 * (cbv - 128))),
    )
    assert arr.min(axis=(0, 1)).tolist() == list(exp)
    assert arr.max(axis=(0, 1)).tolist() == list(exp)
