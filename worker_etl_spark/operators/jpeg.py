"""Pure-stdlib+numpy baseline JPEG codec (grayscale + YCbCr color) for the
multimodal pixel path — the second real image format after PNG
(``operators/png.py``).

PIL/imageio are absent in this environment, but baseline JPEG is a public
format (ITU-T T.81 / ISO 10918-1): marker-segmented framing, 8x8 forward
DCT, table-driven quantization, zigzag RLE, and canonical Huffman entropy
coding with 0xFF byte-stuffing.  This module implements baseline sequential
(SOF0), 8-bit, grayscale AND interleaved multi-component YCbCr (4:4:4,
4:2:2, 4:2:0 — sampling factors up to 2), no restart intervals, no
progressive — and refuses everything else loudly (the same refusal
discipline as the BIFF5 subsets in ``sources/biff.py`` and the PNG
color-type gate).

The encoders are REAL lossy JPEG encoders (FDCT + Annex K quantization +
Annex K canonical Huffman tables; the color encoder is JFIF 4:2:0 with
2x2 box chroma subsampling), and the decoder is a general baseline
decoder: it parses DQT/DHT/SOF0/SOS from the bitstream (it does NOT assume
the encoder's tables), Huffman-decodes the interleaved MCU entropy segment
bit-by-bit with byte-unstuffing, dequantizes, un-zigzags, runs the
separable orthonormal IDCT, replication-upsamples subsampled chroma, and
applies the JFIF YCbCr -> RGB transform.  Interoperability notes:

- Tables are read from the file, so any baseline JFIF produced by a
  standard encoder (libjpeg at any quality, with its DQT/DHT) decodes.
- Chroma upsampling is pixel replication (T.81-legal); libjpeg's default
  "fancy" upsampling interpolates, so real-world color decodes may differ
  from libjpeg by a few code values near chroma edges — documented, not a
  defect (the fixtures below are exact regardless).
- Fixture exactness (m13 gray / m15 color): a constant 8x8 block has only
  a DC coefficient, FDCT gives DC = 8*(level-128) exactly; with the Annex K
  luminance DC quantum of 16 any even (level-128) survives exactly, and
  with the chrominance DC quantum of 17 any (level-128) that is a multiple
  of 17 survives exactly.  A 16x16-constant color MCU therefore round-trips
  its YCbCr values bit-exactly despite JPEG being lossy (subsampling a
  constant is exact, replication-upsampling a constant is exact), which is
  what lets the DuckDB oracle recompute decoded-RGB statistics from the MCU
  FORMULA without seeing a JPEG byte.
- The AC/run-length/ZRL path is exercised by unit tests that encode
  non-constant images and compare against an independent NumPy IDCT
  reference (tests/test_jpeg.py), not by the fixtures alone.

Per-block work uses numpy matrix DCTs; the bit-level entropy coding is a
plain Python loop — fixture images are tiny by construction, and the
production posture for real imagery is a native codec inside the same
mapInPandas slot (see m11's scale note).
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order (T.81 Figure 5): index = zigzag position, value = raster
# position u*8+v.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 luminance quantization table (raster order).
QTABLE_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# Annex K.3 typical luminance Huffman specs: (BITS[1..16], HUFFVAL).
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


# Annex K.2 chrominance quantization table (raster order).
QTABLE_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical chrominance Huffman specs.
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix M: ``M @ s @ M.T`` is exactly the T.81
    FDCT (S(u,v) = 1/4 C(u)C(v) sum s cos...cos...), ``M.T @ S @ M`` its
    inverse."""
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1 / 8) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_M = _dct_matrix()


def _build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman per T.81 Annex C: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decode."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_huffman_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _category(v: int) -> int:
    """SSSS magnitude category: smallest n with |v| < 2**n."""
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    prev_dc: int,
) -> int:
    """FDCT + quantize + zigzag + entropy-code one 8x8 sample block (level
    already NOT shifted — this shifts by 128); returns the new DC predictor."""
    coef = _M @ (block - 128.0) @ _M.T
    qc = np.rint(coef / q).astype(np.int64)
    zz = [int(qc.flat[ZIGZAG[k]]) for k in range(64)]
    diff = zz[0] - prev_dc
    ssss = _category(diff)
    code, length = dc_codes[ssss]
    bw.write(code, length)
    if ssss:
        bw.write(diff if diff > 0 else diff + (1 << ssss) - 1, ssss)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL: 16 zeros
            bw.write(c, ln)
            run -= 16
        s = _category(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return zz[0]


def _pad_to(px: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate a (h, w) plane up to (ph, pw)."""
    h, w = px.shape
    padded = np.empty((ph, pw))
    padded[:h, :w] = px
    padded[h:, :w] = px[-1:, :]
    padded[:, w:] = padded[:, w - 1:w]  # also fills the corner
    return padded


def encode_jpeg_gray(rows: list[list[int]], width: int, height: int) -> bytes:
    """Encode 8-bit grayscale pixels -> baseline JFIF bytes.

    *rows* is ``height`` scanlines of ``width`` ints (0-255).  Dimensions
    not multiples of 8 are edge-replicated to the MCU grid (decoder crops
    back per SOF0).  Quantization uses the Annex K luminance table; entropy
    coding the Annex K luminance Huffman tables, both written to the stream
    as DQT/DHT so any conformant decoder reads them."""
    if height <= 0 or width <= 0 or len(rows) != height:
        raise ValueError("bad dimensions")
    px = np.asarray(rows, dtype=np.float64)
    if px.shape != (height, width):
        raise ValueError("ragged scanlines")
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    padded = _pad_to(px, ph, pw)

    q = np.array(QTABLE_LUM, dtype=np.float64).reshape(8, 8)
    dc_codes = _build_huffman_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _build_huffman_codes(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            prev_dc = _encode_block(
                bw,
                padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                q,
                dc_codes,
                ac_codes,
                prev_dc,
            )
    scan = bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0x00]) + bytes(QTABLE_LUM[ZIGZAG[k]] for k in range(64)))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xFFC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg_ycbcr420(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    sof_width: int | None = None,
    sof_height: int | None = None,
) -> bytes:
    """Encode pre-computed YCbCr planes -> baseline JFIF 4:2:0 bytes.

    ``y`` is (h, w) with h, w multiples of 16; ``cb``/``cr`` are the
    already-subsampled (h/2, w/2) chroma planes.  This plane-level entry
    exists for the exact-quantization fixtures (m15): a caller that pins Y
    to even (Y-128) offsets and chroma to multiples-of-17 (Cb-128) offsets
    per constant 16x16 MCU gets bit-exact round-trips (module docstring).
    ``encode_jpeg_rgb`` is the general entry that derives the planes.

    Layout per T.81: Y uses quant table 0 / Huffman tables 0 (Annex K
    luminance), Cb/Cr quant table 1 / Huffman tables 1 (Annex K
    chrominance); one interleaved scan, MCU = Y00 Y01 Y10 Y11 Cb Cr, with
    an independent DC predictor per component.  ``sof_width``/``sof_height``
    override the frame dimensions written to SOF0 (callers that padded to
    the MCU grid pass the TRUE dims so the decoder crops back)."""
    h, w = y.shape
    if h % 16 or w % 16:
        raise ValueError("plane-level 4:2:0 encode requires 16-multiple dims")
    if cb.shape != (h // 2, w // 2) or cr.shape != (h // 2, w // 2):
        raise ValueError("chroma planes must be (h/2, w/2)")
    ql = np.array(QTABLE_LUM, dtype=np.float64).reshape(8, 8)
    qc = np.array(QTABLE_CHROM, dtype=np.float64).reshape(8, 8)
    dc_l = _build_huffman_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _build_huffman_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _build_huffman_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _build_huffman_codes(AC_CHROM_BITS, AC_CHROM_VALS)
    bw = _BitWriter()
    prev = [0, 0, 0]  # per-component DC predictors
    for my in range(h // 16):
        for mx in range(w // 16):
            for vy in range(2):  # four Y blocks, raster order within the MCU
                for vx in range(2):
                    by, bx = my * 16 + vy * 8, mx * 16 + vx * 8
                    prev[0] = _encode_block(
                        bw, y[by:by + 8, bx:bx + 8], ql, dc_l, ac_l, prev[0]
                    )
            cy, cx = my * 8, mx * 8
            prev[1] = _encode_block(
                bw, cb[cy:cy + 8, cx:cx + 8], qc, dc_c, ac_c, prev[1]
            )
            prev[2] = _encode_block(
                bw, cr[cy:cy + 8, cx:cx + 8], qc, dc_c, ac_c, prev[2]
            )
    scan = bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(
        0xFFDB, bytes([0x00]) + bytes(QTABLE_LUM[ZIGZAG[k]] for k in range(64))
    )
    out += _seg(
        0xFFDB, bytes([0x01]) + bytes(QTABLE_CHROM[ZIGZAG[k]] for k in range(64))
    )
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, sof_height or h, sof_width or w, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += _seg(0xFFC4, bytes([0x01]) + bytes(DC_CHROM_BITS) + bytes(DC_CHROM_VALS))
    out += _seg(0xFFC4, bytes([0x11]) + bytes(AC_CHROM_BITS) + bytes(AC_CHROM_VALS))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_rgb(rows: list[list[tuple[int, int, int]]], width: int, height: int) -> bytes:
    """Encode 8-bit RGB pixels -> baseline JFIF 4:2:0 bytes: JFIF color
    transform (BT.601 full-range), edge-replicate padding to the 16x16 MCU
    grid, 2x2 box chroma subsampling, then the plane-level encoder."""
    if height <= 0 or width <= 0 or len(rows) != height:
        raise ValueError("bad dimensions")
    px = np.asarray(rows, dtype=np.float64)
    if px.shape != (height, width, 3):
        raise ValueError("ragged scanlines / not RGB triples")
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    ph = (height + 15) // 16 * 16
    pw = (width + 15) // 16 * 16
    y = _pad_to(y, ph, pw)
    cb = _pad_to(cb, ph, pw)
    cr = _pad_to(cr, ph, pw)
    # 2x2 box subsample the chroma planes.
    cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    return encode_jpeg_ycbcr420(y, cb, cr, sof_width=width, sof_height=height)


class _BitReader:
    """Bit-serial reader over the entropy segment with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, ssss: int) -> int:
    """T.81 F.12 EXTEND: map SSSS magnitude bits to a signed value."""
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _decode_block(br: _BitReader, dc_tab: dict, ac_tab: dict, q: np.ndarray,
                  prev_dc: int) -> tuple[np.ndarray, int]:
    """Entropy-decode + dequantize + IDCT one 8x8 block; returns (samples
    as float64 pre-clip, new DC predictor)."""
    zz = [0] * 64
    ssss = br.decode_symbol(dc_tab)
    diff = _extend(br.read_bits(ssss), ssss) if ssss else 0
    prev_dc += diff
    zz[0] = prev_dc
    k = 1
    while k < 64:
        rs = br.decode_symbol(ac_tab)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        s = rs & 0x0F
        if s == 0:
            # T.81 allows size 0 only for EOB (0x00) and ZRL (0xF0), both
            # handled above; anything else is a corrupt scan.  Guard
            # explicitly — _extend(v, 0) would otherwise die on a
            # misleading "negative shift count".
            raise ValueError(f"invalid AC symbol 0x{rs:02X} (size 0)")
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    coef = np.zeros(64)
    for i in range(64):
        coef[ZIGZAG[i]] = zz[i]
    block = _M.T @ (coef.reshape(8, 8) * q) @ _M
    return block + 128.0, prev_dc


def _decode(data: bytes, allow_color: bool) -> tuple[int, int, list[np.ndarray]]:
    """General baseline decode -> (width, height, per-component uint8 planes
    at FULL resolution, replication-upsampled and cropped).

    Parses DQT/DHT/SOF0/SOS from the stream, decodes the single interleaved
    scan MCU-by-MCU with per-component DC predictors and sampling factors up
    to 2x2 (4:4:4 / 4:2:2 / 4:2:0).  Refuses non-baseline frames
    (progressive SOF2, arithmetic), 16-bit quant tables, restart intervals,
    non-interleaved multi-scan files, and sampling factors above 2 —
    loudly, so an unsupported real-world file fails the job instead of
    producing garbage pixels.  ``allow_color=False`` refuses Nf != 1 at SOF
    (the grayscale entry point's contract)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (width, height, [(comp_id, hi, vi, tq)])
    scan = None  # [(comp_index, dc_id, ac_id)] in scan order
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # optional fill bytes (T.81 B.1.1.2): any number of extra 0xFF may
        # pad before a marker code — conformant encoders may emit them
        while data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS scan")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = list(payload[p + 1:p + 65])
                tab = [0] * 64
                for k in range(64):
                    tab[ZIGZAG[k]] = zz[k]
                qtables[tq] = tab
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                tab = _build_huffman_decoder(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = tab
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nf = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision unsupported")
            if nf != 1 and not allow_color:
                raise NotImplementedError("multi-component (color) unsupported")
            if nf not in (1, 3):
                raise NotImplementedError(f"Nf={nf} unsupported (1 or 3)")
            comps = []
            for c in range(nf):
                cid = payload[6 + 3 * c]
                sampling = payload[7 + 3 * c]
                tq = payload[8 + 3 * c]
                hi, vi = sampling >> 4, sampling & 0x0F
                if nf == 1 and sampling != 0x11:
                    raise NotImplementedError("subsampling unsupported for Nf=1")
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} unsupported (max 2x2)"
                    )
                comps.append((cid, hi, vi, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline frame SOF marker 0xFF{marker:02X} unsupported"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = payload[0]
            if ns != len(frame[2]):
                raise NotImplementedError(
                    "non-interleaved multi-scan files unsupported (Ns != Nf)"
                )
            scan = []
            for s in range(ns):
                cs = payload[1 + 2 * s]
                idx = next(
                    (i for i, c in enumerate(frame[2]) if c[0] == cs), None
                )
                if idx is None:
                    raise ValueError(f"scan references unknown component {cs}")
                scan.append((idx, payload[2 + 2 * s] >> 4, payload[2 + 2 * s] & 0x0F))
            break
        # APPn/COM/others: skipped
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, hi, vi, _tq in comps:
        if hmax % hi or vmax % vi:
            raise NotImplementedError(
                f"non-divisor sampling {hi}x{vi} vs max {hmax}x{vmax}"
            )
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.empty((mcy * vi * 8, mcx * hi * 8), dtype=np.float64)
        for _cid, hi, vi, _tq in comps
    ]
    qs = [
        np.array(qtables[tq], dtype=np.float64).reshape(8, 8)
        for _cid, _hi, _vi, tq in comps
    ]
    br = _BitReader(data, pos)
    prev = [0] * len(comps)
    for my in range(mcy):
        for mx in range(mcx):
            for idx, dc_id, ac_id in scan:
                _cid, hi, vi, _tq = comps[idx]
                for vy in range(vi):
                    for vx in range(hi):
                        block, prev[idx] = _decode_block(
                            br, dc_tables[dc_id], ac_tables[ac_id],
                            qs[idx], prev[idx],
                        )
                        by = (my * vi + vy) * 8
                        bx = (mx * hi + vx) * 8
                        planes[idx][by:by + 8, bx:bx + 8] = block
    out = []
    for i, (_cid, hi, vi, _tq) in enumerate(comps):
        p = planes[i]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(np.clip(np.rint(p[:h, :w]), 0, 255).astype(np.uint8))
    return w, h, out


def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode baseline grayscale JPEG bytes -> (width, height, pixels).

    Pixels are row-major 8-bit, cropped to the SOF0 dimensions.  Tables are
    parsed from the stream (DQT, up to 4 ids; DHT, DC/AC classes).  Refuses
    multi-component (color) frames — ``decode_jpeg_color`` is the color
    entry point — plus everything ``_decode`` refuses."""
    w, h, planes = _decode(data, allow_color=False)
    return w, h, planes[0].tobytes()


def decode_jpeg_color(data: bytes) -> tuple[int, int, bytes]:
    """Decode baseline JPEG bytes -> (width, height, interleaved RGB).

    3-component frames are decoded as JFIF YCbCr (BT.601 full-range inverse
    transform after replication-upsampling subsampled chroma); grayscale
    frames replicate the single plane into all three channels, so this is
    the general entry point for a mixed corpus.  Refusals as per
    ``_decode`` (progressive, arithmetic, DRI, >2x2 sampling, Ns != Nf)."""
    w, h, planes = _decode(data, allow_color=True)
    if len(planes) == 1:
        rgb = np.repeat(planes[0][..., None], 3, axis=2)
        return w, h, rgb.tobytes()
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = np.clip(np.rint(y + 1.402 * cr), 0, 255)
    g = np.clip(np.rint(y - 0.344136 * cb - 0.714136 * cr), 0, 255)
    b = np.clip(np.rint(y + 1.772 * cb), 0, 255)
    return w, h, np.stack([r, g, b], axis=2).astype(np.uint8).tobytes()
