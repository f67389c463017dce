"""Pure-stdlib+numpy baseline JPEG codec (grayscale) for the multimodal
pixel path — the second real image format after PNG (``operators/png.py``).

PIL/imageio are absent in this environment, but baseline JPEG is a public
format (ITU-T T.81 / ISO 10918-1): marker-segmented framing, 8x8 forward
DCT, table-driven quantization, zigzag RLE, and canonical Huffman entropy
coding with 0xFF byte-stuffing.  This module implements exactly the subset
the engine's image fixtures need — baseline sequential (SOF0), single
component (grayscale), 8-bit, no restart intervals, no progressive — and
refuses everything else loudly (the same refusal discipline as the BIFF5
subsets in ``sources/biff.py`` and the PNG color-type gate).

The encoder is a REAL lossy JPEG encoder (FDCT + Annex K luminance
quantization + Annex K canonical Huffman tables), and the decoder is a
general baseline-grayscale decoder: it parses DQT/DHT/SOF0/SOS from the
bitstream (it does NOT assume the encoder's tables), Huffman-decodes the
entropy segment bit-by-bit with byte-unstuffing, dequantizes, un-zigzags,
and runs the separable orthonormal IDCT.  Interoperability notes:

- Tables are read from the file, so any baseline grayscale JFIF produced by
  a standard encoder (libjpeg at any quality, with its DQT/DHT) decodes.
- Fixture exactness (m13): a constant 8x8 block has only a DC coefficient,
  FDCT gives DC = 8*(level-128) exactly, and with the Annex K DC quantum of
  16 any even (level-128) quantizes and reconstructs EXACTLY — so fixtures
  built from constant blocks round-trip bit-exactly despite JPEG being
  lossy, which is what lets the DuckDB oracle recompute pixel statistics
  from the block FORMULA without seeing a JPEG byte.
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
    padded = np.empty((ph, pw))
    padded[:height, :width] = px
    padded[height:, :width] = px[-1:, :]
    padded[:height, width:] = px[:, -1:]
    padded[height:, width:] = px[-1, -1]

    q = np.array(QTABLE_LUM, dtype=np.float64).reshape(8, 8)
    dc_codes = _build_huffman_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _build_huffman_codes(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coef = _M @ block @ _M.T
            qc = np.rint(coef / q).astype(np.int64)
            zz = [int(qc.flat[ZIGZAG[k]]) for k in range(64)]
            # DC: differential, category + offset bits
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            ssss = _category(diff)
            code, length = dc_codes[ssss]
            bw.write(code, length)
            if ssss:
                bw.write(diff if diff > 0 else diff + (1 << ssss) - 1, ssss)
            # AC: (run, size) symbols with ZRL/EOB
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
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0x00]) + bytes(QTABLE_LUM[ZIGZAG[k]] for k in range(64)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


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


def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode baseline grayscale JPEG bytes -> (width, height, pixels).

    Pixels are row-major 8-bit, cropped to the SOF0 dimensions.  Tables are
    parsed from the stream (DQT, up to 4 ids; DHT, DC/AC classes).  Refuses
    non-baseline frames (progressive SOF2, arithmetic), multi-component
    scans (color), 16-bit quant tables, and restart intervals — loudly, so
    an unsupported real-world file fails the job instead of producing
    garbage pixels."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (width, height, qtable_id)
    scan_ids = None  # (dc_id, ac_id)
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
            if nf != 1:
                raise NotImplementedError("multi-component (color) unsupported")
            sampling, tq = payload[7], payload[8]
            if sampling != 0x11:
                raise NotImplementedError("subsampling unsupported for Nf=1")
            frame = (w, h, tq)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline frame SOF marker 0xFF{marker:02X} unsupported"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            if ns != 1:
                raise NotImplementedError("multi-component scan unsupported")
            scan_ids = (payload[2] >> 4, payload[2] & 0x0F)
            break
        # APPn/COM/others: skipped
    if frame is None or scan_ids is None:
        raise ValueError("missing SOF0/SOS")
    w, h, tq = frame
    q = np.array(qtables[tq], dtype=np.float64).reshape(8, 8)
    dc_tab, ac_tab = dc_tables[scan_ids[0]], ac_tables[scan_ids[1]]

    br = _BitReader(data, pos)
    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    out = np.empty((bh_ * 8, bw_ * 8), dtype=np.uint8)
    prev_dc = 0
    for by in range(bh_):
        for bx in range(bw_):
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
                    # T.81 allows size 0 only for EOB (0x00) and ZRL (0xF0),
                    # both handled above; anything else is a corrupt scan.
                    # Guard explicitly — _extend(v, 0) would otherwise die
                    # on a misleading "negative shift count".
                    raise ValueError(f"invalid AC symbol 0x{rs:02X} (size 0)")
                if k > 63:
                    raise ValueError("AC run overflows block")
                zz[k] = _extend(br.read_bits(s), s)
                k += 1
            coef = np.zeros(64)
            for i in range(64):
                coef[ZIGZAG[i]] = zz[i]
            block = _M.T @ (coef.reshape(8, 8) * q) @ _M
            px = np.clip(np.rint(block + 128.0), 0, 255).astype(np.uint8)
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = px
    return w, h, out[:h, :w].tobytes()
