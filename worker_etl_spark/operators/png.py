"""Pure-stdlib PNG codec (encode + decode) for the multimodal pixel path.

PIL/imageio are absent in this environment, but PNG itself is a public,
stdlib-decodable format (RFC 2083 / the W3C PNG spec): chunked framing with
CRC-32, a zlib-compressed IDAT stream, and five per-scanline byte filters
(None/Sub/Up/Average/Paeth).  This module implements exactly the subset the
engine's image fixtures need — 8-bit greyscale (color type 0), truecolor
(2) and truecolor+alpha (6), no interlace, no palette — and refuses
everything else loudly, the same refusal discipline as the BIFF5 subsets in
``sources/biff.py``.

This replaces the byte-level stand-in on ONE m-family path (m11): the bytes
going through ``mapInPandas`` are real PNG files, the decode inside the
Arrow batch is a real inflate + per-row unfilter, and the DuckDB oracle
recomputes the same statistics from the pixel FORMULA — so a wrong filter
reconstruction or a wrong IDAT framing shows up as a hash mismatch, not a
silent pass.  (Encoder filter choice deliberately cycles through all five
types so every decode exercises every unfilter.)

Per-pixel work here is a plain Python loop: fixture images are tiny by
construction, and the production posture for real imagery is a native codec
inside the same mapInPandas slot — the Spark-side plumbing (binaryFile
scan, Arrow batches, schema) is what carries to 100 TB, not this loop.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type → samples per pixel (8-bit only)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (spec §6.6): nearest of left a, above b, upper-left c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(rows: list[list[int]], width: int, height: int, channels: int = 3) -> bytes:
    """Encode 8-bit pixels → PNG bytes.

    *rows* is ``height`` scanlines, each ``width * channels`` ints (0-255).
    The scanline filter cycles ``y % 5`` through all five spec filters so a
    decoder must implement every reconstruction to read the output."""
    color_type = {1: 0, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"channels must be 1, 3 or 4 (got {channels})")
    bpp = channels
    raw = bytearray()
    prev = bytes(width * channels)
    for y, row in enumerate(rows):
        if len(row) != width * channels:
            raise ValueError(f"row {y}: {len(row)} values != width*channels")
        cur = bytes(row)
        ftype = y % 5
        raw.append(ftype)
        for i, x in enumerate(cur):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                f = x
            elif ftype == 1:
                f = (x - a) & 0xFF
            elif ftype == 2:
                f = (x - b) & 0xFF
            elif ftype == 3:
                f = (x - (a + b) // 2) & 0xFF
            else:
                f = (x - _paeth(a, b, c)) & 0xFF
            raw.append(f)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes → (width, height, channels, pixels).

    *pixels* is ``height * width * channels`` reconstructed bytes in scanline
    order.  Verifies chunk CRCs; refuses interlace, palettes, and non-8-bit
    depths loudly rather than mis-decoding."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if color_type not in _CHANNELS:
                raise ValueError(
                    f"unsupported color type {color_type} (0/2/6 only; no palette)"
                )
            if interlace:
                raise ValueError("interlaced PNG not supported")
            if comp or filt:
                raise ValueError("nonstandard compression/filter method")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        # ancillary chunks are skipped (CRC still verified above)
    if width < 0:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = channels
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(f"IDAT size {len(raw)} != {(stride + 1) * height}")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        cur = bytearray(stride)
        for i, f in enumerate(line):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                x = f
            elif ftype == 1:
                x = (f + a) & 0xFF
            elif ftype == 2:
                x = (f + b) & 0xFF
            elif ftype == 3:
                x = (f + (a + b) // 2) & 0xFF
            elif ftype == 4:
                x = (f + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"unknown scanline filter {ftype}")
            cur[i] = x
        out[y * stride : (y + 1) * stride] = cur
        prev = bytes(cur)
    return width, height, channels, bytes(out)
