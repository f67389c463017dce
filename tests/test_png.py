"""PNG codec conformance tests.

No third-party PNG implementation exists in this environment, so — as with
the Avro codec — the decoder is pinned against HAND-DERIVED spec vectors:
scanline filter bytes computed manually from the W3C PNG filter definitions
and assembled into a PNG independently of the encoder.  A matching
encode/decode bug pair cannot cancel out here (and cannot hide in m11
either, whose oracle recomputes statistics from the pixel formula).
"""

from __future__ import annotations

import struct
import zlib

import pytest

from worker_etl_spark.operators.png import PNG_SIG, _chunk, decode_png, encode_png


def _assemble(width: int, height: int, color_type: int, raw_scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _chunk(b"IEND", b"")
    )


def test_decode_hand_filtered_grayscale_sub_up_average():
    """3x3 greyscale, pixels 10..90 by row; filter bytes derived by hand:
    Sub row: 30-20=10 etc; Up row: 40-10=30 etc; Average row:
    70-(0+40)//2=50, 80-(70+50)//2=20, 90-(80+60)//2=20."""
    raw = bytes(
        [1, 10, 10, 10]  # Sub
        + [2, 30, 30, 30]  # Up
        + [3, 50, 20, 20]  # Average
    )
    w, h, ch, px = decode_png(_assemble(3, 3, 0, raw))
    assert (w, h, ch) == (3, 3, 1)
    assert list(px) == [10, 20, 30, 40, 50, 60, 70, 80, 90]


def test_decode_hand_filtered_rgb_paeth():
    """2x2 RGB with a Paeth row, filter bytes derived by hand from the spec
    predictor: row1 = [7-1, 8-2, 9-3, 10-7, 11-8, 12-9]."""
    raw = bytes([0, 1, 2, 3, 4, 5, 6] + [4, 6, 6, 6, 3, 3, 3])
    w, h, ch, px = decode_png(_assemble(2, 2, 2, raw))
    assert (w, h, ch) == (2, 2, 3)
    assert list(px) == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]


def test_roundtrip_exercises_all_five_filters():
    w, h = 9, 7  # 7 rows → filters 0,1,2,3,4,0,1 all hit
    rows = [[(x * 31 + y * 17 + c * 11) % 256 for x in range(w) for c in range(3)]
            for y in range(h)]
    data = encode_png(rows, w, h, channels=3)
    ow, oh, och, px = decode_png(data)
    assert (ow, oh, och) == (w, h, 3)
    assert list(px) == [v for row in rows for v in row]
    # greyscale + alpha variants round-trip too
    g = [[(x * 7 + y * 13) % 256 for x in range(w)] for y in range(h)]
    assert list(decode_png(encode_png(g, w, h, channels=1))[3]) == [v for r in g for v in r]
    a = [[(x + y + c) % 256 for x in range(w) for c in range(4)] for y in range(h)]
    assert list(decode_png(encode_png(a, w, h, channels=4))[3]) == [v for r in a for v in r]


def test_decoder_refuses_unsupported_and_corrupt():
    rows = [[0, 0, 0]]
    data = bytearray(encode_png(rows, 1, 1, channels=3))
    data[20] ^= 0xFF  # flip a byte inside IHDR → CRC must fail
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"JFIF" + bytes(16))
    # 16-bit depth refused, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    bad = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)
    # palette refused
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    bad = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="color type"):
        decode_png(bad)


def test_ancillary_chunks_skipped_but_crc_checked():
    rows = [[5, 6, 7]]
    data = encode_png(rows, 1, 1, channels=3)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    spliced = data[:ihdr_end] + _chunk(b"tEXt", b"k\x00v") + data[ihdr_end:]
    assert list(decode_png(spliced)[3]) == [5, 6, 7]
