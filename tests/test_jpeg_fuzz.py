"""Property-based fuzz for the baseline JPEG codec.

Two properties the hand-written vectors cannot sweep:

1. ROUND-TRIP: arbitrary pixel grids through encode->decode must reproduce
   the encoder's own quantize-dequantize reconstruction exactly (the
   entropy layer — Huffman, ZRL/EOB runs, byte stuffing, DC prediction —
   is lossless by construction; only quantization may change values).
   Verified against an independent FDCT/IDCT reference computed in the
   test, so a paired codec bug cannot cancel.

2. CRASH-SAFETY: truncating or corrupting a valid stream must raise a
   clean ValueError/NotImplementedError/IndexError/struct.error — never
   hang, never return pixels of the wrong shape (a decoder that silently
   "succeeds" on garbage would poison m13's quarantine-style callers).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from worker_etl_spark.operators.jpeg import (
    QTABLE_LUM,
    decode_jpeg_gray,
    encode_jpeg_gray,
)

_dims = st.tuples(st.integers(1, 40), st.integers(1, 32))


def _reference_reconstruction(rows, w, h):
    """Independent quantize-dequantize pipeline (edge-replicated padding,
    FDCT, Annex K quantization, IDCT, clamp) — written here, not imported."""
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1 / 8) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    q = np.array(QTABLE_LUM, dtype=np.float64).reshape(8, 8)
    px = np.asarray(rows, dtype=np.float64)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.empty((ph, pw))
    pad[:h, :w] = px
    pad[h:, :w] = px[-1:, :]
    pad[:h, w:] = pad[:h, w - 1:w]
    pad[h:, w:] = px[-1, -1]
    out = np.empty((ph, pw))
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = pad[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            qc = np.rint((m @ blk @ m.T) / q)
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
                np.rint(m.T @ (qc * q) @ m + 128.0), 0, 255
            )
    return out[:h, :w].astype(np.uint8)


@given(
    dims=_dims,
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_matches_independent_reference(dims, seed):
    w, h = dims
    v = seed or 1
    rows = []
    for _y in range(h):
        r = []
        for _x in range(w):
            v = (v * 1103515245 + 12345) % (1 << 31)
            r.append(v % 256)
        rows.append(r)
    dw, dh, px = decode_jpeg_gray(encode_jpeg_gray(rows, w, h))
    assert (dw, dh) == (w, h)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    assert np.array_equal(got, _reference_reconstruction(rows, w, h))


@given(cut=st.integers(1, 200), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_truncation_is_crash_safe(cut, seed):
    """Truncation either raises cleanly or — when the cut removed only the
    EOI/trailing bytes after a complete entropy payload, which real decoders
    tolerate — returns the declared shape.  Never hangs, never mis-sizes."""
    v = seed or 7
    rows = []
    for _y in range(16):
        r = []
        for _x in range(24):
            v = (v * 1103515245 + 12345) % (1 << 31)
            r.append(v % 256)
        rows.append(r)
    data = encode_jpeg_gray(rows, 24, 16)
    truncated = data[: max(2, len(data) - cut)]
    try:
        w, h, px = decode_jpeg_gray(truncated)
    except (ValueError, NotImplementedError, IndexError, struct.error):
        return
    assert (w, h) == (24, 16) and len(px) == 24 * 16
    # a cut that removed header segments cannot silently succeed
    scan_start = data.index(b"\xff\xda") + 14
    if len(truncated) < scan_start:
        raise AssertionError("decode succeeded without a complete header")


@given(pos=st.integers(2, 400), bit=st.integers(0, 7), seed=st.integers(0, 999))
@settings(max_examples=60, deadline=None)
def test_bitflip_never_returns_wrong_shape(pos, bit, seed):
    """A single-bit corruption either still decodes to the DECLARED
    dimensions (entropy bits changed: different pixels, same shape) or
    raises cleanly — it never hangs or returns a mis-sized buffer."""
    v = seed * 2654435761 % (1 << 31) or 3
    rows = []
    for _y in range(16):
        r = []
        for _x in range(16):
            v = (v * 1103515245 + 12345) % (1 << 31)
            r.append(v % 256)
        rows.append(r)
    data = bytearray(encode_jpeg_gray(rows, 16, 16))
    data[pos % len(data)] ^= 1 << bit
    try:
        w, h, px = decode_jpeg_gray(bytes(data))
    except (ValueError, NotImplementedError, IndexError, KeyError, struct.error):
        return
    assert len(px) == w * h
