"""Multimodal column operators: opaque binary payloads + typed metadata.

Driver-mandated extension (SURVEY.md §2 "Driver-mandated extensions"; the
reference's closest concept is the BYTES type it accepts but degrades to
STRING, ``etl.py:1115-1117``).

Design: media are opaque ``BinaryType`` columns carried alongside a typed
metadata struct (kind/byte_len/content hash).  All per-item compute goes
through ``mapInPandas`` so payloads move as Arrow record batches — one
Python hop per *batch*, never per row — and each batch is processed by a
vectorized pandas function.  Partitioning: payload rows are independent, so
the operator preserves the upstream partitioning; at 100 TB the input would
be a ``binaryFile`` scan whose partition size is governed by
``spark.sql.files.maxPartitionBytes``.

The actual image/audio/video codecs are NOT present in this environment, so
``decode_media`` is an explicit stub: with a real codec library installed it
would decode; here it raises ``NotImplementedError`` unless the caller opts
into the deterministic fake used by the test/oracle path.  The Spark-side
plumbing (schemas, Arrow batching, UDF signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # codec libraries are optional; absent in this container
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_KINDS = ["image", "audio", "video"]

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Attach an opaque binary payload + metadata struct to each row.

    In production the payload comes from a ``binaryFile`` scan; the testbed
    derives a deterministic payload from the text column so the oracle can
    recompute every downstream feature.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col(id_col) % len(MEDIA_KINDS) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.length(payload).cast("long").alias("byte_len"),
            F.md5(payload).alias("content_md5"),
        ).alias("media_meta"),
    )


def decode_media(payload: bytes, kind: str) -> Any:
    """Decode one media payload. STUB — real codecs are not installed here.

    With Pillow/librosa/pyav available this dispatches to the real decoder;
    in this container it always raises so callers fall back to
    ``extract_features_fake`` (deterministic, oracle-checkable).
    """
    if kind == "image" and _HAS_PIL:
        import io

        return Image.open(io.BytesIO(payload))
    raise NotImplementedError(
        f"no codec for kind={kind!r} in this environment; "
        "use extract_features (deterministic fake) for the tested path"
    )


def _fake_features(doc_id: int, kind: str, payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for decode+feature-extract (arithmetic on the
    payload bytes/hash only, so the SQL oracle can recompute it exactly)."""
    h = hashlib.md5(payload).hexdigest()
    byte_len = len(payload)
    return {
        "doc_id": doc_id,
        "kind": kind,
        "byte_len": byte_len,
        "content_md5": h,
        "n_frames": byte_len // 64 + 1,
        "width": 32 * (1 + doc_id % 4),
        "height": 24 * (1 + doc_id % 3),
        "mean_luma": round((int(h[:8], 16) % 1_000_000) / 1_000_000.0, 6),
    }


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload, media_meta).

    Real Arrow-batched plumbing; the per-item "decode" is the deterministic
    fake (decode_media raises without codecs — see module docstring).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                _fake_features(int(r.doc_id), r.media_meta["kind"], bytes(r.payload))
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", LongType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_bytes: int = 64, stride: int = 4
) -> DataFrame:
    """Frame sampling for video-kind payloads: one output row per sampled
    frame (every *stride*-th fixed-size byte window of the payload).

    The explode-shaped mapInPandas plumbing is real: payloads arrive as
    Arrow batches, frames are byte-sliced from the actual binary, and
    offsets/lengths come from that slicing.  The per-frame FINGERPRINT is
    the codec stub (``md5(content_md5 ':' frame_idx)`` — a real decoder
    would hash decoded pixels), which keeps every emitted value
    recomputable by the SQL oracle while the batch shapes, schema, and
    slicing stay production-real.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict[str, Any]] = []
            for r in pdf.itertuples():
                if r.media_meta["kind"] != "video":
                    continue
                payload = bytes(r.payload)
                content_md5 = r.media_meta["content_md5"]
                n_frames = len(payload) // frame_bytes + 1
                for idx in range(0, n_frames, stride):
                    off = idx * frame_bytes
                    frame = payload[off : off + frame_bytes]
                    out.append(
                        {
                            "doc_id": int(r.doc_id),
                            "frame_idx": idx,
                            "frame_offset": off,
                            "frame_len": len(frame),
                            "frame_md5": hashlib.md5(
                                f"{content_md5}:{idx}".encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_windows", LongType()),
        StructField("n_samples", LongType()),
        StructField("total_energy", LongType()),
        StructField("peak_energy", LongType()),
        StructField("first_peak_w", LongType()),
    ]
)


def window_energy(df: DataFrame, window: int = 256) -> DataFrame:
    """Audio-style windowed energy over payload bytes (audio-kind rows).

    The payload is treated as unsigned 8-bit PCM: numpy ``frombuffer`` on
    the raw Arrow binary, reshaped into *window*-sample frames, energy =
    sum of squared samples per frame — the exact shape a real
    PCM/loudness/VAD kernel takes (vectorized numpy over Arrow batches;
    swap the energy line for a real DSP call when codecs are installed).
    All emitted values are INTEGER math on the byte values, so the DuckDB
    oracle recomputes them exactly via ord(substr(text, i, 1)); the
    tie-break for the peak window is the integer key
    ``energy * 100000 - w`` (first window wins ties), deterministic on
    both engines.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict[str, Any]] = []
            for r in pdf.itertuples():
                if r.media_meta["kind"] != "audio":
                    continue
                samples = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                n = len(samples)
                if n == 0:
                    continue
                n_windows = -(-n // window)
                padded = np.zeros(n_windows * window, dtype=np.int64)
                padded[:n] = samples
                energies = (padded * padded).reshape(n_windows, window).sum(axis=1)
                peak_key = energies * 100000 - np.arange(n_windows)
                peak_w = int(np.argmax(peak_key))
                out.append(
                    {
                        "doc_id": int(r.doc_id),
                        "n_windows": int(n_windows),
                        "n_samples": int(n),
                        "total_energy": int(energies.sum()),
                        "peak_energy": int(energies[peak_w]),
                        "first_peak_w": peak_w,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_ENERGY_SCHEMA.fields]
            )

    return df.mapInPandas(batches, schema=AUDIO_ENERGY_SCHEMA)


__all__ = [
    "MEDIA_KINDS",
    "FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "attach_payload",
    "decode_media",
    "extract_features",
    "sample_frames",
    "window_energy",
    "AUDIO_ENERGY_SCHEMA",
    "BinaryType",
]
