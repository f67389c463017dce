"""Multimodal operator plumbing: payload attach, Arrow feature extraction,
stubbed decode."""

from __future__ import annotations

import pytest

from worker_etl_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    attach_payload,
    decode_media,
    extract_features,
)
from worker_etl_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_attach_payload_schema(spark):
    d = read_table(spark, SF, "documents")
    p = attach_payload(d)
    assert dict(p.dtypes)["payload"] == "binary"
    row = p.orderBy("doc_id").first()
    assert row.media_meta.byte_len == len(row.payload)
    assert row.media_meta.kind in ("image", "audio", "video")


def test_extract_features_matches_schema(spark):
    d = read_table(spark, SF, "documents")
    feats = extract_features(attach_payload(d))
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.orderBy("doc_id").limit(3).collect()
    assert all(r.n_frames >= 1 and 0.0 <= r.mean_luma < 1.0 for r in rows)


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "video")
