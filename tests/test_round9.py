"""Round-9 regression tests: the four ADVICE fixes.

1. shallow_clone registers borrows BEFORE publishing (atomic tmp+replace),
   and vacuum fail-safes on unreadable registrations + protects mid-publish
   clones (ADVICE medium, writer.py).
2. _claim_version re-raises persistent OSErrors instead of spinning
   (ADVICE low, writer.py).
3. fixture_dir gives deterministic per-name dirs that overwrite on rerun
   instead of accumulating (ADVICE low, multimodal_q.py / sources_q.py).
4. The avroocf DataSource header cache is keyed on (path, size, mtime_ns)
   so an in-place overwrite invalidates it (ADVICE low, pyds_avro.py).
"""

from __future__ import annotations

import os

import pytest


# ------------------------------------------------------- _claim_version


def test_claim_version_reraises_persistent_oserror(tmp_path):
    """A missing staging dir is not the rename race — it must raise, not
    busy-loop forever (the old bare `except OSError: continue`)."""
    from worker_etl_spark.sinks.writer import _claim_version

    loc = tmp_path / "t"
    loc.mkdir()
    with pytest.raises(OSError):
        _claim_version(str(loc), str(tmp_path / "no_such_staging"))


def test_claim_version_still_retries_the_race(tmp_path):
    """EEXIST/ENOTEMPTY (a racer claimed N first) must still retry with the
    next number — the fix narrows the retry, it doesn't remove it."""
    from worker_etl_spark.sinks.writer import _claim_version

    loc = tmp_path / "t"
    loc.mkdir()
    # _v1 already exists AND is non-empty, so rename(staging, _v1) fails
    # with ENOTEMPTY on POSIX; the claimer must land on _v2.
    (loc / "_v1").mkdir()
    (loc / "_v1" / "part-0.parquet").write_bytes(b"x")
    staging = tmp_path / "staging"
    staging.mkdir()
    (staging / "part-0.parquet").write_bytes(b"y")

    # simulate the race: first listdir sees no versions (racer commits
    # between the scan and the rename), so the claimer targets _v1, hits
    # ENOTEMPTY, rescans, and wins _v2
    import worker_etl_spark.sinks.writer as writer

    real_listdir = os.listdir
    calls = {"n": 0}

    def racing_listdir(p):
        calls["n"] += 1
        out = real_listdir(p)
        if calls["n"] == 1:
            return [d for d in out if d != "_v1"]
        return out

    orig = writer.os.listdir
    writer.os.listdir = racing_listdir
    try:
        version = _claim_version(str(loc), str(staging))
    finally:
        writer.os.listdir = orig
    assert version == 2
    assert (loc / "_v2" / "part-0.parquet").read_bytes() == b"y"


# ------------------------------------------------- shallow_clone ordering


def _make_snapshot(spark, wh, rows=3):
    from worker_etl_spark.sinks.writer import snapshot_write

    df = spark.range(rows).withColumnRenamed("id", "k")
    assert snapshot_write(df, wh, "ds", "src") == 1
    return os.path.join(wh, "ds", "src")


def test_shallow_clone_registers_before_publish(spark, tmp_path):
    """If the publish step dies, the clone directory must be reverted and
    the borrow registrations cleaned up — proving registration happened
    FIRST (the old order published first, leaving a vacuum window)."""
    import worker_etl_spark.sinks.writer as writer

    wh = str(tmp_path / "wh")
    src_loc = _make_snapshot(spark, wh)

    real_replace = os.replace

    def dying_replace(a, b):
        if b.endswith("_LATEST"):
            raise RuntimeError("injected publish failure")
        return real_replace(a, b)

    writer.os.replace = dying_replace
    try:
        with pytest.raises(RuntimeError, match="injected publish failure"):
            writer.shallow_clone(wh, "ds", "src", "dev")
    finally:
        writer.os.replace = real_replace

    # failed publish reverted everything: no clone dir, no registrations,
    # no dot-tmp debris in the source location
    assert not os.path.exists(os.path.join(wh, "ds", "dev"))
    leftovers = [
        d for d in os.listdir(src_loc)
        if d.startswith("_clone.") or d.startswith(".tmp_clone_")
    ]
    assert leftovers == []

    # and a successful clone leaves exactly one atomic registration
    assert writer.shallow_clone(wh, "ds", "src", "dev") == 1
    regs = [d for d in os.listdir(src_loc) if d.startswith("_clone.")]
    assert len(regs) == 1
    ver_s, _, dst = (
        open(os.path.join(src_loc, regs[0]), encoding="utf-8")
        .read().strip().partition("\t")
    )
    assert int(ver_s) == 1 and dst.endswith(os.path.join("ds", "dev"))


def test_vacuum_failsafe_on_torn_registration(spark, tmp_path):
    """An unreadable/torn _clone.* record must protect the WHOLE table
    (vacuum removes nothing), not 'protect nothing' as before."""
    from worker_etl_spark.sinks.writer import snapshot_write, vacuum_snapshots

    wh = str(tmp_path / "wh")
    loc = _make_snapshot(spark, wh)
    df = spark.range(5).withColumnRenamed("id", "k")
    snapshot_write(df, wh, "ds", "src")
    snapshot_write(df, wh, "ds", "src")  # versions 1..3
    # torn registration: not "<int>\t<path>"
    with open(os.path.join(loc, "_clone.deadbeef"), "w", encoding="utf-8") as fh:
        fh.write("garbage-no-tab")
    assert vacuum_snapshots(wh, "ds", "src", keep=1) == []
    assert os.path.isdir(os.path.join(loc, "_v1"))  # nothing deleted
    # registration left in place for the operator to inspect
    assert os.path.exists(os.path.join(loc, "_clone.deadbeef"))
    # remove it: vacuum proceeds normally again
    os.unlink(os.path.join(loc, "_clone.deadbeef"))
    assert vacuum_snapshots(wh, "ds", "src", keep=1) == [1, 2]


def test_vacuum_protects_mid_publish_clone(spark, tmp_path):
    """A registration whose clone directory exists but holds no version yet
    is a clone between register and publish — vacuum must protect the
    borrowed version, and must NOT GC the registration."""
    from worker_etl_spark.sinks.writer import snapshot_write, vacuum_snapshots

    wh = str(tmp_path / "wh")
    loc = _make_snapshot(spark, wh)
    df = spark.range(5).withColumnRenamed("id", "k")
    snapshot_write(df, wh, "ds", "src")  # version 2
    dev_loc = os.path.join(wh, "ds", "dev")
    os.makedirs(dev_loc)  # clone dir created, manifest not yet written
    with open(os.path.join(loc, "_clone.pending"), "w", encoding="utf-8") as fh:
        fh.write(f"1\t{dev_loc}\n")
    assert vacuum_snapshots(wh, "ds", "src", keep=1) == []  # v1 borrowed
    assert os.path.isdir(os.path.join(loc, "_v1"))
    assert os.path.exists(os.path.join(loc, "_clone.pending"))
    # once the clone is GONE entirely, the registration is stale and v1 goes
    os.rmdir(dev_loc)
    assert vacuum_snapshots(wh, "ds", "src", keep=1) == [1]


# ------------------------------------------------------------ fixture_dir


def test_fixture_dir_overwrites_not_accumulates():
    from worker_etl_spark.queries.fixtures import fixture_dir

    d1 = fixture_dir("rt9_demo")
    marker = os.path.join(d1, "stale.txt")
    with open(marker, "w", encoding="utf-8") as fh:
        fh.write("old")
    d2 = fixture_dir("rt9_demo")
    assert d1 == d2  # deterministic per name → rerun reuses the path
    assert not os.path.exists(marker)  # ...and wipes previous contents
    # different names stay disjoint under one process root
    d3 = fixture_dir("rt9_other")
    assert os.path.dirname(d3) == os.path.dirname(d1) and d3 != d1


# ------------------------------------------------- avro header cache key


def test_avro_header_cache_invalidates_on_overwrite(tmp_path):
    """Overwriting an .avro file in place with a DIFFERENT schema must not
    serve the stale cached (schema, codec) to a long-lived worker."""
    from worker_etl_spark.sources.avro import write_ocf
    from worker_etl_spark.sources.pyds_avro import _cached_header

    import json

    path = str(tmp_path / "t.avro")
    schema_a = json.dumps({
        "type": "record", "name": "A",
        "fields": [{"name": "x", "type": "long"}],
    })
    schema_b = json.dumps({
        "type": "record", "name": "B",
        "fields": [{"name": "y", "type": "string"}],
    })
    write_ocf(path, schema_a, [{"x": 1}])
    parsed1, _ = _cached_header(path)
    assert parsed1["name"] == "A"
    write_ocf(path, schema_b, [{"y": "hello"}])
    # force a distinct mtime_ns even on coarse-granularity filesystems
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    parsed2, _ = _cached_header(path)
    assert parsed2["name"] == "B"  # stale-path-keyed cache would say "A"


# ------------------------------------------------------------- WAV codec


class TestWavCodec:
    """Spec conformance for operators/wav.py — pinned against hand-assembled
    RIFF bytes (no third-party audio lib exists here to cross-check), the
    same discipline as tests/test_avro.py and tests/test_png.py."""

    def test_hand_assembled_wav_decodes(self):
        import struct

        from worker_etl_spark.operators.wav import decode_wav

        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        data = struct.pack("<4h", 0, 1, -2, 32767)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 8) + data
        )
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        assert decode_wav(blob) == (8000, 1, 16, [0, 1, -2, 32767])

    def test_odd_chunk_pad_byte_honored(self):
        """A 3-byte JUNK chunk forces the word-alignment pad; a reader that
        forgets it lands mid-stream and dies (or decodes garbage)."""
        from worker_etl_spark.operators.wav import decode_wav, encode_wav

        blob = encode_wav([5, -5, 100], sample_rate=44100, junk_chunk=b"abc")
        assert decode_wav(blob) == (44100, 1, 16, [5, -5, 100])

    def test_roundtrip_8_and_32_bit(self):
        from worker_etl_spark.operators.wav import decode_wav, encode_wav

        assert decode_wav(encode_wav([0, 255], bits=8))[3] == [0, 255]
        big = [2**31 - 1, -(2**31)]
        assert decode_wav(encode_wav(big, bits=32))[3] == big

    def test_non_pcm_refused_not_garbled(self):
        import struct

        import pytest

        from worker_etl_spark.operators.wav import decode_wav

        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4
        )
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(NotImplementedError, match="format tag 3"):
            decode_wav(blob)

    def test_truncated_and_non_riff_rejected(self):
        import pytest

        from worker_etl_spark.operators.wav import decode_wav, encode_wav

        with pytest.raises(ValueError):
            decode_wav(b"RIFX....WAVE")
        good = encode_wav([1, 2, 3, 4])
        with pytest.raises(ValueError):
            decode_wav(good[:-3])  # truncated data chunk

    def test_data_before_fmt_rejected(self):
        import struct

        import pytest

        from worker_etl_spark.operators.wav import decode_wav

        body = b"WAVE" + b"data" + struct.pack("<I", 2) + b"\x01\x00"
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError, match="before fmt"):
            decode_wav(blob)
