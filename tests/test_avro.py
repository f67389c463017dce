"""Avro OCF codec + avroocf DataSource tests.

The codec has no third-party Avro implementation in this environment to
cross-check against, so these tests pin SPEC BYTE VECTORS (zigzag varints,
string framing, magic, raw-DEFLATE blocks) and decode a hand-assembled OCF
built independently of the writer — conformance to the public Avro 1.x
wire format, not writer/reader self-consistency.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import pytest

from worker_etl_spark.sources.avro import (
    _decode_long,
    _encode_long,
    _encode_value,
    avro_to_spark_schema,
    parse_schema,
    read_block,
    scan_blocks,
    write_ocf,
)

# ---------------------------------------------------------------- spec pins

# zigzag varint test vectors from the Avro specification's encoding table
ZIGZAG = [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
          (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"), (8192, b"\x80\x80\x01")]


def test_zigzag_varint_spec_vectors():
    for n, wire in ZIGZAG:
        assert _encode_long(n) == wire, n
        assert _decode_long(wire, 0) == (n, len(wire)), wire


def test_string_and_float_framing():
    assert _encode_value("string", "foo") == b"\x06foo"  # length 3 → 0x06
    assert _encode_value("double", 1.0) == struct.pack("<d", 1.0)
    assert _encode_value("boolean", True) == b"\x01"


def test_hand_assembled_ocf_decodes():
    """Build an OCF byte-by-byte from the spec (independent of write_ocf):
    magic, 2-entry metadata map, sync, one null-codec block of two longs."""
    schema_json = '{"type":"record","name":"R","fields":[{"name":"a","type":"long"}]}'
    sync = bytes(range(16))
    meta = b""
    meta += _encode_long(2)  # map block count
    for k, v in [("avro.codec", b"null"), ("avro.schema", schema_json.encode())]:
        meta += _encode_long(len(k)) + k.encode() + _encode_long(len(v)) + v
    meta += _encode_long(0)  # map terminator
    payload = _encode_long(1) + _encode_long(2)  # records a=1, a=2
    ocf = (
        b"Obj\x01" + meta + sync
        + _encode_long(2) + _encode_long(len(payload)) + payload + sync
    )
    path = "/tmp/test_hand_ocf.avro"
    with open(path, "wb") as fh:
        fh.write(ocf)
    info = scan_blocks(path)
    assert info["codec"] == "null" and len(info["blocks"]) == 1
    off, cnt, size = info["blocks"][0]
    assert cnt == 2
    recs = read_block(path, off, size, cnt, "null", info["schema"])
    assert recs == [{"a": 1}, {"a": 2}]
    os.unlink(path)


def test_deflate_blocks_are_raw_rfc1951():
    """The spec requires raw DEFLATE (no zlib header/checksum): the stored
    payload must NOT start with a zlib header and must inflate with -15."""
    schema = '{"type":"record","name":"R","fields":[{"name":"a","type":"long"}]}'
    path = "/tmp/test_deflate_ocf.avro"
    write_ocf(path, schema, [{"a": 7}], codec="deflate")
    info = scan_blocks(path)
    off, cnt, size = info["blocks"][0]
    with open(path, "rb") as fh:
        fh.seek(off)
        payload = fh.read(size)
    assert payload[:1] != b"\x78"  # zlib magic absent
    assert zlib.decompress(payload, -15) == _encode_long(7)
    os.unlink(path)


# ------------------------------------------------------------ codec behavior

def test_roundtrip_all_types_both_codecs(tmp_path):
    schema = json.dumps({
        "type": "record", "name": "T", "fields": [
            {"name": "l", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "s", "type": "string"},
            {"name": "d", "type": ["null", "double"]},
            {"name": "f", "type": "float"},
            {"name": "b", "type": "boolean"},
            {"name": "by", "type": "bytes"},
            {"name": "fx", "type": {"type": "fixed", "name": "F8", "size": 8}},
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["X", "Y"]}},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
        ]})
    recs = [
        {"l": -(10 ** 12) + i, "i": i - 50, "s": f"s{i}" * (i % 5),
         "d": None if i % 3 == 0 else i / 4.0, "f": i / 2.0, "b": i % 2 == 0,
         "by": bytes([i % 256]) * (i % 7), "fx": bytes(8),
         "e": "X" if i % 2 else "Y",
         "arr": list(range(i % 4)), "m": {f"k{j}": f"v{j}" for j in range(i % 3)}}
        for i in range(137)
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        n_blocks = write_ocf(p, schema, recs, codec=codec, records_per_block=50)
        assert n_blocks == 3
        info = scan_blocks(p)
        got = []
        for off, cnt, size in info["blocks"]:
            got.extend(read_block(p, off, size, cnt, codec, info["schema"]))
        assert got == recs


def test_scan_rejects_corruption(tmp_path):
    schema = '{"type":"record","name":"R","fields":[{"name":"a","type":"long"}]}'
    p = str(tmp_path / "t.avro")
    write_ocf(p, schema, [{"a": 1}], codec="null")
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # corrupt the trailing sync marker
    with open(p, "wb") as fh:
        fh.write(data)
    with pytest.raises(ValueError, match="sync marker mismatch"):
        scan_blocks(p)
    with open(p, "wb") as fh:
        fh.write(b"PAR1not-avro")
    with pytest.raises(ValueError, match="not an Avro"):
        scan_blocks(p)


def test_typed_schema_map_and_refusals():
    rec = parse_schema(json.dumps({
        "type": "record", "name": "R", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": {"type": "array", "items": "int"}},
        ]}))
    assert avro_to_spark_schema(rec) == "`a` bigint, `b` string, `c` array<int>"
    multi = parse_schema(json.dumps({
        "type": "record", "name": "R", "fields": [
            {"name": "u", "type": ["null", "string", "long"]}]}))
    with pytest.raises(ValueError, match="unions"):
        avro_to_spark_schema(multi)
    nested = parse_schema(json.dumps({
        "type": "record", "name": "R", "fields": [
            {"name": "n", "type": {"type": "record", "name": "Inner",
                                   "fields": [{"name": "x", "type": "long"}]}}]}))
    with pytest.raises(ValueError, match="nested"):
        avro_to_spark_schema(nested)


# --------------------------------------------------------- DataSource (Spark)

def test_avroocf_partitions_per_block_and_grid_rows(spark, tmp_path):
    """One InputPartition per OCF block in BOTH modes; grid row indices are
    globally consecutive across blocks with the header at row 0."""
    from worker_etl_spark.sources.pyds_avro import register_avroocf

    schema = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "k", "type": "long"}, {"name": "v", "type": ["null", "string"]}]})
    recs = [{"k": i, "v": None if i % 5 == 0 else f"v{i}"} for i in range(90)]
    p = str(tmp_path / "r.avro")
    assert write_ocf(p, schema, recs, records_per_block=40) == 3
    register_avroocf(spark)

    typed = spark.read.format("avroocf").load(p)
    assert typed.rdd.getNumPartitions() == 3
    assert typed.count() == 90
    assert [f.dataType.simpleString() for f in typed.schema.fields] == ["bigint", "string"]
    assert typed.filter("v IS NULL").count() == 18

    grid = spark.read.format("avroocf").option("mode", "grid").load(p)
    assert grid.rdd.getNumPartitions() == 3
    rows = sorted(grid.collect(), key=lambda r: r.row_idx)
    assert rows[0].row_idx == 0 and rows[0].cells == ["k", "v"]  # header
    assert [r.row_idx for r in rows] == list(range(91))  # consecutive across blocks
    assert rows[1].cells == ["0", None]  # null union → NULL cell


def test_union_branch_picked_by_value_type(tmp_path):
    """A multi-branch union routes each value to the branch matching its
    PYTHON type (5 -> long, 'x' -> string), not first-non-null."""
    p = str(tmp_path / "u.avro")
    schema = (
        '{"type":"record","name":"r","fields":'
        '[{"name":"v","type":["null","string","long"]}]}'
    )
    recs = [{"v": 5}, {"v": "x"}, {"v": None}, {"v": -9}]
    write_ocf(p, schema, recs, codec="null")
    meta = scan_blocks(p)
    out = []
    for offset, count, size in meta["blocks"]:
        out += read_block(p, offset, size, count, meta["codec"], meta["schema"])
    assert [r["v"] for r in out] == [5, "x", None, -9]


def test_truncated_varint_raises_value_error(tmp_path):
    """A file cut inside a varint fails with the module's loud ValueError,
    not a bare IndexError."""
    p = str(tmp_path / "t.avro")
    schema = '{"type":"record","name":"r","fields":[{"name":"a","type":"long"}]}'
    write_ocf(p, schema, [{"a": 1 << 40}], codec="null")
    raw = open(p, "rb").read()
    # find a multi-byte varint: the record value 2^40 zigzags to 6+ bytes in
    # the block payload; cut the file mid-payload so a continuation bit dangles
    cut = str(tmp_path / "cut.avro")
    with open(cut, "wb") as fh:
        fh.write(raw[: len(raw) - 20])
    with pytest.raises((ValueError, OSError)):
        scan_blocks(cut)


def test_missing_schema_metadata_raises_value_error(tmp_path):
    """An OCF whose metadata map lacks avro.schema is refused by name."""
    import struct as _struct

    def zz(n: int) -> bytes:
        u = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    p = str(tmp_path / "noschema.avro")
    with open(p, "wb") as fh:
        fh.write(b"Obj\x01")
        fh.write(zz(1))  # one metadata entry
        fh.write(zz(len(b"avro.codec")) + b"avro.codec")
        fh.write(zz(len(b"null")) + b"null")
        fh.write(zz(0))  # end of map
        fh.write(b"S" * 16)  # sync
    with pytest.raises(ValueError, match="avro.schema"):
        scan_blocks(p)


def test_typed_mode_rejects_mixed_schema_directory(spark, tmp_path):
    """A directory whose files carry different field sets fails LOUDLY in
    read() (planner schema comes from one header), and a same-fields file
    with a different field ORDER is realigned by name, never misaligned."""
    from pyspark.errors.exceptions.captured import PythonException

    from worker_etl_spark.sources.pyds_avro import register_avroocf

    d = tmp_path / "mix"
    d.mkdir()
    write_ocf(
        str(d / "a.avro"),
        '{"type":"record","name":"r","fields":'
        '[{"name":"k","type":"long"},{"name":"s","type":"string"}]}',
        [{"k": 1, "s": "one"}],
    )
    write_ocf(
        str(d / "b.avro"),
        '{"type":"record","name":"r","fields":'
        '[{"name":"s","type":"string"},{"name":"k","type":"long"}]}',
        [{"k": 2, "s": "two"}],  # same fields, swapped declaration order
    )
    register_avroocf(spark)
    got = sorted(
        (r.k, r.s)
        for r in spark.read.format("avroocf").option("path", str(d)).load().collect()
    )
    assert got == [(1, "one"), (2, "two")]  # realigned by NAME

    write_ocf(
        str(d / "c.avro"),
        '{"type":"record","name":"r","fields":[{"name":"other","type":"long"}]}',
        [{"other": 3}],  # different field set: must fail loudly
    )
    with pytest.raises(PythonException, match="differ from"):
        spark.read.format("avroocf").option("path", str(d)).load().collect()
