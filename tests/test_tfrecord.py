"""TFRecord framing + protobuf wire walk: CRC-32C pinned to the
published check vectors, byte-level expected encodings from the wire
format spec, roundtrips, corrupt-record tolerance, and the Spark
feature-explosion operator."""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.tfrecord import (
    crc32c,
    encode_example,
    encode_tfrecords,
    masked_crc32c,
    parse_example,
    parse_tfrecords,
    parse_wire,
    tfrecord_features,
)


# --- CRC-32C published vectors (RFC 3720 / Intel test suite) ----------------

def test_crc32c_check_vectors():
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283   # the check value
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E


def test_masked_crc_is_invertible():
    for payload in (b"", b"x", b"hello tfrecord"):
        m = masked_crc32c(payload)
        crc = ((m - 0xA282EAD8) & 0xFFFFFFFF)
        crc = ((crc >> 17) | (crc << 15)) & 0xFFFFFFFF
        assert crc == crc32c(payload)


# --- framing ----------------------------------------------------------------

def test_framing_roundtrip_with_offsets():
    payloads = [b"first", b"", b"third-record" * 10]
    blob = encode_tfrecords(payloads)
    recs = parse_tfrecords(blob)
    assert [r["payload"] for r in recs] == payloads
    assert all(r["length_crc_ok"] and r["data_crc_ok"] for r in recs)
    assert recs[0]["offset"] == 0
    assert recs[1]["offset"] == 12 + 5 + 4


def test_corrupt_payload_flags_crc_not_crash():
    blob = bytearray(encode_tfrecords([b"aaaa", b"bbbb"]))
    blob[12] ^= 0xFF  # first payload byte
    recs = parse_tfrecords(bytes(blob))
    assert recs[0]["data_crc_ok"] is False
    assert recs[0]["length_crc_ok"] is True
    assert recs[1]["data_crc_ok"] is True  # walk continues


def test_truncated_shard_raises():
    blob = encode_tfrecords([b"payload"])
    with pytest.raises(ValueError, match="truncated"):
        parse_tfrecords(blob[:-2])
    with pytest.raises(ValueError, match="truncated"):
        parse_tfrecords(blob[:8])


def test_verify_crc_false_skips_checks():
    blob = bytearray(encode_tfrecords([b"aaaa"]))
    blob[12] ^= 0xFF
    recs = parse_tfrecords(bytes(blob), verify_crc=False)
    assert recs[0]["data_crc_ok"] is True  # unchecked by request


# --- protobuf wire walk -----------------------------------------------------

def test_wire_walk_spec_example():
    # developers.google.com encoding doc: field 1, varint 150
    assert parse_wire(b"\x08\x96\x01") == [(1, 0, 150)]


def test_wire_walk_rejects_groups_and_truncation():
    with pytest.raises(ValueError, match="wire type"):
        parse_wire(b"\x0b")  # field 1, wire type 3 (group start)
    with pytest.raises(ValueError, match="truncated"):
        parse_wire(b"\x0a\x05ab")  # LD claims 5, has 2


def test_example_byte_level_encoding():
    # hand-derived from the wire format: one feature "a" = int64 [1]
    assert encode_example({"a": [1]}).hex() == (
        "0a0c0a0a0a01611205" "1a030a0101"
    )


def test_example_roundtrip_all_kinds():
    ex = encode_example({
        "tokens": [b"hello", b"world"],
        "label": [3, -7, 2**40],
        "weights": [0.5, -2.25],
        "text": ["unicode é"],
    })
    feats = parse_example(ex)
    assert feats["tokens"] == {"kind": "bytes",
                               "values": [b"hello", b"world"]}
    assert feats["label"] == {"kind": "int64",
                              "values": [3, -7, 2**40]}
    assert feats["weights"]["kind"] == "float"
    assert feats["weights"]["values"] == [0.5, -2.25]
    assert feats["text"]["values"] == ["unicode é".encode()]


def test_unpacked_repeated_scalars_also_parse():
    """Writers may emit unpacked repeated int64/float — one tagged
    entry per value — instead of the packed form our encoder uses."""
    # Int64List{value: 5, value: 6} unpacked: (field 1, varint) x2
    int64_list = b"\x08\x05\x08\x06"
    feature = b"\x1a" + bytes([len(int64_list)]) + int64_list
    entry = b"\x0a\x01k" + b"\x12" + bytes([len(feature)]) + feature
    features = b"\x0a" + bytes([len(entry)]) + entry
    example = b"\x0a" + bytes([len(features)]) + features
    feats = parse_example(example)
    assert feats["k"] == {"kind": "int64", "values": [5, 6]}
    # FloatList{value: 1.5} unpacked: (field 1, fixed32)
    f32 = struct.pack("<f", 1.5)
    float_list = b"\x0d" + f32
    feature = b"\x12" + bytes([len(float_list)]) + float_list
    entry = b"\x0a\x01f" + b"\x12" + bytes([len(feature)]) + feature
    features = b"\x0a" + bytes([len(entry)]) + entry
    example = b"\x0a" + bytes([len(features)]) + features
    assert parse_example(example)["f"] == {
        "kind": "float", "values": [1.5]}


def test_unknown_fields_skipped():
    # append an unknown field 9 varint to a valid Example
    ex = encode_example({"a": [1]}) + b"\x48\x2a"
    assert parse_example(ex)["a"]["values"] == [1]


# --- property ---------------------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(st.dictionaries(
    st.text(st.characters(min_codepoint=0x21, max_codepoint=0x7E),
            min_size=1, max_size=8),
    st.one_of(
        st.lists(st.binary(max_size=16), min_size=1, max_size=4),
        st.lists(st.integers(-2**63, 2**63 - 1), min_size=1,
                 max_size=6),
    ),
    min_size=1, max_size=4,
))
def test_property_example_roundtrip(features):
    blob = encode_tfrecords([encode_example(features)])
    recs = parse_tfrecords(blob)
    assert len(recs) == 1 and recs[0]["data_crc_ok"]
    feats = parse_example(recs[0]["payload"])
    assert set(feats) == set(features)
    for k, vals in features.items():
        assert feats[k]["values"] == vals


# --- Spark operator ---------------------------------------------------------

def test_spark_tfrecord_features(spark):
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)
    shard0 = encode_tfrecords([
        encode_example({"img": [b"\x00" * 64], "label": [3]}),
        encode_example({"img": [b"\x00" * 32], "score": [0.5, 1.5]}),
    ])
    corrupt = bytearray(encode_tfrecords(
        [encode_example({"x": [1]})]))
    corrupt[12] ^= 0xFF
    df = spark.createDataFrame(
        [(0, bytearray(shard0)), (1, corrupt)],
        "shard_id long, payload binary",
    )
    rows = tfrecord_features(df).collect()
    by_key = {(r["shard_id"], r["record_idx"], r["feature"]): r
              for r in rows}
    assert by_key[(0, 0, "img")]["first_bytes_len"] == 64
    assert by_key[(0, 0, "label")]["int_sum"] == 3
    assert by_key[(0, 1, "score")]["float_min"] == 0.5
    assert by_key[(0, 1, "score")]["float_max"] == 1.5
    # the corrupt record quarantines: crc flagged, and its payload
    # (no longer a valid Example) becomes an error row, not a crash
    bad = [r for r in rows if r["shard_id"] == 1]
    assert len(bad) == 1
    assert bad[0]["crc_ok"] is False
    assert bad[0]["feature"] == "!undecodable"
    assert bad[0]["kind"] == "error"
    assert all(r["crc_ok"] for r in rows if r["shard_id"] == 0)
