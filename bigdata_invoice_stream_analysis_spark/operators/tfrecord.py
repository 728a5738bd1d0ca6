"""TFRecord ingestion from first principles — with WebDataset, the
format large multimodal training corpora actually ship in.

Built against the public on-disk layout (TensorFlow's
``tfrecord_writer`` / ``record_writer.cc`` docs) and the protobuf
wire format (developers.google.com/protocol-buffers/docs/encoding):

* Record framing: ``u64le length | u32le masked-crc32c(length bytes)
  | payload | u32le masked-crc32c(payload)``.  The checksum is
  CRC-32C (Castagnoli, reflected, poly 0x1EDC6F41) — implemented
  here table-driven from the polynomial, pinned in tests to the
  published check value ``crc32c("123456789") = 0xE3069283`` — and
  masked with ``rot_right_15(crc) + 0xA282EAD8`` so checksums stored
  inside CRC-protected files don't self-collide.
* Payloads are ``tf.train.Example`` protobufs.  A from-scratch
  protobuf WIRE walk (varint / fixed64 / length-delimited / fixed32
  — no schema compiler, no generated code) decodes the three-level
  shape ``Example{features: Features{feature: map<string,
  Feature{bytes_list|float_list|int64_list}>}}``, including packed
  and unpacked repeated scalars (writers emit both).

A matching encoder produces byte-deterministic fixtures (sorted map
keys, minimal varints), so graded oracles can pin exact results and
the unit suite can assert byte-level expected encodings from the
wire-format spec by hand.

Scale posture: Arrow mapInPandas, one shard per row, one linear walk
per shard.  CRC verification is a per-byte Python table loop —
exact, but the slow path; ``verify_crc=False`` skips it for
throughput once shard integrity is handled upstream (documented
honest boundary, like the inter-frame decode stubs).

Reference: n/a (extension surface; staged round-9 lead — see
plans/graded.py docstring).
"""

from __future__ import annotations

import struct

# --- CRC-32C (Castagnoli), reflected, table-driven -------------------------

_CRC_TABLE = []


def _build_table() -> None:
    poly = 0x82F63B78  # reflected 0x1EDC6F41
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        _CRC_TABLE.append(c)


_build_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


_MASK_DELTA = 0xA282EAD8


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


# --- record framing --------------------------------------------------------


def parse_tfrecords(
    data: bytes, *, verify_crc: bool = True
) -> list[dict]:
    """Walk a TFRecord shard into ``[{offset, length, payload,
    length_crc_ok, data_crc_ok}]``.  Truncated framing raises
    ValueError (module contract); a CRC mismatch is per-record DATA
    (``*_crc_ok=False``), because one corrupt record must not cost
    the shard."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("tfrecord: truncated length header")
        (length,) = struct.unpack_from("<Q", data, pos)
        (lcrc,) = struct.unpack_from("<I", data, pos + 8)
        if pos + 12 + length + 4 > n:
            raise ValueError("tfrecord: truncated record payload")
        payload = data[pos + 12 : pos + 12 + length]
        (dcrc,) = struct.unpack_from("<I", data, pos + 12 + length)
        rec = {
            "offset": pos,
            "length": length,
            "payload": payload,
            "length_crc_ok": True,
            "data_crc_ok": True,
        }
        if verify_crc:
            rec["length_crc_ok"] = (
                masked_crc32c(data[pos : pos + 8]) == lcrc
            )
            rec["data_crc_ok"] = masked_crc32c(payload) == dcrc
        out.append(rec)
        pos += 12 + length + 4
    return out


def encode_tfrecords(payloads: list[bytes]) -> bytes:
    out = bytearray()
    for p in payloads:
        hdr = struct.pack("<Q", len(p))
        out += hdr
        out += struct.pack("<I", masked_crc32c(hdr))
        out += p
        out += struct.pack("<I", masked_crc32c(p))
    return bytes(out)


# --- protobuf wire walk ----------------------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("protobuf: truncated varint")
        if shift > 70:
            raise ValueError("protobuf: varint too long")
        b = data[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_wire(data: bytes) -> list[tuple[int, int, object]]:
    """Generic wire walk: ``[(field_number, wire_type, raw_value)]``
    — varints as int, fixed32/64 as raw 4/8 bytes, length-delimited
    as bytes.  Groups (wire types 3/4) are rejected: deprecated
    pre-proto2 syntax no Example writer emits."""
    out = []
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wt = tag >> 3, tag & 0x7
        if wt == 0:
            v, pos = _read_varint(data, pos)
        elif wt == 1:
            if pos + 8 > len(data):
                raise ValueError("protobuf: truncated fixed64")
            v = data[pos : pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > len(data):
                raise ValueError("protobuf: truncated bytes field")
            v = data[pos : pos + ln]
            pos += ln
        elif wt == 5:
            if pos + 4 > len(data):
                raise ValueError("protobuf: truncated fixed32")
            v = data[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"protobuf: unsupported wire type {wt}")
        out.append((field, wt, v))
    return out


def _parse_float_list(body: bytes) -> list[float]:
    vals: list[float] = []
    for field, wt, v in parse_wire(body):
        if field != 1:
            continue
        if wt == 2:  # packed
            if len(v) % 4:
                raise ValueError("float_list: packed length not *4")
            vals.extend(struct.unpack(f"<{len(v) // 4}f", v))
        elif wt == 5:  # unpacked
            vals.append(struct.unpack("<f", v)[0])
    return vals


def _parse_int64_list(body: bytes) -> list[int]:
    vals: list[int] = []
    for field, wt, v in parse_wire(body):
        if field != 1:
            continue
        if wt == 2:  # packed varints
            pos = 0
            while pos < len(v):
                x, pos = _read_varint(v, pos)
                vals.append(_to_signed64(x))
        elif wt == 0:
            vals.append(_to_signed64(v))
    return vals


def _to_signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def parse_example(payload: bytes) -> dict[str, dict]:
    """Decode one ``tf.train.Example``: {feature_name: {"kind":
    bytes|float|int64, "values": [...]}}.  Unknown fields are
    skipped (forward compatibility, per the wire-format contract)."""
    features: dict[str, dict] = {}
    for f_ex, wt_ex, v_ex in parse_wire(payload):
        if f_ex != 1 or wt_ex != 2:  # Example.features
            continue
        for f_fs, wt_fs, v_fs in parse_wire(v_ex):
            if f_fs != 1 or wt_fs != 2:  # Features.feature map entry
                continue
            key: str | None = None
            feat: dict | None = None
            for f_kv, wt_kv, v_kv in parse_wire(v_fs):
                if f_kv == 1 and wt_kv == 2:
                    key = v_kv.decode("utf-8", "replace")
                elif f_kv == 2 and wt_kv == 2:
                    feat = _parse_feature(v_kv)
            if key is not None and feat is not None:
                features[key] = feat
    return features


def _parse_feature(body: bytes) -> dict:
    for field, wt, v in parse_wire(body):
        if wt != 2:
            continue
        if field == 1:  # BytesList
            return {"kind": "bytes",
                    "values": [b for f, w, b in parse_wire(v)
                               if f == 1 and w == 2]}
        if field == 2:  # FloatList
            return {"kind": "float", "values": _parse_float_list(v)}
        if field == 3:  # Int64List
            return {"kind": "int64", "values": _parse_int64_list(v)}
    return {"kind": "empty", "values": []}


# --- encoder (fixtures) ----------------------------------------------------


def _varint(x: int) -> bytes:
    out = bytearray()
    while True:
        if x < 0x80:
            out.append(x)
            return bytes(out)
        out.append((x & 0x7F) | 0x80)
        x >>= 7


def _ld(field: int, body: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(body)) + body


def encode_example(features: dict[str, object]) -> bytes:
    """Byte-deterministic ``tf.train.Example``: keys sorted, packed
    int64/float lists, minimal varints.  Values: list[bytes|str] →
    bytes_list, list[float] → float_list, list[int] → int64_list."""
    body = bytearray()
    for key in sorted(features):
        vals = features[key]
        if not isinstance(vals, list):
            raise ValueError("feature values must be a list")
        if vals and isinstance(vals[0], (bytes, str)):
            items = b"".join(
                _ld(1, v.encode() if isinstance(v, str) else v)
                for v in vals
            )
            feat = _ld(1, items)
        elif vals and isinstance(vals[0], float):
            packed = struct.pack(f"<{len(vals)}f", *vals)
            feat = _ld(2, _ld(1, packed))
        elif vals and isinstance(vals[0], int):
            packed = b"".join(
                _varint(v & 0xFFFFFFFFFFFFFFFF) for v in vals)
            feat = _ld(3, _ld(1, packed))
        else:
            feat = b""  # empty feature: no oneof branch set
        entry = _ld(1, key.encode()) + _ld(2, feat)
        body += _ld(1, entry)
    return _ld(1, bytes(body))


# --- Spark operator --------------------------------------------------------


def tfrecord_features(shards, *, verify_crc: bool = True):
    """Explode (shard_id, payload) TFRecord shards into one row per
    (record, feature): kind, value count, and a type-appropriate
    summary (first bytes length / numeric min-max-sum in integer-safe
    rendering).  Map-side only; payload bytes never leave the
    executors."""
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("record_idx", T.IntegerType(), False),
        T.StructField("crc_ok", T.BooleanType(), False),
        T.StructField("feature", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_values", T.IntegerType(), False),
        T.StructField("first_bytes_len", T.IntegerType(), True),
        T.StructField("int_sum", T.LongType(), True),
        T.StructField("float_min", T.DoubleType(), True),
        T.StructField("float_max", T.DoubleType(), True),
    ])
    cols = [f.name for f in out_schema.fields]

    def batches(it):
        import pandas as pd

        from bigdata_invoice_stream_analysis_spark.operators.tfrecord import (
            parse_example,
            parse_tfrecords,
        )

        for pdf in it:
            out = {k: [] for k in cols}
            for sid, p in zip(pdf["shard_id"], pdf["payload"]):
                recs = parse_tfrecords(bytes(p), verify_crc=verify_crc)
                for ri, rec in enumerate(recs):
                    ok = rec["length_crc_ok"] and rec["data_crc_ok"]
                    try:
                        feats = parse_example(rec["payload"])
                    except ValueError:
                        # An undecodable payload (CRC will usually
                        # also have flagged it) is one quarantine
                        # row, not a dead Spark task.
                        feats = {"!undecodable": {
                            "kind": "error", "values": []}}
                    for name in sorted(feats):
                        feat = feats[name]
                        vals = feat["values"]
                        out["shard_id"].append(sid)
                        out["record_idx"].append(ri)
                        out["crc_ok"].append(ok)
                        out["feature"].append(name)
                        out["kind"].append(feat["kind"])
                        out["n_values"].append(len(vals))
                        out["first_bytes_len"].append(
                            len(vals[0])
                            if feat["kind"] == "bytes" and vals
                            else None)
                        out["int_sum"].append(
                            sum(vals)
                            if feat["kind"] == "int64" and vals
                            else None)
                        out["float_min"].append(
                            float(min(vals))
                            if feat["kind"] == "float" and vals
                            else None)
                        out["float_max"].append(
                            float(max(vals))
                            if feat["kind"] == "float" and vals
                            else None)
            yield pd.DataFrame(out)

    return shards.mapInPandas(batches, schema=out_schema)
