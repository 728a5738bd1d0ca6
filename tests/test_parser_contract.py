"""The shared parser contract, fuzz-pinned: malformed input to any
binary parser raises ValueError — never TypeError/KeyError/
struct.error/zlib.error/etc., which would escape the Spark
quarantine handlers and kill whole tasks instead of quarantining one
blob.  A seeded corruption fuzz (byte flips, truncations, garbage
insertion, pure noise) runs per parser, plus targeted regressions
for every escape class the round-8 fuzz actually found."""

from __future__ import annotations

import io
import json
import random
import struct
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.avro import (
    encode_avro,
    parse_avro,
)
from bigdata_invoice_stream_analysis_spark.operators.parquetmeta import (
    CT_I32,
    _Writer,
    encode_parquet,
    parse_parquet_footer,
)
from bigdata_invoice_stream_analysis_spark.operators.pdf import (
    encode_minimal_pdf,
    parse_pdf,
)
from bigdata_invoice_stream_analysis_spark.operators.tensorfile import (
    parse_npy,
    parse_npz,
    parse_safetensors,
)
from bigdata_invoice_stream_analysis_spark.operators.tfrecord import (
    encode_example,
    encode_tfrecords,
    parse_example,
    parse_tfrecords,
)


def _fixtures() -> list[tuple[str, object, bytes]]:
    pq = encode_parquet(
        [("a", "int64", [1, 2, 3, None]),
         ("s", "string", ["x", "yy", "z", "w"])],
        codec="GZIP", max_rows_per_group=2)
    av = encode_avro(
        {"type": "record", "name": "R", "fields": [
            {"name": "x", "type": "long"},
            {"name": "s", "type": "string"}]},
        [{"x": 1, "s": "a"}, {"x": 2, "s": "b"}], codec="deflate")
    buf = io.BytesIO()
    np.save(buf, np.arange(8, dtype=np.int64))
    npy = buf.getvalue()
    buf = io.BytesIO()
    np.savez_compressed(buf, a=np.arange(40.0))
    npz = buf.getvalue()
    tf = encode_tfrecords([encode_example({"a": [1, 2], "b": [b"xy"]})])
    pdf = encode_minimal_pdf(["hello world", "page two"])
    sth = json.dumps({"a": {"dtype": "F32", "shape": [1],
                            "data_offsets": [0, 4]}}).encode()
    st_ = struct.pack("<Q", len(sth)) + sth + b"\x00" * 4

    def tf_walk(d):
        return [parse_example(r["payload"]) if r["data_crc_ok"]
                else None for r in parse_tfrecords(d)]

    import pyarrow as pa
    import pyarrow.ipc as ipc
    import pyarrow.orc as pa_orc

    from bigdata_invoice_stream_analysis_spark.operators.arrowipc import (
        parse_arrow_file,
    )
    from bigdata_invoice_stream_analysis_spark.operators.orcmeta import (
        parse_orc_footer,
    )

    table = pa.table({"a": [1, 2, None], "s": ["x", "y", "z"]})
    buf = io.BytesIO()
    pa_orc.write_table(table.drop_null(), buf, compression="zlib")
    orc = buf.getvalue()
    buf = io.BytesIO()
    with ipc.new_file(buf, table.schema) as w:
        w.write_table(table, max_chunksize=2)
    arrow = buf.getvalue()

    return [
        ("parquet", parse_parquet_footer, pq),
        ("avro", parse_avro, av),
        ("npy", parse_npy, npy),
        ("npz", parse_npz, npz),
        ("safetensors", parse_safetensors, st_),
        ("tfrecord", tf_walk, tf),
        ("pdf", parse_pdf, pdf),
        ("orc", parse_orc_footer, orc),
        ("arrow", parse_arrow_file, arrow),
    ]


@pytest.mark.parametrize("name,fn,blob", _fixtures(),
                         ids=[f[0] for f in _fixtures()])
def test_seeded_corruption_fuzz_raises_only_valueerror(name, fn, blob):
    rng = random.Random(12345)
    for _ in range(250):
        b = bytearray(blob)
        op = rng.random()
        if op < 0.4 and len(b) > 4:
            for _ in range(rng.randint(1, 4)):
                i = rng.randrange(len(b))
                b[i] = rng.randrange(256)
        elif op < 0.7:
            b = b[: rng.randrange(len(b))]
        elif op < 0.85:
            i = rng.randrange(len(b) + 1)
            b = (b[:i]
                 + bytes(rng.randrange(256)
                         for _ in range(rng.randint(1, 8)))
                 + b[i:])
        else:
            b = bytes(rng.randrange(256)
                      for _ in range(rng.randrange(200)))
        try:
            fn(bytes(b))
        except ValueError:
            pass
        # anything else propagates and fails the test


# --- the specific escape classes the round-8 fuzz found ---------------------

def _footer_file(footer: bytes) -> bytes:
    return (b"PAR1" + footer
            + len(footer).to_bytes(4, "little") + b"PAR1")


def test_parquet_wrong_typed_field_is_valueerror():
    """row_groups (field 4) decoded as an int instead of a list must
    be 'malformed footer', not a TypeError from the mapping code."""
    w = _Writer()
    w.struct([(4, CT_I32, 5)])
    with pytest.raises(ValueError, match="malformed|truncated"):
        parse_parquet_footer(_footer_file(bytes(w.out)))


def test_parquet_nonprimitive_map_key_is_valueerror():
    # field 5, MAP type, 1 entry, key type STRUCT (unhashable)
    footer = bytes([0x5B, 0x01, 0xC5])
    with pytest.raises(ValueError, match="map key|truncated"):
        parse_parquet_footer(_footer_file(footer))


def test_avro_corrupt_deflate_block_is_valueerror():
    """A block that is not valid deflate must surface as ValueError
    (the codec library's zlib.error must not leak)."""
    good = encode_avro(
        {"type": "record", "name": "R",
         "fields": [{"name": "x", "type": "long"}]},
        [{"x": 1}], codec="deflate")
    from bigdata_invoice_stream_analysis_spark.operators.avro import (
        _zigzag,
    )

    sync = good[-16:]
    # container head ends right after the first sync marker
    head_end = good.index(sync) + 16
    garbage = b"\xff\xfe\xfd\xfc\xfb"  # not a deflate stream
    bad = (good[:head_end]
           + _zigzag(1) + _zigzag(len(garbage)) + garbage + sync)
    with pytest.raises(ValueError, match="deflate"):
        parse_avro(bad)


def test_avro_wrong_shape_schema_is_valueerror():
    """Valid JSON of the wrong shape (record without 'fields') must
    be a parse error, not a KeyError."""
    good = encode_avro(
        {"type": "record", "name": "R",
         "fields": [{"name": "x", "type": "long"}]},
        [{"x": 1}], codec="null")
    bad_schema = json.dumps({"type": "record", "name": "R"},
                            sort_keys=True,
                            separators=(",", ":")).encode()
    # rebuild the container with the truncated schema
    from bigdata_invoice_stream_analysis_spark.operators.avro import (
        MAGIC,
        _zigzag,
    )

    out = bytearray(MAGIC)
    meta = {"avro.codec": b"null", "avro.schema": bad_schema}
    out += _zigzag(len(meta))
    for k in sorted(meta):
        kb = k.encode()
        out += _zigzag(len(kb)) + kb
        out += _zigzag(len(meta[k])) + meta[k]
    out += _zigzag(0)
    sync = good[-16:]
    out += sync
    out += _zigzag(1) + _zigzag(1) + b"\x02" + sync
    with pytest.raises(ValueError, match="malformed schema"):
        parse_avro(bytes(out))


def test_npy_scalar_shape_header_is_valueerror():
    buf = io.BytesIO()
    np.save(buf, np.arange(4, dtype=np.int64))
    blob = bytearray(buf.getvalue())
    (hlen,) = struct.unpack_from("<H", blob, 8)
    header = (b"{'descr': '<i8', 'fortran_order': False, "
              b"'shape': 3}").ljust(hlen)
    blob[10 : 10 + hlen] = header
    with pytest.raises(ValueError, match="shape"):
        parse_npy(bytes(blob))


def test_npz_corrupt_deflated_member_is_row_not_crash():
    buf = io.BytesIO()
    np.savez_compressed(buf, a=np.arange(100.0))
    blob = bytearray(buf.getvalue())
    blob[60] ^= 0xFF  # inside the deflated member payload
    members = parse_npz(bytes(blob))
    assert len(members) == 1
    # either the inflate fails (error row) or the header survives;
    # both are data, never an exception
    assert members[0]["name"] == "a"


def test_triage_never_raises_on_corrupted_codebook_payloads():
    """sniff.triage is the quarantine boundary for the whole graded
    ingestion surface: over corruptions of every content_triage
    codebook payload it must always return a row — the fuzz that
    found the mp4 sample-table count hang."""
    from bigdata_invoice_stream_analysis_spark.operators.sniff import (
        triage,
    )
    from bigdata_invoice_stream_analysis_spark.plans.ingestion import (
        _triage_payload,
    )

    rng = random.Random(77)
    for k in range(22):
        blob = _triage_payload(k)
        for _ in range(60):
            b = bytearray(blob)
            op = rng.random()
            if op < 0.45 and len(b) > 4:
                for _ in range(rng.randint(1, 5)):
                    i = rng.randrange(len(b))
                    b[i] = rng.randrange(256)
            elif op < 0.75:
                b = b[: rng.randrange(len(b))]
            elif op < 0.9:
                i = rng.randrange(len(b) + 1)
                b = (b[:i]
                     + bytes(rng.randrange(256)
                             for _ in range(rng.randint(1, 10)))
                     + b[i:])
            else:
                b = bytes(rng.randrange(256)
                          for _ in range(rng.randrange(300)))
            row = triage(bytes(b))  # must never raise
            assert "format" in row
