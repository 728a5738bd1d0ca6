"""Tensor file formats: .npy/.npz parsed from scratch and
cross-validated against numpy's own writer/reader, safetensors
against the public format spec, plus the Spark profile operator."""

from __future__ import annotations

import io
import json
import struct
import sys
from pathlib import Path

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.tensorfile import (
    npy_stats,
    parse_npy,
    parse_npz,
    parse_safetensors,
    tensor_file_profile,
)


def _npy_bytes(arr, version=None) -> bytes:
    buf = io.BytesIO()
    if version:
        np.lib.format.write_array(buf, arr, version=version)
    else:
        np.save(buf, arr)
    return buf.getvalue()


# --- npy: numpy writes, we parse -------------------------------------------

@pytest.mark.parametrize("arr", [
    np.arange(12, dtype=np.int64).reshape(3, 4),
    np.linspace(-1, 1, 7, dtype=np.float32),
    np.array([], dtype=np.float64),
    np.array(3.5),  # zero-dim
    np.ones((2, 3), dtype=np.uint8, order="F"),
    np.array([True, False, True]),
])
def test_parse_npy_matches_numpy(arr):
    blob = _npy_bytes(arr)
    meta = parse_npy(blob)
    assert meta["shape"] == arr.shape
    assert meta["n_elements"] == arr.size
    assert meta["fortran_order"] == (
        arr.flags["F_CONTIGUOUS"] and not arr.flags["C_CONTIGUOUS"])
    assert meta["data_nbytes"] == arr.nbytes
    # offset agrees with numpy's own reader position
    again = np.load(io.BytesIO(blob))
    np.testing.assert_array_equal(
        np.frombuffer(blob, dtype=arr.dtype, count=arr.size,
                      offset=meta["data_offset"]),
        again.reshape(-1, order="F" if meta["fortran_order"] else "C"),
    )


def test_parse_npy_v2_header():
    arr = np.arange(5, dtype=np.int32)
    blob = _npy_bytes(arr, version=(2, 0))
    meta = parse_npy(blob)
    assert meta["version"] == "2.0"
    assert meta["shape"] == (5,)
    assert meta["dtype"] == "i4"


def test_npy_stats_numeric_and_nonfinite():
    arr = np.array([1.5, -2.0, np.nan, np.inf, 0.5], dtype=np.float32)
    st_ = npy_stats(_npy_bytes(arr))
    assert st_["vmin"] == -2.0 and st_["vmax"] == 1.5
    assert st_["n_finite"] == 3
    st_ = npy_stats(_npy_bytes(np.array([7, -3], dtype=np.int64)))
    assert st_["vmin"] == -3.0 and st_["vmax"] == 7.0


def test_parse_npy_rejects_malformed():
    good = _npy_bytes(np.arange(4))
    with pytest.raises(ValueError, match="magic"):
        parse_npy(b"NOPE" + good[4:])
    with pytest.raises(ValueError, match="header length"):
        parse_npy(good[:8] + b"\xff\xff" + good[10:12])
    # header that is valid Python but not a dict
    blob = bytearray(good)
    hlen = struct.unpack_from("<H", blob, 8)[0]
    evil = b"[1,2,3]".ljust(hlen)
    blob[10 : 10 + hlen] = evil
    with pytest.raises(ValueError, match="header"):
        parse_npy(bytes(blob))
    # shape × itemsize beyond the file
    arr = np.arange(4, dtype=np.int64)
    blob = _npy_bytes(arr)
    with pytest.raises(ValueError, match="shorter"):
        parse_npy(blob[:-8])


def test_parse_npz_via_own_zip_walk():
    buf = io.BytesIO()
    np.savez(buf, a=np.arange(6, dtype=np.int64).reshape(2, 3),
             b=np.array([0.5, 1.5], dtype=np.float64))
    members = {m["name"]: m for m in parse_npz(buf.getvalue())}
    assert set(members) == {"a", "b"}
    assert members["a"]["shape"] == (2, 3)
    assert members["a"]["error"] is None
    assert members["b"]["dtype"] == "f8"
    # compressed variant too
    buf = io.BytesIO()
    np.savez_compressed(buf, z=np.ones((4, 4), dtype=np.float32))
    members = parse_npz(buf.getvalue())
    assert members[0]["shape"] == (4, 4)


# --- safetensors (format spec) ---------------------------------------------

def _st_file(tensors: dict[str, np.ndarray], meta=None) -> bytes:
    DT = {np.dtype("float32"): "F32", np.dtype("int64"): "I64",
          np.dtype("uint8"): "U8"}
    header: dict = {}
    body = b""
    for name, arr in tensors.items():
        raw = arr.tobytes()
        header[name] = {
            "dtype": DT[arr.dtype], "shape": list(arr.shape),
            "data_offsets": [len(body), len(body) + len(raw)],
        }
        body += raw
    if meta:
        header["__metadata__"] = meta
    hjson = json.dumps(header).encode()
    return struct.pack("<Q", len(hjson)) + hjson + body


def test_parse_safetensors_roundtrip():
    t = {"emb.weight": np.arange(6, dtype=np.float32).reshape(2, 3),
         "ids": np.array([1, 2], dtype=np.int64)}
    blob = _st_file(t, meta={"format": "pt"})
    meta = parse_safetensors(blob)
    assert meta["metadata"] == {"format": "pt"}
    by_name = {x["name"]: x for x in meta["tensors"]}
    assert by_name["emb.weight"]["shape"] == (2, 3)
    assert by_name["emb.weight"]["nbytes"] == 24
    # slicing by the reported offsets reproduces the tensor bytes
    x = by_name["ids"]
    assert blob[x["start"]:x["end"]] == t["ids"].tobytes()


def test_parse_safetensors_rejects_bad_offsets():
    blob = bytearray(_st_file({"a": np.zeros(2, dtype=np.float32)}))
    hlen = struct.unpack_from("<Q", blob, 0)[0]
    header = json.loads(bytes(blob[8 : 8 + hlen]))
    header["a"]["data_offsets"] = [0, 9999]
    hjson = json.dumps(header).encode()
    bad = struct.pack("<Q", len(hjson)) + hjson + bytes(blob[8 + hlen:])
    with pytest.raises(ValueError, match="range"):
        parse_safetensors(bad)
    # overlapping tensors
    two = _st_file({"a": np.zeros(2, dtype=np.float32),
                    "b": np.zeros(2, dtype=np.float32)})
    hlen = struct.unpack_from("<Q", two, 0)[0]
    header = json.loads(two[8 : 8 + hlen])
    header["b"]["data_offsets"] = [4, 12]
    hjson = json.dumps(header).encode()
    bad = struct.pack("<Q", len(hjson)) + hjson + two[8 + hlen:]
    with pytest.raises(ValueError, match="overlap"):
        parse_safetensors(bad)
    with pytest.raises(ValueError, match="truncated|length"):
        parse_safetensors(b"\xff\xff\xff\xff\xff\xff\xff\x00abc")


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=0, max_size=50),
       st.sampled_from(["int64", "float32", "uint8"]))
def test_property_npy_roundtrip(values, dtype):
    if dtype == "uint8":
        values = [v % 256 for v in values]
    arr = np.array(values, dtype=dtype)
    meta = parse_npy(_npy_bytes(arr))
    assert meta["n_elements"] == len(values)
    assert meta["data_nbytes"] == arr.nbytes


# --- Spark operator ---------------------------------------------------------

def test_spark_tensor_profile(spark):
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)
    npz = io.BytesIO()
    np.savez(npz, emb=np.linspace(0, 1, 8, dtype=np.float32))
    blobs = [
        (0, bytearray(_npy_bytes(
            np.arange(10, dtype=np.int64).reshape(2, 5)))),
        (1, bytearray(npz.getvalue())),
        (2, bytearray(_st_file(
            {"w": np.ones((3, 2), dtype=np.float32)}))),
        (3, bytearray(b"\x00\x01garbage")),
    ]
    df = spark.createDataFrame(blobs, "file_id long, payload binary")
    rows = tensor_file_profile(df).collect()
    by_fid = {}
    for r in rows:
        by_fid.setdefault(r["file_id"], []).append(r)
    assert by_fid[0][0]["format"] == "npy"
    assert json.loads(by_fid[0][0]["shape_json"]) == [2, 5]
    assert by_fid[0][0]["vmin"] == 0.0 and by_fid[0][0]["vmax"] == 9.0
    assert by_fid[1][0]["format"] == "npz"
    assert by_fid[1][0]["tensor"] == "emb"
    assert by_fid[1][0]["vmax"] == 1.0
    assert by_fid[2][0]["format"] == "safetensors"
    assert by_fid[2][0]["dtype"] == "F32"
    assert by_fid[2][0]["n_elements"] == 6
    assert by_fid[3][0]["format"] == "error"
    assert by_fid[3][0]["error"]
