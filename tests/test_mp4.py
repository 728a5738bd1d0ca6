"""ISO BMFF demuxer (operators/mp4.py) — box-level unit tests.

Non-circular anchors: the box grammar (size+type headers, 64-bit
largesize, size=0 to-end), the stts run-length expansion, the
stsc chunk→samples mapping, and the invariant that the emitted
(offset, size) ranges slice exactly the deterministic frame payloads
out of mdat."""

from __future__ import annotations

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_invoice_stream_analysis_spark.operators import mp4 as M  # noqa: E402


def test_roundtrip_sample_tables():
    sizes = [10, 3, 25, 1, 17]
    payload = M.encode_minimal_mp4(sizes, timescale=600, frame_delta=25)
    info = M.parse_mp4(payload)
    assert info["n_samples"] == 5
    assert info["sizes"] == sizes
    assert info["timescale"] == 600
    assert info["duration"] == 5 * 25
    assert info["times"] == [0, 25, 50, 75, 100]
    # offsets are contiguous from the mdat payload start
    for i in range(1, 5):
        assert info["offsets"][i] == info["offsets"][i - 1] + sizes[i - 1]
    # and the ranges slice the exact deterministic frame bytes
    for i, (off, sz) in enumerate(zip(info["offsets"], info["sizes"])):
        assert payload[off : off + sz] == bytes(
            (i + j) % 251 for j in range(sz)
        )


def test_box_walker_handles_largesize_and_to_end():
    body = b"\x01\x02\x03"
    large = (
        struct.pack(">I", 1) + b"test" + struct.pack(">Q", 16 + len(body)) + body
    )
    boxes = list(M.walk_boxes(large, 0, len(large)))
    assert boxes == [(b"test", 16, len(large))]
    to_end = struct.pack(">I", 0) + b"tail" + body
    boxes = list(M.walk_boxes(to_end, 0, len(to_end)))
    assert boxes == [(b"tail", 8, len(to_end))]


def test_parse_rejects_malformed():
    with pytest.raises(ValueError):
        M.parse_mp4(b"not an mp4 at all...")
    good = M.encode_minimal_mp4([4, 4])
    with pytest.raises(ValueError):
        M.parse_mp4(good[: len(good) // 2])  # moov truncated away
    # corrupt the stsz sample count -> inconsistent tables
    bad = bytearray(good)
    i = bad.find(b"stsz")
    (n,) = struct.unpack(">I", bad[i + 12 : i + 16])
    bad[i + 12 : i + 16] = struct.pack(">I", n + 1)
    with pytest.raises(ValueError):
        M.parse_mp4(bytes(bad))


def test_frame_index_every_n(spark):
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)
    rows = [
        (1, bytearray(M.encode_minimal_mp4([5, 6, 7, 8, 9], frame_delta=40))),
        (2, bytearray(M.encode_minimal_mp4([3, 3], frame_delta=100))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = sorted(
        tuple(r) for r in M.frame_index(media, every_n=2).collect()
    )
    info1 = M.parse_mp4(bytes(rows[0][1]))
    expect = sorted(
        [
            (1, 0, info1["offsets"][0], 5, 0),
            (1, 2, info1["offsets"][2], 7, 80),
            (1, 4, info1["offsets"][4], 9, 160),
            (2, 0, M.parse_mp4(bytes(rows[1][1]))["offsets"][0], 3, 0),
        ]
    )
    assert got == expect
