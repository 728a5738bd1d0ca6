"""TAR/WebDataset: ustar header walk with checksum validation, GNU
longname + pax path overrides, base-256 sizes, key/extension split,
and the Spark component/sample operators."""

from __future__ import annotations

import io
import sys
import tarfile
import zlib
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.wds import (
    encode_tar,
    parse_tar,
    split_wds_key,
    wds_components,
    wds_samples,
)

ENTRIES = [
    ("000000.jpg", b"\xff\xd8 fake jpeg"),
    ("000000.txt", b"a caption"),
    ("000000.json", b'{"id": 0}'),
    ("000001.jpg", b"\xff\xd8 another"),
    ("000001.txt", b"second caption"),
]


def test_tar_roundtrip_and_stdlib_agreement():
    blob = encode_tar(ENTRIES)
    members = parse_tar(blob)
    assert [(m["name"], m["size"]) for m in members] == [
        (n, len(b)) for n, b in ENTRIES
    ]
    for m, (_, body) in zip(members, ENTRIES):
        assert blob[m["offset"] : m["offset"] + m["size"]] == body
    # The stdlib reader accepts our fixture writer's output verbatim.
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert tf.getnames() == [n for n, _ in ENTRIES]
        assert tf.extractfile("000000.txt").read() == b"a caption"


def test_parse_tar_reads_stdlib_output():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, body in ENTRIES:
            info = tarfile.TarInfo(name)
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
        tf.addfile(tarfile.TarInfo("adir/"))  # dir entry: skipped
    members = parse_tar(buf.getvalue())
    assert [m["name"] for m in members] == [n for n, _ in ENTRIES]


@pytest.mark.parametrize("via", ["gnu", "pax"])
def test_long_names(via):
    long_name = "samples/" + "d" * 120 + "/000042.flac"
    blob = encode_tar([(long_name, b"audio")], longname_via=via)
    members = parse_tar(blob)
    assert members[0]["name"] == long_name
    assert blob[members[0]["offset"] :][:5] == b"audio"
    # stdlib agrees on the resolved name
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert tf.getnames() == [long_name]


def test_checksum_mismatch_raises():
    blob = bytearray(encode_tar(ENTRIES))
    blob[0] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(blob))


def test_truncated_member_raises():
    blob = encode_tar(ENTRIES)
    with pytest.raises(ValueError, match="overruns"):
        parse_tar(blob[: 512 + 4])


def test_base256_size_field():
    blob = bytearray(encode_tar([("big.bin", b"x" * 600)]))
    # Rewrite the size field as GNU base-256 (high bit + big-endian).
    size_b256 = bytes([0x80]) + (600).to_bytes(11, "big")
    blob[124:136] = size_b256
    # Re-checksum.
    h = blob[0:512]
    blanked = bytes(h[:148]) + b" " * 8 + bytes(h[156:])
    blob[148:156] = f"{sum(blanked):06o}".encode() + b"\x00 "
    members = parse_tar(bytes(blob))
    assert members[0]["size"] == 600


def test_split_wds_key():
    assert split_wds_key("000123.jpg") == ("000123", "jpg")
    assert split_wds_key("a/b/x.seg.json") == ("x", "seg.json")
    assert split_wds_key("noext") == ("noext", "")


@given(
    st.lists(
        st.tuples(
            st.from_regex(r"[a-z0-9]{1,10}(/[a-z0-9]{1,10}){0,2}\.[a-z]{1,4}",
                          fullmatch=True),
            st.binary(min_size=0, max_size=700),
        ),
        min_size=0, max_size=6, unique_by=lambda e: e[0],
    )
)
@settings(max_examples=80, deadline=None)
def test_tar_roundtrip_property(entries):
    members = parse_tar(encode_tar(entries))
    assert [(m["name"], m["size"]) for m in members] == [
        (n, len(b)) for n, b in entries
    ]


def _shard_df(spark):
    shard2 = [
        ("s/000000.jpg", b"\xff\xd8 s2"),
        ("s/000000.txt", b"cap"),
    ]
    return spark.createDataFrame(
        [(1, bytearray(encode_tar(ENTRIES))),
         (2, bytearray(encode_tar(shard2)))],
        "shard_id long, payload binary",
    )


def test_wds_components_operator(spark):
    rows = wds_components(_shard_df(spark)).collect()
    assert len(rows) == 7
    r0 = next(r for r in rows
              if r["shard_id"] == 1 and r["member_idx"] == 1)
    assert (r0["sample_key"], r0["ext"]) == ("000000", "txt")
    assert r0["n_bytes"] == len(b"a caption")
    assert r0["crc32"] == zlib.crc32(b"a caption")
    # directory components are keyed by basename, not path
    s2 = [r for r in rows if r["shard_id"] == 2]
    assert {r["sample_key"] for r in s2} == {"000000"}


def test_wds_samples_operator(spark):
    rows = {(r["shard_id"], r["sample_key"]): r
            for r in wds_samples(_shard_df(spark)).collect()}
    assert rows[(1, "000000")]["n_components"] == 3
    assert rows[(1, "000000")]["exts"] == ["jpg", "json", "txt"]
    assert rows[(1, "000001")]["exts"] == ["jpg", "txt"]
    assert rows[(2, "000000")]["total_bytes"] == len(b"\xff\xd8 s2") + 3


def test_non_utf8_member_names_survive():
    """Latin-1 names in old archives must not kill the walk (nor the
    Arrow string conversion downstream) — mojibake beats a dead task."""
    blob = bytearray(encode_tar([("caf_.jpg", b"x")]))
    blob[3] = 0xE9  # caf<e9>.jpg, not valid UTF-8
    h = blob[0:512]
    blanked = bytes(h[:148]) + b" " * 8 + bytes(h[156:])
    blob[148:156] = f"{sum(blanked):06o}".encode() + b"\x00 "
    members = parse_tar(bytes(blob))
    assert members[0]["name"] == "caf�.jpg"
    assert members[0]["size"] == 1


def test_pax_size_override_keeps_walk_synchronized():
    """ADVICE r7: a pax ``size=`` record (how non-GNU writers encode
    members >8 GiB) is authoritative; the member's octal field may be
    a placeholder. The walk must honor it or it desynchronizes."""
    entries = [
        ("a.txt", b"alpha" * 20),
        ("b.bin", b"\x01\x02\x03" * 333),
        ("c.txt", b"gamma"),
    ]
    data = encode_tar(entries, pax_size=True)
    members = parse_tar(data)
    assert [(m["name"], m["size"]) for m in members] == [
        (n, len(b)) for n, b in entries
    ]
    for m, (_, body) in zip(members, entries):
        assert data[m["offset"] : m["offset"] + m["size"]] == body


def test_pax_bad_size_record_raises_valueerror():
    data = bytearray(encode_tar([("a.txt", b"x" * 7)], pax_size=True))
    idx = data.find(b"size=7\n")
    assert idx > 0
    data[idx + 5 : idx + 6] = b"q"  # size=q
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pax size"):
        parse_tar(bytes(data))


def test_pax_size_with_long_name_carries_path_record():
    """pax size= + >100-char member name in one header: both records
    apply to the next member (the combination real pax writers emit)."""
    name = "deep/" * 25 + "sample.jpg"
    data = encode_tar([(name, b"Z" * 700)], pax_size=True)
    members = parse_tar(data)
    assert [(m["name"], m["size"]) for m in members] == [(name, 700)]
