"""HEIF/AVIF parsing (operators/heif) — meta-box item/property
walks, ispe-vs-bitstream lie detection through the shared AV1/HEVC
parsers, Exif/XMP privacy items, grid/rotation structure."""

import pytest

from bigdata_invoice_stream_analysis_spark.operators.heif import (
    encode_minimal_heif,
    heif_image_profile,
    parse_heif,
)


def test_avif_roundtrip():
    m = parse_heif(encode_minimal_heif())
    assert m["brand"] == "avif"
    assert m["primary_type"] == "av01"
    assert (m["width"], m["height"]) == (640, 480)
    assert m["codec"] == "av01.0.08M"
    assert m["dims_match"]


def test_heic_roundtrip_through_shared_sps_parser():
    m = parse_heif(encode_minimal_heif(codec="hvc1"))
    assert m["brand"] == "heic"
    assert m["codec"] == "hvc1.1.L93"
    # bitstream truth comes from the hvcC SPS via h265.parse_hevc_sps
    assert (m["bitstream_width"], m["bitstream_height"]) == (640, 480)


def test_ispe_lie_caught_by_bitstream():
    m = parse_heif(encode_minimal_heif(lie_dims=True))
    assert m["width"] == 648             # the container's claim
    assert m["bitstream_width"] == 640   # the decoder's truth
    assert not m["dims_match"]


def test_av1_level_in_codec_string():
    m = parse_heif(encode_minimal_heif(width=1280, height=720,
                                       seq_level=12))
    assert m["codec"] == "av01.0.12M"
    assert m["bitstream_width"] == 1280


def test_exif_and_xmp_items_flagged():
    m = parse_heif(encode_minimal_heif(with_exif=True, with_xmp=True))
    assert m["has_exif"] and m["has_xmp"]
    assert m["n_items"] == 3


def test_grid_primary():
    m = parse_heif(encode_minimal_heif(grid=True))
    assert m["is_grid"] and m["primary_type"] == "grid"
    assert m["n_items"] == 2


def test_rotation_property():
    m = parse_heif(encode_minimal_heif(rotation=270))
    assert m["rotation"] == 270


def test_non_heif_brand_rejected():
    with pytest.raises(ValueError, match="not a HEIF brand"):
        parse_heif(b"\x00\x00\x00\x10ftypmp42aaaa")


def test_missing_meta_rejected():
    raw = encode_minimal_heif()
    ftyp_len = int.from_bytes(raw[:4], "big")
    ftyp_only = raw[:ftyp_len]  # just the ftyp box
    with pytest.raises(ValueError, match="no meta box"):
        parse_heif(ftyp_only)


def test_primary_item_must_exist():
    raw = bytearray(encode_minimal_heif())
    i = raw.find(b"pitm") + 8
    raw[i:i + 2] = (99).to_bytes(2, "big")  # point at a ghost item
    with pytest.raises(ValueError, match="primary item"):
        parse_heif(bytes(raw))


def test_ipma_index_bounds_checked():
    raw = bytearray(encode_minimal_heif())
    i = raw.rfind(b"ipma")
    # first association byte: essential bit + index — point past ipco
    raw[i + 4 + 4 + 4 + 2 + 1] = 0x80 | 9
    with pytest.raises(ValueError, match="out of ipco range"):
        parse_heif(bytes(raw))


def test_profile_operator(spark):
    payloads = [
        encode_minimal_heif(with_exif=True),
        encode_minimal_heif(codec="hvc1"),
        encode_minimal_heif(lie_dims=True),
        b"\x00\x00\x00\x10ftypmp42aaaa",
    ]
    files = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "file_id long, payload binary",
    )
    rows = {r["file_id"]: r
            for r in heif_image_profile(files).collect()}
    assert rows[0]["ok"] and rows[0]["has_exif"]
    assert rows[1]["codec"] == "hvc1.1.L93"
    assert rows[2]["dims_match"] is False
    assert not rows[3]["ok"]
    plan = heif_image_profile(files)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_ipma_15bit_indices_flag():
    # ipma flags&1 widens each association to essential(1)+index(15):
    # rewrite the encoder's 7-bit ipma into the wide layout
    import struct as _s

    from bigdata_invoice_stream_analysis_spark.operators.heif import (
        _fullbox,
    )

    raw = bytearray(encode_minimal_heif())
    i = raw.rfind(b"ipma") - 4
    old_size = _s.unpack_from(">I", raw, i)[0]
    wide = _fullbox(
        b"ipma",
        _s.pack(">I", 1) + _s.pack(">H", 1) + bytes([2])
        + _s.pack(">HH", 0x8001, 0x8002),
        flags=1)
    raw2 = raw[:i] + wide + raw[i + old_size:]
    # fix the enclosing iprp and meta sizes
    delta = len(wide) - old_size
    j = raw2.rfind(b"iprp") - 4
    _s.pack_into(">I", raw2, j,
                 _s.unpack_from(">I", raw2, j)[0] + delta)
    k = raw2.find(b"meta") - 4
    _s.pack_into(">I", raw2, k,
                 _s.unpack_from(">I", raw2, k)[0] + delta)
    m = parse_heif(bytes(raw2))
    assert (m["width"], m["height"]) == (640, 480)
    assert m["codec"] == "av01.0.08M"
