"""H.264 SPS bit-level parsing (operators/h264) and the SPS-vs-stsd
cross-check operator (operators/mp4.parse_sps_cross_check) — written
against Rec. ITU-T H.264 §7.3.2.1.1 / §9.1 and ISO 14496-15 §5.3.3."""

from __future__ import annotations

import pytest

from bigdata_invoice_stream_analysis_spark.operators import h264 as H
from bigdata_invoice_stream_analysis_spark.operators import mp4 as M


def test_exp_golomb_known_vectors():
    """§9.1 Table 9-1: codeNum 0..8 code words; §9.1.1 se mapping."""
    # ue: 1, 010, 011, 00100, 00101, 00110, 00111, 0001000, 0001001
    bits = "1" "010" "011" "00100" "00101" "00110" "00111" "0001000" "0001001"
    padded = bits + "0" * (-len(bits) % 8)
    data = bytes(
        int(padded[i : i + 8], 2) for i in range(0, len(padded), 8)
    )
    r = H.BitReader(data)
    assert [r.ue() for _ in range(9)] == list(range(9))
    # se: k -> (-1)^(k+1) ceil(k/2): 0,1,-1,2,-2,3,-3,4,-4
    r2 = H.BitReader(data)
    assert [r2.se() for _ in range(9)] == [0, 1, -1, 2, -2, 3, -3, 4, -4]


def test_bitwriter_reader_roundtrip():
    w = H.BitWriter()
    vals = [0, 1, 2, 3, 7, 31, 254, 255, 1023]
    for v in vals:
        w.ue(v)
    svals = [0, 1, -1, 5, -7, 128, -255]
    for v in svals:
        w.se(v)
    w.u(0b1011, 4)
    data = w.rbsp_trailing()
    r = H.BitReader(data)
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals
    assert r.u(4) == 0b1011
    assert r.u(1) == 1  # rbsp_stop_one_bit


def test_emulation_prevention_roundtrip():
    """§7.4.1.1: 0x000001/0x000002 start-code-like runs must gain an
    0x03; stripping restores the RBSP exactly — including the
    0x00000303 corner (escaped 0x03 after two zeros)."""
    raw = bytes([0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0, 0, 0, 0])
    esc = H.insert_emulation_prevention(raw)
    for pat in (b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02"):
        assert pat not in esc
    assert H.strip_emulation_prevention(esc) == raw
    # bytes > 3 after two zeros are NOT escaped
    assert H.insert_emulation_prevention(bytes([0, 0, 4])) == bytes([0, 0, 4])


def test_sps_roundtrip_baseline_and_high():
    for prof in (66, 77, 100):
        nal = H.encode_sps(prof, 0x40, 31, 5, 4,
                           crop_right_units=2, crop_bottom_units=1)
        s = H.parse_sps(nal)
        assert s["profile_idc"] == prof
        assert s["constraint_flags"] == 0x40
        assert s["level_idc"] == 31
        assert s["coded_width"] == 80 and s["coded_height"] == 64
        # 4:2:0 + frame_mbs_only → CropUnitX = 2, CropUnitY = 2
        assert s["crop_right"] == 4 and s["crop_bottom"] == 2
        assert s["width"] == 76 and s["height"] == 62
        assert s["chroma_format_idc"] == 1
        assert s["bit_depth_luma"] == 8


def test_sps_crop_units_by_chroma_format():
    """§7.4.2.1.1 crop units: monochrome (ChromaArrayType 0) crops in
    1-px luma units horizontally; 4:2:2 halves width only; 4:4:4
    neither."""
    for cfi, unit_x, unit_y in ((0, 1, 1), (1, 2, 2), (2, 2, 1), (3, 1, 1)):
        nal = H.encode_sps(100, 0, 40, 6, 5, chroma_format_idc=cfi,
                           crop_right_units=3, crop_bottom_units=2)
        s = H.parse_sps(nal)
        assert s["width"] == 96 - unit_x * 3, cfi
        assert s["height"] == 80 - unit_y * 2, cfi


def test_sps_interlaced_height_doubles():
    """frame_mbs_only_flag = 0: map units are field MB pairs — height
    doubles and the vertical crop unit doubles too."""
    nal = H.encode_sps(66, 0, 30, 4, 3, frame_mbs_only=0,
                       crop_bottom_units=1)
    s = H.parse_sps(nal)
    assert s["frame_mbs_only_flag"] == 0
    assert s["coded_height"] == 2 * 3 * 16
    assert s["height"] == 96 - 4  # CropUnitY = 2 * (2 - 0) = 4


def test_sps_rejects_malformed():
    with pytest.raises(ValueError, match="empty"):
        H.parse_sps(b"")
    with pytest.raises(ValueError, match="forbidden_zero_bit"):
        H.parse_sps(b"\x87abc")
    with pytest.raises(ValueError, match="not an SPS"):
        H.parse_sps(b"\x68abc")  # PPS type
    with pytest.raises(ValueError, match="truncated"):
        H.parse_sps(b"\x67\x42")


def test_sps_cross_check_match_and_lie():
    nal = H.encode_sps(77, 0x20, 31, 5, 4,
                       crop_right_units=1, crop_bottom_units=1)
    truth = M.encode_minimal_mp4(
        [8, 8], avc1=(78, 62, 77, 0x20, 31), avc1_sps=(nal,)
    )
    r = M.parse_sps_cross_check(truth)
    assert r["dims_match"] is True
    assert (r["sps_width"], r["sps_height"]) == (78, 62)
    assert (r["coded_width"], r["coded_height"]) == (80, 64)
    lie = M.encode_minimal_mp4(
        [8, 8], avc1=(1920, 1080, 77, 0x20, 31), avc1_sps=(nal,)
    )
    r2 = M.parse_sps_cross_check(lie)
    assert r2["dims_match"] is False
    assert (r2["container_width"], r2["container_height"]) == (1920, 1080)
    assert (r2["sps_width"], r2["sps_height"]) == (78, 62)
    # metadata-only avcC (no SPS array) refuses rather than guessing
    with pytest.raises(ValueError, match="no sequence parameter sets"):
        M.parse_sps_cross_check(
            M.encode_minimal_mp4([8], avc1=(64, 48, 66, 0, 30))
        )
    # hev1 entry has no avcC at all
    with pytest.raises(ValueError, match="no avcC"):
        M.parse_sps_cross_check(
            M.encode_minimal_mp4([8], hev1=(64, 48, 1, 0x60000000, 0, 93))
        )


def test_codec_profile_compat_flags_bit31(spark):
    """ADVICE r6: hvcC general_profile_compatibility_flags is a u32 —
    bit 31 set (general_profile_compatibility_flag[0], i.e. 2^31) must
    survive the Arrow conversion, which requires LongType in the
    operator schema (a signed int32 overflows)."""
    payload = M.encode_minimal_mp4(
        [4], hev1=(640, 480, 1, 0x80000000, 0, 120)
    )
    assert M.parse_codec_profile(payload)["compat_flags"] == 0x80000000
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = M.codec_profile(df).collect()
    assert rows[0]["compat_flags"] == 0x80000000
    # bit 31 reversed → bit 0 → "1" in the Annex-E string
    assert rows[0]["codec_string"] == "hev1.1.1.L120"
