"""Property-based tests (hypothesis) for the bit-level codec parsers:
encode→parse roundtrips over ARBITRARY field combinations, not just the
fixture codebooks' residue grids. Reviews found a bit-layout corner in
fresh parser code four rounds running (crop-unit scaling, fragment sync
flags, traf anchoring, the HEVC compat-flag position) — these pin the
whole field lattice so the next corner fails a generated example
instead of shipping. Pure Python (no Spark session): hundreds of
examples cost milliseconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_invoice_stream_analysis_spark.operators import h264 as H
from bigdata_invoice_stream_analysis_spark.operators import h265 as H5
from bigdata_invoice_stream_analysis_spark.operators import mp4 as M

SETTINGS = settings(max_examples=200, deadline=None)


@SETTINGS
@given(
    profile=st.sampled_from([66, 77, 88, 100, 110, 122, 244, 44]),
    constraints=st.integers(0, 63).map(lambda v: v << 2),
    level=st.integers(9, 62),
    w_mbs=st.integers(1, 512),
    h_units=st.integers(1, 256),
    crop_r=st.integers(0, 7),
    crop_b=st.integers(0, 7),
    cfi=st.sampled_from([0, 1, 2, 3]),
    interlaced=st.booleans(),
)
def test_h264_sps_roundtrip_lattice(
    profile, constraints, level, w_mbs, h_units, crop_r, crop_b, cfi,
    interlaced,
):
    """Every encodable (profile, geometry, crop, chroma, scan) combo
    parses back exactly, including the §7.4.2.1.1 crop-unit scaling."""
    high = profile in H._HIGH_PROFILES
    if not high:
        cfi = 1  # non-high profiles imply 4:2:0; encoder ignores cfi
    frame_mbs_only = 0 if interlaced else 1
    nal = H.encode_sps(
        profile, constraints, level, w_mbs, h_units,
        crop_right_units=crop_r, crop_bottom_units=crop_b,
        chroma_format_idc=cfi, frame_mbs_only=frame_mbs_only,
    )
    s = H.parse_sps(nal)
    assert s["profile_idc"] == profile
    assert s["constraint_flags"] == constraints
    assert s["level_idc"] == level
    assert s["chroma_format_idc"] == cfi
    assert s["frame_mbs_only_flag"] == frame_mbs_only
    assert s["coded_width"] == 16 * w_mbs
    assert s["coded_height"] == (2 - frame_mbs_only) * 16 * h_units
    # §7.4.2.1.1 crop units
    chroma_array_type = cfi  # encoder never sets separate planes
    if chroma_array_type == 0:
        ux, uy = 1, 2 - frame_mbs_only
    else:
        ux = 2 if cfi in (1, 2) else 1
        uy = (2 if cfi == 1 else 1) * (2 - frame_mbs_only)
    assert s["crop_right"] == ux * crop_r
    assert s["crop_bottom"] == uy * crop_b
    assert s["width"] == s["coded_width"] - ux * crop_r
    assert s["height"] == s["coded_height"] - uy * crop_b


@SETTINGS
@given(
    profile=st.integers(1, 11),
    tier=st.integers(0, 1),
    level=st.integers(30, 255),
    width=st.integers(16, 8192),
    height=st.integers(16, 8192),
    crop_r=st.integers(0, 15),
    crop_b=st.integers(0, 15),
    cfi=st.sampled_from([0, 1, 2, 3]),
    compat=st.one_of(st.none(), st.integers(0, 2**32 - 1)),
)
def test_h265_sps_roundtrip_lattice(
    profile, tier, level, width, height, crop_r, crop_b, cfi, compat
):
    """Every encodable HEVC (PTL, geometry, conformance-window, chroma)
    combo parses back exactly, including the full-u32 compat flags
    (bit 31 included — the flag whose POSITION the r7 review fixed)."""
    nal = H5.encode_hevc_sps(
        profile, tier, level, width, height,
        crop_right_units=crop_r, crop_bottom_units=crop_b,
        chroma_format_idc=cfi, compat_flags=compat,
    )
    s = H5.parse_hevc_sps(nal)
    assert s["profile_idc"] == profile
    assert s["tier_flag"] == tier
    assert s["level_idc"] == level
    assert s["chroma_format_idc"] == cfi
    if compat is None:
        assert s["compat_flags"] == (1 << (31 - profile)) | (1 << 30)
    else:
        assert s["compat_flags"] == compat
    sub_w = 2 if cfi in (1, 2) else 1
    sub_h = 2 if cfi == 1 else 1
    assert (s["coded_width"], s["coded_height"]) == (width, height)
    assert s["crop_right"] == sub_w * crop_r
    assert s["crop_bottom"] == sub_h * crop_b
    assert s["width"] == width - sub_w * crop_r
    assert s["height"] == height - sub_h * crop_b


@SETTINGS
@given(data=st.binary(max_size=64))
def test_emulation_prevention_roundtrip_arbitrary(data):
    """insert∘strip is identity for ANY byte string — the escaping
    must be reversible even on adversarial zero runs."""
    assert H.strip_emulation_prevention(
        H.insert_emulation_prevention(data)
    ) == data


@SETTINGS
@given(
    prof=st.integers(0, 2),
    lev=st.integers(0, 31),
    tier=st.integers(0, 1),
    hbd=st.integers(0, 1),
    twelve=st.integers(0, 1),
    mono=st.integers(0, 1),
    width=st.integers(16, 65535),
    height=st.integers(16, 65535),
)
def test_av1c_roundtrip_lattice(prof, lev, tier, hbd, twelve, mono,
                                width, height):
    """av1C fixed-bit record roundtrips through parse_codec_profile
    with the §6.4.1 profile-dependent depth rule."""
    payload = M.encode_minimal_mp4(
        [4], av01=(width, height, prof, lev, tier, hbd, twelve, mono)
    )
    got = M.parse_codec_profile(payload)
    assert (got["profile_idc"], got["level_idc"]) == (prof, lev)
    assert (got["width"], got["height"]) == (width, height)
    depth = (12 if (prof == 2 and twelve) else 10) if hbd else 8
    assert got["codec_string"] == (
        f"av01.{prof}.{lev:02d}{'H' if tier else 'M'}.{depth:02d}"
    )


@SETTINGS
@given(
    profile=st.integers(1, 5),
    tier=st.integers(0, 1),
    level=st.integers(30, 250),  # +delta must stay in the u8 hvcC field
    width=st.integers(16, 4096),
    height=st.integers(16, 4096),
    head_level_delta=st.integers(0, 3),
    dim_lie=st.integers(0, 32),
)
def test_hevc_cross_check_bits_track_the_lies(
    profile, tier, level, width, height, head_level_delta, dim_lie
):
    """dims_match/record_match must be exactly (lie == 0) for any
    combination of container and record-head lies."""
    nal = H5.encode_hevc_sps(profile, tier, level, width, height)
    payload = M.encode_minimal_mp4(
        [4],
        hev1=(width + dim_lie, height, profile, 0,
              tier, level + head_level_delta),
        hev1_sps=(nal,),
    )
    r = M.parse_hevc_sps_cross_check(payload)
    assert r["dims_match"] is (dim_lie == 0)
    assert r["record_match"] is (head_level_delta == 0)
    assert (r["sps_width"], r["sps_height"]) == (width, height)
