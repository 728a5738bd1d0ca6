"""H.265 (HEVC) sequence-parameter-set parsing — bit-level, pure
Python, written against the public Rec. ITU-T H.265 / ISO/IEC 23008-2
spec (§7.3.2.2.1 seq_parameter_set_rbsp, §7.3.3 profile_tier_level,
§7.4.3.2.1 conformance-window semantics, Table 6-1 SubWidthC/SubHeightC)
and ISO/IEC 14496-15 §8.3.3.1 for the hvcC record that carries the NAL
units. Shares the bit machinery (BitReader/BitWriter, NAL
emulation-prevention escaping — §7.4.2 here, identical mechanics) with
operators/h264.py.

Why this exists: same audit as the H.264 twin — the stsd
VisualSampleEntry width/height are CONTAINER claims; the SPS inside the
hvcC record is the bitstream truth a decoder obeys (pic_width/height_in
_luma_samples minus the conformance window). HEVC is the other codec a
scraped-video corpus actually carries at volume, so the truth-vs-claim
pass needs both parsers. Frame DATA decode still honestly needs a codec
library (operators/multimodal.py boundary); the SPS is pure bit syntax.

HEVC sizes are NOT macroblock-quantized like H.264: pic_width_in_luma_
samples is the real luma width (constrained to minCbSize multiples),
and the conformance window offsets are in SubWidthC/SubHeightC units
(§7.4.3.2.1: the output picture is cropped by SubWidthC*offset luma
columns — no interlace factor, unlike H.264's crop-unit math).

Reference repo: n/a — extension surface beyond the reference's scope
(its pipeline has no media path; see SURVEY.md §2.9)."""

from __future__ import annotations

from bigdata_invoice_stream_analysis_spark.operators.h264 import (
    BitReader,
    BitWriter,
    insert_emulation_prevention,
    strip_emulation_prevention,
)

NAL_SPS = 33  # nal_unit_type SPS_NUT (Table 7-1)


def _profile_tier_level(r: BitReader, max_sub_layers_minus1: int) -> dict:
    """profile_tier_level(1, maxNumSubLayersMinus1) — §7.3.3. The
    general_* block is fixed-width (96 bits); sub-layer PTL blocks (rare
    outside temporal-scalability streams) are consumed to stay in bit
    sync but not returned."""
    space = r.u(2)
    tier = r.u(1)
    profile_idc = r.u(5)
    compat = r.u(32)
    progressive = r.u(1)
    interlaced = r.u(1)
    r.u(1)  # general_non_packed_constraint_flag
    r.u(1)  # general_frame_only_constraint_flag
    r.u(43)  # general_reserved_zero_43bits (constraint flags in RExt)
    r.u(1)  # general_inbld_flag / reserved
    level_idc = r.u(8)
    if max_sub_layers_minus1 > 0:
        prof_present = []
        lvl_present = []
        for _ in range(max_sub_layers_minus1):
            prof_present.append(r.u(1))
            lvl_present.append(r.u(1))
        for _ in range(max_sub_layers_minus1, 8):
            r.u(2)  # reserved_zero_2bits alignment
        for i in range(max_sub_layers_minus1):
            if prof_present[i]:
                r.u(88)  # sub_layer profile block (2+1+5+32+4+43+1)
            if lvl_present[i]:
                r.u(8)  # sub_layer_level_idc
    return {
        "profile_space": space,
        "tier_flag": tier,
        "profile_idc": profile_idc,
        "compat_flags": compat,
        "progressive_source_flag": progressive,
        "interlaced_source_flag": interlaced,
        "level_idc": level_idc,
    }


def parse_hevc_sps(nal: bytes) -> dict:
    """Walk seq_parameter_set_rbsp (§7.3.2.2.1) far enough to recover
    everything a curation pipeline filters on: the general
    profile_tier_level (profile space/tier/idc, the u32 compatibility
    flags, level), chroma_format_idc, pic_width/height_in_luma_samples
    (the CODED size), the conformance-window crop in luma pixels
    (offsets scaled by SubWidthC/SubHeightC per §7.4.3.2.1 / Table
    6-1), the output width/height a decoder emits, and the luma/chroma
    bit depths. ``nal`` is the full NAL unit (2-byte header §7.3.1.2 +
    escaped payload), the exact bytes an hvcC array nalUnit carries."""
    data = bytes(nal)
    if len(data) < 2:
        raise ValueError("HEVC NAL shorter than its 2-byte header")
    if data[0] & 0x80:
        raise ValueError("forbidden_zero_bit set in NAL header")
    nal_type = (data[0] >> 1) & 0x3F
    if nal_type != NAL_SPS:
        raise ValueError(f"not an HEVC SPS NAL (nal_unit_type {nal_type})")
    r = BitReader(strip_emulation_prevention(data[2:]))

    r.u(4)  # sps_video_parameter_set_id
    max_sub_layers_minus1 = r.u(3)
    r.u(1)  # sps_temporal_id_nesting_flag
    ptl = _profile_tier_level(r, max_sub_layers_minus1)
    sps_id = r.ue()
    chroma_format_idc = r.ue()
    separate_colour_plane = 0
    if chroma_format_idc == 3:
        separate_colour_plane = r.u(1)
    coded_width = r.ue()
    coded_height = r.ue()
    # Conformance window (§7.4.3.2.1): offsets are in units of
    # SubWidthC/SubHeightC luma samples (Table 6-1; 4:0:0 and
    # separate-planes decode as monochrome → units of 1).
    chroma_array_type = 0 if separate_colour_plane else chroma_format_idc
    sub_w = 2 if chroma_array_type in (1, 2) else 1
    sub_h = 2 if chroma_array_type == 1 else 1
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # conformance_window_flag
        crop_l = sub_w * r.ue()
        crop_r = sub_w * r.ue()
        crop_t = sub_h * r.ue()
        crop_b = sub_h * r.ue()
    bit_depth_luma = 8 + r.ue()
    bit_depth_chroma = 8 + r.ue()

    return {
        **ptl,
        "sps_id": sps_id,
        "max_sub_layers_minus1": max_sub_layers_minus1,
        "chroma_format_idc": chroma_format_idc,
        "bit_depth_luma": bit_depth_luma,
        "bit_depth_chroma": bit_depth_chroma,
        "coded_width": coded_width,
        "coded_height": coded_height,
        "crop_left": crop_l,
        "crop_right": crop_r,
        "crop_top": crop_t,
        "crop_bottom": crop_b,
        "width": coded_width - crop_l - crop_r,
        "height": coded_height - crop_t - crop_b,
    }


def encode_hevc_sps(
    profile_idc: int,
    tier: int,
    level_idc: int,
    width: int,
    height: int,
    crop_right_units: int = 0,
    crop_bottom_units: int = 0,
    chroma_format_idc: int = 1,
    compat_flags: int | None = None,
    sps_id: int = 0,
) -> bytes:
    """Encode a minimal but syntactically VALID HEVC SPS NAL (2-byte
    header + escaped RBSP) — the fixture twin of parse_hevc_sps, same
    spirit as h264.encode_sps. Only the prefix parse_hevc_sps walks is
    semantically meaningful; the suffix fields (log2 sizes, sub-layer
    ordering info) are written as spec-minimal constants so the RBSP
    stays decodable. Crop offsets are in CONFORMANCE-WINDOW UNITS (the
    raw ue values), so the luma-pixel crop follows the §7.4.3.2.1
    SubWidthC/SubHeightC scaling parse_hevc_sps must reproduce."""
    if compat_flags is None:
        # canonical writer habit: set this profile's own flag plus the
        # Main(1) flag; MSB-first flag order (flag[k] = bit 31-k), so
        # flag[profile_idc] is bit 31-profile_idc.
        compat_flags = (1 << (31 - profile_idc)) | (1 << 30)
    w = BitWriter()
    w.u(0, 4)  # sps_video_parameter_set_id
    w.u(0, 3)  # sps_max_sub_layers_minus1
    w.u(1, 1)  # sps_temporal_id_nesting_flag
    # profile_tier_level(1, 0)
    w.u(0, 2)  # general_profile_space
    w.u(tier & 1, 1)
    w.u(profile_idc, 5)
    w.u(compat_flags, 32)
    w.u(1, 1)  # general_progressive_source_flag
    w.u(0, 1)  # general_interlaced_source_flag
    w.u(0, 1)  # general_non_packed_constraint_flag
    w.u(1, 1)  # general_frame_only_constraint_flag
    w.u(0, 43)
    w.u(0, 1)
    w.u(level_idc, 8)
    w.ue(sps_id)
    w.ue(chroma_format_idc)
    if chroma_format_idc == 3:
        w.u(0, 1)  # separate_colour_plane_flag
    w.ue(width)
    w.ue(height)
    if crop_right_units or crop_bottom_units:
        w.u(1, 1)  # conformance_window_flag
        w.ue(0)
        w.ue(crop_right_units)
        w.ue(0)
        w.ue(crop_bottom_units)
    else:
        w.u(0, 1)
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    # --- suffix: spec-minimal constants so the RBSP stays valid ---
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    w.u(0, 1)  # sps_sub_layer_ordering_info_present_flag
    w.ue(1)  # sps_max_dec_pic_buffering_minus1[0]
    w.ue(0)  # sps_max_num_reorder_pics[0]
    w.ue(0)  # sps_max_latency_increase_plus1[0]
    w.ue(0)  # log2_min_luma_coding_block_size_minus3
    w.ue(3)  # log2_diff_max_min_luma_coding_block_size (8..64 CTB)
    w.ue(0)  # log2_min_luma_transform_block_size_minus2
    w.ue(3)  # log2_diff_max_min_luma_transform_block_size
    w.ue(0)  # max_transform_hierarchy_depth_inter
    w.ue(0)  # max_transform_hierarchy_depth_intra
    w.u(0, 1)  # scaling_list_enabled_flag
    w.u(0, 1)  # amp_enabled_flag
    w.u(0, 1)  # sample_adaptive_offset_enabled_flag
    w.u(0, 1)  # pcm_enabled_flag
    w.ue(0)  # num_short_term_ref_pic_sets
    w.u(0, 1)  # long_term_ref_pics_present_flag
    w.u(0, 1)  # sps_temporal_mvp_enabled_flag
    w.u(0, 1)  # strong_intra_smoothing_enabled_flag
    w.u(0, 1)  # vui_parameters_present_flag
    w.u(0, 1)  # sps_extension_present_flag
    rbsp = w.rbsp_trailing()
    # NAL header (§7.3.1.2): type 33, layer_id 0, temporal_id_plus1 1
    header = bytes([(NAL_SPS << 1) & 0x7E, 0x01])
    return header + insert_emulation_prevention(rbsp)
