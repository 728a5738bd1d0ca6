"""H.264 (AVC) sequence-parameter-set parsing — bit-level, pure Python,
written against the public Rec. ITU-T H.264 / ISO/IEC 14496-10 spec
(§7.3.2.1.1 seq_parameter_set_data, §7.4.2.1.1 semantics, §9.1
Exp-Golomb) and ISO/IEC 14496-15 §5.3.3 for the avcC record that
carries the NAL units.

Why this exists: the stsd VisualSampleEntry width/height are CONTAINER
claims, set by whatever muxed the file. The SPS inside the avcC record
is the BITSTREAM truth the decoder will actually obey — coded
picture size in macroblocks plus frame-cropping offsets, profile and
constraint flags, chroma format. Scraped video corpora routinely carry
containers that lie (re-muxed, anamorphic, rotated, or plain buggy
writers), and a curation pipeline that filters on resolution must
filter on the SPS, not the stsd. Parsing the SPS needs no codec
library — it is pure bit syntax — while frame DATA decode genuinely
does (the honest boundary documented in operators/mp4.py).

Exp-Golomb (§9.1): ue(v) = read leadingZeroBits until a 1 bit, then
that many suffix bits; value = 2^lz - 1 + suffix. se(v) maps the
unsigned code k to (-1)^(k+1) * ceil(k/2).

Reference repo: n/a — extension surface beyond the reference's scope
(its pipeline has no media path; see SURVEY.md §2.9)."""

from __future__ import annotations

# Profiles whose SPS carries the chroma/bit-depth/scaling-matrix block
# (§7.3.2.1.1: the "if( profile_idc == 100 || ... )" list).
_HIGH_PROFILES = frozenset(
    (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
)


def strip_emulation_prevention(rbsp_bytes: bytes) -> bytes:
    """NAL escaping (§7.4.1.1): inside a NAL unit payload, the encoder
    inserts emulation_prevention_three_byte 0x03 after any 0x00 0x00 so
    the start-code prefix 0x000001 cannot appear. Undo it: every
    0x00 0x00 0x03 followed by 0x00/0x01/0x02/0x03 drops the 0x03."""
    out = bytearray()
    zeros = 0
    i = 0
    data = bytes(rbsp_bytes)
    while i < len(data):
        b = data[i]
        if zeros >= 2 and b == 3 and i + 1 < len(data) and data[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def insert_emulation_prevention(rbsp: bytes) -> bytes:
    """Inverse of strip_emulation_prevention, for the fixture encoder:
    after two zero bytes, a byte <= 3 must be preceded by 0x03."""
    out = bytearray()
    zeros = 0
    for b in bytes(rbsp):
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class BitReader:
    """MSB-first bit reader over an (already unescaped) RBSP."""

    def __init__(self, data: bytes):
        self.data = bytes(data)
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.data):
                raise ValueError("SPS truncated mid-field")
            v = (v << 1) | ((self.data[byte_i] >> (7 - bit_i)) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        lz = 0
        while self.u(1) == 0:
            lz += 1
            if lz > 32:
                raise ValueError("Exp-Golomb code longer than 32 bits")
        return (1 << lz) - 1 + (self.u(lz) if lz else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class BitWriter:
    """MSB-first bit writer producing an RBSP (fixture encoder)."""

    def __init__(self):
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        k = value + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def se(self, value: int) -> None:
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def rbsp_trailing(self) -> bytes:
        """rbsp_stop_one_bit + alignment zeros (§7.3.2.11), then pack."""
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def _skip_scaling_list(r: BitReader, size: int) -> None:
    """scaling_list() (§7.3.2.1.1.1) — values are irrelevant to
    geometry but the bits must be consumed to stay in sync."""
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        last = nxt if nxt != 0 else last


def parse_sps(nal: bytes) -> dict:
    """Walk seq_parameter_set_data (§7.3.2.1.1) and return the fields a
    curation pipeline filters on, plus the derived true picture size:

    profile_idc, constraint_flags (the 6 constraint_setN bits as one
    byte, reserved bits zeroed), level_idc, chroma_format_idc,
    bit_depth_luma/chroma, log2_max_frame_num, pic_order_cnt_type,
    max_num_ref_frames, frame_mbs_only_flag, coded_width/coded_height
    (macroblock-aligned, pre-crop), crop_{left,right,top,bottom}
    (luma pixels, already scaled by the §7.4.2.1.1 crop units), and
    width/height — the display size a decoder actually outputs.

    ``nal`` is the full NAL unit (header byte + escaped payload), the
    exact bytes an avcC sequenceParameterSetNALUnit carries."""
    data = bytes(nal)
    if not data:
        raise ValueError("empty SPS NAL")
    if data[0] & 0x80:
        raise ValueError("forbidden_zero_bit set in NAL header")
    if data[0] & 0x1F != 7:
        raise ValueError(f"not an SPS NAL (nal_unit_type {data[0] & 0x1F})")
    r = BitReader(strip_emulation_prevention(data[1:]))

    profile_idc = r.u(8)
    constraint_flags = r.u(8) & 0xFC  # 6 flags + reserved_zero_2bits
    level_idc = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1  # implied 4:2:0 for non-high profiles (§7.4.2.1.1)
    separate_colour_plane = 0
    bit_depth_luma = bit_depth_chroma = 8
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = r.u(1)
        bit_depth_luma = 8 + r.ue()
        bit_depth_chroma = 8 + r.ue()
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):
                    _skip_scaling_list(r, 16 if i < 6 else 64)
    log2_max_frame_num = 4 + r.ue()
    pic_order_cnt_type = r.ue()
    if pic_order_cnt_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif pic_order_cnt_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):  # num_ref_frames_in_pic_order_cnt_cycle
            r.se()
    max_num_ref_frames = r.ue()
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag

    coded_width = pic_width_in_mbs * 16
    coded_height = (2 - frame_mbs_only) * pic_height_in_map_units * 16
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        # Crop units (§7.4.2.1.1): ChromaArrayType 0 → 1 / field
        # factor; else SubWidthC / SubHeightC × field factor.
        chroma_array_type = 0 if separate_colour_plane else chroma_format_idc
        if chroma_array_type == 0:
            unit_x, unit_y = 1, 2 - frame_mbs_only
        else:
            sub_w = 2 if chroma_format_idc in (1, 2) else 1
            sub_h = 2 if chroma_format_idc == 1 else 1
            unit_x, unit_y = sub_w, sub_h * (2 - frame_mbs_only)
        crop_l = unit_x * r.ue()
        crop_r = unit_x * r.ue()
        crop_t = unit_y * r.ue()
        crop_b = unit_y * r.ue()

    return {
        "profile_idc": profile_idc,
        "constraint_flags": constraint_flags,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "chroma_format_idc": chroma_format_idc,
        "bit_depth_luma": bit_depth_luma,
        "bit_depth_chroma": bit_depth_chroma,
        "log2_max_frame_num": log2_max_frame_num,
        "pic_order_cnt_type": pic_order_cnt_type,
        "max_num_ref_frames": max_num_ref_frames,
        "frame_mbs_only_flag": frame_mbs_only,
        "coded_width": coded_width,
        "coded_height": coded_height,
        "crop_left": crop_l,
        "crop_right": crop_r,
        "crop_top": crop_t,
        "crop_bottom": crop_b,
        "width": coded_width - crop_l - crop_r,
        "height": coded_height - crop_t - crop_b,
    }


def encode_sps(
    profile_idc: int,
    constraint_flags: int,
    level_idc: int,
    width_mbs: int,
    height_map_units: int,
    crop_right_units: int = 0,
    crop_bottom_units: int = 0,
    chroma_format_idc: int = 1,
    frame_mbs_only: int = 1,
    sps_id: int = 0,
) -> bytes:
    """Encode a minimal but syntactically VALID SPS NAL unit (header
    byte 0x67 + escaped RBSP) — the fixture twin of parse_sps, same
    spirit as encode_minimal_mp4. High profiles (e.g. 100) get the
    chroma/bit-depth block written explicitly; crop offsets are in
    CROP UNITS (the raw ue values), so the luma-pixel crop follows the
    §7.4.2.1.1 unit math that parse_sps must reproduce."""
    w = BitWriter()
    w.u(profile_idc, 8)
    w.u(constraint_flags & 0xFC, 8)
    w.u(level_idc, 8)
    w.ue(sps_id)
    if profile_idc in _HIGH_PROFILES:
        w.ue(chroma_format_idc)
        if chroma_format_idc == 3:
            w.u(0, 1)  # separate_colour_plane_flag
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(0, 1)  # qpprime_y_zero_transform_bypass_flag
        w.u(0, 1)  # seq_scaling_matrix_present_flag
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(width_mbs - 1)
    w.ue(height_map_units - 1)
    w.u(frame_mbs_only, 1)
    if not frame_mbs_only:
        w.u(0, 1)  # mb_adaptive_frame_field_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    if crop_right_units or crop_bottom_units:
        w.u(1, 1)  # frame_cropping_flag
        w.ue(0)
        w.ue(crop_right_units)
        w.ue(0)
        w.ue(crop_bottom_units)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    rbsp = w.rbsp_trailing()
    # NAL header: forbidden 0, nal_ref_idc 3, nal_unit_type 7 (SPS)
    return bytes([0x67]) + insert_emulation_prevention(rbsp)
