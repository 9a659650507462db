"""H.264/AVC parameter-set parsing (ISO/IEC 14496-10 §7.3) and the MP4
``avcC`` configuration record (ISO/IEC 14496-15 §5.2.4).

A frame-sampling / metadata-extraction pipeline over 100 TB of video
does NOT decode H.264 payloads — it demuxes containers (multimodal.py's
MP4 sample tables) and reads the stream's self-description: profile,
level, chroma format and the coded dimensions all live in the sequence
parameter set inside the ``avcC`` box.  This module implements exactly
that layer natively: exp-Golomb bit coding, SPS/PPS parse, and the
AVCDecoderConfigurationRecord wrapper — plus the matching writers so the
parser is pinned by coupled roundtrips and hand-computed streams (no
H.264-capable reference decoder exists in this sandbox; slice payload
decode stays behind the documented ffmpeg seam).

Reference parity note: the Yelp reference (data_pipeline) has no video
surface; this extends the multimodal ingestion family the same way the
MP4 demuxer does.
"""

from __future__ import annotations


class _ExpGolombReader:
    """MSB-first bit reader with ue(v)/se(v) exp-Golomb decoding.

    Operates on RBSP bytes — call :func:`strip_emulation_prevention`
    first when reading from a raw NAL unit.
    """

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("exp-Golomb code too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _ExpGolombWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def u(self, n: int, v: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length()
        self.u(n - 1, 0)
        self.u(n, k)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self) -> bytes:
        """Close with the rbsp_stop_one_bit + alignment zeros."""
        self.u(1, 1)
        if self.nbits:
            self.u(8 - self.nbits, 0)
        return bytes(self.out)


def strip_emulation_prevention(nal: bytes) -> bytes:
    """Remove 00 00 03 emulation-prevention bytes (§7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in nal:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue  # drop the emulation_prevention_three_byte
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def add_emulation_prevention(rbsp: bytes) -> bytes:
    """Insert 00 00 03 before any 00 00 0x (x<=3) byte pair pattern."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


# profiles that carry the chroma/bit-depth/scaling-matrix extension block
_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
                  134, 135}

_PROFILE_NAMES = {
    66: "baseline", 77: "main", 88: "extended", 100: "high",
    110: "high10", 122: "high422", 244: "high444",
}


def _skip_scaling_list(r: _ExpGolombReader, size: int) -> None:
    last, nxt = 8, 8
    for _ in range(size):
        if nxt:
            nxt = (last + r.se() + 256) % 256
        if nxt:
            last = nxt


def parse_sps(nal: bytes) -> dict:
    """Parse a seq_parameter_set NAL unit (with or without the 1-byte
    NAL header; emulation-prevention bytes are stripped here)."""
    data = strip_emulation_prevention(nal)
    if data and (data[0] & 0x1F) == 7:  # NAL header present
        data = data[1:]
    r = _ExpGolombReader(data)
    profile_idc = r.u(8)
    constraints = r.u(8)
    level_idc = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1
    bit_depth_luma = bit_depth_chroma = 8
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        bit_depth_luma = r.ue() + 8
        bit_depth_chroma = r.ue() + 8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):
                    _skip_scaling_list(r, 16 if i < 6 else 64)
    log2_max_frame_num = r.ue() + 4
    pic_order_cnt_type = r.ue()
    if pic_order_cnt_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif pic_order_cnt_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    max_num_ref_frames = r.ue()
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # crop units (§7.4.2.1.1): chroma-format-dependent
    sub_w = 2 if chroma_format_idc in (1, 2) else 1
    sub_h = 2 if chroma_format_idc == 1 else 1
    unit_x = sub_w if chroma_format_idc else 1
    unit_y = sub_h * (2 - frame_mbs_only) if chroma_format_idc else (
        2 - frame_mbs_only
    )
    width = pic_width_in_mbs * 16 - unit_x * (crop_l + crop_r)
    height = (
        (2 - frame_mbs_only) * pic_height_in_map_units * 16
        - unit_y * (crop_t + crop_b)
    )
    return {
        "profile_idc": profile_idc,
        "profile": _PROFILE_NAMES.get(profile_idc, f"profile{profile_idc}"),
        "constraint_flags": constraints,
        "level_idc": level_idc,
        "level": f"{level_idc // 10}.{level_idc % 10}",
        "sps_id": sps_id,
        "chroma_format_idc": chroma_format_idc,
        "bit_depth_luma": bit_depth_luma,
        "bit_depth_chroma": bit_depth_chroma,
        "log2_max_frame_num": log2_max_frame_num,
        "pic_order_cnt_type": pic_order_cnt_type,
        "max_num_ref_frames": max_num_ref_frames,
        "frame_mbs_only": bool(frame_mbs_only),
        "width": width,
        "height": height,
    }


def encode_sps(
    width: int,
    height: int,
    profile_idc: int = 66,
    level_idc: int = 30,
    max_num_ref_frames: int = 1,
) -> bytes:
    """Emit a minimal, spec-valid SPS NAL (header byte included) for the
    given display dimensions — 16-aligned coding size + frame cropping,
    exactly what tiny real-world encoders produce."""
    w = _ExpGolombWriter()
    w.u(8, profile_idc)
    w.u(8, 0)  # constraint flags + reserved
    w.u(8, level_idc)
    w.ue(0)  # sps_id
    if profile_idc in _HIGH_PROFILES:
        w.ue(1)  # chroma_format_idc = 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(1, 0)  # transform bypass
        w.u(1, 0)  # no scaling matrix
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type = 2 (no extra fields)
    w.ue(max_num_ref_frames)
    w.u(1, 0)  # gaps_in_frame_num_value_allowed_flag
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    crop_r = (mb_w * 16 - width) // 2  # chroma crop units (4:2:0 -> /2)
    crop_b = (mb_h * 16 - height) // 2
    if (mb_w * 16 - width) % 2 or (mb_h * 16 - height) % 2:
        raise ValueError("odd crop needs chroma_format_idc-aware caller")
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(1, 0)
    w.u(1, 0)  # vui_parameters_present_flag
    rbsp = w.rbsp_trailing()
    return b"\x67" + add_emulation_prevention(rbsp)  # nal_ref_idc=3, type 7


def encode_pps(entropy_cabac: bool = False) -> bytes:
    w = _ExpGolombWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(1, 1 if entropy_cabac else 0)
    w.u(1, 0)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.u(1, 0)  # weighted_pred_flag
    w.u(2, 0)  # weighted_bipred_idc
    w.se(0)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.u(1, 0)  # deblocking_filter_control_present_flag
    w.u(1, 0)  # constrained_intra_pred_flag
    w.u(1, 0)  # redundant_pic_cnt_present_flag
    rbsp = w.rbsp_trailing()
    return b"\x68" + add_emulation_prevention(rbsp)  # type 8


def parse_pps(nal: bytes) -> dict:
    data = strip_emulation_prevention(nal)
    if data and (data[0] & 0x1F) == 8:
        data = data[1:]
    r = _ExpGolombReader(data)
    return {
        "pps_id": r.ue(),
        "sps_id": r.ue(),
        "entropy_coding": "cabac" if r.u(1) else "cavlc",
    }


def build_avcc(sps_list: list, pps_list: list) -> bytes:
    """AVCDecoderConfigurationRecord (the avcC box payload)."""
    import struct

    sps0 = strip_emulation_prevention(sps_list[0])
    if (sps0[0] & 0x1F) == 7:
        sps0 = sps0[1:]
    out = bytearray(
        [1, sps0[0], sps0[1], sps0[2], 0xFC | 3, 0xE0 | len(sps_list)]
    )
    for sps in sps_list:
        out += struct.pack(">H", len(sps)) + sps
    out.append(len(pps_list))
    for pps in pps_list:
        out += struct.pack(">H", len(pps)) + pps
    return bytes(out)


def parse_avcc(payload: bytes) -> dict:
    """Parse the avcC payload -> config fields + parsed first SPS/PPS."""
    import struct

    if not payload or payload[0] != 1:
        raise ValueError("bad AVCDecoderConfigurationRecord version")
    nalu_len = (payload[4] & 3) + 1
    n_sps = payload[5] & 0x1F
    pos = 6
    sps_units = []
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", payload, pos)
        sps_units.append(payload[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    n_pps = payload[pos]
    pos += 1
    pps_units = []
    for _ in range(n_pps):
        (ln,) = struct.unpack_from(">H", payload, pos)
        pps_units.append(payload[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    info = {
        "nalu_length_size": nalu_len,
        "num_sps": n_sps,
        "num_pps": n_pps,
    }
    if sps_units:
        info.update(parse_sps(sps_units[0]))
    if pps_units:
        info["entropy_coding"] = parse_pps(pps_units[0])["entropy_coding"]
    return info
