"""MPEG audio (MP3) frame-header probing — the metadata layer of the
audio ingest family (ISO/IEC 11172-3 / 13818-3 frame headers).

Like ogg.probe and h264.parse_sps, this reads what a 100 TB audio
pipeline needs WITHOUT decoding payloads: MPEG version, layer, bitrate,
sample rate, channel mode, frame count and duration come from walking
the 4-byte frame headers (frame lengths are arithmetic in the header
fields).  ID3v2 prefixes (synchsafe length) and ID3v1 trailers are
skipped; a Xing/Info VBR tag in the first frame overrides the walked
frame count when present.  Payload decode (subband synthesis / IMDCT)
stays behind the documented soundfile/ffmpeg seam.

The writer emits structurally valid zero-payload frames so the parser
is pinned by coupled roundtrips plus hand-computed frame lengths.
"""

from __future__ import annotations

import struct

# bitrate tables in kbit/s, index 1-14 (0 = free, 15 = bad)
_BITRATES = {
    # (mpeg1?, layer): [...]
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320],
    (0, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256],
    (0, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
    (0, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
}

_RATES = {
    3: [44100, 48000, 32000],   # MPEG1  (version bits 11)
    2: [22050, 24000, 16000],   # MPEG2  (version bits 10)
    0: [11025, 12000, 8000],    # MPEG2.5 (version bits 00)
}

_VERSION_NAMES = {3: "1", 2: "2", 0: "2.5"}
_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _parse_header(hdr: int) -> dict | None:
    if (hdr >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (hdr >> 19) & 3
    layer_bits = (hdr >> 17) & 3
    if vbits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # bits 11->layer1, 10->2, 01->3
    br_idx = (hdr >> 12) & 0xF
    sr_idx = (hdr >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format unsupported; reserved rate invalid
    mpeg1 = vbits == 3
    bitrate = _BITRATES[(1 if mpeg1 else 0, layer)][br_idx] * 1000
    rate = _RATES[vbits][sr_idx]
    padding = (hdr >> 9) & 1
    mode = (hdr >> 6) & 3
    if layer == 1:
        frame_len = (12 * bitrate // rate + padding) * 4
        samples = 384
    else:
        # layer III halves samples/frame (and the length coefficient)
        # for MPEG2/2.5
        if layer == 3 and not mpeg1:
            frame_len = 72 * bitrate // rate + padding
            samples = 576
        else:
            frame_len = 144 * bitrate // rate + padding
            samples = 1152
    return {
        "version": _VERSION_NAMES[vbits],
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": rate,
        "channel_mode": _MODES[mode],
        "channels": 1 if mode == 3 else 2,
        "padding": padding,
        "frame_len": frame_len,
        "samples": samples,
    }


def build_frame(
    version: str = "1",
    layer: int = 3,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    padding: int = 0,
    mono: bool = False,
) -> bytes:
    """One structurally valid frame with a zero payload."""
    vbits = {"1": 3, "2": 2, "2.5": 0}[version]
    mpeg1 = vbits == 3
    br_idx = _BITRATES[(1 if mpeg1 else 0, layer)].index(bitrate_kbps)
    sr_idx = _RATES[vbits].index(sample_rate)
    hdr = (
        (0x7FF << 21) | (vbits << 19) | ((4 - layer) << 17) | (1 << 16)
        | (br_idx << 12) | (sr_idx << 10) | (padding << 9)
        | ((3 if mono else 0) << 6)
    )
    info = _parse_header(hdr)
    return struct.pack(">I", hdr) + bytes(info["frame_len"] - 4)


def _id3v2_size(content: bytes) -> int:
    if content[:3] != b"ID3" or len(content) < 10:
        return 0
    ss = content[6:10]
    if any(b & 0x80 for b in ss):
        return 0
    size = (ss[0] << 21) | (ss[1] << 14) | (ss[2] << 7) | ss[3]
    return 10 + size + (10 if content[5] & 0x10 else 0)  # + footer flag


def probe(content: bytes) -> dict:
    """Walk the frame chain -> stream metadata.  The first frame's
    header fixes version/layer/rate; later frames may vary bitrate (VBR)
    — duration sums per-frame samples.  A Xing/Info tag in the first
    frame's side-data region overrides the frame count when present."""
    pos = _id3v2_size(content)
    end = len(content)
    if end - pos >= 128 and content[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    first = None
    n_frames = 0
    total_samples = 0
    bitrate_sum = 0
    xing_frames = None
    while pos + 4 <= end:
        hdr = struct.unpack_from(">I", content, pos)[0]
        info = _parse_header(hdr)
        if info is None:
            if first is None:
                pos += 1  # resync until the first valid header
                continue
            break  # garbage after a valid chain ends the walk
        if first is None:
            first = info
            # Xing/Info tag: after the side-info block of frame 0
            side = (
                (17 if info["channels"] == 1 else 32)
                if info["version"] == "1"
                else (9 if info["channels"] == 1 else 17)
            )
            tag_off = pos + 4 + (side if info["layer"] == 3 else 0)
            tag = content[tag_off : tag_off + 8]
            if tag[:4] in (b"Xing", b"Info") and len(tag) == 8:
                (flags,) = struct.unpack_from(">I", content, tag_off + 4)
                if flags & 1:
                    (xing_frames,) = struct.unpack_from(
                        ">I", content, tag_off + 8
                    )
        elif (
            info["version"] != first["version"]
            or info["layer"] != first["layer"]
            or info["sample_rate"] != first["sample_rate"]
        ):
            break  # chain broken: a new stream or trailing junk
        n_frames += 1
        total_samples += info["samples"]
        bitrate_sum += info["bitrate"]
        pos += info["frame_len"]
    if first is None:
        raise ValueError("no MPEG audio frame found")
    frames = xing_frames if xing_frames is not None else n_frames
    duration = frames * first["samples"] / first["sample_rate"]
    return {
        "version": first["version"],
        "layer": first["layer"],
        "channels": first["channels"],
        "channel_mode": first["channel_mode"],
        "sample_rate": first["sample_rate"],
        "avg_bitrate": bitrate_sum // max(1, n_frames),
        "n_frames": frames,
        "duration_sec": duration,
        "vbr_tag": xing_frames is not None,
    }
