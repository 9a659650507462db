"""CCITT G3/G4 fax codec tests (data_pipeline_spark/llmops/fax.py) and
the bilevel TIFF integration (compressions 1/2/3/4).

Correctness strategy: the encoder/decoder pair roundtrips adversarial
bitmaps in all four coding modes, every code table is asserted
prefix-free (a transcription slip in the published tables almost always
breaks the prefix property or uniqueness), and individual code words +
two full streams are pinned against the published ITU-T T.4 tables by
hand.
"""

import struct

import numpy as np
import pytest

from data_pipeline_spark.llmops import fax, multimodal


def _prefix_free(table: dict) -> bool:
    codes = [format(c, f"0{n}b") for (n, c) in table]
    codes.sort()
    return all(
        not codes[i + 1].startswith(codes[i]) for i in range(len(codes) - 1)
    )


def test_fax_code_tables_prefix_free_and_pinned():
    # uniqueness is enforced at import (_decode_table raises on dupes);
    # prefix-freeness across each color's full run alphabet:
    assert _prefix_free(fax._WHITE_DECODE)
    assert _prefix_free(fax._BLACK_DECODE)
    assert _prefix_free(fax._MODE_DECODE)
    # every run 0..63 terminating and all makeups present per color
    assert sorted(fax.WHITE_TERM) == list(range(64))
    assert sorted(fax.BLACK_TERM) == list(range(64))
    assert sorted(fax.WHITE_MAKEUP) == [64 * i for i in range(1, 28)]
    assert sorted(fax.BLACK_MAKEUP) == [64 * i for i in range(1, 28)]
    assert sorted(fax.EXT_MAKEUP) == [1792 + 64 * i for i in range(13)]

    # spot pins against the published T.4 tables 2/3 (nbits, code)
    assert fax.WHITE_TERM[0] == (8, 0b00110101)
    assert fax.WHITE_TERM[1] == (6, 0b000111)
    assert fax.WHITE_TERM[63] == (8, 0b00110100)
    assert fax.WHITE_MAKEUP[64] == (5, 0b11011)
    assert fax.WHITE_MAKEUP[1664] == (6, 0b011000)
    assert fax.WHITE_MAKEUP[1728] == (9, 0b010011011)
    assert fax.BLACK_TERM[0] == (10, 0b0000110111)
    assert fax.BLACK_TERM[1] == (3, 0b010)
    assert fax.BLACK_TERM[2] == (2, 0b11)
    assert fax.BLACK_TERM[3] == (2, 0b10)
    assert fax.BLACK_MAKEUP[64] == (10, 0b0000001111)
    assert fax.EXT_MAKEUP[2560] == (12, 0b000000011111)
    # 2-D mode codes (T.4 §4.2.1.3.7)
    assert fax._MODE_V0 == (1, 0b1)
    assert fax._MODE_H == (3, 0b001)
    assert fax._MODE_P == (4, 0b0001)
    assert fax._MODE_VR[1] == (3, 0b011)
    assert fax._MODE_VL[3] == (7, 0b0000010)
    assert fax._EOL == (12, 0b000000000001)


def test_fax_hand_computed_streams():
    # MH row [0,0,1,1,1,0,0,0]: white2='0111' black3='10' white3='1000'
    # -> 0111 10 1000 + pad = 0x7A 0x00
    assert fax.decode_mh(b"\x7a\x00", 8, 1).tolist() == [
        [0, 0, 1, 1, 1, 0, 0, 0]
    ]
    assert fax.encode_mh(np.array([[0, 0, 1, 1, 1, 0, 0, 0]], np.uint8)) == (
        b"\x7a\x00"
    )
    # G4 all-white row of 8: V0 ('1') then EOFB (two EOLs):
    # 1|000000000001|000000000001|pad -> 80 08 00 80
    assert fax.encode_g4(np.zeros((1, 8), np.uint8)) == bytes(
        [0x80, 0x08, 0x00, 0x80]
    )
    assert (fax.decode_g4(bytes([0x80, 0x08, 0x00, 0x80]), 8, 1) == 0).all()


def _cases():
    rng = np.random.default_rng(0)
    cases = []
    for w, h in [(1, 1), (8, 1), (13, 7), (64, 3), (65, 5), (200, 9),
                 (3000, 2), (2624, 1)]:
        cases.append(rng.integers(0, 2, (h, w)).astype(np.uint8))
    cases.append(np.zeros((5, 100), np.uint8))
    cases.append(np.ones((5, 100), np.uint8))
    cases.append(np.tile([0, 1], 50)[None].repeat(4, 0).astype(np.uint8))
    chk = np.zeros((6, 64), np.uint8)
    chk[::2, ::2] = 1
    chk[1::2, 1::2] = 1
    cases.append(chk)
    big = np.zeros((3, 3000), np.uint8)  # >2560 run: chained ext makeups
    big[:, 2900:] = 1
    cases.append(big)
    return cases


def test_fax_roundtrip_all_modes_adversarial():
    for i, bm in enumerate(_cases()):
        h, w = bm.shape
        assert (fax.decode_mh(fax.encode_mh(bm), w, h) == bm).all(), i
        assert (fax.decode_g3(fax.encode_g3(bm), w, h) == bm).all(), i
        assert (
            fax.decode_g3(
                fax.encode_g3(bm, two_d=True, k=2), w, h, two_d=True
            )
            == bm
        ).all(), i
        assert (fax.decode_g4(fax.encode_g4(bm), w, h) == bm).all(), i


def test_fax_roundtrip_random_sweep():
    rng = np.random.default_rng(42)
    for _ in range(80):
        w = int(rng.integers(1, 400))
        h = int(rng.integers(1, 10))
        bm = (rng.random((h, w)) < rng.uniform(0.02, 0.98)).astype(np.uint8)
        assert (fax.decode_g4(fax.encode_g4(bm), w, h) == bm).all()
        assert (fax.decode_mh(fax.encode_mh(bm), w, h) == bm).all()
        assert (
            fax.decode_g3(
                fax.encode_g3(bm, two_d=True, k=4), w, h, two_d=True
            )
            == bm
        ).all()


def _tiff_le(entries_spec, trailer: bytes) -> bytes:
    n = len(entries_spec)
    blob = struct.pack("<2sHI", b"II", 42, 8) + struct.pack("<H", n)
    for tag, ttype, count, value in sorted(entries_spec):
        blob += struct.pack("<HHII", tag, ttype, count, value)
    blob += struct.pack("<I", 0)
    return blob + trailer


def _bilevel_tiff(
    segs, w, h, compression, photometric=0, rps=None, extra=()
):
    ents = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 1),
        (259, 3, 1, compression), (262, 3, 1, photometric),
        (277, 3, 1, 1),
    ] + list(extra)
    if rps is not None:
        ents.append((278, 4, 1, rps))
    n = len(ents) + 2  # + strip offsets/counts entries
    hdr = 8 + 2 + 12 * n + 4
    offs, pos = [], hdr
    for s in segs:
        offs.append(pos)
        pos += len(s)
    if len(segs) == 1:
        ents += [(273, 4, 1, offs[0]), (279, 4, 1, len(segs[0]))]
        tables = b""
    else:
        ents += [
            (273, 4, len(segs), pos),
            (279, 4, len(segs), pos + 4 * len(segs)),
        ]
        tables = struct.pack(f"<{len(segs)}I", *offs) + struct.pack(
            f"<{len(segs)}I", *[len(s) for s in segs]
        )
    return _tiff_le(ents, b"".join(segs) + tables)


def test_bilevel_tiff_decodes_all_compressions():
    """Compression 1 (packed rows), 2 (MH), 3 (G3 1-D and mixed 2-D) and
    4 (G4) all decode through decode_media; photometric 0 renders coded
    white as 255, photometric 1 inverts (BlackIsZero sample space)."""
    rng = np.random.default_rng(3)
    w, h = 21, 9
    bm = (rng.random((h, w)) < 0.4).astype(np.uint8)
    white0 = np.repeat((1 - bm[:, :, None]) * 255, 3, axis=2).tobytes()

    # raw packed rows, row-padded to byte boundary
    packed = np.packbits(bm, axis=1).tobytes()
    got = multimodal.decode_media(
        _bilevel_tiff([packed], w, h, 1), "tiff"
    )
    assert got == (w, h, white0)

    # MH / G3 1-D / G3 2-D (T4Options bit0) / G4, single strip
    for comp, seg, extra in [
        (2, fax.encode_mh(bm), ()),
        (3, fax.encode_g3(bm), ()),
        (3, fax.encode_g3(bm, two_d=True, k=2), ((292, 4, 1, 1),)),
        (4, fax.encode_g4(bm), ()),
    ]:
        got = multimodal.decode_media(
            _bilevel_tiff([seg], w, h, comp, extra=extra), "tiff"
        )
        assert got == (w, h, white0), comp

    # photometric 1: decoded bits are BlackIsZero samples -> inverted
    got = multimodal.decode_media(
        _bilevel_tiff([fax.encode_g4(bm)], w, h, 4, photometric=1), "tiff"
    )
    assert got == (w, h, np.repeat(bm[:, :, None] * 255, 3, 2).tobytes())

    # multi-strip G4: reference line resets all-white per strip
    rps = 4
    segs = [fax.encode_g4(bm[y0 : y0 + rps]) for y0 in range(0, h, rps)]
    got = multimodal.decode_media(
        _bilevel_tiff(segs, w, h, 4, rps=rps), "tiff"
    )
    assert got == (w, h, white0)

    # FillOrder 2 (LSB-first): per-byte bit reversal before decode
    g4 = fax.encode_g4(bm)
    rev = np.packbits(
        np.unpackbits(np.frombuffer(g4, np.uint8), bitorder="little")
    ).tobytes()
    got = multimodal.decode_media(
        _bilevel_tiff([rev], w, h, 4, extra=((266, 3, 1, 2),)), "tiff"
    )
    assert got == (w, h, white0)

    # seams: uncompressed-mode escapes and fax-on-8-bit raise
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(
            _bilevel_tiff([g4], w, h, 4, extra=((293, 4, 1, 2),)), "tiff"
        )
    bad = bytearray(_bilevel_tiff([g4], w, h, 4))
    for i in range(9):
        if struct.unpack_from("<H", bad, 10 + 12 * i)[0] == 258:
            struct.pack_into("<I", bad, 10 + 12 * i + 8, 8)
    with pytest.raises(ValueError):
        multimodal.decode_media(bytes(bad), "tiff")


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.integers(1, 200),
    st.integers(1, 6),
    st.integers(0, 2**32 - 1),
    st.floats(0.02, 0.98),
)
@settings(max_examples=60, deadline=None)
def test_fax_roundtrip_property(w, h, seed, density):
    """Property: any bitmap roundtrips byte-exactly through all four
    coding modes (hypothesis-shrunk on failure)."""
    rng = np.random.default_rng(seed)
    bm = (rng.random((h, w)) < density).astype(np.uint8)
    assert (fax.decode_mh(fax.encode_mh(bm), w, h) == bm).all()
    assert (fax.decode_g3(fax.encode_g3(bm), w, h) == bm).all()
    assert (
        fax.decode_g3(fax.encode_g3(bm, two_d=True, k=3), w, h, two_d=True)
        == bm
    ).all()
    assert (fax.decode_g4(fax.encode_g4(bm), w, h) == bm).all()
