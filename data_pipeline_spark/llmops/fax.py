"""CCITT Group 3 / Group 4 fax codecs (ITU-T T.4 / T.6) for bilevel TIFF.

Implements the run-length coding layer TIFF compressions 2, 3 and 4 use:

- **Modified Huffman (MH / compression 2)** — every row coded 1-D with
  the T.4 white/black run-length tables, each row starting on a byte
  boundary (TIFF's "EncodingOptions": no EOL codes).
- **T.4 / G3 (compression 3)** — rows delimited by EOL codes
  (``000000000001``) with optional fill bits; pure 1-D, or mixed 2-D when
  T4Options bit 0 is set (each EOL followed by a tag bit, 1 = the next
  row is 1-D, 0 = 2-D).
- **T.6 / G4 (compression 4)** — pure 2-D coding against the previous
  row (the first reference line is all white), terminated by EOFB.

The 2-D modes (pass / horizontal / vertical ±3) follow the changing-
element algorithm of T.4 §4.2.1 exactly; rows are carried as transition
position arrays so b1/b2 lookups are binary searches rather than pixel
scans.  Row bitmaps use the fax convention 0 = white, 1 = black; the
TIFF layer maps them through PhotometricInterpretation.

Everything here is public-spec material (ITU-T T.4 tables 2/3, T.6 §2.2
mode codes).  Correctness strategy: the encoder and decoder are coupled
(roundtrip property tests over adversarial bitmaps), the code tables are
asserted prefix-free, and individual code words are pinned against the
published tables in tests/test_fax.py.

Reference parity: the Yelp reference has no image path at all — this
module supports the multimodal ingestion surface (llmops/multimodal.py)
the way data_pipeline/consumer.py supports the wire surface.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# T.4 run-length code tables: {run: (nbits, code)} — MSB-first code words.
# Terminating codes cover runs 0-63; makeup codes advance in units of 64
# up to 1728 per color, plus the shared extended makeups to 2560.
# ---------------------------------------------------------------------------

WHITE_TERM = {
    0: (8, 0b00110101), 1: (6, 0b000111), 2: (4, 0b0111), 3: (4, 0b1000),
    4: (4, 0b1011), 5: (4, 0b1100), 6: (4, 0b1110), 7: (4, 0b1111),
    8: (5, 0b10011), 9: (5, 0b10100), 10: (5, 0b00111), 11: (5, 0b01000),
    12: (6, 0b001000), 13: (6, 0b000011), 14: (6, 0b110100),
    15: (6, 0b110101), 16: (6, 0b101010), 17: (6, 0b101011),
    18: (7, 0b0100111), 19: (7, 0b0001100), 20: (7, 0b0001000),
    21: (7, 0b0010111), 22: (7, 0b0000011), 23: (7, 0b0000100),
    24: (7, 0b0101000), 25: (7, 0b0101011), 26: (7, 0b0010011),
    27: (7, 0b0100100), 28: (7, 0b0011000), 29: (8, 0b00000010),
    30: (8, 0b00000011), 31: (8, 0b00011010), 32: (8, 0b00011011),
    33: (8, 0b00010010), 34: (8, 0b00010011), 35: (8, 0b00010100),
    36: (8, 0b00010101), 37: (8, 0b00010110), 38: (8, 0b00010111),
    39: (8, 0b00101000), 40: (8, 0b00101001), 41: (8, 0b00101010),
    42: (8, 0b00101011), 43: (8, 0b00101100), 44: (8, 0b00101101),
    45: (8, 0b00000100), 46: (8, 0b00000101), 47: (8, 0b00001010),
    48: (8, 0b00001011), 49: (8, 0b01010010), 50: (8, 0b01010011),
    51: (8, 0b01010100), 52: (8, 0b01010101), 53: (8, 0b00100100),
    54: (8, 0b00100101), 55: (8, 0b01011000), 56: (8, 0b01011001),
    57: (8, 0b01011010), 58: (8, 0b01011011), 59: (8, 0b01001010),
    60: (8, 0b01001011), 61: (8, 0b00110010), 62: (8, 0b00110011),
    63: (8, 0b00110100),
}

WHITE_MAKEUP = {
    64: (5, 0b11011), 128: (5, 0b10010), 192: (6, 0b010111),
    256: (7, 0b0110111), 320: (8, 0b00110110), 384: (8, 0b00110111),
    448: (8, 0b01100100), 512: (8, 0b01100101), 576: (8, 0b01101000),
    640: (8, 0b01100111), 704: (9, 0b011001100), 768: (9, 0b011001101),
    832: (9, 0b011010010), 896: (9, 0b011010011), 960: (9, 0b011010100),
    1024: (9, 0b011010101), 1088: (9, 0b011010110),
    1152: (9, 0b011010111), 1216: (9, 0b011011000),
    1280: (9, 0b011011001), 1344: (9, 0b011011010),
    1408: (9, 0b011011011), 1472: (9, 0b010011000),
    1536: (9, 0b010011001), 1600: (9, 0b010011010), 1664: (6, 0b011000),
    1728: (9, 0b010011011),
}

BLACK_TERM = {
    0: (10, 0b0000110111), 1: (3, 0b010), 2: (2, 0b11), 3: (2, 0b10),
    4: (3, 0b011), 5: (4, 0b0011), 6: (4, 0b0010), 7: (5, 0b00011),
    8: (6, 0b000101), 9: (6, 0b000100), 10: (7, 0b0000100),
    11: (7, 0b0000101), 12: (7, 0b0000111), 13: (8, 0b00000100),
    14: (8, 0b00000111), 15: (9, 0b000011000), 16: (10, 0b0000010111),
    17: (10, 0b0000011000), 18: (10, 0b0000001000),
    19: (11, 0b00001100111), 20: (11, 0b00001101000),
    21: (11, 0b00001101100), 22: (11, 0b00000110111),
    23: (11, 0b00000101000), 24: (11, 0b00000010111),
    25: (11, 0b00000011000), 26: (12, 0b000011001010),
    27: (12, 0b000011001011), 28: (12, 0b000011001100),
    29: (12, 0b000011001101), 30: (12, 0b000001101000),
    31: (12, 0b000001101001), 32: (12, 0b000001101010),
    33: (12, 0b000001101011), 34: (12, 0b000011010010),
    35: (12, 0b000011010011), 36: (12, 0b000011010100),
    37: (12, 0b000011010101), 38: (12, 0b000011010110),
    39: (12, 0b000011010111), 40: (12, 0b000001101100),
    41: (12, 0b000001101101), 42: (12, 0b000011011010),
    43: (12, 0b000011011011), 44: (12, 0b000001010100),
    45: (12, 0b000001010101), 46: (12, 0b000001010110),
    47: (12, 0b000001010111), 48: (12, 0b000001100100),
    49: (12, 0b000001100101), 50: (12, 0b000001010010),
    51: (12, 0b000001010011), 52: (12, 0b000000100100),
    53: (12, 0b000000110111), 54: (12, 0b000000111000),
    55: (12, 0b000000100111), 56: (12, 0b000000101000),
    57: (12, 0b000001011000), 58: (12, 0b000001011001),
    59: (12, 0b000000101011), 60: (12, 0b000000101100),
    61: (12, 0b000001011010), 62: (12, 0b000001100110),
    63: (12, 0b000001100111),
}

BLACK_MAKEUP = {
    64: (10, 0b0000001111), 128: (12, 0b000011001000),
    192: (12, 0b000011001001), 256: (12, 0b000001011011),
    320: (12, 0b000000110011), 384: (12, 0b000000110100),
    448: (12, 0b000000110101), 512: (13, 0b0000001101100),
    576: (13, 0b0000001101101), 640: (13, 0b0000001001010),
    704: (13, 0b0000001001011), 768: (13, 0b0000001001100),
    832: (13, 0b0000001001101), 896: (13, 0b0000001110010),
    960: (13, 0b0000001110011), 1024: (13, 0b0000001110100),
    1088: (13, 0b0000001110101), 1152: (13, 0b0000001110110),
    1216: (13, 0b0000001110111), 1280: (13, 0b0000001010010),
    1344: (13, 0b0000001010011), 1408: (13, 0b0000001010100),
    1472: (13, 0b0000001010101), 1536: (13, 0b0000001011010),
    1600: (13, 0b0000001011011), 1664: (13, 0b0000001100100),
    1728: (13, 0b0000001100101),
}

# extended makeup codes (T.4 table 3b) are shared by both colors
EXT_MAKEUP = {
    1792: (11, 0b00000001000), 1856: (11, 0b00000001100),
    1920: (11, 0b00000001101), 1984: (12, 0b000000010010),
    2048: (12, 0b000000010011), 2112: (12, 0b000000010100),
    2176: (12, 0b000000010101), 2240: (12, 0b000000010110),
    2304: (12, 0b000000010111), 2368: (12, 0b000000011100),
    2432: (12, 0b000000011101), 2496: (12, 0b000000011110),
    2560: (12, 0b000000011111),
}

# 2-D mode codes (T.4 §4.2.1.3.7 / T.6): vertical ±3, horizontal, pass
_MODE_V0 = (1, 0b1)
_MODE_VR = {1: (3, 0b011), 2: (6, 0b000011), 3: (7, 0b0000011)}
_MODE_VL = {1: (3, 0b010), 2: (6, 0b000010), 3: (7, 0b0000010)}
_MODE_H = (3, 0b001)
_MODE_P = (4, 0b0001)

_EOL = (12, 0b000000000001)


def _decode_table(*tables: dict) -> dict:
    out: dict = {}
    for t in tables:
        for run, (nbits, code) in t.items():
            key = (nbits, code)
            if key in out:
                raise AssertionError(f"duplicate fax code {key}")
            out[key] = run
    return out

_WHITE_DECODE = _decode_table(WHITE_TERM, WHITE_MAKEUP, EXT_MAKEUP)
_BLACK_DECODE = _decode_table(BLACK_TERM, BLACK_MAKEUP, EXT_MAKEUP)
_MODE_DECODE = {
    _MODE_V0: ("V", 0), _MODE_H: ("H", 0), _MODE_P: ("P", 0),
    **{v: ("V", d) for d, v in _MODE_VR.items()},
    **{v: ("V", -d) for d, v in _MODE_VL.items()},
}


class _BitReader:
    """MSB-first bit reader over a bytes buffer."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    """MSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, nbits: int, code: int) -> None:
        self.acc = (self.acc << nbits) | code
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(8 - self.nbits, 0)

    def getvalue(self) -> bytes:
        w = _BitWriter.__new__(_BitWriter)
        w.out = bytearray(self.out)
        w.acc, w.nbits = self.acc, self.nbits
        w.align()
        return bytes(w.out)


def _read_code(bits: _BitReader, table: dict, what: str):
    code = 0
    for nbits in range(1, 15):
        code = (code << 1) | bits.read_bit()
        hit = table.get((nbits, code))
        if hit is not None:
            return hit
    raise ValueError(f"invalid fax {what} code")


def _read_run(bits: _BitReader, black: bool) -> int:
    """One complete run: any makeup codes followed by a terminating code."""
    table = _BLACK_DECODE if black else _WHITE_DECODE
    total = 0
    while True:
        run = _read_code(bits, table, "run")
        total += run
        if run < 64 or run % 64:  # terminating code ends the run
            return total
        # makeup (multiple of 64): a terminating code must follow


def _write_run(w: _BitWriter, run: int, black: bool) -> None:
    term = BLACK_TERM if black else WHITE_TERM
    makeup = BLACK_MAKEUP if black else WHITE_MAKEUP
    while run > 2623:  # 2560 + 63: longest single makeup+term step
        w.write(*EXT_MAKEUP[2560])
        run -= 2560
    if run >= 1792 and (run - run % 64) in EXT_MAKEUP:
        w.write(*EXT_MAKEUP[run - run % 64])
        run %= 64
    elif run >= 64:
        w.write(*makeup[run - run % 64])
        run %= 64
    w.write(*term[run])


# ---------------------------------------------------------------------------
# Row <-> transition-position representation.  A row of width w is the
# sorted array of positions where the color CHANGES, implicit white
# before position 0; transitions[even] are white->black, [odd] black->white.
# ---------------------------------------------------------------------------


def _row_to_transitions(row: np.ndarray) -> np.ndarray:
    padded = np.concatenate(([0], row.astype(np.int8)))
    return np.nonzero(np.diff(padded))[0].astype(np.int64)


def _transitions_to_row(trans, w: int) -> np.ndarray:
    row = np.zeros(w, np.uint8)
    t = list(trans) + [w]
    for i in range(0, len(t) - 1, 2):
        row[t[i] : t[i + 1]] = 1
    return row


def _decode_1d_row(bits: _BitReader, w: int) -> np.ndarray:
    row = np.zeros(w, np.uint8)
    pos = 0
    black = False
    while pos < w:
        run = _read_run(bits, black)
        if pos + run > w:
            raise ValueError("fax run overflows row width")
        if black:
            row[pos : pos + run] = 1
        pos += run
        black = not black
    return row


def _encode_1d_row(w_out: _BitWriter, row: np.ndarray) -> None:
    # alternating runs from the transition list; the first run may be a
    # zero-length white one — T.4 rows START with a white run code
    prev = 0
    runs = []
    for t in list(_row_to_transitions(row)) + [len(row)]:
        runs.append(t - prev)
        prev = t
    for i, run in enumerate(runs):
        _write_run(w_out, run, black=bool(i % 2))


def _b1_b2(ref_trans: np.ndarray, a0: int, black: bool) -> tuple[int, int]:
    """Changing elements b1/b2 on the reference line: b1 is the first
    transition strictly right of a0 whose 'new color' is opposite the
    current color (i.e. same color as the run a1 starts); b2 the next."""
    # transition index parity gives its new color: even -> black starts
    idx = int(np.searchsorted(ref_trans, a0, side="right"))
    # required parity: if current color is white, b1 must start black
    # (even index); if black, b1 starts white (odd index)
    want = 1 if black else 0
    if idx < len(ref_trans) and (idx % 2) != want:
        idx += 1
    b1 = int(ref_trans[idx]) if idx < len(ref_trans) else -1
    b2 = int(ref_trans[idx + 1]) if idx + 1 < len(ref_trans) else -1
    return b1, b2


def _decode_2d_row(bits: _BitReader, ref_trans: np.ndarray, w: int) -> np.ndarray:
    out: list[int] = []  # transitions of the new row
    a0 = -1  # imaginary changing element before the row
    black = False
    while True:
        start = 0 if a0 < 0 else a0
        if start >= w:
            break
        b1, b2 = _b1_b2(ref_trans, a0 if a0 >= 0 else -1, black)
        if b1 < 0:
            b1 = w
        if b2 < 0:
            b2 = w
        kind, delta = _read_code(bits, _MODE_DECODE, "mode")
        if kind == "P":
            a0 = b2  # pass: color continues through b2
        elif kind == "V":
            a1 = b1 + delta
            if a1 < 0 or a1 > w:
                raise ValueError("fax vertical mode out of range")
            out.append(a1)
            a0 = a1
            black = not black
        else:  # horizontal: two explicit runs from a0
            base = 0 if a0 < 0 else a0
            r1 = _read_run(bits, black)
            r2 = _read_run(bits, not black)
            a1 = base + r1
            a2 = a1 + r2
            if a2 > w:
                raise ValueError("fax horizontal runs overflow row")
            out.append(a1)
            out.append(a2)
            a0 = a2
        if a0 >= w:
            break
    return _transitions_to_row([t for t in out if t < w], w)


def _encode_2d_row(
    w_out: _BitWriter, ref_trans: np.ndarray, cur_trans: np.ndarray, w: int
) -> None:
    a0 = -1
    black = False
    cur = list(cur_trans) + [w, w]
    ci = 0  # index of a1 in cur
    while True:
        start = 0 if a0 < 0 else a0
        if start >= w:
            break
        a1 = cur[ci] if ci < len(cur) else w
        a2 = cur[ci + 1] if ci + 1 < len(cur) else w
        b1, b2 = _b1_b2(ref_trans, a0 if a0 >= 0 else -1, black)
        if b1 < 0:
            b1 = w
        if b2 < 0:
            b2 = w
        if b2 < a1:
            w_out.write(*_MODE_P)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            d = a1 - b1
            if d == 0:
                w_out.write(*_MODE_V0)
            elif d > 0:
                w_out.write(*_MODE_VR[d])
            else:
                w_out.write(*_MODE_VL[-d])
            a0 = a1
            ci += 1
            black = not black
        else:
            w_out.write(*_MODE_H)
            base = 0 if a0 < 0 else a0
            _write_run(w_out, a1 - base, black)
            _write_run(w_out, a2 - a1, not black)
            a0 = a2
            ci += 2
        if a0 >= w:
            break


def _skip_eol(bits: _BitReader) -> None:
    """Consume fill bits (zeros) up to and including the next EOL."""
    zeros = 0
    while True:
        if bits.bits_left() <= 0:
            raise ValueError("fax stream ended while seeking EOL")
        b = bits.read_bit()
        if b == 0:
            zeros += 1
        else:
            if zeros < 11:
                raise ValueError("bad fax EOL")
            return


# ---------------------------------------------------------------------------
# Public segment codecs, keyed by TIFF compression id
# ---------------------------------------------------------------------------


def decode_mh(data: bytes, w: int, h: int) -> np.ndarray:
    """Compression 2: MH rows, each starting on a byte boundary."""
    bits = _BitReader(data)
    rows = []
    for _ in range(h):
        rows.append(_decode_1d_row(bits, w))
        bits.align()
    return np.stack(rows)


def encode_mh(bitmap: np.ndarray) -> bytes:
    w = _BitWriter()
    for row in bitmap:
        _encode_1d_row(w, row)
        w.align()
    return w.getvalue()


def decode_g3(data: bytes, w: int, h: int, two_d: bool = False) -> np.ndarray:
    """Compression 3: EOL-delimited rows; 2-D mode adds a tag bit after
    each EOL (1 = next row 1-D coded, 0 = 2-D against the previous row)."""
    bits = _BitReader(data)
    rows: list[np.ndarray] = []
    for _ in range(h):
        _skip_eol(bits)
        if two_d:
            if bits.read_bit():
                row = _decode_1d_row(bits, w)
            else:
                if not rows:
                    raise ValueError("fax 2-D row with no reference line")
                row = _decode_2d_row(bits, _row_to_transitions(rows[-1]), w)
        else:
            row = _decode_1d_row(bits, w)
        rows.append(row)
    return np.stack(rows)


def encode_g3(bitmap: np.ndarray, two_d: bool = False, k: int = 2) -> bytes:
    """T.4 encoder; in 2-D mode every k-th row is 1-D (the spec's K
    parameter), the rest 2-D against the previous row."""
    w_out = _BitWriter()
    h, w = bitmap.shape
    for i in range(h):
        w_out.write(*_EOL)
        if two_d:
            one_d = i % k == 0
            w_out.write(1, 1 if one_d else 0)
            if one_d:
                _encode_1d_row(w_out, bitmap[i])
            else:
                _encode_2d_row(
                    w_out,
                    _row_to_transitions(bitmap[i - 1]),
                    _row_to_transitions(bitmap[i]),
                    w,
                )
        else:
            _encode_1d_row(w_out, bitmap[i])
    return w_out.getvalue()


def decode_g4(data: bytes, w: int, h: int) -> np.ndarray:
    """Compression 4 (T.6): every row 2-D; first reference line all
    white; the trailing EOFB is tolerated but not required."""
    bits = _BitReader(data)
    ref = np.zeros(0, np.int64)  # all-white reference line
    rows = []
    for _ in range(h):
        row = _decode_2d_row(bits, ref, w)
        rows.append(row)
        ref = _row_to_transitions(row)
    return np.stack(rows)


def encode_g4(bitmap: np.ndarray) -> bytes:
    w_out = _BitWriter()
    h, w = bitmap.shape
    ref = np.zeros(0, np.int64)
    for i in range(h):
        cur = _row_to_transitions(bitmap[i])
        _encode_2d_row(w_out, ref, cur, w)
        ref = cur
    w_out.write(*_EOL)
    w_out.write(*_EOL)  # EOFB
    return w_out.getvalue()
