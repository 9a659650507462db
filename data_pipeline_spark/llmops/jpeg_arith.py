"""Arithmetic-coded JPEG (SOF9/SOF10/SOF11, ITU T.81 Annexes D, F, G, H):
the QM binary arithmetic coder with adaptive context states, plus the
sequential, progressive and lossless statistical models — completing
native decode of EVERY non-hierarchical JPEG mode in this engine
(baseline SOF0, extended SOF1, progressive SOF2, lossless SOF3, and the
arithmetic trio SOF9/SOF10/SOF11; only the differential/hierarchical
modes SOF5-7/SOF13-15 remain seams).

Everything here is implemented from the PUBLIC ITU-T T.81 specification:
the 113-state probability estimation table is Table D.3 (plus the
non-adaptive "fixed" 114th state the AC sign decision uses), the coder
register discipline follows the Annex D flowcharts (CT=11 encoder bit
counter, byte output from C>>19 with 0x00-stuffing after 0xFF and carry
resolution over stacked 0xFF bytes, decoder INITDEC loading 15 bits ahead),
and the conditioning-context layouts are Annex F's: 49 DC bins per table
(5 previous-diff classes x {zero, sign, +mag, -mag} + shared magnitude
category/bit chains) and 245 AC bins (3 per coefficient index + low/high
spectral magnitude chains split at the Kx conditioning bound).

The encoder/decoder pair is roundtrip property-tested over adversarial
decision sequences (every state reachable) and differentially tested
against the Huffman path: both entropy-code the SAME quantized
coefficients, so decodes must be pixel-identical.  Foreign-stream interop
is untested in-sandbox (no arithmetic-capable reference decoder exists
here — PIL itself cannot read SOF9); arithmetic JPEGs are vanishingly rare
in the wild for the same historical-patent reason.

Reference parity: the reference pipeline treats images as opaque payload
bytes (data_pipeline/message.py:99-141 payload contract); the codec layer
exists so the multimodal columns are REAL, per SURVEY.md §2's multimodal
plumbing items.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Table D.3: Qe value and probability estimation state machine --------
# (Qe, Next-MPS state, Next-LPS state, MPS-exchange switch); index 113 is
# the non-adaptive equiprobable state used for AC coefficient signs.
_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 1), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    # index 113: fixed equiprobable, never adapts (AC sign decisions)
    (0x5A1D, 113, 113, 0),
)


class QMEncoder:
    """T.81 Annex D.1 encoder: 16-bit interval register A, code register C
    with CT=11 spacer bits, byte output from C>>19 with carry resolution
    over stacked 0xFF bytes and 0x00-stuffing after emitted 0xFF."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # pending output byte (-1 = none yet)
        self.sc = 0  # count of stacked 0xFF bytes awaiting carry resolution
        self.out = bytearray()

    def _byte_out(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry ripples into the buffered byte; stacked 0xFFs roll to 0x00
            if self.buffer >= 0:
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)  # carry made an 0xFF: stuff it
            for _ in range(self.sc):
                self.out.append(0x00)
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # defer: a later carry may turn this into 0x00
        else:
            if self.buffer >= 0:
                self.out.append(self.buffer)
            for _ in range(self.sc):
                self.out.append(0xFF)
                self.out.append(0x00)  # stuffing: 0xFF in data -> 0xFF00
            self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF

    def code(self, st: bytearray, i: int, bit: int) -> None:
        """Code one binary decision against context st[i] (bit 7 = MPS
        sense, bits 0-6 = estimation state index).  T.81 interval
        convention: the LPS subinterval [0, Qe) sits at the BOTTOM, so
        coding the MPS moves the code base up by Qe (CODEMPS/CODELPS,
        Figures D.3-D.4), with conditional exchange when the MPS
        subinterval has shrunk below Qe."""
        sv = st[i]
        mps = sv >> 7
        qe, nmps, nlps, sw = _QE[sv & 0x7F]
        self.a -= qe
        if bit == mps:
            if self.a & 0x8000:
                self.c += qe
                return  # no renormalization, no adaptation
            if self.a < qe:  # conditional exchange: MPS takes the bottom
                self.a = qe  # (larger) interval, C unchanged
            else:
                self.c += qe
            st[i] = (mps << 7) | nmps
        else:
            if self.a < qe:  # conditional exchange: LPS coded at top
                self.c += qe
            else:
                self.a = qe  # C unchanged: LPS keeps the bottom interval
            if sw:
                mps ^= 1
            st[i] = (mps << 7) | nlps
        while True:  # RENORME
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()
                self.ct = 8
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        """D.1.8 termination: set final bits to the smallest code value in
        the interval, clear trailing bits, drain buffer and stack."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        if t < self.c:
            t += 0x8000
        self.c = t << self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)  # carry made an 0xFF: stuff it
            for _ in range(self.sc):
                self.out.append(0x00)
        else:
            if self.buffer >= 0:
                self.out.append(self.buffer)
            for _ in range(self.sc):
                self.out.append(0xFF)
                self.out.append(0x00)
        self.sc = 0
        self.buffer = -1
        if self.c & 0x7FFF800:
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
        return bytes(self.out)


class QMDecoder:
    """T.81 Annex D.2 decoder: INITDEC loads 15 code bits ahead; BYTEIN
    supplies data bytes with the 0xFF00-unstuffing rule and feeds zeros
    once a marker is reached (legal in arithmetic scans — trailing zero
    bytes of the code stream may be elided by the encoder)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.marker_hit = False
        # load the first two code bytes into the Chigh window (bits 31-16,
        # the 16-bit scale the interval arithmetic compares against); CT=0
        # makes the first renormalization shift fetch the third byte into
        # the bits 15-8 staging position
        self.ct = 0
        self.c = (self._next_byte() << 24) | (self._next_byte() << 16)
        self.a = 0x10000

    def _next_byte(self) -> int:
        if self.marker_hit or self.pos >= len(self.data):
            return 0
        b = self.data[self.pos]
        self.pos += 1
        if b != 0xFF:
            return b
        while self.pos < len(self.data) and self.data[self.pos] == 0xFF:
            self.pos += 1  # fill bytes
        if self.pos < len(self.data) and self.data[self.pos] == 0x00:
            self.pos += 1
            return 0xFF  # stuffed data byte
        self.marker_hit = True  # real marker: zeros from here on
        return 0

    def _byte_in(self) -> None:
        self.c = (self.c + (self._next_byte() << 8)) & 0xFFFFFFFF
        self.ct = 8

    def decode(self, st: bytearray, i: int) -> int:
        """DECODE per Figure D.15 with MPS_/LPS_EXCHANGE (D.16/D.17):
        the bottom interval [0, Qe) is the LPS's unless conditional
        exchange is active, mirroring the encoder exactly."""
        sv = st[i]
        mps = sv >> 7
        qe, nmps, nlps, sw = _QE[sv & 0x7F]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # bottom interval: LPS unless exchanged
            if self.a < qe:
                bit = mps
                st[i] = (mps << 7) | nmps
            else:
                bit = mps ^ 1
                if sw:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return mps  # no renormalization, no adaptation
            # top interval: MPS unless exchanged
            if self.a < qe:
                bit = mps ^ 1
                if sw:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            else:
                bit = mps
                st[i] = (mps << 7) | nmps
        while True:  # RENORMD
            if self.ct == 0:
                self._byte_in()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return bit


# --- Annex F sequential statistical models -------------------------------
# DC statistics layout per conditioning table (49 bins): 5 previous-diff
# classes x (zero?, sign, +mag>1?, -mag>1?) at 0..19, shared magnitude
# category chain X1..X15 at 20..34, magnitude-bit bins at +14 from the
# terminating category context.  AC layout (245 bins): (EOB?, zero?,
# first-category) triples per coefficient index at 3*(k-1), low/high
# spectral magnitude chains at 189/217 split by the Kx conditioning bound.


def _code_dc(enc, st, ctx, diff, lo, hi):
    """Code one DC difference; returns the next conditioning class base."""
    if diff == 0:
        enc.code(st, ctx, 0)
        return 0
    enc.code(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.code(st, ctx + 1, sign)
    sz = (-diff if sign else diff) - 1
    stp = ctx + 2 + sign
    m = 0
    if sz:
        enc.code(st, stp, 1)
        m = 1
        v2 = sz
        stp = 20
        while v2 >> 1:
            v2 >>= 1
            enc.code(st, stp, 1)
            m <<= 1
            stp += 1
    enc.code(st, stp, 0)
    bits_ctx = stp + 14
    mm = m >> 1
    while mm:
        enc.code(st, bits_ctx, 1 if (sz & mm) else 0)
        mm >>= 1
    if m < lo:
        return 0
    if m > hi:
        return 12 + sign * 4
    return 4 + sign * 4


def _decode_dc(dec, st, ctx, lo, hi):
    """Decode one DC difference; returns (diff, next conditioning base)."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    stp = ctx + 2 + sign
    m = 0
    if dec.decode(st, stp):
        m = 1
        stp = 20
        while dec.decode(st, stp):
            m <<= 1
            stp += 1
            if m > 0x8000:
                raise ValueError("DC magnitude category overflow")
    v = m
    bits_ctx = stp + 14
    mm = m >> 1
    while mm:
        if dec.decode(st, bits_ctx):
            v |= mm
        mm >>= 1
    mag = v + 1
    if m < lo:
        nxt = 0
    elif m > hi:
        nxt = 12 + sign * 4
    else:
        nxt = 4 + sign * 4
    return (-mag if sign else mag), nxt


def _code_ac(enc, st, fixed, zz, kx, ss=1, se=63):
    """Code the AC coefficients of one zigzagged block (band ss..se; the
    progressive first-scan path passes point-transformed values and its
    spectral band, the sequential path the raw 1..63 band)."""
    ke = ss - 1
    for k in range(se, ss - 1, -1):
        if zz[k]:
            ke = k
            break
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        enc.code(st, base, 0)  # not end-of-block
        while zz[k] == 0:
            enc.code(st, base + 1, 0)
            k += 1
            base += 3
        enc.code(st, base + 1, 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        enc.code(fixed, 0, sign)  # fixed equiprobable, never adapts
        sz = (-v if sign else v) - 1
        stp = base + 2
        m = 0
        if sz:
            enc.code(st, stp, 1)
            m = 1
            v2 = sz
            if v2 >> 1:
                v2 >>= 1
                enc.code(st, stp, 1)  # 2nd category decision shares the bin
                m <<= 1
                stp = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.code(st, stp, 1)
                    m <<= 1
                    stp += 1
        enc.code(st, stp, 0)
        bits_ctx = stp + 14
        mm = m >> 1
        while mm:
            enc.code(st, bits_ctx, 1 if (sz & mm) else 0)
            mm >>= 1
        k += 1
    if ke < se:
        enc.code(st, 3 * (k - 1), 1)  # end-of-block


def _decode_ac(dec, st, fixed, kx, ss=1, se=63):
    """Decode one block's AC coefficients -> zigzag list of 64 ints
    (band ss..se; values carry no point transform — callers scale)."""
    zz = [0] * 64
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):
            break  # end-of-block
        while dec.decode(st, base + 1) == 0:
            k += 1
            base += 3
            if k > se:
                raise ValueError("AC coefficient index overflow")
        sign = dec.decode(fixed, 0)
        stp = base + 2
        m = 0
        if dec.decode(st, stp):
            m = 1
            if dec.decode(st, stp):
                m = 2
                stp = 189 if k <= kx else 217
                while dec.decode(st, stp):
                    m <<= 1
                    stp += 1
                    if m > 0x8000:
                        raise ValueError("AC magnitude category overflow")
        v = m
        bits_ctx = stp + 14
        mm = m >> 1
        while mm:
            if dec.decode(st, bits_ctx):
                v |= mm
            mm >>= 1
        mag = v + 1
        zz[k] = -mag if sign else mag
        k += 1
    return zz


# --- SOF9 stream assembly / parsing --------------------------------------

_DC_COND_DEFAULT = (0, 1)  # (L, U) per T.81 defaults
_AC_COND_DEFAULT = 5  # Kx


def encode_jpeg_arithmetic(
    w: int, h: int, rgb: bytes, quality: int = 90, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(w, h, top-down RGB) -> SOF9 arithmetic-coded JFIF bytes carrying
    the SAME quantized coefficients as the baseline Huffman encoder at
    the same (quality, subsampling) — the property the differential test
    pins: both decodes must be pixel-identical."""
    from data_pipeline_spark.llmops.multimodal import (
        _ZIGZAG,
        _jpeg_headers,
        _jpeg_plan,
    )

    samp, hmax, vmax, mcuy, mcux, qy, qc, coefs = _jpeg_plan(
        w, h, rgb, quality, subsampling, 8
    )
    ri = restart_interval
    dc_l, dc_u = _DC_COND_DEFAULT
    lo, hi = (1 << dc_l) >> 1, (1 << dc_u) >> 1
    kx = _AC_COND_DEFAULT

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(_jpeg_headers(w, h, samp, qy, qc, 0xFFC9, 8))
    # DAC conditioning: DC tables carry (U<<4)|L, AC tables carry Kx
    out += seg(
        0xFFCC,
        bytes(
            [0x00, (dc_u << 4) | dc_l, 0x01, (dc_u << 4) | dc_l,
             0x10, kx, 0x11, kx]
        ),
    )
    if ri:
        out += seg(0xFFDD, struct.pack(">H", ri))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    def fresh_stats():
        return (
            [bytearray(49), bytearray(49)],  # DC per conditioning table
            [bytearray(245), bytearray(245)],  # AC per conditioning table
            bytearray([113]),  # fixed equiprobable bin (AC signs)
        )

    enc = QMEncoder()
    dc_st, ac_st, fixed = fresh_stats()
    dc_ctx = [0, 0, 0]
    prev_dc = [0, 0, 0]
    seg_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if ri and mcu_i // ri != seg_i:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + (seg_i % 8)])
                enc = QMEncoder()
                dc_st, ac_st, fixed = fresh_stats()
                dc_ctx = [0, 0, 0]
                prev_dc = [0, 0, 0]
                seg_i = mcu_i // ri
            for ci, (sh, sv) in enumerate(samp):
                t = 0 if ci == 0 else 1
                for vy in range(sv):
                    for vx in range(sh):
                        zz = coefs[ci][my * sv + vy, mx * sh + vx].reshape(
                            64
                        )[_ZIGZAG]
                        diff = int(zz[0]) - prev_dc[ci]
                        prev_dc[ci] = int(zz[0])
                        dc_ctx[ci] = _code_dc(
                            enc, dc_st[t], dc_ctx[ci], diff, lo, hi
                        )
                        _code_ac(enc, ac_st[t], fixed, zz, kx)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_arithmetic(content: bytes) -> tuple[int, int, bytes]:
    """Sequential arithmetic-coded JPEG (SOF9) -> (w, h, top-down RGB).

    8-bit, single interleaved scan (1 or 3 components, integer-ratio
    sampling), restart intervals supported; progressive-arithmetic
    (SOF10) and 12-bit streams raise into the PIL seam like the other
    unsupported variants."""
    from data_pipeline_spark.llmops.multimodal import (
        _ZIGZAG,
        _jpeg_reconstruct,
    )

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    sof = None
    comps: list[tuple[int, int, int]] = []
    dc_cond = {0: _DC_COND_DEFAULT, 1: _DC_COND_DEFAULT}
    ac_cond = {0: _AC_COND_DEFAULT, 1: _AC_COND_DEFAULT}
    dri = 0
    scan = None
    scan_comps = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = struct.unpack_from(">H", content, pos)[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack_from(">H", content, pos + 2)
        payload = content[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                prec_id = payload[p]
                if prec_id >> 4:
                    raise NotImplementedError(
                        "12-bit arithmetic JPEG requires PIL on the "
                        "cluster image"
                    )
                q = np.zeros(64)
                for i, v in enumerate(payload[p + 1 : p + 65]):
                    q[_ZIGZAG[i]] = v
                qtables[prec_id & 0xF] = q.reshape(8, 8)
                p += 65
        elif marker == 0xFFC9:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit arithmetic JPEG")
            comps = [
                (payload[6 + 3 * i], payload[7 + 3 * i], payload[8 + 3 * i])
                for i in range(nc)
            ]
            sof = (fw, fh, nc)
        elif marker == 0xFFCA:
            # progressive arithmetic: own multi-scan accumulation path
            return decode_jpeg_arithmetic_progressive(content)
        elif marker == 0xFFCC:
            p = 0
            while p + 1 < len(payload):
                tc, tb = payload[p] >> 4, payload[p] & 0xF
                if tb > 1:
                    raise NotImplementedError("conditioning table id > 1")
                if tc == 0:
                    dc_cond[tb] = (payload[p + 1] & 0xF, payload[p + 1] >> 4)
                else:
                    ac_cond[tb] = payload[p + 1]
                p += 2
        elif marker == 0xFFDD:
            (dri,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xFFDA:
            ns = payload[0]
            scan_comps = [
                (
                    payload[1 + 2 * i],
                    payload[2 + 2 * i] >> 4,
                    payload[2 + 2 * i] & 0xF,
                )
                for i in range(ns)
            ]
            e = pos
            while e < len(content) - 1:
                if content[e] != 0xFF:
                    e += 1
                elif content[e + 1] == 0x00:
                    e += 2
                elif content[e + 1] == 0xFF:
                    e += 1
                elif 0xD0 <= content[e + 1] <= 0xD7:
                    e += 2
                else:
                    break
            scan = content[pos:e]
            pos = e
            break  # single-scan sequential
    if sof is None or scan is None:
        raise ValueError("arithmetic JPEG missing SOF9/SOS")
    fw, fh, nc = sof
    if len(scan_comps) != nc:
        raise NotImplementedError(
            "non-interleaved arithmetic JPEG scans require PIL"
        )

    sampling = {cid: (s >> 4, s & 0xF) for cid, s, _q in comps}
    hmax = max(sh for sh, _sv in sampling.values())
    vmax = max(sv for _sh, sv in sampling.values())
    for sh, sv in sampling.values():
        if sh < 1 or sv < 1 or hmax % sh or vmax % sv:
            raise NotImplementedError(
                f"non-integer sampling ratio {sh}x{sv} needs PIL"
            )
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    qsel = {cid: q for cid, _s, q in comps}

    # split the entropy stream into restart segments (RSTn markers are
    # top-level in arithmetic scans; 0xFF00 within a segment is stuffing)
    segments = []
    if dri:
        cur = bytearray()
        i = 0
        while i < len(scan):
            if (
                scan[i] == 0xFF
                and i + 1 < len(scan)
                and 0xD0 <= scan[i + 1] <= 0xD7
            ):
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
            else:
                cur.append(scan[i])
                i += 1
        segments.append(bytes(cur))
    else:
        segments = [scan]

    out_planes = []
    for cid, _dcs, _acs in scan_comps:
        sh, sv = sampling[cid]
        out_planes.append(np.zeros((mcuy * sv, mcux * sh, 8, 8), np.float64))

    n_mcu = mcuy * mcux
    seg_idx = -1
    dec = None
    dc_st = ac_st = fixed = None
    dc_ctx = prev_dc = None
    lohi = {
        t: (((1 << dc_l) >> 1), ((1 << dc_u) >> 1))
        for t, (dc_l, dc_u) in dc_cond.items()
    }
    for mcu_i in range(n_mcu):
        want_seg = mcu_i // dri if dri else 0
        if want_seg != seg_idx:
            seg_idx = want_seg
            if seg_idx >= len(segments):
                raise ValueError("arithmetic scan missing restart segment")
            dec = QMDecoder(segments[seg_idx])
            dc_st = [bytearray(49), bytearray(49)]
            ac_st = [bytearray(245), bytearray(245)]
            fixed = bytearray([113])
            dc_ctx = [0] * nc
            prev_dc = [0] * nc
        my, mx = mcu_i // mcux, mcu_i % mcux
        for ci, (cid, dcs, acs) in enumerate(scan_comps):
            sh, sv = sampling[cid]
            lo, hi = lohi[dcs]
            kx = ac_cond[acs]
            for vy in range(sv):
                for vx in range(sh):
                    diff, dc_ctx[ci] = _decode_dc(
                        dec, dc_st[dcs], dc_ctx[ci], lo, hi
                    )
                    prev_dc[ci] += diff
                    zz = _decode_ac(dec, ac_st[acs], fixed, kx)
                    zz[0] = prev_dc[ci]
                    block = np.zeros(64, np.float64)
                    block[_ZIGZAG] = zz
                    out_planes[ci][my * sv + vy, mx * sh + vx] = (
                        block.reshape(8, 8) * qtables[qsel[cid]]
                    )

    return _jpeg_reconstruct(
        fw, fh, nc, [cid for cid, _d, _a in scan_comps], out_planes,
        sampling, hmax, vmax, 8,
    )


def _code_ac_refine(enc, st, fixed, band, ah, al, ss, se):
    """Code one block's AC successive-approximation refinement (Annex
    G.2 / Figure G.10 mirror of the decoder walk): correction bits for
    history-nonzero coefficients, a significance decision per still-zero
    position, EOB decisions only at positions past the previous stage's
    end-of-block."""
    hist = [0] * 64
    cur = [0] * 64
    for k in range(ss, se + 1):
        v = int(band[k])
        a = -v if v < 0 else v
        hist[k] = a >> ah
        cur[k] = a >> al
    kex = ss - 1
    for k in range(se, ss - 1, -1):
        if hist[k]:
            kex = k
            break
    ke = ss - 1
    for k in range(se, ss - 1, -1):
        if cur[k]:
            ke = k
            break
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.code(st, base, 0)  # not end-of-block yet
        while True:
            if hist[k]:
                enc.code(st, base + 2, cur[k] & 1)
                break
            if cur[k]:
                enc.code(st, base + 1, 1)
                enc.code(fixed, 0, 1 if int(band[k]) < 0 else 0)
                break
            enc.code(st, base + 1, 0)
            base += 3
            k += 1
        k += 1
    if ke < se:
        enc.code(st, 3 * ke, 1)  # decoder's next outer check is at ke+1


def _decode_ac_refine(dec, st, fixed, coefs, ah, al, ss, se):
    """Refine one block's AC band in place (mirror of _code_ac_refine)."""
    p1 = 1 << al
    m1 = -p1
    kex = ss - 1
    for k in range(se, ss - 1, -1):
        if coefs[k]:
            kex = k
            break
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex and dec.decode(st, base):
            break  # end-of-block
        while True:
            if coefs[k]:
                if dec.decode(st, base + 2):
                    coefs[k] += m1 if coefs[k] < 0 else p1
                break
            if dec.decode(st, base + 1):
                coefs[k] = m1 if dec.decode(fixed, 0) else p1
                break
            base += 3
            k += 1
            if k > se:
                raise ValueError("AC refinement index overflow")
        k += 1


def encode_jpeg_arithmetic_progressive(
    w: int, h: int, rgb: bytes, quality: int = 90, subsampling: str = "444",
) -> bytes:
    """(w, h, top-down RGB) -> progressive arithmetic JFIF (SOF10) with
    the same 9-scan progression as the Huffman progressive encoder —
    interleaved DC first (Al=1) + refinement, per-component spectral AC
    first scans (Al=1) and AC refinements (Ah=1 -> Al=0) — carrying the
    SAME quantized coefficients, so decode must be pixel-identical to
    the baseline decode.  Statistics and the QM coder restart at every
    scan per T.81."""
    from data_pipeline_spark.llmops.multimodal import (
        _ZIGZAG,
        _jpeg_headers,
        _jpeg_plan,
    )

    samp, hmax, vmax, mcuy, mcux, qy, qc, coefs = _jpeg_plan(
        w, h, rgb, quality, subsampling, 8
    )
    zzc = [
        c.reshape(c.shape[0], c.shape[1], 64)[:, :, _ZIGZAG].astype(np.int64)
        for c in coefs
    ]
    tdims = []
    for sh, sv in samp:
        comp_h = -(-(h * sv) // vmax)
        comp_w = -(-(w * sh) // hmax)
        tdims.append((-(-comp_h // 8), -(-comp_w // 8)))
    dc_l, dc_u = _DC_COND_DEFAULT
    lo, hi = (1 << dc_l) >> 1, (1 << dc_u) >> 1
    kx = _AC_COND_DEFAULT

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(_jpeg_headers(w, h, samp, qy, qc, 0xFFCA, 8))
    out += seg(
        0xFFCC,
        bytes(
            [0x00, (dc_u << 4) | dc_l, 0x01, (dc_u << 4) | dc_l,
             0x10, kx, 0x11, kx]
        ),
    )

    all_comps = [(1, 0, 0), (2, 1, 1), (3, 1, 1)]
    scan_plan = [
        (all_comps, 0, 0, 0, 1),
        ([(1, 0, 0)], 1, 5, 0, 1),
        ([(1, 0, 0)], 6, 63, 0, 1),
        ([(2, 1, 1)], 1, 63, 0, 1),
        ([(3, 1, 1)], 1, 63, 0, 1),
        (all_comps, 0, 0, 1, 0),
        ([(1, 0, 0)], 1, 63, 1, 0),
        ([(2, 1, 1)], 1, 63, 1, 0),
        ([(3, 1, 1)], 1, 63, 1, 0),
    ]
    for sc, ss, se, ah, al in scan_plan:
        body = bytes([len(sc)])
        for cid, dcs, acs in sc:
            body += bytes([cid, dcs << 4 | acs])
        body += bytes([ss, se, ah << 4 | al])
        out += seg(0xFFDA, body)
        enc = QMEncoder()
        fixed = bytearray([113])
        if ss == 0 and ah == 0:  # DC first, interleaved
            dc_st = [bytearray(49), bytearray(49)]
            dc_ctx = {cid: 0 for cid, _d, _a in sc}
            prev = {cid: 0 for cid, _d, _a in sc}
            for my in range(mcuy):
                for mx in range(mcux):
                    for cid, dcs, _acs in sc:
                        ci = cid - 1
                        sh, sv = samp[ci]
                        for vy in range(sv):
                            for vx in range(sh):
                                v = int(
                                    zzc[ci][my * sv + vy, mx * sh + vx, 0]
                                ) >> al
                                dc_ctx[cid] = _code_dc(
                                    enc, dc_st[dcs], dc_ctx[cid],
                                    v - prev[cid], lo, hi,
                                )
                                prev[cid] = v
        elif ss == 0:  # DC refinement: one fixed-context bit per block
            for my in range(mcuy):
                for mx in range(mcux):
                    for cid, _dcs, _acs in sc:
                        ci = cid - 1
                        sh, sv = samp[ci]
                        for vy in range(sv):
                            for vx in range(sh):
                                bit = (
                                    int(
                                        zzc[ci][
                                            my * sv + vy, mx * sh + vx, 0
                                        ]
                                    ) >> al
                                ) & 1
                                enc.code(fixed, 0, bit)
        else:  # AC scans: single component over its true block raster
            (cid, _dcs, acs) = sc[0]
            ci = cid - 1
            ac_st = bytearray(245)
            tv, th = tdims[ci]
            for by in range(tv):
                for bx in range(th):
                    band = zzc[ci][by, bx]
                    if ah == 0:
                        scaled = [0] * 64
                        for k in range(ss, se + 1):
                            v = int(band[k])
                            a = (-v if v < 0 else v) >> al
                            scaled[k] = -a if v < 0 else a
                        _code_ac(enc, ac_st, fixed, scaled, kx, ss, se)
                    else:
                        _code_ac_refine(
                            enc, ac_st, fixed, band, ah, al, ss, se
                        )
        out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_arithmetic_progressive(content: bytes) -> tuple[int, int, bytes]:
    """Progressive arithmetic JPEG (SOF10) -> (w, h, top-down RGB):
    accumulates coefficients across DC/AC first and refinement scans
    (each with a fresh QM decoder and statistics, per T.81), then one
    dequantize + IDCT pass.  Restart intervals inside progressive
    arithmetic scans raise by name (not emitted by this encoder)."""
    from data_pipeline_spark.llmops.multimodal import (
        _ZIGZAG,
        _jpeg_reconstruct,
    )

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    sof = None
    comps: list[tuple[int, int, int]] = []
    dc_cond = {0: _DC_COND_DEFAULT, 1: _DC_COND_DEFAULT}
    ac_cond = {0: _AC_COND_DEFAULT, 1: _AC_COND_DEFAULT}
    dri = 0
    scans: list[tuple] = []
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = struct.unpack_from(">H", content, pos)[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack_from(">H", content, pos + 2)
        payload = content[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                prec_id = payload[p]
                if prec_id >> 4:
                    raise NotImplementedError(
                        "12-bit arithmetic JPEG requires PIL"
                    )
                q = np.zeros(64)
                for i, v in enumerate(payload[p + 1 : p + 65]):
                    q[_ZIGZAG[i]] = v
                qtables[prec_id & 0xF] = q.reshape(8, 8)
                p += 65
        elif marker == 0xFFCA:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit arithmetic JPEG")
            comps = [
                (payload[6 + 3 * i], payload[7 + 3 * i], payload[8 + 3 * i])
                for i in range(nc)
            ]
            sof = (fw, fh, nc)
        elif marker == 0xFFCC:
            p = 0
            while p + 1 < len(payload):
                tc, tb = payload[p] >> 4, payload[p] & 0xF
                if tb > 1:
                    raise NotImplementedError("conditioning table id > 1")
                if tc == 0:
                    dc_cond[tb] = (payload[p + 1] & 0xF, payload[p + 1] >> 4)
                else:
                    ac_cond[tb] = payload[p + 1]
                p += 2
        elif marker == 0xFFDD:
            (dri,) = struct.unpack_from(">H", payload, 0)
            if dri:
                raise NotImplementedError(
                    "restart intervals in progressive arithmetic JPEG"
                )
        elif marker == 0xFFDA:
            ns = payload[0]
            sc = [
                (
                    payload[1 + 2 * i],
                    payload[2 + 2 * i] >> 4,
                    payload[2 + 2 * i] & 0xF,
                )
                for i in range(ns)
            ]
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            e = pos
            while e < len(content) - 1:
                if content[e] != 0xFF:
                    e += 1
                elif content[e + 1] in (0x00, 0xFF):
                    e += 2 if content[e + 1] == 0x00 else 1
                else:
                    break
            scans.append(
                (sc, ss, se, ahal >> 4, ahal & 0xF, content[pos:e],
                 dict(dc_cond), dict(ac_cond))
            )
            pos = e
    if sof is None or not scans:
        raise ValueError("progressive arithmetic JPEG missing SOF10/SOS")
    fw, fh, nc = sof
    sampling = {cid: (s >> 4, s & 0xF) for cid, s, _q in comps}
    hmax = max(sh for sh, _sv in sampling.values())
    vmax = max(sv for _sh, sv in sampling.values())
    for sh, sv in sampling.values():
        if sh < 1 or sv < 1 or hmax % sh or vmax % sv:
            raise NotImplementedError(
                f"non-integer sampling ratio {sh}x{sv} needs PIL"
            )
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    qsel = {cid: q for cid, _s, q in comps}

    coef: dict = {}
    tdims: dict = {}
    for cid, (sh, sv) in sampling.items():
        coef[cid] = np.zeros((mcuy * sv, mcux * sh, 64), np.int64)
        comp_h = -(-(fh * sv) // vmax)
        comp_w = -(-(fw * sh) // hmax)
        tdims[cid] = (-(-comp_h // 8), -(-comp_w // 8))

    for sc, ss, se, ah, al, data, dcc, acc in scans:
        dec = QMDecoder(data)
        fixed = bytearray([113])
        if ss == 0 and ah == 0:  # DC first
            dc_st = [bytearray(49), bytearray(49)]
            dc_ctx = {cid: 0 for cid, _d, _a in sc}
            prev = {cid: 0 for cid, _d, _a in sc}

            def dc_units():
                if len(sc) > 1:
                    for my in range(mcuy):
                        for mx in range(mcux):
                            for cid, dcs, _acs in sc:
                                sh, sv = sampling[cid]
                                for vy in range(sv):
                                    for vx in range(sh):
                                        yield (
                                            cid, dcs,
                                            my * sv + vy, mx * sh + vx,
                                        )
                else:
                    cid, dcs, _acs = sc[0]
                    tv, th = tdims[cid]
                    for by in range(tv):
                        for bx in range(th):
                            yield (cid, dcs, by, bx)

            for cid, dcs, by, bx in dc_units():
                dc_l, dc_u = dcc[dcs]
                lo, hi = (1 << dc_l) >> 1, (1 << dc_u) >> 1
                diff, dc_ctx[cid] = _decode_dc(
                    dec, dc_st[dcs], dc_ctx[cid], lo, hi
                )
                prev[cid] += diff
                coef[cid][by, bx, 0] = prev[cid] << al
        elif ss == 0:  # DC refinement
            if len(sc) > 1:
                order = (
                    (cid, my * sv + vy, mx * sh + vx)
                    for my in range(mcuy)
                    for mx in range(mcux)
                    for cid, _d, _a in sc
                    for sh, sv in (sampling[cid],)
                    for vy in range(sv)
                    for vx in range(sh)
                )
            else:
                cid0 = sc[0][0]
                order = (
                    (cid0, by, bx)
                    for by in range(tdims[cid0][0])
                    for bx in range(tdims[cid0][1])
                )
            for cid, by, bx in order:
                if dec.decode(fixed, 0):
                    coef[cid][by, bx, 0] |= 1 << al
        else:  # AC scans: single component
            if len(sc) != 1:
                raise ValueError("progressive AC scan with multiple comps")
            cid, _dcs, acs = sc[0]
            kx = acc[acs]
            ac_st = bytearray(245)
            tv, th = tdims[cid]
            carr = coef[cid]
            for by in range(tv):
                for bx in range(th):
                    block = carr[by, bx]
                    if ah == 0:
                        zz = _decode_ac(dec, ac_st, fixed, kx, ss, se)
                        for k in range(ss, se + 1):
                            if zz[k]:
                                block[k] = zz[k] << al
                    else:
                        _decode_ac_refine(
                            dec, ac_st, fixed, block, ah, al, ss, se
                        )

    out_planes = []
    order = []
    for cid, _s, _q in comps:
        zz = coef[cid].astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, :, _ZIGZAG] = zz
        by, bx = nat.shape[0], nat.shape[1]
        out_planes.append(nat.reshape(by, bx, 8, 8) * qtables[qsel[cid]])
        order.append(cid)
    return _jpeg_reconstruct(
        fw, fh, nc, order, out_planes, sampling, hmax, vmax, 8
    )


# --- Lossless arithmetic JPEG (SOF11, Annex H + F) ------------------------
# Predictive sample coding entropy-coded with the QM coder.  Conditioning
# follows H.1.2's two-difference scheme: the causal neighbor differences
# Da = Ra - Rc and Db = Rc - Rb are each classified into five categories
# (zero / +-small (<=2) / +-large), giving 25 conditioning classes of
# four decision bins each, plus two magnitude category/bit chains selected
# by whether Db classified large — 158 statistics bins per component.
# The coupled pair is verified BYTE-EXACT by roundtrip (lossless coding
# has no error envelope: any mismatch is a codec bug); no SOF11 reference
# stream exists in-sandbox (or, practically, in the wild) to test foreign
# interop against, as with SOF9/SOF10.

_LL_CHAIN0 = 100  # magnitude chain for small-|Db| contexts
_LL_CHAIN1 = 129  # magnitude chain for large-|Db| contexts
_LL_STATS = 158


def _ll_classify(d: int) -> int:
    if d == 0:
        return 0
    if -2 <= d <= 2:
        return 1 if d > 0 else 2
    return 3 if d > 0 else 4


def _code_ll_diff(enc, st, base, chain, diff):
    if diff == 0:
        enc.code(st, base, 0)
        return
    enc.code(st, base, 1)
    sign = 1 if diff < 0 else 0
    enc.code(st, base + 1, sign)
    sz = (-diff if sign else diff) - 1
    stp = base + 2 + sign
    m = 0
    if sz:
        enc.code(st, stp, 1)
        m = 1
        v2 = sz
        stp = chain
        while v2 >> 1:
            v2 >>= 1
            enc.code(st, stp, 1)
            m <<= 1
            stp += 1
    enc.code(st, stp, 0)
    bits_ctx = stp + 14
    mm = m >> 1
    while mm:
        enc.code(st, bits_ctx, 1 if (sz & mm) else 0)
        mm >>= 1


def _decode_ll_diff(dec, st, base, chain):
    if dec.decode(st, base) == 0:
        return 0
    sign = dec.decode(st, base + 1)
    stp = base + 2 + sign
    m = 0
    if dec.decode(st, stp):
        m = 1
        stp = chain
        while dec.decode(st, stp):
            m <<= 1
            stp += 1
            if m > 0x8000:
                raise ValueError("lossless magnitude overflow")
    v = m
    bits_ctx = stp + 14
    mm = m >> 1
    while mm:
        if dec.decode(st, bits_ctx):
            v |= mm
        mm >>= 1
    mag = v + 1
    return -mag if sign else mag


def _ll_ctx(a: int, b: int, c: int) -> tuple[int, int]:
    """(decision base, magnitude chain base) from the causal neighbors."""
    ca = _ll_classify(a - c)
    cb = _ll_classify(c - b)
    return (ca * 5 + cb) * 4, (_LL_CHAIN1 if cb >= 3 else _LL_CHAIN0)


def encode_jpeg_lossless_arithmetic(
    w: int, h: int, rgb: bytes, predictor: int = 4
) -> bytes:
    """(w, h, top-down RGB) -> lossless arithmetic JFIF (SOF11): the SOF3
    predictive pipeline entropy-coded by the QM coder — byte-exact by
    construction, typically smaller than the Huffman-coded SOF3 stream."""
    from data_pipeline_spark.llmops.multimodal import (
        _LL_INTERIOR,
        _ll_predictions,
    )

    if predictor not in _LL_INTERIOR:
        raise ValueError(f"lossless predictor must be 1-7, got {predictor}")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.int32)
    planes = [px[:, :, ci] for ci in range(3)]
    diffs = [p - _ll_predictions(p, predictor) for p in planes]
    # causal neighbors (zero-padded at borders, identically on both sides)
    abc = []
    for p in planes:
        a = np.zeros_like(p)
        b = np.zeros_like(p)
        c = np.zeros_like(p)
        a[:, 1:] = p[:, :-1]
        b[1:, :] = p[:-1, :]
        c[1:, 1:] = p[:-1, :-1]
        abc.append((a, b, c))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(
        0xFFCB,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"".join(struct.pack(">BBB", cid, 0x11, 0) for cid in (1, 2, 3)),
    )
    out += seg(0xFFCC, bytes([0x00, 0x10, 0x01, 0x10]))
    out += seg(
        0xFFDA,
        struct.pack(">B", 3)
        + b"".join(struct.pack(">BB", cid, 0x00) for cid in (1, 2, 3))
        + struct.pack(">BBB", predictor, 0, 0),
    )
    enc = QMEncoder()
    stats = [bytearray(_LL_STATS) for _ in range(3)]
    for y in range(h):
        for x in range(w):
            for ci in range(3):
                a, b, c = abc[ci]
                base, chain = _ll_ctx(
                    int(a[y, x]), int(b[y, x]), int(c[y, x])
                )
                _code_ll_diff(
                    enc, stats[ci], base, chain, int(diffs[ci][y, x])
                )
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_lossless_arithmetic(content: bytes) -> tuple[int, int, bytes]:
    """Lossless arithmetic JPEG (SOF11) -> (w, h, top-down RGB),
    byte-exact.  Causal decode: prediction and conditioning context are
    recomputed from already-decoded samples exactly as the encoder saw
    them."""
    from data_pipeline_spark.llmops.multimodal import _LL_INTERIOR

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    sof = None
    predictor = None
    scan = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = struct.unpack_from(">H", content, pos)[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack_from(">H", content, pos + 2)
        payload = content[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xFFCB:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8 or nc != 3:
                raise NotImplementedError(
                    f"{prec}-bit/{nc}-component lossless arithmetic JPEG"
                )
            sof = (fw, fh, nc)
        elif marker == 0xFFDA:
            ns = payload[0]
            predictor = payload[1 + 2 * ns]
            e = pos
            while e < len(content) - 1:
                if content[e] != 0xFF:
                    e += 1
                elif content[e + 1] in (0x00, 0xFF):
                    e += 2 if content[e + 1] == 0x00 else 1
                else:
                    break
            scan = content[pos:e]
            pos = e
            break
    if sof is None or scan is None or predictor not in _LL_INTERIOR:
        raise ValueError("lossless arithmetic JPEG missing SOF11/SOS")
    fw, fh, _nc = sof
    interior = _LL_INTERIOR[predictor]
    dec = QMDecoder(scan)
    stats = [bytearray(_LL_STATS) for _ in range(3)]
    out = np.zeros((fh, fw, 3), np.int32)
    for y in range(fh):
        for x in range(fw):
            for ci in range(3):
                a = int(out[y, x - 1, ci]) if x else 0
                b = int(out[y - 1, x, ci]) if y else 0
                c = int(out[y - 1, x - 1, ci]) if (x and y) else 0
                if y == 0 and x == 0:
                    pred = 128
                elif y == 0:
                    pred = a
                elif x == 0:
                    pred = b
                else:
                    pred = interior(a, b, c)
                base, chain = _ll_ctx(a, b, c)
                out[y, x, ci] = pred + _decode_ll_diff(
                    dec, stats[ci], base, chain
                )
    return fw, fh, out.astype(np.uint8).tobytes()

# --- Hierarchical differential frames (SOF13/14/15, Annex J + F/G/H) ------
# Per-frame entropy payloads for the hierarchical pipeline in
# multimodal.py: 4:4:4 components, block order (row, col, component).
# Differential frames code DC UNPREDICTED (the prediction is zero per
# J/F.1.1.5.1); the conditioning-class chaining is otherwise identical.
# As with SOF9/10/11, no arithmetic-capable reference decoder exists
# in-sandbox (or practically in the wild for SOF13-15), so the oracle is
# the coupled pair + bit-identical reconstruction vs the Huffman
# differential path (both transmit the same quantized coefficients).


def hier_code_dct_sequential(zzc: list, predict_dc: bool = False) -> bytes:
    """QM-coded scan body for a sequential DCT frame over zigzag
    coefficient arrays (by, bx, 64) — SOF13 (predict_dc=False) or a
    non-differential SOF9 base frame (predict_dc=True)."""
    enc = QMEncoder()
    dc_st = [bytearray(49), bytearray(49)]
    ac_st = [bytearray(245), bytearray(245)]
    fixed = bytearray([113])
    dc_l, dc_u = _DC_COND_DEFAULT
    lo, hi = (1 << dc_l) >> 1, (1 << dc_u) >> 1
    kx = _AC_COND_DEFAULT
    dc_ctx = [0] * len(zzc)
    prev = [0] * len(zzc)
    by, bx = zzc[0].shape[:2]
    for y in range(by):
        for x in range(bx):
            for ci in range(len(zzc)):
                t = 0 if ci == 0 else 1
                zz = zzc[ci][y, x]
                v = int(zz[0])
                diff = v - prev[ci] if predict_dc else v
                if predict_dc:
                    prev[ci] = v
                dc_ctx[ci] = _code_dc(
                    enc, dc_st[t], dc_ctx[ci], diff, lo, hi
                )
                _code_ac(enc, ac_st[t], fixed, zz, kx)
    return enc.flush()


def hier_decode_dct_sequential(
    data: bytes, by: int, bx: int, ncomp: int = 3, predict_dc: bool = False
) -> list:
    """Mirror of hier_code_dct_sequential -> list of (by, bx, 64) int64
    zigzag coefficient arrays."""
    dec = QMDecoder(data)
    dc_st = [bytearray(49), bytearray(49)]
    ac_st = [bytearray(245), bytearray(245)]
    fixed = bytearray([113])
    dc_l, dc_u = _DC_COND_DEFAULT
    lo, hi = (1 << dc_l) >> 1, (1 << dc_u) >> 1
    kx = _AC_COND_DEFAULT
    dc_ctx = [0] * ncomp
    prev = [0] * ncomp
    out = [np.zeros((by, bx, 64), np.int64) for _ in range(ncomp)]
    for y in range(by):
        for x in range(bx):
            for ci in range(ncomp):
                t = 0 if ci == 0 else 1
                diff, dc_ctx[ci] = _decode_dc(
                    dec, dc_st[t], dc_ctx[ci], lo, hi
                )
                zz = _decode_ac(dec, ac_st[t], fixed, kx)
                if predict_dc:
                    prev[ci] += diff
                    zz[0] = prev[ci]
                else:
                    zz[0] = diff
                out[ci][y, x] = zz
    return out


# the 8-scan differential progressive plan shared by coder and decoder:
# (component indices, Ss, Se, Ah, Al)
_HIER_PROG_PLAN = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
)


def hier_code_dct_progressive(zzc: list, predict_dc: bool = False) -> list:
    """PROGRESSIVE frame for the hierarchical pipeline: the plan's scans
    as [(comp_ids, ss, se, ah, al, body)], each with a fresh QM coder
    and statistics per T.81.  Differential frames (SOF14,
    predict_dc=False) code DC unpredicted; a non-differential base frame
    (SOF10 inside the pyramid) predicts DC in the point-transformed
    domain like any progressive frame."""
    dc_l, dc_u = _DC_COND_DEFAULT
    lo, hi = (1 << dc_l) >> 1, (1 << dc_u) >> 1
    kx = _AC_COND_DEFAULT
    by, bx = zzc[0].shape[:2]
    scans = []
    for comp_ids, ss, se, ah, al in _HIER_PROG_PLAN:
        enc = QMEncoder()
        fixed = bytearray([113])
        if ss == 0 and ah == 0:  # DC first, interleaved
            dc_st = [bytearray(49), bytearray(49)]
            dc_ctx = {ci: 0 for ci in comp_ids}
            prev = {ci: 0 for ci in comp_ids}
            for y in range(by):
                for x in range(bx):
                    for ci in comp_ids:
                        t = 0 if ci == 0 else 1
                        v = int(zzc[ci][y, x, 0]) >> al
                        if predict_dc:
                            d = v - prev[ci]
                            prev[ci] = v
                        else:
                            d = v
                        dc_ctx[ci] = _code_dc(
                            enc, dc_st[t], dc_ctx[ci], d, lo, hi
                        )
        elif ss == 0:  # DC refinement: fixed-context correction bits
            for y in range(by):
                for x in range(bx):
                    for ci in comp_ids:
                        enc.code(
                            fixed, 0, (int(zzc[ci][y, x, 0]) >> al) & 1
                        )
        else:
            (ci,) = comp_ids
            ac_st = bytearray(245)
            for y in range(by):
                for x in range(bx):
                    band = zzc[ci][y, x]
                    if ah == 0:
                        scaled = [0] * 64
                        for k in range(ss, se + 1):
                            v = int(band[k])
                            a = (-v if v < 0 else v) >> al
                            scaled[k] = -a if v < 0 else a
                        _code_ac(enc, ac_st, fixed, scaled, kx, ss, se)
                    else:
                        _code_ac_refine(
                            enc, ac_st, fixed, band, ah, al, ss, se
                        )
        scans.append((comp_ids, ss, se, ah, al, enc.flush()))
    return scans


def hier_decode_dct_progressive(
    scans: list, by: int, bx: int, ncomp: int = 3,
    predict_dc: bool = False,
) -> list:
    """Mirror of hier_code_dct_progressive: accumulate [(comp_ids, ss,
    se, ah, al, body)] scans -> (by, bx, 64) int64 coefficient arrays."""
    dc_l, dc_u = _DC_COND_DEFAULT
    lo, hi = (1 << dc_l) >> 1, (1 << dc_u) >> 1
    kx = _AC_COND_DEFAULT
    coef = [np.zeros((by, bx, 64), np.int64) for _ in range(ncomp)]
    for comp_ids, ss, se, ah, al, data in scans:
        dec = QMDecoder(data)
        fixed = bytearray([113])
        if ss == 0 and ah == 0:
            dc_st = [bytearray(49), bytearray(49)]
            dc_ctx = {ci: 0 for ci in comp_ids}
            prev = {ci: 0 for ci in comp_ids}
            for y in range(by):
                for x in range(bx):
                    for ci in comp_ids:
                        t = 0 if ci == 0 else 1
                        d, dc_ctx[ci] = _decode_dc(
                            dec, dc_st[t], dc_ctx[ci], lo, hi
                        )
                        if predict_dc:
                            prev[ci] += d
                            d = prev[ci]
                        coef[ci][y, x, 0] = d << al
        elif ss == 0:
            for y in range(by):
                for x in range(bx):
                    for ci in comp_ids:
                        coef[ci][y, x, 0] |= dec.decode(fixed, 0) << al
        else:
            (ci,) = comp_ids
            ac_st = bytearray(245)
            for y in range(by):
                for x in range(bx):
                    if ah == 0:
                        zz = _decode_ac(dec, ac_st, fixed, kx, ss, se)
                        for k in range(ss, se + 1):
                            if zz[k]:
                                coef[ci][y, x, k] = zz[k] << al
                    else:
                        band = coef[ci][y, x]
                        lst = band.tolist()
                        _decode_ac_refine(
                            dec, ac_st, fixed, lst, ah, al, ss, se
                        )
                        coef[ci][y, x] = lst
    return coef


def _ll_pred1(s, y: int, x: int) -> int:
    """H.1.2 predictor-1 with boundary rules: first sample 2^(P-1),
    rest of first line = left, first column = above."""
    if y == 0 and x == 0:
        return 128
    if y == 0:
        return int(s[0, x - 1])
    if x == 0:
        return int(s[y - 1, 0])
    return int(s[y, x - 1])


def hier_code_lossless(planes: list, differential: bool = True) -> bytes:
    """LOSSLESS frame for the hierarchical pipeline, components
    interleaved one sample per MCU, QM-coded with the Annex-H
    two-difference conditioning.  Differential frames (SOF15) code the
    signed difference samples directly and condition on the difference
    image's own causal neighbors (the reconstruction a non-differential
    frame would condition on does not exist here by definition).  A
    non-differential base frame (SOF11 inside the pyramid) codes
    predictor-1 residuals and conditions on the reconstructed sample
    neighbors."""
    enc = QMEncoder()
    sts = [bytearray(_LL_STATS) for _ in planes]
    h, w = planes[0].shape
    for y in range(h):
        for x in range(w):
            for ci, d in enumerate(planes):
                a = int(d[y, x - 1]) if x else 0
                b = int(d[y - 1, x]) if y else 0
                c = int(d[y - 1, x - 1]) if (x and y) else 0
                base, chain = _ll_ctx(a, b, c)
                v = int(d[y, x])
                if not differential:
                    v -= _ll_pred1(d, y, x)
                _code_ll_diff(enc, sts[ci], base, chain, v)
    return enc.flush()


def hier_decode_lossless(
    data: bytes, w: int, h: int, ncomp: int = 3, differential: bool = True
) -> list:
    """Mirror of hier_code_lossless -> list of (h, w) int32 planes
    (signed differences for SOF15, reconstructed samples for SOF11)."""
    dec = QMDecoder(data)
    sts = [bytearray(_LL_STATS) for _ in range(ncomp)]
    out = [np.zeros((h, w), np.int32) for _ in range(ncomp)]
    for y in range(h):
        for x in range(w):
            for ci in range(ncomp):
                d = out[ci]
                a = int(d[y, x - 1]) if x else 0
                b = int(d[y - 1, x]) if y else 0
                c = int(d[y - 1, x - 1]) if (x and y) else 0
                base, chain = _ll_ctx(a, b, c)
                v = _decode_ll_diff(dec, sts[ci], base, chain)
                if not differential:
                    v += _ll_pred1(d, y, x)
                d[y, x] = v
    return out
