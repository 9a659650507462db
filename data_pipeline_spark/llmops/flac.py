"""Real FLAC codec (encode + decode), stdlib + numpy only.

Implements the lossless subset a data pipeline meets in practice for
8/16/24-bit PCM: STREAMINFO metadata, fixed-blocksize frames, independent
channels AND all three stereo-decorrelation assignments (left/side,
right/side, mid/side), constant / verbatim / fixed-predictor (orders
0-4) / LPC (orders 1-8 on encode, 1-32 on decode) subframes with
Rice-coded residuals (escape partitions included), CRC-8 frame headers,
CRC-16 frame footers and the STREAMINFO MD5 integrity check over the
decoded PCM.  The encoder picks per block among constant/verbatim/
fixed/LPC by exact bit cost — fixed order by minimal summed |residual|,
LPC by Levinson-Durbin over the block autocorrelation with 12-bit
quantized coefficients — and, for stereo input, among the four channel
assignments by exact summed subframe cost, the same decision shape as
libFLAC's presets (public spec: https://xiph.org/flac/format.html; no
code consulted).  Prediction is exact integer arithmetic (sum >> shift)
and the stereo transforms are exactly invertible (side = l - r carries
17 bits; mid = (l + r) >> 1 recovers the dropped LSB from side's
parity), so every path is lossless.

Every spec sample width decodes natively (8/12/16/20/24/32-bit; 12- and
20-bit ride 2- and 3-byte PCM containers with range checks); the
remaining NotImplementedError seam into soundfile/ffmpeg
(llmops.multimodal.decode_audio) is inconsistent streams (STREAMINFO vs
frame-header width mismatch).  Everything this encoder emits, this
decoder decodes — and vice versa for any fixed-blocksize FLAC file
(decode_flac(dtype="native") is bit-exact; the default int16 output
normalizes other widths by shift the way soundfile's dtype='int16'
does).

Scale note: like the PNG unfilter and the JPEG entropy coder, the Rice
coder is an inherently sequential bit loop — correctness-grade in this
container; production clusters drop soundfile into the same seam.  The
predictor/residual math and PCM (de)interleaving are numpy-vectorized.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _make_crc_table(poly: int, width: int) -> list:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _make_crc_table(_CRC8_POLY, 8)
_CRC16_TABLE = _make_crc_table(_CRC16_POLY, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, val: int, n: int) -> None:
        self.write(val & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.buf)

    @property
    def bit_length(self) -> int:
        return len(self.buf) * 8 + self.nbits

    def extend(self, other: "_BitWriter") -> None:
        """Append another writer's bit stream (used to splice the winning
        stereo-mode subframes without re-encoding them)."""
        for b in other.buf:
            self.write(b, 8)
        if other.nbits:
            self.write(other.acc, other.nbits)


class _BitReader:
    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.bitpos = byte_pos * 8

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated FLAC bitstream")
        first, last = self.bitpos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        val = (chunk >> (last * 8 - end)) & ((1 << n) - 1)
        self.bitpos = end
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        nbits = len(self.data) * 8
        while True:
            if self.bitpos >= nbits:
                raise ValueError("truncated FLAC bitstream (unary)")
            rem = 8 - (self.bitpos & 7)
            window = self.data[self.bitpos >> 3] & ((1 << rem) - 1)
            if window == 0:
                q += rem
                self.bitpos += rem
                continue
            lead = rem - window.bit_length()
            self.bitpos += lead + 1
            return q + lead

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    @property
    def byte_pos(self) -> int:
        return self.bitpos >> 3


def _utf8_encode_num(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding of frame numbers (raw patterns — not
    chr().encode(), which rejects the surrogate range)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << bits):
            cont = [0x80 | ((n >> (6 * i)) & 0x3F) for i in range(nbytes - 1)]
            lead_payload = n >> (6 * (nbytes - 1))
            lead = ((0xFF << (8 - nbytes)) & 0xFF) | lead_payload
            return bytes([lead] + cont[::-1])
    raise ValueError("frame number too large")


def _utf8_decode_num(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 8 - (b0 ^ 0xFF).bit_length()
    if nbytes < 2 or nbytes > 7:
        raise ValueError(f"bad coded-number lead byte {b0:#x}")
    val = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad coded-number continuation byte")
        val = (val << 6) | (c & 0x3F)
    return val


def _zigzag(res: np.ndarray) -> np.ndarray:
    return (res << 1) ^ (res >> 63)  # arithmetic shift: sign -> all ones


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int(np.sum(u >> k)) + len(u) * (k + 1)


def _write_residual(w: _BitWriter, res: np.ndarray) -> None:
    """Rice coding method 0, partition order 0 (one partition)."""
    w.write(0, 2)  # coding method: 4-bit rice parameters
    w.write(0, 4)  # partition order 0
    u = _zigzag(res.astype(np.int64))
    if len(u) == 0:
        w.write(0, 4)
        return
    costs = [(_rice_cost(u, k), k) for k in range(15)]
    best_cost, best_k = min(costs)
    raw_bits = max(1, int(np.abs(res).max()).bit_length() + 1) if len(res) else 1
    if best_cost > len(res) * raw_bits + 5:
        w.write(0xF, 4)  # escape: raw signed residuals
        w.write(raw_bits, 5)
        for v in res.tolist():
            w.write_signed(int(v), raw_bits)
        return
    w.write(best_k, 4)
    _emit_rice_vectorized(w, u, best_k)


def _emit_rice_vectorized(w: _BitWriter, u: np.ndarray, k: int) -> None:
    """Build the whole partition's rice bitstream as a numpy bit array
    (scatter the unary terminators and payload bits by cumulative offset,
    packbits, feed 64-bit words to the writer) — the per-SAMPLE Python
    loop becomes a per-64-bits loop, ~20x fewer iterations on typical
    parameters."""
    q = u >> k
    ends = np.cumsum(q + (1 + k))
    total_bits = int(ends[-1])
    bits = np.zeros(total_bits, np.uint8)
    term = ends - (k + 1)  # position of each field's terminating 1 bit
    bits[term] = 1
    if k:
        pos = term[:, None] + 1 + np.arange(k)[None, :]
        vals = (u[:, None] >> np.arange(k - 1, -1, -1)[None, :]) & 1
        bits[pos.ravel()] = vals.ravel().astype(np.uint8)
    pad = (-total_bits) % 64
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
    words = np.packbits(bits).view(">u8")
    for word in words[:-1].tolist():
        w.write(word, 64)
    tail_bits = total_bits - 64 * (len(words) - 1)
    w.write(int(words[-1]) >> (64 - tail_bits), tail_bits)


def _read_residual(r: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    porder = r.read(4)
    n_part = 1 << porder
    if blocksize % n_part:
        raise ValueError("blocksize not divisible by partition count")
    out: list = []
    for p in range(n_part):
        n = blocksize // n_part - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        k = r.read(param_bits)
        if k == escape:
            bits = r.read(5)
            out.extend(r.read_signed(bits) if bits else 0 for _ in range(n))
        else:
            # hot loop: inlined unary+payload reads on local variables
            # (method-call/attribute overhead dominates at ~1 call/bit)
            vals = []
            data, bitpos = r.data, r.bitpos
            nbits_total = len(data) * 8
            mask_k = (1 << k) - 1
            for _ in range(n):
                q = 0
                while True:
                    if bitpos >= nbits_total:
                        raise ValueError("truncated FLAC bitstream (unary)")
                    rem = 8 - (bitpos & 7)
                    window = data[bitpos >> 3] & ((1 << rem) - 1)
                    if window == 0:
                        q += rem
                        bitpos += rem
                        continue
                    lead = rem - window.bit_length()
                    bitpos += lead + 1
                    q += lead
                    break
                if k:
                    end = bitpos + k
                    if end > nbits_total:
                        raise ValueError("truncated FLAC bitstream")
                    first, last = bitpos >> 3, (end + 7) >> 3
                    chunk = int.from_bytes(data[first:last], "big")
                    u = (q << k) | ((chunk >> (last * 8 - end)) & mask_k)
                    bitpos = end
                else:
                    u = q
                vals.append((u >> 1) ^ -(u & 1))  # un-zigzag
            r.bitpos = bitpos
            out.extend(vals)
    return np.asarray(out, np.int64)


def _integrate_fixed(warmup: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-th difference: warmup samples + residuals -> samples."""
    w = warmup.astype(np.int64)
    seq = res.astype(np.int64)
    for m in range(order - 1, -1, -1):
        base = np.diff(w, n=m)[-1]
        seq = base + np.cumsum(seq)
    return np.concatenate([w, seq])


_LPC_MAX_ORDER = 8
_LPC_PRECISION = 12  # quantized coefficient bits (stored as precision-1)


def _lpc_analyze(s: np.ndarray, max_order: int) -> tuple | None:
    """Levinson-Durbin over the block's autocorrelation -> quantized
    integer predictor (qcoefs, shift) at the order with the smallest
    prediction-error estimate.  Returns None when the signal carries no
    usable correlation structure (zero energy / degenerate recursion)."""
    x = s.astype(np.float64)
    n = len(x)
    max_order = min(max_order, n - 1)
    if max_order < 1:
        return None
    r = np.array(
        [np.dot(x[: n - k], x[k:]) for k in range(max_order + 1)]
    )
    if r[0] <= 0:
        return None
    err = r[0]
    a = np.zeros(0)
    best = None  # (estimated error per sample, coefs)
    for m in range(1, max_order + 1):
        acc = r[m] - (a @ r[1:m][::-1] if m > 1 else 0.0)
        k = acc / err
        a = np.concatenate([a - k * a[::-1], [k]]) if m > 1 else np.array([k])
        err *= 1.0 - k * k
        if err <= 0:
            break
        # ~bits/sample of a Laplacian residual at this error level, plus
        # the header cost of carrying m more coefficients
        cost = n * 0.5 * np.log2(max(err / n, 1e-9)) + m * _LPC_PRECISION
        if best is None or cost < best[0]:
            best = (cost, a.copy())
    if best is None:
        return None
    coefs = best[1]
    cmax = float(np.max(np.abs(coefs)))
    if cmax == 0.0:
        return None
    # shift so the largest coefficient uses the full signed precision
    shift = _LPC_PRECISION - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    q = np.round(coefs * (1 << shift)).astype(np.int64)
    lim = 1 << (_LPC_PRECISION - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(s: np.ndarray, qcoefs: np.ndarray, shift: int) -> np.ndarray:
    """res[i] = s[i] - ((sum_j q[j] * s[i-1-j]) >> shift) for i >= order,
    vectorized as one slice-dot per coefficient; numpy's >> on signed
    int64 is the arithmetic shift the spec requires."""
    order = len(qcoefs)
    n = len(s)
    acc = np.zeros(n - order, np.int64)
    for j in range(order):
        acc += qcoefs[j] * s[order - 1 - j : n - 1 - j]
    return s[order:] - (acc >> shift)


def _write_subframe(w: _BitWriter, samples: np.ndarray, bps: int) -> None:
    s = samples.astype(np.int64)
    w.write(0, 1)  # zero pad bit
    if len(s) > 1 and bool(np.all(s == s[0])):
        w.write(0b000000, 6)  # constant
        w.write(0, 1)  # no wasted bits
        w.write_signed(int(s[0]), bps)
        return
    max_order = min(4, len(s) - 1) if len(s) > 1 else 0
    best_order, best_sum = 0, None
    for k in range(max_order + 1):
        cost = int(np.sum(np.abs(np.diff(s, n=k))))
        if best_sum is None or cost < best_sum:
            best_order, best_sum = k, cost
    res = np.diff(s, n=best_order)
    u = _zigzag(res)
    rice_est = min(_rice_cost(u, k) for k in range(15)) if len(u) else 0
    fixed_bits = rice_est + best_order * bps

    # LPC candidate: exact bit cost vs the best fixed predictor
    lpc = _lpc_analyze(s, _LPC_MAX_ORDER)
    lpc_plan = None
    if lpc is not None:
        qcoefs, shift = lpc
        lres = _lpc_residual(s, qcoefs, shift)
        lu = _zigzag(lres)
        lrice = min(_rice_cost(lu, k) for k in range(15)) if len(lu) else 0
        lpc_bits = (
            lrice + len(qcoefs) * bps + 4 + 5 + len(qcoefs) * _LPC_PRECISION
        )
        if lpc_bits < fixed_bits:
            lpc_plan = (qcoefs, shift, lres, lpc_bits)

    # verbatim wins when the residual stream would exceed raw samples
    if min(fixed_bits, lpc_plan[3] if lpc_plan else fixed_bits) >= len(s) * bps:
        w.write(0b000001, 6)  # verbatim
        w.write(0, 1)
        for v in s.tolist():
            w.write_signed(int(v), bps)
        return
    if lpc_plan is not None:
        qcoefs, shift, lres, _bits = lpc_plan
        order = len(qcoefs)
        w.write(0b100000 | (order - 1), 6)  # LPC, order-1 in low bits
        w.write(0, 1)
        for v in s[:order].tolist():
            w.write_signed(int(v), bps)
        w.write(_LPC_PRECISION - 1, 4)
        w.write_signed(shift, 5)
        for c in qcoefs.tolist():
            w.write_signed(int(c), _LPC_PRECISION)
        _write_residual(w, lres)
        return
    w.write(0b001000 | best_order, 6)  # fixed, order in low bits
    w.write(0, 1)
    for v in s[:best_order].tolist():
        w.write_signed(int(v), bps)
    _write_residual(w, res)


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe pad bit set")
    kind = r.read(6)
    wasted = 0
    if r.read(1):  # wasted-bits-per-sample flag: unary count follows
        wasted = r.read_unary() + 1
        bps -= wasted
    if kind == 0:
        out = np.full(blocksize, r.read_signed(bps), np.int64)
    elif kind == 1:
        out = np.asarray([r.read_signed(bps) for _ in range(blocksize)], np.int64)
    elif 8 <= kind <= 12:
        order = kind - 8
        warmup = np.asarray(
            [r.read_signed(bps) for _ in range(order)], np.int64
        )
        res = _read_residual(r, blocksize, order)
        out = _integrate_fixed(warmup, res, order) if order else res
    elif kind >= 32:
        order = (kind & 0b011111) + 1
        warmup = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4)
        if precision == 0b1111:
            raise ValueError("invalid LPC coefficient precision 15")
        precision += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        qcoefs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residual(r, blocksize, order).tolist()
        # native-int recurrence (python >> is the arithmetic shift the
        # spec requires; ~an order of magnitude faster than per-sample
        # numpy indexing for the sequential filter)
        y = list(warmup)
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += qcoefs[j] * y[i - 1 - j]
            y.append((acc >> shift) + res[i - order])
        out = np.asarray(y, np.int64)
    else:
        raise ValueError(f"reserved subframe type {kind:#08b}")
    return out << wasted if wasted else out


_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATE_FIXED = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                      6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                      11: 96000}
_BPS_FIXED = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


# frame-header channel-assignment codes for the stereo transforms
_STEREO_MODES = {"left_side": 0b1000, "right_side": 0b1001, "mid_side": 0b1010}
# frame-header sample-size codes for the supported widths
# frame-header 3-bit sample-size codes (0b000 = from STREAMINFO,
# 0b011 reserved); 12- and 20-bit ride in 2- and 3-byte PCM containers
_BPS_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110,
              32: 0b111}


def _pcm_to_samples(frames: bytes, bits: int) -> np.ndarray:
    """Packed little-endian signed PCM -> flat int64.  Container widths:
    8->1 byte, 12/16->2, 20/24->3, 32->4; sub-container widths (12/20)
    range-check so silent wraparound cannot corrupt a lossless path."""
    if bits == 8:
        return np.frombuffer(frames, np.int8).astype(np.int64)
    if bits in (12, 16):
        out = np.frombuffer(frames, "<i2").astype(np.int64)
    elif bits in (20, 24):
        if len(frames) % 3:
            raise ValueError(f"{bits}-bit PCM length not a multiple of 3")
        b = np.frombuffer(frames, np.uint8).astype(np.int64)
        u = b[0::3] | (b[1::3] << 8) | (b[2::3] << 16)
        out = u - ((u >> 23) << 24)  # sign-extend bit 23
    elif bits == 32:
        return np.frombuffer(frames, "<i4").astype(np.int64)
    else:
        raise ValueError(f"unsupported PCM width {bits}")
    if bits in (12, 20):
        lim = 1 << (bits - 1)
        if out.size and (out.min() < -lim or out.max() >= lim):
            raise ValueError(f"sample out of {bits}-bit range")
    return out


def _samples_to_pcm(arr: np.ndarray, bits: int) -> bytes:
    """Flat int64 samples -> packed little-endian signed PCM bytes."""
    if bits == 8:
        return arr.astype(np.int8).tobytes()
    if bits in (12, 16):
        return arr.astype("<i2").tobytes()
    if bits in (20, 24):
        u = arr & 0xFFFFFF
        out = np.empty((len(arr), 3), np.uint8)
        out[:, 0] = u & 0xFF
        out[:, 1] = (u >> 8) & 0xFF
        out[:, 2] = (u >> 16) & 0xFF
        return out.tobytes()
    if bits == 32:
        return arr.astype("<i4").tobytes()
    raise ValueError(f"unsupported PCM width {bits}")


def encode_flac(
    n_channels: int,
    sample_rate: int,
    frames: bytes,
    blocksize: int = 4096,
    stereo_mode: str | None = None,
    bits_per_sample: int = 16,
) -> bytes:
    """Interleaved little-endian signed PCM (any spec width
    8/12/16/20/24/32-bit; default 16) ->
    FLAC stream (fLaC magic + STREAMINFO with real MD5 + fixed-blocksize
    frames).  Stereo input picks per frame among independent / left-side
    / right-side / mid-side by exact summed subframe bit cost
    (``stereo_mode`` pins one: "independent", "left_side", "right_side",
    "mid_side").  Lossless: decode_flac inverts it byte-exactly."""
    if n_channels < 1 or n_channels > 8:
        raise ValueError(f"channels out of range: {n_channels}")
    if bits_per_sample not in _BPS_CODES:
        raise ValueError(f"unsupported bits_per_sample {bits_per_sample}")
    if stereo_mode is not None:
        if n_channels != 2:
            raise ValueError("stereo_mode requires exactly 2 channels")
        if stereo_mode != "independent" and stereo_mode not in _STEREO_MODES:
            raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    bps = bits_per_sample
    pcm = _pcm_to_samples(frames, bps)
    if len(pcm) % n_channels:
        raise ValueError("PCM length not a multiple of channel count")
    samples = pcm.reshape(-1, n_channels)
    total = len(samples)
    md5 = hashlib.md5(frames).digest()

    out = bytearray(b"fLaC")
    # STREAMINFO: last-metadata flag set, type 0, length 34
    info = _BitWriter()
    info.write(blocksize, 16)
    info.write(blocksize, 16)
    info.write(0, 24)  # min framesize unknown
    info.write(0, 24)  # max framesize unknown
    info.write(sample_rate, 20)
    info.write(n_channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(total, 36)
    out += struct.pack(">I", (1 << 31) | 34)[0:4]
    out += info.getvalue() + md5

    for fi, start in enumerate(range(0, max(total, 1), blocksize)):
        block = samples[start : start + blocksize]
        bs = len(block)
        if bs == 0:  # zero-sample stream still carries no frames
            break

        if n_channels == 2:
            left, right = block[:, 0], block[:, 1]
            side = left - right  # 17-bit signed
            mid = (left + right) >> 1  # arithmetic: floor, LSB rides side

            def _sub(sig: np.ndarray, bps: int) -> _BitWriter:
                sw = _BitWriter()
                _write_subframe(sw, sig, bps)
                return sw

            wl, wr = _sub(left, bps), _sub(right, bps)
            candidates = [(wl.bit_length + wr.bit_length, 0, 0b0001, (wl, wr))]
            if stereo_mode in (None, "left_side", "right_side", "mid_side"):
                ws = _sub(side, bps + 1)
                if stereo_mode in (None, "left_side"):
                    candidates.append(
                        (wl.bit_length + ws.bit_length, 1, 0b1000, (wl, ws))
                    )
                if stereo_mode in (None, "right_side"):
                    candidates.append(
                        (ws.bit_length + wr.bit_length, 2, 0b1001, (ws, wr))
                    )
                if stereo_mode in (None, "mid_side"):
                    wm = _sub(mid, bps)
                    candidates.append(
                        (wm.bit_length + ws.bit_length, 3, 0b1010, (wm, ws))
                    )
            if stereo_mode not in (None, "independent"):
                candidates = candidates[-1:]  # the pinned transform only
            # deterministic tie-break: cheaper first, then mode order
            _, _, chan_code, subframes = min(candidates)
        else:
            chan_code = n_channels - 1
            subframes = None

        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy (header carries frame #)
        hdr.write(0b0111, 4)  # blocksize: 16-bit value-1 at header end
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(chan_code, 4)  # channel assignment
        hdr.write(_BPS_CODES[bps], 3)  # sample size code
        hdr.write(0, 1)  # reserved
        head = bytearray(hdr.getvalue())
        head += _utf8_encode_num(fi)
        head += struct.pack(">H", bs - 1)
        head.append(_crc8(bytes(head)))

        w = _BitWriter()
        for b in head:
            w.write(b, 8)
        if subframes is not None:
            for sw in subframes:
                w.extend(sw)
        else:
            for ch in range(n_channels):
                _write_subframe(w, block[:, ch], bps)
        w.align()
        frame = w.getvalue()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def decode_flac(content: bytes, dtype: str = "int16") -> tuple:
    """FLAC stream -> (n_channels, sample_rate, interleaved int16 LE PCM).

    Decodes constant/verbatim/fixed/LPC subframes, independent channels
    and all three stereo-decorrelation assignments (left/side,
    right/side, mid/side) at 8/16/24 bits per sample; verifies frame
    CRC-8/CRC-16 and the STREAMINFO MD5 (over the NATIVE-width packing,
    before any conversion).  Non-16-bit streams normalize to int16 the
    way soundfile's dtype='int16' does — 8-bit shifts up, 24-bit shifts
    down (lossy by the discarded low byte, as any 16-bit sink must be).
    ``dtype="native"`` instead returns (channels, rate, native-width
    packed PCM bytes, bits_per_sample) losslessly.  All six spec widths
    (8/12/16/20/24/32-bit) decode; width-inconsistent streams raise
    NotImplementedError into the soundfile seam."""
    if dtype not in ("int16", "native"):
        raise ValueError(f"unsupported dtype {dtype!r}")
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        (hdr,) = struct.unpack_from(">I", content, pos)
        last, btype, length = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        body = content[pos + 4 : pos + 4 + length]
        if btype == 0:
            streaminfo = body
        pos += 4 + length
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing STREAMINFO")
    r = _BitReader(streaminfo)
    r.read(16)  # min blocksize
    r.read(16)  # max blocksize
    r.read(24)
    r.read(24)
    si_rate = r.read(20)
    si_channels = r.read(3) + 1
    si_bps = r.read(5) + 1
    total = r.read(36)
    si_md5 = streaminfo[18:34]
    if si_bps not in _BPS_CODES:
        raise NotImplementedError(
            f"{si_bps}-bit FLAC not in the 8/12/16/20/24/32-bit set — "
            "soundfile seam"
        )

    chunks: list = []
    got = 0
    while got < total and pos < len(content):
        fr = _BitReader(content, pos)
        sync = fr.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"lost frame sync at byte {pos}")
        fr.read(1)
        fr.read(1)  # blocking strategy (number semantics only)
        bs_code = fr.read(4)
        sr_code = fr.read(4)
        chan_code = fr.read(4)
        bps_code = fr.read(3)
        fr.read(1)
        _frame_no = _utf8_decode_num(fr)
        if bs_code == 0:
            raise ValueError("reserved blocksize code 0")
        elif bs_code == 6:
            bs = fr.read(8) + 1
        elif bs_code == 7:
            bs = fr.read(16) + 1
        else:
            bs = _BLOCKSIZE_FIXED[bs_code]
        if sr_code == 12:
            fr.read(8)
        elif sr_code in (13, 14):
            fr.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code 15")
        header_len = fr.byte_pos - pos
        expect_crc8 = fr.read(8)
        if _crc8(content[pos : pos + header_len]) != expect_crc8:
            raise ValueError(f"frame header CRC-8 mismatch at byte {pos}")
        if chan_code > 10:
            raise ValueError(f"reserved channel assignment {chan_code:#x}")
        n_ch = 2 if chan_code >= 8 else chan_code + 1
        bps = si_bps if bps_code == 0 else _BPS_FIXED.get(bps_code)
        if bps is None:
            raise ValueError(f"reserved sample size code {bps_code}")
        if bps != si_bps:
            raise NotImplementedError(
                "mixed-width FLAC frames — soundfile seam"
            )

        block = np.empty((bs, n_ch), np.int64)
        for ch in range(n_ch):
            # the side (difference) channel carries one extra bit
            extra = 1 if (
                (chan_code == 0b1000 and ch == 1)
                or (chan_code == 0b1001 and ch == 0)
                or (chan_code == 0b1010 and ch == 1)
            ) else 0
            block[:, ch] = _read_subframe(fr, bs, bps + extra)
        if chan_code == 0b1000:  # left/side: right = left - side
            block = np.stack([block[:, 0], block[:, 0] - block[:, 1]], axis=1)
        elif chan_code == 0b1001:  # right/side: left = right + side
            block = np.stack([block[:, 1] + block[:, 0], block[:, 1]], axis=1)
        elif chan_code == 0b1010:  # mid/side: side parity restores the LSB
            side = block[:, 1]
            lr_sum = (block[:, 0] << 1) | (side & 1)
            block = np.stack(
                [(lr_sum + side) >> 1, (lr_sum - side) >> 1], axis=1
            )
        fr.align()
        frame_end = fr.byte_pos
        expect_crc16 = fr.read(16)
        if _crc16(content[pos:frame_end]) != expect_crc16:
            raise ValueError(f"frame CRC-16 mismatch at byte {pos}")
        pos = fr.byte_pos
        chunks.append(block)
        got += bs

    pcm = (
        np.concatenate(chunks)[:total]
        if chunks
        else np.empty((0, si_channels), np.int64)
    )
    native = _samples_to_pcm(pcm.ravel(), si_bps)
    if si_md5 != b"\x00" * 16 and hashlib.md5(native).digest() != si_md5:
        raise ValueError("decoded PCM fails the STREAMINFO MD5 check")
    if dtype == "native":
        return si_channels, si_rate, native, si_bps
    if si_bps < 16:
        pcm = pcm << (16 - si_bps)
    elif si_bps > 16:
        pcm = pcm >> (si_bps - 16)  # arithmetic: soundfile dtype='int16'
    return si_channels, si_rate, pcm.astype("<i2").tobytes()
