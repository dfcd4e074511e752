"""FLAC codec — pure python + numpy, no external audio libraries:
the lossless audio format real speech/music corpora ship alongside
WAV. Written against the public FLAC format specification (RFC 9639
/ xiph.org).

Decodes: the fLaC stream header and metadata blocks (STREAMINFO
parsed, others skipped), frames with fixed AND variable blocking
strategies, every block-size/sample-rate/sample-size header encoding,
the UTF-8-style coded frame/sample number, CRC-8 header and CRC-16
frame checks (verified, loud on mismatch), channel assignments
independent / left-side / right-side / mid-side (with the side
channel's +1 bit depth), subframe types CONSTANT, VERBATIM, FIXED
(orders 0-4) and LPC (any order, quantized coefficients, signed
shift), wasted-bits shifts, and Rice-coded residuals in 2^n
partitions with both 4- and 5-bit parameter widths and the
escape-to-raw path. Sample sizes 8/12/16/20/24/32.

The encoder exists for the usual reason (``synthesize_flac`` →
``decode_media_real`` without binary fixtures): real Rice streams
(unary quotients, zigzag folding, per-partition parameters chosen
from the residual magnitudes, escape when raw is cheaper), real
FIXED and LPC prediction, real stereo decorrelation, and real CRCs,
so the decoder is exercised against genuinely entropy-coded frames.
FLAC is lossless, so a SQL oracle re-derives decoded sample
statistics exactly.
"""

from __future__ import annotations

import bisect
import hashlib
import struct

import numpy as np

# 4-bit sample-rate header table (Hz; None = from STREAMINFO or coded
# at the header end)
SAMPLE_RATES = (None, 88200, 176400, 192000, 8000, 16000, 22050,
                24000, 32000, 44100, 48000, 96000, "8bit_kHz",
                "16bit_Hz", "16bit_daHz", "invalid")
SAMPLE_SIZES = (None, 8, 12, "reserved", 16, 20, 24, 32)

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 \
            else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


# x^(8s) mod P16 per byte-distance s — CRC is GF(2)-linear, so a whole
# message folds as XOR_i clmul(byte_i, x^(8*(n-1-i)+16)) mod P: eight
# vectorized shift-XORs + one reduce replace the per-byte Python loop.
# The table grows on demand to the longest frame seen (one zero-byte
# CRC step per entry).
_CRC16_POW = [1]
_CRC16_POW_NP = np.array(_CRC16_POW, np.int64)


def _crc16_pow(upto: int) -> np.ndarray:
    global _CRC16_POW_NP
    t = _CRC16_POW
    if len(t) <= upto:
        while len(t) <= upto:
            c = t[-1]
            t.append(_CRC16_TABLE[(c >> 8) & 0xFF]
                     ^ ((c << 8) & 0xFFFF))
        _CRC16_POW_NP = np.array(t, np.int64)
    return _CRC16_POW_NP


def crc16(data: bytes) -> int:
    n = len(data)
    # crossover measured on 2026-08 sandbox hardware: the table loop
    # wins to ~600 bytes (35us at 256B vs 54us vectorized), the fold
    # wins 2.8x at 2.6 KB
    if n < 512:
        c = 0
        for b in data:
            c = _CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
        return c
    pow_np = _crc16_pow(n + 1)
    d = np.frombuffer(data, np.uint8).astype(np.int64)
    # byte i sits 8*(n-1-i)+16 bits above the remainder: exponent
    # index (n-1-i)+2 in units of 8 bits
    e = pow_np[2:n + 2][::-1]
    prod = ((d & 1) * e)
    for k in range(1, 8):
        prod ^= ((d >> k) & 1) * (e << k)
    v = int(np.bitwise_xor.reduce(prod))          # < 2^23
    return (v & 0xFFFF) ^ _CRC16_TABLE[v >> 16]


class _Reader:
    """MSB-first bit reader (the FLAC convention), byte-position aware
    so CRC spans can be taken from the underlying buffer."""

    __slots__ = ("data", "pos", "_winl", "_ones", "_win_np", "_ones_np")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos * 8
        self._winl = None
        self._ones = None
        self._win_np = None
        self._ones_np = None

    def aux(self) -> tuple[list, list]:
        """Per-payload decode accelerators, built once and reused by
        every Rice partition: a 32-bit big-endian window per byte
        offset, and the positions of all 1 bits. Kept as plain lists
        for the scalar loop (numpy scalar indexing is ~3× slower);
        the numpy originals are stashed for the vectorized
        whole-partition path (``_rice_decode_vec``)."""
        if self._winl is None:
            d = np.frombuffer(self.data, np.uint8).astype(np.uint32)
            padded = np.concatenate([d, np.zeros(4, np.uint32)])
            self._win_np = ((padded[:-3] << 24) | (padded[1:-2] << 16)
                            | (padded[2:-1] << 8) | padded[3:])
            self._winl = self._win_np.tolist()
            self._ones_np = np.flatnonzero(
                np.unpackbits(np.frombuffer(self.data,
                                            np.uint8))).astype(np.int64)
            self._ones = self._ones_np.tolist()
        return self._winl, self._ones

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > 8 * len(self.data):
            raise ValueError("FLAC bitstream truncated")
        self.pos = p + n
        out = 0
        d = self.data
        while n > 0:
            i = p >> 3
            avail = 8 - (p & 7)
            take = min(avail, n)
            chunk = (d[i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            p += take
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the terminating 1 bit."""
        d = self.data
        p = self.pos
        total = 8 * len(d)
        n = 0
        while True:
            if p >= total:
                raise ValueError("FLAC unary code truncated")
            i = p >> 3
            rem = 8 - (p & 7)
            byte = d[i] & ((1 << rem) - 1)
            if byte == 0:
                n += rem
                p += rem
                continue
            lead = rem - byte.bit_length()
            n += lead
            p += lead + 1
            self.pos = p
            return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _Writer:
    """MSB-first bit writer."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def write_unary(self, n: int) -> None:
        while n >= 32:
            self.write(0, 32)
            n -= 32
        self.write(1, n + 1)

    def write_bitarray(self, bits: np.ndarray) -> None:
        """Append a 0/1 ``uint8`` bit array in one shot (np.packbits on
        the byte-aligned body) — the bulk sink for the vectorized
        residual writer. Bit-exact with per-value ``write`` calls."""
        if self.nbits:
            pre = np.empty(self.nbits, np.uint8)
            for i in range(self.nbits):
                pre[i] = (self.acc >> (self.nbits - 1 - i)) & 1
            bits = np.concatenate([pre, bits])
            self.acc = 0
            self.nbits = 0
        nfull = (len(bits) >> 3) << 3
        if nfull:
            self.out += np.packbits(bits[:nfull]).tobytes()
        for b in bits[nfull:].tolist():
            self.acc = (self.acc << 1) | int(b)
            self.nbits += 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def finish(self) -> bytes:
        self.align()
        return bytes(self.out)


def _coded_number_read(r: _Reader) -> int:
    """UTF-8-style variable-length number, extended to 36 bits."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise ValueError("FLAC coded number with bad leading byte")
    val = b0 & (mask - 1)
    for _ in range(n_cont):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("FLAC coded number continuation corrupt")
        val = (val << 6) | (b & 0x3F)
    return val


def _coded_number_write(w: _Writer, val: int) -> None:
    if val < 0x80:
        w.write(val, 8)
        return
    chunks = []
    nbits = val.bit_length()
    n_cont = 1
    while nbits > 6 * n_cont + (6 - n_cont):
        n_cont += 1
    for i in range(n_cont):
        chunks.append(0x80 | ((val >> (6 * (n_cont - 1 - i))) & 0x3F))
    lead = ((0xFF << (7 - n_cont)) & 0xFF) \
        | ((val >> (6 * n_cont)) & ((1 << (6 - n_cont)) - 1))
    w.write(lead, 8)
    for c in chunks:
        w.write(c, 8)


def _zigzag(v: np.ndarray) -> np.ndarray:
    """Signed residual → unsigned Rice symbol (2v / -2v-1)."""
    return np.where(v >= 0, 2 * v, -2 * v - 1).astype(np.int64)


FIXED_COEFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


# below this many values a Rice partition decodes faster in the plain
# scalar loop than through the vectorized chase's fixed numpy overhead
# (measured single-thread on full decode_flac: 128-value partitions
# 0.94x, 256-value 0.95x, 512-value 1.24x, 1024-value 1.32x,
# 4096-value 1.42x — the crossover sits between 256 and 512)
_RICE_VEC_MIN = 512


def _rice_decode_vec(r: _Reader, pos: int, param: int, n: int):
    """Decode one whole Rice partition (n values, non-escape,
    param <= 25) with numpy instead of a per-value Python loop.

    A Rice value is q zero bits, a terminating 1 bit, then param
    remainder bits; the terminator of value i+1 is the first 1 bit at
    or after (terminator_i + 1 + param) — 1 bits *inside* a remainder
    field are payload, not terminators. Over the payload's sorted
    1-bit index ``ones`` that recurrence is the pointer chase
    ``j -> nxt[j]`` with ``nxt = searchsorted(ones, ones + 1 + param)``,
    and the chase is resolved in log2(n) vectorized gathers by index
    doubling (nxt2 = nxt[nxt] jumps 2 values, nxt4 jumps 4, ...).
    A valid chain consumes at most param+1 ones per value (terminator
    + remainder bits), so the slice ``ones[j0 : j0 + n*(param+1) + 1]``
    provably contains it; reaching the slice end means the stream ran
    out of 1 bits mid-partition (truncated). Remainders then gather
    from the 32-bit byte windows exactly like the scalar loop.

    Returns (values int64 array, end bit position), or None to make
    the caller fall back to the scalar loop (quotient too large for
    shifted int64 arithmetic — the scalar path has Python bigints)."""
    ones_np = r._ones_np
    j0 = int(np.searchsorted(ones_np, pos))
    span = n * (param + 1) + 1
    sl = ones_np[j0:j0 + span]
    m = len(sl)
    if m == 0:
        raise ValueError("FLAC rice stream truncated")
    step = param + 1
    # nxt with a self-looping sentinel at index m so overshoot is inert
    nxt = np.empty(m + 1, np.int64)
    nxt[:m] = np.searchsorted(sl, sl + step)
    nxt[m] = m
    idx = np.empty(n, np.int64)
    idx[0] = 0
    filled = 1
    while filled < n:
        take = min(filled, n - filled)
        idx[filled:filled + take] = nxt[idx[:take]]
        filled += take
        if filled < n:
            nxt = nxt[nxt]
    # the chase is monotone (nxt[j] > j below the sentinel), so the
    # last index is the maximum; hitting the sentinel means the ones
    # ran out mid-chain (a full slice of span entries provably
    # contains any valid chain, so this only fires when the slice was
    # cut short by the global end of the stream's 1 bits)
    if idx[-1] >= m:
        raise ValueError("FLAC rice stream truncated")
    t = sl[idx]
    q = np.empty(n, np.int64)
    q[0] = int(t[0]) - pos
    q[1:] = t[1:] - t[:-1] - step
    if int(q.max()) >= (1 << 37):
        return None
    if param:
        rpos = t + 1
        rem = ((r._win_np[rpos >> 3]
                >> np.uint32(32 - param) - (rpos & 7).astype(np.uint32))
               & np.uint32((1 << param) - 1)).astype(np.int64)
        u = (q << param) | rem
    else:
        u = q
    return (u >> 1) ^ -(u & 1), int(t[-1]) + 1 + param


def _read_residuals(r: _Reader, block_size: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"FLAC residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_parts = 1 << porder
    if block_size % n_parts or (block_size >> porder) <= order:
        raise ValueError("FLAC partition order inconsistent with "
                         "block size")
    out = np.empty(block_size - order, np.int64)
    # fast rice path: a 32-bit window per byte for remainders, the
    # positions of all 1 bits for unary quotients — built once per
    # payload (r.aux), so the per-value cost is a handful of int ops
    winl, ones = r.aux()
    oj = bisect.bisect_left(ones, r.pos)
    pos = r.pos
    k = 0
    for part in range(n_parts):
        n = (block_size >> porder) - (order if part == 0 else 0)
        r.pos = pos
        param = r.read(pbits)
        pos = r.pos
        if param == escape:
            raw_bits = r.read(5)
            if raw_bits == 0:
                out[k:k + n] = 0
                k += n
            elif raw_bits <= 25:
                # n fixed-width fields, back to back: gather all of
                # them from the 32-bit windows in one shot (a field
                # plus its <=7-bit intra-byte offset fits in 32 bits)
                starts = r.pos + raw_bits * np.arange(n, dtype=np.int64)
                if int(starts[-1]) + raw_bits > 8 * len(r.data):
                    raise ValueError("FLAC bitstream truncated")
                v = ((r._win_np[starts >> 3]
                      >> np.uint32(32 - raw_bits)
                      - (starts & 7).astype(np.uint32))
                     & np.uint32((1 << raw_bits) - 1)).astype(np.int64)
                out[k:k + n] = v - ((v >> (raw_bits - 1)) << raw_bits)
                k += n
                r.pos += raw_bits * n
            else:
                for i in range(n):
                    out[k] = r.read_signed(raw_bits)
                    k += 1
            pos = r.pos
            oj = bisect.bisect_left(ones, pos)
            continue
        if param <= 25 and n >= _RICE_VEC_MIN:
            vec = _rice_decode_vec(r, pos, param, n)
            if vec is not None:
                out[k:k + n], pos = vec
                k += n
                r.pos = pos
                oj = bisect.bisect_left(ones, pos)
                continue
        mask = (1 << param) - 1
        shift_base = 32 - param
        if param > 25:
            # the 32-bit window can't hold param + a 7-bit intra-byte
            # offset: take the generic reader for these rare (legal,
            # 32-bit-sample) parameters
            r.pos = pos
            for i in range(n):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out[k] = (u >> 1) ^ -(u & 1)
                k += 1
            pos = r.pos
            oj = bisect.bisect_left(ones, pos)
            continue
        try:
            for i in range(n):
                t = ones[oj]
                while t < pos:
                    oj += 1
                    t = ones[oj]
                q = t - pos
                pos = t + 1
                if param:
                    u = (q << param) | ((winl[pos >> 3]
                                         >> (shift_base - (pos & 7)))
                                        & mask)
                    pos += param
                else:
                    u = q
                out[k] = (u >> 1) ^ -(u & 1)
                k += 1
        except IndexError:
            raise ValueError("FLAC rice stream truncated") from None
        r.pos = pos
        oj = bisect.bisect_left(ones, pos)
    if r.pos > 8 * len(r.data):
        raise ValueError("FLAC rice stream truncated")
    return out


# vectorized writer engages at/above this many values per partition
# (measured single-thread on full build_flac over the bench fixture
# mix — see OPTIMIZATION_r11.md; per-value _Writer.write costs ~2 us
# while the bit-array assembly is a dozen whole-partition numpy ops,
# so the crossover is low) and below this total-bit cap (pathological
# rice params make sum(q) huge; the scalar loop has Python bigints)
_ENC_VEC_MIN = 32
_ENC_VEC_MAX_BITS = 1 << 26


def _rice_bits_vec(u: np.ndarray, param: int) -> np.ndarray | None:
    """0/1 bit array for one whole Rice partition: per value q zero
    bits, the 1 terminator, param remainder bits MSB-first. None when
    the partition is too large to assemble (caller falls back)."""
    q = u >> param
    ends = np.cumsum(q + 1 + param)
    total = int(ends[-1])
    if total > _ENC_VEC_MAX_BITS:
        return None
    bits = np.zeros(total, np.uint8)
    bits[ends - param - 1] = 1
    for b in range(param):
        bits[ends - param + b] = ((u >> (param - 1 - b)) & 1)
    return bits


def _raw_bits_vec(chunk: np.ndarray, raw_bits: int) -> np.ndarray:
    """0/1 bit array for an escaped partition: n fixed-width two's-
    complement fields, MSB-first."""
    vals = chunk.astype(np.int64) & ((1 << raw_bits) - 1)
    m = np.empty((len(vals), raw_bits), np.uint8)
    for b in range(raw_bits):
        m[:, b] = (vals >> (raw_bits - 1 - b)) & 1
    return m.reshape(-1)


def _write_residuals(w: _Writer, res: np.ndarray, block_size: int,
                     order: int, porder: int = 0,
                     force_escape: bool = False) -> None:
    n_parts = 1 << porder
    pos = 0
    w.write(0, 2)                       # 4-bit rice parameters
    w.write(porder, 4)
    for part in range(n_parts):
        n = (block_size >> porder) - (order if part == 0 else 0)
        chunk = res[pos:pos + n]
        u = _zigzag(chunk)
        if force_escape:
            raw_bits = max(2, int(np.abs(chunk).max(initial=0))
                           .bit_length() + 1)
            w.write(15, 4)
            w.write(raw_bits, 5)
            if n >= _ENC_VEC_MIN:
                w.write_bitarray(_raw_bits_vec(chunk, raw_bits))
            else:
                for v in chunk:
                    w.write(int(v) & ((1 << raw_bits) - 1), raw_bits)
        else:
            mean = float(u.mean()) if len(u) else 0.0
            param = max(0, int(mean).bit_length() - 1) if mean >= 1 \
                else 0
            param = min(param, 14)
            w.write(param, 4)
            bits = _rice_bits_vec(u, param) if n >= _ENC_VEC_MIN \
                else None
            if bits is not None:
                w.write_bitarray(bits)
            else:
                # one write per value: q leading zeros, the
                # terminating 1, and the param-bit remainder
                terminator = 1 << param
                mask = terminator - 1
                for v in u.tolist():
                    w.write(terminator | (v & mask),
                            (v >> param) + 1 + param)
        pos += n


def _read_subframe(r: _Reader, block_size: int, bits: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bits -= wasted
    if stype == 0:                      # CONSTANT
        out = np.full(block_size, r.read_signed(bits), np.int64)
    elif stype == 1:                    # VERBATIM
        out = np.array([r.read_signed(bits) for _ in range(block_size)],
                       np.int64)
    elif 8 <= stype <= 12:              # FIXED order 0-4
        order = stype - 8
        warm = np.array([r.read_signed(bits) for _ in range(order)],
                        np.int64)
        res = _read_residuals(r, block_size, order)
        # FIXED prediction of order k means the residual is the k-th
        # finite difference of the signal, so reconstruction is k
        # nested cumulative sums seeded from the warmup's own
        # difference pyramid — vectorized and integer-exact
        cur = res
        for j in range(order, 0, -1):
            seed = np.diff(warm, n=j - 1)[-1] if order else 0
            cur = seed + np.cumsum(cur)
        out = np.concatenate([warm, cur]) if order \
            else cur.astype(np.int64)
    elif stype >= 32:                   # LPC
        order = (stype & 31) + 1
        warm = [r.read_signed(bits) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC LPC precision 16 is invalid")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residuals(r, block_size, order)
        if shift == 0 and order <= 4 \
                and tuple(coefs) == FIXED_COEFS[order]:
            # LPC carrying the binomial FIXED-k coefficients at shift
            # 0 IS the k-th finite-difference predictor (encoders emit
            # this shape when the quantizer lands on the fixed poles):
            # reconstruct by the same integer-exact cumsum pyramid as
            # the FIXED branch instead of a per-sample Python loop
            wa = np.asarray(warm, np.int64)
            cur = res
            for j in range(order, 0, -1):
                cur = np.diff(wa, n=j - 1)[-1] + np.cumsum(cur)
            out = np.concatenate([wa, cur])
        else:
            # genuine LPC is a serial recurrence; keep the loop on
            # plain Python ints (numpy scalar indexing is ~3x slower)
            hist = list(map(int, warm))
            rl = res.tolist()
            for i in range(block_size - order):
                pred = sum(c * hist[-1 - j]
                           for j, c in enumerate(coefs)) >> shift
                hist.append(rl[i] + pred)
            out = np.array(hist, np.int64)
    else:
        raise ValueError(f"FLAC reserved subframe type {stype}")
    return out << wasted if wasted else out


def decode_flac(data: bytes) -> dict:
    """Decode a FLAC stream → {sample_rate, n_channels, bits,
    samples} with ``samples`` an (n, channels) int32 grid."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + size]
        if btype == 0:
            r = _Reader(body)
            r.read(32)                  # min/max block size (16+16)
            r.read(48)                  # min/max frame size (24+24)
            rate = r.read(20)
            nch = r.read(3) + 1
            bits = r.read(5) + 1
            total = r.read(36)
            info = {"rate": rate, "channels": nch, "bits": bits,
                    "total": total}
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream without STREAMINFO")

    frames: list[np.ndarray] = []
    r = _Reader(data)                   # one reader: aux cache reused
    while pos < len(data):
        frame_start = pos
        r.pos = pos * 8
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync code not found")
        if r.read(1):
            raise ValueError("FLAC frame reserved bit set")
        r.read(1)   # blocking strategy: the coded number below is
                    # a frame index (fixed) or sample index (variable);
                    # both parse identically here
        bs_bits = r.read(4)
        sr_bits = r.read(4)
        ch_bits = r.read(4)
        ss_bits = r.read(3)
        if r.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        _coded_number_read(r)
        if bs_bits == 0:
            raise ValueError("FLAC reserved block size 0")
        elif bs_bits == 1:
            block_size = 192
        elif bs_bits <= 5:
            block_size = 576 << (bs_bits - 2)
        elif bs_bits == 6:
            block_size = r.read(8) + 1
        elif bs_bits == 7:
            block_size = r.read(16) + 1
        else:
            block_size = 256 << (bs_bits - 8)
        sr = SAMPLE_RATES[sr_bits]
        if sr == "8bit_kHz":
            sr = r.read(8) * 1000
        elif sr == "16bit_Hz":
            sr = r.read(16)
        elif sr == "16bit_daHz":
            sr = r.read(16) * 10
        elif sr == "invalid":
            raise ValueError("FLAC invalid sample-rate code")
        elif sr is None:
            sr = info["rate"]
        if sr != info["rate"]:
            raise ValueError("FLAC frame sample rate differs from "
                             "STREAMINFO")
        bits = SAMPLE_SIZES[ss_bits]
        if bits == "reserved":
            raise ValueError("FLAC reserved sample size")
        if bits is None:
            bits = info["bits"]
        hdr_end = (r.pos + 7) >> 3
        if crc8(data[frame_start:hdr_end]) != r.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_bits <= 7:
            nch = ch_bits + 1
            subs = [_read_subframe(r, block_size, bits)
                    for _ in range(nch)]
        elif ch_bits == 8:              # left/side
            left = _read_subframe(r, block_size, bits)
            side = _read_subframe(r, block_size, bits + 1)
            subs = [left, left - side]
        elif ch_bits == 9:              # right/side
            side = _read_subframe(r, block_size, bits + 1)
            right = _read_subframe(r, block_size, bits)
            subs = [right + side, right]
        elif ch_bits == 10:             # mid/side
            mid = _read_subframe(r, block_size, bits)
            side = _read_subframe(r, block_size, bits + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"FLAC reserved channel assignment "
                             f"{ch_bits}")
        if ch_bits >= 8 and info["channels"] != 2:
            raise ValueError("FLAC stereo decorrelation in a "
                             "non-stereo stream")
        r.align()
        body_end = r.pos >> 3
        want = struct.unpack(">H", data[body_end:body_end + 2])[0]
        if crc16(data[frame_start:body_end]) != want:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = body_end + 2
        frames.append(np.stack(subs, axis=1))
    if not frames:
        raise ValueError("FLAC stream with no frames")
    samples = np.concatenate(frames, axis=0)
    if info["total"] and len(samples) > info["total"]:
        samples = samples[:info["total"]]
    return {"sample_rate": info["rate"],
            "n_channels": info["channels"], "bits": info["bits"],
            "samples": samples.astype(np.int32)}


def _write_subframe(w: _Writer, s: np.ndarray, bits: int,
                    mode: str, porder: int = 0) -> None:
    s = s.astype(np.int64)
    if mode == "constant":
        if not (s == s[0]).all():
            raise ValueError("constant subframe over varying samples")
        w.write(0, 1 + 6 + 1)           # pad, type 0, no wasted bits
        w.write(int(s[0]), bits)
        return
    if mode == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in s:
            w.write(int(v), bits)
        return
    if mode.startswith("fixed"):
        order = int(mode[-1])
        w.write(0, 1)
        w.write(8 + order, 6)
        w.write(0, 1)
        for v in s[:order]:
            w.write(int(v), bits)
        coefs = FIXED_COEFS[order]
        res = s[order:].copy()
        for j, c in enumerate(coefs):
            res -= c * s[order - 1 - j:len(s) - 1 - j]
        _write_residuals(w, res, len(s), order, porder)
        return
    if mode == "lpc2":
        # order-2 LPC with coefficients (2, -1), shift 0 — the same
        # prediction as FIXED order 2 but through the LPC machinery
        order, precision, shift = 2, 15, 0
        coefs = (2, -1)
        w.write(0, 1)
        w.write(32 + order - 1, 6)
        w.write(0, 1)
        for v in s[:order]:
            w.write(int(v), bits)
        w.write(precision - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c, precision)
        res = s[order:].copy()
        for j, c in enumerate(coefs):
            res -= c * s[order - 1 - j:len(s) - 1 - j]
        _write_residuals(w, res, len(s), order, porder,
                         force_escape=True)
        return
    raise ValueError(f"unknown subframe mode {mode}")


def build_flac(samples: np.ndarray, sample_rate: int = 8000,
               bits: int = 16, block_size: int = 1024,
               mode: str = "fixed2", porder: int = 0,
               stereo: str | None = None) -> bytes:
    """Assemble a spec-shaped FLAC stream from (n,) mono or (n, 2)
    stereo int samples. ``mode`` picks the subframe type (constant /
    verbatim / fixed0-4 / lpc2); ``stereo`` one of None / 'left_side'
    / 'right_side' / 'mid_side'."""
    samples = np.asarray(samples, np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    out = bytearray(b"fLaC")
    info = _Writer()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(nch - 1, 3)
    info.write(bits - 1, 5)
    info.write(n, 36)
    body = info.finish()
    # MD5 of the unencoded little-endian interleaved samples
    width = (bits + 7) // 8
    if width == 2:
        raw = samples.reshape(-1).astype("<i2").tobytes()
    elif width == 1:
        raw = samples.reshape(-1).astype(np.int8).tobytes()
    else:
        raw = b"".join(int(v).to_bytes(width, "little", signed=True)
                       for v in samples.reshape(-1))
    body += hashlib.md5(raw).digest()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fi, start in enumerate(range(0, n, block_size)):
        blk = samples[start:start + block_size]
        bs = len(blk)
        w = _Writer()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)                   # fixed blocking
        w.write(6 if bs <= 256 else 7, 4)   # size coded at header end
        w.write(0, 4)                   # rate from STREAMINFO
        if stereo is None:
            w.write(nch - 1, 4)
        else:
            w.write({"left_side": 8, "right_side": 9,
                     "mid_side": 10}[stereo], 4)
        # sample-size code must agree with the width the subframes
        # are actually written at (a hardcoded 16 desynced 8/24-bit
        # builds against their own headers)
        ss_codes = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
        if bits not in ss_codes:
            raise ValueError(f"build_flac cannot code {bits}-bit "
                             "samples in a frame header")
        w.write(ss_codes[bits], 3)
        w.write(0, 1)
        _coded_number_write(w, fi)
        if bs <= 256:
            w.write(bs - 1, 8)
        else:
            w.write(bs - 1, 16)
        hdr = w.out if not w.nbits else None
        assert hdr is not None, "frame header must be byte-aligned"
        w.write(crc8(bytes(w.out)), 8)
        # the FINAL block can be shorter than block_size; the requested
        # partition/prediction orders may then violate the spec's
        # bs % 2^porder == 0 and first-partition > order constraints —
        # clamp per frame (and fall back to verbatim when the tail is
        # shorter than the prediction order) instead of emitting a
        # stream every spec-correct decoder rejects
        pred_order = (int(mode[-1]) if mode.startswith("fixed")
                      else 2 if mode == "lpc2" else 0)
        eff_mode = mode
        if pred_order and bs <= pred_order:
            eff_mode, pred_order = "verbatim", 0
        eff_porder = porder
        while eff_porder > 0 and (bs % (1 << eff_porder)
                                  or (bs >> eff_porder) <= pred_order):
            eff_porder -= 1
        if stereo is None:
            for ch in range(nch):
                _write_subframe(w, blk[:, ch], bits, eff_mode,
                                eff_porder)
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            if stereo == "left_side":
                _write_subframe(w, left, bits, eff_mode, eff_porder)
                _write_subframe(w, left - right, bits + 1, eff_mode,
                                eff_porder)
            elif stereo == "right_side":
                _write_subframe(w, left - right, bits + 1, eff_mode,
                                eff_porder)
                _write_subframe(w, right, bits, eff_mode, eff_porder)
            else:
                mid = (left + right) >> 1
                side = left - right
                _write_subframe(w, mid, bits, eff_mode, eff_porder)
                _write_subframe(w, side, bits + 1, eff_mode,
                                eff_porder)
        w.align()
        frame = bytes(w.out)
        frame += struct.pack(">H", crc16(frame))
        out += frame
    return bytes(out)
