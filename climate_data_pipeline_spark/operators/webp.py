"""WebP lossless (VP8L) codec — pure python + numpy, no external
media libraries: the dominant modern web-image format, written
against the public WebP Lossless Bitstream Specification (Google;
RFC 9649) and the RIFF container spec.

Decodes: the RIFF/WEBP walk (plain and VP8X-extended containers),
the VP8L bitstream — LSB-first bit packing, canonical prefix codes
(simple two-symbol codes AND full code-length-coded codes with the
16/17/18 repeat alphabet and the optional max-symbol preface),
meta-prefix entropy partitioning, the color cache (the 0x1e35a7bd
multiplicative hash), LZ77 backward references with the 24-symbol
length / 40-symbol distance prefix scheme and the 120-entry 2D
close-neighborhood distance map, and all four transforms: predictor
(14 modes, tile-based), cross-color, subtract-green, and
color-indexing with sub-byte pixel bundling. Lossy VP8 and animated
(ANIM/ANMF) containers raise a crisp ``NotImplementedError`` — the
jpeg/png/tiff loud-seam convention: never silent wrong pixels.

The 2D distance map is generated, not transcribed: the spec's table
is exactly the 120 offsets {(x, y) : 0 ≤ y ≤ 7, −7 ≤ x ≤ 8, y > 0 or
x ≥ 1} ordered by x²+y², larger y first within ties, positive x
before negative — the generation is property-tested against the
spec's published prefix and the 8×16 lookup geometry (8 + 7·16 =
120), and round-trip-pinned by the encoder's use of map code 1.

The encoder exists for the usual reason (``synthesize_webp`` →
``decode_media_real`` without binary fixtures): real canonical
prefix codes built from per-image frequencies (heap Huffman with a
package-merge fallback for the 15-bit limit), real code-length
coding with zero-run RLE, and real cache/LZ77/transform emission, so
the decoder is exercised against genuinely entropy-coded streams.
VP8L is lossless, so a SQL oracle re-derives decoded means exactly.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# code-length-code symbol order (spec §5.2.2 / DEFLATE-style)
CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
            14, 15)
MAX_CODE_LEN = 15
GREEN_BASE = 256            # literal green values
N_LENGTH_CODES = 24
CACHE_BASE = GREEN_BASE + N_LENGTH_CODES


def _distance_map() -> list[tuple[int, int]]:
    """The 120 close-neighborhood (x, y) offsets, generated from the
    structural rule (see module docstring)."""
    pairs = [(x, y) for y in range(8) for x in range(-7, 9)
             if not (y == 0 and x < 1)]
    pairs.sort(key=lambda p: (p[0] ** 2 + p[1] ** 2, -p[1], p[0] < 0))
    return pairs


DIST_MAP = _distance_map()


_REV8 = tuple(int(f"{i:08b}"[::-1], 2) for i in range(256))


class _BitReader:
    """LSB-first bit reader over a bytes payload (VP8L convention).
    The buffer is zero-padded so fixed 4-byte windows never bounds-
    check; consuming past the true end still raises."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data + b"\x00\x00\x00"
        self.pos = 0                    # bit position
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("VP8L bitstream truncated")
        d = self.data
        i = p >> 3
        # 18 extra-distance bits + 7 shift need a 4-byte window
        window = (d[i] | (d[i + 1] << 8) | (d[i + 2] << 16)
                  | (d[i + 3] << 24))
        self.pos = p + n
        return (window >> (p & 7)) & ((1 << n) - 1)


class _BitWriter:
    """LSB-first bit writer (mirror of _BitReader)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc |= (val & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """DEFLATE-style canonical assignment: shorter codes numerically
    smaller, ties broken by symbol order. Returns {sym: (code, len)}
    with the code in MSB-first orientation (the tree-walk order)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev = 0
    for ln, sym in sorted((ln, s) for s, ln in lengths.items() if ln):
        code <<= (ln - prev)
        codes[sym] = (code, ln)
        code += 1
        prev = ln
    if codes and code != (1 << prev):
        raise ValueError("prefix code lengths are not Kraft-complete")
    return codes


class _Huffman:
    """Canonical prefix decoder (codes read MSB-first from the
    LSB-first stream, per the VP8L convention). Codes whose longest
    length fits 8 bits decode through a flat 256-entry peek table
    (one window extract + one lookup); longer codes fall back to the
    bit-by-bit tree walk."""

    __slots__ = ("table", "single", "flat")

    def __init__(self, lengths: dict[int, int], single: int | None = None):
        # ``single`` short-circuits the degenerate one-symbol simple
        # code: reads consume zero bits
        self.single = single
        self.flat = None
        self.table = ({} if single is not None else
                      {(ln, code): s for s, (code, ln) in
                       _canonical_codes(lengths).items()})
        if single is None and not self.table:
            raise ValueError("prefix code with no symbols")
        if self.table:
            self._build_flat()

    def _build_flat(self) -> None:
        max_len = max(ln for ln, _ in self.table)
        if max_len > 8:
            return
        flat = [None] * 256
        for (ln, code), sym in self.table.items():
            base = code << (8 - ln)
            entry = (sym, ln)
            for x in range(1 << (8 - ln)):
                flat[base | x] = entry
        self.flat = flat

    @classmethod
    def simple_pair(cls, s0: int, s1: int) -> "_Huffman":
        """Two-symbol simple code: the FIRST listed symbol gets code 0
        regardless of symbol order (libwebp convention — canonical
        ordering would swap them when s0 > s1)."""
        h = cls({}, single=0)
        h.single = None
        h.table = {(1, 0): s0, (1, 1): s1}
        h._build_flat()
        return h

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        if self.flat is not None:
            d, p = br.data, br.pos
            i = p >> 3
            # only the low 8 post-shift bits feed the peek table, and
            # the shift is < 8 — a 2-byte window suffices (r12: one
            # index+shift+or fewer per symbol in the hottest loop)
            window = (d[i] | (d[i + 1] << 8)) >> (p & 7)
            sym, ln = self.flat[_REV8[window & 0xFF]]
            if p + ln > br.nbits:
                raise ValueError("VP8L bitstream truncated")
            br.pos = p + ln
            return sym
        acc = 0
        table = self.table
        for depth in range(1, MAX_CODE_LEN + 1):
            acc = (acc << 1) | br.read(1)
            sym = table.get((depth, acc))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _huffman_lengths(freqs: dict[int, int],
                     max_len: int = MAX_CODE_LEN) -> dict[int, int]:
    """Code lengths from frequencies: heap Huffman, with the optimal
    package-merge fallback when the unconstrained tree exceeds the
    length limit. Deterministic (symbol-order tie-breaks)."""
    if not freqs:
        return {}
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, s, (s,)) for s, f in sorted(freqs.items())]
    heapq.heapify(heap)
    depths = dict.fromkeys(freqs, 0)
    while len(heap) > 1:
        f1, t1, s1 = heapq.heappop(heap)
        f2, t2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depths[s] += 1
        heapq.heappush(heap, (f1 + f2, min(t1, t2), s1 + s2))
    if max(depths.values()) <= max_len:
        return depths
    return _package_merge(freqs, max_len)


def _package_merge(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Boundary package-merge: optimal length-limited prefix code."""
    n = len(freqs)
    orig = sorted((f, (s,)) for s, f in freqs.items())
    cur = list(orig)
    for _ in range(max_len - 1):
        paired = [(cur[i][0] + cur[i + 1][0], cur[i][1] + cur[i + 1][1])
                  for i in range(0, len(cur) - 1, 2)]
        cur = sorted(orig + paired)
    lengths = dict.fromkeys(freqs, 0)
    for _, syms in cur[:2 * n - 2]:
        for s in syms:
            lengths[s] += 1
    return lengths


# ---------------------------------------------------------------------------
# LZ77 length/distance prefix scheme (spec §4.2.2)
# ---------------------------------------------------------------------------

def _prefix_value(code: int, br: _BitReader) -> int:
    """Prefix code index → value (lengths and distance codes share
    this scheme): codes 0-3 are the values 1-4; above, each code pair
    doubles the range with explicit extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_code(value: int) -> tuple[int, int, int]:
    """Inverse of _prefix_value: value → (code, n_extra_bits, extra)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    extra = x.bit_length() - 2
    base = (2 + ((x >> extra) & 1)) << extra
    return 2 * extra + 2 + ((x >> extra) & 1), extra, x - base


# ---------------------------------------------------------------------------
# prefix-code (de)serialization (spec §5.2.1-5.2.2)
# ---------------------------------------------------------------------------

def _read_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    if br.read(1):                      # simple code
        n_syms = br.read(1) + 1
        if br.read(1):                  # first symbol is 8 bits
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        if n_syms == 1:
            return _Huffman({}, single=s0)
        s1 = br.read(8)
        if s0 == s1:
            raise ValueError("VP8L simple code with repeated symbol")
        return _Huffman.simple_pair(s0, s1)
    # full code: code-length code first
    num_cl = 4 + br.read(4)
    cl_lengths: dict[int, int] = {}
    for i in range(num_cl):
        ln = br.read(3)
        if ln:
            cl_lengths[CL_ORDER[i]] = ln
    cl = _Huffman(cl_lengths)
    # optional symbol-count limit
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    prev_len = 8                        # spec default for repeat-16
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl_sym = cl.read(br)
        if cl_sym < 16:
            if cl_sym:
                lengths[sym] = cl_sym
                prev_len = cl_sym
            sym += 1
        elif cl_sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym >= alphabet_size:
                    raise ValueError("VP8L code-length repeat overflow")
                lengths[sym] = prev_len
                sym += 1
        elif cl_sym == 17:
            sym += 3 + br.read(3)
        else:                           # 18
            sym += 11 + br.read(7)
    if sym > alphabet_size:
        raise ValueError("VP8L code-length run beyond the alphabet")
    if len(lengths) == 1:
        # a one-entry full code is degenerate but decodable: treat as
        # the zero-bit single-symbol code (libwebp accepts this shape)
        return _Huffman({}, single=next(iter(lengths)))
    return _Huffman(lengths)


def _write_code(bw: _BitWriter, freqs: dict[int, int],
                alphabet_size: int) -> dict:
    """Serialize a prefix code for ``freqs``; returns {sym: (code,
    len)} for emission (len 0 entries mean zero-bit single symbol).
    Lengths are emitted for the FULL alphabet (trailing zeros RLE'd
    with code 18) — the reader consumes exactly ``alphabet_size``
    entries when no max-symbol preface is present."""
    syms = sorted(freqs)
    if not syms:
        # unused code (e.g. distances in a literal-only image): a
        # 1-symbol simple code for symbol 0
        bw.write(1, 1)
        bw.write(0, 1)                  # one symbol
        bw.write(0, 1)                  # 1-bit first symbol
        bw.write(0, 1)
        return {0: (0, 0)}
    if len(syms) <= 2 and syms[-1] <= 255:
        bw.write(1, 1)                  # simple
        bw.write(len(syms) - 1, 1)
        if len(syms) == 1:
            s0 = syms[0]
            if s0 <= 1:
                bw.write(0, 1)
                bw.write(s0, 1)
            else:
                bw.write(1, 1)
                bw.write(s0, 8)
            return {s0: (0, 0)}
        bw.write(1, 1)                  # 8-bit first symbol
        bw.write(syms[0], 8)
        bw.write(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    # full code
    lengths = _huffman_lengths(freqs)
    if len(lengths) == 1:               # can't simple-code syms > 255:
        s = next(iter(lengths))         # pad with a 1-bit dummy
        lengths = {s: 1, (s + 1) % 2: 1} if s > 255 else lengths
    bw.write(0, 1)
    alphabet = alphabet_size
    # RLE the length array with 17/18 zero runs (16 omitted: literal
    # lengths are cheap at our alphabet sizes)
    seq: list[tuple[int, int]] = []     # (cl_symbol, extra_payload)
    sym = 0
    while sym < alphabet:
        ln = lengths.get(sym, 0)
        if ln:
            seq.append((ln, -1))
            sym += 1
            continue
        run = 0
        while sym + run < alphabet and lengths.get(sym + run, 0) == 0:
            run += 1
        sym += run
        while run:
            if run >= 11:
                n = min(run, 138)
                seq.append((18, n - 11))
                run -= n
            elif run >= 3:
                seq.append((17, run - 3))
                run = 0
            else:
                seq.extend([(0, -1)] * run)
                run = 0
    cl_freqs: dict[int, int] = {}
    for cl_sym, _ in seq:
        cl_freqs[cl_sym] = cl_freqs.get(cl_sym, 0) + 1
    cl_lengths = _huffman_lengths(cl_freqs, max_len=7)
    if len(cl_lengths) == 1:            # degenerate CL code: pad
        s = next(iter(cl_lengths))
        cl_lengths = {s: 1, (s + 1) % 19: 1}
    num_cl = max(i for i, s in enumerate(CL_ORDER)
                 if s in cl_lengths) + 1
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(CL_ORDER[i], 0), 3)
    bw.write(0, 1)                      # no max-symbol preface
    cl_codes = _canonical_codes(cl_lengths)
    for cl_sym, extra in seq:
        code, ln = cl_codes[cl_sym]
        bw.write(_reverse_bits(code, ln), ln)
        if cl_sym == 17:
            bw.write(extra, 3)
        elif cl_sym == 18:
            bw.write(extra, 7)
    # emission codes are returned PRE-REVERSED (LSB-first write order)
    return {s: (_reverse_bits(code, ln), ln)
            for s, (code, ln) in _canonical_codes(lengths).items()}


def _reverse_bits(code: int, n: int) -> int:
    """MSB-first code → LSB-first emission order."""
    out = 0
    for _ in range(n):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


def _emit(bw: _BitWriter, codes: dict, sym: int) -> None:
    code, ln = codes[sym]          # pre-reversed by _write_code
    if ln:
        bw.write(code, ln)


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------

def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _read_entropy_coded(br: _BitReader, w: int, h: int,
                        level0: bool) -> np.ndarray:
    """One entropy-coded image (spec §5): returns a flat (w*h,) uint32
    ARGB array. At level 0 this includes the transform list, applied
    inverse in reverse order before returning."""
    transforms: list[tuple] = []
    cur_w = w
    if level0:
        seen: set[int] = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("VP8L transform repeated")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:          # predictor / color
                bits = br.read(3) + 2
                tw = -(-cur_w // (1 << bits))
                th = -(-h // (1 << bits))
                timg = _read_entropy_coded(br, tw, th, False)
                transforms.append((ttype, bits, cur_w, timg))
            elif ttype == 2:                      # subtract green
                transforms.append((2, None, cur_w, None))
            else:                                 # 3: color indexing
                n_colors = br.read(8) + 1
                pal = _read_entropy_coded(br, n_colors, 1, False)
                pal = np.cumsum(
                    pal.view(np.uint8).reshape(-1, 4).astype(np.uint32),
                    axis=0, dtype=np.uint32) % 256
                pal = np.ascontiguousarray(
                    pal.astype(np.uint8)).view(np.uint32).reshape(-1)
                if n_colors <= 2:
                    wbits = 3
                elif n_colors <= 4:
                    wbits = 2
                elif n_colors <= 16:
                    wbits = 1
                else:
                    wbits = 0
                full_w = cur_w
                cur_w = -(-cur_w // (1 << wbits))
                transforms.append((3, wbits, full_w, pal))

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError(f"VP8L color-cache bits {cache_bits}")
    # plain Python list, not numpy: the decode loop reads/writes one
    # cell per pixel, and numpy SCALAR indexing is ~3x the surrounding
    # logic (the J2K r11 lesson; same applies to ``out`` below)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits

    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read(1):           # meta prefix codes
        meta_bits = br.read(3) + 2
        mw = -(-cur_w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        mimg = _read_entropy_coded(br, mw, mh, False)
        # group index lives in (r << 8) | g
        meta = (((mimg >> 16) & 0xFF) << 8) | ((mimg >> 8) & 0xFF)
        meta = meta.astype(np.int64)
        n_groups = int(meta.max()) + 1
        meta_w = mw

    green_size = GREEN_BASE + N_LENGTH_CODES + (1 << cache_bits
                                                if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((_read_code(br, green_size),
                       _read_code(br, 256), _read_code(br, 256),
                       _read_code(br, 256), _read_code(br, 40)))

    n = cur_w * h
    out = [0] * n           # plain list: see the ``cache`` note above
    pos = 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % cur_w, pos // cur_w
            gi = int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
            g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]
        s = g_green.read(br)
        if s < GREEN_BASE:
            r = g_red.read(br)
            b = g_blue.read(br)
            a = g_alpha.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift] = px
        elif s < CACHE_BASE:
            length = _prefix_value(s - GREEN_BASE, br)
            dist_code = _prefix_value(g_dist.read(br), br)
            if dist_code <= 120:
                dx, dy = DIST_MAP[dist_code - 1]
                dist = dy * cur_w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            if cache is None:
                if dist >= length:      # non-overlapping: one slice copy
                    out[pos:pos + length] = \
                        out[pos - dist:pos - dist + length]
                    pos += length
                else:
                    for _ in range(length):
                        out[pos] = out[pos - dist]
                        pos += 1
            else:
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF)
                          >> cache_shift] = px
                    pos += 1
        else:
            idx = s - CACHE_BASE
            if cache is None or idx >= len(cache):
                raise ValueError("VP8L cache reference without a cache")
            out[pos] = cache[idx]
            pos += 1

    out = np.array(out, dtype=np.uint32)
    for ttype, bits, t_w, tdata in reversed(transforms):
        if ttype == 2:
            out = _inv_subtract_green(out)
        elif ttype == 0:
            out = _inv_predictor(out, t_w, h, bits, tdata)
        elif ttype == 1:
            out = _inv_color_transform(out, t_w, h, bits, tdata)
        else:
            out = _inv_color_index(out, t_w, h, bits, tdata)
    return out


def _inv_subtract_green(px: np.ndarray) -> np.ndarray:
    g = (px >> 8) & 0xFF
    r = ((px >> 16) + g) & 0xFF
    b = (px + g) & 0xFF
    return (px & 0xFF00FF00) | (r << 16) | b


def _avg2(a: np.ndarray | int, b: np.ndarray | int) -> int:
    """Per-channel (a + b) // 2 on packed ARGB scalars."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_half(a: int, b: int, c: int) -> int:
    ave = _avg2(a, b)
    out = 0
    for sh in (0, 8, 16, 24):
        av = (ave >> sh) & 0xFF
        d = av - ((c >> sh) & 0xFF)
        # (a - b) / 2 with C truncation toward zero, per libwebp's
        # AddSubtractComponentHalf
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= max(0, min(255, av + half)) << sh
    return out


def _select(top: int, left: int, top_left: int) -> int:
    p = 0
    for sh in (0, 8, 16, 24):
        t = (top >> sh) & 0xFF
        le = (left >> sh) & 0xFF
        tl = (top_left >> sh) & 0xFF
        p += abs(le - tl) - abs(t - tl)
    return top if p <= 0 else left


def _inv_predictor(res: np.ndarray, w: int, h: int, bits: int,
                   timg: np.ndarray) -> np.ndarray:
    """Inverse predictor transform: sequential scan adding the per-tile
    prediction mod 256 per channel. Contiguous-array convention for
    the top-right at the row edge (libwebp reads ``argb[pos-w+1]``,
    which at x = w-1 is the current row's first pixel)."""
    modes = ((timg >> 8) & 0xFF).astype(np.int64)
    tw = -(-w // (1 << bits))
    out = res.astype(np.int64)
    BLACK = 0xFF000000
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = BLACK
        elif y == 0:
            pred = int(out[pos - 1])
        elif x == 0:
            pred = int(out[pos - w])
        else:
            mode = int(modes[(y >> bits) * tw + (x >> bits)])
            L = int(out[pos - 1])
            T = int(out[pos - w])
            TL = int(out[pos - w - 1])
            TR = int(out[pos - w + 1])
            if mode == 0:
                pred = BLACK
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = _avg2(_avg2(L, TR), T)
            elif mode == 6:
                pred = _avg2(L, TL)
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 8:
                pred = _avg2(TL, T)
            elif mode == 9:
                pred = _avg2(T, TR)
            elif mode == 10:
                pred = _avg2(_avg2(L, TL), _avg2(T, TR))
            elif mode == 11:
                pred = _select(T, L, TL)
            elif mode == 12:
                pred = _clamp_add_full(L, T, TL)
            elif mode == 13:
                pred = _clamp_add_half(L, T, TL)
            else:
                raise ValueError(f"VP8L predictor mode {mode}")
        v = int(out[pos])
        out[pos] = ((((v & 0xFF) + (pred & 0xFF)) & 0xFF)
                    | ((((v >> 8) & 0xFF) + ((pred >> 8) & 0xFF) & 0xFF)
                       << 8)
                    | ((((v >> 16) & 0xFF) + ((pred >> 16) & 0xFF)
                        & 0xFF) << 16)
                    | ((((v >> 24) & 0xFF) + ((pred >> 24) & 0xFF)
                        & 0xFF) << 24))
    return out.astype(np.uint32)


def _inv_color_transform(px: np.ndarray, w: int, h: int, bits: int,
                         timg: np.ndarray) -> np.ndarray:
    """Inverse cross-color transform: per-tile signed 3.5-fixed deltas
    (g2r in the tile pixel's blue channel, g2b in green, r2b in red),
    red restored first, blue from the RESTORED red."""
    tw = -(-w // (1 << bits))
    idx = ((np.arange(w * h) // w) >> bits) * tw \
        + ((np.arange(w * h) % w) >> bits)
    cte = timg[idx]
    g2r = (cte & 0xFF).astype(np.int64)
    g2b = ((cte >> 8) & 0xFF).astype(np.int64)
    r2b = ((cte >> 16) & 0xFF).astype(np.int64)
    for v in (g2r, g2b, r2b):
        v[v > 127] -= 256               # int8 reinterpretation
    g = ((px >> 8) & 0xFF).astype(np.int64)
    gs = np.where(g > 127, g - 256, g)  # green also used signed
    r = (((px >> 16) & 0xFF).astype(np.int64)
         + ((g2r * gs) >> 5)) & 0xFF
    rs = np.where(r > 127, r - 256, r)
    b = ((px & 0xFF).astype(np.int64)
         + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return ((px & 0xFF00FF00)
            | (r.astype(np.uint32) << 16) | b.astype(np.uint32))


def _inv_color_index(px: np.ndarray, full_w: int, h: int, wbits: int,
                     pal: np.ndarray) -> np.ndarray:
    """Inverse color-indexing: unbundle sub-byte pixels from the green
    channel, drop row padding, look indexes up in the palette."""
    if wbits == 0:
        idx = ((px >> 8) & 0xFF).astype(np.int64)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("VP8L palette index out of range")
        return pal[idx]
    per = 1 << wbits                    # pixels per packed unit
    bpp = 8 >> wbits
    packed_w = -(-full_w // per)
    g = ((px >> 8) & 0xFF).astype(np.int64).reshape(h, packed_w)
    sub = np.stack([(g >> (bpp * k)) & ((1 << bpp) - 1)
                    for k in range(per)], axis=2).reshape(h, -1)
    idx = sub[:, :full_w]
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("VP8L palette index out of range")
    return pal[idx].reshape(-1)


def decode_vp8l(payload: bytes) -> dict:
    """Decode a VP8L chunk payload → {width, height, px} with ``px``
    an (h, w, 4) uint8 RGBA grid."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                          # alpha-is-used hint
    version = br.read(3)
    if version != 0:
        raise NotImplementedError(f"VP8L version {version}")
    argb = _read_entropy_coded(br, w, h, True)
    if len(argb) != w * h:
        raise ValueError("VP8L decoded pixel count mismatch")
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    px = np.stack([r, g, b, a], axis=1).astype(np.uint8).reshape(h, w, 4)
    return {"width": w, "height": h, "px": px}


def parse_webp(data: bytes) -> dict:
    """RIFF walk → VP8L decode. Lossy VP8 and animation raise loudly;
    metadata chunks (EXIF/XMP/ICCP) and the VP8X header are skipped."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP payload (missing RIFF/WEBP magic)")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("WebP chunk truncated")
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 WebP not supported (VP8L lossless only)")
        if fourcc == b"ANIM" or fourcc == b"ANMF":
            raise NotImplementedError("animated WebP not supported")
        pos += 8 + size + (size & 1)    # chunks are even-padded
    raise ValueError("WebP container without a VP8L chunk")


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

def _tokenize(argb: np.ndarray, w: int, cache_bits: int,
              lz77_rows: bool) -> list[tuple]:
    """Token stream for the spatial image: ('lit', a, r, g, b) /
    ('cache', idx) / ('copy', length, dist_code). ``lz77_rows`` emits
    each row that exactly repeats the previous one as a single
    backward reference with 2D distance code 1 (= one row up)."""
    tokens: list[tuple] = []
    cache = np.zeros(1 << cache_bits, np.uint32) if cache_bits else None
    filled = np.zeros(1 << cache_bits, bool) if cache_bits else None
    n = len(argb)
    pos = 0
    while pos < n:
        if (lz77_rows and pos % w == 0 and pos >= w
                and bool((argb[pos:pos + w] == argb[pos - w:pos]).all())):
            tokens.append(("copy", w, 1))
            if cache is not None:
                for px in argb[pos:pos + w]:
                    k = _cache_key(int(px), cache_bits)
                    cache[k] = px
                    filled[k] = True
            pos += w
            continue
        px = int(argb[pos])
        if cache is not None:
            key = _cache_key(px, cache_bits)
            if filled[key] and int(cache[key]) == px:
                tokens.append(("cache", key))
                pos += 1
                continue
            cache[key] = px
            filled[key] = True
        tokens.append(("lit", (px >> 24) & 0xFF, (px >> 16) & 0xFF,
                       (px >> 8) & 0xFF, px & 0xFF))
        pos += 1
    return tokens


def _write_spatial(bw: _BitWriter, tokens: list[tuple],
                   cache_bits: int, level0: bool = True) -> None:
    """Cache header + (level 0 only: no-meta bit) + 5 prefix codes +
    token emission. Sub-images (transform data, palettes) carry no
    meta-prefix field at all — the reader never looks for one."""
    hg: dict[int, int] = {}
    hr: dict[int, int] = {}
    hb: dict[int, int] = {}
    ha: dict[int, int] = {}
    hd: dict[int, int] = {}

    def bump(hist, sym):
        hist[sym] = hist.get(sym, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            bump(hg, g)
            bump(hr, r)
            bump(hb, b)
            bump(ha, a)
        elif t[0] == "cache":
            bump(hg, CACHE_BASE + t[1])
        else:
            code, _, _ = _prefix_code(t[1])
            bump(hg, GREEN_BASE + code)
            dcode, _, _ = _prefix_code(t[2])
            bump(hd, dcode)
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)                  # no meta prefix codes
    green_size = CACHE_BASE + (1 << cache_bits if cache_bits else 0)
    cg = _write_code(bw, hg, green_size)
    cr = _write_code(bw, hr, 256)
    cb = _write_code(bw, hb, 256)
    ca = _write_code(bw, ha, 256)
    cd = _write_code(bw, hd, 40)
    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            _emit(bw, cg, g)
            _emit(bw, cr, r)
            _emit(bw, cb, b)
            _emit(bw, ca, a)
        elif t[0] == "cache":
            _emit(bw, cg, CACHE_BASE + t[1])
        else:
            code, nx, extra = _prefix_code(t[1])
            _emit(bw, cg, GREEN_BASE + code)
            bw.write(extra, nx)
            dcode, nx, extra = _prefix_code(t[2])
            _emit(bw, cd, dcode)
            bw.write(extra, nx)


def encode_vp8l(px: np.ndarray, subtract_green: bool = False,
                cache_bits: int = 0, palette: np.ndarray | None = None,
                lz77_rows: bool = False) -> bytes:
    """Encode an (h, w, 4) uint8 RGBA grid (or (h, w) palette indexes
    with ``palette`` an (n, 4) RGBA array) into a VP8L payload."""
    bw = _BitWriter()
    if palette is not None:
        h, w = px.shape
        idx = px.astype(np.int64)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
    else:
        h, w = px.shape[:2]
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                      # alpha hint
    bw.write(0, 3)                      # version

    def pack(rgba: np.ndarray) -> np.ndarray:
        rgba = rgba.reshape(-1, 4).astype(np.uint32)
        return ((rgba[:, 3] << 24) | (rgba[:, 0] << 16)
                | (rgba[:, 1] << 8) | rgba[:, 2])

    if palette is not None:
        n_colors = len(palette)
        bw.write(1, 1)                  # transform present
        bw.write(3, 2)                  # color indexing
        bw.write(n_colors - 1, 8)
        pal_argb = pack(np.asarray(palette, np.uint8))
        deltas = np.diff(pal_argb.view(np.uint8).reshape(-1, 4)
                         .astype(np.int64), axis=0,
                         prepend=np.zeros((1, 4), np.int64)) % 256
        pal_img = np.ascontiguousarray(
            deltas.astype(np.uint8)).view(np.uint32).reshape(-1)
        _write_spatial(bw, _tokenize(pal_img, n_colors, 0, False), 0,
                       level0=False)
        if n_colors <= 2:
            wbits = 3
        elif n_colors <= 4:
            wbits = 2
        elif n_colors <= 16:
            wbits = 1
        else:
            wbits = 0
        if wbits:
            per = 1 << wbits
            bpp = 8 >> wbits
            packed_w = -(-w // per)
            padded = np.zeros((h, packed_w * per), np.int64)
            padded[:, :w] = idx
            g = np.zeros((h, packed_w), np.int64)
            for k in range(per):
                g |= padded[:, k::per] << (bpp * k)
            argb = (0xFF000000 | (g.astype(np.uint32) << 8)).reshape(-1)
            eff_w = packed_w
        else:
            argb = (0xFF000000
                    | (idx.astype(np.uint32) << 8)).reshape(-1)
            eff_w = w
        bw.write(0, 1)                  # end of transforms
        _write_spatial(bw, _tokenize(argb, eff_w, 0, False), 0)
        return bw.finish()

    argb = pack(px)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        g = (argb >> 8) & 0xFF
        r = ((argb >> 16) - g) & 0xFF
        b = (argb - g) & 0xFF
        argb = (argb & 0xFF00FF00) | (r << 16) | b
    bw.write(0, 1)                      # end of transforms
    _write_spatial(bw, _tokenize(argb, w, cache_bits, lz77_rows),
                   cache_bits)
    return bw.finish()


def build_webp(vp8l_payload: bytes) -> bytes:
    """Wrap a VP8L payload in the RIFF/WEBP container."""
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
