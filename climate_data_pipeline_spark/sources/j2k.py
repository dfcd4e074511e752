"""JPEG 2000 Part-1 codec (lossless profile) — pure Python, no
OpenJPEG/Jasper/Pillow: the codec GRIB2 data representation template
5.40 wraps (newer ECMWF disseminations and NCEP archives pack fields
as single-component lossless J2K codestreams via Jasper).

Written against the public ITU-T T.800 / ISO-IEC 15444-1
specification:

- **MQ arithmetic coder** (Annex C): the 47-row Qe state table,
  ENCODE/DECODE/BYTEIN/BYTEOUT/FLUSH procedures, one codeword segment
  per codeblock (default coding style — no RESET/TERMALL).
- **EBCOT Tier-1** (Annex D): three coding passes per bitplane
  (significance propagation, magnitude refinement, cleanup with the
  run-length shortcut), 19 contexts (9 zero-coding by subband
  orientation, 5 sign-coding with XOR bit, 3 magnitude-refinement,
  run-length, UNIFORM), 4-row stripe column scan.
- **Tier-2** (Annex B): packet headers with inclusion + zero-bitplane
  tag trees, the pass-count codeword, Lblock length signalling, and
  0xFF bit-stuffing; SOP/EPH tolerated on decode.
- **Reversible 5/3 DWT** (Annex F): lifting with symmetric extension,
  2D_INTERLEAVE + HOR_SR + VER_SR inverse order, multi-level Mallat
  decomposition, DC level shift for unsigned components.
- **Codestream syntax** (Annex A): SOC/SIZ/COD/QCD/(COM)/SOT/SOD/EOC.

Profile (loud ``NotImplementedError`` beyond it, the codec-family
pattern of ``sources/grib2.py``): single tile at origin, one
component, no subsampling, reversible 5/3 with no quantization,
full-subband precincts, LRCP/RLCP progression (they coincide for one
layer/component/precinct), ≤ 38 bitplanes. This covers what the
Jasper/OpenJPEG encoders inside eccodes/NCEP's GRIB2 writers emit for
template 5.40.
"""

from __future__ import annotations

import struct

import numpy as np


class J2KUnsupported(NotImplementedError):
    pass


# ---------------------------------------------------------------------------
# MQ arithmetic coder (T.800 Annex C; Qe table = Table C.2)
# ---------------------------------------------------------------------------

# (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

N_CTX = 19
# initial (state index, MPS) per context — T.800 Table D.7: UNIFORM
# starts at 46, run-length at 3, zero-coding context 0 at 4
_CTX_INIT = {0: 4, 17: 3, 18: 46}


def _init_ctx() -> list[list[int]]:
    return [[_CTX_INIT.get(c, 0), 0] for c in range(N_CTX)]


class MQEncoder:
    """Annex C encoder: C/A registers, CT down-counter, BYTEOUT with
    0xFF clamping, FLUSH sets as many 1 bits as possible."""

    def __init__(self):
        self.ctx = _init_ctx()
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.bp = -1                     # B pointer into out
        self.out = bytearray()

    def encode(self, d: int, cx: int) -> None:
        st = self.ctx[cx]
        qe, nmps, nlps, switch = _QE[st[0]]
        if d == st[1]:                   # MPS path
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            st[0] = nmps
        else:                            # LPS path
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                st[1] = 1 - st[1]
            st[0] = nlps
        while not (self.a & 0x8000):     # RENORME
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()

    def _byteout(self) -> None:
        if self.bp >= 0 and self.out[self.bp] == 0xFF:
            self.bp += 1
            self._setb(self.c >> 20)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                self.bp += 1
                self._setb(self.c >> 19)
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                if self.bp >= 0:
                    self.out[self.bp] += 1
                if self.bp >= 0 and self.out[self.bp] == 0xFF:
                    self.c &= 0x7FFFFFF
                    self.bp += 1
                    self._setb(self.c >> 20)
                    self.c &= 0xFFFFF
                    self.ct = 7
                else:
                    self.bp += 1
                    self._setb(self.c >> 19)
                    self.c &= 0x7FFFF
                    self.ct = 8

    def _setb(self, v: int) -> None:
        while len(self.out) <= self.bp:
            self.out.append(0)
        self.out[self.bp] = v & 0xFF

    def flush(self) -> bytes:
        """SETBITS + two final byteouts; drop trailing 0xFF bytes (the
        decoder re-synthesizes 1 bits past the segment end)."""
        # SETBITS
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        out = self.out[:self.bp + 1] if self.bp >= 0 else bytearray()
        while out and out[-1] == 0xFF:
            out.pop()
        return bytes(out)


class MQDecoder:
    """Annex C decoder (software-conventions variant: C holds the code
    bytes left-aligned, BYTEIN feeds with 0xFF stuffing awareness)."""

    def __init__(self, data: bytes):
        self.ctx = _init_ctx()
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        d = self.data
        if self.bp < len(d) and d[self.bp] == 0xFF:
            if self.bp + 1 >= len(d) or d[self.bp + 1] > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += d[self.bp] << 9
                self.ct = 7
        else:
            self.bp += 1
            nxt = d[self.bp] if self.bp < len(d) else 0xFF
            if self.bp >= len(d):
                self.c += 0xFF00
                self.ct = 8
            else:
                self.c += nxt << 8
                self.ct = 8

    def decode(self, cx: int) -> int:
        st = self.ctx[cx]
        qe, nmps, nlps, switch = _QE[st[0]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = st[1]
                st[0] = nmps
            else:
                d = 1 - st[1]
                if switch:
                    st[1] = 1 - st[1]
                st[0] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return st[1]
            if self.a < qe:
                d = 1 - st[1]
                if switch:
                    st[1] = 1 - st[1]
                st[0] = nlps
            else:
                d = st[1]
                st[0] = nmps
        while not (self.a & 0x8000):     # RENORMD
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
        return d


# ---------------------------------------------------------------------------
# Tag trees (Annex B.10.2)
# ---------------------------------------------------------------------------

_TT_UNKNOWN = 1 << 30


class TagTree:
    """Quadtree over a w×h leaf grid (B.10.2): per-leaf non-negative
    values coded incrementally against rising thresholds, sharing
    ancestor lower bounds — the inclusion and zero-bitplane signals of
    packet headers. Node state follows the classic three-field
    formulation (value, low-bound, known-flag)."""

    def __init__(self, w: int, h: int):
        self.dims = []
        lw, lh = w, h
        self.dims.append((lw, lh))
        while lw > 1 or lh > 1:
            lw, lh = (lw + 1) // 2, (lh + 1) // 2
            self.dims.append((lw, lh))
        # plain nested lists (r11): the grids are tiny (≤ a few dozen
        # codeblocks) and every access is a scalar read/write — numpy
        # scalar indexing was pure overhead here
        self.value = [[[_TT_UNKNOWN] * dw for _ in range(dh)]
                      for dw, dh in self.dims]
        self.low = [[[0] * dw for _ in range(dh)] for dw, dh in self.dims]
        self.known = [[[False] * dw for _ in range(dh)]
                      for dw, dh in self.dims]

    def set(self, x: int, y: int, v: int) -> None:
        self.value[0][y][x] = v

    def finalize(self) -> None:
        """Encoder side: ancestor value = min over its leaves."""
        for k in range(1, len(self.dims)):
            prev = self.value[k - 1]
            dw, dh = self.dims[k]
            cur = [[_TT_UNKNOWN] * dw for _ in range(dh)]
            for yy, row in enumerate(prev):
                crow = cur[yy // 2]
                for xx, v in enumerate(row):
                    if v < crow[xx // 2]:
                        crow[xx // 2] = v
            self.value[k] = cur

    def _path(self, x: int, y: int):
        return [(k, x >> k, y >> k)
                for k in range(len(self.dims) - 1, -1, -1)]

    def encode(self, bw, x: int, y: int, threshold: int) -> None:
        low = 0
        for k, xx, yy in self._path(x, y):
            lrow = self.low[k][yy]
            if low > lrow[xx]:
                lrow[xx] = low
            else:
                low = lrow[xx]
            v = self.value[k][yy][xx]
            while low < threshold:
                if low >= v:
                    krow = self.known[k][yy]
                    if not krow[xx]:
                        bw.put_bit(1)
                        krow[xx] = True
                    break
                bw.put_bit(0)
                low += 1
            lrow[xx] = low

    def decode(self, br, x: int, y: int, threshold: int) -> bool:
        """Advance leaf (x, y)'s knowledge to ``threshold``; returns
        True when the leaf value is known to be < threshold (its
        resolved value is then in ``value[0][y][x]``)."""
        low = 0
        for k, xx, yy in self._path(x, y):
            lrow = self.low[k][yy]
            if low > lrow[xx]:
                lrow[xx] = low
            else:
                low = lrow[xx]
            vrow = self.value[k][yy]
            while low < threshold and low < vrow[xx]:
                if br.get_bit():
                    vrow[xx] = low
                else:
                    low += 1
            lrow[xx] = low
        return self.value[0][y][x] < threshold


# ---------------------------------------------------------------------------
# packet-header bit I/O with 0xFF stuffing (B.10.1)
# ---------------------------------------------------------------------------

class _HdrWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0
        self.lim = 8                     # latched at byte start

    def put_bit(self, b: int) -> None:
        if self.n == 0:
            self.lim = 7 if (self.out and self.out[-1] == 0xFF) else 8
        self.acc = (self.acc << 1) | (b & 1)
        self.n += 1
        if self.n == self.lim:
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0

    def put(self, v: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.put_bit((v >> i) & 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc << (self.lim - self.n))
            self.acc = 0
            self.n = 0
        # a packet header may not END with 0xFF (B.10.1)
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)
        return bytes(self.out)


class _HdrReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.prev_ff = False

    def get_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("J2K packet header exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if self.prev_ff:
                if b & 0x80:
                    raise ValueError("J2K header stuffing violation")
                self.n = 7
            else:
                self.n = 8
            self.acc = b
            self.prev_ff = b == 0xFF
        self.n -= 1
        return (self.acc >> self.n) & 1

    def get(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.get_bit()
        return v

    def align(self) -> int:
        """Finish the current byte (and the stuffing byte after a
        trailing 0xFF); returns the byte position."""
        self.n = 0
        if self.prev_ff:
            if self.pos < len(self.data) and self.data[self.pos] == 0:
                self.pos += 1
            self.prev_ff = False
        return self.pos


# ---------------------------------------------------------------------------
# reversible 5/3 DWT (Annex F)
# ---------------------------------------------------------------------------

def _axslice(a: np.ndarray, s: slice, axis: int) -> np.ndarray:
    return a[s] if axis == 0 else a[:, s]


def _sd_2d(x: np.ndarray, axis: int) -> tuple[np.ndarray, np.ndarray]:
    """2-D analysis (forward 5/3) along ``axis`` — every row/column
    lifted at once (identical integer arithmetic to the per-lane 1-D
    form, minus the Python-level lane loop)."""
    n = x.shape[axis]
    if axis == 0:
        ev = x[0::2].astype(np.int64)
        od = x[1::2].astype(np.int64)
    else:
        ev = x[:, 0::2].astype(np.int64)
        od = x[:, 1::2].astype(np.int64)
    if n == 1:
        return ev, od
    ne, no = ev.shape[axis], od.shape[axis]
    # odd (predict): X[2n+1] -= floor((E[n]+E[n+1])/2), symmetric ext
    righte = _axslice(ev, slice(1, 1 + no), axis) if no < ne else \
        np.concatenate([_axslice(ev, slice(1, None), axis),
                        _axslice(ev, slice(-1, None), axis)], axis)
    od -= (_axslice(ev, slice(None, no), axis) + righte) >> 1
    # even (update): X[2n] += floor((H[n-1]+H[n]+2)/4)
    left = np.concatenate([_axslice(od, slice(0, 1), axis),
                           _axslice(od, slice(None, ne - 1), axis)], axis)
    right = _axslice(od, slice(None, ne), axis) if ne <= no else \
        np.concatenate([od, _axslice(od, slice(-1, None), axis)], axis)
    ev += (left + right + 2) >> 2
    return ev, od


def _sr_2d(low: np.ndarray, high: np.ndarray, axis: int) -> np.ndarray:
    """2-D synthesis (inverse 5/3) along ``axis``: low lanes at even
    positions, high at odd — the exact inverse of ``_sd_2d``."""
    n = low.shape[axis] + high.shape[axis]
    shape = list(low.shape)
    shape[axis] = n
    x = np.empty(shape, np.int64)
    if axis == 0:
        x[0::2] = low
        x[1::2] = high
        ev, h = x[0::2], x[1::2]
    else:
        x[:, 0::2] = low
        x[:, 1::2] = high
        ev, h = x[:, 0::2], x[:, 1::2]
    if n == 1:
        return x
    ne, no = ev.shape[axis], h.shape[axis]
    # even (update) undo
    left = np.concatenate([_axslice(h, slice(0, 1), axis),
                           _axslice(h, slice(None, ne - 1), axis)], axis)
    right = _axslice(h, slice(None, ne), axis) if ne <= no else \
        np.concatenate([h, _axslice(h, slice(-1, None), axis)], axis)
    ev -= (left + right + 2) >> 2
    # odd (predict) undo
    lefte = _axslice(ev, slice(None, no), axis)
    righte = _axslice(ev, slice(1, 1 + no), axis) if no < ne else \
        np.concatenate([_axslice(ev, slice(1, None), axis),
                        _axslice(ev, slice(-1, None), axis)], axis)
    h += (lefte + righte) >> 1
    return x


def fdwt53(img: np.ndarray, levels: int) -> list[dict]:
    """Forward multi-level 5/3: returns [{'LL'|'HL'|'LH'|'HH': array}]
    with index 0 = deepest level's bands (incl. final LL). Lifting runs
    whole-axis vectorized (r11): the old per-column/per-row ``_sd_1d``
    loop was ~30% of the J2K round trip at GRIB2 field sizes."""
    ll = img.astype(np.int64)
    stack = []
    for _ in range(levels):
        # vertical first (forward = reverse of HOR_SR∘VER_SR inverse)
        lo_v, hi_v = _sd_2d(ll, 0)
        lo_ll, hi_hl = _sd_2d(lo_v, 1)
        lo_lh, hi_hh = _sd_2d(hi_v, 1)
        stack.append({"HL": hi_hl, "LH": lo_lh, "HH": hi_hh})
        ll = lo_ll
    stack.reverse()
    stack.insert(0, {"LL": ll})
    return stack


def idwt53(bands: list[dict]) -> np.ndarray:
    """Inverse of ``fdwt53`` (2D_INTERLEAVE + HOR_SR + VER_SR)."""
    ll = bands[0]["LL"]
    for lev in bands[1:]:
        # horizontal synthesis of the two row groups, then vertical
        top = _sr_2d(ll, lev["HL"], 1)
        bot = _sr_2d(lev["LH"], lev["HH"], 1)
        ll = _sr_2d(top, bot, 0)
    return ll

# ---------------------------------------------------------------------------
# EBCOT Tier-1 (Annex D): per-codeblock bitplane coding
# ---------------------------------------------------------------------------
# Zero-coding context by band GEOMETRY (conformance convention): the
# horizontally-highpass band (HL: x-odd, y-even interleave slots) uses
# the H-major table unswapped, the vertically-highpass band (LH) swaps
# ΣH/ΣV, HH uses the diagonal-major table.

_CTX_RL = 17
_CTX_UNI = 18


def _zc_ctx(h: int, v: int, d: int, band: str) -> int:
    if band == "LH":
        h, v = v, h
    if band != "HH":
        if h == 0:
            if v == 0:
                return 0 if d == 0 else (1 if d == 1 else 2)
            return 3 if v == 1 else 4
        if h == 1:
            if v == 0:
                return 5 if d == 0 else 6
            return 7
        return 8
    hv = h + v
    if d == 0:
        return 0 if hv == 0 else (1 if hv == 1 else 2)
    if d == 1:
        return 3 if hv == 0 else (4 if hv == 1 else 5)
    if d == 2:
        return 6 if hv == 0 else 7
    return 8


_SC_TABLE = {(1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
             (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
             (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1)}


class _T1Block:
    """Shared state machine: subclassed by the encoder and decoder so
    the pass logic (the part that must match bit-for-bit) is written
    once. ``sig``/``sgn`` are (h+2, w+2) padded grids — border slots
    stay insignificant, matching the outside-the-codeblock rule."""

    def __init__(self, w: int, h: int, band: str):
        self.w, self.h, self.band = w, h, band
        # plain nested lists (r11): every access in the three coding
        # passes is a scalar read/write on a small grid — numpy scalar
        # indexing cost ~3× the whole pass logic
        self.sig = [[0] * (w + 2) for _ in range(h + 2)]
        self.sgn = [[0] * (w + 2) for _ in range(h + 2)]
        self.refined = [[False] * w for _ in range(h)]
        self.coded = [[False] * w for _ in range(h)]

    def _hvd(self, x: int, y: int) -> tuple[int, int, int]:
        s = self.sig
        xx = x + 1
        up, row, dn = s[y], s[y + 1], s[y + 2]
        hh = row[xx - 1] + row[xx + 1]
        vv = up[xx] + dn[xx]
        dd = up[xx - 1] + up[xx + 1] + dn[xx - 1] + dn[xx + 1]
        return hh, vv, dd

    def _sc(self, x: int, y: int) -> tuple[int, int]:
        s, g = self.sig, self.sgn
        yy, xx = y + 1, x + 1

        def contrib(sy, sx):
            if not s[sy][sx]:
                return 0
            return -1 if g[sy][sx] else 1

        hc = max(-1, min(1, contrib(yy, xx - 1) + contrib(yy, xx + 1)))
        vc = max(-1, min(1, contrib(yy - 1, xx) + contrib(yy + 1, xx)))
        return _SC_TABLE[(hc, vc)]

    def _reset_coded(self) -> None:
        for row in self.coded:
            for i in range(len(row)):
                row[i] = False

    # the three passes; `self.bitop_*` are supplied by the subclass
    def _pass_spp(self) -> None:
        for y0 in range(0, self.h, 4):
            for x in range(self.w):
                for y in range(y0, min(y0 + 4, self.h)):
                    if self.sig[y + 1][x + 1]:
                        continue
                    h, v, d = self._hvd(x, y)
                    if h + v + d == 0:
                        continue
                    became = self.bitop_zc(x, y, _zc_ctx(h, v, d,
                                                         self.band))
                    self.coded[y][x] = True
                    if became:
                        ctx, xr = self._sc(x, y)
                        neg = self.bitop_sc(x, y, ctx, xr)
                        self.sig[y + 1][x + 1] = 1
                        self.sgn[y + 1][x + 1] = neg

    def _pass_mrp(self) -> None:
        for y0 in range(0, self.h, 4):
            for x in range(self.w):
                for y in range(y0, min(y0 + 4, self.h)):
                    if not self.sig[y + 1][x + 1] or self.coded[y][x]:
                        continue
                    if self.refined[y][x]:
                        ctx = 16
                    else:
                        h, v, d = self._hvd(x, y)
                        ctx = 15 if h + v + d else 14
                    self.bitop_mr(x, y, ctx)
                    self.refined[y][x] = True
                    self.coded[y][x] = True

    def _pass_cup(self) -> None:
        for y0 in range(0, self.h, 4):
            for x in range(self.w):
                y = y0
                run = False
                if y0 + 4 <= self.h:
                    run = True
                    for k in range(4):
                        if self.coded[y0 + k][x] \
                                or self.sig[y0 + k + 1][x + 1]:
                            run = False
                            break
                        h, v, d = self._hvd(x, y0 + k)
                        if h + v + d:
                            run = False
                            break
                if run:
                    first = self.bitop_rl(x, y0)
                    if first is None:          # all four insignificant
                        continue
                    y = y0 + first
                    # the first significant sample: sign only (its
                    # significance bit is implied by the RL escape)
                    ctx, xr = self._sc(x, y)
                    neg = self.bitop_sc(x, y, ctx, xr)
                    self.sig[y + 1][x + 1] = 1
                    self.sgn[y + 1][x + 1] = neg
                    self.became(x, y)
                    y += 1
                for yy in range(y, min(y0 + 4, self.h)):
                    if self.coded[yy][x] or self.sig[yy + 1][x + 1]:
                        continue
                    h, v, d = self._hvd(x, yy)
                    became = self.bitop_zc(x, yy, _zc_ctx(h, v, d,
                                                          self.band))
                    if became:
                        ctx, xr = self._sc(x, yy)
                        neg = self.bitop_sc(x, yy, ctx, xr)
                        self.sig[yy + 1][x + 1] = 1
                        self.sgn[yy + 1][x + 1] = neg

    def became(self, x: int, y: int) -> None:   # decoder hook
        pass


class T1Encoder(_T1Block):
    """Encode one codeblock of signed int coefficients → (data bytes,
    n_passes, n_bitplanes). Single MQ codeword segment (default coding
    style), all passes included (lossless)."""

    def __init__(self, coeffs: np.ndarray, band: str):
        h, w = coeffs.shape
        super().__init__(w, h, band)
        cl = np.asarray(coeffs, np.int64).tolist()
        self.mag = [[v if v >= 0 else -v for v in row] for row in cl]
        self.neg = [[1 if v < 0 else 0 for v in row] for row in cl]
        self.mq = MQEncoder()
        self.plane = 0

    def bitop_zc(self, x, y, ctx) -> int:
        bit = (self.mag[y][x] >> self.plane) & 1
        self.mq.encode(bit, ctx)
        return bit

    def bitop_sc(self, x, y, ctx, xorbit) -> int:
        neg = self.neg[y][x]
        self.mq.encode(neg ^ xorbit, ctx)
        return neg

    def bitop_mr(self, x, y, ctx) -> None:
        self.mq.encode((self.mag[y][x] >> self.plane) & 1, ctx)

    def bitop_rl(self, x, y0):
        p = self.plane
        mg = self.mag
        bits = [(mg[y0][x] >> p) & 1, (mg[y0 + 1][x] >> p) & 1,
                (mg[y0 + 2][x] >> p) & 1, (mg[y0 + 3][x] >> p) & 1]
        if not any(bits):
            self.mq.encode(0, _CTX_RL)
            return None
        self.mq.encode(1, _CTX_RL)
        first = bits.index(1)
        self.mq.encode((first >> 1) & 1, _CTX_UNI)
        self.mq.encode(first & 1, _CTX_UNI)
        return first

    def run(self) -> tuple[bytes, int, int]:
        mx = max((v for row in self.mag for v in row), default=0)
        nbp = mx.bit_length()
        if nbp == 0:
            return b"", 0, 0
        npasses = 0
        for p in range(nbp - 1, -1, -1):
            self.plane = p
            self._reset_coded()
            if p != nbp - 1:
                self._pass_spp()
                self._pass_mrp()
                npasses += 2
            self._pass_cup()
            npasses += 1
        return self.mq.flush(), npasses, nbp


class T1Decoder(_T1Block):
    """Decode one codeblock segment → signed int coefficients."""

    def __init__(self, w: int, h: int, band: str, data: bytes,
                 npasses: int, nbp: int):
        super().__init__(w, h, band)
        self.mag = [[0] * w for _ in range(h)]
        self.mq = MQDecoder(data)
        self.npasses = npasses
        self.nbp = nbp
        self.plane = 0

    def bitop_zc(self, x, y, ctx) -> int:
        bit = self.mq.decode(ctx)
        if bit:
            self.mag[y][x] |= 1 << self.plane
        return bit

    def bitop_sc(self, x, y, ctx, xorbit) -> int:
        return self.mq.decode(ctx) ^ xorbit

    def bitop_mr(self, x, y, ctx) -> None:
        self.mag[y][x] |= self.mq.decode(ctx) << self.plane

    def bitop_rl(self, x, y0):
        if not self.mq.decode(_CTX_RL):
            return None
        first = (self.mq.decode(_CTX_UNI) << 1) | self.mq.decode(_CTX_UNI)
        return first

    def became(self, x, y) -> None:
        self.mag[y][x] |= 1 << self.plane

    def run(self) -> np.ndarray:
        left = self.npasses
        p = self.nbp - 1
        first = True
        while left > 0 and p >= 0:
            self.plane = p
            self._reset_coded()
            if not first:
                self._pass_spp()
                left -= 1
                if left <= 0:
                    break
                self._pass_mrp()
                left -= 1
                if left <= 0:
                    break
            self._pass_cup()
            left -= 1
            first = False
            p -= 1
        if self.w == 0 or self.h == 0:
            return np.zeros((self.h, self.w), np.int64)
        out = np.array(self.mag, np.int64)
        for y in range(self.h):
            row = out[y]
            srow = self.sgn[y + 1]
            for x in range(self.w):
                if srow[x + 1]:
                    row[x] = -row[x]
        return out

# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------

def _band_dims(w: int, h: int, levels: int) -> list[dict]:
    """Band dimensions per resolution for an origin-0 image: index 0 =
    {'LL': (w, h)} of the lowest resolution, then {'HL','LH','HH'} per
    level from deepest to finest — matching ``fdwt53``'s output (low
    half gets the ceiling)."""
    dims = [(w, h)]
    for _ in range(levels):
        w, h = (w + 1) // 2, (h + 1) // 2
        dims.append((w, h))
    out = [{"LL": dims[levels]}]
    for k in range(levels, 0, -1):
        pw, ph = dims[k - 1]
        out.append({"HL": (pw // 2, (ph + 1) // 2),
                    "LH": ((pw + 1) // 2, ph // 2),
                    "HH": (pw // 2, ph // 2)})
    return out


def _cb_grid(bw: int, bh: int, cbw: int, cbh: int):
    """Codeblock rectangles (x0, y0, w, h) in raster order plus the
    grid shape, for a band anchored at origin."""
    nx = max(1, -(-bw // cbw))
    ny = max(1, -(-bh // cbh))
    cbs = []
    for gy in range(ny):
        for gx in range(nx):
            x0, y0 = gx * cbw, gy * cbh
            cbs.append((gx, gy, x0, y0,
                        min(cbw, bw - x0), min(cbh, bh - y0)))
    return nx, ny, cbs


def _put_npasses(bw, n: int) -> None:
    if n == 1:
        bw.put_bit(0)
    elif n == 2:
        bw.put(0b10, 2)
    elif n <= 5:
        bw.put(0b11, 2)
        bw.put(n - 3, 2)
    elif n <= 36:
        bw.put(0b1111, 4)
        bw.put(n - 6, 5)
    elif n <= 164:
        bw.put(0b111111111, 9)
        bw.put(n - 37, 7)
    else:
        raise J2KUnsupported(f"{n} coding passes in one packet")


def _get_npasses(br) -> int:
    if not br.get_bit():
        return 1
    if not br.get_bit():
        return 2
    v = br.get(2)
    if v < 3:
        return 3 + v
    v = br.get(5)                     # prefix was '1111'
    if v < 31:
        return 6 + v
    return 37 + br.get(7)             # prefix was nine 1-bits


# ---------------------------------------------------------------------------
# codestream encode
# ---------------------------------------------------------------------------

def encode_j2k(img: np.ndarray, depth: int, signed: bool = False,
               levels: int = 2, cb_exp: tuple[int, int] = (6, 6)
               ) -> bytes:
    """Encode a (h, w) integer image as a lossless single-tile
    single-component J2K codestream (SOC..EOC): DC shift (unsigned),
    multi-level reversible 5/3, EBCOT, one quality layer, LRCP."""
    img = np.asarray(img, np.int64)
    h, w = img.shape
    if not 1 <= depth <= 31:
        raise J2KUnsupported(f"component depth {depth}")
    cbw, cbh = 1 << cb_exp[0], 1 << cb_exp[1]
    guard = 2
    x = img if signed else img - (1 << (depth - 1))
    bands = fdwt53(x, levels)
    banddims = _band_dims(w, h, levels)

    # per-band exponents: Mb = eps + guard - 1 must cover coefficient
    # growth (5/3 gains ≤ 2 bits per orientation step)
    gain = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}
    eps = {b: depth + gain[b] for b in gain}
    # QCD stores each subband exponent in a 5-bit field (e << 3 in one
    # byte); eps > 31 would wrap silently and decode to wrong values.
    # The HH exponent is depth + 2, so depth >= 30 cannot be represented.
    if levels > 0 and max(eps.values()) > 31:
        raise J2KUnsupported(
            f"component depth {depth}: HH subband exponent "
            f"{max(eps.values())} exceeds the 5-bit QCD field")
    if levels == 0 and eps["LL"] > 31:
        raise J2KUnsupported(
            f"component depth {depth}: LL subband exponent exceeds "
            f"the 5-bit QCD field")

    body = bytearray()
    for r in range(levels + 1):
        hdr = _HdrWriter()
        hdr.put_bit(1)                              # packet non-empty
        cb_bytes = bytearray()
        for bname in (("LL",) if r == 0 else ("HL", "LH", "HH")):
            arr = bands[r][bname]
            bw_, bh_ = banddims[r][bname]
            assert arr.shape == (bh_, bw_), (arr.shape, bw_, bh_)
            nx, ny, cbs = _cb_grid(bw_, bh_, cbw, cbh)
            incl = TagTree(nx, ny)
            zbp_t = TagTree(nx, ny)
            coded = []
            mb = eps[bname] + guard - 1
            for gx, gy, x0, y0, cw, ch in cbs:
                blk = arr[y0:y0 + ch, x0:x0 + cw]
                data, npasses, nbp = T1Encoder(blk, bname).run()
                if nbp > mb:
                    raise ValueError("J2K exponent budget too small")
                incl.set(gx, gy, 0 if npasses else 1)
                zbp_t.set(gx, gy, mb - nbp if npasses else 0)
                coded.append((gx, gy, data, npasses))
            incl.finalize()
            zbp_t.finalize()
            for gx, gy, data, npasses in coded:
                incl.encode(hdr, gx, gy, 1)
                if not npasses:
                    continue
                # zero-bitplane tag tree: encode with rising threshold
                # until the leaf resolves
                t = 1
                while True:
                    zbp_t.encode(hdr, gx, gy, t)
                    if zbp_t.value[0][gy][gx] < t:
                        break
                    t += 1
                _put_npasses(hdr, npasses)
                lblock = 3
                nbits = len(data).bit_length()
                need = lblock + int(np.floor(np.log2(npasses)))
                while nbits > need:
                    hdr.put_bit(1)
                    lblock += 1
                    need += 1
                hdr.put_bit(0)
                hdr.put(len(data), need)
                cb_bytes += data
        body += hdr.flush() + bytes(cb_bytes)

    def marker(code: int, payload: bytes) -> bytes:
        return struct.pack(">HH", code, len(payload) + 2) + payload

    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, 1) \
        + bytes([(depth - 1) | (0x80 if signed else 0), 1, 1])
    cod = bytes([0,                       # Scod: default precincts
                 0]) + struct.pack(">H", 1) + bytes([
                 0,                       # no MCT
                 levels, cb_exp[0] - 2, cb_exp[1] - 2,
                 0,                       # default cb style
                 1])                      # 5/3 reversible
    sub_eps = [eps["LL"]] + [eps[b] for _ in range(levels)
                             for b in ("HL", "LH", "HH")]
    qcd = bytes([(guard << 5) | 0]) + bytes((e << 3) & 0xFF
                                            for e in sub_eps)
    main = b"\xff\x4f" + marker(0xFF51, siz) + marker(0xFF52, cod) \
        + marker(0xFF5C, qcd)
    psot = 12 + 2 + len(body)
    sot = marker(0xFF90, struct.pack(">HIBB", 0, psot, 0, 1))
    return main + sot + b"\xff\x93" + bytes(body) + b"\xff\xd9"

# ---------------------------------------------------------------------------
# codestream decode
# ---------------------------------------------------------------------------

def decode_j2k(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a J2K codestream → ((h, w) int64 image, info dict with
    width/height/depth/signed/levels). Profile limits raise
    ``J2KUnsupported`` by name."""
    if data[:2] != b"\xff\x4f":
        raise ValueError("J2K codestream without SOC")
    pos = 2
    siz = cod = qcd = None
    sot_seen = False
    body_start = body_end = None
    while pos < len(data):
        (code,) = struct.unpack_from(">H", data, pos)
        if code == 0xFFD9:                        # EOC
            break
        if code == 0xFF93:                        # SOD
            if not sot_seen:
                raise ValueError("J2K SOD before SOT")
            body_start = pos + 2
            # Psot spans SOT marker .. tile-part end (EOC excluded)
            body_end = sot_pos + psot if psot else len(data) - 2
            pos = body_end
            continue
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4:pos + 2 + ln]
        if code == 0xFF51:
            siz = seg
        elif code == 0xFF52:
            cod = seg
        elif code == 0xFF5C:
            qcd = seg
        elif code == 0xFF90:
            sot_seen = True
            sot_pos = pos
            _isot, psot, tpsot, _tnsot = struct.unpack_from(
                ">HIBB", seg, 0)
            if _isot != 0 or tpsot != 0:
                raise J2KUnsupported("J2K multi-tile / multi-tile-part "
                                     "codestream (single tile only)")
        elif code in (0xFF64, 0xFF63, 0xFF55, 0xFF58, 0xFF5F,
                      0xFF60, 0xFF61):            # COM/informational
            pass
        elif code in (0xFF53, 0xFF5D):            # COC / QCC
            raise J2KUnsupported("J2K per-component COC/QCC overrides")
        else:
            raise J2KUnsupported(f"J2K marker 0x{code:04X}")
        pos += 2 + ln
    if siz is None or cod is None or qcd is None or body_start is None:
        raise ValueError("J2K codestream missing SIZ/COD/QCD/SOD")

    (_rsiz, xsiz, ysiz, xo, yo, xt, yt, xto, yto, ncomp) = \
        struct.unpack_from(">HIIIIIIIIH", siz, 0)
    if ncomp != 1:
        raise J2KUnsupported(f"J2K with {ncomp} components (1 only)")
    if xo or yo or xto or yto or xt < xsiz or yt < ysiz:
        raise J2KUnsupported("J2K tiled / offset grid (single tile at "
                             "origin only)")
    ssiz, xr, yr = siz[36], siz[37], siz[38]
    if xr != 1 or yr != 1:
        raise J2KUnsupported("J2K component subsampling")
    depth = (ssiz & 0x7F) + 1
    signed = bool(ssiz & 0x80)
    w, h = int(xsiz), int(ysiz)

    scod = cod[0]
    prog, layers, mct = cod[1], struct.unpack_from(">H", cod, 2)[0], \
        cod[4]
    levels = cod[5]
    cbw_exp, cbh_exp = (cod[6] & 0x0F) + 2, (cod[7] & 0x0F) + 2
    cb_style, transform = cod[8], cod[9]
    use_sop = bool(scod & 0x02)
    use_eph = bool(scod & 0x04)
    if scod & 0x01:
        raise J2KUnsupported("J2K user-defined precincts")
    if prog > 4:
        raise J2KUnsupported(f"J2K progression order {prog}")
    if mct:
        raise J2KUnsupported("J2K multiple component transform")
    if cb_style:
        raise J2KUnsupported(f"J2K codeblock style 0x{cb_style:02X} "
                             "(default context formation only)")
    if transform != 1:
        raise J2KUnsupported("J2K 9/7 irreversible transform "
                             "(lossless 5/3 only)")
    cbw, cbh = 1 << cbw_exp, 1 << cbh_exp

    qstyle = qcd[0] & 0x1F
    guard = qcd[0] >> 5
    if qstyle != 0:
        raise J2KUnsupported("J2K scalar quantization (reversible "
                             "no-quantization only)")
    sub_eps = [b >> 3 for b in qcd[1:]]
    need = 1 + 3 * levels
    if len(sub_eps) < need:
        raise ValueError("J2K QCD too short for the decomposition")

    banddims = _band_dims(w, h, levels)
    # per-resolution band blocks: state per codeblock
    res_state = []
    eps_idx = 0
    for r in range(levels + 1):
        bandstates = {}
        for bname in (("LL",) if r == 0 else ("HL", "LH", "HH")):
            bw_, bh_ = banddims[r][bname]
            nx, ny, cbs = _cb_grid(bw_, bh_, cbw, cbh)
            mb = sub_eps[eps_idx] + guard - 1
            eps_idx += 1
            bandstates[bname] = {
                "dims": (bw_, bh_), "grid": (nx, ny), "cbs": cbs,
                "mb": mb, "incl": TagTree(nx, ny),
                "zbp": TagTree(nx, ny),
                "included": [[False] * nx for _ in range(ny)],
                "zbp_v": [[0] * nx for _ in range(ny)],
                "data": [[bytearray() for _ in range(nx)]
                         for _ in range(ny)],
                "passes": [[0] * nx for _ in range(ny)],
                "lblock": [[3] * nx for _ in range(ny)],
            }
        res_state.append(bandstates)

    body = data[body_start:body_end]
    bpos = 0

    def parse_packet(r: int, layer: int) -> None:
        nonlocal bpos
        if use_sop:
            if body[bpos:bpos + 2] == b"\xff\x91":
                bpos += 6
        br = _HdrReader(body, bpos)
        contributions = []
        if br.get_bit():                          # non-empty packet
            for bname in (("LL",) if r == 0 else ("HL", "LH", "HH")):
                st = res_state[r][bname]
                nx, ny = st["grid"]
                for gx, gy, x0, y0, cw, ch in st["cbs"]:
                    if not st["included"][gy][gx]:
                        inc = st["incl"].decode(br, gx, gy, layer + 1)
                    else:
                        inc = bool(br.get_bit())
                    if not inc:
                        continue
                    if not st["included"][gy][gx]:
                        t = 1
                        while not st["zbp"].decode(br, gx, gy, t):
                            t += 1
                        st["zbp_v"][gy][gx] = t - 1
                        st["included"][gy][gx] = True
                    np_ = _get_npasses(br)
                    st["passes"][gy][gx] += np_
                    lblock = int(st["lblock"][gy][gx])
                    while br.get_bit():
                        lblock += 1
                    st["lblock"][gy][gx] = lblock
                    nbits = lblock + int(np.floor(np.log2(np_)))
                    ln = br.get(nbits)
                    contributions.append((st, gx, gy, ln))
        pos2 = br.align()
        if use_eph:
            if body[pos2:pos2 + 2] == b"\xff\x92":
                pos2 += 2
        for st, gx, gy, ln in contributions:
            st["data"][gy][gx] += body[pos2:pos2 + ln]
            pos2 += ln
        bpos = pos2

    if prog == 0:                                 # LRCP
        for layer in range(layers):
            for r in range(levels + 1):
                parse_packet(r, layer)
    else:                                         # R-major families
        for r in range(levels + 1):
            for layer in range(layers):
                parse_packet(r, layer)

    bands: list[dict] = [dict() for _ in range(levels + 1)]
    for r in range(levels + 1):
        for bname in (("LL",) if r == 0 else ("HL", "LH", "HH")):
            st = res_state[r][bname]
            bw_, bh_ = st["dims"]
            arr = np.zeros((bh_, bw_), np.int64)
            for gx, gy, x0, y0, cw, ch in st["cbs"]:
                np_ = int(st["passes"][gy][gx])
                if not np_:
                    continue
                nbp = st["mb"] - int(st["zbp_v"][gy][gx])
                dec = T1Decoder(cw, ch, bname,
                                bytes(st["data"][gy][gx]), np_, nbp)
                arr[y0:y0 + ch, x0:x0 + cw] = dec.run()
            bands[r][bname] = arr
    img = idwt53(bands)
    if not signed:
        img = img + (1 << (depth - 1))
    info = {"width": w, "height": h, "depth": depth, "signed": signed,
            "levels": levels}
    return img, info
