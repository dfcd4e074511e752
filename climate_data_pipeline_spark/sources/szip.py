"""Szip (CCSDS 121.0-B extended-Rice) codec — pure Python, no
szlib/libaec: the HDF5 filter (id 4) that CMIP/ERA5-era archive files
frequently carry, written against the public CCSDS 121.0-B lossless
data compression recommendation (the adaptive entropy coder szlib and
libaec implement) and the public HDF5 ``H5Zszip`` client-data layout.

The coded stream is a sequence of J-sample blocks, each prefixed by an
option ID (3/4/5 bits for ≤8/≤16/≤32 bits per pixel):

- ``id == 0`` + 1 selector bit → low-entropy options: **zero-block**
  (an FS-coded run length of all-zero blocks, with the remainder-of-
  segment escape at runs ≥ 5 reaching a 64-block segment boundary) or
  **second extension** (pairs of samples mapped through the diagonal
  enumeration ``γ = (d0+d1)(d0+d1+1)/2 + d1``, FS-coded),
- ``1 ≤ id < 2^len − 1`` → **split-sample** option ``k = id − 1``:
  every sample's high part is fundamental-sequence (unary) coded,
  then the block's k-bit low parts follow — FS parts first, THEN the
  LSB parts, the defining "split",
- ``id == 2^len − 1`` → **no compression**: raw n-bit samples.

With nearest-neighbor preprocessing (``NN_OPTION_MASK``, what HDF5
always sets for integer data) each scanline is one reference-sample
interval: the first sample travels raw (n bits, directly after the
first block's ID/selector) and every later sample is the standard
CCSDS unit-delay mapped difference — non-negative, zigzag-folded
against the ``θ = min(prev − xmin, xmax − prev)`` saturation bound.

HDF5 framing (``H5Zszip.c``): chunk payload = 4-byte little-endian
original byte count, then the coded stream; client data =
``(options_mask, bits_per_pixel, pixels_per_block,
pixels_per_scanline)``; ``LSB/MSB_OPTION_MASK`` names the byte order
of the DECODED sample buffer (the coded stream itself is always
MSB-first bit packing).

Reference parity: the reference reads szip-compressed NetCDF4 through
libnetcdf+szlib (`ingest/netcdf_reader.py` accepts whatever the
ecosystem wrote); this module closes the same seam for the pure-Python
HDF5 reader in ``sources/hdf5.py``.
"""

from __future__ import annotations

import struct

import numpy as np

ALLOW_K13_OPTION_MASK = 1
EC_OPTION_MASK = 4
LSB_OPTION_MASK = 8
MSB_OPTION_MASK = 16
NN_OPTION_MASK = 32
RAW_OPTION_MASK = 128

_SEGMENT_BLOCKS = 64


def _id_len(bpp: int) -> int:
    return 5 if bpp > 16 else 4 if bpp > 8 else 3


class _BitReader:
    """Vectorized bit reader: the payload is unpacked to a bit array
    ONCE (np.unpackbits) and the one-bit positions are indexed for
    fundamental-sequence scans — FS codewords resolve by searchsorted
    over ``ones`` instead of a per-bit Python loop, and multi-field
    reads (k-bit low parts, uncompressed blocks) come back as one
    reshape-matmul. Decoding a ~1M-sample CMIP/ERA5 chunk is numpy
    work, not interpreted bit twiddling."""
    __slots__ = ("bits", "ones", "pos", "nbits")

    _W: dict[int, np.ndarray] = {}

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0
        self.nbits = self.bits.size

    @classmethod
    def _weights(cls, n: int) -> np.ndarray:
        w = cls._W.get(n)
        if w is None:
            w = cls._W[n] = (1 << np.arange(n - 1, -1, -1)) \
                .astype(np.int64)
        return w

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("szip stream exhausted mid-field")
        sl = self.bits[self.pos:self.pos + n]
        self.pos += n
        return int(sl.astype(np.int64) @ self._weights(n))

    def get_run(self, width: int, count: int) -> np.ndarray:
        """``count`` consecutive ``width``-bit MSB-first fields as one
        int64 array (zero-width → zeros)."""
        if count == 0 or width == 0:
            return np.zeros(count, np.int64)
        need = width * count
        if self.pos + need > self.nbits:
            raise ValueError("szip stream exhausted mid-field")
        sl = self.bits[self.pos:self.pos + need]
        self.pos += need
        return (sl.reshape(count, width).astype(np.int64)
                @ self._weights(width))

    def get_fs(self) -> int:
        """Fundamental sequence: count zeros up to the terminating 1."""
        i = int(np.searchsorted(self.ones, self.pos))
        if i >= self.ones.size:
            raise ValueError("szip stream exhausted inside an FS "
                             "codeword")
        one = int(self.ones[i])
        n = one - self.pos
        self.pos = one + 1
        return n

    def get_fs_run(self, count: int) -> np.ndarray:
        """``count`` back-to-back FS codewords as one int64 array:
        the zero-run lengths are first differences of the next
        ``count`` one-bit positions."""
        if count == 0:
            return np.zeros(0, np.int64)
        i = int(np.searchsorted(self.ones, self.pos))
        if i + count > self.ones.size:
            raise ValueError("szip stream exhausted inside an FS "
                             "codeword")
        sel = self.ones[i:i + count].astype(np.int64)
        fs = np.diff(sel, prepend=np.int64(self.pos - 1)) - 1
        self.pos = int(sel[-1]) + 1
        return fs


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, val: int, n: int) -> None:
        if n == 0:
            return
        if val >> n:
            raise ValueError(f"value {val} overflows {n} bits")
        self.acc = (self.acc << n) | val
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def put_fs(self, val: int) -> None:
        while val >= 16:
            self.put(0, 16)
            val -= 16
        self.put(1, val + 1)

    def put_bits(self, bits: np.ndarray) -> None:
        """Append a uint8 0/1 bit array in one packbits call — the
        vectorized bulk path for whole-block unary + low-bit streams
        (the per-value put()/put_fs() loops were the encoder's cost
        on ~1M-sample chunks)."""
        if self.nacc:
            prefix = ((self.acc >> np.arange(self.nacc - 1, -1, -1))
                      & 1).astype(np.uint8)
            bits = np.concatenate([prefix, bits])
            self.acc = self.nacc = 0
        n8 = (bits.size // 8) * 8
        self.out += np.packbits(bits[:n8]).tobytes()
        for b in bits[n8:].tolist():          # ≤ 7 tail bits
            self.acc = (self.acc << 1) | int(b)
            self.nacc += 1

    def align(self) -> None:
        """Pad to a byte boundary (AEC_PAD_RSI scanline alignment)."""
        if self.nacc:
            self.out.append((self.acc << (8 - self.nacc)) & 0xFF)
            self.acc = self.nacc = 0

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


def _unmap(mapped: np.ndarray, bpp: int) -> np.ndarray:
    """Undo NN preprocessing over ONE reference-sample interval:
    slot 0 is the raw reference, later slots are mapped differences.

    Vectorized on the zigzag fast path: while every mapped value
    satisfies ``d ≤ 2θ`` the deltas are plain zigzag and the sample
    sequence is one cumsum — and zigzag deltas can never leave
    [0, xmax], so the FIRST violation of ``d > 2θ`` (computed against
    the optimistic prefix, which is exact up to that point) is the
    only place the saturated branch can start. Each saturated sample
    is handled scalar, then the vector pass resumes — real imagery
    saturates rarely, so the common cost is one cumsum per interval."""
    xmax = (1 << bpp) - 1
    n = mapped.size
    out = np.empty(n, np.int64)
    prev = int(mapped[0])
    if prev < 0 or prev > xmax:
        raise ValueError("szip NN unmap left the sample range — "
                         "corrupt stream or wrong parameters")
    out[0] = prev
    t = 1
    while t < n:
        d = mapped[t:]
        zig = np.where(d & 1, -((d + 1) >> 1), d >> 1)
        x = prev + np.cumsum(zig)
        prevs = np.empty_like(x)
        prevs[0] = prev
        prevs[1:] = x[:-1]
        theta = np.minimum(prevs, xmax - prevs)
        bad = np.flatnonzero(d > 2 * theta)
        stop = int(bad[0]) if bad.size else int(d.size)
        out[t:t + stop] = x[:stop]
        t += stop
        if stop < d.size:
            p = int(prevs[stop])
            dd, th = int(d[stop]), int(theta[stop])
            p += dd - th if th == p else th - dd
            if p < 0 or p > xmax:
                raise ValueError("szip NN unmap left the sample range "
                                 "— corrupt stream or wrong "
                                 "parameters")
            out[t] = prev = p
            t += 1
        elif stop:
            prev = int(x[stop - 1])
    return out


def _map_deltas(x: np.ndarray, bpp: int) -> np.ndarray:
    """NN-preprocess one scanline: slot 0 raw, later slots mapped.
    Unlike the unmap, the forward map has NO recurrence (θ depends on
    the previous ORIGINAL sample) — fully vectorized."""
    xmax = (1 << bpp) - 1
    out = np.empty(x.size, np.int64)
    out[0] = x[0]
    if x.size > 1:
        prev, cur = x[:-1], x[1:]
        delta = cur - prev
        theta = np.minimum(prev, xmax - prev)
        zig = np.where(delta >= 0, 2 * delta, -2 * delta - 1)
        out[1:] = np.where(np.abs(delta) <= theta, zig,
                           theta + np.abs(delta))
    return out


def _se_split(gamma: int) -> tuple[int, int]:
    """Invert γ = β(β+1)/2 + d1 (diagonal pair enumeration)."""
    beta = int((np.sqrt(8.0 * gamma + 1.0) - 1.0) // 2)
    while (beta + 1) * (beta + 2) // 2 <= gamma:
        beta += 1
    while beta * (beta + 1) // 2 > gamma:
        beta -= 1
    d1 = gamma - beta * (beta + 1) // 2
    return beta - d1, d1


def szip_decode(payload: bytes, options_mask: int, bpp: int,
                pixels_per_block: int, pixels_per_scanline: int,
                n_pixels: int, pad_scanline: bool = False) -> np.ndarray:
    """Decode a CCSDS 121.0 coded stream of ``n_pixels`` samples →
    int64 array. Raises ``ValueError`` on malformed streams and
    ``NotImplementedError`` on parameters outside the profile.
    Block sizes up to 64 cover the 121.0-B-2 (libaec) profile GRIB2
    template 5.42 uses; ``pad_scanline`` byte-aligns the stream after
    every reference-sample interval (libaec's AEC_PAD_RSI)."""
    if not 1 <= bpp <= 32:
        raise NotImplementedError(f"szip bits-per-pixel {bpp} "
                                  "(1..32 only)")
    if pixels_per_block < 2 or pixels_per_block > 64 \
            or pixels_per_block % 2:
        raise ValueError(f"szip pixels-per-block {pixels_per_block}")
    preprocess = bool(options_mask & NN_OPTION_MASK)
    idl = _id_len(bpp)
    uncomp_id = (1 << idl) - 1
    r = _BitReader(payload)
    J = pixels_per_block
    out = np.empty(n_pixels, np.int64)
    done = 0
    while done < n_pixels:
        scan_px = min(pixels_per_scanline, n_pixels - done)
        mapped = np.zeros(scan_px, np.int64)
        nblocks = (scan_px + J - 1) // J
        b = 0
        while b < nblocks:
            lo = b * J
            nb = min(J, scan_px - lo)
            ref = 1 if (preprocess and b == 0) else 0
            bid = r.get(idl)
            if bid == 0:
                second_ext = r.get(1)
                if ref:
                    mapped[0] = r.get(bpp)
                if second_ext:
                    i = ref
                    while i < nb:
                        gamma = r.get_fs()
                        d0, d1 = _se_split(gamma)
                        if (i & 1) == 0:
                            mapped[lo + i] = d0
                            i += 1
                            if i >= nb:
                                raise ValueError(
                                    "szip second-extension pair "
                                    "overruns the block")
                        mapped[lo + i] = d1
                        i += 1
                    b += 1
                else:
                    fs = r.get_fs()
                    seg_start = (b // _SEGMENT_BLOCKS) * _SEGMENT_BLOCKS
                    seg_end = min(seg_start + _SEGMENT_BLOCKS, nblocks)
                    if fs == 4:
                        z = seg_end - b          # remainder of segment
                    elif fs < 4:
                        z = fs + 1
                    else:
                        z = fs
                    if b + z > nblocks:
                        raise ValueError("szip zero-block run overruns "
                                         "the scanline")
                    b += z                       # slots already zero
            elif bid == uncomp_id:
                mapped[lo:lo + nb] = r.get_run(bpp, nb)
                b += 1
            else:
                k = bid - 1
                if ref:
                    mapped[0] = r.get(bpp)
                # the defining split: FS high parts for the whole
                # block first, THEN the k-bit low parts — two
                # vectorized reads, no per-sample loop
                fs = r.get_fs_run(nb - ref)
                mapped[lo + ref:lo + nb] = (fs << k) | r.get_run(
                    k, nb - ref)
                b += 1
        if preprocess:
            out[done:done + scan_px] = _unmap(mapped, bpp)
        else:
            out[done:done + scan_px] = mapped
        done += scan_px
        if pad_scanline:
            r.pos = (r.pos + 7) & ~7
    return out


def szip_encode(samples: np.ndarray, options_mask: int, bpp: int,
                pixels_per_block: int,
                pixels_per_scanline: int,
                pad_scanline: bool = False) -> bytes:
    """Encode samples (non-negative, < 2^bpp) into a CCSDS 121.0
    stream ``szip_decode`` inverts bit-exactly. Chooses per block among
    zero-block runs (with the remainder-of-segment escape), the best
    split-sample k, and no-compression; second extension is decoder-
    side only (pinned by hand-assembled streams in the tests).
    ``pad_scanline`` byte-aligns after every reference interval
    (AEC_PAD_RSI)."""
    x = np.asarray(samples, np.int64)
    if x.size == 0:
        raise ValueError("szip wants at least one sample")
    if int(x.min()) < 0 or int(x.max()) >> bpp:
        raise ValueError(f"samples outside [0, 2^{bpp})")
    preprocess = bool(options_mask & NN_OPTION_MASK)
    idl = _id_len(bpp)
    uncomp_id = (1 << idl) - 1
    J = pixels_per_block
    w = _BitWriter()
    for s0 in range(0, x.size, pixels_per_scanline):
        scan = x[s0:s0 + pixels_per_scanline]
        mapped = _map_deltas(scan, bpp) if preprocess else scan
        nblocks = (scan.size + J - 1) // J
        b = 0
        while b < nblocks:
            lo = b * J
            nb = min(J, scan.size - lo)
            ref = 1 if (preprocess and b == 0) else 0
            body = mapped[lo + ref:lo + nb]
            # greedy zero run (block all-zero beyond the ref slot)
            if body.size and not body.any():
                z = 1
                seg_end = min((b // _SEGMENT_BLOCKS + 1)
                              * _SEGMENT_BLOCKS, nblocks)
                while b + z < seg_end \
                        and not mapped[(b + z) * J:
                                       min((b + z + 1) * J,
                                           scan.size)].any():
                    z += 1
                w.put(0, idl)
                w.put(0, 1)
                if ref:
                    w.put(int(mapped[0]), bpp)
                if b + z == seg_end and z >= 5:
                    w.put_fs(4)                  # remainder of segment
                elif z <= 4:
                    w.put_fs(z - 1)
                else:
                    w.put_fs(z)
                b += z
                continue
            # both options emit the reference sample at bpp bits, so
            # cost ONLY the non-reference body on both sides — an
            # nb*bpp baseline would bias selection toward split-sample
            # by ref*bpp bits (ratio-only; round-trip unaffected)
            best_k, best_cost = -1, (nb - ref) * bpp

            for k in range(0, max(bpp - 1, 1)):
                cost = int((body >> k).sum()) + body.size * (k + 1)
                if cost < best_cost:
                    best_k, best_cost = k, cost
            if best_k < 0 or best_k + 1 >= uncomp_id:
                w.put(uncomp_id, idl)
                blk = mapped[lo:lo + nb]
                w.put_bits(((blk[:, None]
                             >> np.arange(bpp - 1, -1, -1)) & 1)
                           .astype(np.uint8).reshape(-1))
            else:
                k = best_k
                w.put(k + 1, idl)
                if ref:
                    w.put(int(mapped[0]), bpp)
                hi = body >> k
                unary = np.zeros(int(hi.sum()) + hi.size, np.uint8)
                unary[np.cumsum(hi + 1) - 1] = 1
                if k:
                    low = ((body[:, None]
                            >> np.arange(k - 1, -1, -1)) & 1) \
                        .astype(np.uint8).reshape(-1)
                    w.put_bits(np.concatenate([unary, low]))
                else:
                    w.put_bits(unary)
            b += 1
        if pad_scanline:
            w.align()
    return w.bytes()


def _sample_dtype(options_mask: int, bpp: int) -> np.dtype:
    width = 1 if bpp <= 8 else 2 if bpp <= 16 else 4
    if width == 1:
        return np.dtype(np.uint8)
    order = ">" if options_mask & MSB_OPTION_MASK else "<"
    return np.dtype(f"{order}u{width}")


def h5_szip_decode(chunk: bytes, client: tuple) -> bytes:
    """Undo the HDF5 szip filter on one chunk: 4-byte LE original
    size, then the coded stream; client data per ``H5Zszip`` is
    ``(options_mask, bpp, pixels_per_block, pixels_per_scanline)``.
    Returns raw bytes in the byte order the options mask names."""
    if len(client) < 4:
        raise ValueError("szip filter with fewer than 4 client values")
    mask, bpp, ppb, pps = (int(v) for v in client[:4])
    (orig,) = struct.unpack_from("<I", chunk, 0)
    dt = _sample_dtype(mask, bpp)
    if orig % dt.itemsize:
        raise ValueError("szip original size not a whole number of "
                         "samples")
    vals = szip_decode(chunk[4:], mask, bpp, ppb, pps,
                       orig // dt.itemsize)
    return vals.astype(dt).tobytes()


def h5_szip_encode(raw: bytes, client: tuple) -> bytes:
    """Apply the HDF5 szip filter framing (fixture writer twin)."""
    mask, bpp, ppb, pps = (int(v) for v in client[:4])
    dt = _sample_dtype(mask, bpp)
    vals = np.frombuffer(raw, dt).astype(np.int64)
    return (struct.pack("<I", len(raw))
            + szip_encode(vals, mask, bpp, ppb, pps))
