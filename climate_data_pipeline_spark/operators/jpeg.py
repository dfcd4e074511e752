"""JPEG (ITU-T T.81) codec — pure python + numpy, no external media
libraries, closing the last real-image-codec seam in
``decode_media_real`` (PGM/PPM/PNG/WAV landed earlier; JPEG was a loud
``NotImplementedError``).

Scope: baseline DCT (SOF0/1) — grayscale and YCbCr at 4:4:4 / 4:2:2 /
4:2:0, restart markers — AND progressive DCT (SOF2, Annex G): spectral
selection, successive approximation (DC + AC first/refinement scans),
EOB-run coding, interleaved DC scans, non-interleaved AC scans, DRI/RSTn
— together the profiles that cover essentially every camera/web JPEG.
Arithmetic coding, 12-bit and hierarchical modes raise loudly: real
seams, not silent wrong pixels. ``decode_jpeg`` dispatches on the SOF
marker; ``decode_jpeg_baseline`` keeps its strict baseline contract.

Everything here is written against the public spec (ITU-T T.81 / ISO
10918-1): the zigzag order and quantization/Huffman example tables are
Annex K, the entropy coding is F.1.2/F.2.2, the DCT is A.3.3. The test
suite pins the canonical-code construction with a hand-assembled golden
bitstream (known Annex-K codewords) plus encode/decode property sweeps —
the same spec-fixture pattern as the netcdf3/hdf5/zarr/safetensors
codecs in ``sources/``.

The encoder exists so the decoder can be exercised against genuinely
compressed containers (``synthesize_jpeg`` → ``decode_media_real``)
without shipping binary fixtures; it is a real, general baseline
encoder (any 8-bit gray/RGB image, any quality), mirrored after the
``synthesize_png`` pattern in ``multimodal.py``.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# Annex K.1 zigzag: index in scan order -> flat (row*8+col) position
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 / K.2 example quantization tables (luminance, chrominance)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K.3 example Huffman tables: (BITS[1..16], HUFFVAL)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """8-point DCT-II basis per T.81 A.3.3: S = T @ s @ T.T, s = T.T @ S @ T."""
    n = np.arange(8)
    T = 0.5 * np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0)
    T[0] *= 1.0 / np.sqrt(2.0)
    return T


_T = _dct_matrix()


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Symbol -> (code, length) per the canonical construction of C.2.
    Memoized on the table contents: rebuilding per payload dominated
    small-image codec time (the Annex-K tables recur on every call).
    lru_cache bounds the memo — wild corpora carry per-image optimized
    DHTs, and an unbounded dict would grow for the executor's life."""
    return _canonical_codes_cached(tuple(bits), tuple(huffval))


@functools.lru_cache(maxsize=512)
def _canonical_codes_cached(bits: tuple, huffval: tuple) -> dict:
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time reader."""
    return _decode_table_cached(tuple(bits), tuple(huffval))


@functools.lru_cache(maxsize=512)
def _decode_table_cached(bits: tuple, huffval: tuple) -> dict:
    return {(ln, c): sym
            for sym, (c, ln) in _canonical_codes_cached(bits,
                                                        huffval).items()}


def scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality scaling: 5000/q below 50, 200-2q above."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing (F.1.2.3)
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def byte_align(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1-bits (B.2.5)


def _magnitude(v: int) -> tuple[int, int]:
    """(SSSS category, appended bits) per F.1.2.1.2 / F.1.4."""
    if v == 0:
        return 0, 0
    ssss = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _encode_block(w: _BitWriter, coef_zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Huffman-encode one zigzagged, quantized block; returns new DC pred."""
    dc = int(coef_zz[0])
    ssss, bits = _magnitude(dc - pred)
    code, ln = dc_codes[ssss]
    w.write(code, ln)
    if ssss:
        w.write(bits, ssss)
    # walk only the NONZERO ACs (typical blocks are sparse; the
    # block-constant synthesis paths have none at all)
    nz = np.nonzero(coef_zz[1:])[0]
    prev = 0
    for i in nz:
        run = int(i) - prev
        prev = int(i) + 1
        while run > 15:
            code, ln = ac_codes[0xF0]      # ZRL
            w.write(code, ln)
            run -= 16
        ssss, bits = _magnitude(int(coef_zz[i + 1]))
        code, ln = ac_codes[(run << 4) | ssss]
        w.write(code, ln)
        w.write(bits, ssss)
    if prev < 63:
        code, ln = ac_codes[0x00]          # EOB
        w.write(code, ln)
    return dc


def _fdct_quant_batch(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize a whole (n, 8, 8) stack in three numpy
    calls (per-block numpy dispatch dominated encode time ~20×), with
    per-block quant tables (n, 8, 8). Returns zigzagged (n, 64).
    Stacked matmul, not einsum — einsum's per-call path search cost
    more than the contraction itself at these shapes."""
    coef = _T @ (blocks - 128.0) @ _T.T
    # round-half-up symmetric with the decoder's final pixel rounding
    zz = np.floor(coef / q + 0.5).astype(np.int64).reshape(-1, 64)
    return zz[:, ZIGZAG]


def _pad_to_block(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg_baseline(px: np.ndarray, quality: int = 75,
                         subsampling: str = "444",
                         restart_interval: int = 0,
                         quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
                         ) -> bytes:
    """Encode an 8-bit image — (h, w) grayscale or (h, w, 3) RGB — as a
    baseline JFIF JPEG with the Annex-K Huffman tables. ``subsampling``
    is ``"444"`` or ``"420"`` (ignored for grayscale);
    ``restart_interval`` > 0 emits DRI + RSTn every that many MCUs;
    ``quant_tables`` overrides the quality-scaled Annex-K tables with
    explicit (luma, chroma) 8×8 arrays."""
    px = np.asarray(px)
    if px.dtype != np.uint8:
        raise ValueError("encode_jpeg_baseline wants uint8 pixels")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB")
    if subsampling not in ("444", "422", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = px.shape[:2]

    if quant_tables is not None:
        qL, qC = (np.asarray(t, dtype=np.int64) for t in quant_tables)
    else:
        qL = scaled_quant(QUANT_LUMA, quality)
        qC = scaled_quant(QUANT_CHROMA, quality)

    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "420":
            pcb = _pad_to_block(cb, 2)
            pcr = _pad_to_block(cr, 2)
            cb = pcb.reshape(pcb.shape[0] // 2, 2,
                             pcb.shape[1] // 2, 2).mean((1, 3))
            cr = pcr.reshape(pcr.shape[0] // 2, 2,
                             pcr.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "422":
            pcb = _pad_to_block(cb, 2) if cb.shape[1] % 2 else cb
            pcr = _pad_to_block(cr, 2) if cr.shape[1] % 2 else cr
            cb = pcb.reshape(pcb.shape[0], pcb.shape[1] // 2, 2).mean(2)
            cr = pcr.reshape(pcr.shape[0], pcr.shape[1] // 2, 2).mean(2)
            samp = [(2, 1), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    planes = [np.clip(np.floor(p + 0.5), 0, 255) for p in planes]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad every component to its own block multiple within the MCU grid
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        pp = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                    mode="edge")
        padded.append(pp)

    dcL = _canonical_codes(*HUFF_DC_LUMA)
    acL = _canonical_codes(*HUFF_AC_LUMA)
    dcC = _canonical_codes(*HUFF_DC_CHROMA)
    acC = _canonical_codes(*HUFF_AC_CHROMA)
    dc_codes = [dcL] + [dcC] * (len(planes) - 1)
    ac_codes = [acL] + [acC] * (len(planes) - 1)
    qtabs = [qL, qC]

    # gather every block in MCU traversal order, batch-DCT the stack,
    # then entropy-code sequentially (DC prediction is order-dependent)
    specs: list[int] = []     # component index per block, in order
    blocks: list[np.ndarray] = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for dy in range(sv):
                    for dx in range(sh):
                        by, bx = my * sv + dy, mx * sh + dx
                        blocks.append(p[8 * by:8 * by + 8,
                                        8 * bx:8 * bx + 8])
                        specs.append(ci)
    qstack = np.stack([qtabs[qsel[ci]] for ci in specs]).astype(np.float64)
    zz_all = _fdct_quant_batch(np.stack(blocks), qstack)

    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    blocks_per_mcu = sum(sh * sv for sh, sv in samp)
    for bi, ci in enumerate(specs):
        if (restart_interval and bi
                and bi % (restart_interval * blocks_per_mcu) == 0):
            bw.byte_align()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * len(planes)
        preds[ci] = _encode_block(bw, zz_all[bi], preds[ci],
                                  dc_codes[ci], ac_codes[ci])
    bw.byte_align()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qtabs[:1 if gray else 2]):
        out += seg(0xDB, bytes([tq])
                   + bytes(int(v) for v in q.reshape(-1)[ZIGZAG]))
    comps = b"".join(
        bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
        for ci, (sh, sv) in enumerate(samp))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, len(planes)) + comps)
    hts = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if not gray:
        hts += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tc_th, (bits, vals) in hts:
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    scomps = b"".join(bytes([ci + 1, 0x00 if ci == 0 else 0x11])
                      for ci in range(len(planes)))
    out += seg(0xDA, bytes([len(planes)]) + scomps + b"\x00\x3F\x00")
    out += bw.out
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise _MarkerHit(self.pos)
            else:
                self.pos += 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self._n = 0


class _MarkerHit(Exception):
    def __init__(self, pos: int) -> None:
        self.pos = pos


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, ssss: int) -> int:
    """EXTEND (F.2.2.1): map magnitude bits back to a signed value."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1



def _read_dqt(body: bytes, qt: dict) -> None:
    """Parse one DQT segment into ``qt[tq]`` = NATURAL-order flat-64
    int64 steps (shared by the baseline and progressive header walks —
    a single representation so table-handling fixes land once)."""
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0x0F
        if pq:
            raise NotImplementedError("16-bit quant tables")
        tbl = np.zeros(64, np.int64)
        tbl[ZIGZAG] = np.frombuffer(body[i + 1:i + 65], np.uint8)
        qt[tq] = tbl
        i += 65


def _read_dht(body: bytes, huff: dict) -> None:
    """Parse one DHT segment into ``huff[(tc, th)]`` decode tables."""
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0x0F
        bits = list(body[i + 1:i + 17])
        nv = sum(bits)
        vals = list(body[i + 17:i + 17 + nv])
        huff[(tc, th)] = _decode_table(bits, vals)
        i += 17 + nv


def decode_jpeg_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w) grayscale or (h, w, 3) RGB uint8.
    Supports the profile ``encode_jpeg_baseline`` writes plus the common
    wild variants: any Huffman tables (read from DHT, not assumed),
    multiple DQT/DHT segments, DRI/RSTn, 4:4:4 and 4:2:0 (and 4:2:2)
    sampling, APPn/COM skipped. Progressive / arithmetic / 12-bit
    raise ``NotImplementedError`` loudly."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_at = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        m = data[pos + 1]
        if m == 0xD9:                                   # EOI
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + ln]
        if m == 0xDB:                                   # DQT
            _read_dqt(body, qt)
        elif m == 0xC4:                                 # DHT
            _read_dht(body, huff)
        elif m == 0xC0 or m == 0xC1:                    # SOF0/1 (Huffman seq.)
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{m:02X}: progressive/"
                "arithmetic/hierarchical)")
        elif m == 0xDD:                                 # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif m == 0xDA:                                 # SOS
            ns = body[0]
            for s in range(ns):
                cs, tdta = body[1 + 2 * s], body[2 + 2 * s]
                for c in comps:
                    if c["id"] == cs:
                        c["td"], c["ta"] = tdta >> 4, tdta & 0x0F
            scan_at = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_at is None or not comps:
        raise ValueError("no SOS/SOF in JPEG stream")
    # a malformed stream may reference table ids no DQT/DHT defined —
    # keep the module's loud-ValueError contract instead of a bare
    # KeyError out of _decode_scan
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("JPEG scan references undefined "
                             f"quantization table {c['tq']}")
        if "td" not in c or "ta" not in c:
            raise ValueError(f"SOS lists no entropy tables for "
                             f"component id {c['id']}")
        if (0, c["td"]) not in huff or (1, c["ta"]) not in huff:
            raise ValueError("JPEG scan references undefined Huffman "
                             f"table (DC {c['td']} / AC {c['ta']})")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["plane"] = np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                              np.float64)
        c["pred"] = 0
        c["coef"] = []
        c["dest"] = []

    br = _BitReader(data, scan_at)
    try:
        _decode_scan(data, br, comps, qt, huff, restart_interval,
                     mcus_x, mcus_y)
    except _MarkerHit as hit:
        raise ValueError(
            f"entropy stream truncated: marker 0xFF{data[hit.pos + 1]:02X}"
            f" at byte {hit.pos} before the scan completed") from None
    except IndexError:
        raise ValueError("entropy stream ends before the scan "
                         "completed (truncated JPEG)") from None
    # dequantized coefficients collected; batch the IDCT per component
    # (per-block numpy dispatch dominated decode time)
    for c in comps:
        if not c["coef"]:
            continue
        coef = np.zeros((len(c["coef"]), 64), np.float64)
        coef[:, ZIGZAG] = np.asarray(c["coef"], np.float64)
        blks = _T.T @ coef.reshape(-1, 8, 8) @ _T + 128.0
        for (by, bx), blk in zip(c["dest"], blks):
            c["plane"][8 * by:8 * by + 8, 8 * bx:8 * bx + 8] = blk

    # upsample to full resolution (sample replication) and crop
    full = []
    for c in comps:
        p = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    return _to_pixels(full)


def _to_pixels(full: list[np.ndarray]) -> np.ndarray:
    """Full-resolution component planes → uint8 pixels (grayscale
    passthrough or BT.601 YCbCr→RGB), shared by the baseline and
    progressive decode tails."""
    if len(full) == 1:
        out = full[0]
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=-1)
    else:
        raise NotImplementedError(f"{len(full)}-component JPEG")
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _decode_scan(data: bytes, br: _BitReader, comps: list[dict],
                 qt: dict, huff: dict, restart_interval: int,
                 mcus_x: int, mcus_y: int) -> None:
    """Entropy-decode every MCU into per-component coefficient lists
    (F.2.2): Huffman symbols, DC prediction with RSTn resets, run-length
    AC expansion. Raises _MarkerHit/IndexError upward for the caller
    to convert into a loud truncation error."""
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # byte-align and consume the RST marker (E.2.4)
                br.align()
                while data[br.pos] == 0xFF and data[br.pos + 1] == 0x00:
                    br.pos += 2   # stray stuffed fill before align
                if (data[br.pos] == 0xFF
                        and 0xD0 <= data[br.pos + 1] <= 0xD7):
                    br.pos += 2
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                dct = huff[(0, c["td"])]
                act = huff[(1, c["ta"])]
                q = c.setdefault("_qzz", qt[c["tq"]][ZIGZAG])
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        ssss = _read_symbol(br, dct)
                        diff = _extend(br.bits(ssss), ssss)
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:      # ZRL
                                    k += 16
                                    continue
                                break            # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        by, bx = my * c["v"] + dy, mx * c["h"] + dx
                        c["coef"].append(zz * q)
                        c["dest"].append((by, bx))
            mcu_i += 1


# Progressive AC scans emit EOBn symbols (RRRRSSSS with SSSS=0 and
# RRRR=0..14, G.1.2.2) that Annex K's baseline AC tables have no codes
# for, so the progressive ENCODER carries its own table: every symbol a
# progressive AC scan can produce — EOB0..EOB14, ZRL, and all
# (run, size 1..10) pairs — as a flat canonical table of 8- and 16-bit
# codes (176 symbols; 175 fit in 8 bits, the spill takes 16). The
# DECODER assumes nothing: it reads whatever DHT the stream defines.
_PROG_AC_SYMBOLS = ([r << 4 for r in range(15)] + [0xF0]
                    + [(r << 4) | s for r in range(16)
                       for s in range(1, 11)])
HUFF_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, 175, 0, 0, 0, 0, 0, 0, 0, 1],
                _PROG_AC_SYMBOLS)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a JPEG — baseline (SOF0/1) or progressive (SOF2) — to
    (h, w) grayscale or (h, w, 3) RGB uint8, dispatching on the frame
    marker. The general entry ``decode_media_real`` uses; web corpora
    are majority-progressive, so a media curation pass needs both
    (reference posture: accept whatever the ecosystem wrote,
    `ingest/netcdf_reader.py:56`)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 3 < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        m = data[pos + 1]
        if m in (0xC0, 0xC1):
            return decode_jpeg_baseline(data)
        if m == 0xC2:
            return _decode_progressive(data)
        if m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG mode (SOF marker 0xFF{m:02X}: "
                "lossless/arithmetic/hierarchical)")
        if m == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        pos += 2 + ln
    raise ValueError("no SOF marker in JPEG stream")


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` (skips entropy
    bytes, stuffed 0xFF00 and fill 0xFFs)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    raise ValueError("entropy stream ends without a terminating marker "
                     "(truncated progressive JPEG)")


def _decode_progressive(data: bytes) -> np.ndarray:
    """Progressive JPEG decode per ITU-T T.81 Annex G: coefficients
    accumulate across scans — DC first/refinement (interleaved or not),
    AC first/refinement (single-component by spec), spectral selection
    bands, successive-approximation point transforms, EOB runs, restart
    intervals — then one dequantize + batched IDCT at the end."""
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    hmax = vmax = 1
    mcus_x = mcus_y = 0
    saw_eoi = False

    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        m = data[pos + 1]
        if m == 0xD9:                                   # EOI
            saw_eoi = True
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + ln]
        if m == 0xDB:                                   # DQT
            _read_dqt(body, qt)
        elif m == 0xC4:                                 # DHT
            _read_dht(body, huff)
        elif m == 0xC2:                                 # SOF2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq, "pred": 0})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                # full MCU-padded block grid (interleaved extent) and
                # the non-interleaved extent (A.2.2): ceil of the
                # component's own sample dimensions
                c["bw"] = mcus_x * c["h"]
                c["bh"] = mcus_y * c["v"]
                c["bw_ni"] = (-(-w * c["h"] // hmax) + 7) // 8
                c["bh_ni"] = (-(-h * c["v"] // vmax) + 7) // 8
                c["coef"] = np.zeros((c["bh"], c["bw"], 64), np.int64)
        elif m in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unexpected SOF marker 0xFF{m:02X} in progressive "
                "decode")
        elif m == 0xDD:                                 # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif m == 0xDA:                                 # SOS
            if not comps:
                raise ValueError("SOS before SOF2 in progressive JPEG")
            ns = body[0]
            scan: list[dict] = []
            for s in range(ns):
                cs, tdta = body[1 + 2 * s], body[2 + 2 * s]
                for c in comps:
                    if c["id"] == cs:
                        c["td"], c["ta"] = tdta >> 4, tdta & 0x0F
                        scan.append(c)
                        break
                else:
                    raise ValueError(
                        f"SOS references unknown component id {cs}")
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            br = _BitReader(data, pos + 2 + ln)
            try:
                _decode_progressive_scan(
                    data, br, scan, huff, ss, se, ah, al,
                    restart_interval, mcus_x, mcus_y)
            except _MarkerHit as hit:
                raise ValueError(
                    "entropy stream truncated: marker "
                    f"0xFF{data[hit.pos + 1]:02X} at byte {hit.pos} "
                    "before the scan completed") from None
            except IndexError:
                raise ValueError(
                    "entropy stream ends before the progressive scan "
                    "completed (truncated JPEG)") from None
            pos = _next_marker(data, br.pos)
            continue
        pos += 2 + ln
    if not comps:
        raise ValueError("no SOF2 in progressive JPEG stream")
    if not saw_eoi:
        raise ValueError("progressive JPEG stream ends without EOI")

    # dequantize + batched IDCT, then upsample/crop/convert like the
    # baseline tail
    full = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("JPEG scan references undefined "
                             f"quantization table {c['tq']}")
        # qt holds natural-order steps; coefficients are stored in
        # zigzag order, so permute the steps to match before the
        # zigzag->natural scatter below
        qzz = qt[c["tq"]][ZIGZAG]
        coef = (c["coef"].reshape(-1, 64) * qzz).astype(np.float64)
        blk = np.zeros((coef.shape[0], 64), np.float64)
        blk[:, ZIGZAG] = coef
        px8 = _T.T @ blk.reshape(-1, 8, 8) @ _T + 128.0
        plane = np.zeros((c["bh"] * 8, c["bw"] * 8), np.float64)
        idx = 0
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                plane[8 * by:8 * by + 8, 8 * bx:8 * bx + 8] = px8[idx]
                idx += 1
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    return _to_pixels(full)


def _decode_progressive_scan(data: bytes, br: _BitReader,
                             scan: list[dict], huff: dict,
                             ss: int, se: int, ah: int, al: int,
                             restart_interval: int,
                             mcus_x: int, mcus_y: int) -> None:
    """One progressive scan (G.1.2): dispatches DC vs AC × first vs
    refinement, handles interleaved MCU order for DC scans and
    row-major non-interleaved block order otherwise, RSTn resets
    (DC predictions AND the EOB run), and the EOB-run state shared
    across blocks of an AC scan."""
    if ss == 0 and se != 0:
        raise ValueError("illegal progressive scan: Ss=0 requires Se=0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("illegal progressive scan: AC scans are "
                         "single-component (G.1.1.1.1)")
    if se > 63 or ss > se:
        raise ValueError(f"illegal spectral band [{ss}, {se}]")
    is_dc = ss == 0
    state = {"eobrun": 0}

    for c in scan:
        c["pred"] = 0

    def check_restart(unit_i: int) -> None:
        if restart_interval and unit_i and unit_i % restart_interval == 0:
            br.align()
            while data[br.pos] == 0xFF and data[br.pos + 1] == 0x00:
                br.pos += 2
            if (data[br.pos] == 0xFF
                    and 0xD0 <= data[br.pos + 1] <= 0xD7):
                br.pos += 2
            for c in scan:
                c["pred"] = 0
            state["eobrun"] = 0

    if is_dc and len(scan) > 1:
        # interleaved scan (ns > 1 — DC-only in progressive, G.1.1.1.1):
        # MCU traversal over every component, MCU-padded block grid
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                check_restart(unit)
                for c in scan:
                    for dy in range(c["v"]):
                        for dx in range(c["h"]):
                            _dc_unit(br, c, huff, ah, al,
                                     my * c["v"] + dy, mx * c["h"] + dx)
                unit += 1
        return

    c = scan[0]
    if is_dc:
        # single-component DC scan, non-interleaved block order
        unit = 0
        for by in range(c["bh_ni"]):
            for bx in range(c["bw_ni"]):
                check_restart(unit)
                _dc_unit(br, c, huff, ah, al, by, bx)
                unit += 1
        return

    # both AC scan kinds need the AC table (refinement still reads
    # EOBn/ZRL/newly-significant symbols through it)
    key = (1, c.get("ta", 0))
    if key not in huff:
        raise ValueError("JPEG scan references undefined Huffman "
                         f"table (AC {c.get('ta')})")
    act = huff[key]
    unit = 0
    for by in range(c["bh_ni"]):
        for bx in range(c["bw_ni"]):
            check_restart(unit)
            band = c["coef"][by, bx]
            if ah == 0:
                _ac_first(br, band, act, ss, se, al, state)
            else:
                _ac_refine(br, band, act, ss, se, al, state)
            unit += 1


def _dc_unit(br: _BitReader, c: dict, huff: dict,
             ah: int, al: int, by: int, bx: int) -> None:
    if ah == 0:
        key = (0, c.get("td", 0))
        if key not in huff:
            raise ValueError("JPEG scan references undefined Huffman "
                             f"table (DC {c.get('td')})")
        ssss = _read_symbol(br, huff[key])
        diff = _extend(br.bits(ssss), ssss)
        c["pred"] += diff
        c["coef"][by, bx, 0] = c["pred"] << al
    else:
        # DC refinement: one raw bit per block (G.1.2.1)
        if br.bit():
            c["coef"][by, bx, 0] |= 1 << al


def _ac_first(br: _BitReader, band: np.ndarray, act: dict,
              ss: int, se: int, al: int, state: dict) -> None:
    """AC first-approximation scan for one block (G.1.2.2): run-length
    coded coefficients at point transform Al, EOBn run codes."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _read_symbol(br, act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:                     # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past the spectral band end")
        band[k] = _extend(br.bits(s), s) << al
        k += 1


def _ac_refine(br: _BitReader, band: np.ndarray, act: dict,
               ss: int, se: int, al: int, state: dict) -> None:
    """AC refinement scan for one block (G.1.2.3): newly-significant
    coefficients arrive as ±1·2^Al; every already-nonzero coefficient
    in the band consumes one correction bit (also through ZRL runs and
    EOB runs); runs count only zero-history positions."""
    p1, m1 = 1 << al, -1 << al

    def correct(k: int) -> None:
        v = int(band[k])
        if br.bit() and (v & p1) == 0:
            band[k] = v + (p1 if v >= 0 else m1)

    if state["eobrun"] > 0:
        for k in range(ss, se + 1):
            if band[k]:
                correct(k)
        state["eobrun"] -= 1
        return

    k = ss
    while k <= se:
        rs = _read_symbol(br, act)
        r, s = rs >> 4, rs & 0x0F
        newval = 0
        if s == 0:
            if r < 15:
                state["eobrun"] = (1 << r)
                if r:
                    state["eobrun"] += br.bits(r)
                break
            # ZRL: skip 16 zero-history positions (r == 15 below)
        elif s == 1:
            newval = p1 if br.bit() else m1
        else:
            raise ValueError(
                "illegal refinement symbol: SSSS must be 0 or 1")
        # advance past r zero-history positions, correcting nonzero
        # ones along the way, then place the new coefficient
        while k <= se:
            if band[k]:
                correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            band[k] = newval
        k += 1
    if state["eobrun"] > 0:
        # the EOBn symbol ends THIS block too: correction bits for the
        # remaining nonzero-history coefficients, then count this block
        # against the run
        for kk in range(k, se + 1):
            if band[kk]:
                correct(kk)
        state["eobrun"] -= 1


def encode_jpeg_progressive(px: np.ndarray, quality: int = 75,
                            quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
                            ) -> bytes:
    """Encode an 8-bit (h, w) grayscale or (h, w, 3) RGB image as a
    PROGRESSIVE (SOF2) JPEG at 4:4:4, so the Annex-G decode paths can
    be exercised against genuinely compressed containers (the
    ``encode_jpeg_baseline`` rationale). The scan script covers every
    progressive mechanism: an interleaved DC first scan at Al=1, two
    spectral AC bands per component at Al=1 (EOB-run coded), a DC
    refinement scan (raw bits), and AC refinement scans down to Al=0 —
    so a decode must get successive approximation, spectral selection,
    EOB runs and correction-bit placement all right to reproduce the
    pixels. Because both encoders quantize identically, the progressive
    stream decodes to EXACTLY the pixels of the baseline stream for the
    same input — the equality the tests pin.

    AC scans use a module-local flat Huffman table (``HUFF_AC_PROG``)
    because Annex K's baseline AC tables carry no EOBn (r>0, s=0)
    codewords; the decoder reads whatever DHT the stream defines."""
    px = np.asarray(px)
    if px.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive wants uint8 pixels")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB")
    h, w = px.shape[:2]

    if quant_tables is not None:
        qL, qC = (np.asarray(t, dtype=np.int64) for t in quant_tables)
    else:
        qL = scaled_quant(QUANT_LUMA, quality)
        qC = scaled_quant(QUANT_CHROMA, quality)

    if gray:
        planes = [px.astype(np.float64)]
        qsel = [0]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
        qsel = [0, 1, 1]
    planes = [np.clip(np.floor(p + 0.5), 0, 255) for p in planes]
    qtabs = [qL, qC]

    # 4:4:4: every component's block grid IS the MCU grid
    bx_n = -(-w // 8)
    by_n = -(-h // 8)
    zz: list[np.ndarray] = []
    for p, qs in zip(planes, qsel):
        pp = _pad_to_block(p, 8)
        blocks = (pp.reshape(by_n, 8, bx_n, 8).transpose(0, 2, 1, 3)
                    .reshape(-1, 8, 8))
        q = np.broadcast_to(qtabs[qs].astype(np.float64),
                            (blocks.shape[0], 8, 8))
        zz.append(_fdct_quant_batch(blocks, q))
    nblocks = by_n * bx_n

    dc_codes = [_canonical_codes(*HUFF_DC_LUMA)] \
        + [_canonical_codes(*HUFF_DC_CHROMA)] * (len(planes) - 1)
    ac_codes = _canonical_codes(*HUFF_AC_PROG)

    def dc_first_scan(al: int) -> bytes:
        bw = _BitWriter()
        preds = [0] * len(planes)
        for bi in range(nblocks):
            for ci in range(len(planes)):
                v = int(zz[ci][bi, 0]) >> al
                ssss, bits = _magnitude(v - preds[ci])
                preds[ci] = v
                code, ln = dc_codes[ci][ssss]
                bw.write(code, ln)
                if ssss:
                    bw.write(bits, ssss)
        bw.byte_align()
        return bytes(bw.out)

    def dc_refine_scan(al: int) -> bytes:
        bw = _BitWriter()
        for bi in range(nblocks):
            for ci in range(len(planes)):
                bw.write((int(zz[ci][bi, 0]) >> al) & 1, 1)
        bw.byte_align()
        return bytes(bw.out)

    def _emit_eobn(bw: _BitWriter, run: int) -> None:
        r = run.bit_length() - 1
        code, ln = ac_codes[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(run - (1 << r), r)

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        bw = _BitWriter()
        eobrun = 0

        def flush() -> None:
            nonlocal eobrun
            if eobrun:
                _emit_eobn(bw, eobrun)
                eobrun = 0

        for bi in range(nblocks):
            # G.1.2.1: the AC point transform divides truncating
            # toward zero (an arithmetic shift would round negatives
            # the wrong way)
            band = np.fix(zz[ci][bi, ss:se + 1]
                          / float(1 << al)).astype(np.int64)
            nz = np.nonzero(band)[0]
            if len(nz) == 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            prev = 0
            for k in nz:
                run = int(k) - prev
                prev = int(k) + 1
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                ssss, bits = _magnitude(int(band[k]))
                code, ln = ac_codes[(run << 4) | ssss]
                bw.write(code, ln)
                bw.write(bits, ssss)
            if prev <= se - ss:                 # trailing zeros -> EOB
                eobrun = 1
        flush()
        bw.byte_align()
        return bytes(bw.out)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        # inverse of G.1.2.3 at Ah = Al + 1: newly-significant
        # coefficients emit (run-of-zero-history << 4) | 1 + a sign
        # bit; every history-nonzero coefficient contributes one
        # correction bit, buffered so EOB-run batching keeps bits in
        # block order
        bw = _BitWriter()
        ah = al + 1
        eobrun = 0
        eob_bits: list[int] = []

        def flush() -> None:
            nonlocal eobrun
            if eobrun:
                _emit_eobn(bw, eobrun)
                for bit in eob_bits:
                    bw.write(bit, 1)
                eob_bits.clear()
                eobrun = 0

        for bi in range(nblocks):
            band = zz[ci][bi, ss:se + 1]
            hist = np.fix(band / float(1 << ah)).astype(np.int64)
            cur = np.fix(band / float(1 << al)).astype(np.int64)
            newly = (hist == 0) & (cur != 0)
            if not newly.any():
                # EOB territory: only correction bits, batchable
                eobrun += 1
                for k in np.nonzero(hist)[0]:
                    eob_bits.append(int(abs(int(band[k]))
                                        >> al) & 1)
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            # positions past the LAST newly-significant coefficient
            # fold into the EOB run (no ZRL is ever emitted there)
            last_new = int(np.nonzero(newly)[0][-1])
            run = 0
            pend: list[int] = []

            def zrl_flush() -> None:
                # G.7 / G.1.2.3 ordering: a pending run > 15 flushes
                # BEFORE the position at hand is handled — whether it
                # is newly significant OR history-nonzero — and each
                # ZRL carries exactly the correction bits buffered up
                # to it; bits for history coefficients reached after
                # the 16-zero window follow the NEXT symbol. (Emitting
                # all buffered bits only at newly-significant symbols
                # desynchronized the decoder's per-window bit reads.)
                nonlocal run, pend
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    for bit in pend:
                        bw.write(bit, 1)
                    pend = []
                    run -= 16

            for k in range(len(band)):
                if hist[k]:
                    if k <= last_new:
                        zrl_flush()
                    pend.append(int(abs(int(band[k])) >> al) & 1)
                elif newly[k]:
                    zrl_flush()
                    code, ln = ac_codes[(run << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if cur[k] > 0 else 0, 1)
                    for bit in pend:
                        bw.write(bit, 1)
                    pend = []
                    run = 0
                else:
                    run += 1
            if run or pend:
                eobrun = 1
                eob_bits.extend(pend)
        flush()
        bw.byte_align()
        return bytes(bw.out)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def sos(comps_in_scan: list[int], ss: int, se: int,
            ah: int, al: int, entropy: bytes) -> bytes:
        body = bytes([len(comps_in_scan)])
        for ci in comps_in_scan:
            td = 0 if ci == 0 else 1
            body += bytes([ci + 1, (td << 4) | 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body) + entropy

    out = bytearray(b"\xFF\xD8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qtabs[:1 if gray else 2]):
        out += seg(0xDB, bytes([tq])
                   + bytes(int(v) for v in q.reshape(-1)[ZIGZAG]))
    comps = b"".join(bytes([ci + 1, 0x11, qsel[ci]])
                     for ci in range(len(planes)))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, len(planes)) + comps)
    hts = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_PROG)]
    if not gray:
        hts.append((0x01, HUFF_DC_CHROMA))
    for tc_th, (bits, vals) in hts:
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    allc = list(range(len(planes)))
    out += sos(allc, 0, 0, 0, 1, dc_first_scan(1))
    for ci in allc:
        out += sos([ci], 1, 5, 0, 1, ac_first_scan(ci, 1, 5, 1))
        out += sos([ci], 6, 63, 0, 1, ac_first_scan(ci, 6, 63, 1))
    out += sos(allc, 0, 0, 1, 0, dc_refine_scan(0))
    for ci in allc:
        out += sos([ci], 1, 5, 1, 0, ac_refine_scan(ci, 1, 5, 0))
        out += sos([ci], 6, 63, 1, 0, ac_refine_scan(ci, 6, 63, 0))
    out += b"\xFF\xD9"
    return bytes(out)
