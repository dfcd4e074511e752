"""PNG decoder (public spec, stdlib zlib only) — the single shared
implementation behind both ``decode_media_real``'s metadata path and
``resize_image_area``'s pixel path (they previously carried diverging
copies; closures reference this module-level code the same way they
reference ``jpeg.decode_jpeg_baseline``).

Supported: every legal bit depth — 1/2/4 (MSB-first packed samples,
grayscale and palette only, per spec 11.2.2), 8, and 16 (big-endian
samples) — with filters operating bytewise (left-reference distance =
bpp bytes, floored at 1 for sub-byte rows, spec 9.2); color types
0 (gray) / 2 (rgb) / 3 (palette via PLTE) / 4 (gray+alpha) / 6 (rgba),
non-interlaced and Adam7. Illegal depth/type combinations raise
loudly; a bad interlace byte is rejected BEFORE IDAT decompression.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# Adam7 pass origins/steps (x0, y0, dx, dy — PNG spec 8.2)
ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
         (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
         (0, 1, 1, 2))


def _unfilter(stream: bytes, pos: int, ph: int, stride: int,
              bpp: int) -> tuple[np.ndarray, int]:
    """One filtered sub-image (the whole image, or one Adam7 pass):
    returns the raw BYTE grid (ph, stride) and the stream position
    after it. Filters operate bytewise with the left-reference
    distance = bpp bytes (PNG 4.5.2 / 9.2); for sub-byte depths the
    caller passes the PACKED row stride and bpp = 1 (spec 9.2: "bpp is
    rounded up to one")."""
    out = np.zeros((ph, stride), dtype=np.int32)
    for y in range(ph):
        # loud-seam contract (cf. jpeg.py): a short stream is a
        # descriptive ValueError, not a raw IndexError
        if pos + 1 + stride > len(stream):
            raise ValueError("PNG IDAT stream truncated")
        f = stream[pos]
        row = np.frombuffer(stream, dtype=np.uint8, count=stride,
                            offset=pos + 1).astype(np.int32)
        pos += stride + 1
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:
            cur = row
        elif f == 2:                     # up — vectorizable
            cur = (row + prev) & 0xFF
        elif f in (1, 3, 4):
            # left-referencing filters carry a serial dependency; the
            # per-pixel loop is fine for the thumbnail-scale payloads
            # this path decodes
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    pa, pb, pc = (abs(b - c), abs(a - c),
                                  abs(a + b - 2 * c))
                    pred = (a if pa <= pb and pa <= pc
                            else b if pb <= pc else c)
                cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
    return out, pos


def png_pixels(p: bytes) -> tuple[np.ndarray, int]:
    """Decode a PNG payload to its (h, w, ch) int32 sample grid and the
    IHDR color type. Palette (type 3) is expanded through PLTE to RGB;
    alpha planes (types 4/6) are returned as decoded — the CALLER
    decides whether alpha is signal (compositing) or coverage
    (pixel statistics)."""
    pos, idat = 8, []
    w = h = depth = ctype = interlace = None
    plte = None
    while pos + 8 <= len(p):
        (ln,) = struct.unpack_from(">I", p, pos)
        typ = p[pos + 4:pos + 8]
        data = p[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h = struct.unpack_from(">II", data, 0)
            depth, ctype = data[8], data[9]
            interlace = data[12]
        elif typ == b"PLTE":
            if not data or len(data) % 3:
                raise ValueError(
                    f"malformed PLTE chunk (length {len(data)} is not "
                    "a positive multiple of 3)")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"illegal PNG bit depth {depth}")
    if depth == 16 and ctype == 3:
        raise ValueError("16-bit palette PNG is not legal")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(
            f"sub-byte depth {depth} is only legal for grayscale/"
            f"palette PNG, not color type {ctype} (spec 11.2.2)")
    # palette rows carry 1 index byte/px through the filter pass,
    # then expand through PLTE
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if ch is None:
        raise NotImplementedError(f"PNG color type {ctype} not supported")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG without a PLTE chunk")
    if interlace not in (0, 1):
        # validate BEFORE inflating: a hostile payload with a bad
        # interlace byte must not get a free decompression
        raise ValueError(f"bad PNG interlace method {interlace}")
    stream = zlib.decompress(b"".join(idat))
    # packed scanline geometry (spec 7.2): stride = ceil(pw·ch·depth/8)
    # bytes; the filter left-reference distance floors at one byte
    bpp = max(1, ch * depth // 8)

    def row_stride(pw: int) -> int:
        return (pw * ch * depth + 7) // 8

    def to_samples(raw: np.ndarray, ph: int, pw: int) -> np.ndarray:
        # (ph, stride) bytes -> (ph, pw, ch) sample values
        # (16-bit samples big-endian per spec 7.1; sub-byte samples
        # packed MSB-first within each byte, rows padded to a byte)
        if depth < 8:
            bits = np.unpackbits(raw.astype(np.uint8), axis=1)
            grp = bits[:, :pw * depth].reshape(ph, pw, depth)
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int32)
            return (grp * weights).sum(axis=2,
                                       dtype=np.int32)[:, :, None]
        if depth == 8:
            return raw.reshape(ph, pw, ch)
        b2 = raw.reshape(ph, pw, ch, 2)
        return (b2[..., 0] << 8) | b2[..., 1]

    if interlace == 0:
        raw, _ = _unfilter(stream, 0, h, row_stride(w), bpp)
        px = to_samples(raw, h, w)
    else:
        # Adam7: seven independently-filtered sub-images concatenated
        # in the same zlib stream; empty passes contribute no bytes
        px = np.zeros((h, w, ch), np.int32)
        spos = 0
        for (x0, y0, dx, dy) in ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            raw, spos = _unfilter(stream, spos, ph, row_stride(pw), bpp)
            px[y0::dy, x0::dx] = to_samples(raw, ph, pw)

    if ctype == 3:
        idx = px[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("palette index out of PLTE range")
        px = plte[idx].astype(np.int32)          # (h, w, 3) RGB
    return px, ctype


def build_gray_png(px: np.ndarray) -> bytes:
    """Minimal spec-shaped 8-bit grayscale PNG writer (filter 0 rows,
    one zlib IDAT) — the reusable counterpart of ``png_pixels`` for
    fixtures and for GRIB2's PNG data-representation template 5.41."""
    import struct as _st
    import zlib as _zlib

    px = np.asarray(px, np.uint8)
    if px.ndim != 2:
        raise ValueError("build_gray_png wants an (h, w) grid")
    h, w = px.shape

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (_st.pack(">I", len(body)) + typ + body
                + _st.pack(">I", _zlib.crc32(typ + body)))

    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", _st.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", _zlib.compress(raw, 6))
            + chunk(b"IEND", b""))
