"""BMP (Windows DIB) codec — pure struct + numpy, the remaining
trivial-but-real web/desktop image container: BITMAPFILEHEADER +
BITMAPINFOHEADER, 8-bit palette (BGRA quads) and 24-bit BGR pixels,
4-byte-padded rows, bottom-up (positive height) and top-down
(negative height) layouts, and BI_RLE8 run-length compression
(encoded runs, absolute mode with word padding, end-of-line /
end-of-bitmap / delta escapes). BI_RLE4, bitfields and other bit
depths raise loudly — the jpeg/png/gif seam convention. Public
Microsoft file-format documentation is the spec."""

from __future__ import annotations

import struct

import numpy as np


def _rle8_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8: [n, v] repeats v n times (n ≥ 1); [0, n≥3] copies n
    literal bytes padded to a word; [0, 0] end of line; [0, 1] end of
    bitmap; [0, 2, dx, dy] skips (skipped cells stay 0). Rows are
    stored bottom-up like any positive-height DIB — this returns them
    in STORED order (bottom row first, the caller flips)."""
    rows = np.zeros((h, w), np.uint8)
    x = y = pos = 0
    while True:
        if pos + 2 > len(data):
            raise ValueError("BMP RLE8 stream truncated")
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:                       # encoded run
            if y >= h or x + n > w:
                raise ValueError("BMP RLE8 run beyond the bitmap")
            rows[y, x:x + n] = v
            x += n
        elif v == 0:                    # end of line
            x, y = 0, y + 1
        elif v == 1:                    # end of bitmap
            return rows
        elif v == 2:                    # delta
            if pos + 2 > len(data):
                raise ValueError("BMP RLE8 delta truncated")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > w or y > h:
                raise ValueError("BMP RLE8 delta beyond the bitmap")
        else:                           # absolute mode, word-padded
            if y >= h or x + v > w or pos + v > len(data):
                raise ValueError("BMP RLE8 absolute run out of range")
            rows[y, x:x + v] = np.frombuffer(data, np.uint8, v, pos)
            x += v
            pos += v + (v & 1)


def rle8_encode(idx: np.ndarray) -> bytes:
    """Real BI_RLE8 packing of an (h, w) index grid in STORED
    (bottom-up) row order: maximal runs, absolute mode for literals
    ≥ 3, end-of-line after every row, end-of-bitmap last."""
    h, w = idx.shape
    out = bytearray()
    for y in range(h):
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            if run >= 2:
                out += bytes([run, int(row[x])])
                x += run
                continue
            # literal stretch until the next >=3 run
            k = x
            while k < w and k - x < 254:
                if (k + 2 < w and row[k] == row[k + 1] == row[k + 2]):
                    break
                k += 1
            n = k - x
            if n >= 3:
                out += bytes([0, n]) + row[x:k].astype(np.uint8).tobytes()
                if n & 1:
                    out += b"\x00"
            else:
                for i in range(n):
                    out += bytes([1, int(row[x + i])])
            x = k
        out += b"\x00\x00"              # end of line
    out += b"\x00\x01"                  # end of bitmap
    return bytes(out)


def parse_bmp(data: bytes) -> np.ndarray:
    """Decode a BMP payload to an (h, w, 3) uint8 RGB grid."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    if len(data) < 54:                 # file header + BITMAPINFOHEADER
        raise ValueError("BMP header truncated")
    (px_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError(
            f"BMP header size {hdr_size} (BITMAPCOREHEADER) not "
            "supported (40+-byte BITMAPINFOHEADER only)")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression not in (0, 1):
        raise NotImplementedError(
            f"compressed BMP (method {compression}) not supported "
            "(BI_RGB / BI_RLE8 only)")
    if compression == 1 and bpp != 8:
        raise ValueError(f"BI_RLE8 with {bpp}-bit pixels")
    if bpp not in (8, 24):
        raise NotImplementedError(f"{bpp}-bit BMP not supported "
                                  "(8-bit palette / 24-bit BGR only)")
    if w <= 0 or h_signed == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * (bpp // 8) + 3) & ~3
    if compression == 1:
        if top_down:
            raise ValueError("BI_RLE8 BMPs are bottom-up per spec")
        rows = _rle8_decode(data[px_off:], w, h)
        rows = np.pad(rows, ((0, 0), (0, stride - w)))
    else:
        if px_off + stride * h > len(data):
            raise ValueError("BMP pixel array truncated")
        raw = np.frombuffer(data, np.uint8, stride * h, px_off)
        rows = raw.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        bgr = rows[:, :w * 3].reshape(h, w, 3)
        return bgr[:, :, ::-1].copy()          # BGR -> RGB
    # 8-bit: palette of (colors_used or 256) BGRA quads after the header
    (colors_used,) = struct.unpack_from("<I", data, 46)
    n = colors_used or 256
    pal_off = 14 + hdr_size
    if pal_off + 4 * n > len(data):
        raise ValueError("BMP palette truncated")
    quads = np.frombuffer(data, np.uint8, 4 * n, pal_off).reshape(n, 4)
    idx = rows[:, :w]
    if int(idx.max(initial=0)) >= n:
        raise ValueError("BMP pixel index beyond the palette")
    return quads[idx][:, :, 2::-1].copy()      # BGRA -> RGB


def build_bmp(px: np.ndarray, palette: np.ndarray | None = None,
              top_down: bool = False, rle: bool = False) -> bytes:
    """Assemble a spec-shaped BMP: (h, w, 3) uint8 RGB → 24-bit BGR,
    or (h, w) index grid + (n, 3) RGB ``palette`` → 8-bit; ``rle``
    writes the 8-bit grid BI_RLE8-compressed (bottom-up only, per
    spec)."""
    px = np.asarray(px)
    if palette is None:
        if rle:
            raise ValueError("BI_RLE8 build_bmp wants the 8-bit form")
        if px.ndim != 3 or px.shape[2] != 3:
            raise ValueError("24-bit build_bmp wants (h, w, 3) RGB")
        h, w = px.shape[:2]
        bpp, pal = 24, b""
        body_rows = px[:, :, ::-1].reshape(h, -1)   # RGB -> BGR
    else:
        if px.ndim != 2:
            raise ValueError("8-bit build_bmp wants an (h, w) index grid")
        h, w = px.shape
        bpp = 8
        pal = b"".join(bytes([b, g, r, 0]) for r, g, b in
                       np.asarray(palette, np.uint8))
        body_rows = px.astype(np.uint8)
    px_off = 14 + 40 + len(pal)
    if rle:
        if top_down:
            raise ValueError("BI_RLE8 BMPs are bottom-up per spec")
        body = rle8_encode(body_rows[::-1])         # stored bottom-up
        comp, stride_h = 1, len(body)
    else:
        stride = (w * (bpp // 8) + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w * (bpp // 8)] = body_rows
        if not top_down:
            rows = rows[::-1]
        body = rows.tobytes()
        comp, stride_h = 0, stride * h
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                       1, bpp, comp, stride_h, 2835, 2835,
                       len(pal) // 4, 0)
    head = (b"BM" + struct.pack("<IHHI", px_off + len(body), 0, 0,
                                px_off))
    return head + info + pal + body
