"""BMP (Windows DIB) codec — pure struct + numpy, the remaining
trivial-but-real web/desktop image container: BITMAPFILEHEADER +
BITMAPINFOHEADER, 8-bit palette (BGRA quads) and 24-bit BGR pixels,
4-byte-padded rows, bottom-up (positive height) and top-down
(negative height) layouts. Compressed BMPs (BI_RLE4/8, bitfields) and
other bit depths raise loudly — the jpeg/png/gif seam convention.
Public Microsoft file-format documentation is the spec."""

from __future__ import annotations

import struct

import numpy as np


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
    if compression != 0:
        raise NotImplementedError(
            f"compressed BMP (method {compression}) not supported "
            "(BI_RGB only)")
    if bpp not in (8, 24):
        raise NotImplementedError(f"{bpp}-bit BMP not supported "
                                  "(8-bit palette / 24-bit BGR only)")
    if w <= 0 or h_signed == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * (bpp // 8) + 3) & ~3
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
              top_down: bool = False) -> bytes:
    """Assemble a spec-shaped BMP: (h, w, 3) uint8 RGB → 24-bit BGR,
    or (h, w) index grid + (n, 3) RGB ``palette`` → 8-bit."""
    px = np.asarray(px)
    if palette is None:
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
    stride = (w * (bpp // 8) + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * (bpp // 8)] = body_rows
    if not top_down:
        rows = rows[::-1]
    px_off = 14 + 40 + len(pal)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                       1, bpp, 0, stride * h, 2835, 2835,
                       len(pal) // 4, 0)
    head = (b"BM" + struct.pack("<IHHI", px_off + stride * h, 0, 0,
                                px_off))
    return head + info + pal + rows.tobytes()
