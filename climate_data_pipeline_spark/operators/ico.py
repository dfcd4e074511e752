"""ICO (Windows icon / favicon) codec — pure struct + numpy over the
repo's existing decoders: the one image container every web crawl
collects alongside page media. Public Microsoft file-format
documentation is the spec.

An ICO is an ICONDIR (type 1) of up to 255 entries, each either a
PNG payload (the modern large-size convention — decoded through
``operators/png.py``) or a headerless DIB whose BITMAPINFOHEADER
declares DOUBLE height: the bottom half is the XOR (color) image,
the top half a 1-bit AND mask packed to 4-byte rows, which this
decoder applies as the alpha channel. DIB color depths 8 (palette),
24 and 32 (BGRA) are supported; others raise by depth. Cursor files
(type 2) share the layout and parse with the hotspot fields ignored.

The writer emits both entry kinds so the reader is exercised against
genuine mixed containers.
"""

from __future__ import annotations

import struct

import numpy as np

from .png import build_gray_png, png_pixels


def parse_ico(data: bytes) -> list[dict]:
    """Decode every ICONDIR entry → list of {width, height, kind
    ('png'|'dib'), px} with ``px`` an (h, w, 4) uint8 RGBA grid (the
    AND mask becomes alpha for DIB entries)."""
    if len(data) < 6 or data[:2] != b"\x00\x00" \
            or data[2:4] not in (b"\x01\x00", b"\x02\x00"):
        raise ValueError("not an ICO/CUR payload (bad ICONDIR)")
    (count,) = struct.unpack_from("<H", data, 4)
    if count == 0:
        raise ValueError("ICO with no images")
    out = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(data):
            raise ValueError("ICONDIR entry truncated")
        size, payload_off = struct.unpack_from("<II", data, off + 8)
        body = data[payload_off:payload_off + size]
        if len(body) < size:
            raise ValueError("ICO image payload truncated")
        if body[:8] == b"\x89PNG\r\n\x1a\n":
            px, ctype = png_pixels(body)
            h, w, ch = px.shape
            if int(px.max(initial=0)) > 255:
                # 16-bit PNG entries: assigning int32 samples into the
                # uint8 RGBA grid would silently wrap modulo 256
                raise NotImplementedError("16-bit PNG entry in ICO")
            rgba = np.zeros((h, w, 4), np.uint8)
            if ctype in (4, 6):          # alpha present
                rgba[:, :, :3] = px[:, :, :ch - 1] if ch > 2 \
                    else px[:, :, :1].repeat(3, 2)
                rgba[:, :, 3] = px[:, :, ch - 1]
            else:
                rgba[:, :, :3] = px if ch == 3 else px.repeat(3, 2)
                rgba[:, :, 3] = 255
            out.append({"width": w, "height": h, "kind": "png",
                        "px": rgba})
        else:
            out.append(_parse_ico_dib(body))
    return out


def _parse_ico_dib(body: bytes) -> dict:
    if len(body) < 40:
        raise ValueError("ICO DIB header truncated")
    (hdr,) = struct.unpack_from("<I", body, 0)
    if hdr != 40:
        raise NotImplementedError(f"ICO DIB header size {hdr} "
                                  "(BITMAPINFOHEADER only)")
    w, h2 = struct.unpack_from("<ii", body, 4)
    (bpp,) = struct.unpack_from("<H", body, 14)
    (comp,) = struct.unpack_from("<I", body, 16)
    if comp != 0:
        raise NotImplementedError(f"compressed ICO DIB (method {comp})")
    if h2 % 2 or h2 <= 0 or w <= 0:
        raise ValueError("ICO DIB must declare positive doubled height")
    h = h2 // 2
    pos = 40
    alpha = None
    if bpp == 8:
        (used,) = struct.unpack_from("<I", body, 32)
        n = used or 256
        quads = np.frombuffer(body, np.uint8, 4 * n, pos).reshape(n, 4)
        pos += 4 * n
        stride = (w + 3) & ~3
        idx = np.frombuffer(body, np.uint8, stride * h,
                            pos).reshape(h, stride)[::-1, :w]
        if int(idx.max(initial=0)) >= n:
            raise ValueError("ICO DIB index beyond the palette")
        rgb = quads[idx][:, :, 2::-1]
        pos += stride * h
    elif bpp in (24, 32):
        bypp = bpp // 8
        stride = (w * bypp + 3) & ~3
        raw = np.frombuffer(body, np.uint8, stride * h,
                            pos).reshape(h, stride)[::-1]
        px = raw[:, :w * bypp].reshape(h, w, bypp)
        rgb = px[:, :, 2::-1] if bypp == 3 else px[:, :, [2, 1, 0]]
        if bypp == 4:
            alpha = px[:, :, 3]
        pos += stride * h
    else:
        raise NotImplementedError(f"{bpp}-bit ICO DIB")
    # AND mask: 1bpp, 4-byte-aligned rows, bottom-up; bit SET = fully
    # transparent. 32bpp entries usually carry real alpha too — the
    # mask still applies on top, per the format
    mask_stride = ((w + 31) // 32) * 4
    mask_raw = np.frombuffer(body, np.uint8, mask_stride * h, pos)
    bits = np.unpackbits(mask_raw.reshape(h, mask_stride),
                         axis=1)[:, :w][::-1]
    rgba = np.zeros((h, w, 4), np.uint8)
    rgba[:, :, :3] = rgb
    rgba[:, :, 3] = 255 if alpha is None else alpha
    rgba[:, :, 3] = np.where(bits == 1, 0, rgba[:, :, 3])
    return {"width": int(w), "height": int(h), "kind": "dib",
            "px": rgba}


def build_ico(entries: list[dict]) -> bytes:
    """Assemble a spec-shaped ICO. Each entry: {"kind": "png", "px":
    (h, w) uint8 gray} → an embedded grayscale PNG, or {"kind":
    "dib", "idx": (h, w) uint8, "palette": (n, 3) uint8[, "mask":
    (h, w) bool transparent-cells]} → an 8-bit DIB with AND mask."""
    payloads = []
    dims = []
    for e in entries:
        if e["kind"] == "png":
            px = np.asarray(e["px"], np.uint8)
            payloads.append(build_gray_png(px))
            dims.append((px.shape[1], px.shape[0]))
        elif e["kind"] == "dib":
            idx = np.asarray(e["idx"], np.uint8)
            pal = np.asarray(e["palette"], np.uint8)
            h, w = idx.shape
            mask = np.asarray(e.get("mask",
                                    np.zeros((h, w), bool)), bool)
            quads = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
            stride = (w + 3) & ~3
            rows = np.zeros((h, stride), np.uint8)
            rows[:, :w] = idx
            mask_stride = ((w + 31) // 32) * 4
            mbits = np.zeros((h, mask_stride * 8), np.uint8)
            mbits[:, :w] = mask.astype(np.uint8)
            info = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 8, 0,
                               0, 0, 0, len(pal), 0)
            payloads.append(info + quads + rows[::-1].tobytes()
                            + np.packbits(mbits[::-1],
                                          axis=1).tobytes())
            dims.append((w, h))
        else:
            raise ValueError(f"unknown ICO entry kind {e['kind']!r}")
    out = bytearray(struct.pack("<HHH", 0, 1, len(payloads)))
    payload_off = 6 + 16 * len(payloads)
    for (w, h), p in zip(dims, payloads):
        out += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1,
                           32, len(p), payload_off)
        payload_off += len(p)
    for p in payloads:
        out += p
    return bytes(out)
