"""GIF (GIF87a/89a) codec — pure python + numpy, no external media
libraries, the web-scrape image format the PNG/JPEG work left open:
LZW raster decompression (variable-width codes, CLEAR/EOI, 4096-entry
dictionary), global and local color tables, the 4-pass row interlace,
and multi-image (animated) streams. Written against the public
GIF89a specification (CompuServe, 1990) and the standard LZW
variable-code scheme it defines.

Scope: every color-table raster the spec allows (1..8-bit codes);
frames are decoded AS STORED (their own rect + palette) with position
and disposal metadata exposed — full animation compositing (disposal
methods 2/3 against a canvas) is a renderer concern, not a statistics
concern, and the synthesizer writes full-frame images where the two
coincide. Malformed streams raise descriptive ValueErrors (the
jpeg/png loud-seam convention).

The encoder exists for the usual reason (`synthesize_gif` →
`decode_media_real` without binary fixtures): a real LZW compressor
with code-width growth and dictionary reset, so the decoder is
exercised against genuinely compressed data. Palette round trips are
LOSSLESS, so a SQL oracle re-derives decoded means exactly.
"""

from __future__ import annotations

import struct

import numpy as np

# interlace pass starts/steps (GIF89a appendix E)
INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width starting min+1 bits,
    little-endian bit packing, CLEAR resets the dictionary, EOI ends
    the stream. Returns exactly ``n_pixels`` indexes (loud if the
    stream ends early)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    # dictionary as (prefix_code, last_byte); roots are implicit
    prefix = np.full(4096, -1, np.int32)
    suffix = np.zeros(4096, np.uint8)
    next_slot = eoi + 1      # next dictionary entry to assign
    # the CODE-WIDTH counter counts CODES READ (giflib's RunningCode),
    # not entries assigned: the decoder assigns no entry for the first
    # code after a CLEAR, but the encoder's width bookkeeping ticks on
    # every emitted code — counting entries here desynchronizes the
    # width growth by exactly one code per clear
    wcount = eoi + 1
    width = min_code_size + 1
    acc = bits = 0
    pos = 0
    prev = -1
    buf = bytearray()

    def expand(code: int) -> bytes:
        # walk the chain; chains are bounded by 4096
        buf.clear()
        while code >= clear:
            buf.append(suffix[code])
            code = prefix[code]
        buf.append(code)
        return bytes(buf[::-1])

    while True:
        while bits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            next_slot = eoi + 1
            wcount = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("GIF LZW stream starts with a "
                                 "non-root code")
            seq = bytes([code])
        elif code < next_slot:
            seq = expand(code)
        elif code == next_slot:
            # KwKwK case: previous sequence + its own first byte
            seq = expand(prev)
            seq += seq[:1]
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        if n_out + len(seq) > n_pixels:
            seq = seq[:n_pixels - n_out]
        out[n_out:n_out + len(seq)] = np.frombuffer(seq, np.uint8)
        n_out += len(seq)
        if prev >= 0 and next_slot < 4096:
            prefix[next_slot] = prev
            suffix[next_slot] = seq[0]
            next_slot += 1
        wcount += 1
        if wcount == (1 << width) and width < 12:
            width += 1
        prev = code
        if n_out >= n_pixels:
            break
    if n_out < n_pixels:
        raise ValueError(f"GIF raster short: {n_out} of {n_pixels} "
                         "pixels decoded")
    return out


def lzw_encode(indexes: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW compressor: emits CLEAR, grows the code width
    as the dictionary fills, resets at 4096 — a real compressor so the
    decoder sees genuine variable-width streams."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[bytes, int] = {}

    def reset() -> int:
        table.clear()
        for i in range(clear):
            table[bytes([i])] = i
        return eoi + 1

    width = min_code_size + 1
    next_code = reset()
    emit(clear, width)
    seq = b""
    for b in indexes.astype(np.uint8).tobytes():
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # same growth point as the decoder: when the next code to
            # assign reaches 2^width
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            width = min_code_size + 1
            next_code = reset()
        seq = bytes([b])
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block sequence; returns (payload, pos after
    the 0 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-block sequence truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos:pos + n])
        if len(chunks[-1]) < n:
            raise ValueError("GIF sub-block truncated")
        pos += n
    return b"".join(chunks), pos


def parse_gif(data: bytes) -> dict:
    """Parse a GIF into {width, height, frames: [...]} where each frame
    carries (x, y, w, h, interlaced, delay_cs, disposal, px) — px the
    (h, w, 3) uint8 RGB raster through its (local or global) color
    table, decoded as stored. Transparency index (if declared) is
    reported per frame but pixels keep the palette color: coverage
    handling is the caller's policy, like PNG alpha."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a magic)")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    frames = []
    delay_cs = 0
    disposal = 0
    transparent = None
    while True:
        if pos >= len(data):
            raise ValueError("GIF stream ends without a trailer")
        b = data[pos]
        pos += 1
        if b == 0x3B:                       # trailer
            break
        if b == 0x21:                       # extension
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:   # graphic control
                flags, delay_cs, tidx = struct.unpack_from("<BHB",
                                                           body, 0)
                disposal = (flags >> 2) & 0x07
                transparent = tidx if flags & 1 else None
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block introducer 0x{b:02X}")
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without any color table")
        interlaced = bool(fpacked & 0x40)
        min_code = data[pos]
        pos += 1
        if not 1 <= min_code <= 8:
            raise ValueError(f"bad GIF LZW minimum code size {min_code}")
        raster, pos = _sub_blocks(data, pos)
        idx = lzw_decode(raster, min_code, fw * fh)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index beyond the color table")
        grid = idx.reshape(fh, fw)
        if interlaced:
            de = np.empty_like(grid)
            r = 0
            for start, step in INTERLACE:
                rows = range(start, fh, step)
                for y in rows:
                    de[y] = grid[r]
                    r += 1
            grid = de
        frames.append({"x": fx, "y": fy, "w": fw, "h": fh,
                       "interlaced": interlaced, "delay_cs": delay_cs,
                       "disposal": disposal, "transparent": transparent,
                       "px": ct[grid]})
        delay_cs = 0
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF with no image data")
    return {"width": w, "height": h, "frames": frames}


def build_gif(frames: list[np.ndarray], palette: np.ndarray,
              interlace: bool = False, delay_cs: int = 10) -> bytes:
    """Assemble a spec-shaped GIF: each frame a full-canvas (h, w)
    INDEX grid through one global color table ((n, 3) uint8, n a power
    of two ≥ 2); multi-frame inputs get GIF89a graphic-control blocks
    (animation), single frames a plain GIF87a-style stream."""
    h, w = frames[0].shape
    n = len(palette)
    if n & (n - 1) or not 2 <= n <= 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    size_field = n.bit_length() - 2
    out = bytearray(b"GIF89a" if len(frames) > 1 else b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_field & 7)
                       | ((size_field & 7) << 4), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    min_code = max(2, n.bit_length() - 1)
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must be full-canvas")
        if len(frames) > 1:
            out += b"\x21\xF9" + bytes([4]) \
                + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0)
        grid = f
        if interlace:
            rows = [grid[y] for start, step in INTERLACE
                    for y in range(start, h, step)]
            grid = np.stack(rows)
        out.append(min_code)
        raster = lzw_encode(grid.reshape(-1), min_code)
        for i in range(0, len(raster), 255):
            blk = raster[i:i + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
