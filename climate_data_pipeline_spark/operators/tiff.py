"""TIFF 6.0 codec — pure struct + numpy, the scanned-document /
scientific-imaging format the GIF/BMP work left open. Written against
the public TIFF 6.0 specification (Adobe, 1992) and the Adobe
PhotoShop TIFF Technical Notes (Deflate compression tag 8).

Decodes: both byte orders (``II`` little / ``MM`` big endian), the
classic 42 magic, baseline strip organization (StripOffsets /
StripByteCounts / RowsPerStrip), bit depths 8 and 16, photometric
interpretations 0 (WhiteIsZero — inverted to intensity so statistics
read the same as MinIsBlack), 1 (BlackIsZero), 2 (RGB) and 3
(palette-color through the 16-bit-per-channel ColorMap), and
compressions 1 (none), 5 (LZW — the TIFF variant: MSB-first bit
packing and the EARLY code-width change one code before the GIF
scheme would grow), 8/32946 (Deflate, zlib is stdlib) and 32773
(PackBits), with horizontal-differencing Predictor 2. Everything
else — BigTIFF (magic 43), tiled layout, planar configuration 2,
JPEG-in-TIFF, fax codings, floating-point samples — raises a crisp
``ValueError``/``NotImplementedError`` naming the feature, the
jpeg/png/gif loud-seam convention: never silent wrong pixels.

The encoder exists for the usual reason (``synthesize_tiff`` →
``decode_media_real`` without binary fixtures): a real TIFF-LZW
compressor with the early width change and dictionary reset, real
PackBits run packing, and real zlib streams, so the decoder is
exercised against genuinely compressed data. All supported paths are
LOSSLESS, so a SQL oracle re-derives decoded means exactly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# tag ids (TIFF 6.0 §8)
T_WIDTH, T_LENGTH, T_BPS, T_COMP, T_PHOTO = 256, 257, 258, 259, 262
T_STRIP_OFF, T_SPP, T_ROWS_PER_STRIP, T_STRIP_CNT = 273, 277, 278, 279
T_PLANAR, T_PREDICTOR, T_COLORMAP = 284, 317, 320
T_TILE_W, T_TILE_L = 322, 323

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i"}


def lzw_decode(data: bytes, n_bytes: int) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first bit packing, fixed root
    alphabet of 256 byte values, ClearCode 256, EndOfInformation 257,
    and the EARLY code-width change — widths grow one code sooner than
    the GIF scheme. The width counter mirrors the ENCODER's table
    counter directly (258 + data codes read since clear — every data
    code the encoder emits coincides with one table assignment on its
    side, including a virtual one at the final flush), the giflib
    RunningCode technique: counting the decoder's OWN entries instead
    desynchronizes by one at every clear because the first code after
    a clear assigns nothing. Returns exactly ``n_bytes`` (loud if
    short)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    prefix = np.full(4096, -1, np.int32)
    suffix = np.zeros(4096, np.uint8)
    next_slot = EOI + 1     # decoder's own table fill (lags wcount by 1)
    wcount = EOI + 1        # the encoder's next_code trajectory
    width = 9
    acc = bits = 0
    pos = 0
    prev = -1
    buf = bytearray()

    def expand(code: int) -> bytes:
        buf.clear()
        while code >= CLEAR:
            buf.append(suffix[code])
            code = prefix[code]
        buf.append(code)
        return bytes(buf[::-1])

    while True:
        while bits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[pos]
            bits += 8
            pos += 1
        code = (acc >> (bits - width)) & ((1 << width) - 1)
        bits -= width
        if code == CLEAR:
            next_slot = EOI + 1
            wcount = EOI + 1
            width = 9
            prev = -1
            continue
        if code == EOI:
            break
        if prev < 0:
            if code >= CLEAR:
                raise ValueError("TIFF LZW stream starts with a "
                                 "non-root code")
            seq = bytes([code])
        elif code < next_slot:
            seq = expand(code)
        elif code == next_slot:
            seq = expand(prev)          # KwKwK
            seq += seq[:1]
        else:
            raise ValueError(f"TIFF LZW code {code} out of range")
        out += seq
        if prev >= 0 and next_slot < 4096:
            prefix[next_slot] = prev
            suffix[next_slot] = seq[0]
            next_slot += 1
        # EARLY CHANGE: grow when the encoder's next assignable code
        # is the last expressible value at this width (2^w - 1) — one
        # code earlier than GIF's 2^w growth point
        wcount += 1
        if wcount == (1 << width) - 1 and width < 12:
            width += 1
        prev = code
        if len(out) >= n_bytes:
            break
    if len(out) < n_bytes:
        raise ValueError(f"TIFF LZW strip short: {len(out)} of "
                         f"{n_bytes} bytes decoded")
    return bytes(out[:n_bytes])


def lzw_encode(raw: bytes) -> bytes:
    """TIFF-variant LZW compressor: MSB-first packing, emits CLEAR
    first, EARLY width change (switch to w+1 bits when the next code
    to be assigned is ``2^w - 1``), dictionary reset at 4094 — a real
    compressor so decoders see genuine variable-width streams."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8
        acc &= (1 << bits) - 1

    table: dict[bytes, int] = {}

    def reset() -> int:
        table.clear()
        for i in range(256):
            table[bytes([i])] = i
        return EOI + 1

    width = 9
    next_code = reset()
    emit(CLEAR, width)
    seq = b""
    for bv in raw:
        cand = seq + bytes([bv])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        # the encoder's width ticks at the SAME early point: once the
        # next code to assign is 2^w - 1, codes are written w+1 wide
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:           # spec-recommended reset point
            emit(CLEAR, width)
            width = 9
            next_code = reset()
        seq = bytes([bv])
    if seq:
        emit(table[seq], width)
        # the final flush ticks the width counter too (libtiff bumps
        # the width before EOI when the boundary lands exactly here),
        # keeping the decoder's code-counter mirror exact at the tail
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(EOI, width)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def packbits_decode(data: bytes, n_bytes: int) -> bytes:
    """PackBits (spec §9): n in 0..127 copies n+1 literals; n in
    -127..-1 repeats the next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    pos = 0
    while len(out) < n_bytes:
        if pos >= len(data):
            raise ValueError("TIFF PackBits strip truncated")
        n = struct.unpack_from("b", data, pos)[0]
        pos += 1
        if n >= 0:
            chunk = data[pos:pos + n + 1]
            if len(chunk) < n + 1:
                raise ValueError("TIFF PackBits literal run truncated")
            out += chunk
            pos += n + 1
        elif n != -128:
            if pos >= len(data):
                raise ValueError("TIFF PackBits repeat run truncated")
            out += data[pos:pos + 1] * (1 - n)
            pos += 1
    if len(out) != n_bytes:
        raise ValueError(f"TIFF PackBits strip size {len(out)} != "
                         f"expected {n_bytes}")
    return bytes(out)


def packbits_encode(raw: bytes) -> bytes:
    """Real PackBits packing: maximal repeat runs (≥3 pay off), literal
    runs otherwise, both capped at 128 per the spec."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        # measure the repeat run at i
        j = i + 1
        while j < n and j - i < 128 and raw[j] == raw[i]:
            j += 1
        if j - i >= 3:
            out.append((257 - (j - i)) & 0xFF)   # -(run-1) as unsigned
            out.append(raw[i])
            i = j
            continue
        # literal run: until the next ≥3 repeat or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and raw[k] == raw[k + 1] == raw[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += raw[i:k]
        i = k
    return bytes(out)


def _read_ifd(data: bytes, bo: str) -> dict[int, tuple]:
    """Parse the first IFD into {tag: (type, values tuple)}."""
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    return read_ifd_at(data, bo, ifd_off)


def _ifd_offsets(data: bytes, bo: str) -> list[int]:
    """Walk the IFD chain (multi-page TIFFs link pages through the
    next-IFD pointer after each entry table)."""
    (off,) = struct.unpack_from(bo + "I", data, 4)
    out = []
    while off:
        if off + 2 > len(data):
            raise ValueError("TIFF IFD offset beyond payload")
        out.append(off)
        (n,) = struct.unpack_from(bo + "H", data, off)
        nxt_at = off + 2 + 12 * n
        if nxt_at + 4 > len(data):
            raise ValueError("TIFF IFD chain truncated")
        (off,) = struct.unpack_from(bo + "I", data, nxt_at)
        if len(out) > 10000:
            raise ValueError("TIFF IFD chain loops")
    return out


def read_ifd_at(data: bytes, bo: str, ifd_off: int) -> dict[int, tuple]:
    """Parse one IFD at an explicit offset — the first image IFD, or
    an EXIF/GPS sub-IFD reached through a pointer tag. Unknown field
    types are skipped per spec §7; ASCII/rational/undefined values
    are kept as raw bytes for the caller to interpret."""
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF IFD offset beyond payload")
    (n_entries,) = struct.unpack_from(bo + "H", data, ifd_off)
    tags: dict[int, tuple] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(data):
            raise ValueError("TIFF IFD entry truncated")
        tag, typ, count = struct.unpack_from(bo + "HHI", data, off)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue                     # unknown field type: skip (spec §7)
        total = size * count
        voff = off + 8 if total <= 4 else \
            struct.unpack_from(bo + "I", data, off + 8)[0]
        if voff + total > len(data):
            raise ValueError(f"TIFF tag {tag} value beyond payload")
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:                  # rational/undefined: keep raw
            tags[tag] = (typ, data[voff:voff + total])
            continue
        vals = struct.unpack_from(bo + fmt * count, data, voff)
        tags[tag] = (typ, vals)
    return tags


def parse_tiff(data: bytes) -> dict:
    """Decode a TIFF payload into {width, height, photometric, bits,
    px} — ``px`` an (h, w) uint8/uint16 intensity grid (photometric 0
    inverted so 0 is always black) or an (h, w, 3) RGB grid (palette
    expanded through the ColorMap, 16-bit entries scaled to the
    sample width by the standard >>8)."""
    if data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload (missing II/MM byte order)")
    bo = "<" if data[:2] == b"II" else ">"
    _check_magic(data, bo)
    offs = _ifd_offsets(data, bo)
    if not offs:
        raise ValueError("TIFF with no IFDs (first-IFD offset is 0)")
    # decode ONLY the first page (a 100-page scan shouldn't pay 100
    # decompressions for one page's stats); the chain walk is a cheap
    # metadata pass that still reports the page count
    first = _parse_page(data, bo, read_ifd_at(data, bo, offs[0]))
    first["n_pages"] = len(offs)
    return first


def _check_magic(data: bytes, bo: str) -> None:
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic == 43:
        raise NotImplementedError("BigTIFF (magic 43) not supported "
                                  "(classic TIFF only)")
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")


def parse_tiff_pages(data: bytes) -> list[dict]:
    """Decode EVERY page of a (possibly multi-page) TIFF — scanned
    documents routinely chain pages through the next-IFD pointer, and
    decoding only the first would silently lose data."""
    if data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload (missing II/MM byte order)")
    bo = "<" if data[:2] == b"II" else ">"
    _check_magic(data, bo)
    offs = _ifd_offsets(data, bo)
    if not offs:
        raise ValueError("TIFF with no IFDs (first-IFD offset is 0)")
    return [_parse_page(data, bo, read_ifd_at(data, bo, off))
            for off in offs]


def _parse_page(data: bytes, bo: str, tags: dict) -> dict:
    def val(tag: int, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return tags[tag][1]

    w = val(T_WIDTH)[0]
    h = val(T_LENGTH)[0]
    spp = val(T_SPP, (1,))[0]
    bps = val(T_BPS, (8,) * spp)
    comp = val(T_COMP, (1,))[0]
    photo = val(T_PHOTO)[0]
    planar = val(T_PLANAR, (1,))[0]
    predictor = val(T_PREDICTOR, (1,))[0]
    if planar != 1:
        raise NotImplementedError(
            f"planar configuration {planar} not supported (chunky only)")
    if len(set(bps)) != 1 or bps[0] not in (8, 16):
        raise NotImplementedError(
            f"bits-per-sample {bps} not supported (uniform 8/16 only)")
    depth = bps[0]
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples per pixel")
    if photo in (0, 1, 3) and spp != 1:
        raise NotImplementedError(
            f"{spp} samples per pixel with photometric {photo}")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"photometric interpretation {photo} not supported")
    if predictor not in (1, 2):
        raise NotImplementedError(f"predictor {predictor} not supported")

    dt = np.dtype(("<u2" if bo == "<" else ">u2") if depth == 16
                  else np.uint8)
    out_dt = np.uint16 if depth == 16 else np.uint8

    def decompress(raw: bytes, want: int) -> bytes:
        if comp == 1:
            if len(raw) < want:
                raise ValueError("TIFF uncompressed chunk truncated")
            return raw[:want]
        if comp == 5:
            return lzw_decode(raw, want)
        if comp in (8, 32946):
            out = zlib.decompress(raw)
            if len(out) != want:
                raise ValueError("TIFF deflate chunk size mismatch")
            return out
        if comp == 32773:
            return packbits_decode(raw, want)
        raise NotImplementedError(
            f"TIFF compression {comp} not supported "
            "(none/LZW/Deflate/PackBits only)")

    def undiff(arr: np.ndarray) -> np.ndarray:
        # horizontal differencing: each sample stored as the delta
        # from the same sample one pixel left; undo with a row-wise
        # cumsum, wrapping in the sample's own modular arithmetic
        # (axis 1 is the pixel axis for (rows, cols) and chunky
        # (rows, cols, spp) alike)
        return np.cumsum(arr, axis=1, dtype=np.int64).astype(out_dt)

    if T_TILE_W in tags or T_TILE_L in tags:
        # tiled organization (the GeoTIFF default): fixed tw×th tiles
        # in row-major tile order, each compressed independently and
        # PADDED to the full tile size at the right/bottom edges; the
        # predictor runs within each tile's own rows
        tw = val(T_TILE_W)[0]
        th = val(T_TILE_L)[0]
        if tw % 16 or th % 16:
            raise ValueError(f"TIFF tile size {tw}x{th} not a "
                             "multiple of 16")
        offsets = val(324)              # TileOffsets
        counts = val(325)               # TileByteCounts
        across = -(-w // tw)
        down = -(-h // th)
        if len(offsets) != across * down or len(counts) != len(offsets):
            raise ValueError("TileOffsets count disagrees with the "
                             "tile grid")
        shape = (h, w, spp) if spp > 1 else (h, w)
        px = np.zeros(shape, out_dt)
        want = tw * th * spp * (depth // 8)
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise ValueError("TIFF tile beyond payload")
            raw = decompress(data[off:off + cnt], want)
            tile = np.frombuffer(raw, dt).reshape(
                (th, tw, spp) if spp > 1 else (th, tw))
            tile = undiff(tile) if predictor == 2 \
                else tile.astype(out_dt)
            y0 = (ti // across) * th
            x0 = (ti % across) * tw
            ch = min(th, h - y0)
            cw = min(tw, w - x0)
            px[y0:y0 + ch, x0:x0 + cw] = tile[:ch, :cw]
    else:
        offsets = val(T_STRIP_OFF)
        counts = val(T_STRIP_CNT)
        rows_per_strip = val(T_ROWS_PER_STRIP, (h,))[0]
        if len(offsets) != len(counts):
            raise ValueError("StripOffsets/StripByteCounts length "
                             "mismatch")
        n_strips = -(-h // rows_per_strip)
        if len(offsets) != n_strips:
            raise ValueError(f"{len(offsets)} strips for {h} rows at "
                             f"{rows_per_strip} rows/strip")
        row_bytes = w * spp * (depth // 8)
        chunks = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise ValueError("TIFF strip beyond payload")
            strip_rows = min(rows_per_strip, h - si * rows_per_strip)
            chunks.append(decompress(data[off:off + cnt],
                                     strip_rows * row_bytes))
        flat = b"".join(chunks)
        px = np.frombuffer(flat, dt).reshape(h, w * spp if spp > 1
                                             else w)
        if spp > 1:
            px = px.reshape(h, w, spp)
        px = undiff(px) if predictor == 2 else px.astype(out_dt)

    if photo == 0:
        # WhiteIsZero: invert to intensity so 0 is black everywhere
        px = ((1 << depth) - 1 - px.astype(np.int64)).astype(px.dtype)
    if photo == 3:
        (typ, cmap) = tags.get(T_COLORMAP, (None, None))
        if cmap is None:
            raise ValueError("palette TIFF without a ColorMap")
        n = 1 << depth
        if len(cmap) != 3 * n:
            raise ValueError(f"ColorMap has {len(cmap)} entries, "
                             f"expected {3 * n}")
        cm = np.asarray(cmap, np.uint32).reshape(3, n).T   # (n, 3) RGB
        if int(px.max(initial=0)) >= n:
            raise ValueError("TIFF pixel index beyond the ColorMap")
        # ColorMap entries are 16-bit; scale to the sample width
        px = (cm[px] >> 8).astype(np.uint8)
    if photo == 2 and spp > 3:
        px = px[:, :, :3]               # drop extra samples (alpha etc.)
    return {"width": w, "height": h, "photometric": photo,
            "bits": depth, "px": px}


def _entry(bo: str, tag: int, typ: int, vals: tuple,
           extra: list, base_len: int) -> bytes:
    """One 12-byte IFD entry; long values appended to ``extra`` at
    offsets starting past ``base_len``."""
    fmt = _TYPE_FMT[typ]
    size = _TYPE_SIZE[typ]
    payload = struct.pack(bo + fmt * len(vals), *vals)
    head = struct.pack(bo + "HHI", tag, typ, len(vals))
    if len(payload) <= 4:
        return head + payload.ljust(4, b"\x00")
    off = base_len + sum(len(e) for e in extra)
    if off % 2:                          # spec: values begin on a word
        extra.append(b"\x00")
        off += 1
    extra.append(payload)
    return head + struct.pack(bo + "I", off)


def build_tiff(px: np.ndarray, photometric: int = 1,
               compression: int = 1, predictor: int = 1,
               big_endian: bool = False, rows_per_strip: int | None = None,
               colormap: np.ndarray | None = None,
               tile_size: tuple | None = None) -> bytes:
    """Assemble a spec-shaped classic TIFF from an (h, w) gray /
    palette-index grid (uint8 or uint16 for gray) or an (h, w, 3)
    uint8 RGB grid. ``photometric`` 0 stores the INVERTED samples so
    the decoded intensity equals the input (a decoder that ignores
    WhiteIsZero reads wrong pixels). ``colormap`` is an (n, 3) array
    of 16-bit channel values for photometric 3. ``tile_size`` (tw,
    th), multiples of 16, switches to the TILED organization (the
    GeoTIFF default): row-major tiles, each compressed independently,
    edge tiles zero-padded to the full tile size per spec."""
    bo = ">" if big_endian else "<"
    head = (b"MM" if big_endian else b"II") + struct.pack(bo + "HI",
                                                          42, 8)
    return head + _page_block(px, photometric, compression, predictor,
                              bo, rows_per_strip, colormap, tile_size,
                              block_start=8, next_ptr=0)


def build_tiff_multipage(grids: list, photometric: int = 1,
                         compression: int = 1, predictor: int = 1,
                         big_endian: bool = False,
                         rows_per_strip: int | None = None,
                         colormap: np.ndarray | None = None,
                         tile_size: tuple | None = None) -> bytes:
    """Multi-page TIFF (the scanned-document layout): one IFD chain,
    each page an independent image block, linked through the next-IFD
    pointers. Page options are shared; pages may differ in size."""
    if not grids:
        raise ValueError("build_tiff_multipage wants at least one page")
    bo = ">" if big_endian else "<"
    opts = (photometric, compression, predictor, bo, rows_per_strip,
            colormap, tile_size)
    # block lengths are position-independent ONLY between starts of
    # equal parity (_entry's word-alignment pad depends on the
    # absolute offset): measure at an EVEN dummy start and keep every
    # real start even by padding odd blocks with one inert byte
    lengths = [len(_page_block(g, *opts, block_start=8, next_ptr=0))
               for g in grids]
    starts = [8]
    for ln in lengths[:-1]:
        starts.append(starts[-1] + ln + (ln & 1))
    out = bytearray((b"MM" if big_endian else b"II")
                    + struct.pack(bo + "HI", 42, 8))
    for i, g in enumerate(grids):
        nxt = starts[i + 1] if i + 1 < len(grids) else 0
        block = _page_block(g, *opts, block_start=starts[i],
                            next_ptr=nxt)
        assert len(block) == lengths[i], "page block length drifted"
        out += block
        if len(block) & 1:
            out += b"\x00"
    return bytes(out)


def _page_block(px: np.ndarray, photometric: int, compression: int,
                predictor: int, bo: str, rows_per_strip: int | None,
                colormap: np.ndarray | None, tile_size: tuple | None,
                block_start: int, next_ptr: int) -> bytes:
    px = np.asarray(px)
    if photometric == 2:
        if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
            raise ValueError("RGB build_tiff wants (h, w, 3) uint8")
        h, w, spp = px.shape
        depth = 8
    else:
        if px.ndim != 2:
            raise ValueError("gray/palette build_tiff wants (h, w)")
        h, w = px.shape
        spp = 1
        depth = 16 if px.dtype == np.uint16 else 8
    if photometric == 3 and (colormap is None
                             or len(colormap) != (1 << depth)):
        raise ValueError("palette build_tiff wants a full-size colormap")
    if photometric == 0:
        px = ((1 << depth) - 1 - px.astype(np.int64)).astype(px.dtype)

    rows_per_strip = rows_per_strip or h
    sample_dt = np.dtype((bo + "u2") if depth == 16 else "u1")

    def encode_chunk(band: np.ndarray) -> bytes:
        if predictor == 2:
            zshape = list(band.shape)
            zshape[1] = 1
            band = np.diff(band.astype(np.int64), axis=1,
                           prepend=np.zeros(zshape, np.int64))
            band = band.astype(np.uint16 if depth == 16 else np.uint8)
        raw = band.astype(sample_dt).tobytes()
        if compression == 1:
            return raw
        if compression == 5:
            return lzw_encode(raw)
        if compression == 8:
            return zlib.compress(raw, 6)
        if compression == 32773:
            return packbits_encode(raw)
        raise ValueError(f"build_tiff compression {compression}")

    if tile_size is not None:
        tw, th = tile_size
        if tw % 16 or th % 16:
            raise ValueError("tile size must be a multiple of 16")
        pad_h = -(-h // th) * th
        pad_w = -(-w // tw) * tw
        pshape = (pad_h, pad_w, spp) if spp > 1 else (pad_h, pad_w)
        padded = np.zeros(pshape, px.dtype)
        padded[:h, :w] = px
        strips = [encode_chunk(padded[y0:y0 + th, x0:x0 + tw])
                  for y0 in range(0, pad_h, th)
                  for x0 in range(0, pad_w, tw)]
    else:
        strips = [encode_chunk(px[y0:y0 + rows_per_strip])
                  for y0 in range(0, h, rows_per_strip)]

    tag_list = [
        (T_WIDTH, 3, (w,)), (T_LENGTH, 3, (h,)),
        (T_BPS, 3, (depth,) * spp), (T_COMP, 3, (compression,)),
        (T_PHOTO, 3, (photometric,)),
        (T_SPP, 3, (spp,)),
        (T_PLANAR, 3, (1,)),
    ]
    if tile_size is not None:
        tag_list += [(T_TILE_W, 3, (tile_size[0],)),
                     (T_TILE_L, 3, (tile_size[1],))]
        off_tag, cnt_tag = 324, 325
    else:
        tag_list.append((T_ROWS_PER_STRIP, 3, (rows_per_strip,)))
        off_tag, cnt_tag = T_STRIP_OFF, T_STRIP_CNT
    if predictor != 1:
        tag_list.append((T_PREDICTOR, 3, (predictor,)))
    if photometric == 3:
        cm = np.asarray(colormap, np.uint32)
        tag_list.append((T_COLORMAP, 3,
                         tuple(int(v) for v in cm.T.reshape(-1))))
    n_strips = len(strips)
    # block layout: IFD [entries + next-ptr] extras... chunks... —
    # the BLOCK's length is position-independent, so a multi-page
    # writer can measure pages with a dummy start and then place them
    n_entries = len(tag_list) + 2       # + chunk offsets/byte-counts
    ifd_len = 2 + 12 * n_entries + 4
    base = block_start + ifd_len

    # chunk offsets depend on extras length: build extras in two passes
    def render(strip_base: int) -> tuple[bytes, list]:
        extra: list = []
        full = sorted(
            tag_list
            + [(off_tag, 4, tuple(
                strip_base + sum(len(s) for s in strips[:i])
                for i in range(n_strips))),
               (cnt_tag, 4, tuple(len(s) for s in strips))])
        body = b"".join(_entry(bo, t, ty, v, extra, base)
                        for t, ty, v in full)
        return body, extra

    _, probe = render(0)
    strip_base = base + sum(len(e) for e in probe)
    body, extra = render(strip_base)
    assert sum(len(e) for e in extra) == sum(len(e) for e in probe)
    out = bytearray()
    out += struct.pack(bo + "H", n_entries) + body
    out += struct.pack(bo + "I", next_ptr)
    out += b"".join(extra)
    out += b"".join(strips)
    return bytes(out)
