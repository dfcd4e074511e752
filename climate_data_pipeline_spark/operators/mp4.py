"""ISO-BMFF (MP4/QuickTime) demux — pure struct parsing, no external
media libraries, the same spec-fixture pattern as the RIFF/AVI walk in
``video.py`` and the container codecs in ``sources/`` (netcdf3, hdf5,
zarr). Real video corpora are overwhelmingly MP4; full H.264 decode is
out of scope dependency-free, but the BOX WALK is not: sample tables
(stsd/stts/stsc/stsz/stco) locate every frame's bytes, so

- ``parse_mp4_mjpeg``: extract + decode-ready frames for 'jpeg'-coded
  tracks (the MJPEG-in-MP4 convention) — the ``frame_sample`` /
  ``frame_dedup_report`` operators run unchanged on MP4 payloads;
- ``mp4_info``: metadata-only stats (codec, dimensions, sample count,
  duration) for ANY codec — the curation signal that needs no decoder;
- anything that would require an H.264/H.265/VP9 decoder raises a loud
  ``NotImplementedError`` per payload, never silent wrong pixels.

Written against the public ISO/IEC 14496-12 box structure: box =
[size:u32 BE][fourcc] (size 1 → u64 largesize follows, size 0 → to end
of enclosing box); sample-to-chunk runs expand per 8.7.4; chunk offsets
are absolute file offsets (stco u32 / co64 u64).

The builder exists for the same reason ``build_avi_mjpeg`` does: the
decoder must be exercised against genuinely assembled containers
without shipping binary fixtures. It writes mdat BEFORE moov (offsets
known at build time) and groups samples two-per-chunk so the stsc
run-expansion path is actually exercised.
"""

from __future__ import annotations

import struct

# sample-entry fourccs whose frames are baseline/progressive JPEG
# payloads a pure-python decoder can handle
JPEG_SAMPLE_ENTRIES = (b"jpeg", b"mjpa", b"mjpb", b"MJPG")


def _boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) walking one box
    level. Handles 64-bit largesize and size-0 (extends to the end of
    the enclosing box)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos:
            raise ValueError(f"malformed BMFF box {typ!r} (size {size})")
        yield typ, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, typ: bytes):
    for t, b, e in _boxes(data, start, end):
        if t == typ:
            return b, e
    return None


def _full(data: bytes, pos: int) -> tuple[int, int, int]:
    """(version, flags, payload_pos) of a FullBox."""
    vf = struct.unpack_from(">I", data, pos)[0]
    return vf >> 24, vf & 0xFFFFFF, pos + 4


def mp4_info(data: bytes) -> dict:
    """Metadata-only stats for the first VIDEO track of an ISO-BMFF
    payload — codec fourcc, width/height (from the sample entry),
    sample count, timescale/duration → fps — readable for ANY codec:
    the curation signal (resolution filters, duration buckets, codec
    census) that needs no frame decoder."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("BMFF without a moov box")
    for t, b, e in _boxes(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue

        def need(span, typ):
            # loud-seam contract: a video track missing a mandatory box
            # is a descriptive ValueError, never a NoneType TypeError
            found = _find(data, *span, typ)
            if found is None:
                raise ValueError("BMFF video track without a "
                                 f"{typ.decode('latin-1')} box")
            return found

        mdhd = need(mdia, b"mdhd")
        ver, _, p = _full(data, mdhd[0])
        if ver == 1:
            timescale, duration = struct.unpack_from(">IQ", data, p + 16)
        else:
            _, _, timescale, duration = struct.unpack_from(">4I", data, p)
        minf = need(mdia, b"minf")
        stbl = need(minf, b"stbl")
        stsd = need(stbl, b"stsd")
        _, _, p = _full(data, stsd[0])
        (n_entries,) = struct.unpack_from(">I", data, p)
        if n_entries < 1:
            raise ValueError("empty stsd sample description")
        # first sample entry starts at p+4: [size:4][fourcc:4], then
        # VisualSampleEntry fields — 6 reserved + data_reference_index
        # (2) + 16 pre_defined/reserved, so width sits 32 bytes into
        # the entry (14496-12 12.1.3)
        codec = data[p + 8:p + 12]
        w, hgt = struct.unpack_from(">HH", data, p + 4 + 32)
        stsz = need(stbl, b"stsz")
        _, _, q = _full(data, stsz[0])
        sample_size, n_samples = struct.unpack_from(">II", data, q)
        stts = need(stbl, b"stts")
        _, _, q = _full(data, stts[0])
        (n_tt,) = struct.unpack_from(">I", data, q)
        delta = struct.unpack_from(">II", data, q + 4)[1] if n_tt else 0
        fps = round(timescale / delta) if delta else 0
        # pure metadata out — no parser state (callers project this
        # into rows; a byte-offset tuple would break equality of
        # otherwise-identical metadata across container layouts)
        return {"codec": codec.decode("latin-1"), "width": w,
                "height": hgt, "n_samples": n_samples,
                "timescale": timescale, "duration": duration,
                "fps": fps, "uniform_sample_size": sample_size}
    raise ValueError("BMFF without a video ('vide') track")


def _video_stbl(data: bytes) -> tuple[int, int]:
    """(start, end) of the first video track's sample table box."""
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("BMFF without a moov box")
    for t, b, e in _boxes(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        minf = _find(data, *mdia, b"minf")
        stbl = _find(data, *minf, b"stbl") if minf else None
        if stbl is None:
            raise ValueError("BMFF video track without a minf/stbl box")
        return stbl
    raise ValueError("BMFF without a video ('vide') track")


def _sample_ranges(data: bytes, stbl: tuple[int, int],
                   n_samples: int, uniform_size: int) -> list[tuple[int, int]]:
    """(offset, size) of every sample, expanding the stsc
    sample-to-chunk runs against stco/co64 chunk offsets (14496-12
    8.7.4/8.7.5): within a chunk, samples are laid out back to back."""
    stsz = _find(data, *stbl, b"stsz")
    _, _, q = _full(data, stsz[0])
    if uniform_size:
        sizes = [uniform_size] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", data, q + 8))
    co = _find(data, *stbl, b"stco")
    if co is not None:
        _, _, q = _full(data, co[0])
        (nch,) = struct.unpack_from(">I", data, q)
        chunk_offs = list(struct.unpack_from(f">{nch}I", data, q + 4))
    else:
        co = _find(data, *stbl, b"co64")
        if co is None:
            raise ValueError("BMFF sample table without stco/co64")
        _, _, q = _full(data, co[0])
        (nch,) = struct.unpack_from(">I", data, q)
        chunk_offs = list(struct.unpack_from(f">{nch}Q", data, q + 4))
    stsc = _find(data, *stbl, b"stsc")
    _, _, q = _full(data, stsc[0])
    (nruns,) = struct.unpack_from(">I", data, q)
    runs = [struct.unpack_from(">III", data, q + 4 + 12 * i)
            for i in range(nruns)]      # (first_chunk, per_chunk, desc)
    # expand runs to per-chunk sample counts
    per_chunk: list[int] = []
    for i, (first, per, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else len(chunk_offs)
        per_chunk.extend([per] * (last - first + 1))
    out: list[tuple[int, int]] = []
    si = 0
    for coff, nsc in zip(chunk_offs, per_chunk):
        pos = coff
        for _ in range(nsc):
            if si >= n_samples:
                break
            out.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError("BMFF sample tables disagree: stsc/stco walk "
                         f"yields {si} samples, stsz declares {n_samples}")
    return out


def parse_mp4_mjpeg(data: bytes) -> dict:
    """Parse an ISO-BMFF payload whose video track is JPEG-coded into
    {width, height, fps, frames: [bytes]} — the same contract as
    ``parse_avi_mjpeg``, so every frame-level operator (sampling,
    hashing, dedup) runs on MP4 unchanged. Loud on other codecs: the
    box walk can still locate their samples (``mp4_info``), but no
    dependency-free decoder exists for them."""
    info = mp4_info(data)
    if info["codec"].encode("latin-1") not in JPEG_SAMPLE_ENTRIES:
        raise NotImplementedError(
            f"BMFF video codec {info['codec']!r} has no pure-python "
            "decoder (only JPEG-coded tracks); mp4_info still reads "
            "its metadata")
    ranges = _sample_ranges(data, _video_stbl(data), info["n_samples"],
                            info["uniform_sample_size"])
    frames = []
    for off, sz in ranges:
        if off + sz > len(data):
            raise ValueError("BMFF sample range beyond the payload "
                             "(truncated mdat)")
        frames.append(data[off:off + sz])
    return {"width": info["width"], "height": info["height"],
            "fps": info["fps"], "frames": frames}


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def _fullbox(typ: bytes, version: int, flags: int,
             payload: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


def build_mp4_mjpeg(frames: list[bytes], width: int, height: int,
                    fps: int = 10) -> bytes:
    """Assemble a spec-shaped MP4: ftyp + mdat (frames back to back) +
    moov(mvhd, trak(tkhd, mdia(mdhd, hdlr 'vide', minf(vmhd, dinf,
    stbl(stsd 'jpeg', stts, stsc, stsz, stco))))). Samples are grouped
    TWO per chunk so a reader must actually expand the stsc runs (a
    one-chunk-per-sample table would hide that path); offsets are
    absolute, which is why mdat precedes moov."""
    n = len(frames)
    timescale = 1000 * max(fps, 1)
    delta = 1000
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isomiso2")
    mdat_body = b"".join(frames)
    mdat_at = len(ftyp) + 8                 # payload offset of mdat
    mdat = _box(b"mdat", mdat_body)

    # chunking: pairs of samples; odd count leaves a 1-sample tail
    sizes = [len(f) for f in frames]
    chunk_offs, per_chunk = [], []
    pos, i = mdat_at, 0
    while i < n:
        take = min(2, n - i)
        chunk_offs.append(pos)
        per_chunk.append(take)
        pos += sum(sizes[i:i + take])
        i += take
    # stsc runs: [(1, 2)] (+ tail run if the last chunk holds 1)
    runs = []
    if per_chunk:
        if len(per_chunk) > 1 and per_chunk[-1] != per_chunk[0]:
            runs = [(1, per_chunk[0]), (len(per_chunk), per_chunk[-1])]
        else:
            runs = [(1, per_chunk[0])]

    mvhd = _fullbox(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x00010000, 0x0100) + bytes(10)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + bytes(24) + struct.pack(">I", 2))
    tkhd = _fullbox(b"tkhd", 0, 3, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + bytes(8)
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _fullbox(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0))        # 'und' language
    hdlr = _fullbox(b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(12)
                    + b"cdps video\x00")
    vmhd = _fullbox(b"vmhd", 0, 1, bytes(8))
    dref = _fullbox(b"dref", 0, 0, struct.pack(">I", 1)
                    + _fullbox(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    # VisualSampleEntry 'jpeg' (14496-12 12.1.3)
    entry = (struct.pack(">I", 86) + b"jpeg" + bytes(6)
             + struct.pack(">H", 1)             # data_reference_index
             + bytes(16)
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)
             + bytes(4) + struct.pack(">H", 1)
             + bytes(32)                        # compressorname
             + struct.pack(">Hh", 24, -1))
    stsd = _fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _fullbox(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _fullbox(b"stsc", 0, 0, struct.pack(">I", len(runs))
                    + b"".join(struct.pack(">III", fc, pc, 1)
                               for fc, pc in runs))
    stsz = _fullbox(b"stsz", 0, 0, struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", s) for s in sizes))
    stco = _fullbox(b"stco", 0, 0, struct.pack(">I", len(chunk_offs))
                    + b"".join(struct.pack(">I", o) for o in chunk_offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
