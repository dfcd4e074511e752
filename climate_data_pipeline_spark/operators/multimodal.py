"""Multimodal (image/audio/video) column plumbing (beyond-reference
extension): opaque ``binary`` payloads + typed metadata, with
decode / feature-extract / frame-sample operators over Arrow-batched
``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition-parallel
UDF shape, row-multiplying frame sampling — is real and tested, and so
are the CODECS: ``decode_media_real`` dispatches on magic bytes to the
repo's own pure-python decoders (netpbm, PNG at every legal depth,
baseline+progressive JPEG, GIF, BMP incl. RLE8, TIFF incl. tiles,
WebP VP8L, WAV PCM/G.711/float/extensible, AIFF, FLAC, MJPEG-AVI,
MP4), every one exercised against genuinely compressed payloads the
synthesizers here emit and value-checked against SQL oracles. Formats
whose codecs are out of dependency-free scope (lossy VP8, H.264,
MP3/Vorbis MDCT audio, arithmetic-coded JPEG) raise a crisp
per-payload error — or get metadata-only walkers (``mp4_info``,
``operators/audio_meta``) where screening stats are the honest
contract. ``decode_media`` (the byte-statistics fake) remains as the
cheap plumbing-demo twin.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .jpeg import (decode_jpeg, encode_jpeg_baseline,
                   encode_jpeg_progressive)
from .png import png_pixels
from .text import _spread

MEDIA_SCHEMA = "media_id long, media_type string, payload binary, n_bytes long"


def attach_payload(df: DataFrame, id_col: str, source_col: str,
                   media_type: str = "image/fake") -> DataFrame:
    """Demo builder: wrap an existing column as an opaque binary payload
    with typed metadata — the shape a real ingest (S3 object fetch,
    tar-shard extraction) would produce."""
    payload = F.encode(F.col(source_col).cast("string"), "UTF-8")
    return df.select(F.col(id_col).cast("long").alias("media_id"),
                     F.lit(media_type).alias("media_type"),
                     payload.alias("payload"),
                     F.length(payload).cast("long").alias("n_bytes"))


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build REAL media payloads deterministically from text rows — even
    ids become 16×16 8-bit PGM images (pixel = repeated text bytes), odd
    ids become 16-bit mono WAV clips (samples from scaled char codes) —
    so the real-codec path has genuine containers to decode without any
    external media library."""
    out_schema = MEDIA_SCHEMA

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        def pgm(text: str) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            px = np.frombuffer(raw, dtype=np.uint8)
            px = np.resize(px, 256).reshape(16, 16)
            return b"P5\n16 16\n255\n" + px.tobytes()

        def wav(text: str) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            # (b - 128) * 256 spans exactly [-32768, 32512]: every
            # UTF-8 byte maps into int16 without wrap (a -64 bias
            # overflowed for bytes >= 192, silently corrupting samples
            # for any non-ASCII text)
            samples = (np.frombuffer(raw, dtype=np.uint8)
                       .astype(np.int16) - 128) * 256
            samples = np.resize(samples, 400)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(samples.astype("<i2").tobytes())
            return buf.getvalue()

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads, types = [], []
            for i, t in zip(ids, pdf[text_col].fillna("")):
                if int(i) % 2 == 0:
                    payloads.append(pgm(t))
                    types.append("image/x-portable-graymap")
                else:
                    payloads.append(wav(t))
                    types.append("audio/wav")
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": types,
                "payload": payloads,
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
            })

    return (_spread(df).select(F.col(id_col), F.col(text_col))
              .mapInPandas(_synth, schema=out_schema))


def synthesize_png(df: DataFrame, id_col: str, text_col: str,
                   rgb_every: int = 3, adam7_every: int = 7,
                   subbyte_every: int = 0) -> DataFrame:
    """Build REAL PNG payloads deterministically from text rows: 16×16
    images whose pixels are the cycled UTF-8 bytes of the text (every
    ``rgb_every``-th id truecolor, others grayscale), zlib-compressed
    through a genuine scanline-filter pass — the per-row filter type
    cycles through None/Sub/Up/Average/Paeth on ``media_id % 5``, so a
    decoder with a wrong unfilter produces wrong PIXELS, not just a
    wrong container. Every 7th id is additionally written
    Adam7-INTERLACED (``adam7_every``; 0 disables; N ≤ 3 interlace the
    ``min(3, N-1)`` residue so N=1 really means every id), same
    pixels, so the interlace path sits under the same value oracle:
    interlacing changes the container layout, never the pixels, hence
    never the mean. With ``subbyte_every`` = N > 0, every GRAYSCALE id
    with ``media_id % N == 1`` is written 4-BIT (pixels = the high
    nibble ``byte >> 4``, MSB-first packed rows, same filter cycle
    applied to the packed bytes with bpp=1) — the common web-scrape
    palette/sub-byte shape, and the oracle re-derives its mean as
    ``byte // 16``. Because the pixels are the cycled text bytes, a
    SQL oracle can re-derive the decoded mean without touching zlib."""
    out_schema = MEDIA_SCHEMA

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as st
        import zlib

        import numpy as np

        def chunk(typ: bytes, data: bytes) -> bytes:
            return (st.pack(">I", len(data)) + typ + data
                    + st.pack(">I", zlib.crc32(typ + data)))

        def filt_sub(sub: np.ndarray, f: int, ch: int) -> bytes:
            # filter one (rows, cols*ch) sub-image; prev is the prior
            # row WITHIN the sub-image (per spec, each Adam7 pass
            # filters independently)
            lines = []
            for y in range(sub.shape[0]):
                row = sub[y]
                prev = sub[y - 1] if y else np.zeros_like(row)
                left = np.concatenate([np.zeros(ch, np.int32),
                                       row[:-ch]])
                upleft = np.concatenate([np.zeros(ch, np.int32),
                                         prev[:-ch]])
                if f == 0:
                    enc = row
                elif f == 1:
                    enc = row - left
                elif f == 2:
                    enc = row - prev
                elif f == 3:
                    enc = row - (left + prev) // 2
                else:
                    pa = np.abs(prev - upleft)
                    pb = np.abs(left - upleft)
                    pc = np.abs(left + prev - 2 * upleft)
                    pred = np.where((pa <= pb) & (pa <= pc), left,
                                    np.where(pb <= pc, prev, upleft))
                    enc = row - pred
                lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8)
                             .tobytes())
            return b"".join(lines)

        ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                 (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                 (0, 1, 1, 2))

        def png(text: str, media_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            # rgb_every <= 0 means "all grayscale" (media_id 0 is a
            # multiple of everything, so no modulus can express that)
            ch = 3 if rgb_every > 0 and media_id % rgb_every == 0 else 1
            px = np.resize(np.frombuffer(raw, dtype=np.uint8),
                           256 * ch).reshape(16, 16, ch).astype(np.int32)
            f = media_id % 5
            # residue min(3, N-1) keeps the "every N-th id" contract
            # honest for N <= 3 (media_id % 1 == 3 is never true)
            adam7 = (adam7_every > 0
                     and media_id % adam7_every == min(3, adam7_every - 1))
            subbyte = (subbyte_every > 0 and ch == 1
                       and media_id % subbyte_every == 1)
            if subbyte:
                px = px >> 4            # 4-bit samples: the high nibble

            def pack4(g: np.ndarray) -> np.ndarray:
                # (ph, pw) 0..15 values -> MSB-first packed bytes,
                # rows padded to a whole byte at odd widths
                if g.shape[1] % 2:
                    g = np.concatenate(
                        [g, np.zeros((g.shape[0], 1), np.int32)], axis=1)
                return (g[:, 0::2] << 4) | g[:, 1::2]

            def rows_of(sub: np.ndarray) -> np.ndarray:
                # filterable byte grid for one (sub-)image
                return (pack4(sub[:, :, 0]) if subbyte
                        else sub.reshape(len(sub), -1))

            # the filter's left-reference distance: bpp bytes,
            # floored at 1 for packed sub-byte rows (spec 9.2)
            bpp = 1 if subbyte else ch
            if adam7:
                parts = []
                for (x0, y0, dx, dy) in ADAM7:
                    sub = px[y0::dy, x0::dx]
                    if sub.size == 0:   # empty pass emits NO bytes
                        continue
                    parts.append(filt_sub(rows_of(sub), f, bpp))
                body = b"".join(parts)
            else:
                body = filt_sub(rows_of(px), f, bpp)
            ihdr = st.pack(">IIBBBBB", 16, 16, 4 if subbyte else 8,
                           2 if ch == 3 else 0, 0, 0, int(adam7))
            return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(body, 6))
                    + chunk(b"IEND", b""))

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [png(t, int(i))
                        for i, t in zip(ids, pdf[text_col].fillna(""))]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image/png"] * len(payloads),
                "payload": payloads,
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
            })

    return (_spread(df).select(F.col(id_col), F.col(text_col))
              .mapInPandas(_synth, schema=out_schema))


def synthesize_jpeg(df: DataFrame, id_col: str, text_col: str,
                    restart_interval: int = 3,
                    progressive_every: int = 0,
                    post=None) -> DataFrame:
    """Build REAL baseline JPEGs deterministically from text rows: 32×32
    grayscale images of sixteen 8×8 BLOCK-CONSTANT tiles whose values
    are the cycled UTF-8 bytes of the text, entropy-coded through the
    full Annex-K Huffman path with restart markers every
    ``restart_interval`` MCUs. The DC quantization step is 8, which
    makes a constant block's round trip EXACT (DC = 8·(v−128) divides
    evenly; all ACs are zero) — so a SQL oracle can re-derive the
    decoded mean straight from the text bytes while the decoder still
    has to get marker parsing, canonical Huffman codes, DC-prediction
    deltas (and their reset at every RSTn), dequantization and the IDCT
    scale exactly right to reproduce it.

    ``progressive_every`` = N > 0 writes every ``media_id % N == 2`` id
    as a PROGRESSIVE (SOF2) container of the same pixels — interleaved
    DC-first + refinement scans, two spectral AC bands at Al=1 with
    EOB-run coding, AC refinement — which round-trips equally exactly
    (the Annex-G scans reassemble the identical coefficients), so the
    same text-byte oracle pins the progressive decode path too.

    ``post``: optional ``(payload: bytes, media_id: int) -> bytes``
    applied per payload INSIDE the synth kernel — container-level
    fixture decoration (e.g. `exif.exif_jpeg_post`) fuses into this
    stage instead of paying a second mapInPandas round trip of the
    full payload bytes (guide §4)."""
    out_schema = MEDIA_SCHEMA

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        q = np.ones((8, 8), np.int64)
        q[0, 0] = 8

        def jpg(text: str, media_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            vals = np.resize(np.frombuffer(raw, dtype=np.uint8), 16)
            px = np.repeat(np.repeat(vals.reshape(4, 4), 8, 0), 8, 1)
            if progressive_every > 0 and media_id % progressive_every == 2:
                return encode_jpeg_progressive(
                    px.astype(np.uint8), quant_tables=(q, q))
            return encode_jpeg_baseline(
                px.astype(np.uint8), quant_tables=(q, q),
                restart_interval=restart_interval)

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [jpg(t, i) for t, i in
                        zip(pdf[text_col].fillna(""), ids)]
            if post is not None:
                payloads = [post(p, int(i))
                            for p, i in zip(payloads, ids)]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image/jpeg"] * len(payloads),
                "payload": payloads,
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
            })

    return (_spread(df).select(F.col(id_col), F.col(text_col))
              .mapInPandas(_synth, schema=out_schema))


def synthesize_gif(df: DataFrame, id_col: str, text_col: str,
                   interlace_every: int = 7,
                   animate_every: int = 5,
                   n_frames: int = 4) -> DataFrame:
    """Build REAL GIFs deterministically from text rows: 16×16 images
    through a 256-entry grayscale palette, pixels = the cycled UTF-8
    text bytes, LZW-compressed for real (``operators/gif.py``). Every
    ``interlace_every``-th id is row-INTERLACED (same pixels — the
    4-pass reorder must round-trip exactly or the mean shifts); every
    ``animate_every``-th id is an ANIMATED GIF of ``n_frames`` frames,
    frame f's pixels the text bytes cycled from offset f. Palette
    round trips are lossless, so a SQL oracle re-derives every decoded
    mean from the bytes."""
    out_schema = MEDIA_SCHEMA

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .gif import build_gif

        gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)

        def gif(text: str, media_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8)
            nf = (n_frames if animate_every > 0
                  and media_id % animate_every == 1 else 1)
            frames = [bts[(f + np.arange(256)) % len(bts)]
                      .reshape(16, 16) for f in range(nf)]
            il = (interlace_every > 0
                  and media_id % interlace_every == 3)
            return build_gif(frames, gray, interlace=il)

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [gif(t, i) for t, i in
                        zip(pdf[text_col].fillna(""), ids)]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image/gif"] * len(payloads),
                "payload": payloads,
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
            })

    return (_spread(df).select(F.col(id_col), F.col(text_col))
              .mapInPandas(_synth, schema=out_schema))


def synthesize_bmp(df: DataFrame, id_col: str, text_col: str,
                   rgb_every: int = 3,
                   topdown_every: int = 2,
                   rle_every: int = 5) -> DataFrame:
    """Build REAL BMPs deterministically from text rows: 16×16 images,
    pixels = the cycled UTF-8 text bytes — every ``rgb_every``-th id a
    24-bit BGR DIB, the others 8-bit through a grayscale palette;
    every ``topdown_every``-th id stored TOP-DOWN (negative height),
    the rest bottom-up, so a reader with the row order wrong decodes
    wrong pixels (caught per pixel, not per mean, in tests; the mean
    oracle stays orientation-invariant by construction). Every
    8-bit id with ``media_id % rle_every == 1`` is BI_RLE8-compressed
    (encoded runs + absolute mode + escapes; bottom-up per spec) —
    same pixels, so the RLE walk sits under the same oracle."""
    out_schema = MEDIA_SCHEMA

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .bmp import build_bmp

        gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)

        def bmp(text: str, media_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            td = topdown_every > 0 and media_id % topdown_every == 0
            if rgb_every > 0 and media_id % rgb_every == 0:
                px = np.resize(np.frombuffer(raw, np.uint8),
                               256 * 3).reshape(16, 16, 3)
                return build_bmp(px, top_down=td)
            idx = np.resize(np.frombuffer(raw, np.uint8),
                            256).reshape(16, 16)
            if rle_every > 0 and media_id % rle_every == 1:
                return build_bmp(idx, palette=gray, rle=True)
            return build_bmp(idx, palette=gray, top_down=td)

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [bmp(t, i) for t, i in
                        zip(pdf[text_col].fillna(""), ids)]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image/bmp"] * len(payloads),
                "payload": payloads,
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
            })

    return (_spread(df).select(F.col(id_col), F.col(text_col))
              .mapInPandas(_synth, schema=out_schema))


def synthesize_tiff(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build REAL TIFFs deterministically from text rows: 16×16 images,
    pixels = the cycled UTF-8 text bytes, through five residue classes
    of ``media_id % 5`` that together cover the decoder's support
    matrix (``operators/tiff.py``):

    - 0: RGB chunky, little-endian, uncompressed, one strip
    - 1: 8-bit gray, little-endian, LZW + horizontal Predictor 2,
         TILED 16×16 (the GeoTIFF organization; real variable-width
         early-change streams)
    - 2: 8-bit palette-color, PackBits, ColorMap entries ``v*257`` so
         the standard ``>>8`` expansion returns the byte exactly
    - 3: 16-bit gray, BIG-endian, Deflate — samples ``byte*257``, so
         the decoded mean is exactly 257× the byte mean (a wrong byte
         order or sample width shifts it)
    - 4: 8-bit gray, big-endian, WhiteIsZero (photometric 0) with the
         INVERTED samples stored, 5-row strips — a decoder that
         ignores the photometric reads wrong pixels

    Every class is lossless, so a SQL oracle re-derives each decoded
    mean from the text bytes."""
    out_schema = MEDIA_SCHEMA

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .tiff import build_tiff

        cmap = np.stack([np.arange(256, dtype=np.uint32) * 257] * 3, 1)

        def tif(text: str, media_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8)
            c = media_id % 5
            if c == 0:
                px = np.resize(bts, 256 * 3).reshape(16, 16, 3)
                return build_tiff(px, photometric=2)
            g = np.resize(bts, 256).reshape(16, 16)
            if c == 1:
                # TILED organization (the GeoTIFF default): same
                # pixels, so the oracle is untouched while the tile
                # walk + per-tile predictor sit under the same hash
                return build_tiff(g, photometric=1, compression=5,
                                  predictor=2, tile_size=(16, 16))
            if c == 2:
                return build_tiff(g, photometric=3, colormap=cmap,
                                  compression=32773)
            if c == 3:
                return build_tiff(g.astype(np.uint16) * 257,
                                  photometric=1, compression=8,
                                  big_endian=True)
            return build_tiff(g, photometric=0, big_endian=True,
                              rows_per_strip=5)

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [tif(t, i) for t, i in
                        zip(pdf[text_col].fillna(""), ids)]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image/tiff"] * len(payloads),
                "payload": payloads,
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
            })

    return (_spread(df).select(F.col(id_col), F.col(text_col))
              .mapInPandas(_synth, schema=out_schema))


def synthesize_webp(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build REAL lossless WebPs deterministically from text rows:
    16×16 images, pixels = the cycled UTF-8 text bytes, through five
    residue classes of ``media_id % 5`` covering the VP8L decoder's
    support matrix (``operators/webp.py``):

    - 0: gray literals (r=g=b=byte), plain prefix-coded stream
    - 1: RGB with per-channel phase shifts (r/g/b cycle from offsets
         0/1/2) + the SUBTRACT-GREEN transform — the decoder must add
         green back or every non-gray pixel is wrong
    - 2: gray + a 4-bit COLOR CACHE — repeated bytes come back as
         cache references, so a wrong 0x1e35a7bd hash or insertion
         order shifts pixels
    - 3: 16-color palette (COLOR-INDEXING transform) with 4-bit pixel
         BUNDLING and the delta-coded palette; values ``17·(byte%16)``
    - 4: 16×32 gray with every odd row an LZ77 backward reference
         (length 16, 2D distance code 1 = one row up)

    VP8L is lossless, so a SQL oracle re-derives every decoded mean
    from the text bytes."""
    out_schema = MEDIA_SCHEMA

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .webp import build_webp, encode_vp8l

        pal = np.stack([np.arange(16, dtype=np.uint8) * 17] * 3
                       + [np.full(16, 255, np.uint8)], axis=1)

        def wp(text: str, media_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8)
            g = bts[np.arange(256) % len(bts)].reshape(16, 16)
            c = media_id % 5
            if c == 0:
                px = np.stack([g, g, g, np.full_like(g, 255)], 2)
                return build_webp(encode_vp8l(px))
            if c == 1:
                r = g
                gg = bts[(1 + np.arange(256)) % len(bts)].reshape(16, 16)
                b = bts[(2 + np.arange(256)) % len(bts)].reshape(16, 16)
                px = np.stack([r, gg, b, np.full_like(g, 255)], 2)
                return build_webp(encode_vp8l(px, subtract_green=True))
            if c == 2:
                px = np.stack([g, g, g, np.full_like(g, 255)], 2)
                return build_webp(encode_vp8l(px, cache_bits=4))
            if c == 3:
                return build_webp(encode_vp8l((g % 16).astype(np.uint8),
                                              palette=pal))
            dbl = np.repeat(g, 2, axis=0)
            px = np.stack([dbl, dbl, dbl, np.full_like(dbl, 255)], 2)
            return build_webp(encode_vp8l(px, lz77_rows=True))

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [wp(t, i) for t, i in
                        zip(pdf[text_col].fillna(""), ids)]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image/webp"] * len(payloads),
                "payload": payloads,
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
            })

    return (_spread(df).select(F.col(id_col), F.col(text_col))
              .mapInPandas(_synth, schema=out_schema))


def synthesize_flac(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build REAL FLAC streams deterministically from text rows:
    16-bit samples ``(byte−128)·256`` from the cycled UTF-8 text
    bytes, through four residue classes of ``media_id % 4`` covering
    the decoder's support matrix (``operators/flac.py``):

    - 0: mono, FIXED order-2 prediction, Rice partitions order 2,
         1024 samples (one frame)
    - 1: STEREO with LEFT/SIDE decorrelation (right = phase-shifted
         bytes), FIXED order 1, 1536 samples over two frames
    - 2: mono, LPC subframes (order 2, coefficients (2,−1)) with
         ESCAPED raw partitions, 2048 samples
    - 3: mono CONSTANT subframes (every sample = the first byte's
         value), 2560 samples over three frames

    FLAC is lossless and every CRC is real, so a SQL oracle
    re-derives each clip's RMS from the text bytes exactly."""
    out_schema = MEDIA_SCHEMA

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .flac import build_flac

        def flac(text: str, media_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            c = media_id % 4
            if c == 0:
                s = (bts[np.arange(512) % len(bts)] - 128) * 256
                return build_flac(s, block_size=512, porder=2)
            if c == 1:
                left = (bts[np.arange(768) % len(bts)] - 128) * 256
                right = (bts[(1 + np.arange(768)) % len(bts)]
                         - 128) * 256
                return build_flac(np.stack([left, right], 1),
                                  block_size=512, mode="fixed1",
                                  stereo="left_side")
            if c == 2:
                s = (bts[np.arange(1024) % len(bts)] - 128) * 256
                return build_flac(s, block_size=512, mode="lpc2",
                                  porder=1)
            s = np.full(1280, (int(bts[0]) - 128) * 256, np.int64)
            return build_flac(s, block_size=512, mode="constant")

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [flac(t, i) for t, i in
                        zip(pdf[text_col].fillna(""), ids)]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["audio/flac"] * len(payloads),
                "payload": payloads,
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
            })

    return (_spread(df).select(F.col(id_col), F.col(text_col))
              .mapInPandas(_synth, schema=out_schema))


def synthesize_audio_formats(df: DataFrame, id_col: str,
                             text_col: str) -> DataFrame:
    """Build REAL audio payloads beyond plain PCM-16 WAV from text
    rows, through four residue classes of ``media_id % 4`` covering
    ``operators/audio.py``:

    - 0: μ-law WAV (G.711 format tag 7) — the code bytes ARE the
         cycled text bytes; decode applies the CCITT expansion
    - 1: A-law WAV (tag 6), same construction
    - 2: AIFF PCM-16 (big-endian FORM/COMM/SSND, real 80-bit
         extended sample-rate field), samples ``(byte−128)·256``
    - 3: 24-bit PCM WAV, samples ``(byte−128)·256 + byte`` so all
         three byte lanes carry signal

    Each decode is integer-exact, so a SQL oracle re-derives every
    clip's RMS from the text bytes through the same G.711 formulas."""
    out_schema = MEDIA_SCHEMA

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .audio import build_aiff, build_wav

        def clip(text: str, media_id: int) -> tuple[bytes, str]:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            c = media_id % 4
            if c == 0:
                codes = bts[np.arange(600) % len(bts)]
                return build_wav(codes.astype(np.uint8).tobytes(),
                                 tag=7, nch=1, rate=8000,
                                 bits=8), "audio/wav;codec=ulaw"
            if c == 1:
                codes = bts[np.arange(600) % len(bts)]
                return build_wav(codes.astype(np.uint8).tobytes(),
                                 tag=6, nch=1, rate=8000,
                                 bits=8), "audio/wav;codec=alaw"
            if c == 2:
                s = (bts[np.arange(400) % len(bts)] - 128) * 256
                return build_aiff(s, rate=22050), "audio/aiff"
            b = bts[np.arange(400) % len(bts)]
            v = (b - 128) * 256 + b
            raw24 = b"".join(int(x & 0xFFFFFF).to_bytes(3, "little")
                             for x in v)
            return build_wav(raw24, tag=1, nch=1, rate=44100,
                             bits=24), "audio/wav;bits=24"

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            built = [clip(t, i) for t, i in
                     zip(pdf[text_col].fillna(""), ids)]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": [t for _, t in built],
                "payload": [p for p, _ in built],
                "n_bytes": pd.Series([len(p) for p, _ in built],
                                     dtype="int64"),
            })

    return (_spread(df).select(F.col(id_col), F.col(text_col))
              .mapInPandas(_synth, schema=out_schema))


def synthesize_ico(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build REAL ICO favicons deterministically from text rows,
    through three residue classes of ``media_id % 3``:

    - 0: one 16×16 8-bit DIB entry (gray palette, pixels = cycled
         text bytes, doubled-height header + AND mask rows)
    - 1: a 32×32 PNG entry (the modern large-size convention) PLUS a
         16×16 DIB — the decoder must pick the LARGEST entry
    - 2: one DIB whose AND mask marks every cell with byte % 5 == 0
         transparent — alpha changes, the RGB mean must not

    Every class is lossless, so a SQL oracle re-derives the largest
    entry's mean from the text bytes."""
    out_schema = MEDIA_SCHEMA

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .ico import build_ico

        pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, 1)

        def ico(text: str, media_id: int) -> bytes:
            raw = (text.encode("utf-8") or b"\x00")
            bts = np.frombuffer(raw, dtype=np.uint8)
            g16 = bts[np.arange(256) % len(bts)].reshape(16, 16)
            c = media_id % 3
            if c == 0:
                return build_ico([{"kind": "dib", "idx": g16,
                                   "palette": pal}])
            if c == 1:
                g32 = bts[np.arange(1024) % len(bts)].reshape(32, 32)
                return build_ico([{"kind": "png", "px": g32},
                                  {"kind": "dib", "idx": g16,
                                   "palette": pal}])
            return build_ico([{"kind": "dib", "idx": g16,
                               "palette": pal,
                               "mask": (g16 % 5 == 0)}])

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [ico(t, i) for t, i in
                        zip(pdf[text_col].fillna(""), ids)]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image/x-icon"] * len(payloads),
                "payload": payloads,
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
            })

    return (_spread(df).select(F.col(id_col), F.col(text_col))
              .mapInPandas(_synth, schema=out_schema))


def decode_media_real(df: DataFrame) -> DataFrame:
    """REAL codec path — pure-python decoders for every container the
    suite synthesizes (binary netpbm P5/P6 images; PNG with full
    scanline unfiltering at every legal bit depth, zlib is stdlib;
    baseline AND progressive JPEG with the full Huffman/DCT path in
    ``operators/jpeg.py``; RIFF/WAVE PCM audio), dispatched on magic
    bytes inside the same Arrow ``mapInPandas`` plan as the fake
    decoder. Image rows fill (width, height, mean_value from actual
    pixels); audio rows fill (n_channels, sample_rate, n_samples,
    mean_value = RMS amplitude from actual samples). Anything else
    (arithmetic-coded JPEG, non-MJPEG video codecs, …) raises a clear
    per-payload error; swapping in PIL/ffmpeg extends the dispatch,
    not the plan."""
    out_schema = ("media_id long, media_type string, n_bytes long, "
                  "kind string, width int, height int, n_channels int, "
                  "sample_rate int, n_samples long, mean_value double")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        def decode_pgm(p: bytes) -> dict:
            # binary netpbm: P5 (gray) / P6 (rgb); whitespace-separated
            # header tokens, optional comments
            toks, i, ntok = [], 2, 0
            while ntok < 3 and i < len(p):
                while i < len(p) and p[i:i + 1].isspace():
                    i += 1
                if p[i:i + 1] == b"#":
                    while i < len(p) and p[i:i + 1] != b"\n":
                        i += 1
                    continue
                j = i
                while j < len(p) and not p[j:j + 1].isspace():
                    j += 1
                toks.append(int(p[i:j]))
                ntok += 1
                i = j
            i += 1  # single whitespace after maxval
            w, h, _maxval = toks
            ch = 3 if p[:2] == b"P6" else 1
            px = np.frombuffer(p, dtype=np.uint8,
                               count=w * h * ch, offset=i)
            return {"kind": "image", "width": w, "height": h,
                    "n_channels": ch, "sample_rate": None,
                    "n_samples": None,
                    "mean_value": float(px.mean())}

        def decode_png(p: bytes) -> dict:
            # shared spec decoder (operators/png.py): depths 8/16,
            # color types 0/2/3/4/6, non-interlaced + Adam7. Palette
            # arrives already expanded to RGB.
            px, ctype = png_pixels(p)
            h, w, ch = px.shape
            # mean_value is the mean over COLOR samples only: for
            # gray+alpha (type 4) and RGBA (6) the alpha plane is
            # coverage, not intensity — folding it in would shift the
            # mean of any real-world transparent PNG
            color = px[:, :, :ch - 1] if ctype in (4, 6) else px
            return {"kind": "image", "width": int(w), "height": int(h),
                    "n_channels": ch, "sample_rate": None,
                    "n_samples": None,
                    "mean_value": float(color.mean())}

        def decode_jpg(p: bytes) -> dict:
            # general entry: baseline AND progressive (SOF2) — web
            # corpora are majority-progressive
            px = decode_jpeg(p)
            h, w = px.shape[:2]
            ch = 1 if px.ndim == 2 else px.shape[2]
            return {"kind": "image", "width": int(w), "height": int(h),
                    "n_channels": ch, "sample_rate": None,
                    "n_samples": None,
                    "mean_value": float(px.astype(np.float64).mean())}

        def decode_video(p: bytes) -> dict:
            # AVI/RIFF or MP4/ISO-BMFF, dispatched inside parse_video
            from .video import parse_video
            meta = parse_video(p)
            means = [decode_jpeg(f).astype(np.float64).mean()
                     for f in meta["frames"]]
            return {"kind": "video", "width": meta["width"],
                    "height": meta["height"], "n_channels": None,
                    "sample_rate": meta["fps"],
                    "n_samples": len(meta["frames"]),
                    "mean_value": float(np.mean(means)) if means else 0.0}

        def decode_gif(p: bytes) -> dict:
            from .gif import parse_gif
            meta = parse_gif(p)
            frames = meta["frames"]
            if len(frames) == 1:
                px = frames[0]["px"]
                return {"kind": "image", "width": meta["width"],
                        "height": meta["height"], "n_channels": 3,
                        "sample_rate": None, "n_samples": None,
                        "mean_value": float(px.astype(np.float64)
                                            .mean())}
            # animated GIF: the video contract — per-frame means
            # averaged, frame count + rate exposed
            means = [f["px"].astype(np.float64).mean() for f in frames]
            delay = frames[0]["delay_cs"]
            return {"kind": "video", "width": meta["width"],
                    "height": meta["height"], "n_channels": None,
                    "sample_rate": round(100 / delay) if delay else 0,
                    "n_samples": len(frames),
                    "mean_value": float(np.mean(means))}

        def decode_bmp(p: bytes) -> dict:
            from .bmp import parse_bmp
            px = parse_bmp(p)
            return {"kind": "image", "width": int(px.shape[1]),
                    "height": int(px.shape[0]), "n_channels": 3,
                    "sample_rate": None, "n_samples": None,
                    "mean_value": float(px.astype(np.float64).mean())}

        def decode_tiff(p: bytes) -> dict:
            from .tiff import parse_tiff
            meta = parse_tiff(p)
            px = meta["px"]
            ch = 1 if px.ndim == 2 else px.shape[2]
            # n_samples carries the PAGE count (multi-page scans):
            # page one's stats, the chain length reported — the same
            # contract decode_ico uses for its entry count
            return {"kind": "image", "width": meta["width"],
                    "height": meta["height"], "n_channels": ch,
                    "sample_rate": None,
                    "n_samples": int(meta["n_pages"]),
                    "mean_value": float(px.astype(np.float64).mean())}

        def decode_ico(p: bytes) -> dict:
            from .ico import parse_ico
            imgs = parse_ico(p)
            big = max(imgs, key=lambda m: m["width"] * m["height"])
            return {"kind": "image", "width": big["width"],
                    "height": big["height"], "n_channels": 4,
                    "sample_rate": None, "n_samples": len(imgs),
                    "mean_value": float(big["px"][:, :, :3]
                                        .astype(np.float64).mean())}

        def decode_webp(p: bytes) -> dict:
            from .webp import parse_webp
            meta = parse_webp(p)
            px = meta["px"]
            # VP8L is inherently ARGB; alpha is coverage, not
            # intensity — the mean is over RGB only (PNG convention)
            return {"kind": "image", "width": meta["width"],
                    "height": meta["height"], "n_channels": 4,
                    "sample_rate": None, "n_samples": None,
                    "mean_value": float(px[:, :, :3]
                                        .astype(np.float64).mean())}

        def decode_aiff(p: bytes) -> dict:
            from .audio import parse_aiff
            meta = parse_aiff(p)
            s = meta["samples"].astype(np.float64)
            rms = float(np.sqrt((s * s).mean())) if s.size else 0.0
            return {"kind": "audio", "width": None, "height": None,
                    "n_channels": meta["n_channels"],
                    "sample_rate": meta["sample_rate"],
                    "n_samples": int(meta["samples"].shape[0]),
                    "mean_value": rms}

        def decode_flac(p: bytes) -> dict:
            from .flac import decode_flac as _flac
            meta = _flac(p)
            s = meta["samples"].astype(np.float64)
            rms = float(np.sqrt((s * s).mean())) if s.size else 0.0
            return {"kind": "audio", "width": None, "height": None,
                    "n_channels": meta["n_channels"],
                    "sample_rate": meta["sample_rate"],
                    "n_samples": int(meta["samples"].shape[0]),
                    "mean_value": rms}

        def decode_wav(p: bytes) -> dict:
            # operators/audio.py: PCM 8/16/24/32 AND G.711 mu-law /
            # A-law (stdlib wave refuses the companded tags). Decoded
            # samples are ints for every format, so the RMS below is
            # the same integer-exact quantity the PCM path always had
            from .audio import parse_wav
            meta = parse_wav(p)
            nch, rate = meta["n_channels"], meta["sample_rate"]
            nfr = int(meta["samples"].shape[0])
            s = meta["samples"].astype(np.float64)
            rms = float(np.sqrt((s * s).mean())) if s.size else 0.0
            return {"kind": "audio", "width": None, "height": None,
                    "n_channels": nch, "sample_rate": rate,
                    "n_samples": nfr, "mean_value": rms}

        for pdf in batches:
            metas = []
            for p in pdf["payload"]:
                b = bytes(p)
                if b[:2] in (b"P5", b"P6"):
                    metas.append(decode_pgm(b))
                elif b[:8] == b"\x89PNG\r\n\x1a\n":
                    metas.append(decode_png(b))
                elif b[:3] == b"\xFF\xD8\xFF":
                    metas.append(decode_jpg(b))
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    metas.append(decode_wav(b))
                elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    metas.append(decode_video(b))
                elif b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                    metas.append(decode_webp(b))
                elif b[:4] == b"fLaC":
                    metas.append(decode_flac(b))
                elif b[:4] == b"FORM" and b[8:12] == b"AIFF":
                    metas.append(decode_aiff(b))
                elif len(b) >= 12 and b[4:8] == b"ftyp":
                    metas.append(decode_video(b))
                elif b[:6] in (b"GIF87a", b"GIF89a"):
                    metas.append(decode_gif(b))
                elif b[:2] == b"BM":
                    metas.append(decode_bmp(b))
                elif b[:4] in (b"\x00\x00\x01\x00",
                               b"\x00\x00\x02\x00"):
                    metas.append(decode_ico(b))
                elif b[:4] in (b"II\x2a\x00", b"MM\x00\x2a",
                               b"II\x2b\x00", b"MM\x00\x2b"):
                    # classic TIFF both byte orders (BigTIFF magics
                    # dispatch too so their loud seam names the format)
                    metas.append(decode_tiff(b))
                else:
                    raise NotImplementedError(
                        f"no pure-python codec for payload magic "
                        f"{b[:4]!r}; extend decode_media_real's dispatch")
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"].astype("int64"),
                "kind": [m["kind"] for m in metas],
                "width": pd.Series([m["width"] for m in metas],
                                   dtype="Int32"),
                "height": pd.Series([m["height"] for m in metas],
                                    dtype="Int32"),
                "n_channels": pd.Series([m["n_channels"] for m in metas],
                                        dtype="Int32"),
                "sample_rate": pd.Series([m["sample_rate"] for m in metas],
                                         dtype="Int32"),
                "n_samples": pd.Series([m["n_samples"] for m in metas],
                                       dtype="Int64"),
                "mean_value": [m["mean_value"] for m in metas],
            })

    return df.mapInPandas(_decode, schema=out_schema)


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction over decoded WAV payloads — the
    per-clip screening stats an audio curation pipeline filters on:
    zero-crossing count (voiced/unvoiced + silence heuristic), peak
    amplitude (clipping detection), exact integer energy, and RMS.
    Every feature is integer-exact arithmetic on the decoded samples —
    RMS stays UNROUNDED because sqrt(int/int) is IEEE-deterministic on
    identical inputs, bit-equal across engines — so a SQL oracle
    re-derives all of them from the payload source bytes: a wrong
    sample width, byte order or off-by-one in the decode shifts the
    values. Zero-crossing uses the sign convention (s ≥ 0) applied
    frame-to-frame WITHIN each channel (interleaved stereo never
    compares L against R), 8-bit PCM is centered on its unsigned
    midpoint 128 before any stat (else silence reads as RMS 128 and
    ZCR is identically 0), and ``n_samples`` counts FRAMES, agreeing
    with ``decode_media_real``'s count for the same payload. 32-bit
    clips whose exact energy exceeds int64 raise loudly rather than
    wrap. Non-WAV payloads raise — this is an audio op."""
    out_schema = ("media_id long, n_samples long, zero_crossings long, "
                  "peak long, energy long, rms double")

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        def feats(p: bytes) -> tuple[int, int, int, int, float]:
            if not (p[:4] == b"RIFF" and p[8:12] == b"WAVE"):
                raise NotImplementedError(
                    "audio_features takes WAV payloads; magic "
                    f"{p[:4]!r} is not")
            with wave.open(io.BytesIO(p), "rb") as f:
                nch, sw, nfr = (f.getnchannels(), f.getsampwidth(),
                                f.getnframes())
                raw = f.readframes(nfr)
            dt = {1: np.uint8, 2: "<i2", 4: "<i4"}[sw]
            s = np.frombuffer(raw, dtype=dt).astype(np.int64)
            if sw == 1:
                s = s - 128   # WAV stores 8-bit PCM unsigned, midpoint 128
            if s.size == 0:
                return 0, 0, 0, 0, 0.0
            # sign flips frame-to-frame WITHIN each channel (interleaved
            # L,R,... — comparing adjacent flat samples would count the
            # L/R jump of every stereo frame), summed across channels
            fr = s.reshape(-1, nch)
            nonneg = fr >= 0
            zc = int((nonneg[1:] != nonneg[:-1]).sum())
            if sw == 4:
                # 32-bit squares overflow int64 after ~2 full-scale
                # samples — exact python-int sum, then a loud guard on
                # the int64 output column
                energy = int((s.astype(object) ** 2).sum())
                if energy > 2 ** 63 - 1:
                    raise ValueError(
                        "exact integer energy exceeds int64 for this "
                        "32-bit clip; widen the energy column before "
                        "screening such material")
            else:
                energy = int((s * s).sum())
            rms = float(np.sqrt(energy / s.size))
            return nfr, zc, int(np.abs(s).max()), energy, rms

        for pdf in batches:
            rows = [feats(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "n_samples": pd.Series([r[0] for r in rows],
                                       dtype="int64"),
                "zero_crossings": pd.Series([r[1] for r in rows],
                                            dtype="int64"),
                "peak": pd.Series([r[2] for r in rows], dtype="int64"),
                "energy": pd.Series([r[3] for r in rows], dtype="int64"),
                "rms": [r[4] for r in rows],
            })

    return df.mapInPandas(_feats, schema=out_schema)


def resize_image_area(df: DataFrame, factor: int = 2) -> DataFrame:
    """REAL image resize — ``factor×factor`` area (box) downsampling
    over decoded grayscale payloads (PGM, PNG or baseline JPEG), the
    standard
    anti-aliased thumbnail kernel — emitted in LONG form
    ``(media_id, y, x, value)`` so a value-level oracle checks every
    output pixel, not a summary. The kernel is one vectorized
    ``reshape(h/f, f, w/f, f).mean((1, 3))`` per image inside the same
    Arrow ``mapInPandas`` plan as the decoders; each mean of f²
    uint8s is an exact multiple of 1/f², so engines agree bit-for-bit.
    Color/audio payloads raise — resize is an image op."""
    out_schema = "media_id long, y int, x int, value double"

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def gray_pixels(p: bytes) -> np.ndarray:
            if p[:2] == b"P5":
                toks, i, ntok = [], 2, 0
                while ntok < 3 and i < len(p):
                    while i < len(p) and p[i:i + 1].isspace():
                        i += 1
                    if p[i:i + 1] == b"#":
                        while i < len(p) and p[i:i + 1] != b"\n":
                            i += 1
                        continue
                    j = i
                    while j < len(p) and not p[j:j + 1].isspace():
                        j += 1
                    toks.append(int(p[i:j]))
                    ntok += 1
                    i = j
                i += 1
                w, h, _ = toks
                return np.frombuffer(p, np.uint8, w * h, i).reshape(h, w)
            if p[:8] == b"\x89PNG\r\n\x1a\n":
                # shared spec decoder (operators/png.py) — the resize
                # kernel is grayscale-only, but the container support
                # (filters, 16-bit, Adam7, palette parse) rides along
                px, ctype = png_pixels(p)
                if ctype != 0:
                    raise NotImplementedError(
                        "resize_image_area takes grayscale payloads; "
                        f"PNG color type {ctype} is not")
                return px[:, :, 0]
            if p[:3] == b"\xFF\xD8\xFF":
                px = decode_jpeg(p)
                if px.ndim != 2:
                    raise NotImplementedError(
                        "resize_image_area takes grayscale payloads; "
                        f"{px.shape[2]}-channel JPEG is not")
                return px.astype(np.int32)
            raise NotImplementedError(
                f"resize_image_area: no grayscale decoder for magic "
                f"{p[:4]!r}")

        for pdf in batches:
            ids, ys, xs, vals = [], [], [], []
            for mid, p in zip(pdf["media_id"].astype("int64"),
                              pdf["payload"]):
                px = gray_pixels(bytes(p)).astype(np.float64)
                h, w = px.shape
                if h % factor or w % factor:
                    raise ValueError(
                        f"image {h}x{w} not divisible by factor {factor}")
                small = px.reshape(h // factor, factor,
                                   w // factor, factor).mean((1, 3))
                oh, ow = small.shape
                ids.extend([int(mid)] * (oh * ow))
                yy, xx = np.meshgrid(np.arange(oh), np.arange(ow),
                                     indexing="ij")
                ys.extend(yy.ravel())
                xs.extend(xx.ravel())
                vals.extend(small.ravel())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "y": pd.Series(ys, dtype="int32"),
                "x": pd.Series(xs, dtype="int32"),
                "value": pd.Series(vals, dtype="float64"),
            })

    return df.mapInPandas(_resize, schema=out_schema)


def decode_media(df: DataFrame, real: bool = False) -> DataFrame:
    """Decode payloads to typed metadata via ``mapInPandas`` (per-partition
    Arrow batches — the multimodal hot path never serializes row-at-a-time).
    ``real=True`` dispatches the pure-python codecs (netpbm/WAV —
    `decode_media_real`); formats needing PIL/ffmpeg raise per payload."""
    if real:
        return decode_media_real(df)

    out_schema = ("media_id long, media_type string, n_bytes long, "
                  "width int, height int, mean_intensity double")

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NOTE: everything this closure touches must be defined inside it
        # (or be an installed module) — cloudpickle ships it by value to
        # Python workers that cannot import this package.
        def fake_decode(payload: bytes) -> dict:
            n = len(payload)
            mean = float(sum(payload)) / n if n else 0.0
            return {"width": 16 + n % 64, "height": 16 + (n // 64) % 64,
                    "mean_intensity": mean}

        for pdf in batches:
            meta = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"].astype("int64"),
                "width": pd.Series([m["width"] for m in meta], dtype="int32"),
                "height": pd.Series([m["height"] for m in meta], dtype="int32"),
                "mean_intensity": [m["mean_intensity"] for m in meta],
            })

    return df.mapInPandas(_decode_batch, schema=out_schema)


def byte_histogram_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction: normalized byte histogram as a fixed-size
    ``array<double>`` embedding — the deterministic fake for an encoder
    model; the plumbing (binary → vector column) is the real pattern.
    ``n_bins`` must divide 256: a non-divisor would spill byte 255
    into a phantom extra bin (variable-length vectors break every
    downstream cosine/kNN consumer), so it is rejected loudly."""
    if not 1 <= n_bins <= 256 or 256 % n_bins:
        raise ValueError(f"n_bins must be a divisor of 256, got {n_bins}")
    out_schema = "media_id long, features array<double>"

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(arr // (256 // n_bins), minlength=n_bins)
                total = hist.sum() or 1
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"].astype("int64"),
                                "features": feats})

    return df.mapInPandas(_featurize, schema=out_schema)


def frame_sample(df: DataFrame, every_n: int = 64) -> DataFrame:
    """Frame sampling for 'video' payloads: emit one row per sampled frame
    (row-multiplying map — the UDTF shape). Fake frames are byte windows;
    a real implementation would emit decoded keyframes."""
    out_schema = "media_id long, frame_idx int, frame_offset long, frame_checksum long"

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_offset": [],
                    "frame_checksum": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for idx, off in enumerate(range(0, len(p), every_n)):
                    window = p[off:off + every_n]
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(idx)
                    rows["frame_offset"].append(off)
                    rows["frame_checksum"].append(int(sum(window)))
            yield pd.DataFrame({
                "media_id": pd.Series(rows["media_id"], dtype="int64"),
                "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                "frame_offset": pd.Series(rows["frame_offset"], dtype="int64"),
                "frame_checksum": pd.Series(rows["frame_checksum"], dtype="int64"),
            })

    return df.mapInPandas(_sample, schema=out_schema)
