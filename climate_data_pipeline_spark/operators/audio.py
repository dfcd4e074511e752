"""Audio container breadth beyond stdlib ``wave`` — pure struct +
numpy: RIFF/WAVE with PCM 8/16/24/32-bit AND the ITU-T G.711 μ-law /
A-law companded formats real telephony/speech corpora ship in
(format tags 7 and 6 — stdlib ``wave`` refuses anything non-PCM),
and AIFF (the big-endian Apple interchange format: FORM/COMM/SSND
chunks, 80-bit extended-precision sample rate).

The G.711 expanders are the CCITT reference formulas, not baked
tables, so a SQL oracle can re-derive decoded sample statistics from
the code bytes arithmetically — a wrong bias, segment shift or sign
convention shifts every decoded value.

Writers exist for synthesis: raw companded code bytes go straight
into the WAV data chunk (the decode IS the work under test), AIFF
gets a real 80-bit rate field.
"""

from __future__ import annotations

import struct

import numpy as np


def ulaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 μ-law expansion (CCITT reference formula)."""
    u = (~np.asarray(codes, np.int64)) & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t = t << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84)


def alaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law expansion (CCITT reference formula)."""
    a = np.asarray(codes, np.int64) ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108,
                          (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t)


def parse_wav(data: bytes) -> dict:
    """RIFF/WAVE → {sample_rate, n_channels, format, bits, samples}
    with ``samples`` an (n_frames, channels) int32 grid (float32 for
    the IEEE-float format). Formats: 1 (PCM, 8-bit unsigned centred /
    16/24/32-bit signed LE), 3 (IEEE float32), 6 (A-law), 7 (μ-law),
    and 0xFFFE WAVE_FORMAT_EXTENSIBLE (the modern multichannel /
    >16-bit container — the real format tag comes from the first two
    bytes of the SubFormat GUID); anything else raises by tag."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("WAV chunk truncated")
        if cid == b"fmt ":
            tag, nch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if tag == 0xFFFE:
                # WAVE_FORMAT_EXTENSIBLE: cbSize(2) validbits(2)
                # channelmask(4) SubFormat GUID — whose first two
                # bytes are the actual format tag
                if len(body) < 26:
                    raise ValueError("extensible fmt chunk truncated")
                (tag,) = struct.unpack_from("<H", body, 24)
            fmt = (tag, nch, rate, bits)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError("WAV without fmt/data chunks")
    tag, nch, rate, bits = fmt
    if tag == 3:
        if bits != 32:
            raise NotImplementedError(f"{bits}-bit IEEE-float WAV "
                                      "(32-bit only)")
        s = np.frombuffer(raw, "<f4").astype(np.float32)
        n = len(s) - len(s) % nch
        return {"sample_rate": rate, "n_channels": nch,
                "format": "float32", "bits": bits,
                "samples": s[:n].reshape(-1, nch)}
    if tag == 1:
        if bits == 8:
            s = np.frombuffer(raw, np.uint8).astype(np.int32) - 128
        elif bits == 16:
            s = np.frombuffer(raw, "<i2").astype(np.int32)
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3) \
                .astype(np.int32)
            s = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            s = np.where(s & 0x800000, s - 0x1000000, s)
        elif bits == 32:
            s = np.frombuffer(raw, "<i4").astype(np.int32)
        else:
            raise NotImplementedError(f"{bits}-bit PCM WAV")
    elif tag == 7:
        if bits != 8:
            raise ValueError("mu-law WAV with non-8-bit samples")
        s = ulaw_to_linear(np.frombuffer(raw, np.uint8)) \
            .astype(np.int32)
    elif tag == 6:
        if bits != 8:
            raise ValueError("A-law WAV with non-8-bit samples")
        s = alaw_to_linear(np.frombuffer(raw, np.uint8)) \
            .astype(np.int32)
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} not supported "
            "(PCM / A-law / mu-law only)")
    n = len(s) - len(s) % nch
    return {"sample_rate": rate, "n_channels": nch,
            "format": {1: "pcm", 6: "alaw", 7: "ulaw"}[tag],
            "bits": bits, "samples": s[:n].reshape(-1, nch)}


_KSDATAFORMAT_SUFFIX = bytes((0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
                              0x80, 0x00, 0x00, 0xAA, 0x00, 0x38,
                              0x9B, 0x71))


def build_wav(raw: bytes, tag: int, nch: int, rate: int,
              bits: int, extensible: bool = False) -> bytes:
    """RIFF/WAVE container around pre-encoded sample bytes;
    ``extensible`` wraps the tag in a WAVE_FORMAT_EXTENSIBLE header
    (the real tag moves into the SubFormat GUID's first two bytes)."""
    block = nch * (bits // 8)
    fmt = struct.pack("<HHIIHH", 0xFFFE if extensible else tag,
                      nch, rate, rate * block, block, bits)
    if extensible:
        fmt += struct.pack("<HHI", 22, bits, 0) \
            + struct.pack("<H", tag) + _KSDATAFORMAT_SUFFIX
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
            + (b"\x00" if len(raw) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _f80_encode(rate: int) -> bytes:
    """80-bit extended-precision float (AIFF sample-rate field)."""
    if rate <= 0:
        raise ValueError("sample rate must be positive")
    exp = rate.bit_length() - 1
    mant = rate << (63 - exp)
    return struct.pack(">HQ", 16383 + exp, mant)


def _f80_decode(raw: bytes) -> int:
    se, mant = struct.unpack(">HQ", raw)
    exp = (se & 0x7FFF) - 16383
    val = mant / (1 << 63) * (2 ** exp)
    return int(round(-val if se & 0x8000 else val))


def parse_aiff(data: bytes) -> dict:
    """AIFF (FORM/AIFF) → the parse_wav contract: big-endian PCM at
    8/16/24/32 bits, the 80-bit extended sample rate decoded."""
    if data[:4] != b"FORM" or data[8:12] != b"AIFF":
        raise ValueError("not an AIFF payload (missing FORM/AIFF)")
    pos = 12
    comm = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from(">I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("AIFF chunk truncated")
        if cid == b"COMM":
            nch, nframes = struct.unpack_from(">HI", body, 0)
            bits = struct.unpack_from(">H", body, 6)[0]
            rate = _f80_decode(body[8:18])
            comm = (nch, nframes, bits, rate)
        elif cid == b"SSND":
            (offset, _blocksize) = struct.unpack_from(">II", body, 0)
            raw = body[8 + offset:]
        pos += 8 + size + (size & 1)
    if comm is None or raw is None:
        raise ValueError("AIFF without COMM/SSND chunks")
    nch, nframes, bits, rate = comm
    if bits == 8:
        s = np.frombuffer(raw, np.int8).astype(np.int32)
    elif bits == 16:
        s = np.frombuffer(raw, ">i2").astype(np.int32)
    elif bits == 24:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int32)
        s = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        s = np.where(s & 0x800000, s - 0x1000000, s)
    elif bits == 32:
        s = np.frombuffer(raw, ">i4").astype(np.int32)
    else:
        raise NotImplementedError(f"{bits}-bit AIFF")
    s = s[:nframes * nch]
    return {"sample_rate": rate, "n_channels": nch, "format": "pcm",
            "bits": bits, "samples": s.reshape(-1, nch)}


def build_aiff(samples: np.ndarray, rate: int = 8000,
               bits: int = 16) -> bytes:
    """AIFF container from (n,) or (n, ch) int samples (big-endian)."""
    samples = np.asarray(samples, np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    if bits == 16:
        raw = samples.reshape(-1).astype(">i2").tobytes()
    elif bits == 8:
        raw = samples.reshape(-1).astype(np.int8).tobytes()
    else:
        raise ValueError("build_aiff writes 8/16-bit only")
    comm = (struct.pack(">HIH", nch, n, bits) + _f80_encode(rate))
    ssnd = struct.pack(">II", 0, 0) + raw
    body = (b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
            + (b"\x00" if len(ssnd) & 1 else b""))
    return b"FORM" + struct.pack(">I", len(body)) + body
