"""Szip (CCSDS 121.0 extended-Rice) codec: hand-assembled bit streams
for every block option (independent of the encoder), encoder/decoder
round trips across widths and data shapes, the HDF5 filter framing,
and the end-to-end szip-compressed NetCDF4 ingest."""

from __future__ import annotations

import numpy as np
import pytest

from climate_data_pipeline_spark.sources.szip import (
    EC_OPTION_MASK,
    LSB_OPTION_MASK,
    MSB_OPTION_MASK,
    NN_OPTION_MASK,
    h5_szip_decode,
    h5_szip_encode,
    szip_decode,
    szip_encode,
)


class _Bits:
    """Minimal MSB-first bit assembler for hand-built fixtures."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, val: int, n: int) -> "_Bits":
        self.bits += [(val >> (n - 1 - i)) & 1 for i in range(n)]
        return self

    def fs(self, val: int) -> "_Bits":
        self.bits += [0] * val + [1]
        return self

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << (7 - j)
            out.append(b)
        return bytes(out)


def test_hand_assembled_second_extension():
    """γ = (d0+d1)(d0+d1+1)/2 + d1 pairs, FS-coded: id=0 + selector=1,
    then γ ∈ {1, 7, 0, 17} → samples [1,0,2,1,0,0,3,2]."""
    b = _Bits().put(0, 3).put(1, 1).fs(1).fs(7).fs(0).fs(17)
    got = szip_decode(b.bytes(), EC_OPTION_MASK, 8, 8, 64, 8)
    np.testing.assert_array_equal(got, [1, 0, 2, 1, 0, 0, 3, 2])


def test_hand_assembled_zero_block_ros():
    """Remainder-of-segment escape: FS(4) zeroes the rest of the
    64-block segment — 512 samples from a 2-byte stream."""
    b = _Bits().put(0, 3).put(0, 1).fs(4)
    payload = b.bytes()
    assert len(payload) == 2
    got = szip_decode(payload, EC_OPTION_MASK, 8, 8, 512, 512)
    np.testing.assert_array_equal(got, np.zeros(512))
    # exact-count runs: fs<4 → z=fs+1, fs≥5 → z=fs
    b2 = (_Bits().put(0, 3).put(0, 1).fs(2)          # 3 zero blocks
          .put(0, 3).put(0, 1).fs(5))                # then 5 more
    got = szip_decode(b2.bytes(), EC_OPTION_MASK, 8, 8, 512, 64)
    np.testing.assert_array_equal(got, np.zeros(64))


def test_hand_assembled_split_with_reference():
    """NN preprocessing: raw 8-bit reference after the ID, then the
    block's FS(high) parts, THEN its k-bit low parts — the defining
    'split'. k=1 stream decodes to the original walk."""
    x = [100, 101, 99, 102, 102, 98, 100, 103]
    # mapped deltas vs prev: [_, 2, 3, 6, 0, 7, 4, 6]
    d = [2, 3, 6, 0, 7, 4, 6]
    b = _Bits().put(2, 3).put(100, 8)                # id=k+1=2, ref
    for v in d:
        b.fs(v >> 1)
    for v in d:
        b.put(v & 1, 1)
    got = szip_decode(b.bytes(), EC_OPTION_MASK | NN_OPTION_MASK,
                      8, 8, 64, 8)
    np.testing.assert_array_equal(got, x)


def test_hand_assembled_uncompressed_block():
    vals = [250, 3, 77, 128, 0, 255, 42, 9]
    b = _Bits().put(7, 3)                            # id = 2^3 − 1
    for v in vals:
        b.put(v, 8)
    got = szip_decode(b.bytes(), EC_OPTION_MASK, 8, 8, 64, 8)
    np.testing.assert_array_equal(got, vals)


def test_nn_unmap_saturation_bounds():
    """Deltas beyond θ = min(prev, max−prev) use the one-sided escape
    d = θ + |Δ|; both directions must reconstruct."""
    for x in ([5, 200, 3, 250, 0],                   # big jumps up/down
              [250, 10, 255, 0, 128],
              [0, 255, 0, 255, 0]):
        x = np.asarray(x, np.int64)
        enc = szip_encode(x, EC_OPTION_MASK | NN_OPTION_MASK, 8, 8, 64)
        got = szip_decode(enc, EC_OPTION_MASK | NN_OPTION_MASK,
                          8, 8, 64, x.size)
        np.testing.assert_array_equal(got, x)


def test_roundtrip_widths_shapes_scanlines():
    rng = np.random.default_rng(11)
    for bpp, ppb, pps in ((8, 8, 64), (16, 16, 128), (32, 32, 256),
                          (8, 16, 80), (16, 8, 56)):
        hi = min(1 << bpp, 1 << 16)
        for n in (1, 7, ppb, pps, pps + 3, 3 * pps + ppb // 2):
            walk = np.clip(np.cumsum(rng.integers(-5, 6, n)) + hi // 2,
                           0, (1 << bpp) - 1)
            noise = rng.integers(0, hi, n).astype(np.int64)
            zero = np.zeros(n, np.int64)
            for x in (walk, noise, zero):
                for mask in (EC_OPTION_MASK | NN_OPTION_MASK,
                             EC_OPTION_MASK):
                    enc = szip_encode(x, mask, bpp, ppb, pps)
                    got = szip_decode(enc, mask, bpp, ppb, pps, n)
                    np.testing.assert_array_equal(got, x), (bpp, ppb,
                                                            pps, n)


def test_smooth_data_actually_compresses():
    rng = np.random.default_rng(12)
    x = np.clip(1000 + np.cumsum(rng.integers(-2, 3, 4096)), 0, 65535)
    enc = szip_encode(x, EC_OPTION_MASK | NN_OPTION_MASK, 16, 16, 128)
    assert len(enc) < x.size * 2 * 0.35     # ≥ ~3× on a gentle walk


def test_h5_framing_and_byte_orders():
    rng = np.random.default_rng(13)
    for mask, dt in (
            (EC_OPTION_MASK | NN_OPTION_MASK | LSB_OPTION_MASK, "<u2"),
            (EC_OPTION_MASK | NN_OPTION_MASK | MSB_OPTION_MASK, ">u2"),
            (EC_OPTION_MASK | NN_OPTION_MASK | LSB_OPTION_MASK, "<u4"),
            (EC_OPTION_MASK | LSB_OPTION_MASK, "u1")):
        bpp = np.dtype(dt).itemsize * 8
        client = (mask, bpp, 16, 128)
        raw = rng.integers(0, 2000, 333).astype(dt).tobytes()
        assert h5_szip_decode(h5_szip_encode(raw, client), client) == raw


def test_loud_seams():
    with pytest.raises(NotImplementedError, match="bits-per-pixel"):
        szip_decode(b"\x00", EC_OPTION_MASK, 64, 8, 64, 4)
    with pytest.raises(ValueError, match="pixels-per-block"):
        szip_decode(b"\x00", EC_OPTION_MASK, 8, 3, 64, 4)
    with pytest.raises(ValueError, match="exhausted"):
        szip_decode(b"\xff", EC_OPTION_MASK, 8, 8, 64, 8)
    # zero-run overrunning the scanline is corrupt, not silent
    b = _Bits().put(0, 3).put(0, 1).fs(7)
    with pytest.raises(ValueError, match="zero-block run"):
        szip_decode(b.bytes(), EC_OPTION_MASK, 8, 8, 16, 16)
    with pytest.raises(ValueError, match="outside"):
        szip_encode(np.array([300]), EC_OPTION_MASK, 8, 8, 64)


def test_hdf5_szip_file_roundtrip_and_distributed(spark, tmp_path):
    """write_hdf5(compress='szip') → H5File bit-exact; the distributed
    reader defilters szip chunks executor-side; filter 5 still loud."""
    from climate_data_pipeline_spark.sources.hdf5 import (H5File,
                                                          write_hdf5)
    from climate_data_pipeline_spark.sources.netcdf import \
        read_netcdf_long

    rng = np.random.default_rng(14)
    t = np.arange(24, dtype=np.int32)
    lat = np.arange(5, dtype=np.int32)
    temp = (2800 + np.cumsum(rng.integers(-4, 5, (24, 5)),
                             axis=0)).astype(np.int16)
    cnt = rng.integers(0, 200, (24, 5)).astype(np.uint8)
    big = rng.integers(0, 1 << 20, (24, 5)).astype(np.uint32)
    path = str(tmp_path / "szip.h5")
    write_hdf5(path, {"time": t, "lat": lat},
               {"temp": (["time", "lat"], temp,
                         {"scale_factor": 0.01}),
                "cnt": (["time", "lat"], cnt, {}),
                "big": (["time", "lat"], big, {})},
               chunks={"temp": (8, 4), "cnt": (8, 4), "big": (8, 4)},
               compress="szip")
    f = H5File(open(path, "rb").read())
    assert any(fid == 4 for fid, _ in f.datasets["temp"].filters)
    np.testing.assert_array_equal(f.read("temp"), temp)
    np.testing.assert_array_equal(f.read("cnt"), cnt)
    np.testing.assert_array_equal(f.read("big"), big)
    # long-model ingest applies scale_factor on top of the szip decode
    long = read_netcdf_long(spark, path, variables=["temp"])
    got = {(r["time"], r["lat"]): r["temp"] for r in long.collect()}
    for i in range(24):
        for j in range(5):
            assert got[(i, j)] == pytest.approx(temp[i, j] * 0.01)
    # unsupported filters stay loud and named (nbit/scaleoffset are
    # REAL since round 9 — patch to an unregistered id instead)
    from climate_data_pipeline_spark.sources.hdf5 import H5Unsupported
    blob = bytearray(open(path, "rb").read())
    import struct
    sig = struct.pack("<HHHH", 4, 0, 1, 4)
    at, hits = blob.find(sig), 0
    while at >= 0:
        blob[at:at + 2] = struct.pack("<H", 7)      # unknown filter
        hits += 1
        at = blob.find(sig, at + 1)
    assert hits == 3                                # one per variable
    with pytest.raises(H5Unsupported, match="filter 7"):
        H5File(bytes(blob)).read("temp")


def test_hdf5_szip_synthesis_classes(spark):
    """synthesize_hdf5_szip → hdf5_szip_stats: each residue class
    decodes to the byte-derived mean (incl. the scale_factor class's
    exact halves) with the right dtype."""
    import numpy as np

    from climate_data_pipeline_spark.sources.hdf5 import (
        hdf5_szip_stats, synthesize_hdf5_szip)

    rows = [(i, f"szip payload {i} " * (i + 1)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["msg_id"]: r for r in
           hdf5_szip_stats(synthesize_hdf5_szip(
               df, "doc_id", "text")).collect()}
    for i, text in rows:
        bts = np.frombuffer(text.encode(), np.uint8).astype(np.int64)
        cells = bts[np.arange(64) % len(bts)]
        c = i % 3
        want_dtype = ("uint8", "int16", "uint32")[c]
        want_mean = (float(cells.mean()),
                     float((cells * 127).mean()),
                     float((cells * 65537).sum()) / 128)[c]
        assert got[i]["dtype"] == want_dtype
        assert got[i]["n_vals"] == 64
        assert got[i]["mean_value"] == want_mean, i
