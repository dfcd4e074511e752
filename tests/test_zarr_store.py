"""Zarr v2 / ARCO store support: Blosc frame codec, store round trip,
ingest to the long model (driver-side and chunk-per-task distributed)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from climate_data_pipeline_spark.sources import zarr2


@pytest.mark.parametrize("cname", ["zstd", "zlib", "lz4"])
@pytest.mark.parametrize("shuffle", [True, False])
@pytest.mark.parametrize("blocksize", [None, 64, 100])
def test_blosc_frame_roundtrip(cname, shuffle, blocksize):
    data = np.arange(123, dtype=np.float64).tobytes()  # 984 bytes
    frame = zarr2.blosc_compress(data, typesize=8, cname=cname,
                                 shuffle=shuffle, blocksize=blocksize)
    assert zarr2.blosc_decompress(frame) == data


def test_blosc_rejects_blosclz():
    with pytest.raises(NotImplementedError, match="cname"):
        zarr2.blosc_compress(b"x" * 32, 4, cname="blosclz")
    # hand-build a frame claiming blosclz (no pure-python decoder)
    import struct
    hdr = bytes([2, 2, 0 << 5, 4]) + struct.pack("<III", 32, 32, 52)
    with pytest.raises(NotImplementedError, match="blosclz"):
        zarr2.blosc_decompress(hdr + b"\x00" * 36)


@pytest.fixture()
def store(tmp_path):
    """Reference-shaped ARCO store: time-record grid, uneven chunking
    (edge chunks), shuffled blosc-zstd — plus one chunk deleted to
    exercise fill_value."""
    t = np.arange(10, dtype=np.int32)
    temp = np.arange(90, dtype=np.float32).reshape(10, 3, 3)
    path = str(tmp_path / "store.zarr")
    zarr2.write_zarr(
        path,
        dims={"time": t, "lat": np.array([-10., 0., 10.]),
              "lon": np.array([100., 110., 120.])},
        variables={"temperature": (["time", "lat", "lon"], temp,
                                   {"units": "K"})},
        chunks={"temperature": [4, 2, 3]},
        attrs={"title": "arco"})
    # CF-encode the time coordinate like xarray does
    zattrs = json.load(open(os.path.join(path, "time", ".zattrs")))
    zattrs["units"] = "days since 2020-01-01"
    json.dump(zattrs, open(os.path.join(path, "time", ".zattrs"), "w"))
    meta = json.load(open(os.path.join(path, ".zmetadata")))
    meta["metadata"]["time/.zattrs"]["units"] = "days since 2020-01-01"
    json.dump(meta, open(os.path.join(path, ".zmetadata"), "w"))
    return path


def test_store_roundtrip_with_edge_and_missing_chunks(store):
    meta = zarr2.open_zarr_store(store)
    assert set(meta) == {"time", "lat", "lon", "temperature"}
    got = zarr2.read_zarr_array(store, "temperature", meta["temperature"])
    want = np.arange(90, dtype=np.float32).reshape(10, 3, 3)
    np.testing.assert_array_equal(got, want)
    # drop one chunk file → those cells read as fill_value (NaN)
    os.remove(os.path.join(store, "temperature", "0.0.0"))
    got = zarr2.read_zarr_array(store, "temperature", meta["temperature"])
    assert np.isnan(got[:4, :2, :]).all()
    np.testing.assert_array_equal(got[4:], want[4:])


def test_store_roundtrip_without_consolidated_metadata(store):
    os.remove(os.path.join(store, ".zmetadata"))
    meta = zarr2.open_zarr_store(store)
    got = zarr2.read_zarr_array(store, "temperature", meta["temperature"])
    np.testing.assert_array_equal(
        got, np.arange(90, dtype=np.float32).reshape(10, 3, 3))


def test_zarr_info(store):
    info = zarr2.zarr_info(store)
    a = info["arrays"]["temperature"]
    assert a["shape"] == [10, 3, 3] and a["chunks"] == [4, 2, 3]
    assert a["compressor"] == "blosc"
    assert info["total_stored_bytes"] > 0


def test_read_zarr_long_with_predicates(spark, store):
    df = zarr2.read_zarr_long(spark, store,
                              time_range=("2020-01-03", "2020-01-06"),
                              bbox=(105.0, -5.0, 125.0, 90.0))
    rows = df.collect()
    assert len(rows) == 4 * 2 * 2     # 4 days × lats {0,10} × lons {110,120}
    assert {str(r["time"])[:10] for r in rows} == {
        "2020-01-0" + str(d) for d in (3, 4, 5, 6)}
    with pytest.raises(ValueError, match="not found"):
        zarr2.read_zarr_long(spark, store, variables=["nope"])


def test_read_zarr_distributed_equals_driver_side(spark, store):
    a = zarr2.read_zarr_long(spark, store)
    b = zarr2.read_zarr_long_distributed(spark, store)
    ka = {(str(r["time"]), r["lat"], r["lon"], r["temperature"])
          for r in a.collect()}
    kb = {(str(r["time"]), r["lat"], r["lon"], r["temperature"])
          for r in b.collect()}
    assert ka == kb and len(ka) == 90


def test_long_to_zarr_round_trip(spark, store):
    """Engine result → Zarr store → engine again: the ARCO export loop
    (read, derive, write back as a new analysis-ready store)."""
    from climate_data_pipeline_spark.sources.netcdf import long_to_zarr

    df = zarr2.read_zarr_long(spark, store)
    out = store + "_export"
    long_to_zarr(df, out, chunks={"temperature": [5, 3, 3]},
                 attrs={"product": "roundtrip"})
    back = zarr2.read_zarr_long(spark, out)
    a = {(str(r["time"]), r["lat"], r["lon"], r["temperature"])
         for r in df.collect()}
    b = {(str(r["time"]), r["lat"], r["lon"], r["temperature"])
         for r in back.collect()}
    assert a == b
    info = zarr2.zarr_info(out)
    assert info["arrays"]["temperature"]["chunks"] == [5, 3, 3]


def test_catalog_serves_netcdf_and_zarr(spark, store, tmp_path):
    """One registry, three formats: the catalog loads parquet tables,
    classic NetCDF files and Zarr stores through the same interface."""
    from climate_data_pipeline_spark.sources import netcdf3
    from climate_data_pipeline_spark.sources.catalog import Catalog

    nc = str(tmp_path / "cat.nc")
    netcdf3.write_netcdf3(
        nc, {"time": None, "x": 2},
        {"time": (["time"], np.arange(3, dtype=np.int32),
                  {"units": "days since 2020-01-01"}),
         "x": (["x"], np.array([1.0, 2.0]), {}),
         "v": (["time", "x"], np.arange(6, dtype=np.float64).reshape(3, 2),
               {})})
    cat = Catalog(spark)
    cat.register("era5_like", nc, title="NetCDF dataset")
    cat.register("arco_like", store, title="Zarr store")
    assert cat.load("era5_like").count() == 6
    assert cat.load("arco_like").count() == 90
    assert set(cat.load("arco_like").columns) == {
        "time", "lat", "lon", "temperature"}


def test_blosc_memcpy_frame_decode():
    """Blosc's whole-frame memcpy fallback stores the ORIGINAL buffer
    (c-blosc copies src verbatim and never unshuffles on decode, even
    when the shuffle flag bit is still set from the request)."""
    import struct

    payload = bytes(range(64))
    hdr = bytes([2, 2, 0x2 | (5 << 5), 1]) + struct.pack(
        "<III", len(payload), len(payload), 16 + len(payload))
    assert zarr2.blosc_decompress(hdr + payload) == payload
    hdr = bytes([2, 2, 0x3 | (5 << 5), 4]) + struct.pack(
        "<III", len(payload), len(payload), 16 + len(payload))
    assert zarr2.blosc_decompress(hdr + payload) == payload


def _build_real_blosc_frame(data: bytes, typesize: int, blocksize: int,
                            shuffle, force_store: set[int] = (),
                            cname: str = "zstd", split: bool = False):
    """Hand-build a c-blosc1 frame byte-for-byte per the PUBLIC spec
    (header, block-offset table, per-stream int32 csize prefix, inner
    codec streams, stored streams when csize == stream size) —
    independently of zarr2.blosc_compress, so the decoder is checked
    against the wire format real numcodecs/c-blosc emits. ``split``
    models the lz4/blosclz layout (DONT_SPLIT clear, one stream per
    byte lane on FULL blocks — blosc_c never splits the final partial
    block and ignores the shuffle filter in the decision); otherwise
    the 0x10 DONT_SPLIT bit is set as real c-blosc ≥ 1.14 does for
    zstd/zlib. ``shuffle`` is False/True/"bit"."""
    import struct

    from pyarrow import Codec

    codec_ids = {"zstd": 5, "lz4": 1}
    arrow = {"zstd": "zstd", "lz4": "lz4_raw"}
    codec = Codec(arrow[cname])
    nbytes = len(data)
    nblocks = max(1, -(-nbytes // blocksize))
    flags = (codec_ids[cname] << 5) \
        | ({False: 0, True: 0x1, "bit": 0x4}[shuffle]) \
        | (0 if split else 0x10)
    blocks = []
    for b in range(nblocks):
        chunk = data[b * blocksize:(b + 1) * blocksize]
        if shuffle == "bit":
            chunk = zarr2._bit_shuffle(chunk, typesize)
        elif shuffle:
            chunk = zarr2._shuffle(chunk, typesize)
        leftover = b == nblocks - 1 and len(chunk) != blocksize
        nsplits = typesize if (split and not leftover) else 1
        neblock = len(chunk) // nsplits
        streams = b""
        for s in range(nsplits):
            lane = chunk[s * neblock:(s + 1) * neblock]
            comp = bytes(codec.compress(lane))
            if b in force_store or len(comp) >= len(lane):
                comp = lane
            streams += struct.pack("<i", len(comp)) + comp
        blocks.append(streams)
    starts, off = [], 16 + 4 * nblocks
    for blk in blocks:
        starts.append(off)
        off += len(blk)
    return (bytes([2, 1, flags, typesize])
            + struct.pack("<III", nbytes, blocksize, off)
            + struct.pack(f"<{nblocks}i", *starts)
            + b"".join(blocks))


@pytest.mark.parametrize("shuffle", [False, True])
def test_blosc_decodes_real_cblosc_framing(shuffle):
    """Frames with the real per-block int32 csize prefix decode; a
    deliberately STORED block (csize == dsize, how c-blosc marks an
    incompressible block) is memcpy'd, not fed to zstd."""
    rng = np.random.default_rng(7)
    data = np.arange(400, dtype="<f8").tobytes()
    frame = _build_real_blosc_frame(data, 8, 800, shuffle)
    assert zarr2.blosc_decompress(frame) == data
    # random bytes don't compress: every block stored
    noisy = rng.integers(0, 256, 3200, dtype=np.uint8).tobytes()
    frame = _build_real_blosc_frame(noisy, 8, 800, shuffle)
    assert zarr2.blosc_decompress(frame) == noisy
    # mixed: force-store a compressible middle block
    frame = _build_real_blosc_frame(data, 8, 800, shuffle, force_store={1})
    assert zarr2.blosc_decompress(frame) == data


@pytest.mark.parametrize("typesize,dtype", [(4, "<f4"), (8, "<f8"),
                                            (2, "<i2")])
def test_blosc_decodes_split_lz4_frames(typesize, dtype):
    """The split block layout c-blosc writes for its lz4/blosclz
    defaults (``blosc.c:split_block``): DONT_SPLIT header bit clear,
    each block holding ``typesize`` independently-compressed streams —
    one per shuffled byte lane — each with its own int32 csize prefix.
    This is the exact layout the reference's documented
    ``Blosc(cname="lz4")`` option emits (arco_converter.py:172-174)."""
    data = np.arange(1600 // typesize, dtype=dtype).tobytes()
    frame = _build_real_blosc_frame(data, typesize, 800, shuffle=True,
                                    cname="lz4", split=True)
    assert zarr2.blosc_decompress(frame) == data
    # stored (incompressible) lanes inside a split block
    rng = np.random.default_rng(11)
    noisy = rng.integers(0, 256, 1600, dtype=np.uint8).tobytes()
    frame = _build_real_blosc_frame(noisy, typesize, 800, shuffle=True,
                                    cname="lz4", split=True)
    assert zarr2.blosc_decompress(frame) == noisy
    # force-store an entire middle block's lanes
    frame = _build_real_blosc_frame(data, typesize, 800, shuffle=True,
                                    cname="lz4", split=True,
                                    force_store={1})
    assert zarr2.blosc_decompress(frame) == data


def test_blosc_decodes_pre114_zstd_split_frames():
    """Pre-1.14 c-blosc has no DONT_SPLIT bit and split on
    shuffle+typesize alone for EVERY codec — a legacy shuffled zstd
    frame therefore carries split streams and must decode that way."""
    data = np.arange(400, dtype="<f8").tobytes()
    frame = _build_real_blosc_frame(data, 8, 800, shuffle=True,
                                    cname="zstd", split=True)
    assert zarr2.blosc_decompress(frame) == data


def test_blosc_lz4_unshuffled_split_streams():
    """lz4 with shuffle off: c-blosc still clears DONT_SPLIT and its
    blosc_c/blosc_d nsplits condition does NOT consult the shuffle
    filter, so full blocks hold typesize streams of UNSHUFFLED lanes."""
    data = np.arange(400, dtype="<f8").tobytes()
    frame = _build_real_blosc_frame(data, 8, 800, shuffle=False,
                                    cname="lz4", split=True)
    assert not (frame[2] & 0x10) and zarr2.blosc_decompress(frame) == data


@pytest.mark.parametrize("shuffle", [False, True])
@pytest.mark.parametrize("nbytes", [1032, 2056, 296])
def test_blosc_leftover_block_never_split(shuffle, nbytes):
    """A frame whose nbytes is not a multiple of blocksize stores its
    final (leftover) block as ONE stream even when DONT_SPLIT is clear
    — the ``!leftoverblock`` term in blosc_c/blosc_d. Both the decoder
    (real-frame builder) and the writer round-trip must honor it.
    blocksize 1024 / typesize 8 = 128 lanes, exactly c-blosc's
    MIN_BUFFERSIZE split bound, so real c-blosc would split too."""
    data = np.arange(nbytes // 8, dtype="<f8").tobytes()
    frame = _build_real_blosc_frame(data, 8, 1024, shuffle=shuffle,
                                    cname="lz4", split=True)
    assert zarr2.blosc_decompress(frame) == data
    # writer side: zarr2.blosc_compress must emit the same layout
    ours = zarr2.blosc_compress(data, typesize=8, cname="lz4",
                                shuffle=shuffle, blocksize=1024)
    assert zarr2.blosc_decompress(ours) == data
    if nbytes > 1024:
        assert not (ours[2] & 0x10)       # split frame
        # cross-check: the independent builder produces byte-identical
        # framing for the same inputs (stored-stream decisions match
        # because both store only when compression does not shrink)
        assert ours == frame


@pytest.mark.parametrize("cname", ["zstd", "lz4"])
@pytest.mark.parametrize("typesize,dtype", [(4, "<f4"), (8, "<f8"),
                                            (1, "|u1")])
def test_blosc_bitshuffle_roundtrip(cname, typesize, dtype):
    """BITSHUFFLE frames (flag 0x4) decode: bit-plane transpose per
    block, leftover elements beyond a multiple of 8 memcpy'd — the
    bitshuffle-library layout c-blosc vendors."""
    data = np.arange(1600 // typesize, dtype=dtype).tobytes()
    frame = _build_real_blosc_frame(data, typesize, 800, shuffle="bit",
                                    cname=cname, split=cname == "lz4")
    assert zarr2.blosc_decompress(frame) == data
    # writer round-trip, including a non-multiple-of-8-elements tail
    tail = data + b"\x01\x02\x03"
    ours = zarr2.blosc_compress(tail, typesize=1, cname=cname,
                                shuffle="bit", blocksize=800)
    assert zarr2.blosc_decompress(ours) == tail


def test_bit_shuffle_inverse_property():
    rng = np.random.default_rng(3)
    for typesize in (1, 2, 4, 8):
        for n in (0, 8 * typesize, 800, 803):
            buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            sh = zarr2._bit_shuffle(buf, typesize)
            assert len(sh) == len(buf)
            assert zarr2._bit_unshuffle(sh, typesize) == buf


def test_lz4_blosc_store_roundtrip(tmp_path):
    """End-to-end: an ARCO store written with the reference's lz4
    option (split blosc frames on disk) reads back exactly."""
    t = np.arange(8, dtype=np.int32)
    lat = np.linspace(-60., 60., 16)
    lon = np.linspace(0., 150., 16)
    temp = np.arange(8 * 16 * 16, dtype=np.float32).reshape(8, 16, 16)
    path = str(tmp_path / "lz4.zarr")
    zarr2.write_zarr(
        path,
        dims={"time": t, "lat": lat, "lon": lon},
        variables={"temperature": (["time", "lat", "lon"], temp, {})},
        chunks={"temperature": [8, 16, 16]},
        attrs={}, cname="lz4")
    import struct
    meta = json.load(open(os.path.join(path, "temperature", ".zarray")))
    assert meta["compressor"]["cname"] == "lz4"
    raw = open(os.path.join(path, "temperature", "0.0.0"), "rb").read()
    flags = raw[2]
    assert flags >> 5 == 1 and not (flags & 0x10)  # lz4, split
    (nbytes_hdr,) = struct.unpack_from("<I", raw, 4)
    assert nbytes_hdr == temp.nbytes
    meta = zarr2.open_zarr_store(path)
    got = zarr2.read_zarr_array(path, "temperature", meta["temperature"])
    np.testing.assert_array_equal(got, temp)


def test_blosc_compress_emits_real_framing():
    """Our writer's frames parse under the independent spec model:
    offsets point at int32 csize prefixes whose streams zstd-decode."""
    import struct

    from pyarrow import Codec

    data = np.arange(500, dtype="<i4").tobytes()
    frame = zarr2.blosc_compress(data, typesize=4, cname="zstd",
                                 shuffle=True, blocksize=800)
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    nblocks = -(-nbytes // blocksize)
    starts = struct.unpack_from(f"<{nblocks}i", frame, 16)
    out = b""
    for b, off in enumerate(starts):
        dsize = min(blocksize, nbytes - b * blocksize)
        (csize,) = struct.unpack_from("<i", frame, off)
        payload = frame[off + 4:off + 4 + csize]
        raw = payload if csize == dsize else \
            Codec("zstd").decompress(payload, dsize)
        out += zarr2._unshuffle(raw, 4)
    assert out == data and cbytes == len(frame)


def test_decode_raw_zstd_and_lz4_chunks(tmp_path):
    """Raw numcodecs Zstd (the reference's primary default compressor)
    and numcodecs LZ4 (uint32 size prefix + block stream) chunks."""
    import struct

    from pyarrow import Codec

    arr = np.arange(24, dtype="<f4").reshape(4, 6)
    z = zarr2._decode_chunk(bytes(Codec("zstd").compress(arr.tobytes())),
                            {"id": "zstd", "level": 3},
                            np.dtype("<f4"), (4, 6), "C")
    np.testing.assert_array_equal(z, arr)
    lz = struct.pack("<I", arr.nbytes) + bytes(
        Codec("lz4_raw").compress(arr.tobytes()))
    l4 = zarr2._decode_chunk(lz, {"id": "lz4", "acceleration": 1},
                             np.dtype("<f4"), (4, 6), "C")
    np.testing.assert_array_equal(l4, arr)


def test_zstd_raw_store_roundtrip(tmp_path):
    """A store written with compressor_id='zstd' (raw numcodecs-Zstd
    chunks — the reference's default) reads back identically."""
    t = np.arange("2021-01", "2021-04", dtype="datetime64[D]")[:10]
    temp = np.arange(10 * 3, dtype="<f8").reshape(10, 3)
    path = zarr2.write_zarr(
        str(tmp_path / "zs"), {"time": t, "lat": np.array([0., 1., 2.])},
        {"temperature": (["time", "lat"], temp, {})},
        chunks={"temperature": [4, 2]}, compressor_id="zstd")
    meta = zarr2.open_zarr_store(path)
    assert meta["temperature"]["zarray"]["compressor"]["id"] == "zstd"
    got = zarr2.read_zarr_array(path, "temperature", meta["temperature"])
    np.testing.assert_array_equal(got, temp)


def test_integer_null_fill_value(tmp_path):
    """Legal zarr v2: integer dtype with fill_value null — missing
    chunks fill with 0 instead of crashing on float NaN."""
    import json
    import os

    adir = tmp_path / "s" / "counts"
    os.makedirs(adir)
    with open(adir / ".zarray", "w") as fh:
        json.dump({"zarr_format": 2, "shape": [4], "chunks": [2],
                   "dtype": "<i8", "compressor": None, "fill_value": None,
                   "filters": None, "order": "C"}, fh)
    with open(adir / ".zattrs", "w") as fh:
        json.dump({"_ARRAY_DIMENSIONS": ["counts"]}, fh)
    with open(adir / "0", "wb") as fh:   # chunk 1 missing
        fh.write(np.array([7, 8], dtype="<i8").tobytes())
    meta = zarr2.open_zarr_store(str(tmp_path / "s"))
    got = zarr2.read_zarr_array(str(tmp_path / "s"), "counts",
                                meta["counts"])
    np.testing.assert_array_equal(got, np.array([7, 8, 0, 0]))


def test_distributed_read_chunk_pruning(spark, store):
    """Predicates prune at the chunk index AND filter exactly at the
    row level: results equal the driver-side filtered read."""
    want = {(str(r["time"]), r["lat"], r["lon"], r["temperature"])
            for r in zarr2.read_zarr_long(
                spark, store, time_range=("2020-01-03", "2020-01-06"),
                bbox=(105.0, -5.0, 125.0, 90.0)).collect()}
    got = {(str(r["time"]), r["lat"], r["lon"], r["temperature"])
           for r in zarr2.read_zarr_long_distributed(
               spark, store, time_range=("2020-01-03", "2020-01-06"),
               bbox=(105.0, -5.0, 125.0, 90.0)).collect()}
    assert got == want and len(got) == 16
    # out-of-range predicate selects zero chunks and zero rows
    assert zarr2.read_zarr_long_distributed(
        spark, store, time_range=("2031-01-01", "2031-12-31")).count() == 0


# ---- zarr v3 (zarr-python >= 3 default format) -------------------------------

@pytest.fixture()
def v3_store(tmp_path):
    t = (np.arange("2021-01-01", "2021-01-11", dtype="datetime64[D]")
         .astype("datetime64[ns]"))
    temp = np.arange(90, dtype=np.float32).reshape(10, 3, 3) + 250.0
    path = str(tmp_path / "store_v3.zarr")
    zarr2.write_zarr3(
        path,
        dims={"time": t, "lat": np.array([-10., 0., 10.]),
              "lon": np.array([100., 110., 120.])},
        variables={"temperature": (["time", "lat", "lon"], temp,
                                   {"units": "K"})},
        chunks={"temperature": [4, 2, 3]}, codec="zstd")
    return path, temp


@pytest.mark.parametrize("codec", ["zstd", "gzip", "blosc", "none"])
def test_v3_roundtrip_all_codecs(tmp_path, codec):
    arr = np.random.default_rng(3).normal(0, 1, (5, 4)).astype(np.float64)
    path = str(tmp_path / f"v3_{codec}")
    zarr2.write_zarr3(path, dims={"x": np.arange(5.0), "y": np.arange(4.0)},
                      variables={"v": (["x", "y"], arr, {})},
                      chunks={"v": [2, 3]}, codec=codec)
    meta = zarr2.open_zarr_store(path)
    assert meta["v"]["zarray"]["_v3"] is True
    back = zarr2.read_zarr_array(path, "v", meta["v"])
    assert np.array_equal(back, arr)


def test_v3_long_read_with_cf_time(spark, v3_store):
    path, temp = v3_store
    df = zarr2.read_zarr_long(spark, path)
    assert df.count() == 90
    row = df.orderBy("time", "lat", "lon").first()
    assert str(row["time"]).startswith("2021-01-01")
    assert abs(row["temperature"] - float(temp[0, 0, 0])) < 1e-6
    # time-range predicate prunes to 3 days
    sel = zarr2.read_zarr_long(spark, path,
                               time_range=("2021-01-02", "2021-01-04"))
    assert sel.count() == 27


def test_v3_distributed_read_matches_eager(spark, v3_store):
    path, _ = v3_store
    eager = sorted(map(tuple, zarr2.read_zarr_long(spark, path).collect()))
    dist = sorted(map(tuple, zarr2.read_zarr_long_distributed(
        spark, path).collect()))
    assert dist == eager


def test_distributed_read_missing_variable_is_loud(spark, v3_store):
    """Regression: a typo'd variable must raise like every other read
    path, not be silently dropped from the result."""
    path, _ = v3_store
    with pytest.raises(ValueError, match="not found"):
        zarr2.read_zarr_long_distributed(spark, path,
                                         variables=["temperatrue"])


def test_distributed_read_never_decodes_data_driver_side(
        spark, v3_store, monkeypatch):
    """Regression: building the task list must touch only the 1-D
    coordinate arrays — decoding a data variable on the driver defeats
    the no-central-decode contract on a multi-TB store."""
    path, _ = v3_store
    seen = []
    orig = zarr2.read_zarr_array

    def spy(p, name, m, **kw):
        seen.append(name)
        return orig(p, name, m, **kw)

    monkeypatch.setattr(zarr2, "read_zarr_array", spy)
    df = zarr2.read_zarr_long_distributed(spark, path)
    assert "temperature" not in seen          # coords only, pre-action
    assert df.count() == 90                   # the data still arrives


def test_zarr_info_counts_chunk_bytes_not_inodes(v3_store):
    """Regression: stored_bytes must sum nested chunk FILES (v3 keys
    live under c/…), not directory inodes + metadata."""
    path, _ = v3_store
    info = zarr2.zarr_info(path)
    adir = os.path.join(path, "temperature")
    want = sum(os.path.getsize(os.path.join(root, f))
               for root, _d, files in os.walk(adir)
               for f in files if f != "zarr.json")
    got = info["arrays"]["temperature"]["stored_bytes"]
    assert got == want > 0        # chunk bytes only: no metadata,
    #                               no directory inodes


def test_v3_time_encoding_microseconds_and_sub_us_raise(tmp_path):
    """Regression: µs-resolution offsets round-trip exactly; sub-µs
    offsets raise instead of silently flooring to equal timestamps."""
    base = np.datetime64("2020-01-01T00:00:00", "ns")
    us = base + np.array([0, 1_000, 2_500_000]).astype("timedelta64[us]")
    path = str(tmp_path / "us_store")
    zarr2.write_zarr3(path, dims={"time": us.astype("datetime64[ns]")},
                      variables={"v": (["time"],
                                       np.arange(3.0), {})})
    meta = zarr2.open_zarr_store(path)
    from climate_data_pipeline_spark.sources.netcdf3 import decode_cf_time
    back = decode_cf_time(zarr2.read_zarr_array(path, "time", meta["time"]),
                          meta["time"]["attrs"]["units"])
    np.testing.assert_array_equal(back, us.astype("datetime64[ns]"))
    ns = base + np.array([0, 1, 2]).astype("timedelta64[ns]")
    with pytest.raises(ValueError, match="sub-microsecond"):
        zarr2.write_zarr3(str(tmp_path / "ns_store"),
                          dims={"time": ns},
                          variables={"v": (["time"],
                                           np.arange(3.0), {})})


def test_v3_info_and_unsupported_codecs(tmp_path, v3_store):
    path, _ = v3_store
    info = zarr2.zarr_info(path)
    assert "temperature" in info["arrays"]
    # an unknown codec fails loudly, not silently wrong (transpose is
    # REAL since round 10 — see test_v3_transpose_codec_roundtrip)
    import json as _json
    bad = str(tmp_path / "vlenny")
    os.makedirs(bad + "/v")
    _json.dump({"zarr_format": 3, "node_type": "group"},
               open(bad + "/zarr.json", "w"))
    _json.dump({"zarr_format": 3, "node_type": "array", "shape": [4],
                "data_type": "float32",
                "chunk_grid": {"name": "regular",
                               "configuration": {"chunk_shape": [4]}},
                "chunk_key_encoding": {"name": "default"},
                "fill_value": 0.0,
                "codecs": [{"name": "vlen-utf8",
                            "configuration": {}}]},
               open(bad + "/v/zarr.json", "w"))
    with pytest.raises(NotImplementedError, match="vlen-utf8"):
        zarr2.open_zarr_store(bad)


# ---- zarr v3 sharding_indexed ------------------------------------------------

@pytest.mark.parametrize("codec", ["zstd", "gzip", "blosc", "none"])
def test_v3_sharded_roundtrip(tmp_path, codec):
    """sharding_indexed: outer grid addresses shard objects, each
    holding inner chunks + the (offset, nbytes) index + CRC-32C. Edge
    shards with absent inner chunks must read back as fill."""
    arr = np.random.default_rng(5).normal(0, 1, (10, 7)).astype("<f8")
    path = str(tmp_path / f"v3_sharded_{codec}")
    zarr2.write_zarr3(path, dims={"x": np.arange(10.0),
                                  "y": np.arange(7.0)},
                      variables={"v": (["x", "y"], arr, {})},
                      chunks={"v": [2, 3]}, shards={"v": [4, 6]},
                      codec=codec)
    meta = zarr2.open_zarr_store(path)
    za = meta["v"]["zarray"]
    assert za["chunks"] == [4, 6] and za["_shard"]["inner_chunks"] == [2, 3]
    # shard objects exist on the OUTER grid only (3 x 2)
    import glob
    files = glob.glob(path + "/v/c/*/*")
    assert len(files) == 6
    back = zarr2.read_zarr_array(path, "v", meta["v"])
    assert np.array_equal(back, arr)


def test_v3_sharded_index_crc_is_verified(tmp_path):
    arr = np.arange(16, dtype="<f8").reshape(4, 4)
    path = str(tmp_path / "v3_crc")
    zarr2.write_zarr3(path, dims={"x": np.arange(4.0),
                                  "y": np.arange(4.0)},
                      variables={"v": (["x", "y"], arr, {})},
                      chunks={"v": [2, 2]}, shards={"v": [4, 4]},
                      codec="none")
    shard = path + "/v/c/0/0"
    raw = bytearray(open(shard, "rb").read())
    raw[-1] ^= 0xFF                       # corrupt the stored CRC
    open(shard, "wb").write(bytes(raw))
    meta = zarr2.open_zarr_store(path)
    with pytest.raises(ValueError, match="CRC-32C"):
        zarr2.read_zarr_array(path, "v", meta["v"])


def test_v3_sharded_distributed_matches_eager(spark, tmp_path):
    """The chunk-per-task distributed read maps 1:1 onto shards (one
    shard = one task) and must equal the eager read exactly."""
    t = (np.arange("2022-01-01", "2022-01-13", dtype="datetime64[D]")
         .astype("datetime64[ns]"))
    temp = (np.arange(12 * 4, dtype=np.float32).reshape(12, 4) * 0.5
            + 260.0)
    path = str(tmp_path / "sharded_ts.zarr")
    zarr2.write_zarr3(
        path, dims={"time": t, "lat": np.array([-5., 0., 5., 10.])},
        variables={"temperature": (["time", "lat"], temp, {"units": "K"})},
        chunks={"temperature": [2, 4]}, shards={"temperature": [6, 4]},
        codec="zstd")
    eager = sorted(map(tuple, zarr2.read_zarr_long(spark, path).collect()))
    dist = sorted(map(tuple, zarr2.read_zarr_long_distributed(
        spark, path).collect()))
    assert dist == eager and len(dist) == 48
    # time-range pruning operates on the outer (shard) grid
    sel = zarr2.read_zarr_long_distributed(
        spark, path, time_range=("2022-01-01", "2022-01-06"))
    assert sel.count() == 6 * 4


def test_v3_sharded_random_geometries(tmp_path):
    """Property sweep: random (shape, chunk, shard-multiple) combos —
    including edge shards with fully-absent inner chunks and shard ==
    chunk degenerate cases — must round-trip exactly."""
    rng = np.random.default_rng(11)
    for trial in range(12):
        nd = int(rng.integers(1, 4))
        chunk = [int(rng.integers(1, 5)) for _ in range(nd)]
        shard = [c * int(rng.integers(1, 4)) for c in chunk]
        shape = [int(rng.integers(1, 3 * s + 1)) for s in shard]
        arr = rng.normal(0, 1, shape).astype("<f8")
        dims = {f"d{i}": np.arange(float(n))
                for i, n in enumerate(shape)}
        path = str(tmp_path / f"prop{trial}")
        zarr2.write_zarr3(path, dims=dims,
                          variables={"v": (list(dims), arr, {})},
                          chunks={"v": chunk}, shards={"v": shard},
                          codec="zstd")
        meta = zarr2.open_zarr_store(path)
        back = zarr2.read_zarr_array(path, "v", meta["v"])
        assert np.array_equal(back, arr), \
            (shape, chunk, shard)


def test_crc32c_known_vectors():
    """Public test vectors (RFC 3720 appendix B / Castagnoli)."""
    assert zarr2.crc32c(b"") == 0
    assert zarr2.crc32c(b"123456789") == 0xE3069283
    assert zarr2.crc32c(bytes(32)) == 0x8A9136AA


def test_v3_sharded_big_endian_inner_chain(tmp_path):
    """Regression: a sharded array's byte order comes from the INNER
    codec chain — reading it with the outer default silently
    byte-swapped every value."""
    import json as _json
    import struct as _st

    arr = np.arange(16, dtype=">f8").reshape(4, 4)
    path = str(tmp_path / "be_sharded")
    os.makedirs(path + "/v/c")
    _json.dump({"zarr_format": 3, "node_type": "group"},
               open(path + "/zarr.json", "w"))
    _json.dump({
        "zarr_format": 3, "node_type": "array", "shape": [4, 4],
        "data_type": "float64",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [4, 4]}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "fill_value": 0.0,
        "codecs": [{"name": "sharding_indexed", "configuration": {
            "chunk_shape": [2, 2],
            "codecs": [{"name": "bytes",
                        "configuration": {"endian": "big"}}],
            "index_codecs": [{"name": "bytes",
                              "configuration": {"endian": "little"}},
                             {"name": "crc32c"}],
            "index_location": "end"}}],
    }, open(path + "/v/zarr.json", "w"))
    blobs, index, off = [], [], 0
    for iy in range(2):
        for ix in range(2):
            blob = arr[iy * 2:iy * 2 + 2, ix * 2:ix * 2 + 2].tobytes()
            blobs.append(blob)
            index.append((off, len(blob)))
            off += len(blob)
    idx_raw = b"".join(_st.pack("<QQ", o, n) for o, n in index)
    os.makedirs(path + "/v/c/0", exist_ok=True)
    open(path + "/v/c/0/0", "wb").write(
        b"".join(blobs) + idx_raw + _st.pack("<I", zarr2.crc32c(idx_raw)))
    meta = zarr2.open_zarr_store(path)
    back = zarr2.read_zarr_array(path, "v", meta["v"])
    assert np.array_equal(back, arr.astype("<f8"))


def test_v3_transpose_codec_roundtrip(tmp_path):
    """The v3 ``transpose`` codec (round 10): chunks stored with axes
    permuted — plain chains, composed double-transposes, 3-D
    permutations, and inside a sharding_indexed INNER chain — all
    reconstruct bit-exactly; a non-permutation order and an OUTER
    transpose around sharding stay loud."""
    import json as _json

    rng = np.random.default_rng(12)
    arr = rng.normal(size=(10, 6))
    d = str(tmp_path / "t2d")
    zarr2.write_zarr3(d, {"t": np.arange(10.0), "x": np.arange(6.0)},
                      {"v": (["t", "x"], arr, {})},
                      chunks={"v": [4, 3]}, codec="zstd",
                      transpose={"v": [1, 0]})
    meta = zarr2.open_zarr_store(d)
    assert meta["v"]["zarray"]["_transpose"] == [1, 0]
    assert np.array_equal(zarr2.read_zarr_array(d, "v", meta["v"]), arr)

    # inner-chain transpose under sharding_indexed
    d2 = str(tmp_path / "tshard")
    zarr2.write_zarr3(d2, {"t": np.arange(10.0), "x": np.arange(6.0)},
                      {"v": (["t", "x"], arr, {})},
                      chunks={"v": [2, 3]}, shards={"v": [4, 6]},
                      codec="gzip", transpose={"v": [1, 0]})
    m2 = zarr2.open_zarr_store(d2)
    assert m2["v"]["zarray"]["_shard"]["transpose"] == [1, 0]
    assert np.array_equal(zarr2.read_zarr_array(d2, "v", m2["v"]), arr)

    # 3-D permutation, uncompressed
    a3 = rng.normal(size=(4, 6, 5))
    d3 = str(tmp_path / "t3d")
    zarr2.write_zarr3(d3, {"a": np.arange(4.0), "b": np.arange(6.0),
                           "c": np.arange(5.0)},
                      {"v": (["a", "b", "c"], a3, {})},
                      chunks={"v": [2, 3, 5]}, codec="none",
                      transpose={"v": [2, 0, 1]})
    m3 = zarr2.open_zarr_store(d3)
    assert np.array_equal(zarr2.read_zarr_array(d3, "v", m3["v"]), a3)

    # two stacked transposes compose: patch the node to [1,0] twice →
    # identity storage order, bytes already written for [1,0] would
    # mismatch, so write an identity-equivalent store instead
    d4 = str(tmp_path / "tcompose")
    zarr2.write_zarr3(d4, {"t": np.arange(10.0), "x": np.arange(6.0)},
                      {"v": (["t", "x"], arr, {})},
                      chunks={"v": [5, 6]}, codec="none")
    nj = d4 + "/v/zarr.json"
    node = _json.load(open(nj))
    node["codecs"] = ([{"name": "transpose",
                        "configuration": {"order": [1, 0]}}] * 2
                      + node["codecs"])
    _json.dump(node, open(nj, "w"))
    m4 = zarr2.open_zarr_store(d4)
    assert m4["v"]["zarray"]["_transpose"] == [0, 1]
    assert np.array_equal(zarr2.read_zarr_array(d4, "v", m4["v"]), arr)

    # loud seams
    node["codecs"] = [{"name": "transpose",
                       "configuration": {"order": [0, 0]}}] \
        + node["codecs"][2:]
    _json.dump(node, open(nj, "w"))
    with pytest.raises(ValueError, match="not a permutation"):
        zarr2.open_zarr_store(d4)
    node["codecs"] = [
        {"name": "transpose", "configuration": {"order": [1, 0]}},
        {"name": "sharding_indexed", "configuration": {
            "chunk_shape": [5, 6],
            "codecs": [{"name": "bytes",
                        "configuration": {"endian": "little"}}],
            "index_codecs": [{"name": "bytes",
                              "configuration": {"endian": "little"}}],
        }}]
    _json.dump(node, open(nj, "w"))
    with pytest.raises(NotImplementedError, match="OUTSIDE"):
        zarr2.open_zarr_store(d4)
