"""Zarr v2 / ARCO store support: Blosc frame codec, store round trip,
ingest to the long model (driver-side and chunk-per-task distributed)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from climate_data_pipeline_spark.sources import zarr2


@pytest.mark.parametrize("cname", ["zstd", "zlib"])
@pytest.mark.parametrize("shuffle", [True, False])
@pytest.mark.parametrize("blocksize", [None, 64, 100])
def test_blosc_frame_roundtrip(cname, shuffle, blocksize):
    data = np.arange(123, dtype=np.float64).tobytes()  # 984 bytes
    frame = zarr2.blosc_compress(data, typesize=8, cname=cname,
                                 shuffle=shuffle, blocksize=blocksize)
    assert zarr2.blosc_decompress(frame) == data


def test_blosc_rejects_split_codecs_and_bitshuffle():
    with pytest.raises(NotImplementedError, match="cname"):
        zarr2.blosc_compress(b"x" * 32, 4, cname="lz4")
    # hand-build a frame claiming blosclz (split layout) and one with
    # the bit-shuffle flag
    import struct
    hdr = bytes([2, 2, 0 << 5, 4]) + struct.pack("<III", 32, 32, 52)
    with pytest.raises(NotImplementedError, match="split"):
        zarr2.blosc_decompress(hdr + b"\x00" * 36)
    hdr = bytes([2, 2, (5 << 5) | 0x4, 4]) + struct.pack("<III", 32, 32, 52)
    with pytest.raises(NotImplementedError, match="bit-shuffle"):
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
    """Blosc writes incompressible blocks as verbatim memcpy frames
    (flags bit 1); the decoder must handle them, shuffled or not."""
    import struct

    payload = bytes(range(64))
    hdr = bytes([2, 2, 0x2 | (5 << 5), 1]) + struct.pack(
        "<III", len(payload), len(payload), 16 + len(payload))
    assert zarr2.blosc_decompress(hdr + payload) == payload
    # shuffled memcpy: shuffle(typesize=4) then expect the inverse
    shuffled = zarr2._shuffle(payload, 4)
    hdr = bytes([2, 2, 0x3 | (5 << 5), 4]) + struct.pack(
        "<III", len(payload), len(payload), 16 + len(payload))
    assert zarr2.blosc_decompress(hdr + shuffled) == payload


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
