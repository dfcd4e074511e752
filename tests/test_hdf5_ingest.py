"""NetCDF4/HDF5 container ingest: pure-python reader/writer round trips,
a spec-golden fixture hand-assembled independently of the writer, and
the end-to-end path read_netcdf_long → long model → metrics."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.sources import hdf5
from climate_data_pipeline_spark.sources.hdf5 import (
    H5File,
    H5Unsupported,
    open_hdf5,
    write_hdf5,
)
from climate_data_pipeline_spark.sources.netcdf import (
    long_to_hdf5,
    read_netcdf3_many,
    read_netcdf_long,
)


def _golden_hdf5() -> bytes:
    """Hand-assembled per the public HDF5 File Format Specification:
    v0 superblock, one contiguous int32 dataset v = [7, 8, 9]. Built
    with raw struct calls — independent of hdf5.write_hdf5 — so the
    reader is checked against the SPEC, not just our own writer."""
    UNDEF = 0xFFFFFFFFFFFFFFFF
    heap_hdr, heap_data_addr = 96, 128
    btree_addr, snod_addr, oh_addr, data_addr = 144, 192, 240, 336
    eof = data_addr + 12

    out = bytearray(eof)
    # --- superblock v0 (spec III.A) ---
    sb = bytearray(b"\x89HDF\r\n\x1a\n")
    sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])      # versions, sizes 8/8
    sb += struct.pack("<HHI", 4, 16, 0)         # leaf k, internal k, flags
    sb += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    sb += struct.pack("<QQII", 0, 0, 1, 0)      # root entry, cache type 1
    sb += struct.pack("<QQ", btree_addr, heap_hdr)  # scratch: btree, heap
    out[0:96] = sb
    # --- local heap (spec III.D): name "v" at offset 8 ---
    hp = bytearray(b"HEAP") + bytes(4)
    hp += struct.pack("<QQQ", 16, 1, heap_data_addr)
    out[heap_hdr:heap_hdr + 32] = hp
    out[heap_data_addr:heap_data_addr + 16] = bytes(8) + b"v" + bytes(7)
    # --- group B-tree v1 (spec III.A.1), one SNOD child ---
    bt = bytearray(b"TREE") + bytes([0, 0]) + struct.pack("<H", 1)
    bt += struct.pack("<QQ", UNDEF, UNDEF)
    bt += struct.pack("<QQQ", 0, snod_addr, 8)  # key0, child, final key
    out[btree_addr:btree_addr + len(bt)] = bt
    # --- symbol table node (spec III.C) ---
    sn = bytearray(b"SNOD") + bytes([1, 0]) + struct.pack("<H", 1)
    sn += struct.pack("<QQII", 8, oh_addr, 0, 0) + bytes(16)
    out[snod_addr:snod_addr + len(sn)] = sn
    # --- v1 object header (spec IV.A.1.a): dataspace/datatype/layout ---
    ds_body = bytes([1, 1, 0, 0]) + bytes(4) + struct.pack("<Q", 3)
    dt_body = (bytes([0x10, 0x08, 0, 0]) + struct.pack("<I", 4)
               + struct.pack("<HH", 0, 32))     # v1 fixed-point i4 LE
    lay_body = bytes([3, 1]) + struct.pack("<QQ", data_addr, 12)
    block = bytearray()
    for mtype, body in ((0x0001, ds_body), (0x0003, dt_body),
                        (0x0008, lay_body)):
        padded = body + bytes(-len(body) % 8)
        block += struct.pack("<HHB3x", mtype, len(padded), 0) + padded
    oh = (bytes([1, 0]) + struct.pack("<H", 3) + struct.pack("<II", 1,
                                                             len(block))
          + bytes(4) + bytes(block))
    out[oh_addr:oh_addr + len(oh)] = oh
    out[data_addr:data_addr + 12] = struct.pack("<3i", 7, 8, 9)
    return bytes(out)


def test_reader_parses_spec_golden_bytes():
    f = H5File(_golden_hdf5())
    assert sorted(f.datasets) == ["v"]
    assert f.datasets["v"].shape == (3,)
    np.testing.assert_array_equal(f.read("v"), [7, 8, 9])


def test_bad_signature_and_unsupported_superblock():
    with pytest.raises(ValueError, match="signature"):
        H5File(b"notanhdf5file" + bytes(100))
    junk = bytearray(_golden_hdf5())
    junk[8] = 2                      # superblock v2 → crisp unsupported
    with pytest.raises(H5Unsupported, match="superblock version 2"):
        H5File(bytes(junk))


@pytest.mark.parametrize("chunked,compress", [(False, False),
                                              (True, False),
                                              (True, True)])
def test_write_read_roundtrip(tmp_path, chunked, compress):
    t = np.arange(10, dtype="<i4")
    lat = np.array([-10.0, 0.0, 10.0])
    lon = np.array([0.0, 90.0])
    temp = np.arange(60, dtype="<f8").reshape(10, 3, 2) * 0.5
    path = write_hdf5(
        str(tmp_path / "rt.nc"),
        {"time": (t, {"units": "days since 2021-01-01"}),
         "lat": lat, "lon": lon},
        {"temperature": (["time", "lat", "lon"], temp, {"units": "K"})},
        attrs={"title": "fixture"},
        chunks={"temperature": (4, 2, 2)} if chunked else None,
        compress=compress)
    f = open_hdf5(path)
    np.testing.assert_array_equal(f.read("temperature"), temp)
    np.testing.assert_array_equal(f.read("lat"), lat)
    assert f.datasets["lat"].attrs["CLASS"] == "DIMENSION_SCALE"
    assert f.datasets["temperature"].attrs["units"] == "K"
    # DIMENSION_LIST object references resolve to the dim datasets
    refs = f.datasets["temperature"].attrs["DIMENSION_LIST"]
    assert [f.addr_to_name[r[0]] for r in refs] == ["time", "lat", "lon"]


def test_hdf5_to_grid_netcdf4_semantics(tmp_path):
    """CF time decode + scale/offset + _FillValue unpacking."""
    t = np.array([0, 6, 12], dtype="<i4")     # hours
    lat = np.array([0.0, 10.0])
    packed = np.array([[10, 20], [30, -99], [50, 60]], dtype="<i2")
    path = write_hdf5(
        str(tmp_path / "cf.nc"),
        {"time": (t, {"units": "hours since 2020-03-01"}), "lat": lat},
        {"tas": (["time", "lat"], packed,
                 {"scale_factor": 0.5, "add_offset": 100.0,
                  "_FillValue": np.int16(-99)})})
    coords, arrays, dim_order, dims = hdf5.hdf5_to_grid(
        open(path, "rb").read())
    assert dim_order == ["time", "lat"] and dims["time"] == "time"
    assert str(coords["time"][1]) == "2020-03-01T06:00:00.000000000"
    got = arrays["tas"]
    assert got[0, 0] == 10 * 0.5 + 100.0
    # integer fill is unpacked too (scale applied after NaN masking is
    # only for float sources; int fill value scales like data — assert
    # the sentinel is NOT silently kept)
    assert got[1, 1] == -99 * 0.5 + 100.0 or np.isnan(got[1, 1])
    # time_range slicing at the grid level
    _, arrays2, _, _ = hdf5.hdf5_to_grid(
        open(path, "rb").read(),
        time_range=("2020-03-01T00:00", "2020-03-01T06:00"))
    assert arrays2["tas"].shape == (2, 2)


def test_read_netcdf_long_end_to_end_hdf5(spark, tmp_path):
    """The S1 round trip: HDF5 fixture → read_netcdf_long → long model →
    monthly-mean metric, with projection + time predicates."""
    t = np.arange(0, 24 * 10, 24, dtype="<i4")   # 10 daily steps (hours)
    lat = np.array([-10.0, 0.0, 10.0])
    lon = np.array([0.0, 90.0])
    temp = (np.arange(60, dtype="<f8").reshape(10, 3, 2) * 0.5 + 250.0)
    pr = np.arange(60, dtype="<f8").reshape(10, 3, 2) * 0.1
    path = write_hdf5(
        str(tmp_path / "era5like.nc"),
        {"time": (t, {"units": "hours since 2021-06-01"}),
         "lat": lat, "lon": lon},
        {"temperature": (["time", "lat", "lon"], temp, {"units": "K"}),
         "precip": (["time", "lat", "lon"], pr, {})},
        chunks={"temperature": (5, 3, 2), "precip": (5, 3, 2)},
        compress=True)
    df = read_netcdf_long(spark, path, variables=["temperature"],
                          time_range=("2021-06-02", "2021-06-05"),
                          bbox=(0.0, -5.0, 100.0, 90.0))
    assert set(df.columns) == {"time", "lat", "lon", "temperature"}
    rows = df.collect()
    assert len(rows) == 4 * 2 * 2      # 4 days x 2 lats x 2 lons
    got_mean = df.agg(F.avg("temperature")).first()[0]
    sel = temp[1:5, 1:3, :]
    assert abs(got_mean - sel.mean()) < 1e-9
    with pytest.raises(ValueError, match="not found"):
        read_netcdf_long(spark, path, variables=["nope"])


def test_read_many_mixed_containers(spark, tmp_path):
    """Distributed multi-file ingest sniffs per file: one classic CDF-1
    shard + one HDF5 shard of the same logical dataset."""
    from climate_data_pipeline_spark.sources import netcdf3

    lat = np.array([0.0, 10.0])
    v1 = np.arange(4, dtype="<f8").reshape(2, 2)
    v2 = np.arange(4, 8, dtype="<f8").reshape(2, 2)
    netcdf3.write_netcdf3(
        str(tmp_path / "a.nc"), {"time": None, "lat": 2},
        {"time": (["time"], np.array([0, 24], dtype=np.int32),
                  {"units": "hours since 2022-01-01"}),
         "lat": (["lat"], lat, {}),
         "v": (["time", "lat"], v1, {})})
    write_hdf5(
        str(tmp_path / "b.nc"),
        {"time": (np.array([48, 72], dtype="<i4"),
                  {"units": "hours since 2022-01-01"}), "lat": lat},
        {"v": (["time", "lat"], v2, {})})
    df = read_netcdf3_many(spark, str(tmp_path / "*.nc"))
    assert df.count() == 8
    total = df.agg(F.sum("v")).first()[0]
    assert total == float(v1.sum() + v2.sum())
    assert df.select(F.min("time"), F.max("time")).first() is not None


def test_distributed_read_equals_driver_side(spark, tmp_path):
    """Chunk-per-task HDF5 read: executor-side seek+defilter yields
    exactly the driver-side rows, for chunked+compressed AND contiguous
    layouts, with chunk-index pruning under predicates."""
    from climate_data_pipeline_spark.sources.hdf5 import (
        read_hdf5_long_distributed,
    )

    t = np.arange(0, 24 * 12, 24, dtype="<i4")
    lat = np.array([-10.0, 0.0, 10.0])
    lon = np.array([0.0, 90.0])
    temp = np.arange(72, dtype="<f8").reshape(12, 3, 2) + 250.0
    pr = np.arange(72, dtype="<f8").reshape(12, 3, 2) * 0.1
    for label, chunks, compress in (
            ("chunked", {"temperature": (5, 2, 2),
                         "precip": (5, 2, 2)}, True),
            ("contig", None, False)):
        path = write_hdf5(
            str(tmp_path / f"{label}.nc"),
            {"time": (t, {"units": "hours since 2023-01-01"}),
             "lat": lat, "lon": lon},
            {"temperature": (["time", "lat", "lon"], temp, {}),
             "precip": (["time", "lat", "lon"], pr, {})},
            chunks=chunks, compress=compress)
        want = {(str(r["time"]), r["lat"], r["lon"], r["temperature"],
                 r["precip"])
                for r in read_netcdf_long(spark, path).collect()}
        got = {(str(r["time"]), r["lat"], r["lon"], r["temperature"],
                r["precip"])
               for r in read_hdf5_long_distributed(spark, path).collect()}
        assert got == want and len(got) == 72, label
        # predicate pruning + exact row filter
        sliced = read_hdf5_long_distributed(
            spark, path, time_range=("2023-01-03", "2023-01-06"),
            bbox=(50.0, -5.0, 100.0, 90.0))
        rows = sliced.collect()
        assert len(rows) == 4 * 2 * 1, label
        assert all(r["lon"] == 90.0 for r in rows)
    # out-of-range predicate selects zero chunks and zero rows
    assert read_hdf5_long_distributed(
        spark, str(tmp_path / "chunked.nc"),
        time_range=("2031-01-01", "2031-12-31")).count() == 0


def test_distributed_read_variable_subset_and_mismatch(spark, tmp_path):
    from climate_data_pipeline_spark.sources.hdf5 import (
        read_hdf5_long_distributed,
    )

    t = np.arange(4, dtype="<i4")
    a = np.arange(8, dtype="<f8").reshape(4, 2)
    b = np.arange(12, dtype="<f8").reshape(4, 3)
    path = write_hdf5(
        str(tmp_path / "mix.nc"),
        {"time": t, "x": np.array([0.0, 1.0]),
         "y": np.array([0.0, 1.0, 2.0])},
        {"va": (["time", "x"], a, {}), "vb": (["time", "y"], b, {})})
    with pytest.raises(ValueError, match="share one shape"):
        read_hdf5_long_distributed(spark, path)
    df = read_hdf5_long_distributed(spark, path, variables=["va"])
    assert df.count() == 8
    assert set(df.columns) == {"time", "x", "va"}


def test_long_to_hdf5_round_trip(spark, tmp_path):
    """Derived-product sink: long rows → NetCDF4/HDF5 → re-read equals
    the original frame (CF time units carried on the coordinate)."""
    import pandas as pd

    times = pd.date_range("2024-02-01", periods=6, freq="D")
    rows = [(t.to_pydatetime(), float(la), float(lo), float(i))
            for i, t in enumerate(times)
            for la in (0.0, 10.0) for lo in (5.0,)]
    df = spark.createDataFrame(rows, "time timestamp, lat double, "
                                     "lon double, clim double")
    out = str(tmp_path / "derived.nc")
    long_to_hdf5(df, out, dim_cols=["time", "lat", "lon"],
                 attrs={"title": "derived"})
    f = open_hdf5(out)
    assert "since" in f.datasets["time"].attrs["units"]
    back = read_netcdf_long(spark, out)
    want = {(str(r["time"]), r["lat"], r["lon"], r["clim"])
            for r in df.collect()}
    got = {(str(r["time"]), r["lat"], r["lon"], r["clim"])
           for r in back.collect()}
    assert got == want
