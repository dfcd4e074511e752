"""Tests for the NetCDF ingest core: dimension detection and the
dense-grid → long-table conversion (the format seam itself is stubbed —
no xarray in this environment)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.sources.netcdf import (
    detect_dims,
    grid_to_long,
    read_netcdf_long,
)


def test_detect_dims_names_and_fallback():
    assert detect_dims(["time", "latitude", "longitude"]) == {
        "time": "time", "lat": "latitude", "lon": "longitude"}
    assert detect_dims(["T", "Y", "X"]) == {"time": "T", "lat": "Y", "lon": "X"}
    # dtype fallback for an unconventional time name (ref netcdf_reader.py:88)
    got = detect_dims(["valid_at", "lat", "lon"],
                      {"valid_at": "datetime64[ns]"})
    assert got["time"] == "valid_at"


def test_grid_to_long_roundtrip(spark):
    rng = np.random.default_rng(42)
    coords = {
        "time": np.array(["2020-01-01", "2020-01-02", "2020-01-03"],
                         dtype="datetime64[ns]"),
        "lat": np.array([-10.0, 0.0, 10.0]),
        "lon": np.array([0.0, 90.0]),
    }
    temp = rng.normal(280, 5, size=(3, 3, 2))
    precip = rng.exponential(0.001, size=(3, 3, 2))
    df = grid_to_long(spark, coords,
                      {"temperature": temp, "precipitation": precip},
                      dim_order=["time", "lat", "lon"], time_chunk=2)
    assert df.count() == 3 * 3 * 2
    assert set(df.columns) == {"time", "lat", "lon", "temperature",
                               "precipitation"}
    # spot-check a specific cell against the dense array
    row = df.where((F.col("time") == "2020-01-02") & (F.col("lat") == 0.0)
                   & (F.col("lon") == 90.0)).first()
    assert row["temperature"] == pytest.approx(temp[1, 1, 1])
    assert row["precipitation"] == pytest.approx(precip[1, 1, 1])
    # every (time, lat, lon) combination exactly once
    assert df.select("time", "lat", "lon").distinct().count() == 18


def test_grid_to_long_validates_shape(spark):
    with pytest.raises(ValueError, match="shape"):
        grid_to_long(spark, {"t": np.arange(3), "x": np.arange(2)},
                     {"v": np.zeros((3, 3))}, dim_order=["t", "x"])


def test_read_netcdf_hdf5_needs_external_libs(spark, tmp_path):
    p = tmp_path / "modern.nc"
    p.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="NetCDF4/HDF5"):
        read_netcdf_long(spark, str(p))


# --- built-in NetCDF3 classic parser/writer --------------------------------

def _golden_bytes() -> bytes:
    """Hand-assembled per the public classic-format spec: CDF-1, one
    fixed dim x=2, one int variable v(x) = [7, 9]. Independent of the
    writer, so parser and writer are checked against the SPEC, not just
    each other."""
    import struct

    out = b"CDF\x01"
    out += struct.pack(">I", 0)                      # numrecs
    out += struct.pack(">II", 0x0A, 1)               # NC_DIMENSION, 1 dim
    out += struct.pack(">I", 1) + b"x\x00\x00\x00"   # name "x" padded
    out += struct.pack(">I", 2)                      # dim size 2
    out += struct.pack(">II", 0, 0)                  # no global attrs
    out += struct.pack(">II", 0x0B, 1)               # NC_VARIABLE, 1 var
    out += struct.pack(">I", 1) + b"v\x00\x00\x00"   # name "v"
    out += struct.pack(">I", 1) + struct.pack(">I", 0)  # 1 dim, dimid 0
    out += struct.pack(">II", 0, 0)                  # no var attrs
    out += struct.pack(">III", 4, 8, len(out) + 12)  # NC_INT, vsize, begin
    out += struct.pack(">ii", 7, 9)                  # data
    return out


def test_nc3_parser_reads_golden_bytes():
    from climate_data_pipeline_spark.sources import netcdf3

    buf = _golden_bytes()
    f = netcdf3.parse_netcdf3(buf)
    assert f.dims == [("x", 2)] and f.numrecs == 0
    v = f.variables["v"]
    assert v.nc_type == 4 and f.shape(v) == (2,)
    assert netcdf3.read_var(buf, f, "v").tolist() == [7, 9]


def test_nc3_writer_emits_golden_bytes(tmp_path):
    from climate_data_pipeline_spark.sources import netcdf3

    p = str(tmp_path / "golden.nc")
    netcdf3.write_netcdf3(p, {"x": 2},
                          {"v": (["x"], np.array([7, 9], dtype=np.int32), {})})
    assert open(p, "rb").read() == _golden_bytes()


def test_nc3_roundtrip_record_vars_and_attrs(tmp_path):
    from climate_data_pipeline_spark.sources import netcdf3

    p = str(tmp_path / "rt.nc")
    t = np.arange(5, dtype=np.int32)
    temp = np.arange(30, dtype=np.float32).reshape(5, 3, 2) * 0.5
    precip = np.arange(30, dtype=np.float64).reshape(5, 3, 2) * 0.25
    netcdf3.write_netcdf3(
        p,
        {"time": None, "lat": 3, "lon": 2},
        {"time": (["time"], t, {"units": "days since 2020-01-01"}),
         "lat": (["lat"], np.array([-10., 0., 10.]), {}),
         "lon": (["lon"], np.array([0., 90.]), {}),
         "temperature": (["time", "lat", "lon"], temp, {"units": "K"}),
         "precipitation": (["time", "lat", "lon"], precip, {})},
        attrs={"title": "roundtrip"})
    buf = open(p, "rb").read()
    f = netcdf3.parse_netcdf3(buf)
    assert f.numrecs == 5 and f.attrs["title"] == "roundtrip"
    assert f.variables["temperature"].attrs["units"] == "K"
    np.testing.assert_array_equal(netcdf3.read_var(buf, f, "temperature"), temp)
    np.testing.assert_array_equal(netcdf3.read_var(buf, f, "precipitation"),
                                  precip)
    np.testing.assert_array_equal(netcdf3.read_var(buf, f, "lat"),
                                  [-10., 0., 10.])
    ts = netcdf3.decode_cf_time(netcdf3.read_var(buf, f, "time"),
                                f.variables["time"].attrs["units"])
    assert str(ts[1])[:10] == "2020-01-02"


def test_read_netcdf_long_end_to_end(spark, tmp_path):
    """S1/S2 for real: write classic NetCDF, ingest to the long model
    with variable projection + time-range predicate + bbox."""
    from climate_data_pipeline_spark.sources import netcdf3

    p = str(tmp_path / "climate.nc")
    t = np.arange(10, dtype=np.int32)
    temp = np.arange(90, dtype=np.float32).reshape(10, 3, 3)
    netcdf3.write_netcdf3(
        p,
        {"time": None, "lat": 3, "lon": 3},
        {"time": (["time"], t, {"units": "days since 2021-06-01"}),
         "lat": (["lat"], np.array([-10., 0., 10.]), {}),
         "lon": (["lon"], np.array([-90., 0., 90.]), {}),
         "temperature": (["time", "lat", "lon"], temp, {}),
         "wind": (["time", "lat", "lon"], temp * 2, {})})

    df = read_netcdf_long(spark, p, variables=["temperature"],
                          time_range=("2021-06-03", "2021-06-05"),
                          bbox=(-100.0, -5.0, 100.0, 15.0))
    assert set(df.columns) == {"time", "lat", "lon", "temperature"}
    rows = df.collect()
    assert len(rows) == 3 * 2 * 3        # 3 days × 2 lats × 3 lons
    assert {str(r["time"])[:10] for r in rows} == {
        "2021-06-03", "2021-06-04", "2021-06-05"}
    assert {r["lat"] for r in rows} == {0.0, 10.0}
    with pytest.raises(ValueError, match="not found"):
        read_netcdf_long(spark, p, variables=["nope"])


def test_read_netcdf3_many_distributed(spark, tmp_path):
    """Multi-file ingest: one classic file per time shard, parsed on
    executors via binaryFile + mapInPandas; union equals the per-file
    driver-side reads."""
    from climate_data_pipeline_spark.sources import netcdf3
    from climate_data_pipeline_spark.sources.netcdf import read_netcdf3_many

    for shard in range(3):
        t = np.arange(4, dtype=np.int32) + shard * 4
        v = (np.arange(16, dtype=np.float64).reshape(4, 2, 2)
             + 100 * shard)
        netcdf3.write_netcdf3(
            str(tmp_path / f"shard{shard}.nc"),
            {"time": None, "lat": 2, "lon": 2},
            {"time": (["time"], t, {"units": "hours since 2022-01-01"}),
             "lat": (["lat"], np.array([0., 1.]), {}),
             "lon": (["lon"], np.array([0., 1.]), {}),
             "v": (["time", "lat", "lon"], v, {})})

    df = read_netcdf3_many(spark, str(tmp_path / "*.nc"))
    assert df.count() == 3 * 4 * 2 * 2
    total = df.agg(F.sum("v")).first()[0]
    want = sum(float((np.arange(16) + 100 * s).sum()) for s in range(3))
    assert total == want


def test_netcdf_round_trip_both_directions(spark, tmp_path):
    """NetCDF → engine (monthly climatology product) → NetCDF → engine:
    the full format loop a reference user needs to switch engines."""
    from climate_data_pipeline_spark.sources.netcdf import long_to_netcdf3
    from climate_data_pipeline_spark.sources import netcdf3

    src = str(tmp_path / "src.nc")
    t = np.arange(8, dtype=np.int32)
    v = np.arange(32, dtype=np.float64).reshape(8, 2, 2)
    netcdf3.write_netcdf3(
        src, {"time": None, "lat": 2, "lon": 2},
        {"time": (["time"], t, {"units": "days since 2020-03-01"}),
         "lat": (["lat"], np.array([0., 10.]), {}),
         "lon": (["lon"], np.array([5., 15.]), {}),
         "v": (["time", "lat", "lon"], v, {})})

    df = read_netcdf_long(spark, src)
    out = str(tmp_path / "out.nc")
    long_to_netcdf3(df, out, dim_cols=["time", "lat", "lon"],
                    attrs={"product": "export"})
    back = read_netcdf_long(spark, out)
    a = {(str(r["time"]), r["lat"], r["lon"], r["v"]) for r in df.collect()}
    b = {(str(r["time"]), r["lat"], r["lon"], r["v"]) for r in back.collect()}
    assert a == b


def test_convert_netcdf_job(spark, tmp_path):
    """O6 parity: NetCDF → layout-preset parquet with verification —
    the reference's convert task shape, on the real format."""
    from climate_data_pipeline_spark.plans.jobs import convert_netcdf
    from climate_data_pipeline_spark.sources import netcdf3

    src = str(tmp_path / "in.nc")
    t = np.arange(6, dtype=np.int32)
    netcdf3.write_netcdf3(
        src, {"time": None, "lat": 2, "lon": 2},
        {"time": (["time"], t, {"units": "days since 2020-01-01"}),
         "lat": (["lat"], np.array([0., 10.]), {}),
         "lon": (["lon"], np.array([5., 15.]), {}),
         "v": (["time", "lat", "lon"],
               np.arange(24, dtype=np.float64).reshape(6, 2, 2), {})})
    out = str(tmp_path / "store")
    res = convert_netcdf(spark, src, out, time_range=("2020-01-02",
                                                      "2020-01-05"))
    assert res["status"] == "completed" and res["verified"]
    assert res["output_info"]["num_rows"] == 4 * 2 * 2
    got = spark.read.parquet(out)
    assert got.count() == 16


def test_nc3_array_valued_attributes_roundtrip(tmp_path):
    from climate_data_pipeline_spark.sources import netcdf3

    p = str(tmp_path / "attrs.nc")
    netcdf3.write_netcdf3(
        p, {"x": 3},
        {"v": (["x"], np.array([1., 2., 3.]),
               {"valid_range": np.array([0.0, 100.0]),
                "scale": np.float64(2.5), "name": "velocity"})},
        attrs={"levels": np.array([1, 2, 3], dtype=np.int32)})
    buf = open(p, "rb").read()
    f = netcdf3.parse_netcdf3(buf)
    va = f.variables["v"].attrs
    np.testing.assert_array_equal(va["valid_range"], [0.0, 100.0])
    assert va["scale"] == 2.5 and va["name"] == "velocity"
    np.testing.assert_array_equal(f.attrs["levels"], [1, 2, 3])


def test_nc3_python_int_attr_roundtrip(tmp_path):
    """Regression: plain python int attrs arrive as int64 — the writer
    must downcast losslessly to the classic int32 attr type (read →
    write of any integer attribute used to crash with KeyError), and
    refuse values outside int32 loudly."""
    from climate_data_pipeline_spark.sources import netcdf3

    p = str(tmp_path / "pyint.nc")
    netcdf3.write_netcdf3(
        p, {"x": 2}, {"v": (["x"], np.array([1., 2.]), {"n_members": 5})},
        attrs={"revision": 7})
    f = netcdf3.parse_netcdf3(open(p, "rb").read())
    assert f.attrs["revision"] == 7
    assert f.variables["v"].attrs["n_members"] == 5
    with pytest.raises(ValueError, match="int32 range"):
        netcdf3.write_netcdf3(str(tmp_path / "big.nc"), {"x": 2},
                              {"v": (["x"], np.array([1., 2.]), {})},
                              attrs={"huge": 2**40})


def test_cf_time_fractional_values_decode_exact(tmp_path):
    """Regression: float CF coordinates ('0.5 days since …') decode to
    the half-unit instants, not floored whole units."""
    from climate_data_pipeline_spark.sources import netcdf3

    got = netcdf3.decode_cf_time(np.array([0.5, 1.5]),
                                 "days since 2000-01-01")
    assert str(got[0]) == "2000-01-01T12:00:00.000000000"
    assert str(got[1]) == "2000-01-02T12:00:00.000000000"
    # integer axes keep the exact int64 path
    gi = netcdf3.decode_cf_time(np.array([3], dtype="<i4"),
                                "hours since 2000-01-01")
    assert str(gi[0]) == "2000-01-01T03:00:00.000000000"


def test_nc3_cdf2_64bit_offsets_roundtrip(spark, tmp_path):
    """CDF-2 (64-bit offset) variant — the format large files require —
    round-trips through the same parser and the Spark ingest."""
    from climate_data_pipeline_spark.sources import netcdf3

    p = str(tmp_path / "wide.nc")
    t = np.arange(4, dtype=np.int32)
    v = np.arange(16, dtype=np.float64).reshape(4, 2, 2)
    netcdf3.write_netcdf3(
        p, {"time": None, "lat": 2, "lon": 2},
        {"time": (["time"], t, {"units": "days since 2020-01-01"}),
         "lat": (["lat"], np.array([0., 1.]), {}),
         "lon": (["lon"], np.array([0., 1.]), {}),
         "v": (["time", "lat", "lon"], v, {})},
        version=2)
    buf = open(p, "rb").read()
    assert buf[:4] == b"CDF\x02"
    f = netcdf3.parse_netcdf3(buf)
    np.testing.assert_array_equal(netcdf3.read_var(buf, f, "v"), v)
    assert read_netcdf_long(spark, p).count() == 16
    with pytest.raises(ValueError, match="version"):
        netcdf3.write_netcdf3(p, {"x": 1},
                              {"v": (["x"], np.zeros(1), {})}, version=3)


def test_nc3_single_short_record_var_vsize_unpadded(tmp_path):
    """Classic-spec exception: with exactly ONE record variable whose
    slab size is not a multiple of 4, header vsize must be the UNPADDED
    slab size (records are packed back-to-back) — external readers like
    scipy.io.netcdf stride by header vsize."""
    import struct

    from climate_data_pipeline_spark.sources import netcdf3

    p = str(tmp_path / "short.nc")
    vals = np.arange(5 * 3, dtype=np.int16).reshape(5, 3)  # slab = 6 bytes
    netcdf3.write_netcdf3(p, {"time": None, "x": 3},
                          {"v": (["time", "x"], vals, {})})
    buf = open(p, "rb").read()
    f = netcdf3.parse_netcdf3(buf)
    assert f.variables["v"].vsize == 6          # not rounded up to 8
    np.testing.assert_array_equal(netcdf3.read_var(buf, f, "v"), vals)
    # byte-exact stride check: records occupy begin + r*6
    begin = f.variables["v"].begin
    rec1 = np.frombuffer(buf, dtype=">i2", count=3, offset=begin + 6)
    np.testing.assert_array_equal(rec1.astype("i2"), vals[1])
    # with TWO record variables padding applies again
    p2 = str(tmp_path / "two.nc")
    netcdf3.write_netcdf3(p2, {"time": None, "x": 3},
                          {"v": (["time", "x"], vals, {}),
                           "w": (["time", "x"], vals + 100, {})})
    buf2 = open(p2, "rb").read()
    f2 = netcdf3.parse_netcdf3(buf2)
    assert f2.variables["v"].vsize == 8 and f2.variables["w"].vsize == 8
    np.testing.assert_array_equal(netcdf3.read_var(buf2, f2, "w"),
                                  vals + 100)


def test_cf_time_encoding_keeps_subhour_resolution(spark, tmp_path):
    """Sub-hour timestamps survive export → re-read (the old fixed
    'hours since' floor-divide truncated them): 15-minute cadence
    round-trips bit-exact through long_to_netcdf3."""
    import pandas as pd

    from climate_data_pipeline_spark.sources import netcdf3
    from climate_data_pipeline_spark.sources.netcdf import long_to_netcdf3

    times = pd.date_range("2021-06-01 00:15:00", periods=8, freq="15min")
    rows = [(t.to_pydatetime(), float(la), 0.0, float(i))
            for i, t in enumerate(times) for la in (0.0, 10.0)]
    df = spark.createDataFrame(rows, "time timestamp, lat double, "
                                     "lon double, v double")
    out = str(tmp_path / "subhour.nc")
    long_to_netcdf3(df, out, dim_cols=["time", "lat", "lon"])
    buf = open(out, "rb").read()
    f = netcdf3.parse_netcdf3(buf)
    units = f.variables["time"].attrs["units"]
    assert units.startswith("minutes since")
    ts = netcdf3.decode_cf_time(netcdf3.read_var(buf, f, "time"), units)
    np.testing.assert_array_equal(
        ts.astype("datetime64[ns]"), times.values)
    # second-level cadence falls through to 'seconds since'
    times_s = pd.date_range("2021-06-01 00:00:07", periods=4, freq="13s")
    rows = [(t.to_pydatetime(), 0.0, 0.0, 1.0) for t in times_s]
    df2 = spark.createDataFrame(rows, "time timestamp, lat double, "
                                      "lon double, v double")
    out2 = str(tmp_path / "subhour2.nc")
    long_to_netcdf3(df2, out2, dim_cols=["time", "lat", "lon"])
    buf2 = open(out2, "rb").read()
    f2 = netcdf3.parse_netcdf3(buf2)
    u2 = f2.variables["time"].attrs["units"]
    assert u2.startswith("seconds since")
    ts2 = netcdf3.decode_cf_time(netcdf3.read_var(buf2, f2, "time"), u2)
    np.testing.assert_array_equal(ts2.astype("datetime64[ns]"),
                                  times_s.values)


def test_export_size_guard_raises_loudly(spark, tmp_path):
    """_long_to_grid estimates (rows x schema bytes) BEFORE toPandas
    and names the cap — an oversized single-file export must fail
    descriptively, never OOM the driver raw."""
    import pytest

    from climate_data_pipeline_spark.sources.netcdf import (
        _long_to_grid, long_to_netcdf3)

    df = spark.range(1000).selectExpr(
        "CAST(id AS DOUBLE) AS time", "CAST(id % 7 AS DOUBLE) AS lat",
        "CAST(id % 3 AS DOUBLE) AS lon", "CAST(id AS DOUBLE) AS v")
    with pytest.raises(ValueError, match="GiB cap"):
        _long_to_grid(df, ["time", "lat", "lon"], None, max_bytes=1024)
    # within the cap the same frame still exports
    out = str(tmp_path / "small.nc")
    long_to_netcdf3(df.limit(20), out, dim_cols=["time", "lat", "lon"])
