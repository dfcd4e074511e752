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


def test_read_netcdf_stubbed(spark):
    with pytest.raises(NotImplementedError, match="STUB"):
        read_netcdf_long(spark, "/nonexistent.nc")
