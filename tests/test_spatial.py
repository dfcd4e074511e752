"""Spatial operators: haversine known values, nearest-station
assignment determinism, bilinear interpolation exactness properties."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.operators.spatial import (
    bilinear_regrid,
    haversine_km,
    nearest_neighbor,
)


def _dist(spark, lat1, lon1, lat2, lon2):
    df = spark.createDataFrame([(lat1, lon1, lat2, lon2)],
                               "a double, b double, c double, d double")
    return df.select(haversine_km(F.col("a"), F.col("b"),
                                  F.col("c"), F.col("d"))
                     .alias("km")).first()["km"]


def test_haversine_known_values(spark):
    # quarter circumference: equator to pole
    assert _dist(spark, 0.0, 0.0, 90.0, 0.0) == pytest.approx(
        6371.0 * math.pi / 2, rel=1e-12)
    # one degree of longitude at the equator
    assert _dist(spark, 0.0, 0.0, 0.0, 1.0) == pytest.approx(
        6371.0 * math.pi / 180, rel=1e-12)
    # symmetric and zero at identity
    assert _dist(spark, 12.0, 34.0, 12.0, 34.0) == 0.0
    assert _dist(spark, 10.0, 20.0, 30.0, 40.0) == pytest.approx(
        _dist(spark, 30.0, 40.0, 10.0, 20.0), rel=1e-12)
    # antipodal = half circumference
    assert _dist(spark, 0.0, 0.0, 0.0, 180.0) == pytest.approx(
        6371.0 * math.pi, rel=1e-12)


def test_nearest_neighbor_picks_closest_and_breaks_ties(spark):
    stations = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 10.0), (3, 20.0, 0.0)],
        "station_id int, lat double, lon double")
    targets = spark.createDataFrame(
        [(100, 1.0, 1.0),    # near station 1
         (200, 0.0, 9.0),    # near station 2
         (300, 0.0, 5.0)],   # exactly between 1 and 2 -> tie -> min id
        "tid int, lat double, lon double")
    got = {r["tid"]: (r["nearest_station_id"], r["distance_km"])
           for r in nearest_neighbor(targets, stations, ["tid"]).collect()}
    assert got[100][0] == 1
    assert got[200][0] == 2
    assert got[300][0] == 1  # tie broken by smaller station id
    assert got[300][1] == pytest.approx(
        _dist(spark, 0.0, 5.0, 0.0, 0.0), abs=1e-6)


def test_nearest_neighbor_band_prefilter_same_result(spark):
    stations = spark.createDataFrame(
        [(i, float(i * 10 - 40), 0.0) for i in range(9)],
        "station_id int, lat double, lon double")
    targets = spark.createDataFrame(
        [(i, float(i * 7 % 40 - 20) + 0.5, float(i)) for i in range(30)],
        "tid int, lat double, lon double")
    full = sorted(map(tuple, nearest_neighbor(
        targets, stations, ["tid"]).collect()))
    banded = sorted(map(tuple, nearest_neighbor(
        targets, stations, ["tid"], band_deg=15.0).collect()))
    assert full == banded  # band >= worst-case separation -> identical


def _grid_from(spark, fn, step=1.0):
    rows = [(float(la) * step, float(lo) * step, fn(la * step, lo * step))
            for la in range(0, 5) for lo in range(0, 5)]
    return spark.createDataFrame(rows, "lat double, lon double, value double")


def test_bilinear_exact_on_grid_nodes(spark):
    grid = _grid_from(spark, lambda la, lo: la * 10 + lo)
    targets = spark.createDataFrame([(1, 2.0, 3.0)],
                                    "tid int, lat double, lon double")
    row = bilinear_regrid(grid, targets, ["tid"]).first()
    assert row["value_interp"] == pytest.approx(23.0, abs=1e-12)


def test_bilinear_reproduces_linear_functions_exactly(spark):
    # bilinear interpolation is exact for f = a + b*lat + c*lon
    grid = _grid_from(spark, lambda la, lo: 5.0 + 2.0 * la - 3.0 * lo)
    targets = spark.createDataFrame(
        [(1, 1.25, 2.75), (2, 0.5, 0.5), (3, 3.9, 0.1)],
        "tid int, lat double, lon double")
    got = {r["tid"]: r["value_interp"]
           for r in bilinear_regrid(grid, targets, ["tid"]).collect()}
    assert got[1] == pytest.approx(5.0 + 2.0 * 1.25 - 3.0 * 2.75, abs=1e-12)
    assert got[2] == pytest.approx(5.0 + 2.0 * 0.5 - 3.0 * 0.5, abs=1e-12)
    assert got[3] == pytest.approx(5.0 + 2.0 * 3.9 - 3.0 * 0.1, abs=1e-12)


def test_bilinear_midpoint_is_corner_average(spark):
    grid = spark.createDataFrame(
        [(0.0, 0.0, 1.0), (0.0, 1.0, 2.0), (1.0, 0.0, 3.0),
         (1.0, 1.0, 6.0)],
        "lat double, lon double, value double")
    targets = spark.createDataFrame([(1, 0.5, 0.5)],
                                    "tid int, lat double, lon double")
    row = bilinear_regrid(grid, targets, ["tid"]).first()
    assert row["value_interp"] == pytest.approx(3.0, abs=1e-12)
    assert row["n_corners"] == 4


def test_bilinear_edge_renormalizes_missing_corners(spark):
    # only the bottom row of corners exists: weights renormalize
    grid = spark.createDataFrame(
        [(0.0, 0.0, 10.0), (0.0, 1.0, 20.0)],
        "lat double, lon double, value double")
    targets = spark.createDataFrame([(1, 0.25, 0.5)],
                                    "tid int, lat double, lon double")
    row = bilinear_regrid(grid, targets, ["tid"]).first()
    assert row["n_corners"] == 2
    # renormalized over the two found corners -> plain lon interpolation
    assert row["value_interp"] == pytest.approx(15.0, abs=1e-12)


def test_bilinear_fractional_step_joins_all_corners(spark):
    """Regression: step 0.1 is not binary-exact — the float-coordinate
    equality join silently dropped corners (n_corners 2-3) and returned
    edge-renormalized wrong values; integer cell indices join exactly."""
    from climate_data_pipeline_spark.operators.spatial import (
        bilinear_regrid,
    )
    pts = [(la / 10.0, lo / 10.0, float(la + lo))
           for la in range(0, 11) for lo in range(0, 11)]
    grid = spark.createDataFrame(pts, "lat double, lon double, value double")
    tgt = spark.createDataFrame([(1, 0.27, 0.33)],
                                "tid long, lat double, lon double")
    r = bilinear_regrid(grid, tgt, ["tid"], value_col="value",
                        lat_step=0.1, lon_step=0.1).first()
    assert r["n_corners"] == 4
    # value is linear in (lat, lon): interpolation is exact
    assert abs(r["value_interp"] - (2.7 + 3.3)) < 1e-9


def test_nearest_neighbor_ignores_null_coord_stations(spark):
    from climate_data_pipeline_spark.operators.spatial import (
        nearest_neighbor,
    )
    tgt = spark.createDataFrame([(1, 0.0, 0.0)],
                                "tid long, lat double, lon double")
    st = spark.createDataFrame(
        [(100, 1.0, 1.0), (999, None, None)],
        "station_id long, lat double, lon double")
    r = nearest_neighbor(tgt, st, ["tid"]).first()
    assert r["nearest_station_id"] == 100
    assert r["distance_km"] is not None
