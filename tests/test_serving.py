"""Tests for the serving layer: cache semantics + endpoint analogues."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.serving import QueryCache, ServingApi, cache_key
from climate_data_pipeline_spark.sources.io import load_table
from climate_data_pipeline_spark.sources.synthetic import climate_grid


def test_cache_key_stable_and_arg_sensitive():
    a = cache_key("point", dataset="x", keys={"lat": 1})
    b = cache_key("point", keys={"lat": 1}, dataset="x")  # kwarg order
    c = cache_key("point", dataset="x", keys={"lat": 2})
    assert a == b != c
    assert a.startswith("point:") and len(a.split(":")[1]) == 16


def test_cache_ttl_and_pattern():
    cache = QueryCache(default_ttl=1000)
    cache.set("point:aa", [1]); cache.set("point:bb", [2], ttl=-1)
    cache.set("stats:cc", {"m": 3})
    assert cache.get("point:aa") == [1]
    assert cache.get("point:bb") is None           # expired
    assert cache.clear_pattern("point:") == 1      # only aa left to clear
    assert cache.get("point:aa") is None
    assert cache.get("stats:cc") == {"m": 3}
    s = cache.stats()
    assert s["entries"] == 1 and s["hits"] == 2 and s["misses"] == 2


@pytest.fixture(scope="module")
def api(spark):
    return ServingApi(spark)


@pytest.fixture(scope="module")
def grid(spark):
    return climate_grid(spark, days=60).cache()


def test_point_timeseries_cached(api, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = api.point_timeseries(ev, "ts", "value", keys={"user_id": 8},
                               dataset="events")
    assert out and all("ts" in r and "value" in r for r in out)
    assert [r["ts"] for r in out] == sorted(r["ts"] for r in out)
    before = api.cache.stats()["hits"]
    again = api.point_timeseries(ev, "ts", "value", keys={"user_id": 8},
                                 dataset="events")
    assert again == out
    assert api.cache.stats()["hits"] == before + 1


def test_region_grid_and_summary(api, grid):
    pts = api.region_grid(grid, "lat", "lon", "temperature",
                          bbox=(-20.0, -10.0, 20.0, 10.0),
                          at=("2020-01-01", "2020-01-01"),
                          time_col="ts", dataset="grid")
    assert 0 < len(pts) <= ServingApi.MAX_POINTS
    assert all(-10 <= p["lat"] <= 10 for p in pts)
    summary = api.region_summary(grid, "lat", "lon", "temperature",
                                 bbox=(-20.0, -10.0, 20.0, 10.0),
                                 dataset="grid")
    assert summary["min"] <= summary["p10"] <= summary["p50"] \
           <= summary["p90"] <= summary["max"]
    assert summary["n"] > 0


def test_metric_endpoint(api, grid):
    rows = api.metric(grid, "climatology", "ts", "temperature",
                      keys=["lat"], dataset="grid")
    assert rows and {"month", "lat", "clim_value"} <= set(rows[0])
    with pytest.raises(ValueError, match="unknown metric_type"):
        api.metric(grid, "nope", "ts", "temperature")
