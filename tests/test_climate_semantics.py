"""The reference's own test-suite assertions, run on reference-shaped
synthetic climate data through this engine's operators.

Mirrors `/root/reference/tests/` semantics (SURVEY.md §5 / FIXTURES.md A1):
2 years of daily (ts, lat, lon, temperature, precipitation) — 24 monthly
groups, 8 seasons, 12 climatology months, variance reduction, percentile
ordering, exceedance ≈ 10%, anomaly ≈ 0, z ~ N(0,1), severity ∈ [-3,3],
bbox/antimeridian behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.operators import (
    anomalies as A,
    percentiles as P,
    temporal as T,
)
from climate_data_pipeline_spark.sources.io import bbox_filter
from climate_data_pipeline_spark.sources.synthetic import climate_grid


@pytest.fixture(scope="module")
def grid(spark):
    # reference sample_dataset shape: 731 days × 19 lats × 36 lons
    return climate_grid(spark, start="2020-01-01", days=731).cache()


def test_grid_shape(grid):
    assert grid.count() == 731 * 19 * 36
    assert grid.select("lat").distinct().count() == 19
    assert grid.select("lon").distinct().count() == 36


def test_monthly_mean_24_months(grid):
    # ref tests/test_metrics/test_temporal.py:18-24
    out = T.monthly_mean(grid, "ts", "temperature", keys=["lat", "lon"])
    assert out.select("month_start").distinct().count() == 24


def test_monthly_variance_below_daily(grid):
    # ref test_temporal.py:33-40
    daily = grid.agg(F.var_samp("temperature")).first()[0]
    monthly = (T.monthly_mean(grid, "ts", "temperature", keys=["lat", "lon"])
                .agg(F.var_samp("avg_value")).first()[0])
    assert monthly < daily


def test_seasonal_8_groups(grid):
    # ref test_temporal.py:46-52 — 2 years → 8 (season_year, season) pairs,
    # plus the leading partial DJF (Jan-Feb 2020 anchors to DJF 2020 with
    # Dec 2021 → DJF 2022): exactly 9 distinct labels, 8 fully inside
    out = T.seasonal_mean(grid, "ts", "temperature")
    assert out.count() == 9


def test_annual_2_years(grid):
    # ref test_temporal.py:58-64
    out = T.annual_mean(grid, "ts", "temperature")
    assert out.count() == 2


def test_climatology_12_months(grid):
    # ref test_temporal.py:78-83
    out = T.climatology(grid, "ts", "temperature", keys=["lat", "lon"])
    assert out.select("month").distinct().count() == 12


def test_rolling_smooths(grid, spark):
    # ref test_temporal.py:113-120 — on one grid point's series
    point = grid.where((F.col("lat") == 0.0) & (F.col("lon") == 0.0))
    out = T.rolling_mean(point, "ts", "temperature", keys=["lat", "lon"],
                         window=30)
    raw, smooth = out.agg(F.var_samp("temperature"),
                          F.var_samp("rolling_mean")).first()
    assert smooth < raw


def test_percentile_ordering(grid):
    # ref tests/test_metrics/test_percentiles.py:52-64
    wide = P.grouped_percentiles(grid, "ts", "temperature",
                                 keys=["lat", "lon"], long_format=False)
    bad = wide.where((F.col("p10") > F.col("p50"))
                     | (F.col("p50") > F.col("p90"))).count()
    assert bad == 0


def test_exceedance_of_p90_near_10pct(grid):
    # ref test_percentiles.py:70-85 (bounds 0.05-0.20)
    out = P.exceedance_frequency(grid, "ts", "temperature",
                                 keys=["lat", "lon"], percentile=90)
    lo, hi = out.agg(F.min("exceedance_freq"),
                     F.max("exceedance_freq")).first()
    assert 0.02 < lo and hi < 0.25


def test_anomaly_mean_within_1K(grid):
    # ref tests/test_metrics/test_anomalies.py:23-29
    out = A.anomaly(grid, "ts", "temperature", keys=["lat", "lon"])
    m = out.agg(F.avg("anomaly")).first()[0]
    assert abs(m) < 1.0


def test_zscore_standard_normal(grid):
    # ref test_anomalies.py:51-61
    out = A.zscore(grid, "ts", "temperature", keys=["lat", "lon"])
    mean, std = out.agg(F.avg("zscore"), F.stddev_samp("zscore")).first()
    assert abs(mean) < 0.05 and abs(std - 1.0) < 0.05


def test_severity_range_and_signs(grid):
    # ref test_anomalies.py:67-89
    z = A.zscore(grid, "ts", "temperature", keys=["lat", "lon"])
    sev = A.severity(z, "zscore")
    lo, hi = sev.agg(F.min("severity"), F.max("severity")).first()
    assert -3 <= lo < 0 < hi <= 3


def test_temperature_latitude_gradient(grid):
    # equator warmer than poles (fixture structure, conftest.py:30-40)
    by_lat = (grid.groupBy("lat").agg(F.avg("temperature").alias("t"))
                  .collect())
    temps = {r["lat"]: r["t"] for r in by_lat}
    assert temps[0.0] > temps[80.0] and temps[0.0] > temps[-80.0]


def test_bbox_simple(grid):
    # ref tests/test_ingest/test_netcdf_reader.py bbox bounds
    out = bbox_filter(grid, "lat", "lon", (-20.0, -10.0, 30.0, 10.0))
    r = out.agg(F.min("lat"), F.max("lat"), F.min("lon"), F.max("lon")).first()
    assert r[0] >= -10.0 and r[1] <= 10.0 and r[2] >= -20.0 and r[3] <= 30.0


def test_bbox_antimeridian(grid):
    # ref netcdf_reader.py:150-154 — box crossing 180° = OR predicate
    out = bbox_filter(grid, "lat", "lon", (160.0, -10.0, -160.0, 10.0))
    lons = {r["lon"] for r in out.select("lon").distinct().collect()}
    assert lons == {160.0, 170.0, -180.0, -170.0, -160.0}


def test_bbox_normalizes_0_360(spark, grid):
    # ref netcdf_reader.py:132-137 — data stored 0..360 still queryable
    g360 = grid.withColumn("lon", F.when(F.col("lon") < 0,
                                         F.col("lon") + 360.0)
                                    .otherwise(F.col("lon")))
    out = bbox_filter(g360, "lat", "lon", (-20.0, -10.0, 10.0, 10.0),
                      normalize_lon=True)
    assert out.count() > 0
    # normalized lon space: matches the same cells as the native query
    native = bbox_filter(grid, "lat", "lon", (-20.0, -10.0, 10.0, 10.0))
    assert out.count() == native.count()


def test_resample_ffill_fills_gaps_and_flags(spark):
    from datetime import datetime

    from climate_data_pipeline_spark.operators.temporal import resample_ffill

    rows = [  # user 1: events on day 1 and day 4 only
        (1, datetime(2024, 1, 1, 5), 10.0),
        (1, datetime(2024, 1, 1, 9), 11.0),   # later same day wins
        (1, datetime(2024, 1, 4, 0), 40.0),
        (2, datetime(2024, 1, 2, 0), 99.0),   # single-day user: no gaps
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = {(r["user_id"], str(r["bucket"])): (r["value"], r["observed"])
           for r in resample_ffill(df, "ts", "value", ["user_id"],
                                   freq="day").collect()}
    assert out[(1, "2024-01-01 00:00:00")] == (11.0, True)   # last obs of day
    assert out[(1, "2024-01-02 00:00:00")] == (11.0, False)  # carried forward
    assert out[(1, "2024-01-03 00:00:00")] == (11.0, False)
    assert out[(1, "2024-01-04 00:00:00")] == (40.0, True)
    assert out[(2, "2024-01-02 00:00:00")] == (99.0, True)
    assert len(out) == 5  # dense spine: 4 days for user 1, 1 for user 2


def test_robust_zscore_resists_outliers(spark):
    """One 1000× outlier wrecks mean/std z-scores but barely moves the
    median/MAD version — the property that justifies the operator."""
    from datetime import datetime

    from climate_data_pipeline_spark.operators.anomalies import (
        robust_zscore, zscore)

    rows = [(datetime(2024, 1, 1 + i % 28), float(10 + (i % 5))) for i in range(100)]
    rows.append((datetime(2024, 1, 15), 10000.0))  # contamination
    df = spark.createDataFrame(rows, "ts timestamp, v double")

    z = {r["v"]: r["zscore"] for r in zscore(df, "ts", "v").collect()}
    rz = {r["v"]: r["robust_z"] for r in robust_zscore(df, "ts", "v").collect()}

    # a clean typical reading: classic z crushed toward 0 by the inflated
    # std; robust z unaffected
    assert abs(z[14.0]) < 0.1          # distorted
    assert 0.5 < abs(rz[14.0]) < 2.5   # sane
    # the outlier itself: flagged extreme by both, but robust score is
    # orders of magnitude clearer
    assert rz[10000.0] > 100


def test_spells_gaps_and_islands(spark):
    """Known run structure: hits on days 1-3 and 5 → two spells (3, 1)."""
    from datetime import datetime

    rows = [(1, datetime(2024, 1, d, h), v)
            for d, h, v in [(1, 3, 80.0), (1, 9, 10.0), (2, 1, 70.0),
                            (3, 5, 90.0), (4, 2, 10.0), (5, 6, 65.0)]]
    rows += [(2, datetime(2024, 1, 1, 1), 10.0)]  # user 2: never hits
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, v double")

    sp = {(r["user_id"], r["spell_start"].day): r["spell_len"]
          for r in T.spells(df, "ts", F.col("v") > 60, ["user_id"]).collect()}
    assert sp == {(1, 1): 3, (1, 5): 1}

    summ = {r["user_id"]: (r["n_spells"], r["max_spell"], r["hit_buckets"])
            for r in T.spell_summary(df, "ts", F.col("v") > 60,
                                     ["user_id"]).collect()}
    assert summ == {1: (2, 3, 4)}  # user 2 absent: no hit days at all


def test_resample_interp_linear_and_flags(spark):
    """Obs at day 1 = 10 and day 4 = 40 → days 2, 3 interpolate to 20, 30."""
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12), 10.0), (1, datetime(2024, 1, 4, 3), 40.0)],
        "user_id long, ts timestamp, v double")
    out = {r["bucket"].day: (r["v"], r["observed"])
           for r in T.resample_interp(df, "ts", "v", ["user_id"]).collect()}
    assert out == {1: (10.0, True), 2: (20.0, False),
                   3: (30.0, False), 4: (40.0, True)}


def test_ewma_adjusted_weights(spark):
    """α=0.5 over [1,2,3]: y = 1, 5/3, 17/7 (normalized geometric weights)."""
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1 + i), float(v)) for i, v in enumerate([1, 2, 3])],
        "user_id long, ts timestamp, v double")
    out = sorted(r["ewma"] for r in
                 T.ewma(df, "ts", "v", ["user_id"], alpha=0.5).collect())
    assert out == pytest.approx([1.0, 5 / 3, 17 / 7])
    with pytest.raises(ValueError):
        T.ewma(df, "ts", "v", ["user_id"], alpha=0.0)


def test_doy_window_wraps_year_boundary(spark):
    """window=1: a Dec-31 (doy 365) obs pools into bins 364, 365 and 1."""
    from datetime import datetime

    df = spark.createDataFrame(
        [(datetime(2023, 12, 31), 7.0), (datetime(2024, 1, 1), 1.0)],
        "ts timestamp, v double")
    out = {r["doy_bin"]: r["p50"] for r in P.doy_window_percentiles(
        df, "ts", "v", percentiles=(50,), window=1).collect()}
    # doy 365 contributes to {364, 365, 1}; doy 1 to {365, 1, 2}
    assert set(out) == {364, 365, 1, 2}
    assert out[364] == 7.0 and out[2] == 1.0
    assert out[365] == 4.0 and out[1] == 4.0  # pooled median of {7, 1}


def test_weighted_mean_cos_lat_weights(spark, grid=None):
    """Area weighting on the synthetic grid: temperature peaks at the
    equator, so the cos(lat)-weighted global mean must exceed the flat
    mean (poles over-weighted in the naive average)."""
    from climate_data_pipeline_spark.operators.stats import weighted_mean
    from climate_data_pipeline_spark.sources.synthetic import climate_grid

    g = climate_grid(spark, start="2020-01-01", days=30)
    flat = g.agg(F.avg("temperature")).first()[0]
    w = weighted_mean(g, "temperature", F.cos(F.radians("lat"))).first()
    assert w["wmean"] > flat + 5  # equator-weighted, poles discounted
    assert w["n"] == 30 * 19 * 36


def test_harmonic_fit_recovers_seasonal_amplitude(grid):
    """The synthetic grid's seasonal term is 10·sin(2π(doy−80)/365) +
    N(0,2) noise: the closed-form harmonic fit must recover amplitude
    ≈ 10 and the latitude-independent intercept 288 − 40·|lat|/90 at
    each latitude band (noise SE over ~26k rows/band is ~0.02)."""
    from climate_data_pipeline_spark.operators.trends import harmonic_fit

    fit = harmonic_fit(grid, "ts", "temperature", ["lat"],
                       period_days=365.0).collect()
    assert len(fit) == 19
    for r in fit:
        assert abs(r["amplitude"] - 10.0) < 0.25, r
        expected_mean = 288.0 - 40.0 * abs(r["lat"]) / 90.0
        assert abs(r["intercept"] - expected_mean) < 0.25, r


def test_cusum_finds_injected_mean_shift(spark):
    """A series with a mean jump at index 60/100 must put the CUSUM peak
    at (or adjacent to) the shift with a large statistic; a flat series
    scores low."""
    from datetime import datetime, timedelta

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = datetime(2024, 1, 1)
    rows = []
    for i in range(100):
        rows.append(("shift", i, base + timedelta(hours=i),
                     10.0 + (5.0 if i >= 60 else 0.0) + (i % 3) * 0.01))
        rows.append(("flat", i, base + timedelta(hours=i),
                     10.0 + (i % 3) * 0.01))
    ev = spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double")
    wa = Window.partitionBy("event_type")
    wr = (Window.partitionBy("event_type").orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0))
    wi = Window.partitionBy("event_type").orderBy("ts", "event_id")
    st = (ev.withColumn("mu", F.avg("value").over(wa))
            .withColumn("sd", F.stddev_pop("value").over(wa))
            .withColumn("n", F.count("*").over(wa))
            .withColumn("stat", F.abs(
                F.sum(F.col("value") - F.col("mu")).over(wr))
                / (F.col("sd") * F.sqrt("n")))
            .withColumn("idx", F.row_number().over(wi)))
    pick = Window.partitionBy("event_type").orderBy(F.col("stat").desc())
    cp = {r["event_type"]: r for r in
          st.withColumn("r", F.row_number().over(pick))
            .where("r = 1").collect()}
    assert abs(cp["shift"]["idx"] - 60) <= 1
    assert cp["shift"]["stat"] > 3 * cp["flat"]["stat"]
