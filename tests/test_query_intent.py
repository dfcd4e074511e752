"""Intent-pinning tests for query semantics the oracle parity gate
cannot catch: engine and SQL oracle are hash-verified EQUAL, so a
metric where both implement the same wrong thing stays green. These
tests pin the *meaning* on hand-built fixtures where the right answer
is computable by hand (calendar windows across gaps, density-invariant
degree days, undefined-vs-zero intensity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import climate_data_pipeline_spark.queries  # noqa: F401 — registers
from climate_data_pipeline_spark.registry import REGISTRY


def _events_dir(spark, tmp_path, rows):
    """Write a minimal events table as an sf-dir the registry fns read.
    rows: (event_id, ts_str, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(i, t, u, et, v, "{}") for (i, t, u, et, v) in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string") \
        .withColumn("ts", F.to_timestamp("ts"))
    d = tmp_path / "sf_intent"
    d.mkdir(exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_rx5day_is_calendar_not_row_window(spark, tmp_path):
    """Days 1,2,3 then a gap to days 10,11 (value 1 each): a 5-OBSERVED-
    day frame would report 5.0 spanning 11 calendar days; the true
    5-calendar-day max is 3.0."""
    rows = [(i, f"2020-01-{d:02d} 12:00:00", 1, "view", 1.0)
            for i, d in enumerate([1, 2, 3, 10, 11])]
    sf = _events_dir(spark, tmp_path, rows)
    r = {x["user_id"]: x["rx5day"]
         for x in REGISTRY["etccdi_rx5day"].fn(spark, sf).collect()}
    assert r[1] == 3.0


def test_forecast_baselines_are_calendar_keyed(spark, tmp_path):
    """With one missing day in the training span, the seasonal-naive
    prediction for a holdout day must still be the value from exactly
    7 calendar days earlier — a row-offset lag would slip a weekday."""
    days = [d for d in range(1, 21) if d != 4]      # day 4 missing
    rows = [(d, f"2020-01-{d:02d} 12:00:00", 1, "view", float(d))
            for d in days]
    sf = _events_dir(spark, tmp_path, rows)
    out = REGISTRY["forecast_baseline_eval"].fn(spark, sf).first()
    # value(d) = d, so snaive error = 7 and naive error = 1 for EVERY
    # calendar-keyed holdout day; any row-slip makes an error of 8/2
    assert out["mae_seasonal_naive"] == 7.0
    assert out["mae_naive"] == 1.0


def test_degree_days_density_invariant(spark, tmp_path):
    """24 readings of 20.0 on day 1 and one reading of 20.0 on day 2
    must yield cooling_dd = 2 days x 10 = 20, not 250."""
    rows = [(h, f"2020-01-01 {h:02d}:00:00", 1, "view", 20.0)
            for h in range(24)]
    rows.append((99, "2020-01-02 12:00:00", 1, "view", 20.0))
    sf = _events_dir(spark, tmp_path, rows)
    out = REGISTRY["degree_days"].fn(spark, sf).first()
    assert out["cooling_dd"] == 20.0
    assert out["heating_dd"] == 0.0
    assert out["n_obs"] == 25


def test_sdii_null_when_no_wet_days(spark, tmp_path):
    """An entity whose daily sums never cross the wet threshold has an
    UNDEFINED intensity — sdii must be NULL, not a fake 0."""
    rows = [(i, f"2020-01-{i + 1:02d} 12:00:00", 1, "view", 1.0)
            for i in range(3)]
    sf = _events_dir(spark, tmp_path, rows)
    out = REGISTRY["etccdi_dtr_sdii"].fn(spark, sf).first()
    assert out["n_wet_days"] == 0 and out["sdii"] is None


def test_seasonal_decompose_trend_is_calendar_bounded(spark, tmp_path):
    """The centered 7-day trend must only average days within +/-3
    CALENDAR days — a ROWS frame would pull values across the gap."""
    days = [1, 2, 3, 4, 15, 16, 17, 18]             # two clusters
    rows = [(d, f"2020-01-{d:02d} 12:00:00", 1, "view",
             100.0 if d >= 15 else 1.0) for d in days]
    sf = _events_dir(spark, tmp_path, rows)
    out = {str(r["d"])[:10]: r["trend"] for r in
           REGISTRY["seasonal_decompose"].fn(spark, sf).collect()}
    # day 4's window [1..7] sees only the 1.0 cluster; a ROWS frame
    # would mix in 100.0 values from the far cluster
    assert out["2020-01-04"] == 1.0
    assert out["2020-01-15"] == 100.0
