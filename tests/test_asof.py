"""As-of join vs pandas merge_asof (the third implementation — DuckDB
ASOF is the oracle, pandas is the semantics reference)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from climate_data_pipeline_spark.operators.asof import asof_join
from climate_data_pipeline_spark.sources.io import load_table


def _frames(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click") \
               .select("event_id", "user_id", "ts", "value")
    purch = ev.where(F.col("event_type") == "purchase") \
              .select("user_id", "ts", "value")
    return clicks, purch


def _pandas_asof(clicks, purch, tolerance=None):
    lc = clicks.toPandas().sort_values("ts")
    rc = purch.toPandas().sort_values("ts")
    kwargs = {"tolerance": tolerance} if tolerance is not None else {}
    return (pd.merge_asof(lc, rc, on="ts", by="user_id",
                          direction="backward", suffixes=("", "_purchase"),
                          **kwargs)
            .sort_values("event_id").reset_index(drop=True))


def test_asof_matches_pandas(spark, sf_dir):
    clicks, purch = _frames(spark, sf_dir)
    got = (asof_join(clicks, purch, on="ts", by=["user_id"],
                     right_cols=["value"], suffix="_purchase")
           .toPandas().sort_values("event_id").reset_index(drop=True))
    want = _pandas_asof(clicks, purch)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(got["value_purchase"],
                                   want["value_purchase"],
                                   check_names=False)


def test_asof_tolerance(spark, sf_dir):
    clicks, purch = _frames(spark, sf_dir)
    hour_us = 3_600_000_000
    got = (asof_join(clicks, purch, on="ts", by=["user_id"],
                     right_cols=["value"], suffix="_purchase",
                     tolerance_us=hour_us)
           .toPandas().sort_values("event_id").reset_index(drop=True))
    want = _pandas_asof(clicks, purch, tolerance=pd.Timedelta(hours=1))
    pd.testing.assert_series_equal(got["value_purchase"],
                                   want["value_purchase"],
                                   check_names=False)
    # tolerance must strictly reduce matches
    full = _pandas_asof(clicks, purch)
    assert (got["value_purchase"].notna().sum()
            < full["value_purchase"].notna().sum())


def test_asof_inclusive_same_timestamp(spark):
    left = spark.createDataFrame(
        [(1, 100, "2024-01-01 00:00:10", 1.0)],
        "event_id long, user_id long, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(100, "2024-01-01 00:00:10", 9.0),
         (100, "2024-01-01 00:00:05", 5.0)],
        "user_id long, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join(left, right, on="ts", by=["user_id"],
                    right_cols=["value"]).collect()
    assert out[0]["value_right"] == 9.0  # inclusive: equal ts matches
