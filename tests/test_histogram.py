"""Mergeable-histogram quantile sketch: error bound, monoid merge,
edge clamping, and state-size guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.operators.histogram import (
    histogram_partials,
    histogram_quantile,
    merge_histogram_partials,
)
from climate_data_pipeline_spark.sources.io import load_table

LO, HI, BINS = 0.0, 500.0, 250
QS = [0.5, 0.9, 0.99]


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _quant(hist):
    return histogram_quantile(hist, ["event_type"], QS,
                              lo=LO, hi=HI, n_bins=BINS)


def test_error_bounded_by_bin_width(spark, events):
    hist = histogram_partials(events, "value", ["event_type"],
                              lo=LO, hi=HI, n_bins=BINS)
    got = {(r["event_type"], r["q"]): r["value"]
           for r in _quant(hist).collect()}
    exact = {r["event_type"]: r["ps"] for r in events.groupBy("event_type")
             .agg(F.expr(f"percentile(value, array({','.join(map(str, QS))}))")
                  .alias("ps")).collect()}
    width = (HI - LO) / BINS
    for (etype, q), v in got.items():
        assert abs(v - exact[etype][QS.index(q)]) <= width


def test_merge_equals_full_recompute(events):
    halves = [events.where(F.col("event_id") % 2 == i) for i in (0, 1)]
    parts = [histogram_partials(h, "value", ["event_type"],
                                lo=LO, hi=HI, n_bins=BINS) for h in halves]
    merged = sorted(map(tuple, _quant(merge_histogram_partials(*parts)).collect()))
    full = sorted(map(tuple, _quant(
        histogram_partials(events, "value", ["event_type"],
                           lo=LO, hi=HI, n_bins=BINS)).collect()))
    assert merged == full


def test_state_size_bounded(events):
    hist = histogram_partials(events, "value", ["event_type"],
                              lo=LO, hi=HI, n_bins=BINS)
    n_groups = events.select("event_type").distinct().count()
    assert hist.count() <= n_groups * BINS


def test_out_of_range_values_clamp_to_edge_bins(spark):
    df = spark.createDataFrame(
        [("a", -50.0), ("a", 1e9), ("a", 5.0)], "k string, v double")
    hist = histogram_partials(df, "v", ["k"], lo=0.0, hi=10.0, n_bins=10)
    bins = {r["bin"]: r["cnt"] for r in hist.collect()}
    assert bins == {0: 1, 9: 1, 5: 1}


def test_rejects_bad_quantiles(events):
    hist = histogram_partials(events, "value", ["event_type"],
                              lo=LO, hi=HI, n_bins=BINS)
    with pytest.raises(ValueError):
        histogram_quantile(hist, ["event_type"], [0.0, 0.5],
                           lo=LO, hi=HI, n_bins=BINS)


def test_histogram_partials_exclude_nulls(spark):
    """Regression: NULL values used to land in bin 0 (greatest/least
    skip nulls), inflating the lowest bin and skewing quantiles."""
    from climate_data_pipeline_spark.operators.histogram import (
        histogram_partials,
    )
    df = spark.createDataFrame(
        [("a", 50.0), ("a", None), ("a", None)], "k string, v double")
    parts = histogram_partials(df, "v", ["k"], lo=0.0, hi=100.0, n_bins=10)
    got = {r["bin"]: r["cnt"] for r in parts.collect()}
    assert got == {5: 1}                       # nulls contribute nothing
