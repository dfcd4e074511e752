"""Binned interval joins: equivalence to the naive theta join, the
exactly-once pair guarantee, and the no-nested-loop plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark import registry
from climate_data_pipeline_spark.operators.interval import (
    interval_overlap_join,
    point_in_interval_join,
)

registry._load_all()


@pytest.fixture(scope="module")
def points(spark):
    # deterministic pseudo-random-ish values, including bin-boundary hits
    return (spark.range(500)
            .select(F.col("id").alias("pid"),
                    ((F.col("id") * 37) % 997).cast("double").alias("v"))
            .cache())


@pytest.fixture(scope="module")
def intervals(spark):
    # variable-length intervals incl. zero-length and bin-spanning ones
    return (spark.range(80)
            .select(F.col("id").alias("iid"),
                    ((F.col("id") * 61) % 900).cast("double").alias("lo"),
                    (((F.col("id") * 61) % 900)
                     + (F.col("id") * 13) % 120).cast("double").alias("hi"))
            .cache())


def _pairs(df, a="pid", b="iid"):
    return {(r[a], r[b]) for r in df.select(a, b).collect()}


@pytest.mark.parametrize("width", [1.0, 7.5, 64.0, 1000.0])
def test_point_in_interval_matches_naive(points, intervals, width):
    naive = points.join(
        intervals, points.v.between(intervals.lo, intervals.hi))
    binned = point_in_interval_join(points, intervals, "v", "lo", "hi",
                                    bin_width=width)
    assert _pairs(binned) == _pairs(naive)
    assert binned.count() == len(_pairs(binned))  # exactly-once


@pytest.mark.parametrize("width", [5.0, 64.0, 500.0])
def test_overlap_matches_naive_exactly_once(spark, intervals, width):
    left = intervals.select(F.col("iid").alias("lid"),
                            F.col("lo").alias("ls"),
                            F.col("hi").alias("le"))
    right = intervals.select(F.col("iid").alias("rid"),
                             F.col("lo").alias("rs"),
                             F.col("hi").alias("re"))
    naive = left.join(right, (F.col("ls") <= F.col("re"))
                      & (F.col("rs") <= F.col("le")))
    binned = interval_overlap_join(left, right, "ls", "le", "rs", "re",
                                   bin_width=width)
    assert _pairs(binned, "lid", "rid") == _pairs(naive, "lid", "rid")
    # first-shared-bin rule: every qualifying pair appears exactly once
    assert binned.count() == naive.count()


def test_rejects_bad_bin_width(points, intervals):
    with pytest.raises(ValueError):
        point_in_interval_join(points, intervals, "v", "lo", "hi", 0)
    with pytest.raises(ValueError):
        interval_overlap_join(points, points, "v", "v", "v", "v", -1)


def test_binned_plans_avoid_nested_loops(spark, sf_dir):
    for name in ("interval_point_band_join", "interval_overlap_pairs"):
        plan = (registry.REGISTRY[name].fn(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_point_in_interval_left_join_keeps_unmatched(spark):
    """Regression: how='left' must keep points with no interval (the
    residual .where used to null-filter them away, degrading to inner);
    semi/anti must not crash on unresolvable columns."""
    from climate_data_pipeline_spark.operators.interval import (
        point_in_interval_join,
    )
    pts = spark.createDataFrame([(1, 5.0), (2, 99.0)], ["pid", "p"])
    iv = spark.createDataFrame([(10, 0.0, 10.0)], ["iid", "s", "e"])
    left = point_in_interval_join(pts, iv, "p", "s", "e", 5.0, how="left")
    rows = {r["pid"]: r["iid"] for r in left.collect()}
    assert rows == {1: 10, 2: None}            # unmatched point kept
    semi = point_in_interval_join(pts, iv, "p", "s", "e", 5.0,
                                  how="left_semi")
    assert [r["pid"] for r in semi.collect()] == [1]
    anti = point_in_interval_join(pts, iv, "p", "s", "e", 5.0,
                                  how="left_anti")
    assert [r["pid"] for r in anti.collect()] == [2]
