"""Metric dispatcher (SURVEY.md §2.10 O5) — the engine-API equivalent of
the reference's Celery `compute_metrics_task` dispatch table
(`/root/reference/src/climate_pipeline/tasks/celery_tasks.py:84-157`,
metric_type → function at lines 118-141).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..operators import anomalies, percentiles, stats, temporal, trends

_DISPATCH = {
    "monthly_mean": lambda df, t, v, k, p: temporal.monthly_mean(df, t, v, k),
    "seasonal_mean": lambda df, t, v, k, p: temporal.seasonal_mean(df, t, v, k),
    "annual_mean": lambda df, t, v, k, p: temporal.annual_mean(df, t, v, k),
    "climatology": lambda df, t, v, k, p: temporal.climatology(
        df, t, v, k, groupby=p.get("groupby", "month"),
        reference_period=p.get("reference_period")),
    "rolling_mean": lambda df, t, v, k, p: temporal.rolling_mean(
        df, t, v, k, window=p.get("window", 5),
        center=p.get("center", True), min_periods=p.get("min_periods")),
    "percentiles": lambda df, t, v, k, p: percentiles.grouped_percentiles(
        df, t, v, k, percentiles=tuple(p.get("percentiles",
                                             percentiles.DEFAULT_PERCENTILES)),
        groupby=p.get("groupby", "month"),
        reference_period=p.get("reference_period"),
        exact=p.get("exact", True)),
    "exceedance": lambda df, t, v, k, p: percentiles.exceedance_frequency(
        df, t, v, k, percentile=p.get("percentile", 90),
        reference_period=p.get("reference_period")),
    "return_periods": lambda df, t, v, k, p: percentiles.return_periods(
        df, t, v, k, periods=tuple(p.get("periods", (2, 5, 10, 25, 50, 100)))),
    "anomaly": lambda df, t, v, k, p: anomalies.anomaly(
        df, t, v, k, groupby=p.get("groupby", "month"),
        reference_period=p.get("reference_period")),
    "zscore": lambda df, t, v, k, p: anomalies.zscore(
        df, t, v, k, groupby=p.get("groupby", "month"),
        method=p.get("method", "join")),
    "trend": lambda df, t, v, k, p: trends.linear_trend(
        df, t, v, k, t0=p.get("t0", "1995-01-01")),
    "trend_confidence": lambda df, t, v, k, p: trends.trend_with_confidence(
        df, t, v, k, t0=p.get("t0", "1995-01-01"),
        confidence=p.get("confidence", 0.95)),
    "mann_kendall": lambda df, t, v, k, p: trends.mann_kendall(
        df, t, v, k, alpha=p.get("alpha", 0.05)),
    "global_stats": lambda df, t, v, k, p: stats.global_stats(
        df, v, percentiles=tuple(p.get("percentiles", (5, 95)))),
}

METRIC_TYPES = tuple(sorted(_DISPATCH))


def run_metric(df: DataFrame, metric_type: str, time_col: str,
               value_col: str, keys: Sequence[str] = (),
               params: dict | None = None) -> DataFrame:
    """Dispatch a metric by name — the serving layer's single entry point
    (each REST endpoint in the reference maps to one metric_type)."""
    if metric_type not in _DISPATCH:
        raise ValueError(f"unknown metric_type {metric_type!r}; "
                         f"expected one of {METRIC_TYPES}")
    return _DISPATCH[metric_type](df, time_col, value_col, list(keys),
                                  params or {})
