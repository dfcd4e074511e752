"""Driver queries for the mergeable-histogram quantile sketch."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.histogram import histogram_quantile, histogram_partials, \
    sql_histogram_quantile
from ..registry import query
from ..sources.io import load_table

_LO, _HI, _BINS = 0.0, 500.0, 250
_QS = (0.5, 0.9, 0.99)


@query("hist_quantile_sketch", oracle=sql_histogram_quantile(
    "events", "value", ["event_type"], _QS, lo=_LO, hi=_HI, n_bins=_BINS))
def hist_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of events.value per event_type from a 250-bin
    mergeable histogram (error ≤ 2.0 on a 0-500 domain). The sketch
    path for 100 TB percentile maintenance: partials are
    n_groups × ≤n_bins rows, merge by addition, no sort of raw data —
    where exact `percentile` (a5) re-sorts everything per query."""
    e = load_table(spark, sf_dir, "events")
    hist = histogram_partials(e, "value", ["event_type"],
                              lo=_LO, hi=_HI, n_bins=_BINS)
    return histogram_quantile(hist, ["event_type"], _QS,
                              lo=_LO, hi=_HI, n_bins=_BINS)
