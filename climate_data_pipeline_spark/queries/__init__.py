"""Driver-facing query definitions, grouped by operator family.

Importing this package registers every query into ``registry.REGISTRY``.
"""

from . import (  # noqa: F401
    analytic_extra,
    anomalies,
    arrays_nulls,
    asof_q,
    behavioral,
    drift_q,
    histogram_q,
    interval_q,
    merge_q,
    packing_q,
    percentiles,
    plans_q,
    quality_q,
    relational,
    sampling_q,
    scale_q,
    similarity_mm,
    spatial_q,
    stats,
    stats_extra,
    temporal,
    text_dedup,
    tpch_like,
    tpch_like2,
    tpch_like3,
    trends,
    tsmodel,
)
