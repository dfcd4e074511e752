"""Partition-invariance guards: results of FP-sensitive queries must be
BIT-identical under different shuffle-partition counts — the property
that keeps the DuckDB oracle hashes stable under driver sample rotation
(full 179-oracle sweeps verified at shuffle partitions 1/7/32; this test
locks the cheapest regression signal into CI)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from climate_data_pipeline_spark import registry

registry._load_all()

# queries whose outputs pass through float aggregation / windows —
# the class where summation order can leak into rounded values
SENSITIVE = [
    "seasonal_decompose",     # cascaded window averages (flaked once in r1)
    "w2_zscore",              # whole-partition avg/stddev window
    "w2_robust_zscore",       # grouped exact percentiles + join
    "a11_pricing_summary",    # scaled-long exact sums (the discipline)
    "twap_user_value",        # time-weighted averages
    "drift_psi",              # ratio-of-count aggregates
    "harmonic_seasonal_fit",  # closed-form OLS from co-moments
    "sim_cosine_pairs",       # Arrow cosine kernel + banded join
    "sim_quantized_topk",     # quantized shortlist + exact rerank (r2)
    "dedup_incremental",      # minhash estimate max aggregation (r2)
    "corpus_source_report",   # exact-avg quality + dup-rate ratios (r2)
    "text_segment_dedup",     # min-struct first occurrence + reassembly (r2)
    "emb_label_centroids",    # float avg rounded — sum-order absorption (r2)
    "emb_centroid_classify",  # centroid build + argmax assignment (r2)
    "forecast_baseline_eval", # micro-unit tie rounding (r2)
    "a9_seasonal_mann_kendall",  # Σ of /18 rationals — rounded (r2)
    "sim_cosine_topk_many",   # per-partition local top-k merge (r2)
    "text_perplexity",        # micro-nat exact log-prob sums (r2 session)
    "lang_temperature_weights",  # p^α on round-9 shares, nano-int Z (r2)
    "text_zipf_slope",        # regr co-moments over doubles, rounded (r2)
    "emb_centroid_outliers",  # centroid build + rank cut (r2 session)
    "incremental_cdc_refresh",   # signed scaled-int IVM state (r2)
    "stream_rollup_parity",   # streaming exact-sum rollup (r10): the
                              # scaled-long accumulation must be both
                              # partition- AND micro-batch-order free
]


def _canon(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[ns]")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray))
                else v)
    pdf = pdf.sort_values(by=list(pdf.columns),
                          na_position="last").reset_index(drop=True)
    return hashlib.sha256(
        pdf.to_csv(index=False, float_format="%.17g").encode()
    ).hexdigest()


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_identical_across_partitionings(spark, sf_small, name):
    fn = registry.REGISTRY[name].fn
    baseline = None
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("2", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            h = _canon(fn(spark, sf_small).toPandas())
            if baseline is None:
                baseline = h
            else:
                assert h == baseline, (name, parts)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
