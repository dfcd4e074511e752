"""Property-style checks on metric operators — the reference's assertion
strategy (SURVEY.md §5): statistical invariants, not golden values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.operators import (
    anomalies as A,
    percentiles as P,
    stats as S,
    temporal as T,
    trends as TR,
)
from climate_data_pipeline_spark.sources.io import load_table


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").cache()


def test_monthly_groups_span_years(lineitem):
    out = T.monthly_mean(lineitem, "l_shipdate", "l_quantity")
    months = out.count()
    assert 70 <= months <= 90  # ~80 months in 1995-2001


def test_monthly_mean_smooths(spark, lineitem):
    daily_var = lineitem.agg(F.var_samp("l_quantity")).first()[0]
    monthly = T.monthly_mean(lineitem, "l_shipdate", "l_quantity")
    monthly_var = monthly.agg(F.var_samp("avg_value")).first()[0]
    assert monthly_var < daily_var  # aggregation reduces variance


def test_seasonal_labels(lineitem):
    out = T.seasonal_mean(lineitem, "l_shipdate", "l_quantity")
    labels = {r["season"] for r in out.select("season").distinct().collect()}
    assert labels == {"DJF", "MAM", "JJA", "SON"}


def test_climatology_has_12_months(lineitem):
    out = T.climatology(lineitem, "l_shipdate", "l_quantity", groupby="month")
    assert out.count() == 12


def test_rolling_mean_min_periods(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = T.rolling_mean(ev, "ts", "value", keys=["user_id"], window=7,
                         center=True, order_cols=["ts", "event_id"])
    # rolling mean exists and smooths: var(rolling) < var(raw)
    raw_var, roll_var = (out.agg(F.var_samp("value"),
                                 F.var_samp("rolling_mean")).first())
    assert roll_var < raw_var


def test_anomaly_mean_near_zero(lineitem):
    out = A.anomaly(lineitem, "l_shipdate", "l_quantity", keys=["l_returnflag"])
    m = out.agg(F.avg("anomaly")).first()[0]
    assert abs(m) < 1e-9  # exact-mean climatology → anomalies sum to ~0


def test_zscore_standardized(lineitem):
    out = A.zscore(lineitem, "l_shipdate", "l_quantity", keys=["l_returnflag"])
    mean, std = out.agg(F.avg("zscore"), F.stddev_samp("zscore")).first()
    assert abs(mean) < 0.01 and abs(std - 1.0) < 0.01


def test_zscore_window_equals_join(lineitem):
    # (l_orderkey, l_linenumber) is NOT unique in the driver's synthetic
    # data, so compare the full sorted value vectors instead of joining.
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "zscore"]
    j = (A.zscore(lineitem, "l_shipdate", "l_quantity", keys=["l_returnflag"],
                  method="join").select(cols).toPandas()
         .sort_values(cols).reset_index(drop=True))
    w = (A.zscore(lineitem, "l_shipdate", "l_quantity", keys=["l_returnflag"],
                  method="window").select(cols).toPandas()
         .sort_values(cols).reset_index(drop=True))
    assert (j["zscore"] - w["zscore"]).abs().max() < 1e-9


def test_severity_bounded_both_signs(lineitem):
    z = A.zscore(lineitem, "l_shipdate", "l_quantity", keys=["l_returnflag"])
    sev = A.severity(z, "zscore")
    lo, hi = sev.agg(F.min("severity"), F.max("severity")).first()
    assert -3 <= lo < 0 < hi <= 3


def test_percentile_ordering(lineitem):
    wide = P.grouped_percentiles(lineitem, "l_shipdate", "l_quantity",
                                 keys=["l_returnflag"], long_format=False)
    bad = wide.where((F.col("p10") > F.col("p50"))
                     | (F.col("p50") > F.col("p90"))).count()
    assert bad == 0


def test_exceedance_near_10pct(lineitem):
    out = P.exceedance_frequency(lineitem, "l_shipdate", "l_quantity",
                                 keys=["l_returnflag"], percentile=90)
    for r in out.collect():
        assert 0.05 < r["exceedance_freq"] < 0.20


def test_return_period_monotonic(lineitem):
    out = P.return_periods(lineitem, "l_shipdate", "l_extendedprice",
                           keys=["l_returnflag"]).toPandas()
    for _flag, g in out.groupby("l_returnflag"):
        vals = g.sort_values("return_period")["value"].tolist()
        assert vals == sorted(vals)  # longer return period → larger value


def test_mann_kendall_shape(spark, lineitem):
    monthly = T.monthly_mean(lineitem, "l_shipdate", "l_quantity",
                             keys=["l_returnflag"], alias="avg_qty")
    out = TR.mann_kendall(monthly, "month_start", "avg_qty",
                          keys=["l_returnflag"]).toPandas()
    assert set(out.columns) >= {"s_stat", "var_s", "z", "p_value",
                                "significant", "sen_slope", "n"}
    assert (out["p_value"].between(0, 1)).all()
    assert (out["n"] > 12).all()


def test_trend_margin_positive(lineitem):
    out = TR.trend_with_confidence(lineitem, "l_shipdate", "l_quantity",
                                   keys=["l_returnflag"]).toPandas()
    assert (out["std_err"] > 0).all()
    assert (out["margin"] > out["std_err"] * 1.9).all()  # t_crit ≈ 1.96


def test_dataset_info(spark, lineitem):
    info = S.dataset_info(lineitem, time_col="l_shipdate",
                          extent_cols=["l_quantity"])
    assert info["num_rows"] > 0
    assert info["time_range"]["start"].year == 1995
    assert info["extent"]["l_quantity"][0] >= 1


def test_detect_time_column(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert S.detect_time_column(ev) == "ts"
    li = load_table(spark, sf_dir, "lineitem")
    assert S.detect_time_column(li) == "l_shipdate"


def test_normal_sf_approx_matches_erfc(spark):
    import math
    from climate_data_pipeline_spark.functions import scalars as SC
    from pyspark.sql import functions as F
    zs = [0.0, 0.5, 1.0, 1.64, 1.96, 2.58, 4.0, -2.0]
    df = spark.createDataFrame([(z,) for z in zs], ["z"])
    got = {r["z"]: r["p"] for r in
           df.select("z", SC.normal_sf_two_sided("z").alias("p")).collect()}
    for z in zs:
        exact = math.erfc(abs(z) / math.sqrt(2))
        assert abs(got[z] - exact) < 1.5e-7, (z, got[z], exact)


def test_grouped_percentiles_keeps_p_prefixed_keys(spark):
    """Regression: long_format must drop exactly the percentile
    columns, not every column starting with 'p' (a key named plant_id
    used to vanish, merging rows across plants)."""
    df = spark.createDataFrame(
        [("2020-01-05", "pA", 1.0), ("2020-01-06", "pA", 3.0),
         ("2020-01-05", "pB", 10.0)],
        ["ts", "plant_id", "v"]).withColumn("ts", F.to_timestamp("ts"))
    out = P.grouped_percentiles(df, "ts", "v", keys=["plant_id"],
                                percentiles=(50,), long_format=True)
    assert "plant_id" in out.columns
    got = {r["plant_id"]: r["threshold"] for r in out.collect()}
    assert got["pA"] == 2.0 and got["pB"] == 10.0


def test_severity_and_rank_null_safe(spark):
    """Regression: NULL z-scores stay NULL (not 'extreme_high'), and a
    value outside the reference months ranks NULL (not 10th pct)."""
    from climate_data_pipeline_spark.functions import scalars as SC
    df = spark.createDataFrame([(None,), (2.5,)], "z double")
    got = {r["z"]: (r["sev"], r["lbl"]) for r in df.select(
        "z", SC.severity_from_z("z").alias("sev"),
        SC.anomaly_label(SC.severity_from_z("z")).alias("lbl")).collect()}
    assert got[None] == (None, None) and got[2.5] == (3, "extreme_high")
    obs = spark.createDataFrame(
        [("2020-06-01", 1.0), ("2020-06-02", 2.0), ("2020-06-03", 3.0),
         ("2020-01-15", 2.0)], ["ts", "v"]) \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {r["month"]: r["percentile_rank"] for r in A.percentile_rank(
        obs, "ts", "v", percentiles=(25, 75),
        reference_period=("2020-06-01", "2020-06-30")).collect()}
    assert out[1] is None            # January has no reference curve
    assert out[6] is not None


def test_doy_window_bins_are_calendar_stable_across_leap(spark):
    """Regression: Mar 1 must land in the SAME bin (60) in leap and
    non-leap years; Feb 29 merges into Feb 28's bin (59)."""
    df = spark.createDataFrame(
        [("2023-03-01", 1.0), ("2024-03-01", 2.0), ("2024-02-29", 3.0),
         ("2024-02-28", 4.0), ("2024-12-31", 5.0), ("2023-12-31", 6.0)],
        ["ts", "v"]).withColumn("ts", F.to_timestamp("ts"))
    out = P.doy_window_percentiles(df, "ts", "v", percentiles=(50,),
                                   window=0)
    binned = {r["doy_bin"]: float(r["p50"]) for r in out.collect()}
    # pooled medians prove co-binning: Mar 1 of both years -> bin 60,
    # Feb 29 folds into Feb 28's bin 59, Dec 31 of both years -> 365
    assert binned == {60: 1.5, 59: 3.5, 365: 5.5}


def test_mann_kendall_ignores_nulls(spark):
    """Regression: one NULL must not poison the series — the test runs
    on the valid points (reference filters NaN; min length 4)."""
    rows = [("2020-%02d-01" % m, float(m)) for m in range(1, 11)]
    clean = spark.createDataFrame(rows, ["ts", "v"]) \
        .withColumn("ts", F.to_timestamp("ts")).withColumn("k", F.lit("a"))
    dirty = clean.unionByName(
        spark.createDataFrame([("2020-11-01", None)], "ts string, v double")
        .withColumn("ts", F.to_timestamp("ts")).withColumn("k", F.lit("a")))
    want = TR.mann_kendall(clean, "ts", "v", ["k"]).first()
    got = TR.mann_kendall(dirty, "ts", "v", ["k"]).first()
    assert got["n"] == want["n"] == 10
    assert got["s_stat"] == want["s_stat"] and got["z"] == want["z"]
    assert got["significant"] and got["sen_slope"] == want["sen_slope"]
    # short valid series (n < 4) -> the no-trend NaN result
    short = spark.createDataFrame(
        [("2020-01-01", 1.0), ("2020-02-01", 2.0), ("2020-03-01", 3.0)],
        ["ts", "v"]).withColumn("ts", F.to_timestamp("ts")) \
        .withColumn("k", F.lit("a"))
    r = TR.mann_kendall(short, "ts", "v", ["k"]).first()
    assert r["n"] == 3 and not r["significant"]


def test_normal_quantile_tail_branch():
    from climate_data_pipeline_spark.operators.trends import (
        _normal_quantile,
    )
    assert abs(_normal_quantile(0.9995) - 3.29052673) < 1e-6
    assert abs(_normal_quantile(0.0005) + 3.29052673) < 1e-6
    assert abs(_normal_quantile(0.6) - 0.25334710) < 1e-6


def test_spells_span_the_epoch(spark):
    """Regression: daily bucket ordinals must FLOOR, not truncate —
    a spell crossing 1970-01-01 (or any pre-epoch data) used to split
    because two days shared ordinal 0."""
    days = ["1969-12-30", "1969-12-31", "1970-01-01", "1970-01-02"]
    df = spark.createDataFrame([(d, 1.0) for d in days], ["ts", "v"]) \
        .withColumn("ts", F.to_timestamp("ts")).withColumn("k", F.lit("a"))
    out = T.spells(df, "ts", F.col("v") > 0, ["k"]).collect()
    assert len(out) == 1 and out[0]["spell_len"] == 4


def test_registry_rejects_duplicate_names():
    import pytest as _pt

    from climate_data_pipeline_spark import registry as R

    @R.query("__dup_probe__")
    def _one(spark, sf):          # pragma: no cover - registration only
        return None

    try:
        with _pt.raises(ValueError, match="duplicate query name"):
            @R.query("__dup_probe__")
            def _two(spark, sf):  # pragma: no cover
                return None
    finally:
        R.REGISTRY.pop("__dup_probe__", None)


def test_bench_percentile_nearest_rank():
    """Regression: int(q*n) overshot nearest-rank by one, making
    p95 == p99 == max at n=3 and p95 == the 100th pct at n=20."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    xs20 = list(range(1, 21))
    assert bench.percentile(xs20, 0.95) == 19     # not 20 (the max)
    assert bench.percentile([1.0, 2.0, 3.0], 0.95) == 3.0
    assert bench.percentile([1.0, 2.0, 3.0], 0.5) == 2.0


def test_climate_grid_noise_partition_invariant(spark):
    """Regression: seeded noise must be a pure function of the row id —
    F.randn/F.rand depend on the partition index, so the same seed on
    different core counts produced different data."""
    from climate_data_pipeline_spark.sources.synthetic import climate_grid

    a = climate_grid(spark, days=3).coalesce(1) \
        .orderBy("ts", "lat", "lon").collect()
    b = climate_grid(spark, days=3).repartition(7) \
        .orderBy("ts", "lat", "lon").collect()
    assert a == b
