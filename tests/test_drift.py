"""Property tests for the drift operators (`operators/drift`)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.operators import drift as D
from climate_data_pipeline_spark.sources.io import load_table


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").cache()


def test_ks_self_comparison_is_zero(spark):
    """Splitting an identical duplicated sample → D == 0 exactly."""
    base = spark.range(1000).select((F.col("id") % 97).alias("v"))
    both = base.withColumn("lbl", F.lit(1)).union(
        base.withColumn("lbl", F.lit(0)))
    row = D.ks_statistic(both, "v", F.col("lbl") == 1).first()
    assert row["ks_d"] == 0.0
    assert row["n_ref"] == row["n_cur"] == 1000


def test_ks_disjoint_supports_is_one(spark):
    """Fully separated distributions → D == 1."""
    a = spark.range(100).select(F.col("id").alias("v"), F.lit(1).alias("lbl"))
    b = spark.range(100).select((F.col("id") + 1000).alias("v"),
                                F.lit(0).alias("lbl"))
    row = D.ks_statistic(a.union(b), "v", F.col("lbl") == 1).first()
    assert row["ks_d"] == 1.0


def test_ks_known_small_case(spark):
    """Hand-computed D: A={1,2,3,4}, B={3,4,5,6} → D = 0.5 at v=2."""
    rows = ([(v, 1) for v in (1, 2, 3, 4)] + [(v, 0) for v in (3, 4, 5, 6)])
    df = spark.createDataFrame(rows, "v int, lbl int")
    row = D.ks_statistic(df, "v", F.col("lbl") == 1).first()
    assert row["ks_d"] == pytest.approx(0.5)


def test_ks_bin_width_bounds_cardinality(lineitem):
    """Quantized KS stays within one bin of mass of the exact D."""
    cond = F.col("l_shipdate") < "1998-06-01"
    exact = D.ks_statistic(lineitem, "l_extendedprice", cond).first()["ks_d"]
    coarse = D.ks_statistic(lineitem, "l_extendedprice", cond,
                            bin_width=1000.0).first()["ks_d"]
    assert abs(coarse - exact) < 0.05


def test_psi_identical_halves_is_tiny(spark):
    """PSI of a sample against itself is exactly 0 (same bin fractions)."""
    base = spark.range(2000).select((F.col("id") % 211).alias("v"))
    both = base.withColumn("lbl", F.lit(1)).union(
        base.withColumn("lbl", F.lit(0)))
    psi = D.psi(both, "v", F.col("lbl") == 1).first()["psi"]
    assert psi == pytest.approx(0.0, abs=1e-12)


def test_psi_shift_detected(spark):
    """A hard location shift drives PSI far above the 0.25 alarm line."""
    a = spark.range(1000).select((F.col("id") % 100).alias("v"),
                                 F.lit(1).alias("lbl"))
    b = spark.range(1000).select((F.col("id") % 100 + 80).alias("v"),
                                 F.lit(0).alias("lbl"))
    psi = D.psi(a.union(b), "v", F.col("lbl") == 1).first()["psi"]
    assert psi > 0.25


def test_psi_bins_dense_spine(lineitem):
    """Every bin 0..9 present exactly once, fractions sum to ~1."""
    out = D.psi_bins(lineitem, "l_quantity",
                     F.col("l_shipdate") < "1998-06-01", n_bins=10).collect()
    assert sorted(r["bin"] for r in out) == list(range(10))
    assert math.fsum(r["frac_ref"] for r in out) == pytest.approx(1.0, abs=1e-4)


def test_chi2_homogeneous_split_is_small(spark):
    """A hash-based 50/50 split of one population → chi2 near 0 scale-wise
    (no association between split and category)."""
    df = spark.range(20000).select(
        (F.col("id") % 7).cast("string").alias("cat"),
        (F.crc32(F.col("id").cast("string")) % 2 == 0).alias("is_ref"))
    row = D.chi2_drift(df, "cat", F.col("is_ref")).first()
    assert row["dof"] == 6
    # 99.9th percentile of chi2(6) ≈ 22.5 — a homogeneous split stays under
    assert row["chi2"] < 22.5


def test_chi2_total_association_is_n(spark):
    """Category fully determined by sample → chi2 == N (max association
    for a 2×2 table)."""
    rows = [("x", 1)] * 50 + [("y", 0)] * 50
    df = spark.createDataFrame(rows, "cat string, lbl int")
    row = D.chi2_drift(df, "cat", F.col("lbl") == 1).first()
    assert row["chi2"] == pytest.approx(100.0)
    assert row["dof"] == 1


def test_drift_excludes_nulls(spark):
    """Regression: NULLs are missing data, not low-tail values — a 20%
    null rate in the current slice must not read as distribution
    drift at the bottom of the CDF / PSI bin 0."""
    from climate_data_pipeline_spark.operators import drift as D
    clean = [(float(i % 50), i < 500) for i in range(1000)]
    df = spark.createDataFrame(clean, "v double, is_ref boolean")
    nulls = spark.createDataFrame([(None, False)] * 200,
                                  "v double, is_ref boolean")
    d0 = D.ks_statistic(df, "v", F.col("is_ref")).first()
    d1 = D.ks_statistic(df.unionByName(nulls), "v",
                        F.col("is_ref")).first()
    assert abs(d0["ks_d"] - d1["ks_d"]) < 1e-12   # nulls changed nothing
    assert d1["n_cur"] == d0["n_cur"]              # and aren't counted
    p0 = {r["bin"]: r["n_cur"] for r in
          D.psi_bins(df, "v", F.col("is_ref")).collect()}
    p1 = {r["bin"]: r["n_cur"] for r in
          D.psi_bins(df.unionByName(nulls), "v",
                     F.col("is_ref")).collect()}
    assert p0 == p1
