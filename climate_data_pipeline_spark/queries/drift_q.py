"""Distribution-drift queries (`operators/drift`): KS, PSI, chi-square.

The "reference vs current" split is the ship-date midpoint (1998-06-01) — the exact
situation a training pipeline hits when a new crawl slice arrives and
must be compared against the slice already in the mix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import drift as D
from ..registry import query
from ..sources.io import load_table

_REF = "l_shipdate < TIMESTAMP '1998-06-01'"


@query("drift_ks", oracle=f"""
WITH pv AS (
  SELECT l_returnflag AS k, l_extendedprice AS v,
         sum(CASE WHEN {_REF} THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN {_REF} THEN 0 ELSE 1 END) AS cb
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2
), cum AS (
  SELECT k,
         CAST(sum(ca) OVER (PARTITION BY k ORDER BY v) AS DOUBLE)
           / sum(ca) OVER (PARTITION BY k) AS fa,
         CAST(sum(cb) OVER (PARTITION BY k ORDER BY v) AS DOUBLE)
           / sum(cb) OVER (PARTITION BY k) AS fb,
         sum(ca) OVER (PARTITION BY k) AS na,
         sum(cb) OVER (PARTITION BY k) AS nb
  FROM pv
)
SELECT k AS l_returnflag, round(max(abs(fa - fb)), 6) AS ks_d,
       CAST(max(na) AS BIGINT) AS n_ref, CAST(max(nb) AS BIGINT) AS n_cur
FROM cum GROUP BY 1
""")
def drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group two-sample KS statistic (`operators/drift.ks_statistic`)
    comparing pre-/post-midpoint price distributions: distinct-value
    pre-agg, per-key cumulative-CDF window, max gap. The oracle rebuilds
    the same right-continuous CDF walk."""
    li = load_table(spark, sf_dir, "lineitem")
    out = D.ks_statistic(li, "l_extendedprice",
                         F.col("l_shipdate") < "1998-06-01",
                         keys=["l_returnflag"])
    return out.select("l_returnflag", F.round("ks_d", 6).alias("ks_d"),
                      "n_ref", "n_cur")


@query("drift_psi", oracle=f"""
WITH ab AS (
  SELECT l_quantity AS v, CASE WHEN {_REF} THEN 1 ELSE 0 END AS ir
  FROM lineitem WHERE l_quantity IS NOT NULL
), bp AS (
  SELECT unnest(quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]))
         AS b
  FROM ab WHERE ir = 1
), binned AS (
  SELECT (SELECT count(*) FROM bp WHERE ab.v > bp.b) AS bin, ir FROM ab
), counts AS (
  SELECT bin, sum(ir) AS nr, sum(1 - ir) AS nc FROM binned GROUP BY 1
), dense AS (
  SELECT gs.bin, coalesce(nr, 0) AS n_ref, coalesce(nc, 0) AS n_cur
  FROM (SELECT unnest(range(10)) AS bin) gs LEFT JOIN counts ON gs.bin = counts.bin
), tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM dense)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       round(greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6), 6) AS frac_ref,
       round(greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6), 6) AS frac_cur,
       round((greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)
              - greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6))
             * ln(greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6)
                  / greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6)), 6) AS psi_contrib
FROM dense, tot
""")
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin PSI breakdown (`operators/drift.psi_bins`) over
    reference-decile bins of quantity. Integer-valued quantities make
    the decile breakpoints exact in both engines (interpolation between
    equal run values), so the strict `v > breakpoint` binning is
    boundary-safe."""
    li = load_table(spark, sf_dir, "lineitem")
    out = D.psi_bins(li, "l_quantity",
                     F.col("l_shipdate") < "1998-06-01",
                     n_bins=10)
    return out.select("bin", "n_ref", "n_cur",
                      F.round("frac_ref", 6).alias("frac_ref"),
                      F.round("frac_cur", 6).alias("frac_cur"),
                      F.round("psi_contrib", 6).alias("psi_contrib"))


@query("drift_chi2", oracle=f"""
WITH cells AS (
  SELECT l_returnflag,
         sum(CASE WHEN {_REF} THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN {_REF} THEN 0 ELSE 1 END) AS cb
  FROM lineitem GROUP BY 1
), tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM cells)
SELECT round(sum(pow(ca - (ca + cb) * na / (na + nb), 2)
                 / ((ca + cb) * na / (na + nb))
               + pow(cb - (ca + cb) * nb / (na + nb), 2)
                 / ((ca + cb) * nb / (na + nb))), 6) AS chi2,
       CAST(count(*) - 1 AS BIGINT) AS dof,
       CAST(count(*) AS BIGINT) AS n_categories,
       CAST(max(na) AS BIGINT) AS n_ref, CAST(max(nb) AS BIGINT) AS n_cur
FROM cells, tot
""")
def drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample chi-square homogeneity over return flags
    (`operators/drift.chi2_drift`): contingency cells are exact longs,
    the statistic is a tiny float reduction at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    out = D.chi2_drift(li, "l_returnflag",
                       F.col("l_shipdate") < "1998-06-01")
    return out.select(F.round("chi2", 6).alias("chi2"), "dof",
                      "n_categories", "n_ref", "n_cur")
