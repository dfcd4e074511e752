"""Summary-stats queries (A11/A12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import stats as S
from ..registry import query
from ..sources.io import load_table


@query("a11_global_stats", oracle="""
SELECT round(avg(value), 6) AS mean,
       round(stddev_samp(value), 6) AS std,
       min(value) AS min,
       max(value) AS max,
       count(value) AS n,
       round(quantile_cont(value, 0.05), 6) AS p5,
       round(quantile_cont(value, 0.95), 6) AS p95
FROM events
""")
def global_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — per-variable global stats (reference `src/arco_demo.py:234-260`):
    one full-scan aggregation, all single-pass partial-merge aggregates."""
    ev = load_table(spark, sf_dir, "events")
    out = S.global_stats(ev, "value", percentiles=(5, 95))
    return out.select(F.round("mean", 6).alias("mean"),
                      F.round("std", 6).alias("std"),
                      "min", "max", "n",
                      F.round("p5", 6).alias("p5"),
                      F.round("p95", 6).alias("p95"))


@query("a12_region_stats", oracle="""
SELECT l_returnflag,
       round(avg(l_extendedprice), 4) AS mean,
       round(stddev_samp(l_extendedprice), 4) AS std,
       min(l_extendedprice) AS min,
       max(l_extendedprice) AS max,
       count(l_extendedprice) AS n,
       round(quantile_cont(l_extendedprice, 0.10), 4) AS p10,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.90), 4) AS p90
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
  AND l_quantity BETWEEN 10 AND 40
GROUP BY 1
""")
def region_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — bbox-style range predicates + grouped summary (reference
    `/datasets/{id}/stats`, `api/routes/data.py:172-214`). Both range
    predicates push down to the parquet scan (check PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = (F.col("l_shipdate").between("1996-01-01", "1998-12-31")
            & F.col("l_quantity").between(10, 40))
    out = S.region_stats(li, "l_extendedprice", predicates=pred,
                         keys=["l_returnflag"], percentiles=(10, 50, 90))
    return out.select("l_returnflag",
                      F.round("mean", 4).alias("mean"),
                      F.round("std", 4).alias("std"),
                      "min", "max", "n",
                      F.round("p10", 4).alias("p10"),
                      F.round("p50", 4).alias("p50"),
                      F.round("p90", 4).alias("p90"))


@query("weighted_mean_groups", oracle="""
SELECT l_returnflag,
       round((SUM(CAST(round(l_extendedprice * l_quantity * 100) AS BIGINT))
              / 100.0)
             / (SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0),
             6) AS wmean,
       SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS weight_sum,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY 1
""")
def weighted_mean_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean (Σwx/Σw) per group — quantity-weighted average unit
    price per return flag (`operators/stats.weighted_mean`). The climate
    use is cos(lat) area weighting (tested on the synthetic grid); here
    the exact scaled-long sums keep the check partition-order
    deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    out = S.weighted_mean(li, "l_extendedprice", "l_quantity",
                          keys=["l_returnflag"], decimal_scale=2)
    return out.select("l_returnflag", F.round("wmean", 6).alias("wmean"),
                      "weight_sum", "n")


@query("weighted_median_groups", oracle="""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice AS v,
         sum(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
  FROM lineitem
)
SELECT l_returnflag, min(v) AS wmedian
FROM ranked WHERE cum >= tot / 2.0
GROUP BY 1
""")
def weighted_median_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted (lower) median price per return flag via the
    grouped-aggregate pandas UDF (`operators/stats.weighted_median_udaf`)
    — the custom-reduction UDF shape. The oracle re-derives it with a
    cumulative-weight window; the discrete lower-median rule makes the
    crossing value order-independent even across price ties."""
    li = load_table(spark, sf_dir, "lineitem")
    wm = S.weighted_median_udaf()
    return (li.groupBy("l_returnflag")
              .agg(wm(F.col("l_extendedprice"),
                      F.col("l_quantity")).alias("wmedian")))


@query("coarsen_blocks", oracle="""
SELECT (floor(l_extendedprice / 5000) + 0.5) * 5000 AS l_extendedprice_center,
       (floor(l_discount / 0.02) + 0.5) * 0.02 AS l_discount_center,
       CAST(floor(avg(l_quantity) * 1e6) AS BIGINT) AS avg_qty_micro,
       CAST(count(*) AS BIGINT) AS n_cells
FROM lineitem
GROUP BY floor(l_extendedprice / 5000), floor(l_discount / 0.02)
""")
def coarsen_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-aggregate regrid (xarray `coarsen` analogue,
    `operators/stats.coarsen`): quantize a 2-D numeric domain into
    blocks, one hash-agg, block centers out. Micro-int output for the
    tie-free float compare (quantity sums are exact integers, so the
    average is bit-identical in both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = S.coarsen(li, "l_extendedprice", "l_discount", "l_quantity",
                    5000, 0.02, agg="avg")
    return out.select("l_extendedprice_center", "l_discount_center",
                      F.floor(F.col("avg_l_quantity") * 1e6).cast("long")
                       .alias("avg_qty_micro"), "n_cells")


@query("winsorized_stats", oracle="""
WITH bounds AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       round(avg(least(greatest(l.l_extendedprice, b.lo), b.hi)), 4)
         AS mean_wins,
       count(*) AS n
FROM lineitem l JOIN bounds b USING (l_returnflag)
GROUP BY 1
""")
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile clipping (`operators/stats.winsorize`) at p5/p95 per
    return flag, then a mean over the clipped values — the standard
    outlier-robust pre-training statistic. Exact grouped percentiles
    (Spark `percentile` == DuckDB `quantile_cont`, both linear
    interpolation) broadcast back onto the facts; no fact reshuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    out = S.winsorize(li, "l_extendedprice", keys=["l_returnflag"],
                      lower=0.05, upper=0.95, alias="wins")
    return (out.groupBy("l_returnflag")
               .agg(F.round(F.avg("wins"), 4).alias("mean_wins"),
                    F.count("*").alias("n")))
