"""Percentile-metric queries (A5-A7, F6) on lineitem.

Exact `percentile` (linear interpolation) = DuckDB `quantile_cont`;
thresholds rounded to 6 dp at the output only (comparisons use the raw
exact values — interpolated thresholds sit strictly between integer
quantity values in both engines, so >/>= outcomes agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import percentiles as P
from ..registry import query
from ..sources.io import load_table


@query("a5_grouped_percentiles", oracle="""
SELECT CAST(month(l_shipdate) AS INTEGER) AS month, l_returnflag,
       unnest([10, 25, 50, 75, 90, 95, 99]) AS percentile,
       round(unnest(quantile_cont(l_quantity,
             [0.10, 0.25, 0.50, 0.75, 0.90, 0.95, 0.99])), 6) AS threshold
FROM lineitem
GROUP BY 1, 2
""")
def grouped_percentiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — climatological percentiles per (month, series), long format with
    an explicit percentile column (reference `metrics/percentiles.py:14-77`
    keeps percentile as a dimension)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = P.grouped_percentiles(li, "l_shipdate", "l_quantity",
                                keys=["l_returnflag"], groupby="month")
    return out.select("month", "l_returnflag", "percentile",
                      F.round("threshold", 6).alias("threshold"))


@query("a6_exceedance_frequency", oracle="""
WITH thr AS (
  SELECT CAST(month(l_shipdate) AS INTEGER) AS month, l_returnflag,
         quantile_cont(l_quantity, 0.90) AS t
  FROM lineitem GROUP BY 1, 2
)
SELECT l.l_returnflag,
       avg(CASE WHEN l.l_quantity > thr.t THEN 1.0 ELSE 0.0 END) AS exceedance_freq,
       count(*) AS n
FROM lineitem l
JOIN thr ON thr.month = CAST(month(l.l_shipdate) AS INTEGER)
        AND thr.l_returnflag = l.l_returnflag
GROUP BY 1
""")
def exceedance_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — fraction of observations above the month's p90 (reference
    `metrics/percentiles.py:80-112`); ≈0.10 by construction, an exact 0/1
    mean. Threshold table is 12×#flags rows → broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    return P.exceedance_frequency(li, "l_shipdate", "l_quantity",
                                  keys=["l_returnflag"], percentile=90)


@query("a7_return_periods", oracle="""
WITH amax AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS year, l_returnflag,
         max(l_extendedprice) AS m
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag,
       unnest([2, 5, 10, 25, 50, 100]) AS return_period,
       round(unnest(quantile_cont(m, [0.5, 0.8, 0.9, 0.96, 0.98, 0.99])), 6) AS value
FROM amax
GROUP BY 1
""")
def return_periods_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — annual maxima then quantile at 1−1/T (reference
    `metrics/percentiles.py:152-187`). The annual-max stage shrinks the
    data ~10^3× before the exact quantile."""
    li = load_table(spark, sf_dir, "lineitem")
    out = P.return_periods(li, "l_shipdate", "l_extendedprice",
                           keys=["l_returnflag"])
    return out.select("l_returnflag", "return_period",
                      F.round("value", 6).alias("value"))


@query("f6_percentile_bins", oracle="""
WITH thr AS (
  SELECT CAST(month(l_shipdate) AS INTEGER) AS month, l_returnflag,
         quantile_cont(l_quantity, 0.50) AS t50,
         quantile_cont(l_quantity, 0.75) AS t75,
         quantile_cont(l_quantity, 0.90) AS t90,
         quantile_cont(l_quantity, 0.95) AS t95,
         quantile_cont(l_quantity, 0.99) AS t99
  FROM lineitem GROUP BY 1, 2
)
SELECT l.l_orderkey, l.l_linenumber, thr.month, l.l_returnflag, l.l_quantity,
       CAST(CASE WHEN l.l_quantity >= t99 THEN 99
                 WHEN l.l_quantity >= t95 THEN 95
                 WHEN l.l_quantity >= t90 THEN 90
                 WHEN l.l_quantity >= t75 THEN 75
                 WHEN l.l_quantity >= t50 THEN 50
                 ELSE 0 END AS INTEGER) AS percentile_bin
FROM lineitem l
JOIN thr ON thr.month = CAST(month(l.l_shipdate) AS INTEGER)
        AND thr.l_returnflag = l.l_returnflag
""")
def percentile_bins_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — highest-band-passed percentile classification (reference
    `metrics/percentiles.py:115-149`, descending CASE)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = P.percentile_bins(li, "l_shipdate", "l_quantity",
                            keys=["l_returnflag"])
    return out.select("l_orderkey", "l_linenumber", "month", "l_returnflag",
                      "l_quantity", "percentile_bin")


@query("a5_doy_window_percentiles", oracle="""
WITH binned AS (
  -- leap-aware calendar fold: Feb 29 merges into Feb 28's bin and all
  -- later days shift down one, so each bin is the same calendar day
  -- in every year (mirrors operators/percentiles.doy_window_percentiles)
  SELECT CAST(((CASE WHEN ((year(l_shipdate) % 4 = 0
                            AND year(l_shipdate) % 100 <> 0)
                           OR year(l_shipdate) % 400 = 0)
                          AND dayofyear(l_shipdate) >= 60
                     THEN dayofyear(l_shipdate) - 1
                     ELSE dayofyear(l_shipdate) END) - 1 + off.o + 365)
              % 365 + 1 AS INTEGER) AS doy_bin,
         l_returnflag, l_quantity
  FROM lineitem, (SELECT unnest(range(-2, 3)) AS o) AS off
)
SELECT doy_bin, l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS p50,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90
FROM binned GROUP BY 1, 2
""")
def doy_window_percentiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-year percentiles pooled over a centered ±2-day calendar
    window (ETCCDI-style smoothing of the reference's raw
    `groupby='dayofyear'` percentiles) — explode-into-bins, one shuffle
    (`operators/percentiles.doy_window_percentiles`). The oracle
    re-derives the bin contribution lateral-style in DuckDB."""
    li = load_table(spark, sf_dir, "lineitem")
    # l_quantity is a small-cardinality integer: the discrete path
    # reconstructs the SAME interpolated percentile from per-value
    # counts, so the x5 explode collapses in the map-side combine and
    # the shuffle carries (bin, flag, value) rows, not observations
    # (proven value-equal to the sort-based aggregate; 2.8 s -> 1.0 s
    # at sf0.1)
    out = P.doy_window_percentiles(li, "l_shipdate", "l_quantity",
                                   keys=["l_returnflag"],
                                   percentiles=(50, 90), window=2,
                                   discrete=True)
    return out.select("doy_bin", "l_returnflag",
                      F.round("p50", 6).alias("p50"),
                      F.round("p90", 6).alias("p90"))


@query("a5_approx_percentile_check", oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.50), 6) AS exact_p50,
       round(quantile_cont(l_quantity, 0.90), 6) AS exact_p90,
       TRUE AS approx_p50_in_rank_window,
       TRUE AS approx_p90_in_rank_window
FROM lineitem GROUP BY 1
""")
def approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A5 production mode (`approx_percentile` — single-pass sketch,
    fixed memory; the `exact=False` flag at 100 TB) given a real check,
    the `approx_distinct` pattern: the sketch's guarantee is RANK error,
    so the Spark side asserts each approximate quantile lands between
    the exact ±5-rank-point neighbors (p45..p55 for the median) computed
    in the same aggregation, and the oracle pins that bound TRUE next to
    the exact values — a sketch regression flips the hash."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    exact = F.expr(
        "percentile(CAST(l_quantity AS DOUBLE), "
        "array(0.45, 0.50, 0.55, 0.85, 0.90, 0.95))")
    approx = F.expr(
        "approx_percentile(CAST(l_quantity AS DOUBLE), "
        "array(0.50, 0.90), 1000)")
    agg = (li.groupBy("l_returnflag")
             .agg(exact.alias("__e"), approx.alias("__a")))
    return agg.select(
        "l_returnflag",
        F.round(F.col("__e")[1], 6).alias("exact_p50"),
        F.round(F.col("__e")[4], 6).alias("exact_p90"),
        ((F.col("__a")[0] >= F.col("__e")[0])
         & (F.col("__a")[0] <= F.col("__e")[2]))
        .alias("approx_p50_in_rank_window"),
        ((F.col("__a")[1] >= F.col("__e")[3])
         & (F.col("__a")[1] <= F.col("__e")[5]))
        .alias("approx_p90_in_rank_window"))


@query("a6_exceedance_transitions", oracle="""
WITH thr AS (SELECT quantile_cont(value, 0.9) AS t FROM events),
st AS (
  SELECT user_id,
         (value > (SELECT t FROM thr)) AS cur,
         lag(value > (SELECT t FROM thr))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
tr AS (SELECT prev, cur, count(*) AS n FROM st WHERE prev IS NOT NULL
       GROUP BY 1, 2)
SELECT prev AS from_state, cur AS to_state, CAST(n AS BIGINT) AS n,
       round(n / SUM(n) OVER (PARTITION BY prev), 6) AS p
FROM tr
""")
def exceedance_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exceedance persistence (the spell-statistics Markov view): per-user
    event series are classified against the global p90 threshold and the
    2×2 state-transition matrix — P(exceed next | exceed now) — is
    aggregated. The climate question "do extremes cluster?" as one lag
    window plus a conditional-count aggregate; the threshold is a scalar
    broadcast, the only data shuffle is the per-user series
    partitioning."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    thr = ev.agg(F.expr("percentile(value, 0.9)").alias("t"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    st = (ev.join(F.broadcast(thr))
            .withColumn("cur", F.col("value") > F.col("t"))
            .withColumn("prev", F.lag("cur").over(w))
            .where(F.col("prev").isNotNull()))
    tr = st.groupBy("prev", "cur").agg(F.count("*").alias("n"))
    wp = Window.partitionBy("prev")
    return tr.select(F.col("prev").alias("from_state"),
                     F.col("cur").alias("to_state"), "n",
                     F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"))
