"""Anomaly / standardization queries (J1, W2, F4) on the lineitem series.

l_quantity is integer-valued so climatology means are exact IEEE sums —
anomalies are bit-deterministic. Z-scores involve stddev (order-sensitive
accumulation) and are rounded to 4 dp in engine AND oracle — the margin
sits ~9 orders of magnitude above the ~1e-13 accumulation error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import severity_from_z
from ..operators import anomalies as A
from ..registry import query
from ..sources.io import load_table

_Z_SQL_CORE = """
SELECT l_orderkey, l_linenumber,
       CAST(month(l_shipdate) AS INTEGER) AS month,
       l_returnflag, l_quantity,
       round((l_quantity - avg(l_quantity) OVER w) / stddev_samp(l_quantity) OVER w, 4) AS zscore
FROM lineitem
WINDOW w AS (PARTITION BY month(l_shipdate), l_returnflag)
"""


@query("j1_anomaly_join", oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(month(l_shipdate) AS INTEGER) AS month,
       l_returnflag, l_quantity,
       l_quantity - avg(l_quantity) OVER (PARTITION BY month(l_shipdate), l_returnflag) AS anomaly
FROM lineitem
""")
def anomaly_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — groupby-broadcast arithmetic as a broadcast equi-join
    (reference `metrics/anomalies.py:14-62`). The oracle uses the window
    formulation; both compute the same exact value."""
    li = load_table(spark, sf_dir, "lineitem")
    out = A.anomaly(li, "l_shipdate", "l_quantity", keys=["l_returnflag"],
                    groupby="month")
    return out.select("l_orderkey", "l_linenumber", "month", "l_returnflag",
                      "l_quantity", "anomaly")


@query("w2_zscore", oracle=_Z_SQL_CORE)
def zscore_groupwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — groupwise standardization (reference `metrics/anomalies.py:
    100-125`), join method (aggregate → broadcast-join beats a full-table
    window shuffle at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = A.zscore(li, "l_shipdate", "l_quantity", keys=["l_returnflag"],
                   groupby="month", method="join")
    return out.select("l_orderkey", "l_linenumber", "month", "l_returnflag",
                      "l_quantity", F.round("zscore", 4).alias("zscore"))


@query("f4_severity", oracle=f"""
SELECT l_orderkey, l_linenumber, month, l_returnflag, zscore,
       CAST(CASE WHEN zscore IS NULL THEN NULL
                 WHEN zscore < -2.0 THEN -3
                 WHEN zscore < -1.5 THEN -2
                 WHEN zscore < -1.0 THEN -1
                 WHEN zscore <= 1.0 THEN 0
                 WHEN zscore <= 1.5 THEN 1
                 WHEN zscore <= 2.0 THEN 2
                 ELSE 3 END AS INTEGER) AS severity
FROM ({_Z_SQL_CORE})
""")
def severity_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — 7-level severity banding of z-scores with the reference's exact
    thresholds (`metrics/anomalies.py:232-237`). Applied to the *rounded*
    z-score in both engines so band boundaries agree."""
    li = load_table(spark, sf_dir, "lineitem")
    z = A.zscore(li, "l_shipdate", "l_quantity", keys=["l_returnflag"],
                 groupby="month", method="join")
    z = z.withColumn("zscore", F.round("zscore", 4))
    return (z.withColumn("severity", severity_from_z("zscore"))
             .select("l_orderkey", "l_linenumber", "month", "l_returnflag",
                     "zscore", "severity"))


@query("w3_percentile_rank", oracle="""
WITH thr AS (
  SELECT CAST(month(l_shipdate) AS INTEGER) AS month, l_returnflag,
         quantile_cont(l_quantity, 0.10) AS t10, quantile_cont(l_quantity, 0.25) AS t25,
         quantile_cont(l_quantity, 0.50) AS t50, quantile_cont(l_quantity, 0.75) AS t75,
         quantile_cont(l_quantity, 0.90) AS t90, quantile_cont(l_quantity, 0.95) AS t95,
         quantile_cont(l_quantity, 0.99) AS t99
  FROM lineitem GROUP BY 1, 2
)
SELECT l.l_orderkey, l.l_linenumber, thr.month, l.l_returnflag, l.l_quantity,
       round(CASE
         WHEN l.l_quantity IS NULL OR t10 IS NULL THEN NULL
         WHEN l.l_quantity >= t99 THEN 99.0
         WHEN l.l_quantity >= t95 AND l.l_quantity < t99 AND t99 > t95
              THEN 95.0 + (l.l_quantity - t95) / (t99 - t95) * 4.0
         WHEN l.l_quantity >= t90 AND l.l_quantity < t95 AND t95 > t90
              THEN 90.0 + (l.l_quantity - t90) / (t95 - t90) * 5.0
         WHEN l.l_quantity >= t75 AND l.l_quantity < t90 AND t90 > t75
              THEN 75.0 + (l.l_quantity - t75) / (t90 - t75) * 15.0
         WHEN l.l_quantity >= t50 AND l.l_quantity < t75 AND t75 > t50
              THEN 50.0 + (l.l_quantity - t50) / (t75 - t50) * 25.0
         WHEN l.l_quantity >= t25 AND l.l_quantity < t50 AND t50 > t25
              THEN 25.0 + (l.l_quantity - t25) / (t50 - t25) * 25.0
         WHEN l.l_quantity >= t10 AND l.l_quantity < t25 AND t25 > t10
              THEN 10.0 + (l.l_quantity - t10) / (t25 - t10) * 15.0
         ELSE 10.0 END, 4) AS percentile_rank
FROM lineitem l
JOIN thr ON thr.month = CAST(month(l.l_shipdate) AS INTEGER)
        AND thr.l_returnflag = l.l_returnflag
""")
def percentile_rank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — np.interp-style percentile rank against the month's percentile
    curve (reference `metrics/anomalies.py:138-204`), as a broadcast join +
    piecewise-linear CASE chain — no UDF."""
    li = load_table(spark, sf_dir, "lineitem")
    out = A.percentile_rank(li, "l_shipdate", "l_quantity", keys=["l_returnflag"])
    return out.select("l_orderkey", "l_linenumber", "month", "l_returnflag",
                      "l_quantity",
                      F.round("percentile_rank", 4).alias("percentile_rank"))


@query("f5_anomaly_labels", oracle=f"""
WITH sev AS (
  SELECT l_orderkey, l_linenumber, month, l_returnflag, zscore,
         CAST(CASE WHEN zscore IS NULL THEN NULL
                   WHEN zscore < -2.0 THEN -3
                   WHEN zscore < -1.5 THEN -2
                   WHEN zscore < -1.0 THEN -1
                   WHEN zscore <= 1.0 THEN 0
                   WHEN zscore <= 1.5 THEN 1
                   WHEN zscore <= 2.0 THEN 2
                   ELSE 3 END AS INTEGER) AS severity
  FROM ({_Z_SQL_CORE})
)
SELECT severity,
       CASE WHEN severity = -3 THEN 'extreme_low'
            WHEN severity = -2 THEN 'severe_low'
            WHEN severity = -1 THEN 'moderate_low'
            WHEN severity = 0  THEN 'normal'
            WHEN severity = 1  THEN 'moderate_high'
            WHEN severity = 2  THEN 'severe_high'
            ELSE 'extreme_high' END AS label,
       COUNT(*) AS n
FROM sev
GROUP BY 1, 2
""")
def anomaly_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — severity level → human label (reference
    `api/routes/metrics.py:221-250`), with the band population counts."""
    from ..functions.scalars import anomaly_label

    li = load_table(spark, sf_dir, "lineitem")
    z = A.zscore(li, "l_shipdate", "l_quantity", keys=["l_returnflag"],
                 groupby="month", method="join")
    z = z.withColumn("zscore", F.round("zscore", 4))
    sev = z.withColumn("severity", severity_from_z("zscore"))
    return (sev.withColumn("label", anomaly_label("severity"))
               .groupBy("severity", "label")
               .agg(F.count("*").alias("n")))


@query("w2_robust_zscore", oracle="""
WITH keyed AS (
  SELECT l_orderkey, l_linenumber,
         CAST(month(l_shipdate) AS INTEGER) AS month,
         l_returnflag, l_quantity
  FROM lineitem
), med AS (
  SELECT month, l_returnflag,
         quantile_cont(l_quantity, 0.5) AS med
  FROM keyed GROUP BY 1, 2
), mad AS (
  SELECT k.month, k.l_returnflag,
         quantile_cont(abs(k.l_quantity - m.med), 0.5) AS mad
  FROM keyed k JOIN med m USING (month, l_returnflag)
  GROUP BY 1, 2
)
SELECT k.l_orderkey, k.l_linenumber, k.month, k.l_returnflag, k.l_quantity,
       round((k.l_quantity - m.med) / (1.4826 * d.mad), 4) AS robust_z
FROM keyed k
JOIN med m USING (month, l_returnflag)
JOIN mad d USING (month, l_returnflag)
""")
def robust_zscore_groupwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust standardization (engine addition beyond the
    reference's mean/std z-score): immune to the contaminated readings
    a 100 TB ingest inevitably contains. Exact percentile = DuckDB
    quantile_cont (linear interpolation, same estimator)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = A.robust_zscore(li, "l_shipdate", "l_quantity",
                          keys=["l_returnflag"], groupby="month")
    return out.select("l_orderkey", "l_linenumber", "month", "l_returnflag",
                      "l_quantity", F.round("robust_z", 4).alias("robust_z"))
