"""Behavioral / irregular-time-series analytics over the events stream.

The reference serves point- and region-timeseries through its API layer
(`api/routes/data.py:88-214`); production users of such a pipeline
immediately layer funnel, cohort and data-completeness questions on top.
These queries put that family on the driver's oracle gate, each built
single-shuffle:

- ``funnel_conversion``   — ordered multi-stage funnel via chained
  entire-partition window minima (one shuffle on user_id, no joins).
- ``cohort_retention``    — first-seen cohort × activity-month matrix.
- ``twap_user_value``     — time-weighted average for *irregularly*
  sampled series (the step-function integral xarray users approximate
  with resample+mean; exact scaled-integer accumulation).
- ``series_gap_report``   — per-series completeness: expected vs
  observed days (the QA view of the reference's time-axis assumptions,
  `ingest/netcdf_reader.py:67-71`).
- ``degree_days``         — classic climate index (heating/cooling
  degree days): thresholded positive-part sums per month
  (ETCCDI-family shape, cf. `metrics/percentiles.py:80-112`).

Determinism: counts are integral; value sums use the scaled-long exact
accumulation from ``functions.exact``; ratios are rounded well above
fp accumulation error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table


@query("funnel_conversion", oracle="""
WITH s1 AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS t_view
  FROM events
), s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= t_view THEN ts END)
                OVER (PARTITION BY user_id) AS t_click
  FROM s1
), s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t_click THEN ts END)
                OVER (PARTITION BY user_id) AS t_purchase
  FROM s2
)
SELECT COUNT(DISTINCT user_id)                                        AS n_users,
       COUNT(DISTINCT CASE WHEN t_view     IS NOT NULL THEN user_id END) AS n_viewed,
       COUNT(DISTINCT CASE WHEN t_click    IS NOT NULL THEN user_id END) AS n_clicked,
       COUNT(DISTINCT CASE WHEN t_purchase IS NOT NULL THEN user_id END) AS n_purchased,
       round(COUNT(DISTINCT CASE WHEN t_purchase IS NOT NULL THEN user_id END)
             * 1.0 / COUNT(DISTINCT CASE WHEN t_view IS NOT NULL THEN user_id END),
             6) AS view_to_purchase_rate
FROM s3
""")
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel. Stage k's earliest timestamp
    is constrained to be >= stage k-1's — expressed as three chained
    entire-partition window minima over the SAME partitioning, so
    Catalyst plans one Exchange on user_id and three Window operators
    back-to-back (no joins, no row explosion). At 100 TB this is the
    shape you want: funnel state is O(1) per user regardless of event
    count, and the single shuffle is the unavoidable one."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    d = e.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w))
    d = d.withColumn(
        "t_click",
        F.min(F.when((F.col("event_type") == "click")
                     & (F.col("ts") >= F.col("t_view")), F.col("ts"))).over(w))
    d = d.withColumn(
        "t_purchase",
        F.min(F.when((F.col("event_type") == "purchase")
                     & (F.col("ts") >= F.col("t_click")), F.col("ts"))).over(w))
    # stage times are per-user constants: collapsing to one row per user
    # REUSES the window's hashpartitioning(user_id) — no new exchange —
    # and turns every COUNT(DISTINCT …) into a plain null-skipping count
    # (no Expand). Total: 1 data shuffle + 1 single-row final exchange.
    per_user = d.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"))
    agg = per_user.agg(
        F.count("user_id").alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked"),
        F.count("t_purchase").alias("n_purchased"))
    return agg.select(
        "*",
        F.round(F.col("n_purchased") * 1.0 / F.col("n_viewed"), 6)
         .alias("view_to_purchase_rate"))


@query("cohort_retention", oracle="""
WITH d AS (
  SELECT user_id, ts,
         MIN(ts) OVER (PARTITION BY user_id) AS first_ts
  FROM events
)
SELECT date_trunc('month', first_ts) AS cohort_month,
       CAST((year(ts) - year(first_ts)) * 12
            + (month(ts) - month(first_ts)) AS INTEGER) AS month_offset,
       COUNT(DISTINCT user_id) AS n_active
FROM d
GROUP BY 1, 2
""")
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix: users bucketed by first-seen month,
    counted distinct in each subsequent activity month. The cohort
    label is an entire-partition window min (shuffle #1 on user_id);
    the matrix is a hash aggregate (shuffle #2 on the tiny
    (cohort, offset) key space). The calendar-month offset uses pure
    year/month integer arithmetic — identical semantics in Spark and
    DuckDB, unlike fractional months_between."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    d = e.withColumn("first_ts", F.min("ts").over(w))
    offset = ((F.year("ts") - F.year("first_ts")) * 12
              + (F.month("ts") - F.month("first_ts"))).cast("int")
    return (d.groupBy(
                F.date_trunc("month", "first_ts").alias("cohort_month"),
                offset.alias("month_offset"))
             .agg(F.countDistinct("user_id").alias("n_active")))


@query("twap_user_value", oracle="""
WITH d AS (
  SELECT user_id, value,
         epoch_us(CAST(lead(ts) OVER w AS TIMESTAMP))
           - epoch_us(CAST(ts AS TIMESTAMP)) AS dur_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id,
       round((CAST(SUM(CAST(round(value * 100) AS BIGINT) * dur_us) AS DOUBLE)
              / 100.0) / CAST(SUM(dur_us) AS DOUBLE), 6) AS twap,
       COUNT(*) AS n_intervals
FROM d
WHERE dur_us IS NOT NULL
GROUP BY user_id
""")
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user — the correct mean for
    irregularly sampled series (each observation holds until the next
    one; plain avg() over-weights bursts). Duration weights come from
    lead(ts) over the series window; the weighted sum accumulates as
    scaled 64-bit integers (value is 2-decimal-quantized; overflow
    envelope |v|·10²·dur_us·rows ≪ 2⁶³), so the result is exact and
    partition-order independent. One shuffle on user_id; the window
    sort feeds the aggregation without a second exchange."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    d = (e.withColumn("next_ts", F.lead("ts").over(w))
          .withColumn("dur_us", us("next_ts") - us("ts"))
          .where(F.col("dur_us").isNotNull()))
    scaled = F.round(F.col("value") * 100).cast("long") * F.col("dur_us")
    return (d.groupBy("user_id")
             .agg(F.round((F.sum(scaled).cast("double") / 100.0)
                          / F.sum("dur_us").cast("double"), 6).alias("twap"),
                  F.count(F.lit(1)).alias("n_intervals")))


@query("series_gap_report", oracle="""
WITH d AS (SELECT user_id, date_trunc('day', ts) AS day FROM events)
SELECT user_id,
       MIN(day) AS first_day,
       MAX(day) AS last_day,
       CAST(date_diff('day', MIN(day), MAX(day)) + 1 AS INTEGER) AS n_expected,
       COUNT(DISTINCT day) AS n_observed,
       CAST(date_diff('day', MIN(day), MAX(day)) + 1 AS INTEGER)
         - COUNT(DISTINCT day) AS n_missing,
       round(COUNT(DISTINCT day) * 1.0 /
             (date_diff('day', MIN(day), MAX(day)) + 1), 6) AS completeness
FROM d
GROUP BY user_id
""")
def series_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series completeness audit: observed distinct days vs the
    calendar span — the QA check behind the reference's assumption of a
    regular time axis (`ingest/netcdf_reader.py:67-71`; its resample
    operators silently emit NaN for empty bins). Single hash aggregate;
    the distinct-day count is a partial_count(distinct) with map-side
    dedup, so the shuffle carries at most one row per (user, day)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("d"))
    agg = e.groupBy("user_id").agg(
        F.min("d").alias("first_day"),
        F.max("d").alias("last_day"),
        F.countDistinct("d").alias("n_observed"))
    expected = (F.datediff("last_day", "first_day") + 1).cast("int")
    return agg.select(
        "user_id", "first_day", "last_day",
        expected.alias("n_expected"),
        "n_observed",
        (expected - F.col("n_observed")).alias("n_missing"),
        F.round(F.col("n_observed") * 1.0 / expected, 6).alias("completeness"))


@query("degree_days", oracle="""
WITH days AS (
  -- degree days integrate the DAILY-MEAN excess: summing per event
  -- would weight each day by its observation count (24 readings of
  -- +10 must contribute 10 degree-days, not 240)
  SELECT date_trunc('day', ts) AS d,
         round(SUM(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0
               / count(*), 6) AS dmean,
         count(*) AS n_obs
  FROM events GROUP BY 1
)
SELECT date_trunc('month', d) AS month,
       SUM(CAST(round(GREATEST(dmean - 10.0, 0) * 1000000) AS BIGINT))
         / 1000000.0 AS cooling_dd,
       SUM(CAST(round(GREATEST(10.0 - dmean, 0) * 1000000) AS BIGINT))
         / 1000000.0 AS heating_dd,
       CAST(SUM(n_obs) AS BIGINT) AS n_obs
FROM days
GROUP BY 1
""")
def degree_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heating/cooling degree days — the thresholded positive-part sums
    of the ETCCDI climate-index family (the reference's exceedance
    machinery, `metrics/percentiles.py:80-112`, counts threshold
    crossings; degree days integrate the excess). value stands in for
    temperature with base 10. The excess is taken of the DAILY MEAN
    (digest first, like every degree-day definition): summing per raw
    event would scale the index with observation density rather than
    integrated daily excess. Exact scaled-long sums at each stage —
    two tiny hash aggregates, bit-stable under any partitioning."""
    e = load_table(spark, sf_dir, "events")
    days = (e.groupBy(F.date_trunc("day", "ts").alias("d"))
             .agg(F.round(
                 F.sum(F.round(F.col("value") * 1e6).cast("long")) / 1e6
                 / F.count(F.lit(1)), 6).alias("dmean"),
                  F.count(F.lit(1)).alias("n_obs")))

    def dd(expr):  # Σ max(expr, 0) exactly, scaled-long accumulation
        pos = F.greatest(expr, F.lit(0.0))
        return F.sum(F.round(pos * 1e6).cast("long")) / 1e6

    return (days.groupBy(F.date_trunc("month", "d").alias("month"))
                .agg(dd(F.col("dmean") - 10.0).alias("cooling_dd"),
                     dd(F.lit(10.0) - F.col("dmean")).alias("heating_dd"),
                     F.sum("n_obs").cast("long").alias("n_obs")))
