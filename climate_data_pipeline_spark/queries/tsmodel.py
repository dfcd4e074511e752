"""Time-series model fits in closed form — pure SQL, no UDFs.

The reference fits one model family (per-cell linear trend,
`metrics/trends.py:12-65`) and describes the seasonal cycle only
non-parametrically (climatology means, `metrics/temporal.py:120-159`).
These queries add the classical companions, each as a one-or-two-shuffle
aggregate:

- ``acf_lag_autocorr``      — lag-1/lag-2 autocorrelation per series
  (persistence, the first thing a climate analyst checks before trusting
  a trend's significance; cf. the reference's Mann-Kendall discussion,
  `metrics/trends.py:68-167`).
- ``harmonic_seasonal_fit`` — amplitude/phase of the annual cycle via a
  two-regressor OLS on (sin, cos) of day-of-year, solved in closed form
  from var/covar aggregates (normal equations), not an iterative fitter.
- ``series_correlation_matrix`` — pairwise (and lag-1 cross-) Pearson
  correlation between entity series, the teleconnection-matrix shape.

Determinism: moment aggregates are rounded at 1e-6 — far above fp
accumulation error at these magnitudes (|y| ≤ 500, n ≤ 10⁴ per group),
far below data variation. Day-of-year time uses wall-clock calendar
parts only, so results are session-timezone invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table

# 2π as an explicit literal so Spark and the oracle feed *identical*
# doubles to sin/cos (pi() could differ in printing, not value — but the
# literal removes the question entirely).
_TWO_PI = "6.283185307179586"
# fractional day-of-year from calendar parts (timezone-invariant)
_DOY_SQL = ("(dayofyear(ts) + (hour(ts) * 3600 + minute(ts) * 60"
            " + second(ts)) / 86400.0)")


@query("acf_lag_autocorr", oracle="""
WITH d AS (
  SELECT user_id, value,
         lag(value, 1) OVER w AS lag1,
         lag(value, 2) OVER w AS lag2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id,
       round(corr(value, lag1), 6) AS acf1,
       round(corr(value, lag2), 6) AS acf2,
       COUNT(*) AS n
FROM d
GROUP BY user_id
""")
def acf_lag_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/lag-2 autocorrelation per user series: lag() over the
    series window, then corr() against the shifted copy (null lag rows
    drop out of corr in both engines). The window and the aggregation
    share one shuffle on user_id — the same single-exchange shape as
    the rolling/EWMA operators. At scale the state is two lagged values
    per row; nothing materializes beyond the series partition."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    d = (e.withColumn("lag1", F.lag("value", 1).over(w))
          .withColumn("lag2", F.lag("value", 2).over(w)))
    return (d.groupBy("user_id")
             .agg(F.round(F.corr("value", "lag1"), 6).alias("acf1"),
                  F.round(F.corr("value", "lag2"), 6).alias("acf2"),
                  F.count(F.lit(1)).alias("n")))


@query("harmonic_seasonal_fit", oracle=f"""
WITH d AS (
  SELECT event_type, value AS y,
         sin({_TWO_PI} * {_DOY_SQL} / 365.25) AS x1,
         cos({_TWO_PI} * {_DOY_SQL} / 365.25) AS x2
  FROM events
), m AS (
  SELECT event_type,
         var_pop(x1) AS v1, var_pop(x2) AS v2, covar_pop(x1, x2) AS c12,
         covar_pop(x1, y) AS c1y, covar_pop(x2, y) AS c2y,
         avg(y) AS my, avg(x1) AS m1, avg(x2) AS m2,
         COUNT(*) AS n
  FROM d
  GROUP BY event_type
)
SELECT event_type,
       round((c1y * v2 - c2y * c12) / (v1 * v2 - c12 * c12), 6) AS b_sin,
       round((c2y * v1 - c1y * c12) / (v1 * v2 - c12 * c12), 6) AS b_cos,
       round(my - (c1y * v2 - c2y * c12) / (v1 * v2 - c12 * c12) * m1
                - (c2y * v1 - c1y * c12) / (v1 * v2 - c12 * c12) * m2,
             6) AS intercept,
       round(sqrt(((c1y * v2 - c2y * c12) / (v1 * v2 - c12 * c12))
                  * ((c1y * v2 - c2y * c12) / (v1 * v2 - c12 * c12))
                + ((c2y * v1 - c1y * c12) / (v1 * v2 - c12 * c12))
                  * ((c2y * v1 - c1y * c12) / (v1 * v2 - c12 * c12))),
             6) AS amplitude,
       n
FROM m
""")
def harmonic_seasonal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annual-cycle fit y ≈ a + b·sin(ωd) + c·cos(ωd), ω = 2π/365.25,
    d = fractional day-of-year — the parametric counterpart of the
    reference's monthly climatology (`metrics/temporal.py:120-159`):
    amplitude = half the seasonal swing, (b, c) encode the phase.

    Solved in CLOSED FORM from the normal equations of two-regressor
    OLS — five var/covar aggregates per group, one scan, one shuffle,
    map-side partials; no iterative fitting, no UDF. The n-divisors of
    var_pop/covar_pop cancel in every ratio, so population moments are
    exact substitutes for the centered sums. sin/cos may differ from
    the oracle's libm by an ulp; the 1e-6 rounding sits ~10 orders of
    magnitude above that and the fp accumulation error."""
    from ..operators.trends import harmonic_fit
    e = load_table(spark, sf_dir, "events")
    return harmonic_fit(e, "ts", "value", ["event_type"])


@query("series_correlation_matrix", oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 / COUNT(*) AS dval
  FROM events GROUP BY 1, 2
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       round(corr(a.dval, b.dval), 6) AS corr0,
       round(corr(a.dval, lb.dval), 6) AS corr_lag1,
       CAST(count(*) AS BIGINT) AS n_days
FROM daily a
JOIN daily b  ON a.d = b.d AND a.event_type < b.event_type
JOIN daily lb ON lb.event_type = b.event_type
             AND lb.d = a.d + INTERVAL 1 DAY
GROUP BY 1, 2
""")
def series_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Teleconnection-style correlation matrix between entity series:
    daily-mean series per event type, then Pearson correlation for every
    unordered pair at lag 0 and lag 1 day (does series A today predict
    series B tomorrow?). The climate analogue correlates index series
    between regions; here event types stand in for grid cells. Daily
    digests are tiny (days × types), so both self-joins broadcast; corr
    rounds at 1e-6 over its co-moment accumulation error. Rows where the
    lagged day is missing drop from BOTH correlations (inner join), so
    n_days is the common sample size."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
              .agg((F.sum(F.round(F.col("value") * 100).cast("long"))
                    / 100.0 / F.count(F.lit(1))).alias("dval")))
    a = daily.select(F.col("event_type").alias("type_a"),
                     F.col("d").alias("da"), F.col("dval").alias("va"))
    b = daily.select(F.col("event_type").alias("type_b"),
                     F.col("d").alias("db"), F.col("dval").alias("vb"))
    lb = daily.select(F.col("event_type").alias("type_lb"),
                      F.col("d").alias("dlb"), F.col("dval").alias("vlb"))
    j = (a.join(b, (F.col("da") == F.col("db"))
                & (F.col("type_a") < F.col("type_b")))
          .join(lb, (F.col("type_lb") == F.col("type_b"))
                & (F.col("dlb") == F.col("da") + F.expr("INTERVAL 1 DAY"))))
    return (j.groupBy("type_a", "type_b")
             .agg(F.round(F.corr("va", "vb"), 6).alias("corr0"),
                  F.round(F.corr("va", "vlb"), 6).alias("corr_lag1"),
                  F.count(F.lit(1)).alias("n_days")))


@query("ts_changepoint_cusum", oracle="""
WITH st AS (
  SELECT event_type, ts, event_id, value,
         AVG(value) OVER (PARTITION BY event_type) AS mu,
         stddev_pop(value) OVER (PARTITION BY event_type) AS sd,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
cum AS (
  SELECT event_type, ts, n,
         round(abs(SUM(value - mu) OVER (
                 PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               / (sd * sqrt(n)), 6) AS stat,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS idx
  FROM st
)
SELECT event_type, CAST(n AS BIGINT) AS n, ts AS cp_ts,
       CAST(idx AS BIGINT) AS cp_index, stat AS max_stat
FROM cum
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY stat DESC, ts ASC, idx ASC) = 1
""")
def changepoint_cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per series: the standardized cumulative
    deviation |Σ(x−x̄)| / (σ√n) peaks where the series' mean shifts; the
    peak row is the changepoint estimate and its height the test
    statistic (Page's CUSUM / the KPSS numerator shape). One running
    window over the series partitioning plus whole-partition moments —
    no extra shuffle beyond the per-series key; moments round at 1e-6
    per the module's determinism rule."""
    ev = load_table(spark, sf_dir, "events")
    wa = Window.partitionBy("event_type")
    wr = (Window.partitionBy("event_type").orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0))
    wi = Window.partitionBy("event_type").orderBy("ts", "event_id")
    st = (ev.withColumn("mu", F.avg("value").over(wa))
            .withColumn("sd", F.stddev_pop("value").over(wa))
            .withColumn("n", F.count("*").over(wa))
            .withColumn("stat", F.round(
                F.abs(F.sum(F.col("value") - F.col("mu")).over(wr))
                / (F.col("sd") * F.sqrt("n")), 6))
            .withColumn("idx", F.row_number().over(wi)))
    # idx is unique within the partition — without it, two rows tying
    # on (rounded stat, ts) make the picked changepoint nondeterministic
    pick = Window.partitionBy("event_type").orderBy(F.col("stat").desc(),
                                                    F.col("ts").asc(),
                                                    F.col("idx").asc())
    return (st.withColumn("__r", F.row_number().over(pick))
              .where(F.col("__r") == 1)
              .select("event_type", F.col("n").cast("long").alias("n"),
                      F.col("ts").alias("cp_ts"),
                      F.col("idx").cast("long").alias("cp_index"),
                      F.col("stat").alias("max_stat")))


@query("forecast_baseline_eval", oracle="""
WITH days AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         round(SUM(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0
               / count(*), 6) AS v
  FROM events GROUP BY 1, 2
),
lagged AS (
  -- CALENDAR-keyed baselines: naive = the value on d-1, seasonal =
  -- the value on d-7 (same weekday last week). A row-offset lag would
  -- silently misalign both baselines after any missing day.
  SELECT l.event_type, l.d, l.v, n1.v AS naive, n7.v AS snaive,
         row_number() OVER (PARTITION BY l.event_type ORDER BY l.d)
           AS idx,
         count(*) OVER (PARTITION BY l.event_type) AS n
  FROM days l
  LEFT JOIN days n1 ON n1.event_type = l.event_type
                   AND n1.d = l.d - INTERVAL 1 DAY
  LEFT JOIN days n7 ON n7.event_type = l.event_type
                   AND n7.d = l.d - INTERVAL 7 DAY
),
holdout AS (
  -- round BEFORE the integer cast: DuckDB's double->BIGINT cast
  -- rounds while Spark's truncates (functions/exact.py:14-17), so a
  -- bare CAST(0.8*n) diverges for n = 11, 16, 17, ...
  SELECT * FROM lagged
  WHERE idx > CAST(round(0.8 * n) AS BIGINT)
    AND naive IS NOT NULL AND snaive IS NOT NULL
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
       round(SUM(CAST(round(abs(v - naive) * 1000000) AS BIGINT))
             / count(*)) / 1000000.0 AS mae_naive,
       round(SUM(CAST(round(abs(v - snaive) * 1000000) AS BIGINT))
             / count(*)) / 1000000.0 AS mae_seasonal_naive,
       round(sqrt(SUM(CAST(round((v - naive) * (v - naive) * 1000000000000)
                           AS BIGINT)) / 1000000000000.0 / count(*)), 6)
         AS rmse_naive,
       round(sqrt(SUM(CAST(round((v - snaive) * (v - snaive)
                                 * 1000000000000)
                           AS BIGINT)) / 1000000000000.0 / count(*)), 6)
         AS rmse_seasonal_naive
FROM holdout GROUP BY 1
""")
def forecast_baseline_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline scorecard: naive (yesterday's value) and
    seasonal-naive (same weekday last week) predictions evaluated on
    each series' last 20% — MAE/RMSE per series, the floor every real
    forecasting model must beat before it earns a deployment. Both
    baselines are CALENDAR-keyed self-joins on d−1 / d−7, not row-offset
    lags — a missing day would silently shift a row lag onto the wrong
    weekday for every later row. Daily digest + one holdout aggregate,
    all on the series partitioning; digests round at 1e-6 per the
    module's determinism rule; the 80% cutoff rounds before its integer
    cast (the engines' bare double→int casts disagree)."""
    from ..functions.exact import exact_avg

    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
              .agg(F.round(
                  F.sum(F.round(F.col("value") * 1e6).cast("long")) / 1e6
                  / F.count(F.lit(1)), 6).alias("v")))
    n1 = days.select(F.col("event_type").alias("t1"),
                     F.col("d").alias("d1"), F.col("v").alias("naive"))
    n7 = days.select(F.col("event_type").alias("t7"),
                     F.col("d").alias("d7"), F.col("v").alias("snaive"))
    w = Window.partitionBy("event_type").orderBy("d")
    wa = Window.partitionBy("event_type")
    lagged = (days
              .join(n1, (F.col("t1") == F.col("event_type"))
                    & (F.col("d1") == F.col("d")
                       - F.expr("INTERVAL 1 DAY")), "left")
              .join(n7, (F.col("t7") == F.col("event_type"))
                    & (F.col("d7") == F.col("d")
                       - F.expr("INTERVAL 7 DAY")), "left")
              .select("event_type", "d", "v", "naive", "snaive")
              .withColumn("idx", F.row_number().over(w))
              .withColumn("n", F.count("*").over(wa)))
    hold = lagged.where((F.col("idx")
                         > F.round(F.lit(0.8) * F.col("n")).cast("long"))
                        & F.col("naive").isNotNull()
                        & F.col("snaive").isNotNull())
    # exact scaled-long error sums (the registry's float-determinism
    # discipline): abs errors at 1e-6, squared errors at 1e-12
    err = lambda p: F.col("v") - F.col(p)  # noqa: E731

    def micro_avg(col):
        # round in integer micro-units with the ORACLE'S exact operation
        # order (round(sum_micro / count) / 1e6) — composing
        # round_port(exact_avg(...)) would interpose a /1e6·1e6 round
        # trip whose last-ulp drift can flip a .5 tie
        return (F.round(F.sum(F.round(col * 1e6).cast("long"))
                        / F.count(F.lit(1))) / F.lit(1e6))

    return (hold.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_eval"),
                 micro_avg(F.abs(err("naive"))).alias("mae_naive"),
                 micro_avg(F.abs(err("snaive")))
                  .alias("mae_seasonal_naive"),
                 F.round(F.sqrt(
                     exact_avg(err("naive") * err("naive"), 12)), 6)
                  .alias("rmse_naive"),
                 F.round(F.sqrt(
                     exact_avg(err("snaive") * err("snaive"), 12)), 6)
                  .alias("rmse_seasonal_naive")))
