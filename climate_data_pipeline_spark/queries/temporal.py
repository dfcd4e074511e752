"""Temporal-aggregation queries (SURVEY.md §2.4 A1-A4, §2.5 W1) + flagship.

The climate analogue on driver data: `lineitem`/`orders` play the role of
the multi-year daily time series (l_shipdate / o_orderdate spans 1995-2001),
`events` plays the per-entity high-frequency stream (30 days of per-user
events) for rolling windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import exact_avg, exact_sum, sql_exact_avg, sql_exact_sum
from ..operators import temporal as T
from ..registry import query
from ..sources.io import load_table


# --- flagship: TPC-H Q1-style pricing summary (scan → filter → group-agg) ---

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query — full-table aggregation with 8 aggregates, the
    canonical OLAP scan-agg shape (maps to reference A11/A12 global stats,
    `src/arco_demo.py:234-260`)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
              F.sum("l_quantity").alias("sum_qty"),
              exact_sum("l_extendedprice", 2).alias("sum_base_price"),
              exact_sum(disc_price, 4).alias("sum_disc_price"),
              exact_sum(charge, 6).alias("sum_charge"),
              (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
              exact_avg("l_extendedprice", 2).alias("avg_price"),
              exact_avg("l_discount", 2).alias("avg_disc"),
              F.count("*").alias("count_order"),
          )
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       {sql_exact_sum('l_extendedprice', 2)} AS sum_base_price,
       {sql_exact_sum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
       {sql_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       {sql_exact_avg('l_extendedprice', 2)} AS avg_price,
       {sql_exact_avg('l_discount', 2)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

query("a11_pricing_summary", oracle=PRICING_SUMMARY_SQL)(pricing_summary)


# --- A1: monthly mean ---

@query("a1_monthly_mean", oracle=f"""
SELECT date_trunc('month', o_orderdate) AS month_start,
       {sql_exact_avg('o_totalprice', 2)} AS avg_value,
       COUNT(*) AS n
FROM orders
GROUP BY 1
""")
def monthly_mean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference `compute_monthly_mean` (`metrics/temporal.py:21-44`) on the
    orders series: mean order value per calendar month, 1995-2001."""
    df = load_table(spark, sf_dir, "orders")
    return (df.groupBy(F.date_trunc("month", "o_orderdate").alias("month_start"))
              .agg(exact_avg("o_totalprice", 2).alias("avg_value"),
                   F.count("*").alias("n")))


# --- §2.9: the incremental (Structured Streaming) twin of A1, under the
# --- same oracle gate as every batch operator ---

@query("stream_rollup_parity", oracle=f"""
SELECT date_trunc('day', ts) AS window_start,
       event_type,
       COUNT(*) AS n,
       {sql_exact_sum('value', 2)} AS sum_value
FROM events
GROUP BY 1, 2
""")
def stream_rollup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replays the events table through the Structured Streaming tumbling
    rollup (``streaming/rollup.streaming_rollup``: file stream →
    watermark → windowed agg → memory sink, driven to completion) and
    returns the sink contents as a batch DataFrame. The value aggregate
    is the scaled-integer exact sum, so the incremental accumulation
    across micro-batches is associative and the result hash-matches the
    one-shot batch SQL the oracle runs — the streaming twin proven
    equivalent to its batch operator, not just 'runs'."""
    from ..streaming.rollup import run_stream_to_memory, streaming_rollup

    agg = streaming_rollup(spark, sf_dir, window="1 day",
                           watermark="1 hour", exact_scale=2)
    sink = "stream_rollup_parity_sink"
    spark.catalog.dropTempView(sink)          # no-op when absent
    run_stream_to_memory(agg, sink, output_mode="complete")
    return spark.table(sink)


# --- A2: seasonal mean (DJF/MAM/JJA/SON with December→next season-year) ---

@query("a2_seasonal_mean", oracle="""
SELECT CAST(year(l_shipdate) + CASE WHEN month(l_shipdate) = 12 THEN 1 ELSE 0 END AS INTEGER) AS season_year,
       CASE WHEN month(l_shipdate) IN (12, 1, 2) THEN 'DJF'
            WHEN month(l_shipdate) IN (3, 4, 5)  THEN 'MAM'
            WHEN month(l_shipdate) IN (6, 7, 8)  THEN 'JJA'
            ELSE 'SON' END AS season,
       AVG(l_quantity) AS avg_value
FROM lineitem
GROUP BY 1, 2
""")
def seasonal_mean_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference `compute_seasonal_mean` (`metrics/temporal.py:47-88`):
    QE-NOV anchored seasons; avg(l_quantity) is an exact integer sum so the
    plain AVG is bit-deterministic."""
    df = load_table(spark, sf_dir, "lineitem")
    return T.seasonal_mean(df, "l_shipdate", "l_quantity")


# --- A3: annual mean ---

@query("a3_annual_mean", oracle=f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
       {sql_exact_avg('o_totalprice', 2)} AS avg_value,
       COUNT(*) AS n
FROM orders
GROUP BY 1
""")
def annual_mean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference `compute_annual_mean` (`metrics/temporal.py:91-117`)."""
    df = load_table(spark, sf_dir, "orders")
    return (df.groupBy(F.year("o_orderdate").cast("int").alias("year"))
              .agg(exact_avg("o_totalprice", 2).alias("avg_value"),
                   F.count("*").alias("n")))


# --- A4: climatology (month-of-year long-term mean, reference period) ---

@query("a4_climatology_month", oracle="""
SELECT CAST(month(l_shipdate) AS INTEGER) AS month,
       l_returnflag,
       AVG(l_quantity) AS clim_value
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1999-12-31'
GROUP BY 1, 2
""")
def climatology_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference `compute_climatology` (`metrics/temporal.py:120-159`) with
    a reference-period filter (pushed down to the parquet scan)."""
    df = load_table(spark, sf_dir, "lineitem")
    return T.climatology(df, "l_shipdate", "l_quantity", keys=["l_returnflag"],
                         groupby="month",
                         reference_period=("1995-01-01", "1999-12-31"))


@query("a4_climatology_season", oracle="""
SELECT CASE WHEN month(l_shipdate) IN (12, 1, 2) THEN 'DJF'
            WHEN month(l_shipdate) IN (3, 4, 5)  THEN 'MAM'
            WHEN month(l_shipdate) IN (6, 7, 8)  THEN 'JJA'
            ELSE 'SON' END AS season,
       AVG(l_quantity) AS clim_value
FROM lineitem
GROUP BY 1
""")
def climatology_season(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    return T.climatology(df, "l_shipdate", "l_quantity", groupby="season")


# --- W1: centered rolling mean with min_periods ---

@query("w1_rolling_mean", oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
       CASE WHEN COUNT(value) OVER w >= 3
            THEN (SUM(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0)
                 / COUNT(value) OVER w
       END AS rolling_mean
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
""")
def rolling_mean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference `compute_rolling_mean` (`metrics/temporal.py:162-192`):
    centered window of 7 per user series, min_periods = 7//2 = 3. One
    shuffle on user_id; in-partition sort by (ts, event_id)."""
    df = load_table(spark, sf_dir, "events")
    out = T.rolling_mean(df, "ts", "value", keys=["user_id"], window=7,
                         center=True, order_cols=["ts", "event_id"],
                         decimal_scale=2)
    return out.select("event_id", "user_id", "ts", "value", "rolling_mean")


@query("hopping_window", oracle="""
SELECT make_timestamp(gs) AS window_start, event_type,
       count(*) AS n,
       (SUM(CAST(round(value * 100) AS BIGINT)) / 100.0) AS sum_value
FROM events e,
LATERAL (SELECT unnest(generate_series(
           ((epoch_us(ts) - 600000000) // 300000000 + 1) * 300000000,
           (epoch_us(ts) // 300000000) * 300000000,
           300000000)) AS gs) t
GROUP BY 1, 2
""")
def hopping_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregate: 10-minute windows every 5
    minutes over the event stream — each event lands in size/slide = 2
    windows. Spark's ``window(ts, size, slide)`` explodes rows into their
    windows JVM-side; the oracle derives the same window starts with
    epoch-microsecond arithmetic (windows are epoch-aligned in both
    engines). Value sums use the scaled-integer exact form."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (ev.groupBy(w.alias("w"), "event_type")
              .agg(F.count("*").alias("n"),
                   (F.sum(F.round(F.col("value") * 100).cast("long"))
                    / 100.0).alias("sum_value"))
              .select(F.col("w.start").alias("window_start"),
                      "event_type", "n", "sum_value"))


@query("rolling_time_range", oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       SUM(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0 AS trailing_sum,
       CAST(COUNT(value) OVER w AS BIGINT) AS n_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
""")
def rolling_time_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frames (vs W1's row-count frames): per-user
    trailing 1-hour sum/count. Spark's rangeBetween runs on microsecond
    epochs so the frame boundary is bit-identical to DuckDB's INTERVAL
    arithmetic (timestamps are micros in both after the nanos loader).
    Same single-shuffle shape as every window op: partition by series
    key, sort within partition."""
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
               .orderBy(F.unix_micros("ts"))
               .rangeBetween(-3_600_000_000, 0))
    return ev.select(
        "event_id", "user_id", "ts",
        (F.sum(F.round(F.col("value") * 100).cast("long")).over(w) / 100.0)
            .alias("trailing_sum"),
        F.count("value").over(w).alias("n_window"))


@query("w4_resample_ffill", oracle="""
WITH obs AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         (max({'t': ts, 'v': value})).v AS v
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM events GROUP BY 1
), spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM spans
)
SELECT s.user_id, s.bucket,
       last_value(o.v IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       o.v IS NOT NULL AS observed
FROM spine s LEFT JOIN obs o USING (user_id, bucket)
""")
def resample_ffill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled per-user series: dense spine + last-observation
    carried forward (`operators/temporal.resample_ffill`). Roughly half
    the hourly buckets have no event at sf0.01, so the fill is doing
    real work; the `observed` flag keeps imputed rows distinguishable
    downstream."""
    e = load_table(spark, sf_dir, "events")
    return T.resample_ffill(e, "ts", "value", ["user_id"], freq="hour")


@query("spell_summary_users", oracle="""
WITH hits AS (
  SELECT user_id, date_trunc('day', ts) AS bucket
  FROM events GROUP BY 1, 2
  HAVING max(CASE WHEN value > 60 THEN 1 ELSE 0 END) = 1
), islands AS (
  SELECT user_id, bucket,
         CAST(epoch(bucket) // 86400 AS BIGINT)
         - row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS island
  FROM hits
), sp AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS spell_len
  FROM islands GROUP BY 1, 2
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_spells,
       max(spell_len) AS max_spell,
       CAST(sum(spell_len) AS BIGINT) AS hit_buckets
FROM sp GROUP BY 1
""")
def spell_summary_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-exceedance spells (gaps-and-islands) per user: days
    whose max event value exceeds 60, grouped into maximal consecutive
    runs — the ETCCDI warm-spell/consecutive-dry-days index shape
    (`operators/temporal.spells`). Summary = count/longest/total."""
    e = load_table(spark, sf_dir, "events")
    return T.spell_summary(e, "ts", F.col("value") > 60, ["user_id"],
                           freq="day")


@query("w5_resample_interp", oracle="""
WITH obs AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         (max({'t': ts, 'v': value})).v AS v
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM events GROUP BY 1
), spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM spans
), j AS (
  SELECT s.user_id, s.bucket, o.v
  FROM spine s LEFT JOIN obs o USING (user_id, bucket)
), br AS (
  SELECT user_id, bucket, v,
    last_value(v IGNORE NULLS) OVER pre AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER pre AS pt,
    first_value(v IGNORE NULLS) OVER post AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER post AS nt
  FROM j
  WINDOW pre AS (PARTITION BY user_id ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         post AS (PARTITION BY user_id ORDER BY bucket
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, bucket,
       CAST(floor((CASE WHEN v IS NOT NULL THEN v
             ELSE pv + (nv - pv) * ((epoch(bucket) - epoch(pt))
                                  / (epoch(nt) - epoch(pt))) END) * 1e6)
            AS BIGINT) AS value_micro,
       v IS NOT NULL AS observed
FROM br
""")
def resample_interp_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled per-user series with *linear interpolation*
    between the bracketing observations (`operators/temporal.
    resample_interp`) — xarray `interpolate_na` semantics in the row
    model; compare `w4_resample_ffill` for the carry-forward variant.

    Output quantized via floor(value·1e6): interpolated midpoints of
    1e-6-quantized inputs land exactly on decimal round-half boundaries,
    where Spark (BigDecimal HALF_UP) and DuckDB (fp-multiply) `round`
    disagree; floor over the bit-identical IEEE product is tie-free."""
    e = load_table(spark, sf_dir, "events")
    out = T.resample_interp(e, "ts", "value", ["user_id"], freq="hour")
    return out.select("user_id", "bucket",
                      F.floor(F.col("value") * 1e6).cast("long")
                       .alias("value_micro"), "observed")


@query("ewma_user_series", oracle="""
WITH seq AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
  FROM events
)
SELECT a.user_id, a.event_id,
       round(sum(power(0.7, a.i - b.i) * b.value)
             / sum(power(0.7, a.i - b.i)), 4) AS ewma
FROM seq a JOIN seq b ON a.user_id = b.user_id AND b.i <= a.i
GROUP BY a.user_id, a.event_id
""")
def ewma_user_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α=0.3, adjust-style normalized weights) per user event
    series — the sequential-recurrence kernel via the A9 grouped-map
    Arrow shape (`operators/temporal.ewma`), O(n) per series. The oracle
    expands the closed-form weighted sum O(n²)-laterally, which only the
    oracle can afford; equality of the two formulations is the check."""
    e = load_table(spark, sf_dir, "events")
    out = T.ewma(e, "ts", "value", ["user_id"], alpha=0.3,
                 order_cols=["ts", "event_id"])
    return out.select("user_id", "event_id", F.round("ewma", 4).alias("ewma"))


@query("wsdi_warm_spell_index", oracle="""
WITH thr AS (
  SELECT user_id, round(quantile_cont(value, 0.9), 6) AS p90
  FROM events GROUP BY 1
), hits AS (
  SELECT e.user_id, date_trunc('day', e.ts) AS bucket
  FROM events e JOIN thr USING (user_id)
  GROUP BY 1, 2
  HAVING max(CASE WHEN e.value > p90 THEN 1 ELSE 0 END) = 1
), islands AS (
  SELECT user_id, bucket,
         CAST(epoch(bucket) // 86400 AS BIGINT)
         - row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS island
  FROM hits
), sp AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS spell_len
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_warm_spells,
       CAST(sum(spell_len) AS BIGINT) AS wsdi_days,
       max(spell_len) AS longest
FROM sp
WHERE spell_len >= 3
GROUP BY user_id
""")
def wsdi_warm_spell_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETCCDI WSDI shape — warm-spell duration index: per entity, total
    days inside runs of ≥3 consecutive days whose daily max exceeds the
    entity's own 90th percentile. A pure composition of the engine's
    operators: exact grouped percentile (A5) → broadcast threshold join
    (J2) → gaps-and-islands spells → length filter + digest. Thresholds
    round at 1e-6 in BOTH engines before the strict comparison (values
    are 1e-2-quantized, so the rounding can never cross a data value —
    it just removes interpolation ulp risk between engines). Plan: one
    percentile-agg shuffle, broadcast join (thresholds = one row per
    entity), spell windows reusing the entity partitioning."""
    e = load_table(spark, sf_dir, "events")
    thr = (e.groupBy("user_id")
            .agg(F.round(F.percentile("value", 0.9), 6).alias("p90")))
    d = e.join(F.broadcast(thr), "user_id")
    sp = T.spells(d, "ts", F.col("value") > F.col("p90"), ["user_id"],
                  freq="day")
    return (sp.where(F.col("spell_len") >= 3)
              .groupBy("user_id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_warm_spells"),
                   F.sum("spell_len").cast("long").alias("wsdi_days"),
                   F.max("spell_len").alias("longest")))


@query("etccdi_day_counts", oracle="""
WITH thr AS (
  SELECT user_id, round(quantile_cont(value, 0.9), 6) AS p90,
         round(quantile_cont(value, 0.1), 6) AS p10
  FROM events GROUP BY 1
), days AS (
  SELECT user_id, date_trunc('day', ts) AS d,
         max(value) AS dmax, min(value) AS dmin
  FROM events GROUP BY 1, 2
)
SELECT user_id, date_trunc('month', d) AS month,
       CAST(sum(CASE WHEN dmax > p90 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_warm_days,
       CAST(sum(CASE WHEN dmin < p10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cold_days,
       CAST(count(*) AS BIGINT) AS n_days
FROM days JOIN thr USING (user_id)
GROUP BY 1, 2
""")
def etccdi_day_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETCCDI percentile-day counts (TX90p/TN10p shape): per entity and
    month, how many days' maximum exceeded the entity's p90 and how many
    days' minimum undercut its p10. Two hash aggs (daily digest, monthly
    counts) + a broadcast threshold join; thresholds round at 1e-6 in
    both engines (same ulp discipline as the WSDI query)."""
    e = load_table(spark, sf_dir, "events")
    thr = (e.groupBy("user_id")
            .agg(F.round(F.percentile("value", 0.9), 6).alias("p90"),
                 F.round(F.percentile("value", 0.1), 6).alias("p10")))
    days = (e.groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
             .agg(F.max("value").alias("dmax"), F.min("value").alias("dmin")))
    return (days.join(F.broadcast(thr), "user_id")
                .groupBy("user_id", F.date_trunc("month", "d").alias("month"))
                .agg(F.sum(F.when(F.col("dmax") > F.col("p90"), 1)
                            .otherwise(0)).cast("long").alias("n_warm_days"),
                     F.sum(F.when(F.col("dmin") < F.col("p10"), 1)
                            .otherwise(0)).cast("long").alias("n_cold_days"),
                     F.count(F.lit(1)).alias("n_days")))


@query("a4_climatology_hour", oracle=f"""
SELECT CAST(hour(ts) AS INTEGER) AS hour, event_type,
       {sql_exact_avg('value')} AS clim_value
FROM events
GROUP BY 1, 2
""")
def climatology_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal-cycle climatology: hour-of-day long-term mean per
    event_type — the sub-daily grouper the reference's month/doy/season
    set lacks (A4 family, engine addition). Single hash-agg shuffle,
    exact scaled-long mean."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.hour("ts").cast("int").alias("hour"), "event_type")
             .agg(exact_avg("value").alias("clim_value")))


@query("seasonal_decompose", oracle="""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS d,
         SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 / COUNT(*) AS dval
  FROM events GROUP BY 1, 2
), t AS (
  -- scaled-long window sums: FP summation order inside a window frame
  -- is engine- and partition-dependent; integer sums are associative,
  -- so trend/seasonal are bit-identical under any partitioning.
  -- RANGE over the integer day ordinal = a CALENDAR ±3-day frame: a
  -- ROWS frame would span arbitrarily many calendar days across gaps
  SELECT user_id, d, dval,
         (SUM(CAST(round(dval * 1000000000) AS BIGINT)) OVER w7
            / 1000000000.0) / COUNT(*) OVER w7 AS trend
  FROM daily
  WINDOW w7 AS (PARTITION BY user_id
                ORDER BY CAST(epoch(d) // 86400 AS BIGINT)
                RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), s AS (
  SELECT *, dval - trend AS detr,
         (SUM(CAST(round((dval - trend) * 1000000000) AS BIGINT)) OVER wd
            / 1000000000.0) / COUNT(*) OVER wd AS seasonal
  FROM t
  WINDOW wd AS (PARTITION BY user_id, dayofweek(d))
)
SELECT user_id, d,
       -- + 0.0 collapses IEEE -0.0 (DuckDB round keeps the sign of a
       -- rounded-away negative; Spark's BigDecimal path does not)
       round(trend * 1000000) / 1000000.0 + 0.0 AS trend,
       round(seasonal * 1000000) / 1000000.0 + 0.0 AS seasonal,
       round((detr - seasonal) * 1000000) / 1000000.0 + 0.0 AS residual
FROM s
""")
def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive decomposition of each daily series into trend + weekly
    seasonal + residual (classical-decomposition / STL-lite shape):
    trend = centered 7-CALENDAR-day rolling mean (a RANGE frame over
    the day ordinal: missing days contribute nothing, so a gap never
    stretches the window across non-adjacent dates the way a ROWS
    frame would; series edges average the days available, the standard
    centered-rolling boundary behavior); seasonal = day-of-week mean of
    the detrended series (an entire-partition window — no join);
    residual = the rest, so trend + seasonal + residual == daily value
    exactly. One shuffle on the series key feeds daily agg, trend frame,
    and seasonal window alike. Day-of-week labels differ between engines
    (Spark 1-7, DuckDB 0-6) but induce the same partition classes, which
    is all the window needs. Window averages accumulate as scale-9
    longs (`functions/exact.py` discipline): double summation order in
    a window frame is partition-dependent, integer sums are not."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
              .agg((F.sum(F.round(F.col("value") * 100).cast("long"))
                    / 100.0 / F.count(F.lit(1))).alias("dval")))
    from pyspark.sql import Window

    def exact_wavg(col, w):
        q = F.round(F.col(col) * 1e9).cast("long")
        return (F.sum(q).over(w) / 1e9) / F.count(F.lit(1)).over(w)

    daily = daily.withColumn(
        "__dord", F.floor(F.unix_timestamp("d") / 86400))
    wt = (Window.partitionBy("user_id").orderBy("__dord")
                .rangeBetween(-3, 3))
    t = daily.withColumn("trend", exact_wavg("dval", wt)).drop("__dord")
    ws = Window.partitionBy("user_id", F.dayofweek("d"))
    s = (t.withColumn("detr", F.col("dval") - F.col("trend"))
          .withColumn("seasonal", exact_wavg("detr", ws)))
    return s.select(
        "user_id", "d",
        (F.round(F.col("trend") * 1e6) / 1e6 + 0.0).alias("trend"),
        (F.round(F.col("seasonal") * 1e6) / 1e6 + 0.0).alias("seasonal"),
        (F.round((F.col("detr") - F.col("seasonal")) * 1e6) / 1e6 + 0.0)
        .alias("residual"))


@query("csdi_cold_spell_index", oracle="""
WITH thr AS (
  SELECT user_id, round(quantile_cont(value, 0.1), 6) AS p10
  FROM events GROUP BY 1
), hits AS (
  SELECT e.user_id, date_trunc('day', e.ts) AS bucket
  FROM events e JOIN thr USING (user_id)
  GROUP BY 1, 2
  HAVING min(CASE WHEN e.value < p10 THEN e.value ELSE NULL END) IS NOT NULL
), islands AS (
  SELECT user_id, bucket,
         CAST(epoch(bucket) // 86400 AS BIGINT)
         - row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS island
  FROM hits
), sp AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS spell_len
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_cold_spells,
       CAST(sum(spell_len) AS BIGINT) AS csdi_days,
       max(spell_len) AS longest
FROM sp
WHERE spell_len >= 3
GROUP BY user_id
""")
def csdi_cold_spell_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETCCDI CSDI — the cold counterpart of `wsdi_warm_spell_index`:
    days inside runs of ≥3 consecutive days with any value below the
    entity's 10th percentile. Same plan shape (percentile agg →
    broadcast threshold → gaps-and-islands) and the same 1e-6 threshold
    rounding discipline."""
    e = load_table(spark, sf_dir, "events")
    thr = (e.groupBy("user_id")
            .agg(F.round(F.percentile("value", 0.1), 6).alias("p10")))
    d = e.join(F.broadcast(thr), "user_id")
    sp = T.spells(d, "ts", F.col("value") < F.col("p10"), ["user_id"],
                  freq="day")
    return (sp.where(F.col("spell_len") >= 3)
              .groupBy("user_id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_cold_spells"),
                   F.sum("spell_len").cast("long").alias("csdi_days"),
                   F.max("spell_len").alias("longest")))


@query("season_onset_date", oracle="""
WITH hits AS (
  SELECT user_id, date_trunc('day', ts) AS bucket
  FROM events GROUP BY 1, 2
  HAVING max(CASE WHEN value > 60 THEN 1 ELSE 0 END) = 1
), islands AS (
  SELECT user_id, bucket,
         CAST(epoch(bucket) // 86400 AS BIGINT)
         - row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS island
  FROM hits
), sp AS (
  SELECT user_id, island, min(bucket) AS spell_start,
         CAST(count(*) AS BIGINT) AS spell_len
  FROM islands GROUP BY 1, 2
)
SELECT user_id, CAST(year(spell_start) AS INTEGER) AS yr,
       min(spell_start) AS onset,
       CAST(count(*) AS BIGINT) AS n_spells
FROM sp
WHERE spell_len >= 3
GROUP BY 1, 2
""")
def season_onset_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growing-season-onset shape (GSL family): per entity and year, the
    start date of the first run of ≥3 consecutive exceedance days — the
    date-valued counterpart of the spell digests (the reference's
    exceedance machinery answers *whether*; this answers *when the
    season starts*). Spells crossing New Year belong to their start
    year in both engines (grouped on year(spell_start))."""
    e = load_table(spark, sf_dir, "events")
    sp = T.spells(e, "ts", F.col("value") > 60, ["user_id"], freq="day")
    return (sp.where(F.col("spell_len") >= 3)
              .groupBy("user_id",
                       F.year("spell_start").cast("int").alias("yr"))
              .agg(F.min("spell_start").alias("onset"),
                   F.count(F.lit(1)).alias("n_spells")))


@query("etccdi_rx5day", oracle="""
WITH days AS (
  SELECT user_id, date_trunc('day', ts) AS d,
         round(SUM(value), 6) AS dsum
  FROM events GROUP BY 1, 2
),
win AS (
  -- RANGE over the day ordinal = a CALENDAR 5-day window: days absent
  -- from the series contribute 0 (no accumulation), where a ROWS frame
  -- would stitch 5 OBSERVED days spanning arbitrarily many calendar
  -- days across gaps and mislabel the result "5 consecutive days"
  SELECT user_id, d, dsum,
         round(SUM(dsum) OVER (
             PARTITION BY user_id
             ORDER BY CAST(epoch(d) // 86400 AS BIGINT)
             RANGE BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS r5
  FROM days
)
SELECT user_id, max(r5) AS rx5day, CAST(count(*) AS BIGINT) AS n_windows
FROM win
GROUP BY 1
""")
def etccdi_rx5day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETCCDI Rx5day: the maximum accumulation over any 5 CONSECUTIVE
    CALENDAR days per entity — daily digest, a calendar-RANGE running
    frame over the day ordinal (days with no events accumulate 0; a
    ROWS frame over observed days would silently span gaps), one max.
    Windows are anchored at observed days, which is lossless: a window
    ending on an unobserved day contains a subset of the observed days
    of the window ending on its last observed day. The daily sums round
    at 1e-6 BEFORE the running window so both engines accumulate
    identical values; at scale this is the single-shuffle daily-digest
    + series-window shape of w1_rolling_mean."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    days = (e.groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
             .agg(F.round(F.sum("value"), 6).alias("dsum"))
             .withColumn("__dord", F.floor(F.unix_timestamp("d") / 86400)))
    w = (Window.partitionBy("user_id").orderBy("__dord")
               .rangeBetween(-4, 0))
    win = days.withColumn("r5", F.round(F.sum("dsum").over(w), 6))
    return (win.groupBy("user_id")
               .agg(F.max("r5").alias("rx5day"),
                    F.count(F.lit(1)).alias("n_windows")))


@query("etccdi_r95ptot", oracle="""
WITH thr AS (
  SELECT user_id, round(quantile_cont(value, 0.95), 6) AS p95
  FROM events GROUP BY 1
)
SELECT e.user_id,
       round(SUM(CASE WHEN e.value > t.p95 THEN e.value ELSE 0 END), 6)
         AS r95_sum,
       round(SUM(e.value), 6) AS total_sum,
       round(SUM(CASE WHEN e.value > t.p95 THEN e.value ELSE 0 END)
             / SUM(e.value), 6) AS r95ptot,
       CAST(SUM(CASE WHEN e.value > t.p95 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_extreme
FROM events e JOIN thr t USING (user_id)
GROUP BY 1
""")
def etccdi_r95ptot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETCCDI R95pTOT: the share of an entity's total accumulation
    contributed by its > p95 extremes — the "how concentrated are the
    extremes" index. Broadcast per-entity threshold + one conditional
    aggregation; sums round at 1e-6 against partition-order ulps in
    both engines."""
    e = load_table(spark, sf_dir, "events")
    thr = (e.groupBy("user_id")
            .agg(F.round(F.percentile("value", 0.95), 6).alias("p95")))
    j = e.join(F.broadcast(thr), "user_id")
    ext = F.when(F.col("value") > F.col("p95"), F.col("value")).otherwise(0.0)
    return (j.groupBy("user_id")
             .agg(F.round(F.sum(ext), 6).alias("r95_sum"),
                  F.round(F.sum("value"), 6).alias("total_sum"),
                  F.round(F.sum(ext) / F.sum("value"), 6).alias("r95ptot"),
                  F.sum(F.when(F.col("value") > F.col("p95"), 1)
                         .otherwise(0)).cast("long").alias("n_extreme")))


@query("etccdi_dtr_sdii", oracle="""
WITH days AS (
  SELECT user_id, date_trunc('day', ts) AS d,
         max(value) AS dmax, min(value) AS dmin,
         round(SUM(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 6)
           AS dsum,
         count(*) AS n_obs
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       round(SUM(CAST(round((dmax - dmin) * 1000000) AS BIGINT))
             / 1000000.0 / count(*), 6) AS dtr,
       -- zero wet days -> NULL (undefined intensity), never a fake 0
       CASE WHEN SUM(CASE WHEN dsum > 50 THEN 1 ELSE 0 END) = 0 THEN NULL
            ELSE round(SUM(CASE WHEN dsum > 50
                                THEN CAST(round(dsum * 1000000) AS BIGINT)
                                ELSE 0 END)
                       / 1000000.0
                       / SUM(CASE WHEN dsum > 50 THEN 1 ELSE 0 END), 6)
       END AS sdii,
       CAST(SUM(CASE WHEN dsum > 50 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_wet_days,
       CAST(count(*) AS BIGINT) AS n_days
FROM days GROUP BY 1
""")
def etccdi_dtr_sdii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two simple-index staples on the daily digest: DTR (mean diurnal
    range, max−min per day) and SDII (mean accumulation on "wet" days —
    daily sum above a threshold; NULL when an entity has NO wet days —
    an undefined intensity must not masquerade as a real 0). One digest
    aggregation + one per-entity roll-up; exact micro-unit sums
    everywhere a float average crosses a group boundary."""
    e = load_table(spark, sf_dir, "events")
    micro = lambda c: F.round(c * 1e6).cast("long")  # noqa: E731
    days = (e.groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
             .agg(F.max("value").alias("dmax"),
                  F.min("value").alias("dmin"),
                  F.round(F.sum(micro(F.col("value"))) / 1e6, 6)
                   .alias("dsum"),
                  F.count(F.lit(1)).alias("n_obs")))
    wet = F.col("dsum") > 50
    return (days.groupBy("user_id")
            .agg(F.round(F.sum(micro(F.col("dmax") - F.col("dmin"))) / 1e6
                         / F.count(F.lit(1)), 6).alias("dtr"),
                 F.when(F.sum(F.when(wet, 1).otherwise(0)) == 0,
                        F.lit(None)).otherwise(
                     F.round(F.sum(F.when(wet, micro(F.col("dsum")))
                                    .otherwise(0)) / 1e6
                             / F.sum(F.when(wet, 1).otherwise(0)), 6))
                  .alias("sdii"),
                 F.sum(F.when(wet, 1).otherwise(0)).cast("long")
                  .alias("n_wet_days"),
                 F.count(F.lit(1)).alias("n_days")))
