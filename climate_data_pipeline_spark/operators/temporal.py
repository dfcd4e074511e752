"""Temporal aggregations (SURVEY.md §2.4 A1-A4, §2.5 W1).

The reference computes these as xarray resample/groupby reductions over a
dense (time, lat, lon) grid (`/root/reference/src/climate_pipeline/metrics/
temporal.py`). In the long/tall row model each becomes a hash aggregation
on a calendar key — one shuffle, map-side partial aggregation free from
Catalyst. Series identity ("which grid cell / entity") is a caller-supplied
key column list, so the same operator serves (lat, lon) grids and
(user_id,) event streams.

All aggregates are aliased by the caller-visible names used in
``__spark_entry__.oracle_sql`` so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import season, season_year


def _cols(keys: Sequence[str | Column]) -> list[Column]:
    return [F.col(k) if isinstance(k, str) else k for k in keys]


def monthly_mean(df: DataFrame, time_col: str, value_col: str,
                 keys: Sequence[str] = (), alias: str = "avg_value") -> DataFrame:
    """Month-resampled mean — reference `metrics/temporal.py:21-44`
    (`ds.resample(time='ME').mean()`). Calendar-month truncation plays the
    role of the ME resample label."""
    month = F.date_trunc("month", F.col(time_col)).alias("month_start")
    return (df.groupBy(month, *_cols(keys))
              .agg(F.avg(value_col).alias(alias)))


def seasonal_mean(df: DataFrame, time_col: str, value_col: str,
                  keys: Sequence[str] = (), alias: str = "avg_value") -> DataFrame:
    """Seasonal (DJF/MAM/JJA/SON) mean — reference `metrics/temporal.py:47-88`.
    QE-NOV anchoring means December rolls into the next year's DJF:
    season_year = year + (month = 12)."""
    return (df.groupBy(season_year(time_col).alias("season_year"),
                       season(time_col).alias("season"),
                       *_cols(keys))
              .agg(F.avg(value_col).alias(alias)))


def annual_mean(df: DataFrame, time_col: str, value_col: str,
                keys: Sequence[str] = (), alias: str = "avg_value") -> DataFrame:
    """Year-resampled mean — reference `metrics/temporal.py:91-117`."""
    return (df.groupBy(F.year(time_col).cast("int").alias("year"), *_cols(keys))
              .agg(F.avg(value_col).alias(alias)))


def climatology(df: DataFrame, time_col: str, value_col: str,
                keys: Sequence[str] = (), groupby: str = "month",
                reference_period: tuple[str, str] | None = None,
                alias: str = "clim_value") -> DataFrame:
    """Long-term mean per month / dayofyear / season — reference
    `metrics/temporal.py:120-159`. ``reference_period`` filters rows before
    aggregating (pushed to the parquet scan by Catalyst)."""
    if reference_period is not None:
        df = df.where(F.col(time_col).between(*reference_period))
    if groupby == "month":
        key = F.month(time_col).cast("int").alias("month")
    elif groupby == "dayofyear":
        key = F.dayofyear(time_col).cast("int").alias("dayofyear")
    elif groupby == "season":
        key = season(time_col).alias("season")
    else:
        raise ValueError(f"groupby must be month|dayofyear|season, got {groupby!r}")
    return df.groupBy(key, *_cols(keys)).agg(F.avg(value_col).alias(alias))


def rolling_mean(df: DataFrame, time_col: str, value_col: str,
                 keys: Sequence[str], window: int = 5, center: bool = True,
                 min_periods: int | None = None,
                 order_cols: Sequence[str] | None = None,
                 decimal_scale: int | None = None,
                 alias: str = "rolling_mean") -> DataFrame:
    """Moving average over a row-count window per series — reference
    `metrics/temporal.py:162-192`. Row-based frames match the reference's
    `.rolling(time=k)`; ``min_periods`` (default k//2, reference lines
    184-185) nulls out under-filled frames via a count guard.

    One shuffle (partition by series key); rows within a series sort by
    time inside each partition — no global sort. Pass extra ``order_cols``
    (e.g. a unique id) to make frame membership deterministic under tied
    timestamps. ``decimal_scale`` switches the frame aggregation to an
    exact scaled-integer sum / count (see ``functions.exact``) —
    order-independent, so results reproduce bit-for-bit across
    partitionings (and match a SQL oracle).
    """
    if min_periods is None:
        min_periods = max(window // 2, 1)
    if center:
        before, after = window // 2, window - 1 - window // 2
    else:
        before, after = window - 1, 0
    order = _cols(order_cols if order_cols is not None else [time_col])
    w = (Window.partitionBy(*_cols(keys))
               .orderBy(*order)
               .rowsBetween(-before, after))
    if decimal_scale is None:
        mean = F.avg(value_col).over(w)
    else:
        factor = float(10 ** decimal_scale)
        scaled = F.round(F.col(value_col) * factor).cast("long")
        mean = (F.sum(scaled).over(w) / factor) / F.count(value_col).over(w)
    guarded = F.when(F.count(value_col).over(w) >= min_periods, mean)
    return df.withColumn(alias, guarded)


def resample_ffill(df: DataFrame, time_col: str, value_col: str,
                   keys: Sequence[str], freq: str = "day") -> DataFrame:
    """Gap-filling resample: a dense per-entity time grid at ``freq``
    with the last observation carried forward — the row-model analogue
    of xarray's ``resample(...).ffill()`` (the reference's resample
    family, `metrics/temporal.py:21-117`, only needs ``.mean()``; the
    forward-fill completes it for sparse/irregular series).

    Three steps, each shuffle-minimal:
    1. last observation per (entity, bucket) — ties on the timestamp
       resolve by the larger value via a lexicographic struct max, so
       the result is partition-order independent;
    2. dense bucket spine per entity via `sequence()` + explode between
       that entity's min and max bucket — generated, never shuffled
       (the explode multiplies rows map-side);
    3. forward fill = `last(value, ignorenulls=True)` over an
       unbounded-preceding window per entity.
    Shuffles: one for the bucket agg, one window sort per entity —
    both on the same (keys) partitioning, which AQE reuses.

    Output: (keys..., bucket, <value_col> (filled), observed flag)."""
    klist = list(keys)
    bucket = F.date_trunc(freq, F.col(time_col)).alias("bucket")
    obs = (df.groupBy(*_cols(klist), bucket)
             .agg(F.max(F.struct(F.col(time_col).alias("t"),
                                 F.col(value_col).alias("v"))).alias("s"))
             .select(*klist, "bucket", F.col("s.v").alias("__obs")))
    step = F.expr(f"interval 1 {freq}")
    spine = (df.groupBy(*_cols(klist))
               .agg(F.date_trunc(freq, F.min(time_col)).alias("lo"),
                    F.date_trunc(freq, F.max(time_col)).alias("hi"))
               .select(*klist, F.explode(
                   F.sequence(F.col("lo"), F.col("hi"), step)).alias("bucket")))
    joined = spine.join(obs, [*klist, "bucket"], "left")
    w = (Window.partitionBy(*klist).orderBy("bucket")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        *klist, "bucket",
        F.last("__obs", ignorenulls=True).over(w).alias(value_col),
        F.col("__obs").isNotNull().alias("observed"))
