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
from pyspark.sql import types as T

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
    elif groupby == "hour":
        # diurnal-cycle climatology (engine addition: sub-daily data,
        # which the reference's month/doy/season groupers can't resolve)
        key = F.hour(time_col).cast("int").alias("hour")
    else:
        raise ValueError(
            f"groupby must be month|dayofyear|season|hour, got {groupby!r}")
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


_FREQ_SECONDS = {"hour": 3600, "day": 86400, "week": 604800}


def spells(df: DataFrame, time_col: str, cond: Column,
           keys: Sequence[str], freq: str = "day") -> DataFrame:
    """Consecutive-exceedance runs ("spells") per entity — the temporal
    clustering behind standard climate indices (warm-spell duration,
    consecutive dry days): the reference computes *how often* a threshold
    is exceeded (`metrics/percentiles.py:80-112`); this computes *how
    long* exceedances persist, which is what heatwave/drought definitions
    actually need.

    Classic gaps-and-islands, fully relational:
    1. bucket to ``freq`` and mark a bucket "hit" when any row satisfies
       ``cond`` (one hash agg — the only data shuffle);
    2. island id = bucket ordinal − row_number(): constant within each
       maximal run of consecutive hit buckets (needs the per-entity sort
       the agg partitioning already provides);
    3. one more agg per (entity, island) → spell start/end/length.
    Both window and final agg reuse the (keys) partitioning, so at scale
    this is bucket-agg shuffle + AQE-coalesced same-key stages.

    Output: (keys..., spell_start, spell_end, spell_len) — one row per
    maximal run of consecutive hit buckets."""
    if freq not in _FREQ_SECONDS:
        raise ValueError(f"freq must be one of {sorted(_FREQ_SECONDS)}")
    klist = list(keys)
    bucket = F.date_trunc(freq, F.col(time_col)).alias("bucket")
    hits = (df.groupBy(*_cols(klist), bucket)
              .agg(F.max(cond.cast("int")).alias("__hit"))
              .where(F.col("__hit") == 1))
    # floor, not cast: truncation-toward-zero gives pre-epoch buckets
    # (unix < 0 — 1950s-60s climate baselines, or any positive-offset
    # session zone around 1970) duplicate ordinals across the epoch,
    # breaking the ordinal − row_number island constant
    ordinal = F.floor(F.unix_timestamp("bucket") / F.lit(_FREQ_SECONDS[freq]))
    rn = F.row_number().over(Window.partitionBy(*klist).orderBy("bucket"))
    islands = hits.withColumn("__island", ordinal - rn)
    return (islands.groupBy(*klist, "__island")
            .agg(F.min("bucket").alias("spell_start"),
                 F.max("bucket").alias("spell_end"),
                 F.count("*").cast("long").alias("spell_len"))
            .drop("__island"))


def spell_summary(df: DataFrame, time_col: str, cond: Column,
                  keys: Sequence[str], freq: str = "day") -> DataFrame:
    """Per-entity spell digest: number of spells, longest spell, total hit
    buckets. The per-entity scalar a drought/heatwave index reports
    (e.g. ETCCDI-style CDD = max consecutive dry days)."""
    return (spells(df, time_col, cond, keys, freq)
            .groupBy(*_cols(list(keys)))
            .agg(F.count("*").cast("long").alias("n_spells"),
                 F.max("spell_len").alias("max_spell"),
                 F.sum("spell_len").alias("hit_buckets")))


def resample_interp(df: DataFrame, time_col: str, value_col: str,
                    keys: Sequence[str], freq: str = "day") -> DataFrame:
    """Gap-filling resample with *linear interpolation* — the row-model
    analogue of xarray's ``interpolate_na`` over a resampled series
    (complements :func:`resample_ffill`; the reference's rank kernel
    already leans on `np.interp`, `metrics/anomalies.py:162-170`).

    Same dense-spine construction as :func:`resample_ffill` (tie-safe
    struct max per bucket, `sequence()` spine, one agg shuffle), then the
    bracketing observations via two ignore-nulls windows — previous obs
    with `last()` over the preceding frame, next obs with `first()` over
    the following frame — and the interpolation weight from the bucket's
    position between them. The spine spans each entity's own [min, max]
    bucket, so every gap is interior: both brackets always exist.

    Output: (keys..., bucket, <value_col> interpolated, observed)."""
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
    back = (Window.partitionBy(*klist).orderBy("bucket")
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # the "next observation" uses last() over the REVERSED order, not
    # first() over [current, unbounded following]: Spark evaluates
    # growing unbounded-PRECEDING frames incrementally (O(n) per
    # partition) but re-scans unbounded-FOLLOWING frames from scratch
    # per row (O(n²)) — measured 16 s vs ~1 s on the sf0.1 hourly
    # spine. Same values, one extra in-partition sort, same shuffle.
    fwd = (Window.partitionBy(*klist).orderBy(F.col("bucket").desc())
                 .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    obs_bucket = F.when(F.col("__obs").isNotNull(), F.col("bucket"))
    prev_v = F.last("__obs", ignorenulls=True).over(back)
    prev_t = F.last(obs_bucket, ignorenulls=True).over(back)
    next_v = F.last("__obs", ignorenulls=True).over(fwd)
    next_t = F.last(obs_bucket, ignorenulls=True).over(fwd)
    span = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    frac = (F.unix_timestamp("bucket") - F.unix_timestamp(prev_t)) / span
    filled = F.when(F.col("__obs").isNotNull(), F.col("__obs")).otherwise(
        prev_v + (next_v - prev_v) * frac)
    return joined.select(
        *klist, "bucket", filled.alias(value_col),
        F.col("__obs").isNotNull().alias("observed"))


def ewma(df: DataFrame, time_col: str, value_col: str,
         keys: Sequence[str], alpha: float,
         order_cols: Sequence[str] | None = None,
         alias: str = "ewma") -> DataFrame:
    """Exponentially weighted moving average per entity series — the
    O(1)-state smoother a streaming/trend pipeline wants where the
    reference uses a flat rolling mean (`metrics/temporal.py:162-192`).
    Weights follow pandas ``ewm(adjust=True)``:
    ``y_t = Σ_i (1-α)^(t-i)·x_i / Σ_i (1-α)^(t-i)``.

    The recurrence is inherently sequential per series, so this is the
    same grouped-map Arrow kernel shape as Mann-Kendall (A9,
    `trends.mann_kendall`): one shuffle onto ``keys``, then an O(n)
    numpy/pandas pass per series — no O(n²) window, no driver collect.
    Sort inside the kernel is by ``order_cols`` (default ``[time_col]``;
    pass a unique tiebreak column for deterministic output on tied
    timestamps)."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    import pandas as pd  # noqa: F401  (Arrow kernel dependency)

    klist = list(keys)
    order = list(order_cols) if order_cols is not None else [time_col]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(alias, T.DoubleType())])

    def kernel(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[alias] = pdf[value_col].ewm(alpha=alpha, adjust=True).mean()
        return pdf

    return df.groupBy(*_cols(klist)).applyInPandas(kernel, schema=out_schema)
