"""Percentile-based metrics (SURVEY.md §2.4 A5-A7, §2.7 F6).

The reference computes grouped climatological quantiles with xarray's
linear-interpolation quantile (`/root/reference/src/climate_pipeline/
metrics/percentiles.py`). Spark's exact ``percentile`` matches that
interpolation (= SQL ``percentile_cont`` = DuckDB ``quantile_cont``), so
oracle parity is exact; ``approx_percentile`` is the documented 100 TB
scale path (single-pass sketch, no full sort) behind the ``exact`` flag.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import percentile_bin

DEFAULT_PERCENTILES = (10, 25, 50, 75, 90, 95, 99)  # reference percentiles.py:11


def _pct(value_col: str, p: float, exact: bool, accuracy: int = 10000):
    if exact:
        return F.percentile(value_col, p)
    return F.percentile_approx(value_col, p, accuracy)


def grouped_percentiles(df: DataFrame, time_col: str, value_col: str,
                        keys: Sequence[str] = (),
                        percentiles: Sequence[int] = DEFAULT_PERCENTILES,
                        groupby: str = "month",
                        reference_period: tuple[str, str] | None = None,
                        exact: bool = True, long_format: bool = True) -> DataFrame:
    """Climatological percentiles — reference `metrics/percentiles.py:14-77`:
    quantiles at the requested levels per (month|dayofyear|all, *keys).
    ``long_format`` explodes to one row per percentile (the reference keeps
    percentile as a dimension, lines 67-68); wide keeps one column per level.
    """
    if not all(0 < p < 100 for p in percentiles):
        raise ValueError("percentiles must be in (0, 100)")  # ref lines 43-45
    if reference_period is not None:
        df = df.where(F.col(time_col).between(*reference_period))
    if groupby == "month":
        gkeys = [F.month(time_col).cast("int").alias("month"), *keys]
    elif groupby == "dayofyear":
        gkeys = [F.dayofyear(time_col).cast("int").alias("dayofyear"), *keys]
    elif groupby is None or groupby == "none":
        gkeys = list(keys)
    else:
        raise ValueError(f"groupby must be month|dayofyear|none, got {groupby!r}")

    wide = df.groupBy(*gkeys).agg(
        *[_pct(value_col, p / 100.0, exact).alias(f"p{p}") for p in percentiles]
    )
    if not long_format:
        return wide
    pairs = F.array(*[
        F.struct(F.lit(p).cast("int").alias("percentile"),
                 F.col(f"p{p}").alias("threshold"))
        for p in percentiles
    ])
    pcols = {f"p{p}" for p in percentiles}
    # drop exactly the percentile columns — a startswith("p") filter
    # would silently delete group keys like 'plant_id'
    return (wide.withColumn("__pair", F.explode(pairs))
                .select(*[c for c in wide.columns if c not in pcols],
                        F.col("__pair.percentile").alias("percentile"),
                        F.col("__pair.threshold").alias("threshold")))


def exceedance_frequency(df: DataFrame, time_col: str, value_col: str,
                         keys: Sequence[str] = (), percentile: int = 90,
                         reference_period: tuple[str, str] | None = None,
                         exact: bool = True,
                         alias: str = "exceedance_freq") -> DataFrame:
    """Fraction of observations above their group's percentile threshold —
    reference `metrics/percentiles.py:80-112`. Threshold table is tiny →
    broadcast join; the frequency is an exact 0/1 mean."""
    thr = grouped_percentiles(df, time_col, value_col, keys=keys,
                              percentiles=(percentile,), groupby="month",
                              reference_period=reference_period,
                              exact=exact, long_format=False)
    thr = thr.withColumnRenamed(f"p{percentile}", "__thr")
    joined = (df.withColumn("month", F.month(time_col).cast("int"))
                .join(F.broadcast(thr), on=["month", *keys], how="inner"))
    return (joined.groupBy(*keys)
                  .agg(F.avg((F.col(value_col) > F.col("__thr")).cast("double"))
                        .alias(alias),
                       F.count("*").alias("n")))


def return_periods(df: DataFrame, time_col: str, value_col: str,
                   keys: Sequence[str] = (),
                   periods: Sequence[int] = (2, 5, 10, 25, 50, 100),
                   exact: bool = True) -> DataFrame:
    """Return-period values — reference `metrics/percentiles.py:152-187`:
    annual maxima per series, then the quantile at 1 − 1/T per period T
    (probability transform, line 172). Two-stage aggregation: the annual-max
    stage shrinks data by ~365× before the quantile stage."""
    amax = (df.groupBy(F.year(time_col).cast("int").alias("year"), *keys)
              .agg(F.max(value_col).alias("__amax")))
    agg = amax.groupBy(*keys).agg(
        *[_pct("__amax", 1.0 - 1.0 / t, exact).alias(f"rp{t}") for t in periods]
    )
    pairs = F.array(*[
        F.struct(F.lit(t).cast("int").alias("return_period"),
                 F.col(f"rp{t}").alias("value"))
        for t in periods
    ])
    return (agg.withColumn("__pair", F.explode(pairs))
               .select(*[str(k) for k in keys],
                       F.col("__pair.return_period").alias("return_period"),
                       F.col("__pair.value").alias("value")))


def percentile_bins(df: DataFrame, time_col: str, value_col: str,
                    keys: Sequence[str] = (),
                    percentiles: Sequence[int] = (50, 75, 90, 95, 99),
                    reference_period: tuple[str, str] | None = None,
                    exact: bool = True, alias: str = "percentile_bin") -> DataFrame:
    """Classify each observation into the highest percentile band it
    exceeds — reference `metrics/percentiles.py:115-149` (descending
    threshold scan, masked replace at lines 141-142 → CASE chain here)."""
    thr = grouped_percentiles(df, time_col, value_col, keys=keys,
                              percentiles=percentiles, groupby="month",
                              reference_period=reference_period,
                              exact=exact, long_format=False)
    out = (df.withColumn("month", F.month(time_col).cast("int"))
             .join(F.broadcast(thr), on=["month", *keys], how="left"))
    out = out.withColumn(
        alias, percentile_bin(value_col, {p: f"p{p}" for p in percentiles}))
    return out.drop(*[f"p{p}" for p in percentiles])


def doy_window_percentiles(df: DataFrame, time_col: str, value_col: str,
                           keys: Sequence[str] = (),
                           percentiles: Sequence[int] = (90,),
                           window: int = 2, exact: bool = True,
                           discrete: bool = False) -> DataFrame:
    """Day-of-year percentiles pooled over a centered ±``window``-day
    calendar window — the smoothing the climate community's standard
    index definitions (ETCCDI percentile indices) apply on top of the
    reference's plain per-day grouping (`metrics/percentiles.py:54-59`,
    `groupby='dayofyear'`): with only N-years samples per calendar day,
    a raw daily p90 is noisy; pooling each day with its ±w neighbours
    multiplies the sample (2w+1)-fold.

    Relational formulation: each observation *contributes to* the 2w+1
    day-bins it falls inside, so project a literal offset array, explode
    (map-side row multiplication, bounded ×(2w+1) — no join against a
    calendar table), wrap at the year boundary with modular arithmetic,
    and run the usual grouped percentile agg. Leap years fold
    calendar-day-correctly: Feb 29 merges into Feb 28's bin and every
    later day shifts down one, so "Mar 1" is bin 60 in EVERY year — a
    plain `least(doy, 365)` would misbin all post-February days of
    leap years by one, the exact cross-year misalignment ETCCDI
    pooling exists to avoid. Bins are a stable 1..365. One shuffle.
    At 100 TB scale flip ``exact=False`` for the sketch percentile, as
    with A5 — or, for DISCRETE measures (integer quantities, coded
    categories, fixed-point readings), ``discrete=True``: the exact
    interpolated percentile is reconstructed from per-value COUNTS, so
    the explode collapses in the map-side combine and the wire carries
    one row per (bin, keys, distinct value) instead of one per
    exploded observation — exact AND sketch-priced. The interpolation
    is the standard ``v_lo + (h − ⌊h⌋)·(v_hi − v_lo)`` at rank
    ``h = (n−1)·p``, the same formula the sort-based aggregate
    evaluates."""
    if window < 0:
        raise ValueError("window must be >= 0")
    if not all(0 < p < 100 for p in percentiles):
        raise ValueError("percentiles must be in (0, 100)")
    y = F.year(time_col)
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    doy = F.dayofyear(time_col)
    doy0 = F.when(leap & (doy >= 60), doy - 1).otherwise(doy) - 1
    off = F.explode(F.sequence(F.lit(-window), F.lit(window))).alias("__off")
    binned = (df.select(doy0.alias("__doy0"), *keys, value_col)
                .select("*", off)
                .select((F.pmod(F.col("__doy0") + F.col("__off"), F.lit(365))
                         + 1).cast("int").alias("doy_bin"), *keys, value_col))
    if discrete and exact:
        return _grouped_percentiles_from_counts(
            binned, ["doy_bin", *keys], value_col, percentiles)
    return binned.groupBy("doy_bin", *keys).agg(
        *[_pct(value_col, p / 100.0, exact).alias(f"p{p}") for p in percentiles])


def _grouped_percentiles_from_counts(binned: DataFrame,
                                     group_cols: Sequence[str],
                                     value_col: str,
                                     percentiles: Sequence[int]) -> DataFrame:
    """Exact interpolated percentiles over a DISCRETE measure,
    reconstructed from per-value counts: the groupBy on (group, value)
    combines map-side, so the shuffle carries one row per distinct
    value instead of one per observation. Two cheap stages follow — a
    cumulative-count window per group and one conditional min-agg per
    percentile — evaluating the same ``v_lo + frac·(v_hi − v_lo)`` at
    rank ``h = (n−1)·p`` the sort-based aggregate computes."""
    from pyspark.sql import Window

    # NULL measures are ignored, matching the sort-based percentile
    # aggregate (a group whose values are ALL null disappears here,
    # where the sort path would emit it with null percentiles — don't
    # use the discrete path when that distinction matters)
    cnt = (binned.where(F.col(value_col).isNotNull())
           .groupBy(*group_cols, value_col)
           .agg(F.count("*").alias("__cnt")))
    wcum = Window.partitionBy(*group_cols).orderBy(value_col)
    wall = Window.partitionBy(*group_cols)
    cur = (cnt.withColumn("__cum", F.sum("__cnt").over(wcum))
              .withColumn("__n", F.sum("__cnt").over(wall)))
    v = F.col(value_col).cast("double")
    aggs = [F.first("__n").alias("__n")]
    for p in percentiles:
        lo = F.floor((F.col("__n") - 1) * F.lit(p / 100.0))
        aggs.append(F.min(F.when(F.col("__cum") > lo, v))
                    .alias(f"__vlo{p}"))
        aggs.append(F.min(F.when(F.col("__cum") > lo + 1, v))
                    .alias(f"__vhi{p}"))
    out = cur.groupBy(*group_cols).agg(*aggs)
    for p in percentiles:
        h = (F.col("__n") - 1).cast("double") * F.lit(p / 100.0)
        frac = h - F.floor(h).cast("double")
        vlo = F.col(f"__vlo{p}")
        vhi = F.coalesce(F.col(f"__vhi{p}"), vlo)
        out = out.withColumn(f"p{p}", vlo + frac * (vhi - vlo))
    return out.drop("__n", *[c for p in percentiles
                             for c in (f"__vlo{p}", f"__vhi{p}")])
