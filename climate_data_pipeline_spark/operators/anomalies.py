"""Anomalies & standardization (SURVEY.md §2.3 J1/J2, §2.5 W2/W3, §2.7 F4/F5).

The reference's anomaly machinery is xarray groupby-broadcast arithmetic
(`/root/reference/src/climate_pipeline/metrics/anomalies.py`): subtract a
per-(month, cell) climatology from every timestep, or standardize by the
group's (mean, std). In the row model both are **left equi-joins against a
small aggregated table** — the climatology is tiny (12 months × #groups),
so it broadcasts and the join adds no shuffle on the fact side beyond the
aggregation itself. A window-function formulation is provided too
(`zscore(..., method="window")`); both paths produce identical results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import severity_from_z
from .temporal import climatology


def _group_key(time_col: str, groupby: str):
    if groupby == "month":
        return F.month(time_col).cast("int").alias("month"), "month"
    if groupby == "dayofyear":
        return F.dayofyear(time_col).cast("int").alias("dayofyear"), "dayofyear"
    raise ValueError(f"groupby must be month|dayofyear, got {groupby!r}")


def anomaly(df: DataFrame, time_col: str, value_col: str,
            keys: Sequence[str] = (), groupby: str = "month",
            reference_period: tuple[str, str] | None = None,
            alias: str = "anomaly") -> DataFrame:
    """Absolute anomaly vs climatology — reference `metrics/anomalies.py:14-62`
    (`ds.groupby('time.month') - climatology`). Climatology may come from a
    separate reference period (lines 39-42). Broadcast left equi-join on
    (month, *keys)."""
    key_expr, key_name = _group_key(time_col, groupby)
    clim = climatology(df, time_col, value_col, keys=keys, groupby=groupby,
                       reference_period=reference_period, alias="__clim")
    out = (df.withColumn(key_name, key_expr)
             .join(F.broadcast(clim), on=[key_name, *keys], how="left")
             .withColumn(alias, F.col(value_col) - F.col("__clim")))
    return out.drop("__clim")


def zscore(df: DataFrame, time_col: str, value_col: str,
           keys: Sequence[str] = (), groupby: str = "month",
           method: str = "join", alias: str = "zscore") -> DataFrame:
    """Standardized anomaly — reference `metrics/anomalies.py:65-125`:
    (x − group_mean) / group_std per (month, *keys), sample std (ddof=1,
    xarray default). ``method='join'`` aggregates then broadcast-joins
    (one shuffle on the small side only); ``method='window'`` uses
    avg/stddev OVER (PARTITION BY month, *keys) — one shuffle of the fact
    table. Join wins at 100 TB; both agree bit-for-bit on the same data."""
    key_expr, key_name = _group_key(time_col, groupby)
    if method == "window":
        w = Window.partitionBy(key_name, *keys)
        return (df.withColumn(key_name, key_expr)
                  .withColumn(alias,
                              (F.col(value_col) - F.avg(value_col).over(w))
                              / F.stddev_samp(value_col).over(w)))
    stats = (df.groupBy(key_expr, *keys)
               .agg(F.avg(value_col).alias("__mean"),
                    F.stddev_samp(value_col).alias("__std")))
    out = (df.withColumn(key_name, key_expr)
             .join(F.broadcast(stats), on=[key_name, *keys], how="left")
             .withColumn(alias, (F.col(value_col) - F.col("__mean")) / F.col("__std")))
    return out.drop("__mean", "__std")


def severity(df: DataFrame, z_col: str, alias: str = "severity") -> DataFrame:
    """7-level classification of z-scores — reference
    `metrics/anomalies.py:207-247` thresholds (F4)."""
    return df.withColumn(alias, severity_from_z(z_col))


def percentile_rank(df: DataFrame, time_col: str, value_col: str,
                    keys: Sequence[str] = (),
                    percentiles: Sequence[int] = (10, 25, 50, 75, 90, 95, 99),
                    reference_period: tuple[str, str] | None = None,
                    alias: str = "percentile_rank") -> DataFrame:
    """Piecewise-linear percentile rank — reference
    `metrics/anomalies.py:138-204` (`np.interp` of each value against its
    month's percentile curve, clamped to [p_min, p_max]). Pure relational:
    broadcast-join the wide per-(month, keys) threshold row, then a CASE
    chain interpolates — no UDF, stays in whole-stage codegen."""
    ref = df
    if reference_period is not None:
        ref = df.where(F.col(time_col).between(*reference_period))
    ps = sorted(percentiles)
    month = F.month(time_col).cast("int").alias("month")
    thr = (ref.groupBy(month, *keys)
              .agg(*[F.percentile(value_col, p / 100.0).alias(f"__t{p}") for p in ps]))
    out = (df.withColumn("month", F.month(time_col).cast("int"))
             .join(F.broadcast(thr), on=["month", *keys], how="left"))

    v = F.col(value_col)
    rank = F.lit(float(ps[0]))  # clamp below
    for lo, hi in zip(ps, ps[1:]):
        t_lo, t_hi = F.col(f"__t{lo}"), F.col(f"__t{hi}")
        frac = (v - t_lo) / (t_hi - t_lo)
        seg = F.lit(float(lo)) + frac * F.lit(float(hi - lo))
        rank = F.when((v >= t_lo) & (v < t_hi) & (t_hi > t_lo), seg).otherwise(rank)
    rank = F.when(v >= F.col(f"__t{ps[-1]}"), F.lit(float(ps[-1]))).otherwise(rank)
    # a null value, or a month with no reference thresholds (the left
    # join misses), must rank NULL — the when() chain's conditions are
    # all null→false, so without this guard it bottoms out at the
    # lowest percentile and reports e.g. "10th" for unknown
    # (np.interp in the reference yields NaN here)
    rank = F.when(v.isNull() | F.col(f"__t{ps[0]}").isNull(),
                  F.lit(None).cast("double")).otherwise(rank)
    out = out.withColumn(alias, rank)
    return out.drop(*[f"__t{p}" for p in ps])


def robust_zscore(df: DataFrame, time_col: str, value_col: str,
                  keys: Sequence[str] = (), groupby: str = "month",
                  alias: str = "robust_z") -> DataFrame:
    """Median/MAD standardization — the outlier-resistant variant of
    :func:`zscore` (engine addition): z = (x − median) / (1.4826·MAD),
    MAD = median(|x − median|). One contaminated reading shifts a mean
    z-score everywhere in its group; it moves the median/MAD version by
    ~1/n. The 1.4826 factor makes MAD a consistent σ estimator under
    normality, so thresholds transfer (|z| > 3 etc.).

    Two grouped exact-percentile passes (median, then MAD) + a broadcast
    join back — same join-not-reshuffle shape as the climatology
    anomaly; at scale swap exact `percentile` for `approx_percentile`
    like A5 does (the oracle-parity/production flag pair)."""
    key_expr, key_name = _group_key(time_col, groupby)
    with_key = df.withColumn(key_name, key_expr)
    med = (with_key.groupBy(key_name, *keys)
           .agg(F.expr(f"percentile({value_col}, 0.5)").alias("__med")))
    mad = (with_key.join(F.broadcast(med), [key_name, *keys])
           .groupBy(key_name, *keys)
           .agg(F.expr(f"percentile(abs({value_col} - __med), 0.5)")
                .alias("__mad")))
    stats = med.join(mad, [key_name, *keys])
    return (with_key.join(F.broadcast(stats), [key_name, *keys], "left")
            .withColumn(alias,
                        (F.col(value_col) - F.col("__med"))
                        / (F.lit(1.4826) * F.col("__mad")))
            .drop("__med", "__mad"))
