"""Summary statistics (SURVEY.md §2.4 A11/A12) and dataset info (S6).

Reference: per-variable global stats `src/arco_demo.py:234-260`; region
stats over a bbox+time window `api/routes/data.py:172-214`; dataset
metadata summary `ingest/netcdf_reader.py:159-210`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def global_stats(df: DataFrame, value_col: str,
                 percentiles: Sequence[int] = (5, 95),
                 exact: bool = True) -> DataFrame:
    """Per-variable mean/std/min/max + tail percentiles — reference
    `calculate_metrics` (`src/arco_demo.py:234-260`). Single full-scan
    aggregation; every aggregate is a single-pass partial-merge."""
    pct = F.percentile if exact else (lambda c, p: F.percentile_approx(c, p, 10000))
    return df.agg(
        F.avg(value_col).alias("mean"),
        F.stddev_samp(value_col).alias("std"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
        F.count(value_col).alias("n"),
        *[pct(F.col(value_col), p / 100.0).alias(f"p{p}") for p in percentiles],
    )


def region_stats(df: DataFrame, value_col: str,
                 predicates: Column | None = None,
                 keys: Sequence[str] = (),
                 percentiles: Sequence[int] = (10, 50, 90),
                 exact: bool = True) -> DataFrame:
    """Summary stats over a filtered region — reference
    `/datasets/{id}/stats` (`api/routes/data.py:172-214`): bbox+time
    predicates then mean/std/min/max/p10/p50/p90. Predicates push down to
    the parquet scan."""
    if predicates is not None:
        df = df.where(predicates)
    pct = F.percentile if exact else (lambda c, p: F.percentile_approx(c, p, 10000))
    return df.groupBy(*keys).agg(
        F.avg(value_col).alias("mean"),
        F.stddev_samp(value_col).alias("std"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
        F.count(value_col).alias("n"),
        *[pct(F.col(value_col), p / 100.0).alias(f"p{p}") for p in percentiles],
    )


def dataset_info(df: DataFrame, time_col: str | None = None,
                 extent_cols: Sequence[str] = ()) -> dict:
    """Metadata summary — reference `get_dataset_info`
    (`ingest/netcdf_reader.py:159-210`): columns/dtypes, row count, time
    range, value extents. One aggregation pass for all extents."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    if time_col:
        aggs += [F.min(time_col).alias("__tmin"), F.max(time_col).alias("__tmax")]
    for c in extent_cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    row = df.agg(*aggs).collect()[0].asDict()
    info = {
        "variables": {f.name: f.dataType.simpleString() for f in df.schema.fields},
        "num_rows": row["__n"],
    }
    if time_col:
        info["time_range"] = {"start": row["__tmin"], "end": row["__tmax"]}
    if extent_cols:
        info["extent"] = {c: (row[f"__min_{c}"], row[f"__max_{c}"]) for c in extent_cols}
    return info


def detect_time_column(df: DataFrame,
                       candidates: Sequence[str] = ("time", "t", "date",
                                                    "datetime", "ts")) -> str | None:
    """Schema inference for the time column — reference `_detect_time_dim`
    (`ingest/netcdf_reader.py:80-90`): name-pattern match first, then any
    timestamp/date-typed column."""
    lower = {c.lower(): c for c in df.columns}
    for cand in candidates:
        if cand in lower:
            return lower[cand]
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.TimestampType, T.DateType, T.TimestampNTZType)):
            return f.name
    return None


def weighted_mean(df: DataFrame, value_col: str, weight_col: str | Column,
                  keys: Sequence[str] = (), alias: str = "wmean",
                  decimal_scale: int | None = None) -> DataFrame:
    """Weighted mean Σwx/Σw per group — the aggregation a *correct*
    global/zonal climate statistic needs: on a regular lat-lon grid,
    cells shrink with cos(latitude), so the reference's flat
    `calculate_metrics` mean (`src/arco_demo.py:234-260`) over-weights
    the poles; weighting by cos(lat) is the standard fix (pass
    ``weight_col=F.cos(F.radians('lat'))``). Also serves any
    frequency/size weighting (tokens per doc, quantity per line item).

    Two partial-aggregable sums, one shuffle, nulls in either column
    drop the row (both sums guard on the pair being present).
    ``decimal_scale`` makes both sums exact scaled-long arithmetic —
    partition-order independent, the registry's float-determinism
    discipline — when value·weight is exactly representable at that
    scale; leave ``None`` for true-float weights like cos(lat)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    pair_ok = F.col(value_col).isNotNull() & w.isNotNull()
    if decimal_scale is None:
        num = F.sum(F.when(pair_ok, F.col(value_col) * w))
        den = F.sum(F.when(pair_ok, w))
    else:
        factor = float(10 ** decimal_scale)
        num = (F.sum(F.when(pair_ok, F.round(F.col(value_col) * w * factor)
                            .cast("long"))) / factor)
        den = (F.sum(F.when(pair_ok, F.round(w * factor).cast("long")))
               / factor)
    grouped = df.groupBy(*[F.col(k) if isinstance(k, str) else k for k in keys])
    return grouped.agg((num / den).alias(alias),
                       den.alias("weight_sum"),
                       F.count(F.when(pair_ok, F.lit(1))).alias("n"))


def winsorize(df: DataFrame, value_col: str, keys: Sequence[str] = (),
              lower: float = 0.01, upper: float = 0.99,
              alias: str | None = None) -> DataFrame:
    """Percentile clipping (winsorization) per group — the standard
    outlier treatment before training-statistics aggregation: values
    below the group's p_lower clamp up, above p_upper clamp down.
    Exact grouped percentiles (oracle-parity; swap to approx at 100 TB
    like A5) broadcast-joined back — facts never reshuffle."""
    if not 0 <= lower < upper <= 1:
        raise ValueError("need 0 <= lower < upper <= 1")
    out_col = alias or f"{value_col}_wins"
    klist = list(keys)
    bounds = (df.groupBy(*klist)
                .agg(F.expr(f"percentile({value_col}, {lower})").alias("__lo"),
                     F.expr(f"percentile({value_col}, {upper})").alias("__hi")))
    joined = (df.join(F.broadcast(bounds), klist) if klist
              else df.crossJoin(F.broadcast(bounds)))
    clipped = F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi"))
    return joined.withColumn(out_col, clipped).drop("__lo", "__hi")


def weighted_median_udaf():
    """Weighted (lower) median as a *grouped-aggregate pandas UDF* — the
    one UDF shape the engine hadn't exercised (scalar pandas_udf,
    grouped-map `applyInPandas`, `mapInPandas`, UDTF and
    `applyInPandasWithState` all appear elsewhere). Use where a custom
    reduction genuinely can't be a built-in aggregate; Arrow batches keep
    the transfer columnar.

    Rule: smallest v whose cumulative weight reaches half the total —
    the discrete lower weighted median, deterministic (no interpolation),
    so an exact SQL oracle exists (cumulative-weight window).

    Usage: ``df.groupBy(k).agg(weighted_median_udaf()(col_v, col_w))``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def weighted_median(v, w):
        # nulls arrive as NaN: drop the PAIR — counting a null value's
        # weight in the total shifts the selected element (and can
        # return NaN itself), where every built-in aggregate and the
        # cumulative-weight SQL oracle operate on non-null rows only
        keep = v.notna() & w.notna()
        v, w = v[keep], w[keep]
        if v.empty:
            return None
        order = v.sort_values().index
        vv, ww = v[order].to_numpy(), w[order].to_numpy()
        cum = ww.cumsum()
        return float(vv[int(np.searchsorted(cum, cum[-1] / 2.0))])

    # real (non-string) annotations: `from __future__ import annotations`
    # would stringify inline hints, which pandas_udf can't infer from
    weighted_median.__annotations__ = {"v": pd.Series, "w": pd.Series,
                                       "return": float}
    return pandas_udf(weighted_median, "double")


def coarsen(df: DataFrame, x_col: str, y_col: str, value_col: str,
            x_step: float, y_step: float,
            agg: str = "avg") -> DataFrame:
    """Block-aggregate regrid — xarray's ``coarsen`` on the row model:
    quantize both grid coordinates to ``step``-sized blocks, aggregate
    each block, report block centers. The standard downsample before
    serving a coarse-zoom map tile or a reduced-resolution export
    (reference's chunk-layout docs motivate exactly this access pattern,
    `docs/chunking-strategy.md`).

    floor-quantization keeps every input row in exactly one block (no
    overlap, no row multiplication); one hash-agg shuffle on the block
    key; at 100 TB the blocks inherit partition pruning when the table
    is laid out/Z-ordered on (x, y)."""
    fn = {"avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
          "count": F.count}[agg]
    bx = F.floor(F.col(x_col) / x_step)
    by = F.floor(F.col(y_col) / y_step)
    return (df.groupBy(bx.alias("__bx"), by.alias("__by"))
              .agg(fn(value_col).alias(f"{agg}_{value_col}"),
                   F.count("*").alias("n_cells"))
              .select(((F.col("__bx") + 0.5) * x_step).alias(f"{x_col}_center"),
                      ((F.col("__by") + 0.5) * y_step).alias(f"{y_col}_center"),
                      f"{agg}_{value_col}", "n_cells"))
