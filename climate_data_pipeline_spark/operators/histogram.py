"""Mergeable fixed-bin histogram quantiles — the incremental /
distributed complement to exact percentiles.

Exact grouped percentiles (`operators/percentiles.py`, ref
`metrics/percentiles.py:14-77`) need a full sort of every group and
cannot be maintained incrementally: yesterday's percentile tells you
nothing about today's. A fixed-bin histogram is a **commutative
monoid** (merge = add counts), so at 100 TB the engine can keep
per-partition / per-day histogram partials (like
`operators/incremental.rollup_partials` keeps sum/count partials) and
answer any quantile over any union of partials with bounded error
≤ one bin width — no re-scan, no sort, shuffle volume = n_groups ×
n_bins rows.

Everything is built-in integer/double arithmetic (no UDF), and the
whole pipeline — binning, cumulative walk, within-bin linear
interpolation — has an exact SQL mirror for the DuckDB oracle
(`sql_histogram_quantile`): both engines perform the identical
deterministic arithmetic, so results hash-match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bin_expr(value_col: str, lo: float, hi: float, n_bins: int) -> F.Column:
    """Clamped bin index in [0, n_bins-1]; values outside [lo, hi) land
    in the edge bins (count toward the distribution tails)."""
    raw = F.floor((F.col(value_col) - F.lit(lo))
                  / F.lit(hi - lo) * F.lit(n_bins))
    return F.least(F.greatest(raw, F.lit(0)),
                   F.lit(n_bins - 1)).cast("int").alias("bin")


def histogram_partials(df: DataFrame, value_col: str,
                       keys: Sequence[str], *,
                       lo: float, hi: float,
                       n_bins: int = 128) -> DataFrame:
    """Per-(keys, bin) counts — the mergeable sketch state.

    At scale this is what lands in the metrics store per ingest batch:
    ``(keys..., bin, cnt)``, n_groups × ≤n_bins rows regardless of
    input size. NULL values are excluded BEFORE binning — Spark's
    greatest/least skip nulls, so an unfiltered null would silently
    land in bin 0 and skew every downstream quantile (exact
    percentiles ignore nulls; the mergeable complement must agree)."""
    return (df.where(F.col(value_col).isNotNull())
              .groupBy(*keys, _bin_expr(value_col, lo, hi, n_bins))
              .agg(F.count("*").alias("cnt")))


def merge_histogram_partials(*parts: DataFrame) -> DataFrame:
    """Monoid merge: union partials and re-add counts per (keys, bin)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    keys = [c for c in out.columns if c not in ("cnt",)]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def histogram_quantile(hist: DataFrame, keys: Sequence[str],
                       quantiles: Sequence[float], *,
                       lo: float, hi: float,
                       n_bins: int = 128) -> DataFrame:
    """Quantiles from histogram state, error ≤ (hi-lo)/n_bins.

    For each requested q ∈ (0, 1]: walk the cumulative histogram to the
    first bin whose running count reaches q·total, then interpolate
    linearly within the bin (the same estimator as numpy's histogram
    CDF inversion). Output: one row per (keys, q) with the estimate.

    The walk is a window cumsum keyed like the histogram — no extra
    shuffle beyond the one that built the partials."""
    if not all(0.0 < q <= 1.0 for q in quantiles):
        raise ValueError("quantiles must be in (0, 1]")
    width = (hi - lo) / n_bins
    klist = list(keys)
    w = Window.partitionBy(*klist).orderBy("bin")
    cum = (hist.withColumn("cum", F.sum("cnt").over(w))
               .withColumn("total", F.sum("cnt").over(Window.partitionBy(*klist))))
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double")
    target = F.col("q") * F.col("total")
    cum_before = F.col("cum") - F.col("cnt")
    frac = (target - cum_before) / F.col("cnt")
    return (cum.crossJoin(F.broadcast(qdf))
               .where((F.col("cum") >= target) & (cum_before < target))
               .select(*klist, "q",
                       F.round(F.lit(lo) + (F.col("bin") + frac)
                               * F.lit(width), 9).alias("value")))


def sql_histogram_quantile(table: str, value_expr: str,
                           keys: Sequence[str],
                           quantiles: Sequence[float], *,
                           lo: float, hi: float,
                           n_bins: int = 128,
                           where: str = "TRUE") -> str:
    """DuckDB mirror of partials → cumulative walk → interpolation,
    using the identical arithmetic (same operation order) so doubles
    match bit-for-bit."""
    width = (hi - lo) / n_bins
    kcols = ", ".join(keys)
    qvals = ", ".join(f"({float(q)})" for q in quantiles)
    return f"""
WITH hist AS (
  SELECT {kcols},
         CAST(LEAST(GREATEST(FLOOR(({value_expr} - ({lo}))
                    / ({hi} - ({lo})) * {n_bins}), 0), {n_bins - 1}) AS INTEGER)
           AS bin,
         COUNT(*) AS cnt
  FROM {table} WHERE ({where}) AND ({value_expr}) IS NOT NULL
  GROUP BY ALL
), cum AS (
  SELECT *, SUM(cnt) OVER (PARTITION BY {kcols} ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY {kcols}) AS total
  FROM hist
)
SELECT {kcols}, q,
       round(({lo}) + (bin + ((q * total) - (cum - cnt)) / cnt)
             * ({width!r}), 9) AS value
FROM cum, (VALUES {qvals}) AS qs(q)
WHERE cum >= q * total AND (cum - cnt) < q * total
"""
