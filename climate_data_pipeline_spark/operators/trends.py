"""Trend estimation (SURVEY.md §2.4 A8-A10).

- ``linear_trend``: OLS slope per series — pure SQL via ``regr_slope`` over
  fractional years (reference polyfit, `metrics/trends.py:12-65`).
- ``trend_with_confidence``: slope ± t·stderr — the stderr comes from the
  closed-form OLS residual formula, all built-in aggregates (reference uses
  scipy.linregress, `metrics/trends.py:170-244`).
- ``mann_kendall``: MK test + Sen's slope — genuinely non-relational
  (O(n²) pairwise kernel per series), the one place the engine drops to a
  grouped-map Pandas UDF (`applyInPandas`), matching the reference's
  `apply_ufunc` fan-out (`metrics/trends.py:144-152`).

The 365.25-day-year time scaling (reference `metrics/trends.py:36-39`) is
exposed by ``functions.scalars.fractional_years`` and must be mirrored
verbatim in any oracle SQL.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import fractional_years


def linear_trend(df: DataFrame, time_col: str, value_col: str,
                 keys: Sequence[str] = (), t0: str = "1995-01-01") -> DataFrame:
    """Per-series OLS slope in value-units per year — reference
    `compute_linear_trend` (`metrics/trends.py:12-65`). One hash
    aggregation; `regr_slope`/`regr_intercept` are single-pass co-moment
    aggregates (map-side partials, no sort)."""
    t = fractional_years(time_col, t0)
    return (df.withColumn("__t", t)
              .groupBy(*keys)
              .agg(F.regr_slope(F.col(value_col), F.col("__t")).alias("slope"),
                   F.regr_intercept(F.col(value_col), F.col("__t")).alias("intercept"),
                   F.count(value_col).alias("n")))


def trend_with_confidence(df: DataFrame, time_col: str, value_col: str,
                          keys: Sequence[str] = (), t0: str = "1995-01-01",
                          confidence: float = 0.95) -> DataFrame:
    """Slope with a confidence margin — reference
    `compute_trend_with_confidence` (`metrics/trends.py:170-244`,
    margin = t_crit · std_err at lines 208-211).

    std_err uses the closed-form OLS residual standard error
    sqrt((var(y)/var(x) − slope²) / (n − 2)) with *population* variances —
    algebraically identical to scipy.linregress. The Student-t critical
    value uses the Cornish-Fisher expansion around the normal quantile
    (exact enough for n ≳ 30; documented engine semantics so the SQL
    oracle can reproduce it term for term).
    """
    z = _normal_quantile((1 + confidence) / 2)
    t = fractional_years(time_col, t0)
    g = (df.withColumn("__t", t)
           .groupBy(*keys)
           .agg(F.regr_slope(F.col(value_col), F.col("__t")).alias("slope"),
                F.regr_intercept(F.col(value_col), F.col("__t")).alias("intercept"),
                F.var_pop(value_col).alias("__vy"),
                F.var_pop("__t").alias("__vx"),
                F.count(value_col).alias("n")))
    nu = F.col("n") - 2
    t_crit = (F.lit(z) + (F.lit(z) ** 3 + F.lit(z)) / (4 * nu)
              + (5 * F.lit(z) ** 5 + 16 * F.lit(z) ** 3 + 3 * F.lit(z)) / (96 * nu ** 2))
    stderr = F.sqrt((F.col("__vy") / F.col("__vx") - F.col("slope") ** 2) / nu)
    return (g.withColumn("std_err", stderr)
             .withColumn("margin", t_crit * F.col("std_err"))
             .drop("__vy", "__vx"))


def _normal_quantile(p: float) -> float:
    """Acklam's rational approximation of the standard normal quantile —
    deterministic constant used for the t-critical expansion."""
    # For the standard confidence levels just use the well-known constants.
    table = {0.975: 1.959963984540054, 0.95: 1.6448536269514722,
             0.995: 2.5758293035489004, 0.9: 1.2815515655446004}
    if p in table:
        return table[p]
    # Acklam's rational approximation — central region plus the tail
    # branches (the central polynomial alone is ~0.2 too low at
    # p = 0.9995, narrowing confidence margins by ~6%)
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    import math

    def tail(q: float) -> float:
        return ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                 * q + c[5])
                / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))

    if p < 0.02425:
        return tail(math.sqrt(-2.0 * math.log(p)))
    if p > 1 - 0.02425:
        return -tail(math.sqrt(-2.0 * math.log(1.0 - p)))
    q = p - 0.5
    r = q * q
    return ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q /
            (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1))


MK_SCHEMA_SUFFIX = ("s_stat double, var_s double, z double, p_value double, "
                    "significant boolean, sen_slope double, n long")


def mann_kendall(df: DataFrame, time_col: str, value_col: str,
                 keys: Sequence[str], alpha: float = 0.05) -> DataFrame:
    """Mann-Kendall trend test + Sen's slope per series — reference
    `compute_trend_significance` (`metrics/trends.py:68-167`): S statistic
    (pairwise sign sum), tie-corrected variance, Z with continuity
    correction, two-tailed p, significance at ``alpha``, Sen's slope =
    median pairwise slope. O(n²) per series — run it on *aggregated*
    series (e.g. monthly means), never raw 100 TB rows; the grouped-map
    UDF shuffles once on the series key and the kernel is vectorized
    numpy (no Python-level pair loop).
    """
    key_fields = [f"{k} {dict(df.dtypes)[k]}" for k in keys]
    schema = ", ".join([*key_fields, MK_SCHEMA_SUFFIX])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        x = pdf[value_col].to_numpy(dtype="float64")
        tsec = pdf[time_col].astype("int64").to_numpy() / 1e9
        tyr = tsec / (365.25 * 86400.0)  # reference metrics/trends.py:36-39
        # drop missing values BEFORE the pairwise kernel (reference
        # trends.py:96-101): one NaN would otherwise poison S, Var(S),
        # z and p for the whole series; n reports VALID points, and the
        # reference's minimum series length is 4
        valid = ~np.isnan(x)
        x, tyr = x[valid], tyr[valid]
        n = len(x)
        out = {k: [pdf[k].iloc[0]] for k in keys}
        if n < 4:
            vals = dict(s_stat=np.nan, var_s=np.nan, z=np.nan, p_value=np.nan,
                        significant=False, sen_slope=np.nan, n=n)
        else:
            dx = x[None, :] - x[:, None]          # pairwise, vectorized
            iu = np.triu_indices(n, k=1)
            s = float(np.sign(dx[iu]).sum())      # ref trends.py:103-107
            _, counts = np.unique(x, return_counts=True)
            ties = counts[counts > 1]
            var_s = (n * (n - 1) * (2 * n + 5)
                     - float((ties * (ties - 1) * (2 * ties + 5)).sum())) / 18.0
            if var_s > 0:                          # ref trends.py:117-123
                if s > 0:
                    zstat = (s - 1) / math.sqrt(var_s)
                elif s < 0:
                    zstat = (s + 1) / math.sqrt(var_s)
                else:
                    zstat = 0.0
            else:
                zstat = 0.0
            # two-tailed p = 2·(1 − Φ(|z|)) = erfc(|z|/√2), numerically stable
            p = math.erfc(abs(zstat) / math.sqrt(2.0))
            dt = tyr[None, :] - tyr[:, None]
            valid = dt[iu] != 0
            sen = float(np.median(dx[iu][valid] / dt[iu][valid])) if valid.any() else np.nan
            vals = dict(s_stat=s, var_s=var_s, z=zstat, p_value=p,
                        significant=bool(p < alpha), sen_slope=sen, n=n)
        out.update({k: [v] for k, v in vals.items()})
        return pd.DataFrame(out)

    return df.groupBy(*keys).applyInPandas(kernel, schema=schema)


def harmonic_fit(df: DataFrame, time_col: str, value_col: str,
                 group_cols: Sequence[str],
                 period_days: float = 365.25,
                 round_to: int | None = 6) -> DataFrame:
    """Seasonal-cycle fit y ≈ a + b·sin(ωd) + c·cos(ωd), ω = 2π/period,
    d = fractional day-of-year — the parametric counterpart of the
    reference's monthly climatology (`metrics/temporal.py:120-159`):
    amplitude = sqrt(b² + c²) is half the seasonal swing.

    Two-regressor OLS solved in CLOSED FORM from the normal equations —
    five var/covar aggregates per group, one scan, one shuffle with
    map-side partials; no iterative fitter, no UDF. The n-divisors of
    var_pop/covar_pop cancel in every ratio, so population moments are
    exact substitutes for centered sums. Day-of-year comes from
    wall-clock calendar parts only → session-timezone invariant.
    """
    ts = F.col(time_col)
    doy = (F.dayofyear(ts)
           + (F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts))
           / 86400.0)
    ang = F.lit(2.0 * math.pi) * doy / period_days
    d = df.select(*group_cols, F.col(value_col).alias("y"),
                  F.sin(ang).alias("x1"), F.cos(ang).alias("x2"))
    m = d.groupBy(*group_cols).agg(
        F.var_pop("x1").alias("v1"), F.var_pop("x2").alias("v2"),
        F.covar_pop("x1", "x2").alias("c12"),
        F.covar_pop("x1", "y").alias("c1y"),
        F.covar_pop("x2", "y").alias("c2y"),
        F.avg("y").alias("my"), F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"), F.count(F.lit(1)).alias("n"))
    det = F.col("v1") * F.col("v2") - F.col("c12") * F.col("c12")
    b = (F.col("c1y") * F.col("v2") - F.col("c2y") * F.col("c12")) / det
    c = (F.col("c2y") * F.col("v1") - F.col("c1y") * F.col("c12")) / det
    a = F.col("my") - b * F.col("m1") - c * F.col("m2")
    amp = F.sqrt(b * b + c * c)
    rnd = (lambda col: F.round(col, round_to)) if round_to is not None \
        else (lambda col: col)
    return m.select(
        *group_cols,
        rnd(b).alias("b_sin"), rnd(c).alias("b_cos"),
        rnd(a).alias("intercept"), rnd(amp).alias("amplitude"),
        "n")
