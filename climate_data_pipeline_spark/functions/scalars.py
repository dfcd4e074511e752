"""Scalar column expressions (SURVEY.md §2.7) — all JVM-side built-ins,
no Python UDFs, so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Meteorological season calendar — reference `metrics/temporal.py:13-18`.
SEASON_MONTHS = {
    "DJF": (12, 1, 2),
    "MAM": (3, 4, 5),
    "JJA": (6, 7, 8),
    "SON": (9, 10, 11),
}


def season(ts: Column | str) -> Column:
    """Season label from a timestamp — the reference's `time.season`
    virtual grouper (`metrics/temporal.py:72-83`)."""
    m = F.month(ts)
    return (
        F.when(m.isin(12, 1, 2), "DJF")
        .when(m.isin(3, 4, 5), "MAM")
        .when(m.isin(6, 7, 8), "JJA")
        .otherwise("SON")
    )


def season_year(ts: Column | str) -> Column:
    """Season-anchoring year: December belongs to the *following* DJF —
    the reference's QE-NOV resample anchor (`metrics/temporal.py:60-70`)."""
    return (F.year(ts) + F.when(F.month(ts) == 12, 1).otherwise(0)).cast("int")


def fractional_years(ts: Column | str, t0: str) -> Column:
    """Time as fractional years since ``t0`` using the reference's
    365.25-day year (`metrics/trends.py:36-39`). Keep the constant
    identical in any oracle SQL or trend slopes won't match."""
    return (
        (F.unix_timestamp(F.col(ts) if isinstance(ts, str) else ts)
         - F.unix_timestamp(F.lit(t0).cast("timestamp")))
        / F.lit(365.25 * 86400.0)
    )


def severity_from_z(z: Column | str) -> Column:
    """7-level z-score banding, int8-style — exact thresholds from the
    reference (`metrics/anomalies.py:232-237`):
    z<-2→-3, z<-1.5→-2, z<-1→-1, z<=1→0, z<=1.5→1, z<=2→2, else 3.
    A NULL z (single-row group, zero variance, null value) stays NULL —
    the when() chain's conditions are all null→false, so without the
    guard an unknown z would fall to otherwise(3) and be reported as
    an extreme high anomaly."""
    z = F.col(z) if isinstance(z, str) else z
    return (
        F.when(z.isNull(), F.lit(None))
        .when(z < -2.0, -3)
        .when(z < -1.5, -2)
        .when(z < -1.0, -1)
        .when(z <= 1.0, 0)
        .when(z <= 1.5, 1)
        .when(z <= 2.0, 2)
        .otherwise(3)
        .cast("int")
    )


def anomaly_label(level: Column | str) -> Column:
    """Severity level → human label (`api/routes/metrics.py:221-250`)."""
    lv = F.col(level) if isinstance(level, str) else level
    return (
        F.when(lv.isNull(), F.lit(None))
        .when(lv == -3, "extreme_low")
        .when(lv == -2, "severe_low")
        .when(lv == -1, "moderate_low")
        .when(lv == 0, "normal")
        .when(lv == 1, "moderate_high")
        .when(lv == 2, "severe_high")
        .otherwise("extreme_high")
    )


def percentile_bin(value: Column | str, thresholds: dict[int, Column | str]) -> Column:
    """Assign the highest percentile bin whose threshold the value passes —
    descending CASE chain mirroring `metrics/percentiles.py:115-149`.

    ``thresholds`` maps percentile → threshold column (e.g. {99: 'p99', ...}).
    """
    v = F.col(value) if isinstance(value, str) else value
    result = None
    for p in sorted(thresholds, reverse=True):
        thr = thresholds[p]
        thr = F.col(thr) if isinstance(thr, str) else thr
        cond = v >= thr
        result = F.when(cond, p) if result is None else result.when(cond, p)
    return (result.otherwise(0)).cast("int")


# Abramowitz & Stegun 7.1.26 rational erfc approximation (|err| ≤ 1.5e-7).
# Used for the Mann-Kendall z→p step so BOTH engines run the *identical*
# polynomial — math.erfc differs from any SQL reimplementation in the last
# ulps, but the same closed-form arithmetic is bit-reproducible anywhere.
_AS_COEFFS = (0.254829592, -0.284496736, 1.421413741,
              -1.453152027, 1.061405429)
_AS_P = 0.3275911


def normal_sf_two_sided(z: Column | str) -> Column:
    """Two-tailed normal survival p = erfc(|z|/√2) via A&S 7.1.26."""
    zc = F.col(z) if isinstance(z, str) else z
    x = F.abs(zc) / F.lit(2.0 ** 0.5)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    a1, a2, a3, a4, a5 = _AS_COEFFS
    poly = (F.lit(a1) * t + F.lit(a2) * t**2 + F.lit(a3) * t**3
            + F.lit(a4) * t**4 + F.lit(a5) * t**5)
    return poly * F.exp(-(x * x))


def sql_normal_sf_two_sided(z_expr: str) -> str:
    """DuckDB mirror of :func:`normal_sf_two_sided` (same coefficients,
    same association order)."""
    a1, a2, a3, a4, a5 = _AS_COEFFS
    x = f"(abs({z_expr}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + {_AS_P} * {x}))"
    return (f"(({a1} * {t} + {a2} * pow({t}, 2) + {a3} * pow({t}, 3) "
            f"+ {a4} * pow({t}, 4) + {a5} * pow({t}, 5)) "
            f"* exp(-({x} * {x})))")
