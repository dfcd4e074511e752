"""Synthetic climate-field generator (SURVEY.md S11, F8).

Reproduces the *shape and statistical structure* of the reference's test
fixtures and demo data — latitude-banded temperature with a seasonal
cycle plus noise, exponential precipitation — as a long/tall DataFrame
built entirely from `spark.range` + column expressions (no driver-side
data, generates any size distributed):

- fixture family: `/root/reference/tests/conftest.py:8-66`
  (temperature = 288 − 40·|lat|/90 + 10·sin(2π(doy−80)/365) + N(0,2);
  precipitation ~ Exp(0.001))
- demo/benchmark family: `/root/reference/src/arco_demo.py:36-116`,
  `src/benchmark_suite.py:269-327`
- location-aware API fake: `api/index.py:16-45` (cos-lat base,
  hemisphere-phased seasonal sine, longitude ripple)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def climate_grid(spark: SparkSession,
                 start: str = "2020-01-01",
                 days: int = 731,
                 lat_step: float = 10.0,
                 lon_step: float = 10.0,
                 seed: int = 42) -> DataFrame:
    """Daily (ts, lat, lon, temperature, precipitation) grid matching the
    reference's `sample_dataset` fixture: 731 days × 19 lats × 36 lons by
    default (≈500k rows). Fully distributed: one `spark.range` over the
    row space, coordinates derived arithmetically. Noise is derived
    from ``xxhash64(id, seed)`` (Box-Muller for the normal, inverse-CDF
    for the exponential) rather than `F.randn`/`F.rand`, whose values
    depend on the PARTITION INDEX — the same seed on local[8] vs
    local[32] would assign different noise to the same (ts, lat, lon)
    row, silently breaking any cached baseline or cross-machine
    comparison built on "seeded" data."""
    import math
    n_lat = int(180 / lat_step) + 1          # -90 … 90 inclusive
    n_lon = int(360 / lon_step)              # -180 … 170
    total = days * n_lat * n_lon

    idx = spark.range(total)
    day = (F.col("id") / (n_lat * n_lon)).cast("long")
    lat = -90.0 + ((F.col("id") / n_lon).cast("long") % n_lat) * lat_step
    lon = -180.0 + (F.col("id") % n_lon) * lon_step
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start).cast("timestamp")) + day * 86400)
    doy = F.dayofyear(ts)

    m = 1 << 30

    def unif(s: int) -> F.Column:
        # id-derived uniform in the OPEN interval (0, 1): deterministic
        # for a given (id, seed) on any partitioning / core count
        return ((F.pmod(F.xxhash64(F.col("id"), F.lit(s)), F.lit(m))
                 .cast("double") + 0.5) / float(m))

    seasonal = 10.0 * F.sin(2.0 * math.pi * (doy - 80) / 365.0)
    # Box-Muller standard normal from two id-derived uniforms
    gauss = (F.sqrt(-2.0 * F.log(unif(seed)))
             * F.cos(2.0 * math.pi * unif(seed + 1)))
    temperature = (288.0 - 40.0 * F.abs(lat) / 90.0 + seasonal
                   + 2.0 * gauss)
    # inverse-CDF exponential: Exp(scale) = -scale·ln(1-U)
    precipitation = -0.001 * F.log(1.0 - unif(seed + 2))

    return idx.select(
        ts.alias("ts"),
        lat.cast("double").alias("lat"),
        lon.cast("double").alias("lon"),
        temperature.cast("double").alias("temperature"),
        precipitation.cast("double").alias("precipitation"),
    )


def location_temperature(lat: F.Column, lon: F.Column, doy: F.Column) -> F.Column:
    """The reference API's location-aware synthetic temperature
    (`api/index.py:16-45`): cos-latitude base + hemisphere-phased seasonal
    sine + longitude ripple (°C)."""
    import math
    base = 30.0 * F.cos(F.radians(lat)) - 10.0
    phase = F.when(lat >= 0, 0.0).otherwise(float(math.pi))
    seasonal = 10.0 * F.sin(2.0 * math.pi * (doy - 172) / 365.0 + phase)
    ripple = 2.0 * F.sin(F.radians(lon) * 3.0)
    return base + seasonal + ripple
