"""Spatial remapping queries: nearest-station assignment and bilinear
grid interpolation (`operators/spatial`).

The synthetic geometry derives from key columns so both engines build
bit-identical coordinates: stations on a 10° grid from supplier keys,
target points with 0.1° resolution from customer keys, and a 19×36-cell
value grid from per-cell lineitem quantity averages (integer-valued
sums — exact in IEEE, so cell values match bit-for-bit).

Float discipline: the haversine is written as the identical operation
sequence in both engines (explicit products, no pow) and rounded to
2 dp *before* the arg-min comparison — trig libraries may differ in the
last ulps (~1e-11 km absolute), so the 0.005 km rounding boundary
leaves ~9 orders of magnitude of margin, and ties after rounding break
on station id in both engines. Bilinear weights are exact IEEE products
of identically-computed fractions; outputs round to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import spatial as SP
from ..registry import query
from ..sources.io import load_table

_STATIONS_SQL = """stations AS (
  SELECT s_suppkey AS sid,
         (s_suppkey % 19) * 10.0 - 90.0 AS slat,
         (s_suppkey % 36) * 10.0 - 180.0 AS slon
  FROM supplier
)"""

_TARGETS_SQL = """targets AS (
  SELECT c_custkey,
         (c_custkey % 1700) / 10.0 - 85.0 AS tlat,
         (c_custkey % 3400) / 10.0 - 170.0 AS tlon
  FROM customer
)"""


def _stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(F.col("s_suppkey").alias("station_id"),
                    ((F.col("s_suppkey") % 19) * 10.0 - 90.0).alias("lat"),
                    ((F.col("s_suppkey") % 36) * 10.0 - 180.0).alias("lon"))


def _targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey",
                    ((F.col("c_custkey") % 1700) / 10.0 - 85.0).alias("lat"),
                    ((F.col("c_custkey") % 3400) / 10.0 - 170.0).alias("lon"))


@query("spatial_nearest_station", oracle=f"""
WITH {_STATIONS_SQL}, {_TARGETS_SQL},
d AS (
  SELECT t.c_custkey, s.sid,
         round(2.0 * 6371.0 * asin(sqrt(
             sin(radians(s.slat - t.tlat) / 2)
               * sin(radians(s.slat - t.tlat) / 2)
             + cos(radians(t.tlat)) * cos(radians(s.slat))
               * sin(radians(s.slon - t.tlon) / 2)
               * sin(radians(s.slon - t.tlon) / 2))), 2) AS dkm
  FROM targets t, stations s
)
SELECT c_custkey, sid AS nearest_station_id, dkm AS distance_km
FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY dkm, sid) AS rn FROM d)
WHERE rn = 1
""")
def nearest_station_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest weather station per point (`operators/spatial.
    nearest_neighbor`): broadcast station dimension, latitude-CELL hash
    equi-join for candidates, map-side haversine scoring, struct-min
    arg-min — never a targets × stations pair scan. cell_deg = 10 is
    lossless for this station layout: stations occupy every 10° of
    latitude, so a target's nearest station is at most
    √((5·111)² + (5·111)²) ≈ 785 km away, and any station beyond 10°
    of latitude (≥ 1110 km) can never beat it — the ±1-cell window
    (|Δlat| ≤ 10° guaranteed) therefore always contains the true
    arg-min, which the full-scan oracle confirms by hash. The
    reference serves nearest-point reads as coordinate-index selection
    (`src/benchmark_suite.py:156-162`); the row-model generalization
    is this bucketed arg-min join."""
    return SP.nearest_neighbor(
        _targets(spark, sf_dir), _stations(spark, sf_dir),
        target_keys=["c_custkey"], cell_deg=10.0, round_dp=2)


@query("spatial_bilinear_regrid", oracle=f"""
WITH grid AS (
  -- integer cell indices, mirroring the engine's round(coord/step)
  -- join keys (float-coordinate equality breaks for non-binary steps)
  SELECT CAST(round(((l_partkey % 19) * 10.0 - 90.0) / 10.0) AS BIGINT)
           AS giy,
         CAST(round(((l_partkey % 36) * 10.0 - 180.0) / 10.0) AS BIGINT)
           AS gix,
         avg(l_quantity) AS gval
  FROM lineitem GROUP BY 1, 2
), {_TARGETS_SQL},
base AS (
  SELECT c_custkey,
         CAST(floor(tlat / 10.0) AS BIGINT) AS iy0,
         CAST(floor(tlon / 10.0) AS BIGINT) AS ix0,
         tlat / 10.0 - floor(tlat / 10.0) AS fy,
         tlon / 10.0 - floor(tlon / 10.0) AS fx
  FROM targets
), corners AS (
  SELECT c_custkey, iy0 AS ciy, ix0 AS cix,
         (1.0 - fy) * (1.0 - fx) AS w FROM base
  UNION ALL SELECT c_custkey, iy0, ix0 + 1, (1.0 - fy) * fx FROM base
  UNION ALL SELECT c_custkey, iy0 + 1, ix0, fy * (1.0 - fx) FROM base
  UNION ALL SELECT c_custkey, iy0 + 1, ix0 + 1, fy * fx FROM base
)
SELECT c.c_custkey,
       round(sum(c.w * g.gval) / sum(c.w), 6) AS qty_interp,
       count(*) AS n_corners
FROM corners c JOIN grid g ON g.giy = c.ciy AND g.gix = c.cix
GROUP BY 1
""")
def bilinear_regrid_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear interpolation of the per-cell quantity grid at 0.1°
    target points (`operators/spatial.bilinear_regrid`) — the
    `xr.interp`/xesmf remapping analogue: explode 4 corner keys per
    target, broadcast equi-join on the quantized coordinate, weighted
    sum per target. Cell values are exact (integer quantity sums /
    count), weights are exact IEEE fraction products; only the final
    4-term sum needs the 6 dp round."""
    l = load_table(spark, sf_dir, "lineitem")
    grid = (l.groupBy(((F.col("l_partkey") % 19) * 10.0 - 90.0).alias("lat"),
                      ((F.col("l_partkey") % 36) * 10.0 - 180.0).alias("lon"))
             .agg(F.avg("l_quantity").alias("gval")))
    out = SP.bilinear_regrid(grid, _targets(spark, sf_dir),
                             target_keys=["c_custkey"], value_col="gval",
                             lat_step=10.0, lon_step=10.0, alias="qty_interp")
    return out.select("c_custkey",
                      F.round("qty_interp", 6).alias("qty_interp"),
                      "n_corners")
