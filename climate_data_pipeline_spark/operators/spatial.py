"""Spatial operators for gridded/station climate data: great-circle
(haversine) distance, nearest-station assignment, and bilinear grid
interpolation — the remapping primitives the reference's point/region
API implies but computes only as exact-index selection
(`api/routes/data.py:88-169`, `src/benchmark_suite.py:156-162` nearest
= `isel` on the coordinate index). In the row model these become joins.

Scale design:

- **nearest_neighbor**: the station list is a dimension (thousands of
  rows — weather networks, not facts), so it broadcasts; each target row
  scans the broadcast list with an arg-min fold. Cost is
  |targets| × |stations| map-side work with NO shuffle of the target
  side. A lat-band prefilter (``band_deg``) cuts the per-row constant
  when the station list is large: only stations within ±band_deg of the
  target's latitude are scored (correct whenever the true nearest is
  inside the band — guaranteed when band_deg ≥ the worst-case
  nearest-station separation).
- **bilinear_regrid**: each target generates its 4 surrounding corner
  keys (explode ×4 — bounded, not data-dependent), one equi-join
  against the grid on the quantized key, one sum-by-target. The grid
  side broadcasts when it fits (a global 0.25° grid is ~1M rows/var —
  broadcastable); otherwise it is an equi-join both engines shuffle on
  the corner key, never a cross join.

Determinism: distances are rounded before arg-min comparison and
tie-broken by station id, so ordering is identical in any engine;
bilinear weights are exact IEEE products of coordinate fractions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1, lon1, lat2, lon2) -> F.Column:
    """Great-circle distance in km between two (degree) coordinate
    pairs — the standard haversine formula on a spherical Earth
    (R = 6371 km).

    Written as explicit products (no ``pow``) so the arithmetic
    sequence — and therefore the IEEE rounding — is reproducible in any
    SQL engine for oracle parity."""
    sy = F.sin(F.radians(lat2 - lat1) / 2)
    sx = F.sin(F.radians(lon2 - lon1) / 2)
    a = sy * sy + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * sx * sx
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def nearest_neighbor(targets: DataFrame, stations: DataFrame,
                     target_keys: list[str],
                     station_id: str = "station_id",
                     lat_col: str = "lat", lon_col: str = "lon",
                     band_deg: float | None = None,
                     round_dp: int = 6) -> DataFrame:
    """Assign each target row its nearest station by great-circle
    distance (deterministic: min over (rounded distance, station id)).

    ``targets`` needs (target_keys..., lat_col, lon_col); ``stations``
    needs (station_id, lat_col, lon_col). Output: target_keys +
    nearest station id + ``distance_km`` (rounded to ``round_dp``).

    The station side is broadcast; the arg-min is a struct-min
    aggregation (one map-side-combinable agg, no window sort). With
    ``band_deg`` set, candidate pairs are restricted to stations within
    that latitude band of the target before scoring — a target with NO
    station in its band is absent from the output (size the band to the
    worst-case station spacing). Stations with NULL coordinates are
    excluded (a NULL distance would win the struct arg-min)."""
    # a station with NULL coordinates yields a NULL distance, and a
    # NULL struct field sorts BELOW every real value in the arg-min —
    # it would win "nearest" for every target; exclude it up front
    st = (stations.where(F.col(lat_col).isNotNull()
                         & F.col(lon_col).isNotNull())
                  .select(F.col(station_id).alias("__sid"),
                          F.col(lat_col).alias("__slat"),
                          F.col(lon_col).alias("__slon")))
    cond = F.lit(True)
    if band_deg is not None:
        cond = (F.abs(F.col(lat_col) - F.col("__slat")) <= band_deg)
    pairs = targets.join(F.broadcast(st), on=cond)
    dist = F.round(haversine_km(F.col(lat_col), F.col(lon_col),
                                F.col("__slat"), F.col("__slon")), round_dp)
    best = F.min(F.struct(dist.alias("d"),
                          F.col("__sid").alias("sid"))).alias("__best")
    out = (pairs.groupBy(*target_keys).agg(best))
    return out.select(*target_keys,
                      F.col("__best.sid").alias("nearest_" + station_id),
                      F.col("__best.d").alias("distance_km"))


def bilinear_regrid(grid: DataFrame, targets: DataFrame,
                    target_keys: list[str],
                    value_col: str = "value",
                    lat_col: str = "lat", lon_col: str = "lon",
                    lat_step: float = 1.0, lon_step: float = 1.0,
                    alias: str | None = None) -> DataFrame:
    """Bilinear interpolation of a regular (lat, lon) grid at arbitrary
    target points — the xesmf/`xr.interp` remapping analogue.

    ``grid`` holds one row per cell (lat_col, lon_col, value_col) with
    coordinates on multiples of (lat_step, lon_step); ``targets`` holds
    (target_keys..., lat_col, lon_col). Each target point contributes
    its 4 surrounding corners with weights
    ``(1-fy)(1-fx), (1-fy)fx, fy(1-fx), fy·fx`` where fy/fx are the
    fractional offsets inside the cell; corners join the grid on the
    INTEGER cell index (round(coord/step)) — joining on recomputed
    float coordinates silently drops corners whenever the step is not
    binary-exact (0.1, 0.05: ``0.2 + 0.1 != 0.3``), returning
    plausible-looking edge-renormalized wrong values with no error.
    The 4 corner keys are always distinct,
    so no pre-join dedup shuffle is needed — a point ON a grid line
    simply carries zero weight on its far corners (exact: 1-fy is
    exactly 1.0 when fy is exactly 0.0), which reproduces exact-node
    interpolation.

    Output: target_keys + ``<value_col>_interp`` (or ``alias``) +
    ``n_corners`` (4 inside the grid; fewer at the outer edge, where
    the available corners' weights are renormalized by the
    sum-of-weights denominator)."""
    out_col = alias or f"{value_col}_interp"
    g = grid.select(
        F.round(F.col(lat_col) / lat_step).cast("long").alias("__giy"),
        F.round(F.col(lon_col) / lon_step).cast("long").alias("__gix"),
        F.col(value_col).alias("__gval"))

    iy0 = F.floor(F.col(lat_col) / lat_step).cast("long")
    ix0 = F.floor(F.col(lon_col) / lon_step).cast("long")
    fy = F.col(lat_col) / lat_step - iy0
    fx = F.col(lon_col) / lon_step - ix0

    def corner(dy: int, dx: int) -> F.Column:
        wy = fy if dy else (1.0 - fy)
        wx = fx if dx else (1.0 - fx)
        return F.struct(
            (iy0 + dy).alias("ciy"),
            (ix0 + dx).alias("cix"),
            (wy * wx).alias("w"))

    corners = (targets
               .select(*target_keys, F.explode(F.array(
                   corner(0, 0), corner(0, 1),
                   corner(1, 0), corner(1, 1))).alias("__c"))
               .select(*target_keys,
                       F.col("__c.ciy").alias("__ciy"),
                       F.col("__c.cix").alias("__cix"),
                       F.col("__c.w").alias("__w")))

    joined = corners.join(
        F.broadcast(g),
        (F.col("__ciy") == F.col("__giy"))
        & (F.col("__cix") == F.col("__gix")))
    return (joined.groupBy(*target_keys)
                  .agg((F.sum(F.col("__w") * F.col("__gval"))
                        / F.sum("__w")).alias(out_col),
                       F.count("*").alias("n_corners")))
