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
from pyspark.sql.types import IntegerType, LongType

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
                     cell_deg: float | None = None,
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
    excluded (a NULL distance would win the struct arg-min).

    ``band_deg`` is a PREDICATE on the nested-loop join: it prunes the
    haversine work but the join still evaluates |Δlat| on every
    target×station pair. ``cell_deg`` replaces the pair scan itself
    with a HASH equi-join on latitude cells (station → its
    ``floor(lat/cell_deg)`` cell; target → its cell ±1, a 3-row
    map-side explode), guaranteeing every station within ``cell_deg``
    degrees of latitude is a candidate — correct whenever the true
    nearest station is within ``cell_deg`` · 111 km (size it to the
    worst-case station spacing, same contract as ``band_deg``). This
    is the 100 TB shape: candidate volume ∝ stations per cell, never
    |targets| × |stations|."""
    # a station with NULL coordinates yields a NULL distance, and a
    # NULL struct field sorts BELOW every real value in the arg-min —
    # it would win "nearest" for every target; exclude it up front
    st = (stations.where(F.col(lat_col).isNotNull()
                         & F.col(lon_col).isNotNull())
                  .select(F.col(station_id).alias("__sid"),
                          F.col(lat_col).alias("__slat"),
                          F.col(lon_col).alias("__slon")))
    packed = (round_dp <= 2
              and isinstance(st.schema["__sid"].dataType,
                             (LongType, IntegerType)))
    if packed:
        # arg-min as a PLAIN min over one packed BIGINT: a struct-min
        # (or min_by with a struct ordering key) has no fixed-width
        # mutable buffer, so Spark plans SortAggregate — a full sort of
        # the candidate pairs (measured ~2× the whole query). Earth
        # distances rounded to ≤ 2 dp fit 21 bits (20016·100 < 2^21),
        # leaving 42 bits of id space; lexicographic (distance, id)
        # order is preserved, so the result — including the low-id
        # tie-break — is identical, through a HashAggregate. The id
        # range guard is folded into the key expression below (a
        # standalone checked column would be pruned away by Catalyst).
        pass
    # per-SIDE unit vectors, so the per-PAIR great-circle term is a
    # 3-component dot product (6 mul/add) instead of seven trig calls:
    # cos Δ = x·y for unit vectors, and 2R·asin(√((1−x·y)/2)) is the
    # identical haversine distance. Trig cost becomes O(targets +
    # stations), not O(candidate pairs) — measured ~3× off the pair
    # stage at sf0.1.
    def unit_vec(df2, lat, lon, p):
        rlat, rlon = F.radians(F.col(lat)), F.radians(F.col(lon))
        return (df2.withColumn(f"__{p}x", F.cos(rlat) * F.cos(rlon))
                   .withColumn(f"__{p}y", F.cos(rlat) * F.sin(rlon))
                   .withColumn(f"__{p}z", F.sin(rlat)))

    st = unit_vec(st, "__slat", "__slon", "s")
    tg = unit_vec(targets, lat_col, lon_col, "t")
    if cell_deg is not None:
        st = st.withColumn("__cell",
                           F.floor(F.col("__slat") / cell_deg))
        cell0 = F.floor(F.col(lat_col) / cell_deg)
        # a small target table often arrives as ONE file split, and the
        # broadcast join + arg-min pipeline is narrow from there — the
        # whole stations-per-target compute would serialize in a single
        # task. Fan the cheap side out first (a ~rows-sized shuffle,
        # nothing against a real cluster-scale target table, where the
        # scan already carries enough splits to skip this branch).
        par = targets.sparkSession.sparkContext.defaultParallelism
        if targets.rdd.getNumPartitions() < par:
            targets = targets.repartition(par)
            tg = unit_vec(targets, lat_col, lon_col, "t")
        tg = tg.withColumn(
            "__cell", F.explode(F.array(cell0 - 1, cell0, cell0 + 1)))
        pairs = tg.join(F.broadcast(st), "__cell")
    else:
        cond = F.lit(True)
        if band_deg is not None:
            cond = (F.abs(F.col(lat_col) - F.col("__slat")) <= band_deg)
        pairs = tg.join(F.broadcast(st), on=cond)
    dot = (F.col("__tx") * F.col("__sx") + F.col("__ty") * F.col("__sy")
           + F.col("__tz") * F.col("__sz"))
    # clamp for fp safety: a dot a hair above 1 would sqrt a negative
    hav = F.greatest(F.lit(0.0), F.least(F.lit(1.0), (1.0 - dot) / 2.0))
    dist = F.round(F.lit(2.0 * EARTH_RADIUS_KM)
                   * F.asin(F.sqrt(hav)), round_dp)
    if packed:
        scale = 10 ** round_dp
        # assert_true returns NULL when the condition holds (and throws
        # when it doesn't) — adding its coalesce keeps the guard inside
        # the evaluated expression where column pruning can't drop it
        guard = F.coalesce(
            F.assert_true(
                (F.col("__sid") >= 0) & (F.col("__sid") < (1 << 42)),
                F.lit("nearest_neighbor packed arg-min needs station "
                      "ids in [0, 2^42)")).cast("long"),
            F.lit(0))
        key = (F.round(dist * scale).cast("long") * F.lit(1 << 42)
               + F.col("__sid") + guard)
        out = pairs.groupBy(*target_keys).agg(F.min(key).alias("__key"))
        # shiftright, NOT floor(key / 2^42): long/long division goes
        # through double, whose 53-bit mantissa can round a 63-bit key
        # across the 2^42 boundary (wrong distance by one ulp of the
        # rounding scale); the shift is exact for the non-negative key
        return out.select(
            *target_keys,
            (F.col("__key") % (1 << 42)).alias("nearest_" + station_id),
            (F.shiftright(F.col("__key"), 42) / scale)
            .alias("distance_km"))
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
