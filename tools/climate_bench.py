"""Replicate the reference's benchmark suite on this engine.

The reference benchmarks 4 access patterns over a dense (time, lat, lon)
grid (`/root/reference/src/benchmark_suite.py:122-195`, suite assembly
:218-227) with a < 2,000 ms pass/fail target (:44) at "medium" scale
(365×180×360 ≈ 90 MB float32, :282):

  single_timestep    — full spatial slice at one random time
  spatial_subset     — 20×20 grid box at one time
  time_series_point  — full series at one random grid point
  monthly_mean       — mean over 30 consecutive timesteps

Here the same grid is a 23.8M-row long table written with the ``spatial``
layout preset (directory-partitioned by month, sorted by cell) so each
pattern prunes: time predicates prune directories/row-groups, point
predicates prune via min/max stats. Run:

    python tools/climate_bench.py [--scale medium|small] [--iters 20]

Prints the reference-style JSON report (mean/median/p95/p99/max ms +
meets_target per benchmark).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = {  # reference benchmark_suite.py:280-284
    "small": dict(days=100, lat_step=2.0, lon_step=2.0),    # (100, 91, 180)
    "medium": dict(days=365, lat_step=1.0, lon_step=1.0),   # (365, 181, 360)
}


def _build_zarr_store(cfg: dict, store: str) -> int:
    """Dense numpy grid → ARCO store with the reference's benchmark
    chunking (50×50×50 Blosc zstd-3, `src/benchmark_suite.py:307-323`)."""
    import numpy as np

    from climate_data_pipeline_spark.sources.zarr2 import write_zarr

    days = cfg["days"]
    lat = -90.0 + np.arange(int(180 / cfg["lat_step"]) + 1) * cfg["lat_step"]
    lon = -180.0 + np.arange(int(360 / cfg["lon_step"])) * cfg["lon_step"]
    t = np.arange(days, dtype=np.int32)
    doy = t + 1
    rng = np.random.default_rng(42)
    temp = (288.0 - 40.0 * np.abs(lat)[None, :, None] / 90.0
            + 10.0 * np.sin(2 * np.pi * (doy - 80) / 365.0)[:, None, None]
            + rng.normal(0, 2, (days, len(lat), len(lon)))
            ).astype(np.float32)
    write_zarr(store,
               dims={"time": t, "lat": lat, "lon": lon},
               variables={"temperature": (["time", "lat", "lon"], temp, {})},
               chunks={"temperature": [50, 50, 50]})
    # CF-encode time like xarray would
    for fname in (os.path.join(store, "time", ".zattrs"),):
        with open(fname) as fh:
            z = json.load(fh)
        z["units"] = "days since 2020-01-01"
        with open(fname, "w") as fh:
            json.dump(z, fh)
    with open(os.path.join(store, ".zmetadata")) as fh:
        m = json.load(fh)
    m["metadata"]["time/.zattrs"]["units"] = "days since 2020-01-01"
    with open(os.path.join(store, ".zmetadata"), "w") as fh:
        json.dump(m, fh)
    return int(temp.size)


def _build_zarr3_store(cfg: dict, store: str) -> int:
    """Same dense grid as a Zarr v3 group store (zarr-python >= 3's
    default format) with the benchmark chunking; read back through the
    v3-normalized chunk-per-task distributed reader."""
    import numpy as np

    from climate_data_pipeline_spark.sources.zarr2 import write_zarr3

    days = cfg["days"]
    lat = -90.0 + np.arange(int(180 / cfg["lat_step"]) + 1) * cfg["lat_step"]
    lon = -180.0 + np.arange(int(360 / cfg["lon_step"])) * cfg["lon_step"]
    t = (np.datetime64("2020-01-01")
         + np.arange(days).astype("timedelta64[D]")).astype("datetime64[ns]")
    doy = np.arange(days) + 1
    rng = np.random.default_rng(42)
    temp = (288.0 - 40.0 * np.abs(lat)[None, :, None] / 90.0
            + 10.0 * np.sin(2 * np.pi * (doy - 80) / 365.0)[:, None, None]
            + rng.normal(0, 2, (days, len(lat), len(lon)))
            ).astype(np.float32)
    write_zarr3(store,
                dims={"time": t, "lat": lat, "lon": lon},
                variables={"temperature": (["time", "lat", "lon"], temp, {})},
                chunks={"temperature": [50, 50, 50]}, codec="zstd")
    return int(temp.size)


def _build_hdf5_store(cfg: dict, store: str) -> int:
    """Same dense grid → a netCDF-4-flavoured HDF5 file with the
    reference's benchmark chunking (50×50×50, shuffle+deflate) — the
    reference's PRIMARY on-disk format, read back through the
    chunk-per-task distributed reader with chunk-index pruning."""
    import numpy as np

    from climate_data_pipeline_spark.sources.hdf5 import write_hdf5

    days = cfg["days"]
    lat = -90.0 + np.arange(int(180 / cfg["lat_step"]) + 1) * cfg["lat_step"]
    lon = -180.0 + np.arange(int(360 / cfg["lon_step"])) * cfg["lon_step"]
    t = np.arange(days, dtype=np.int32)
    doy = t + 1
    rng = np.random.default_rng(42)
    temp = (288.0 - 40.0 * np.abs(lat)[None, :, None] / 90.0
            + 10.0 * np.sin(2 * np.pi * (doy - 80) / 365.0)[:, None, None]
            + rng.normal(0, 2, (days, len(lat), len(lon)))
            ).astype(np.float32)
    write_hdf5(store,
               dims={"time": (t, {"units": "days since 2020-01-01"}),
                     "lat": lat, "lon": lon},
               variables={"temperature": (["time", "lat", "lon"], temp, {})},
               chunks={"temperature": (50, 50, 50)},
               compress=True)
    return int(temp.size)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="medium", choices=sorted(SCALES))
    ap.add_argument("--store", default="parquet",
                    choices=["parquet", "zarr", "zarr3", "hdf5"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from climate_data_pipeline_spark.session import get_spark
    from climate_data_pipeline_spark.sources.io import write_parquet
    from climate_data_pipeline_spark.sources.synthetic import climate_grid

    spark = get_spark(app_name="climate-bench")
    spark.sparkContext.setLogLevel("ERROR")

    cfg = SCALES[args.scale]
    store = os.path.join(tempfile.mkdtemp(prefix="climate_bench_"), "grid")
    if args.store in ("zarr", "zarr3"):
        t0 = time.perf_counter()
        n_rows = (_build_zarr_store(cfg, store) if args.store == "zarr"
                  else _build_zarr3_store(cfg, store))
        build_s = time.perf_counter() - t0
        df = None  # zarr patterns construct pruned reads per query
    elif args.store == "hdf5":
        store += ".nc"
        t0 = time.perf_counter()
        n_rows = _build_hdf5_store(cfg, store)
        build_s = time.perf_counter() - t0
        df = None  # hdf5 patterns construct pruned reads per query
    else:
        grid = climate_grid(spark, start="2020-01-01", **cfg)
        t0 = time.perf_counter()
        write_parquet(grid, store, layout="spatial",
                      entity_cols=["lat", "lon"],
                      time_col="ts", overwrite=True)
        build_s = time.perf_counter() - t0
        df = spark.read.parquet(store)
        n_rows = df.count()

    import random
    rng = random.Random(42)
    days = cfg["days"]

    def rand_ts(max_day_offset: int = 0) -> str:
        day = rng.randrange(days - max_day_offset)
        return f"2020-01-01T00:00:00+{day}"  # resolved below

    def ts_of(day: int) -> str:
        import datetime
        return str(datetime.date(2020, 1, 1) + datetime.timedelta(days=day))

    if args.store in ("zarr", "zarr3", "hdf5"):
        if args.store in ("zarr", "zarr3"):
            from climate_data_pipeline_spark.sources.zarr2 import (
                read_zarr_long_distributed,
            )

            def zread(**kw):
                return read_zarr_long_distributed(spark, store, **kw)
        else:
            from climate_data_pipeline_spark.sources.hdf5 import (
                read_hdf5_long_distributed,
            )

            def zread(**kw):
                return read_hdf5_long_distributed(spark, store, **kw)

        benchmarks = {
            # same four access patterns, chunk-index-pruned zarr reads
            "single_timestep": lambda: (lambda d: zread(
                time_range=(ts_of(d), ts_of(d)))
                .select("lat", "lon", "temperature"))(rng.randrange(days)),
            "spatial_subset": lambda: (lambda d, lat0, lon0: zread(
                time_range=(ts_of(d), ts_of(d)),
                bbox=(lon0, lat0, lon0 + 20 * cfg["lon_step"],
                      lat0 + 20 * cfg["lat_step"]))
                .select("lat", "lon", "temperature"))(
                    rng.randrange(days), rng.uniform(-90, 60),
                    rng.uniform(-180, 140)),
            "time_series_point": lambda: (lambda lat, lon: zread(
                bbox=(lon, lat, lon, lat))
                .select("time", "temperature"))(
                    -90.0 + cfg["lat_step"]
                    * rng.randrange(int(180 / cfg["lat_step"])),
                    -180.0 + cfg["lon_step"]
                    * rng.randrange(int(360 / cfg["lon_step"]))),
            "monthly_mean": lambda: (lambda d0: zread(
                time_range=(ts_of(d0), ts_of(d0 + 29)))
                .groupBy("lat", "lon")
                .agg(F.avg("temperature").alias("mean_t")))(
                    rng.randrange(days - 30)),
        }
        run_report(args, n_rows, build_s, benchmarks)
        return

    benchmarks = {
        # full spatial slice at one time (benchmark_suite.py:124-126)
        "single_timestep": lambda: df.where(
            F.col("ts") == F.lit(ts_of(rng.randrange(days))).cast("timestamp"))
            .select("lat", "lon", "temperature"),
        # 20x20 box at one time (benchmark_suite.py:131-142)
        "spatial_subset": lambda: (lambda lat0, lon0, d: df.where(
            (F.col("ts") == F.lit(ts_of(rng.randrange(days))).cast("timestamp"))
            & F.col("lat").between(lat0, lat0 + 20 * cfg["lat_step"])
            & F.col("lon").between(lon0, lon0 + 20 * cfg["lon_step"]))
            .select("lat", "lon", "temperature"))(
                rng.uniform(-90, 60), rng.uniform(-180, 140), None),
        # full series at one point (benchmark_suite.py:147-154)
        "time_series_point": lambda: (lambda lat, lon: df.where(
            (F.col("lat") == lat) & (F.col("lon") == lon))
            .select("ts", "temperature"))(
                -90.0 + cfg["lat_step"] * rng.randrange(int(180 / cfg["lat_step"])),
                -180.0 + cfg["lon_step"] * rng.randrange(int(360 / cfg["lon_step"]))),
        # mean over 30 consecutive timesteps (benchmark_suite.py:156-170)
        "monthly_mean": lambda: (lambda d0: df.where(
            F.col("ts").between(ts_of(d0), ts_of(d0 + 29)))
            .groupBy("lat", "lon")
            .agg(F.avg("temperature").alias("mean_t")))(
                rng.randrange(days - 30)),
    }

    run_report(args, n_rows, build_s, benchmarks)


def run_report(args, n_rows: int, build_s: float, benchmarks: dict) -> None:
    report = {}
    for name, build in benchmarks.items():
        for _ in range(args.warmup):
            build().write.format("noop").mode("overwrite").save()
        times_ms = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            times_ms.append((time.perf_counter() - t0) * 1000)
        times_ms.sort()
        report[name] = {
            "mean_ms": round(statistics.mean(times_ms), 1),
            "median_ms": round(statistics.median(times_ms), 1),
            "p95_ms": round(times_ms[min(len(times_ms) - 1,
                                         int(0.95 * len(times_ms)))], 1),
            "p99_ms": round(times_ms[min(len(times_ms) - 1,
                                         int(0.99 * len(times_ms)))], 1),
            "max_ms": round(times_ms[-1], 1),
            "meets_target": times_ms[-1] < 2000.0,  # ref :44
        }

    print(json.dumps({
        "scale": args.scale,
        "store": args.store,
        "grid_rows": n_rows,
        "store_build_s": round(build_s, 1),
        "iterations": args.iters,
        "target_ms": 2000.0,
        "benchmarks": report,
        "all_meet_target": all(r["meets_target"] for r in report.values()),
    }, indent=2))


if __name__ == "__main__":
    main()
