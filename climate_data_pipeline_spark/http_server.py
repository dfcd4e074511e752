"""Stdlib HTTP facade over the serving layer — the reference's FastAPI
surface (`api/main.py:106-317`) as a dependency-free `http.server` app,
so the endpoint contract (paths, status codes, payload keys) has a live,
testable analogue without FastAPI/uvicorn in the environment.

Endpoints mirrored (reference line refs in handlers):
  GET  /health                       liveness        (main.py:106)
  GET  /ready                        readiness       (main.py:118)
  GET  /metrics                      Prometheus text (main.py:130)
  GET  /datasets[?collection=]       dataset list    (main.py:142)
  GET  /datasets/{id}                dataset info    (main.py:176, 404)
  POST /data/query                   query→store URL (main.py:196, 422)
  GET  /data/{id}/{var}/metadata     var metadata    (main.py:228)
  GET  /stac /stac/collections /stac/search          (main.py:254-317)

Queries execute through the library `ServingApi`/`Catalog`; request
counters and latency accumulate in-process and render in the Prometheus
exposition format (the reference's `arco_requests_total` /
`arco_request_latency_seconds` counters, main.py:28-39).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

VERSION = "1.0.0"


class Metrics:
    """Prometheus-style counters, rendered in exposition text format."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests: dict[tuple[str, str, str], int] = {}
        self.latency_sum: dict[tuple[str, str], float] = {}
        self.latency_count: dict[tuple[str, str], int] = {}

    def observe(self, method: str, endpoint: str, status: int,
                seconds: float) -> None:
        with self._lock:
            k = (method, endpoint, str(status))
            self.requests[k] = self.requests.get(k, 0) + 1
            lk = (method, endpoint)
            self.latency_sum[lk] = self.latency_sum.get(lk, 0.0) + seconds
            self.latency_count[lk] = self.latency_count.get(lk, 0) + 1

    def render(self) -> str:
        lines = ["# TYPE arco_requests_total counter"]
        with self._lock:
            for (m, e, s), n in sorted(self.requests.items()):
                lines.append(
                    f'arco_requests_total{{method="{m}",endpoint="{e}",'
                    f'status="{s}"}} {n}')
            lines.append("# TYPE arco_request_latency_seconds summary")
            for (m, e), tot in sorted(self.latency_sum.items()):
                cnt = self.latency_count[(m, e)]
                lines.append(
                    f'arco_request_latency_seconds_sum{{method="{m}",'
                    f'endpoint="{e}"}} {tot:.6f}')
                lines.append(
                    f'arco_request_latency_seconds_count{{method="{m}",'
                    f'endpoint="{e}"}} {cnt}')
        return "\n".join(lines) + "\n"


class ApiError(Exception):
    def __init__(self, status: int, detail: str):
        super().__init__(detail)
        self.status = status
        self.detail = detail


class ServingHttpServer:
    """Routes HTTP requests onto a `Catalog` + `ServingApi`."""

    def __init__(self, catalog, data_lake_path: str = "/data"):
        from .serving import ServingApi

        self.catalog = catalog
        self.data_lake_path = data_lake_path
        self.metrics = Metrics()
        self.api = ServingApi(catalog.spark)
        self._httpd: ThreadingHTTPServer | None = None

    # --- route handlers (return (status, payload)) --------------------------

    def handle(self, method: str, path: str, query: dict,
               body: dict | None) -> tuple[int, object]:
        # the reference mounts its data router under /api/v1/data
        # (api/routes/data.py:9); accept both the prefixed (reference-
        # exact) and bare forms
        if path.startswith("/api/v1/data/"):
            path = path[len("/api/v1/data"):]
        if method == "GET" and path.startswith("/datasets/"):
            parts = path.split("/")
            if len(parts) == 4 and parts[3] in ("point", "region",
                                                "stats"):
                fn = {"point": self._point_route,
                      "region": self._region_route,
                      "stats": self._stats_route}[parts[3]]
                return 200, fn(parts[2], query)
        if method == "GET" and path.startswith("/api/v1/metrics/"):
            parts = path.split("/")
            if len(parts) == 6:
                fn = {"temporal": self._metric_temporal,
                      "percentiles": self._metric_percentiles,
                      "trend": self._metric_trend,
                      "anomaly": self._metric_anomaly}.get(parts[4])
                if fn is not None:
                    return 200, fn(parts[5], query)
        if method == "GET" and path == "/health":
            return 200, {"status": "healthy", "version": VERSION,
                         "data_lake_path": self.data_lake_path}
        if method == "GET" and path == "/ready":
            return 200, {"status": "ready"}
        if method == "GET" and path == "/metrics":
            return 200, self.metrics.render()     # text, not JSON
        if method == "GET" and path == "/datasets":
            collection = (query.get("collection") or [None])[0]
            names = self.catalog.list_datasets()
            if collection:
                names = [n for n in names if collection in n]
            return 200, [self._dataset_info(n) for n in names]
        if method == "GET" and path.startswith("/datasets/"):
            name = path.split("/", 2)[2]
            if name not in self.catalog.list_datasets():
                raise ApiError(404, f"Dataset {name} not found")
            return 200, self._dataset_info(name)
        if method == "POST" and path == "/data/query":
            return 200, self._data_query(body or {})
        if method == "GET" and path.startswith("/data/"):
            parts = path.split("/")
            if len(parts) == 5 and parts[4] == "metadata":
                return 200, self._variable_metadata(parts[2], parts[3])
        if method == "GET" and path == "/stac":
            return 200, {
                "type": "Catalog", "stac_version": "1.0.0",
                "id": "arco-catalog",
                "title": "ARCO Data Catalog",
                "description": "Analysis-Ready Cloud-Optimised catalog",
                "links": [{"rel": "self", "href": "/stac"},
                          {"rel": "root", "href": "/stac"},
                          {"rel": "child", "href": "/stac/collections"}]}
        if method == "GET" and path == "/stac/collections":
            return 200, {"collections": self.catalog.to_stac_items(),
                         "links": [{"rel": "self",
                                    "href": "/stac/collections"},
                                   {"rel": "root", "href": "/stac"}]}
        if method == "GET" and path == "/stac/search":
            wanted = (query.get("collections") or [""])[0]
            ids = [c for c in wanted.split(",") if c]
            feats = [it for it in self.catalog.to_stac_items()
                     if not ids or it["id"] in ids]
            return 200, {"type": "FeatureCollection", "features": feats,
                         "links": [{"rel": "self", "href": "/stac/search"},
                                   {"rel": "root", "href": "/stac"}],
                         "context": {"returned": len(feats),
                                     "matched": len(feats)}}
        raise ApiError(404, f"No route for {method} {path}")

    def _dataset_info(self, name: str) -> dict:
        d = self.catalog.describe(name)
        return {"id": d["id"], "name": d["title"],
                "description": d["attrs"].get("description", d["title"]),
                "format": "parquet" if d["path"].endswith(".parquet")
                          else ("zarr" if ".zarr" in d["path"] or
                                d["attrs"].get("format") == "zarr"
                                else "netcdf" if d["path"].endswith(".nc")
                                else "parquet"),
                "variables": sorted(d["variables"])}

    def _data_query(self, body: dict) -> dict:
        t0 = time.monotonic()
        for field in ("dataset_id", "variable"):
            if not body.get(field):
                raise ApiError(422, f"field {field!r} is required")
        bbox = body.get("bbox")
        if bbox is not None and (not isinstance(bbox, list)
                                 or len(bbox) != 4):
            raise ApiError(422, "bbox must be [west, south, east, north]")
        name = body["dataset_id"]
        if name not in self.catalog.list_datasets():
            raise ApiError(404, f"Dataset {name} not found")
        df = self.catalog.load(name)
        if body["variable"] not in df.columns:
            raise ApiError(404, f"variable {body['variable']!r} not in "
                                f"dataset {name}")
        zarr_url = f"{self.data_lake_path}/{name}/{body['variable']}.zarr"
        latency_ms = (time.monotonic() - t0) * 1000
        return {"dataset_id": name, "variable": body["variable"],
                "shape": [df.count(), 1] if body.get("compute_shape")
                         else [-1, 1],
                "dtype": dict((f.name, f.dataType.simpleString())
                              for f in df.schema.fields)[body["variable"]],
                "zarr_url": zarr_url,
                "access_latency_ms": round(latency_ms, 2)}

    def _variable_metadata(self, name: str, variable: str) -> dict:
        if name not in self.catalog.list_datasets():
            raise ApiError(404, f"Dataset {name} not found")
        d = self.catalog.describe(name)
        if variable not in d["variables"]:
            raise ApiError(404, f"variable {variable!r} not in {name}")
        return {"dataset_id": name, "variable": variable,
                "dimensions": sorted(d["variables"]),
                "dtype": d["variables"][variable]["dtype"],
                "compression": "zstd", "compression_level": 3,
                "attrs": {k: v for k, v in d["variables"][variable].items()
                          if k != "dtype"}}

    # --- climate data/metrics routes (REAL computation) ---------------------
    # The reference declares these endpoints but returns hardcoded
    # samples ("Sample data - connect to actual data store", routes/
    # data.py:125, metrics.py:46); here the same contract (paths, query
    # params, payload keys) is served by actual Spark queries over the
    # catalog dataset. All collects are bounded: coordinate lists by
    # the grid resolution, point series by ServingApi.MAX_TIMESTEPS,
    # region grids by ServingApi.MAX_POINTS, everything else is
    # single-row aggregates.

    @staticmethod
    def _q(query: dict, key: str, cast=str, default=None, required=False):
        raw = (query.get(key) or [None])[0]
        if raw is None:
            if required:
                raise ApiError(422, f"query parameter {key!r} is required")
            return default
        try:
            return cast(raw)
        except (TypeError, ValueError):
            raise ApiError(422, f"invalid value for {key!r}: {raw!r}")

    def _grid_dataset(self, name: str, query: dict):
        """→ (df, time_col, lat_col, lon_col, value_col) or 404/422."""
        if name not in self.catalog.list_datasets():
            raise ApiError(404, f"Dataset {name} not found")
        df = self.catalog.load(name)
        tcol = next((f.name for f in df.schema.fields
                     if f.dataType.simpleString().startswith("timestamp")),
                    None)
        latc = next((c for c in df.columns
                     if c.lower() in ("lat", "latitude")), None)
        lonc = next((c for c in df.columns
                     if c.lower() in ("lon", "longitude")), None)
        var = self._q(query, "variable")
        if var is None:
            var = next((f.name for f in df.schema.fields
                        if f.dataType.simpleString() in ("double", "float")
                        and f.name not in (latc, lonc)), None)
        if var is not None and var not in df.columns:
            raise ApiError(404, f"variable {var!r} not in dataset {name}")
        if not all((tcol, latc, lonc, var)):
            raise ApiError(422, f"dataset {name} is not a (time, lat, "
                                "lon, value) grid")
        return df, tcol, latc, lonc, var

    def _nearest(self, name: str, df, latc: str, lonc: str,
                 lat: float, lon: float) -> tuple[float, float]:
        """Nearest grid coordinates (xarray .sel(method='nearest')
        semantics). The distinct coordinate lists are bounded by the
        grid resolution and cached per dataset."""
        from .serving import cache_key

        def build():
            lats = [r[0] for r in df.select(latc).distinct().collect()]
            lons = [r[0] for r in df.select(lonc).distinct().collect()]
            return [sorted(lats), sorted(lons)]

        hit = self.api.cache.get(cache_key("coords", dataset=name))
        if hit is None:
            hit = build()
            self.api.cache.set(cache_key("coords", dataset=name), hit)
        lats, lons = hit
        if not lats or not lons:
            raise ApiError(404, f"dataset {name} has no data")
        return (min(lats, key=lambda v: (abs(v - lat), v)),
                min(lons, key=lambda v: (abs(v - lon), v)))

    @staticmethod
    def _trange(query: dict, start_key: str = "start_date",
                end_key: str = "end_date"):
        start = (query.get(start_key) or [None])[0]
        end = (query.get(end_key) or [None])[0]
        if start is None and end is None:
            return None
        end = end or "9999-12-31"
        if len(end) == 10:  # date-only bound is inclusive of the whole day
            end += " 23:59:59.999999"
        return (start or "0001-01-01", end)

    def _point_route(self, name: str, query: dict) -> dict:
        """`GET /datasets/{id}/point` (routes/data.py:88-127)."""
        import datetime as _dt

        lat = self._q(query, "lat", float, required=True)
        lon = self._q(query, "lon", float, required=True)
        df, tcol, latc, lonc, var = self._grid_dataset(name, query)
        nlat, nlon = self._nearest(name, df, latc, lonc, lat, lon)
        tr = self._trange(query)
        rows = self.api.point_timeseries(
            df, tcol, var, keys={latc: nlat, lonc: nlon},
            time_range=tr, dataset=name)
        return {
            "dataset": name,
            "location": {"lat": nlat, "lon": nlon,
                         "requested": {"lat": lat, "lon": lon}},
            "time_range": {"start": (query.get("start_date") or [None])[0],
                           "end": (query.get("end_date") or [None])[0]},
            "variable": var,
            "data": {"times": [r["ts"] for r in rows],
                     "values": [r["value"] for r in rows]},
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        }

    def _region_route(self, name: str, query: dict) -> dict:
        """`GET /datasets/{id}/region` (routes/data.py:130-171): the
        spatial field in a bbox at one time slice (default: latest),
        pivoted to the reference's lats × lons value matrix."""
        import datetime as _dt

        from .serving import cache_key

        bbox = tuple(self._q(query, k, float, required=True)
                     for k in ("west", "south", "east", "north"))
        df, tcol, latc, lonc, var = self._grid_dataset(name, query)
        at = (query.get("time") or [None])[0]
        if at is None:
            hit = self.api.cache.get(cache_key("latest", dataset=name))
            if hit is None:
                from pyspark.sql import functions as F
                hit = str(df.agg(F.max(tcol)).first()[0])
                self.api.cache.set(cache_key("latest", dataset=name), hit)
            at = hit
        sl = (at, at + (" 23:59:59.999999" if len(at) == 10 else ""))
        pts = self.api.region_grid(df, latc, lonc, var, bbox, at=sl,
                                   time_col=tcol,
                                   dataset=f"{name}@{at}")
        lats = sorted({p["lat"] for p in pts})
        lons = sorted({p["lon"] for p in pts})
        cell = {(p["lat"], p["lon"]): p["value"] for p in pts}
        values = [[cell.get((la, lo)) for lo in lons] for la in lats]
        return {
            "dataset": name,
            "bbox": {"west": bbox[0], "south": bbox[1],
                     "east": bbox[2], "north": bbox[3]},
            "time": at, "variable": var,
            "grid": {"lats": lats, "lons": lons, "values": values},
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        }

    def _stats_route(self, name: str, query: dict) -> dict:
        """`GET /datasets/{id}/stats` (routes/data.py:172-214)."""
        import datetime as _dt

        from pyspark.sql import functions as F

        bbox = tuple(self._q(query, k, float, required=True)
                     for k in ("west", "south", "east", "north"))
        df, tcol, latc, lonc, var = self._grid_dataset(name, query)
        tr = self._trange(query)
        if tr is not None:
            df = df.where(F.col(tcol).between(*tr))
        stats = self.api.region_summary(
            df, latc, lonc, var, bbox,
            dataset=f"{name}@{tr[0]}:{tr[1]}" if tr else name)
        return {
            "dataset": name,
            "bbox": {"west": bbox[0], "south": bbox[1],
                     "east": bbox[2], "north": bbox[3]},
            "time_range": {"start": (query.get("start_date") or [None])[0],
                           "end": (query.get("end_date") or [None])[0]},
            "statistics": {k: stats[k] for k in
                           ("mean", "std", "min", "max", "p10", "p50",
                            "p90")},
            "n": stats["n"],
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        }

    def _point_slice(self, name: str, query: dict,
                     start_key="start_year", end_key="end_year"):
        """Common metrics-route setup: nearest-point filter plus an
        optional year-range filter; returns (sliced df, cols, nearest)."""
        from pyspark.sql import functions as F

        lat = self._q(query, "lat", float, required=True)
        lon = self._q(query, "lon", float, required=True)
        df, tcol, latc, lonc, var = self._grid_dataset(name, query)
        nlat, nlon = self._nearest(name, df, latc, lonc, lat, lon)
        out = df.where((F.col(latc) == nlat) & (F.col(lonc) == nlon))
        y0 = self._q(query, start_key, int)
        y1 = self._q(query, end_key, int)
        if y0 is not None:
            out = out.where(F.year(tcol) >= y0)
        if y1 is not None:
            out = out.where(F.year(tcol) <= y1)
        return out, tcol, var, (nlat, nlon), (y0, y1)

    def _metric_temporal(self, name: str, query: dict) -> dict:
        """`GET /api/v1/metrics/temporal/{id}` (routes/metrics.py:11-46):
        real monthly/seasonal/annual means at the nearest grid point."""
        import datetime as _dt

        from pyspark.sql import functions as F

        metric = self._q(query, "metric", required=True)
        if metric not in ("monthly", "seasonal", "annual"):
            raise ApiError(422, "metric must be monthly|seasonal|annual")
        out, tcol, var, loc, (y0, y1) = self._point_slice(name, query)
        if metric == "monthly":
            labels = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
                      "Aug", "Sep", "Oct", "Nov", "Dec"]
            key = F.month(tcol)
        elif metric == "seasonal":
            # DJF/MAM/JJA/SON, the reference's season labels
            # (metrics/temporal.py:73-83)
            labels = ["DJF", "MAM", "JJA", "SON"]
            key = F.floor((F.month(tcol) % 12) / 3)
        else:
            labels = None
            key = F.year(tcol)
        rows = (out.groupBy(key.alias("__k"))
                   .agg(F.avg(var).alias("__m")).orderBy("__k").collect())
        if metric == "annual":
            labels = [str(r["__k"]) for r in rows]
            values = [r["__m"] for r in rows]
        else:
            by_k = {r["__k"]: r["__m"] for r in rows}
            first = 1 if metric == "monthly" else 0
            values = [by_k.get(k) for k in range(first,
                                                 first + len(labels))]
        return {
            "dataset": name, "metric": f"{metric}_mean",
            "location": {"lat": loc[0], "lon": loc[1]},
            "period": {"start_year": y0, "end_year": y1},
            "values": {"labels": labels, "values": values},
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        }

    def _metric_percentiles(self, name: str, query: dict) -> dict:
        """`GET /api/v1/metrics/percentiles/{id}`
        (routes/metrics.py:70-117): per-month climatological
        percentiles at the nearest grid point."""
        import datetime as _dt

        from pyspark.sql import functions as F

        raw = self._q(query, "percentiles", default="10,25,50,75,90,95,99")
        try:
            pcts = [int(p.strip()) for p in raw.split(",") if p.strip()]
        except ValueError:
            raise ApiError(422, f"invalid percentiles list: {raw!r}")
        out, tcol, var, loc, (y0, y1) = self._point_slice(
            name, query, "reference_start", "reference_end")
        rows = (out.groupBy(F.month(tcol).alias("__m"))
                   .agg(F.percentile(var, F.array(
                       *[F.lit(p / 100.0) for p in pcts])).alias("__p"))
                   .orderBy("__m").collect())
        by_m = {r["__m"]: r["__p"] for r in rows}
        return {
            "dataset": name,
            "location": {"lat": loc[0], "lon": loc[1]},
            "reference_period": {"start": y0, "end": y1},
            "percentiles": pcts,
            "values": {"months": list(range(1, 13)),
                       **{f"p{p}": [by_m.get(m, [None] * len(pcts))[i]
                                    for m in range(1, 13)]
                          for i, p in enumerate(pcts)}},
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        }

    def _metric_trend(self, name: str, query: dict) -> dict:
        """`GET /api/v1/metrics/trend/{id}` (routes/metrics.py:119-162):
        OLS slope + significance at the nearest grid point, via the A10
        closed-form stderr operator (scipy.linregress parity)."""
        import datetime as _dt
        import math

        from .operators.trends import trend_with_confidence

        conf = self._q(query, "confidence", float, default=0.95)
        out, tcol, var, loc, (y0, y1) = self._point_slice(name, query)
        r = trend_with_confidence(out, tcol, var,
                                  confidence=conf).first()
        if r is None or r["n"] < 3:
            raise ApiError(404, "not enough data for a trend")
        # two-sided p-value from the t statistic via the normal CDF
        # (n is large for climate series; documented approximation).
        # A perfectly-linear series makes the closed-form residual
        # variance a tiny negative number → NaN stderr; clamp to the
        # exact-fit limit (zero residual, p = 0).
        se, margin = r["std_err"], r["margin"]
        if se is None or se != se or se <= 0:
            se, margin = 0.0, 0.0
        if se == 0:
            p_value = 0.0 if r["slope"] else 1.0
        else:
            tstat = r["slope"] / se
            p_value = 2 * (1 - 0.5 * (1 + math.erf(abs(tstat)
                                                   / math.sqrt(2))))
        years = ((y1 or 9999) - (y0 or 0))
        return {
            "dataset": name,
            "location": {"lat": loc[0], "lon": loc[1]},
            "period": {"start": y0, "end": y1},
            "trend": {
                "slope": r["slope"], "slope_units": "units per year",
                "total_change": (r["slope"] * years
                                 if y0 and y1 else None),
                "p_value": p_value,
                "significant": p_value < (1 - conf),
                "confidence_level": conf,
                "confidence_interval": {
                    "lower": r["slope"] - margin,
                    "upper": r["slope"] + margin},
            },
            "method": "ordinary_least_squares",
            "n": r["n"],
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        }

    def _metric_anomaly(self, name: str, query: dict) -> dict:
        """`GET /api/v1/metrics/anomaly/{id}` (routes/metrics.py:164-218):
        anomaly vs the month's climatology at the nearest grid point,
        absolute or standardized, with the reference's severity
        classification (metrics.py:221-247)."""
        import datetime as _dt

        from pyspark.sql import functions as F

        at = self._q(query, "time", required=True)
        kind = self._q(query, "anomaly_type", default="absolute")
        if kind not in ("absolute", "standardized"):
            raise ApiError(422, "anomaly_type must be "
                                "absolute|standardized")
        try:
            month = int(at.split("-")[1])
            if not 1 <= month <= 12:
                raise ValueError(at)
        except (IndexError, ValueError):
            raise ApiError(422, f"time must be YYYY-MM-DD, got {at!r}")
        out, tcol, var, loc, (y0, y1) = self._point_slice(
            name, query, "reference_start", "reference_end")
        clim = (out.where(F.month(tcol) == month)
                   .agg(F.avg(var).alias("m"),
                        F.stddev_pop(var).alias("s")).first())
        obs = (out.where(F.to_date(F.col(tcol)) == at)
                  .agg(F.avg(var).alias("v")).first())
        if clim["m"] is None or obs["v"] is None:
            raise ApiError(404, f"no data at {at} for {name}")
        if kind == "absolute":
            value, units, cstd = obs["v"] - clim["m"], "units", None
        else:
            if not clim["s"]:
                raise ApiError(422, "zero climatological variance")
            value = (obs["v"] - clim["m"]) / clim["s"]
            units, cstd = "standard deviations", clim["s"]
        return {
            "dataset": name,
            "location": {"lat": loc[0], "lon": loc[1]},
            "time": at,
            "reference_period": {"start": y0, "end": y1},
            "anomaly": {"type": kind, "value": value, "units": units,
                        "climatology_month": month,
                        "climatological_mean": clim["m"],
                        "climatological_std": cstd},
            "classification": self._classify_anomaly(value, kind),
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        }

    @staticmethod
    def _classify_anomaly(value: float, anomaly_type: str) -> dict:
        """The reference's severity bands (routes/metrics.py:221-247)."""
        if anomaly_type == "standardized":
            bands = [(-2, -3, "Extremely below normal"),
                     (-1.5, -2, "Severely below normal"),
                     (-1, -1, "Moderately below normal"),
                     (1, 0, "Near normal"),
                     (1.5, 1, "Moderately above normal"),
                     (2, 2, "Severely above normal")]
            top = (3, "Extremely above normal")
        else:
            bands = [(-5, -2, "Much below normal"),
                     (-2, -1, "Below normal"),
                     (2, 0, "Near normal"),
                     (5, 1, "Above normal")]
            top = (2, "Much above normal")
        for bound, level, label in bands:
            if value < bound or (bound > 0 and value <= bound):
                return {"level": level, "label": label}
        return {"level": top[0], "label": top[1]}

    # --- plumbing -----------------------------------------------------------

    def _make_handler(server):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):    # silence default stderr noise
                pass

            def _run(self, method):
                t0 = time.monotonic()
                url = urlparse(self.path)
                status, payload = 500, {"detail": "Internal server error"}
                try:
                    body = None
                    if method == "POST":
                        n = int(self.headers.get("Content-Length") or 0)
                        raw = self.rfile.read(n) if n else b"{}"
                        try:
                            body = json.loads(raw or b"{}")
                        except json.JSONDecodeError:
                            raise ApiError(422, "body must be JSON")
                    status, payload = server.handle(
                        method, url.path, parse_qs(url.query), body)
                except ApiError as e:
                    status, payload = e.status, {"detail": e.detail}
                except Exception as e:          # mirror main.py:321
                    status, payload = 500, {"detail": f"Internal server "
                                                      f"error: {e}"}
                if isinstance(payload, str):
                    data = payload.encode()
                    ctype = "text/plain; version=0.0.4"
                else:
                    data = json.dumps(payload, default=str).encode()
                    ctype = "application/json"
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                server.metrics.observe(method, url.path, status,
                                       time.monotonic() - t0)

            def do_GET(self):
                self._run("GET")

            def do_POST(self):
                self._run("POST")

        return Handler

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Bind and serve on a daemon thread; returns the bound port."""
        self._httpd = ThreadingHTTPServer((host, port),
                                          self._make_handler())
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
