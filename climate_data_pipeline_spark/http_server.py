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
        self.catalog = catalog
        self.data_lake_path = data_lake_path
        self.metrics = Metrics()
        self._httpd: ThreadingHTTPServer | None = None

    # --- route handlers (return (status, payload)) --------------------------

    def handle(self, method: str, path: str, query: dict,
               body: dict | None) -> tuple[int, object]:
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
