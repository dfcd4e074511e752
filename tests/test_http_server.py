"""Endpoint-contract tests for the stdlib HTTP facade: status codes and
payload keys mirror the reference's FastAPI surface (api/main.py)."""

from __future__ import annotations

import json
import urllib.request
from urllib.error import HTTPError

import pytest

from climate_data_pipeline_spark.http_server import ServingHttpServer
from climate_data_pipeline_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def server(spark, sf_small):
    cat = Catalog(spark)
    cat.register("lineitem", f"{sf_small}/lineitem.parquet",
                 title="Line items")
    cat.register("events", f"{sf_small}/events.parquet", title="Events")
    srv = ServingHttpServer(cat, data_lake_path="/lake")
    port = srv.start()
    yield f"http://127.0.0.1:{port}"
    srv.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        ctype = r.headers.get("Content-Type", "")
        raw = r.read()
        return r.status, (json.loads(raw) if "json" in ctype
                          else raw.decode())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_health_and_ready(server):
    st, body = _get(f"{server}/health")
    assert st == 200
    assert body["status"] == "healthy" and "version" in body \
        and body["data_lake_path"] == "/lake"
    st, body = _get(f"{server}/ready")
    assert st == 200 and body == {"status": "ready"}


def test_datasets_list_and_detail(server):
    st, body = _get(f"{server}/datasets")
    assert st == 200 and {d["id"] for d in body} == {"lineitem", "events"}
    for d in body:
        assert {"id", "name", "description", "format",
                "variables"} <= set(d)
    st, one = _get(f"{server}/datasets/events")
    assert st == 200 and one["id"] == "events" \
        and "ts" in one["variables"]
    with pytest.raises(HTTPError) as e:
        _get(f"{server}/datasets/nope")
    assert e.value.code == 404
    assert "not found" in json.loads(e.value.read())["detail"]


def test_data_query_contract(server):
    st, body = _post(f"{server}/data/query",
                     {"dataset_id": "events", "variable": "value"})
    assert st == 200
    assert {"dataset_id", "variable", "shape", "dtype", "zarr_url",
            "access_latency_ms"} <= set(body)
    assert body["zarr_url"] == "/lake/events/value.zarr"
    # validation: missing field -> 422; bad bbox -> 422; unknown -> 404
    for payload, code in (
            ({"variable": "value"}, 422),
            ({"dataset_id": "events", "variable": "value",
              "bbox": [1, 2]}, 422),
            ({"dataset_id": "nope", "variable": "value"}, 404),
            ({"dataset_id": "events", "variable": "nope"}, 404)):
        with pytest.raises(HTTPError) as e:
            _post(f"{server}/data/query", payload)
        assert e.value.code == code


def test_variable_metadata(server):
    st, body = _get(f"{server}/data/events/value/metadata")
    assert st == 200
    assert {"dataset_id", "variable", "dimensions", "dtype",
            "compression", "compression_level"} <= set(body)
    assert body["dtype"] == "double"


def test_stac_routes(server):
    st, root = _get(f"{server}/stac")
    assert st == 200 and root["type"] == "Catalog" \
        and root["stac_version"] == "1.0.0"
    st, cols = _get(f"{server}/stac/collections")
    assert st == 200 and {c["id"] for c in cols["collections"]} == {
        "lineitem", "events"}
    st, res = _get(f"{server}/stac/search?collections=events")
    assert st == 200 and res["context"]["returned"] == 1 \
        and res["features"][0]["id"] == "events"


def test_metrics_exposition(server):
    _get(f"{server}/health")
    st, text = _get(f"{server}/metrics")
    assert st == 200
    assert "# TYPE arco_requests_total counter" in text
    assert 'arco_requests_total{method="GET",endpoint="/health",' \
           'status="200"}' in text
    assert "arco_request_latency_seconds_count" in text
