"""HTTP control plane: CRUD + execute over real YAML configs and a real
Spark pipeline run (parquet in -> DSL ops -> parquet out), health/
metrics/alerts endpoints, API-key gating, and error paths — via actual
HTTP requests against the threaded stdlib server."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from data_pipeline_framework_spark.web import PipelineServer

SF_DIR = "/root/testdata/sf0.001"


def _req(port, path, method="GET", body=None, key=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    if key is not None:
        req.add_header("X-API-Key", key)
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.load(resp)
    except urllib.error.HTTPError as e:
        return e.code, json.load(e)


@pytest.fixture()
def server(spark, tmp_path):
    srv = PipelineServer(spark, str(tmp_path / "configs"))
    port = srv.start()
    yield srv, port, tmp_path
    srv.shutdown()


def _config(tmp_path, name="orders_summary"):
    return {
        "name": name,
        "description": "priority rollup over orders",
        "source": {"type": "parquet"},
        "input": {"path": f"{SF_DIR}/orders.parquet"},
        "processing": {"operations": [
            {"type": "filter", "condition": "o_totalprice > 1000"},
            {"type": "aggregate",
             "group_by": ["o_orderpriority"],
             "aggregations": {"o_totalprice": ["sum", "count"]}},
        ]},
        "storage": {"type": "parquet", "mode": "overwrite",
                    "destination": str(tmp_path / "out")},
    }


def test_crud_and_execute_roundtrip(spark, server):
    srv, port, tmp_path = server
    # empty to start
    code, out = _req(port, "/api/pipelines")
    assert code == 200 and out["pipelines"] == []
    # create
    code, out = _req(port, "/api/pipelines", "POST", _config(tmp_path))
    assert code == 200 and out["pipeline_name"] == "orders_summary"
    # list + get
    code, out = _req(port, "/api/pipelines")
    assert [p["name"] for p in out["pipelines"]] == ["orders_summary"]
    code, out = _req(port, "/api/pipelines/orders_summary")
    assert code == 200
    assert out["config"]["processing"]["operations"][0]["type"] == "filter"
    # execute: runs the REAL pipeline through Spark
    code, out = _req(
        port, "/api/pipelines/orders_summary/execute", "POST", {}
    )
    assert code == 200, out
    assert out["status"] == "success"
    assert out["rows_processed"] == 5  # one row per order priority
    written = spark.read.parquet(str(tmp_path / "out"))
    assert written.count() == 5
    assert "o_totalprice_sum" in written.columns
    # metrics recorded like the reference's counters
    agg = srv.collector.get_aggregated_metrics(
        "pipeline_success_total", "1h"
    )
    assert agg["count"] == 1
    dur = srv.collector.get_aggregated_metrics(
        "pipeline_duration_seconds", "1h"
    )
    assert dur["latest"] > 0
    # delete
    code, out = _req(port, "/api/pipelines/orders_summary", "DELETE")
    assert code == 200
    code, out = _req(port, "/api/pipelines/orders_summary")
    assert code == 404


def test_execute_failure_reports_and_counts(server):
    srv, port, tmp_path = server
    cfg = _config(tmp_path, name="broken")
    cfg["input"]["path"] = str(tmp_path / "missing.parquet")
    _req(port, "/api/pipelines", "POST", cfg)
    code, out = _req(port, "/api/pipelines/broken/execute", "POST", {})
    assert code == 500
    assert out["status"] == "failed" and out["error"]
    agg = srv.collector.get_aggregated_metrics(
        "pipeline_failure_total", "1h"
    )
    assert agg["count"] == 1


def test_validation_and_error_paths(server):
    _, port, _ = server
    code, out = _req(port, "/api/pipelines", "POST", {"description": "x"})
    assert code == 400 and "name" in out["error"]
    code, out = _req(
        port, "/api/pipelines", "POST",
        {"name": "bad_ops", "processing": {"operations": [{"foo": 1}]}},
    )
    assert code == 400 and "missing `type`" in out["error"]
    code, out = _req(port, "/api/pipelines/nope/execute", "POST", {})
    assert code == 404
    code, out = _req(port, "/api/pipelines/../evil")
    assert code in (400, 404)  # traversal never reaches the filesystem
    code, out = _req(port, "/api/nothing")
    assert code == 404


def test_health_metrics_alerts_endpoints(server):
    srv, port, _ = server
    code, out = _req(port, "/api/health")
    assert code == 200
    assert out["checks"]["spark_session"]["healthy"] is True
    srv.collector.record_gauge("queue_depth", 42.0)
    code, out = _req(port, "/api/metrics")
    assert code == 200
    assert any(m["name"] == "queue_depth" for m in out["metrics"])
    code, out = _req(port, "/api/metrics?format=prometheus")
    assert "queue_depth 42.0" in out["metrics"]
    code, out = _req(port, "/api/alerts")
    assert code == 200
    assert out["active_alerts"] == [] and out["recent_alerts"] == []


def test_api_key_gating(spark, tmp_path):
    srv = PipelineServer(
        spark, str(tmp_path / "configs"), api_key="sekrit"
    )
    port = srv.start()
    try:
        code, out = _req(port, "/api/pipelines")
        assert code == 401
        code, out = _req(port, "/api/pipelines", key="wrong")
        assert code == 401
        code, out = _req(port, "/api/pipelines", key="sekrit")
        assert code == 200
    finally:
        srv.shutdown()


def test_rbac_and_event_bus_integration(spark, tmp_path):
    from data_pipeline_framework_spark.architecture import EventBus
    from data_pipeline_framework_spark.security import Role, SecurityManager

    sm = SecurityManager(secret="web-test")
    sm.create_user("viewer", "v@e.com", "longenough", roles=[Role.VIEWER])
    sm.create_user("eng", "e@e.com", "longenough", roles=[Role.ENGINEER])
    viewer_token = sm.authenticate_user("viewer", "longenough")
    eng_key = sm.create_api_key("eng", "ci")
    bus = EventBus()
    srv = PipelineServer(
        spark, str(tmp_path / "configs"), security=sm, event_bus=bus,
    )
    port = srv.start()
    try:
        # no credentials at all -> 401
        code, _ = _req(port, "/api/pipelines")
        assert code == 401
        # bearer token resolves the viewer
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/pipelines")
        req.add_header("Authorization", f"Bearer {viewer_token}")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
        # viewer lacks MANAGE_PIPELINES -> 403 on create
        body = json.dumps(_config(tmp_path, "rbac_pipe")).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/pipelines", data=body,
            method="POST")
        req.add_header("Authorization", f"Bearer {viewer_token}")
        req.add_header("Content-Type", "application/json")
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected 403")
        except urllib.error.HTTPError as e:
            assert e.code == 403
            assert "manage_pipelines" in json.load(e)["error"]
        # engineer API key: create + execute allowed
        code, out = _req(port, "/api/pipelines", "POST",
                         _config(tmp_path, "rbac_pipe"), key=eng_key)
        assert code == 200, out
        code, out = _req(port, "/api/pipelines/rbac_pipe/execute",
                         "POST", {}, key=eng_key)
        assert code == 200 and out["status"] == "success"
        # lifecycle events landed on the bus and are exposed over HTTP
        code, out = _req(port, "/api/events", key=eng_key)
        assert code == 200
        types = [e["event_type"] for e in out["events"]]
        assert types == ["pipeline_started", "pipeline_completed"]
        # forged key -> 401
        code, _ = _req(port, "/api/pipelines", key="dpf_forged")
        assert code == 401
    finally:
        srv.shutdown()
