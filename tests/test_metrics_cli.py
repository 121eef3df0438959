"""metrics/alerts CLI group (reference cli/main.py:548-660 parity)."""

from __future__ import annotations

import json

import pytest

from data_pipeline_framework_spark.cli import main
from data_pipeline_framework_spark.observability import metrics as obs


@pytest.fixture()
def fresh_singletons():
    """Reset the process-wide collector/manager/checker around each test."""
    saved = (obs._metrics_collector, obs._alert_manager, obs._health_checker)
    obs._metrics_collector = obs._alert_manager = obs._health_checker = None
    yield
    (obs._metrics_collector, obs._alert_manager,
     obs._health_checker) = saved


def test_metrics_show_json_and_prometheus(fresh_singletons, capsys):
    c = obs.get_metrics_collector()
    c.record_counter("pipeline_executions_total", 3)
    c.record_gauge("queue_depth", 7.0, tags={"queue": "ingest"})

    assert main(["metrics", "show"]) == 0
    flat = json.loads(capsys.readouterr().out)
    names = {m["name"] for m in flat}
    assert {"pipeline_executions_total", "queue_depth"} <= names

    assert main(["metrics", "show", "--format", "prometheus"]) == 0
    prom = capsys.readouterr().out
    assert 'queue_depth{queue="ingest"} 7.0' in prom


def test_metrics_health_table_and_exit_code(fresh_singletons, capsys):
    assert main(["metrics", "health"]) == 0
    out = capsys.readouterr().out
    assert "healthy" in out and "metrics_collector" in out

    obs.get_health_checker().add_check("always_down", lambda: False)
    assert main(["metrics", "health"]) == 1
    assert "UNHEALTHY" in capsys.readouterr().out

    assert main(["metrics", "health", "--json"]) == 1
    payload = json.loads(capsys.readouterr().out)
    assert payload["checks"]["always_down"]["healthy"] is False


def test_alerts_list_and_history(fresh_singletons, capsys):
    # cross the default high_error_rate rule (>10 errors in the window)
    obs.get_metrics_collector().record_counter(
        "pipeline_errors_total", 25)
    assert main(["alerts", "list"]) == 0
    out = capsys.readouterr().out
    assert "high_error_rate" in out and "warning" in out

    assert main(["alerts", "history", "--hours", "1", "--json"]) == 0
    hist = json.loads(capsys.readouterr().out)
    assert hist and hist[-1]["name"] == "high_error_rate"

    # an empty manager prints the friendly message
    obs._alert_manager = None
    obs._metrics_collector = obs.MetricsCollector()
    assert main(["alerts", "list"]) == 0
    assert "No active alerts" in capsys.readouterr().out


def test_metrics_cli_against_live_server(spark, tmp_path, capsys):
    """--url reads a running control plane's endpoints over real HTTP."""
    from data_pipeline_framework_spark.web import PipelineServer

    server = PipelineServer(spark, config_dir=str(tmp_path / "cfgs"))
    port = server.start(host="127.0.0.1", port=0)
    url = f"http://127.0.0.1:{port}"
    try:
        assert main(["metrics", "health", "--url", url, "--json"]) == 0
        payload = json.loads(capsys.readouterr().out)
        assert payload["checks"]

        assert main(["metrics", "show", "--url", url]) == 0
        json.loads(capsys.readouterr().out)  # valid JSON export

        assert main(["alerts", "list", "--url", url]) == 0
        capsys.readouterr()
        assert main(["alerts", "history", "--url", url]) == 0
        capsys.readouterr()
    finally:
        server.shutdown()


def test_dashboard_html_served(spark, tmp_path):
    """GET /dashboard returns the self-contained HTML monitoring page."""
    import urllib.request

    from data_pipeline_framework_spark.web import PipelineServer

    server = PipelineServer(spark, config_dir=str(tmp_path / "cfgs"))
    (tmp_path / "cfgs" / "nightly.yaml").write_text("name: nightly\n")
    server.collector.record_counter("pipeline_executions_total", 2)
    for i in range(5):
        server.collector.record_gauge("queue_depth", float(i))
    port = server.start(host="127.0.0.1", port=0)
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/dashboard", timeout=30
        ) as resp:
            assert resp.headers["Content-Type"].startswith("text/html")
            page = resp.read().decode()
        assert "<!doctype html>" in page
        assert "queue_depth" in page and "polyline" in page  # sparkline
        assert "spark_session" in page and "healthy" in page
        assert "nightly" in page  # saved pipeline listed
        # "/" serves the same page
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30
        ) as resp:
            assert resp.headers["Content-Type"].startswith("text/html")
    finally:
        server.shutdown()


def test_dashboard_requires_rbac_permission(spark, tmp_path):
    import urllib.error
    import urllib.request

    from data_pipeline_framework_spark.security import Role, SecurityManager
    from data_pipeline_framework_spark.web import PipelineServer

    sec = SecurityManager(secret="dash-test")
    sec.create_user("viewer", "v@e.com", "longenough", roles=[Role.VIEWER])
    nobody = sec.create_user("nobody", "n@e.com", "longenough")
    nobody.roles.clear()  # a user with no roles -> no VIEW_METRICS
    viewer_key = sec.create_api_key("viewer", "ci")
    nobody_key = sec.create_api_key("nobody", "ci")
    server = PipelineServer(
        spark, config_dir=str(tmp_path / "cfgs"), security=sec)
    port = server.start(host="127.0.0.1", port=0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/dashboard",
            headers={"X-API-Key": viewer_key})
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/dashboard",
            headers={"X-API-Key": nobody_key})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 403
    finally:
        server.shutdown()


@pytest.mark.filterwarnings(
    # py4j's OWN ClientServerConnection reader thread can catch a
    # connection reset when the HTTP handler thread's gateway
    # connection is torn down after server.shutdown() — a third-party
    # teardown race inside py4j/clientserver.py, not engine code (the
    # engine's REST poll degrades on reset since r8, pytest-pinned in
    # test_observability.py). Scoped to this one test so any NEW
    # unhandled thread exception elsewhere still fails loudly.
    "ignore::pytest.PytestUnhandledThreadExceptionWarning"
)
def test_dashboard_cli_command(spark, tmp_path, capsys, monkeypatch):
    """`dpf-spark dashboard` starts the control plane and points at the
    HTML page; cut the wait loop via simulated Ctrl-C after probing."""
    import urllib.request

    from data_pipeline_framework_spark import cli as climod

    bound = {}

    def fake_sleep(_):
        with urllib.request.urlopen(
            bound["dashboard"], timeout=30
        ) as resp:
            bound["html"] = resp.read().decode()
        raise KeyboardInterrupt

    monkeypatch.setattr(climod.time, "sleep", fake_sleep)

    from data_pipeline_framework_spark.web import PipelineServer

    orig_start = PipelineServer.start

    def capture_start(self, host="127.0.0.1", port=0):
        p = orig_start(self, host=host, port=0)
        bound["dashboard"] = f"http://127.0.0.1:{p}/dashboard"
        return p

    monkeypatch.setattr(PipelineServer, "start", capture_start)
    rc = climod.main([
        "dashboard", "--config-dir", str(tmp_path / "cfgs"), "--port", "0",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "/dashboard" in out["dashboard"]
    assert "<!doctype html>" in bound["html"]
