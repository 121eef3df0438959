"""HTTP control plane for config-driven pipelines — stdlib only.

Mirrors the reference's web API surface (reference web/app.py:424-541:
pipeline create/list/execute over saved YAML configs, plus the
health/metrics/alerts endpoints wired to its observability stack;
API-key gating from security/auth.py's key-check path) without the
FastAPI dependency: a ``ThreadingHTTPServer`` driving the SAME
config-driven ``core.Pipeline`` the CLI runs, so anything created over
HTTP is a plain YAML file the rest of the engine (CLI, tests, cron)
executes identically.

Endpoints (all JSON):

    GET    /api/health                      liveness + registered checks
    GET    /api/metrics[?format=prometheus] collector export
    GET    /api/alerts                      active + last-24h alerts
    GET    /api/pipelines                   saved pipeline configs
    POST   /api/pipelines                   create (body = config dict)
    GET    /api/pipelines/{name}            one config
    DELETE /api/pipelines/{name}            remove config
    POST   /api/pipelines/{name}/execute    run it (body: {input_file})

Execution is synchronous in the request thread by design: the driver
is the only place a Spark action can run, and the server exists for
control-plane operations, not as a bulk data path. Metrics mirror the
reference's counters (pipeline_created_total, pipeline_executions_total,
pipeline_success_total / pipeline_failure_total,
pipeline_duration_seconds, data_rows_processed_total).

Set ``api_key=`` to require ``X-API-Key`` on every request (401
otherwise) — constant-time comparison, no credentials ever logged.
"""

from __future__ import annotations

import hmac
import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import yaml

from ..core.pipeline import Pipeline
from ..observability.metrics import (
    AlertManager,
    HealthChecker,
    MetricsCollector,
    spark_session_check,
)

__all__ = ["PipelineServer"]

_NAME_RE = re.compile(r"^[A-Za-z0-9_.-]{1,128}$")


class PipelineServer:
    """Bind with ``start()`` (ephemeral port by default), stop with
    ``shutdown()``. ``tables=`` passes named DataFrames through to
    pipeline joins, same as the CLI."""

    def __init__(
        self,
        spark,
        config_dir: str,
        tables: dict | None = None,
        collector: MetricsCollector | None = None,
        alert_manager: AlertManager | None = None,
        health: HealthChecker | None = None,
        api_key: str | None = None,
        security=None,
        event_bus=None,
    ):
        self.spark = spark
        self.config_dir = Path(config_dir)
        self.config_dir.mkdir(parents=True, exist_ok=True)
        self.tables = tables or {}
        self.collector = collector or MetricsCollector()
        self.alerts = alert_manager or AlertManager(self.collector)
        self.health = health or self._default_health(spark)
        self.api_key = api_key
        # security.SecurityManager: per-user keys/tokens + RBAC instead
        # of the single shared api_key (reference security/auth.py)
        self.security = security
        # architecture.EventBus: executions publish lifecycle events and
        # /api/events exposes the recent log
        self.event_bus = event_bus
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def _default_health(self, spark) -> HealthChecker:
        h = HealthChecker(self.collector)
        h.add_check("spark_session", spark_session_check(spark))
        return h

    # -- lifecycle ----------------------------------------------------

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start serving; returns the bound port."""
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _send(self, code: int, payload):
                if isinstance(payload, str):  # pre-rendered HTML page
                    body = payload.encode()
                    ctype = "text/html; charset=utf-8"
                else:
                    body = json.dumps(
                        {**payload, "timestamp": time.time()}
                    ).encode()
                    ctype = "application/json"
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authed(self):
                """(ok, user): static-key mode yields user None; a
                SecurityManager resolves X-API-Key or Bearer tokens to
                a User whose permissions gate each route."""
                if server.security is not None:
                    key = self.headers.get("X-API-Key")
                    if key:
                        return (
                            (u := server.security.verify_api_key(key))
                            is not None, u,
                        )
                    authz = self.headers.get("Authorization", "")
                    if authz.startswith("Bearer "):
                        u = server.security.verify_token(authz[7:])
                        return u is not None, u
                    return False, None
                if server.api_key is None:
                    return True, None
                supplied = self.headers.get("X-API-Key", "")
                return hmac.compare_digest(supplied, server.api_key), None

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                if n == 0:
                    return {}
                return json.loads(self.rfile.read(n) or b"{}")

            def _route(self, method: str):
                ok, user = self._authed()
                if not ok:
                    return self._send(401, {"error": "unauthorized"})
                try:
                    handled = server._dispatch(
                        method, self.path.split("?", 1)[0],
                        self.path, self._body if method == "POST" else dict,
                        user=user,
                    )
                except PermissionError as e:
                    return self._send(403, {"error": str(e)})
                except json.JSONDecodeError:
                    return self._send(400, {"error": "invalid JSON body"})
                except Exception as e:
                    return self._send(500, {"error": str(e)})
                if handled is None:
                    return self._send(404, {"error": "not found"})
                code, payload = handled
                return self._send(code, payload)

            def do_GET(self):
                self._route("GET")

            def do_POST(self):
                self._route("POST")

            def do_DELETE(self):
                self._route("DELETE")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def shutdown(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    # -- routing ------------------------------------------------------

    def _require(self, user, permission_name: str) -> None:
        """RBAC gate, active only with a SecurityManager: raises
        PermissionError (-> 403) when the resolved user lacks the
        permission (admin implies all)."""
        if self.security is None:
            return
        from ..security.auth import Permission

        perm = Permission[permission_name]
        if user is None or not user.has_permission(perm):
            raise PermissionError(f"permission {perm.value} required")

    def _dispatch(self, method, path, raw_path, body_fn, user=None):
        if method == "GET" and path in ("/", "/dashboard"):
            # HTML monitoring view over the same state the JSON API
            # serves (reference templates/dashboard.html + Flask
            # dashboard, observability/dashboard.py:22-289)
            self._require(user, "VIEW_METRICS")
            from ..observability.dashboard import render_dashboard

            return 200, render_dashboard(
                self.collector, self.alerts, self.health,
                pipelines=sorted(
                    p.stem for p in self.config_dir.glob("*.yaml")),
            )
        if method == "GET" and path == "/api/health":
            return 200, self.health.run_checks()
        if method == "GET" and path == "/api/events":
            self._require(user, "VIEW_METRICS")
            if self.event_bus is None:
                return 200, {"events": []}
            return 200, {"events": [
                e.to_dict() for e in self.event_bus.store.all_events()[-50:]
            ]}
        if method == "GET" and path == "/api/metrics":
            self._require(user, "VIEW_METRICS")
            fmt = "prometheus" if "format=prometheus" in raw_path else "json"
            exported = self.collector.export_metrics(fmt)
            if fmt == "json":
                return 200, {"metrics": json.loads(exported)}
            return 200, {"metrics": exported, "format": "prometheus"}
        if method == "GET" and path == "/api/alerts":
            self._require(user, "VIEW_METRICS")
            self.alerts.check_alerts()
            return 200, {
                "active_alerts": [
                    a.to_dict() for a in self.alerts.get_active_alerts()
                ],
                "recent_alerts": [
                    a.to_dict()
                    for a in self.alerts.get_alert_history(24.0)[-10:]
                ],
            }
        if method == "GET" and path == "/api/pipelines":
            self._require(user, "READ_DATA")
            return 200, {"pipelines": self._list()}
        if method == "POST" and path == "/api/pipelines":
            self._require(user, "MANAGE_PIPELINES")
            return self._create(body_fn())
        m = re.match(r"^/api/pipelines/([^/]+)$", path)
        if m:
            name = m.group(1)
            if not _NAME_RE.match(name):
                return 400, {"error": "invalid pipeline name"}
            cfg = self.config_dir / f"{name}.yaml"
            if method == "GET":
                self._require(user, "READ_DATA")
                if not cfg.exists():
                    return 404, {"error": f"pipeline not found: {name}"}
                return 200, {
                    "pipeline_name": name,
                    "config": yaml.safe_load(cfg.read_text()),
                }
            if method == "DELETE":
                self._require(user, "MANAGE_PIPELINES")
                if not cfg.exists():
                    return 404, {"error": f"pipeline not found: {name}"}
                cfg.unlink()
                return 200, {"message": "Pipeline deleted",
                             "pipeline_name": name}
        m = re.match(r"^/api/pipelines/([^/]+)/execute$", path)
        if m and method == "POST":
            name = m.group(1)
            if not _NAME_RE.match(name):
                return 400, {"error": "invalid pipeline name"}
            self._require(user, "EXECUTE_PIPELINE")
            return self._execute(name, body_fn())
        return None

    # -- handlers -----------------------------------------------------

    def _list(self) -> list[dict]:
        out = []
        for f in sorted(self.config_dir.glob("*.yaml")):
            try:
                doc = yaml.safe_load(f.read_text()) or {}
            except yaml.YAMLError:
                doc = {}
            out.append({
                "name": f.stem,
                "description": doc.get("description", ""),
                "config_path": str(f),
            })
        return out

    def _create(self, body: dict):
        name = body.get("name", "")
        if not _NAME_RE.match(name or ""):
            return 400, {"error": "pipeline `name` is required "
                                  "(alphanumeric, dot, dash, underscore)"}
        from ..core.config import load_config

        try:
            errors = load_config(data=body).validate()
        except ValueError as e:  # load_config validates eagerly
            return 400, {"error": str(e)}
        if errors:
            return 400, {"error": "; ".join(errors)}
        path = self.config_dir / f"{name}.yaml"
        path.write_text(yaml.safe_dump(body, default_flow_style=False))
        self.collector.record_counter("pipeline_created_total")
        return 200, {
            "message": "Pipeline created successfully",
            "pipeline_name": name,
            "config_path": str(path),
        }

    def _execute(self, name: str, body: dict):
        cfg = self.config_dir / f"{name}.yaml"
        if not cfg.exists():
            return 404, {"error": f"pipeline not found: {name}"}
        tags = {"pipeline": name}
        self.collector.record_counter("pipeline_executions_total", tags=tags)
        t0 = time.time()
        try:
            result = Pipeline(
                yaml.safe_load(cfg.read_text()), self.spark,
                tables=self.tables, event_bus=self.event_bus,
            ).run(input_source=body.get("input_file"))
        except Exception as e:
            self.collector.record_counter("pipeline_failure_total", tags=tags)
            self.collector.record_histogram(
                "pipeline_duration_seconds", time.time() - t0,
                tags={**tags, "status": "failed"},
            )
            return 500, {"error": str(e), "pipeline_name": name}
        wall = time.time() - t0
        ok = result.status == "success"
        self.collector.record_counter(
            "pipeline_success_total" if ok else "pipeline_failure_total",
            tags=tags,
        )
        self.collector.record_histogram(
            "pipeline_duration_seconds", wall, tags=tags
        )
        if result.rows_written:
            self.collector.record_counter(
                "data_rows_processed_total",
                value=result.rows_written, tags=tags,
            )
        return (200 if ok else 500), {
            "message": f"Pipeline execution {result.status}",
            "pipeline_name": name,
            "status": result.status,
            "execution_time": wall,
            "rows_processed": result.rows_written,
            "error": result.error,
        }
