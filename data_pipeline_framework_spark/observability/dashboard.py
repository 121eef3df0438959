"""Self-contained HTML monitoring dashboard.

Parity surface: the reference ships a Flask/SocketIO dashboard with
Jinja templates (reference observability/dashboard.py:22-289,
templates/dashboard.html, templates/monitoring.html) that renders the
same collector/alert/health state the JSON API serves. Re-expressed
dependency-free: one function renders the current state into a single
HTML document — inline CSS, inline SVG sparklines, a meta-refresh tick
instead of a websocket — served by web/app.py at ``/dashboard``. No
template engine, no static assets, nothing to install on a cluster
edge node; real deployments that want richer dashboards scrape
``/api/metrics?format=prometheus`` instead.
"""

from __future__ import annotations

import html
import time

from .metrics import AlertManager, HealthChecker, MetricsCollector

_CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       margin: 0; background: #f4f5f7; color: #172b4d; }
header { background: #172b4d; color: #fff; padding: 14px 24px; }
header h1 { margin: 0; font-size: 18px; font-weight: 600; }
main { padding: 20px 24px; max-width: 1100px; margin: 0 auto; }
.cards { display: flex; gap: 12px; flex-wrap: wrap; margin-bottom: 20px; }
.card { background: #fff; border-radius: 6px; padding: 14px 18px;
        box-shadow: 0 1px 2px rgba(9,30,66,.15); min-width: 160px; }
.card .label { font-size: 12px; color: #6b778c; text-transform: uppercase; }
.card .value { font-size: 22px; font-weight: 600; margin-top: 4px; }
.ok { color: #006644; } .bad { color: #bf2600; } .warn { color: #974f0c; }
table { width: 100%; border-collapse: collapse; background: #fff;
        border-radius: 6px; box-shadow: 0 1px 2px rgba(9,30,66,.15);
        margin-bottom: 20px; }
th, td { text-align: left; padding: 8px 12px; font-size: 13px;
         border-bottom: 1px solid #ebecf0; }
th { background: #fafbfc; color: #6b778c; font-weight: 600; }
h2 { font-size: 15px; margin: 18px 0 8px; }
.spark { vertical-align: middle; }
.muted { color: #6b778c; }
"""


def _svg_sparkline(values: list[float], width: int = 120,
                   height: int = 28) -> str:
    """Inline SVG polyline over the series (most recent right)."""
    if not values:
        return '<span class="muted">–</span>'
    if len(values) == 1:
        values = values * 2
    lo, hi = min(values), max(values)
    span = (hi - lo) or 1.0
    n = len(values)
    pts = " ".join(
        f"{i * (width - 2) / (n - 1) + 1:.1f},"
        f"{height - 2 - (v - lo) / span * (height - 4):.1f}"
        for i, v in enumerate(values)
    )
    return (
        f'<svg class="spark" width="{width}" height="{height}">'
        f'<polyline fill="none" stroke="#0052cc" stroke-width="1.5" '
        f'points="{pts}"/></svg>'
    )


def render_dashboard(
    collector: MetricsCollector,
    alert_manager: AlertManager | None = None,
    health: HealthChecker | None = None,
    pipelines: list[str] | None = None,
    refresh_seconds: int = 10,
    window: str = "1h",
) -> str:
    """Render the current observability state as one HTML document."""
    esc = html.escape
    checks: dict = {}
    healthy = None
    if health is not None:
        res = health.run_checks()
        healthy = res["healthy"]
        checks = res["checks"]
    active: list = []
    history: list = []
    if alert_manager is not None:
        alert_manager.check_alerts()
        active = alert_manager.get_active_alerts()
        history = alert_manager.get_alert_history(24.0)

    # series table: name -> aggregate stats + sparkline of recent values
    names = sorted(collector.metric_names())
    rows = []
    for name in names:
        agg = collector.get_aggregated_metrics(name, window)
        series = [m.value for m in collector.get_metrics(name, window)][-40:]
        if not agg:
            continue
        rows.append(
            "<tr><td>{}</td><td>{}</td><td>{:.4g}</td><td>{:.4g}</td>"
            "<td>{:.4g}</td><td>{}</td></tr>".format(
                esc(name), agg.get("count", len(series)),
                agg.get("latest", series[-1] if series else 0.0),
                agg.get("avg", 0.0), agg.get("max", 0.0),
                _svg_sparkline(series),
            )
        )

    health_cells = "".join(
        '<div class="card"><div class="label">{}</div>'
        '<div class="value {}">{}</div></div>'.format(
            esc(name), "ok" if r.get("healthy") else "bad",
            "healthy" if r.get("healthy") else "DOWN",
        )
        for name, r in checks.items()
    )
    overall = (
        '<div class="card"><div class="label">overall</div>'
        f'<div class="value {"ok" if healthy else "bad"}">'
        f'{"healthy" if healthy else "UNHEALTHY"}</div></div>'
        if healthy is not None else ""
    )

    def alert_rows(alerts) -> str:
        out = []
        for a in alerts[-20:]:
            cls = {"critical": "bad", "emergency": "bad",
                   "warning": "warn"}.get(a.level.value, "muted")
            when = time.strftime(
                "%Y-%m-%d %H:%M:%S", time.localtime(a.timestamp))
            out.append(
                f'<tr><td class="{cls}">{esc(a.level.value)}</td>'
                f"<td>{esc(a.name)}</td><td>{esc(a.message)}</td>"
                f"<td>{when}</td></tr>"
            )
        return "".join(out)

    pipeline_list = "".join(
        f"<li>{esc(p)}</li>" for p in (pipelines or [])
    ) or '<li class="muted">none saved</li>'

    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    return f"""<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta http-equiv="refresh" content="{int(refresh_seconds)}">
<title>Pipeline Dashboard</title><style>{_CSS}</style></head>
<body>
<header><h1>Data Pipeline Dashboard
<span style="float:right;font-weight:400;font-size:12px">{stamp}
&middot; refreshes every {int(refresh_seconds)}s</span></h1></header>
<main>
<div class="cards">{overall}{health_cells}</div>
<h2>Active alerts ({len(active)})</h2>
<table><tr><th>level</th><th>rule</th><th>message</th><th>time</th></tr>
{alert_rows(active) or '<tr><td colspan="4" class="muted">none</td></tr>'}
</table>
<h2>Alert history (24h, last 20)</h2>
<table><tr><th>level</th><th>rule</th><th>message</th><th>time</th></tr>
{alert_rows(history) or '<tr><td colspan="4" class="muted">none</td></tr>'}
</table>
<h2>Metrics ({window} window)</h2>
<table><tr><th>metric</th><th>n</th><th>latest</th><th>avg</th>
<th>max</th><th>trend</th></tr>
{''.join(rows) or '<tr><td colspan="6" class="muted">no metrics recorded</td></tr>'}
</table>
<h2>Saved pipelines</h2>
<ul>{pipeline_list}</ul>
</main></body></html>"""
