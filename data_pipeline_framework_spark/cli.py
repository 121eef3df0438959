"""Command-line entry point (reference cli/main.py, argparse-based).

Commands mirror the reference's CLI surface:
  run        — execute a pipeline YAML (reference cli/main.py:41-94)
  queue add / queue process / queue status
             — queue-driven ingestion (reference cli/main.py:321-487)
  profile    — numeric profile of a parquet/csv/json file
  schema     — schema + enrichment report for a file

Usage: python -m data_pipeline_framework_spark.cli run pipeline.yaml
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def _get_spark():
    from .session import get_spark

    return get_spark(app_name="dpf-spark-cli")


def _read_any(spark, path: str):
    from .sources import readers

    if path.endswith(".csv"):
        return readers.read_csv(spark, path)
    if path.endswith((".json", ".jsonl")):
        return readers.read_json(spark, path)
    return readers.read_parquet(spark, path)


def cmd_run(args) -> int:
    from .core import Pipeline

    spark = _get_spark()
    pipeline = Pipeline.from_yaml(args.config, spark)
    if args.input:
        result = pipeline.run(input_source=args.input, dry_run=args.dry_run)
    else:
        result = pipeline.run(dry_run=args.dry_run)
    print(json.dumps({
        "status": result.status, "pipeline": result.pipeline,
        "rows_written": result.rows_written,
        "duration_sec": round(result.duration_sec, 3),
        "error": result.error,
        "validation": result.validation,
    }, default=str))
    return 0 if result.status == "success" else 1


def cmd_generate_analysis(args) -> int:
    """Emit analysis starter scripts from parquet table schemas
    (reference cli/main.py:663-1008, retargeted from Postgres
    information_schema to parquet footers)."""
    from . import codegen

    spark = _get_spark()
    if args.all_tables:
        out_dir = Path(args.output_dir or "./analysis")
        out_dir.mkdir(parents=True, exist_ok=True)
        tables = codegen.discover_tables(args.table)
        if not tables:
            print(f"No parquet tables found under {args.table}")
            return 1
        print(f"Generating analysis code for {len(tables)} tables...")
        for name, path in tables.items():
            info = codegen.table_info(spark, path)
            out = out_dir / (
                f"analysis_{name}.{codegen.file_extension(args.language)}"
            )
            out.write_text(codegen.generate_analysis_code(
                name, path, info, args.language))
            print(f"Generated: {out}")
        return 0
    path = args.table
    name = Path(path).stem
    info = codegen.table_info(spark, path)
    out = args.output or (
        f"analysis_{name}.{codegen.file_extension(args.language)}"
    )
    Path(out).write_text(codegen.generate_analysis_code(
        name, path, info, args.language))
    print(f"Generated analysis code: {out}")
    print(f"Language: {args.language.title()}")
    print(f"Table: {name}")
    print(f"Columns: {len(info['columns'])}")
    return 0


def cmd_init(args) -> int:
    """Scaffold a starter pipeline YAML (reference cli/main.py:205-290),
    retargeted to Spark defaults: parquet sink, clean + validation on."""
    import yaml

    name = args.name
    source_type = args.source_type
    config: dict = {
        "name": name,
        "description": f"Pipeline for processing {source_type} data",
        "source": {"type": source_type, "config": {}},
        "processing": {
            "engine": "spark",
            "operations": [
                {"type": "clean",
                 "params": {"operations": ["remove_empty_rows",
                                           "trim_strings"]}},
            ],
        },
        "storage": {
            "type": args.storage,
            "destination": f"./data/out/{name.lower()}_data",
            "mode": "append",
        },
        "validation": {
            "enabled": True,
            "suite_name": f"{name.lower()}_validation",
            "auto_generate_expectations": True,
        },
        "profiling": {"enabled": False},
    }
    if source_type == "csv":
        config["source"]["config"] = {
            "base_path": "./data/raw", "encoding": "utf-8",
            "delimiter": ",",
        }
        config["input"] = {"file_pattern": "*.csv"}
    elif source_type == "json":
        config["source"]["config"] = {
            "base_path": "./data/raw", "encoding": "utf-8",
        }
        config["input"] = {"file_pattern": "*.json"}
    elif source_type == "parquet":
        config["input"] = {"path": "./data/raw/*.parquet"}
    elif source_type == "s3":
        config["source"]["config"] = {
            "bucket": "your-s3-bucket", "region": "us-east-1",
            "prefix": "raw-data",
        }
        config["input"] = {"file_pattern": "*.parquet"}
    out_path = args.output or f"{name.lower()}_pipeline.yaml"
    with open(out_path, "w") as f:
        yaml.safe_dump(config, f, default_flow_style=False, indent=2,
                       sort_keys=False)
    print(f"Pipeline configuration created: {out_path}")
    print("Next steps:")
    print(f"1. Edit {out_path} to customize your pipeline")
    print(f"2. Run: dpf-spark run {out_path}")
    return 0


def cmd_info(args) -> int:
    """Pretty-print a parsed pipeline config (reference
    cli/main.py:293-313). Config-only — no Spark session is started."""
    from .core.config import load_config
    from .core.pipeline import Pipeline

    cfg = load_config(args.config)
    info = Pipeline.__new__(Pipeline)  # config summary without a session
    info.config = cfg
    info._joined_tables = [
        op.get("right") for op in cfg.operations
        if op.get("type") == "join" and isinstance(op.get("right"), str)
    ]
    data = info.get_pipeline_info()
    if args.json:
        print(json.dumps(data))
        return 0
    print("=== Pipeline Information ===")
    print(f"Name: {data['name']}")
    print(f"Description: {data['description']}")
    print(f"Source Type: {data['source_type']}")
    print(f"Processing Engine: {data['processing_engine']}")
    print(f"Storage Type: {data['storage_type']}")
    print(f"Total Operations: {data['total_operations']}")
    print(f"Validation Enabled: {data['validation_enabled']}")
    print(f"Profiling Enabled: {data['profiling_enabled']}")
    if data["joined_tables"]:
        print(f"Joined Tables: {', '.join(data['joined_tables'])}")
    return 0


def cmd_audit(args) -> int:
    """Compile a pipeline YAML and report plan scale-audit findings
    without writing any output. Side-effecting ops (`checkpoint` with a
    path) are stripped before compiling so the audit never mutates
    storage; ops that derive literals from bounded aggregates
    (e.g. mixture_sample's per-source totals) still run those bounded
    jobs — that is plan construction, not pipeline execution."""
    from .core import Pipeline
    from .plans.advisor import audit_plan
    from .plans.compiler import compile_ops

    spark = _get_spark()
    pipeline = Pipeline.from_yaml(args.config, spark)
    safe_ops = [
        op for op in pipeline.config.operations
        if op.get("type") != "checkpoint"
    ]
    def resolve(name: str):
        if name in pipeline.tables:
            return pipeline.tables[name]
        return spark.table(name)

    df = compile_ops(safe_ops, resolve)(pipeline.load(args.input))
    findings = audit_plan(df)
    print(json.dumps({
        "pipeline": pipeline.config.name,
        "findings": [
            {"rule": f.rule, "severity": f.severity, "detail": f.detail}
            for f in findings
        ],
        "ok": not any(f.severity == "fatal" for f in findings),
    }))
    return 0 if not any(f.severity == "fatal" for f in findings) else 1


def cmd_serve(args) -> int:
    """Serve the HTTP control plane until interrupted (reference
    web/app.py's uvicorn entry, without the FastAPI stack). Invoked as
    `dashboard` it is the same server — the reference runs a separate
    Flask/SocketIO process (cli/main.py:522-545); here the dashboard is
    just the HTML face of the one control plane."""
    from .web import PipelineServer

    spark = _get_spark()
    server = PipelineServer(
        spark, args.config_dir, api_key=args.api_key,
    )
    port = server.start(host=args.host, port=args.port)
    payload = {"serving": f"http://{args.host}:{port}",
               "config_dir": args.config_dir}
    if getattr(args, "as_dashboard", False):
        payload["dashboard"] = f"http://{args.host}:{port}/dashboard"
    print(json.dumps(payload))
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        return 0
    finally:
        server.shutdown()


def cmd_queue_add(args) -> int:
    from .core.queue import QueueManager

    q = QueueManager(args.db)
    item_id = q.add(args.file, args.table, priority=args.priority)
    print(json.dumps({"queued": item_id, "file": args.file,
                      "table": args.table}))
    q.close()
    return 0


def cmd_queue_process(args) -> int:
    from .core.queue import QueueManager, QueueProcessor

    q = QueueManager(args.db)
    done = QueueProcessor(q, _get_spark()).process_all(args.max_items)
    print(json.dumps([
        {"id": i.id, "table": i.table_name, "status": i.status,
         "error": i.error}
        for i in done
    ]))
    q.close()
    return 0 if all(i.status == "completed" for i in done) else 1


def cmd_queue_status(args) -> int:
    from .core.queue import QueueManager

    q = QueueManager(args.db)
    print(json.dumps(q.stats()))
    q.close()
    return 0


def cmd_queue_list(args) -> int:
    """Table view of queue items (reference cli/main.py:367-396)."""
    from .core.queue import QueueManager

    q = QueueManager(args.db)
    items = q.list_items(args.status)
    q.close()
    if args.json:
        print(json.dumps([
            {"id": i.id, "status": i.status, "priority": i.priority,
             "file": i.file_path, "table": i.table_name, "error": i.error,
             "created_at": i.created_at}
            for i in items
        ]))
        return 0
    if not items:
        print("Queue is empty")
        return 0
    print(f"{'ID':<8} {'Status':<11} {'Pri':<4} {'File':<40} {'Table':<20} Created")
    print("-" * 100)
    for i in items:
        created = time.strftime("%m-%d %H:%M", time.localtime(i.created_at))
        fp = i.file_path[-37:] if len(i.file_path) > 37 else i.file_path
        print(f"{i.id:<8} {i.status:<11} {i.priority:<4} {fp:<40}"
              f" {i.table_name[:19]:<20} {created}")
        if i.error:
            print(f"         Error: {i.error}")
    return 0


def cmd_queue_remove(args) -> int:
    from .core.queue import QueueManager

    q = QueueManager(args.db)
    removed = q.remove(args.item_id)
    q.close()
    print(json.dumps({"removed": args.item_id if removed else None}))
    return 0 if removed else 1


def cmd_queue_clear_completed(args) -> int:
    from .core.queue import QueueManager

    q = QueueManager(args.db)
    n = q.clear_completed(keep_failed=not args.drop_failed)
    q.close()
    print(json.dumps({"cleared": n, "kept_failed": not args.drop_failed}))
    return 0


def cmd_queue_retry_failed(args) -> int:
    from .core.queue import QueueManager

    q = QueueManager(args.db)
    n = q.retry_failed()
    q.close()
    print(json.dumps({"reset_to_pending": n}))
    return 0


def _fetch_json(url: str):
    import urllib.request

    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.loads(resp.read().decode())


def cmd_metrics_show(args) -> int:
    """Print collector metrics (reference cli/main.py:553-572). With
    --url, reads a running control plane's /api/metrics; otherwise the
    in-process singleton collector."""
    if args.url:
        if args.format == "prometheus":
            import urllib.request

            with urllib.request.urlopen(
                f"{args.url.rstrip('/')}/api/metrics?format=prometheus",
                timeout=30,
            ) as resp:
                print(resp.read().decode())
        else:
            print(json.dumps(_fetch_json(
                f"{args.url.rstrip('/')}/api/metrics")))
        return 0
    from .observability.metrics import get_metrics_collector

    print(get_metrics_collector().export_metrics(args.format))
    return 0


def cmd_metrics_health(args) -> int:
    """Health check table (reference cli/main.py:575-598). Exit code 0
    only when every check is healthy."""
    if args.url:
        results = _fetch_json(f"{args.url.rstrip('/')}/api/health")
    else:
        from .observability.metrics import get_health_checker

        results = get_health_checker().run_checks()
    healthy = results.get("healthy", results.get("overall_healthy", False))
    if args.json:
        print(json.dumps(results))
        return 0 if healthy else 1
    print("=== Health Check Results ===")
    print(f"Overall: {'healthy' if healthy else 'UNHEALTHY'}")
    for name, res in (results.get("checks") or {}).items():
        mark = "ok  " if res.get("healthy") else "FAIL"
        print(f"  [{mark}] {name}")
        if not res.get("healthy") and res.get("error"):
            print(f"         Error: {res['error']}")
    return 0 if healthy else 1


def _print_alerts(alerts: list[dict], header: str) -> None:
    print(f"=== {header} ===")
    for a in alerts:
        when = time.strftime(
            "%Y-%m-%d %H:%M:%S", time.localtime(a["timestamp"]))
        state = "resolved" if a.get("resolved") else "active"
        print(f"[{a['level']:<8}] {a['name']} ({state})")
        print(f"   {a['message']}")
        print(f"   Time: {when}")


def cmd_alerts_list(args) -> int:
    """Active alerts (reference cli/main.py:607-627)."""
    if args.url:
        payload = _fetch_json(f"{args.url.rstrip('/')}/api/alerts")
        active = payload.get("active_alerts", [])
    else:
        from .observability.metrics import get_alert_manager

        mgr = get_alert_manager()
        mgr.check_alerts()
        active = [a.to_dict() for a in mgr.get_active_alerts()]
    if args.json:
        print(json.dumps(active))
        return 0
    if not active:
        print("No active alerts")
        return 0
    _print_alerts(active, "Active Alerts")
    return 0


def cmd_alerts_history(args) -> int:
    """Alert history over --hours (reference cli/main.py:630-655)."""
    if args.url:
        payload = _fetch_json(f"{args.url.rstrip('/')}/api/alerts")
        hist = payload.get("recent_alerts", [])
    else:
        from .observability.metrics import get_alert_manager

        hist = [a.to_dict()
                for a in get_alert_manager().get_alert_history(args.hours)]
    if args.json:
        print(json.dumps(hist))
        return 0
    if not hist:
        print(f"No alerts in the last {args.hours} hours")
        return 0
    _print_alerts(hist[-20:], f"Alert History (last {args.hours}h)")
    return 0


def cmd_profile(args) -> int:
    from .functions.profiling import profile_columns

    spark = _get_spark()
    df = _read_any(spark, args.path)
    rows = profile_columns(df, args.columns or None).collect()
    print(json.dumps([r.asDict() for r in rows], default=str))
    return 0


def cmd_schema(args) -> int:
    from .functions.profiling import schema_profile

    spark = _get_spark()
    df = _read_any(spark, args.path)
    rows = schema_profile(df).collect()
    print(json.dumps([r.asDict() for r in rows], default=str))
    return 0


def cmd_index_status(args) -> int:
    """IVF index staleness report — genuinely read-only: no swap
    recovery, no sidecar writes (an interrupted swap is reported from
    whichever copy recovery would adopt; a pre-sidecar index reports
    baseline_missing instead of installing its drifted mean as the
    baseline). Exit 0 fresh, 3 stale, 4 baseline unknown."""
    from .functions.similarity import maybe_retrain_ivf

    spark = _get_spark()
    rep = maybe_retrain_ivf(spark, args.path, read_only=True)
    print(json.dumps(rep))
    if rep.get("baseline_missing"):
        return 4
    return 0 if rep["staleness_ratio"] <= args.threshold else 3


def cmd_index_maintain(args) -> int:
    """Wired retrain trigger: rebuild + atomic swap when staleness
    exceeds the threshold; exit 0 either way, report on stdout."""
    from .functions.similarity import maybe_retrain_ivf

    spark = _get_spark()
    rep = maybe_retrain_ivf(
        spark, args.path,
        threshold=args.threshold,
        n_cells=args.cells,
        seed=args.seed,
    )
    print(json.dumps(rep))
    return 0


def cmd_quality_check(args) -> int:
    """Quality checks on a data file (reference cli/quality_commands.py
    :24-96 `quality check`, re-targeted from Postgres tables to files).
    Checks come from --config (YAML/JSON list of {metric, column,
    warning_threshold, critical_threshold}) or are auto-generated."""
    from .governance.quality import QualityMonitor

    spark = _get_spark()
    df = _read_any(spark, args.path)
    checks = None
    if args.config:
        import yaml

        with open(args.config) as fh:
            loaded = yaml.safe_load(fh)
        checks = loaded["checks"] if isinstance(loaded, dict) else loaded
    mon = QualityMonitor()
    results = mon.run_quality_checks(df, table=args.path, checks=checks)
    payload = {
        "table": args.path,
        "results": [r.__dict__ for r in results],
        "alerts": [a.__dict__ for a in mon.alerts],
        "summary": mon.summary(),
    }
    if args.output == "json":
        print(json.dumps(payload, default=str))
    else:
        for r in results:
            print(f"{r.status:4}  {r.metric}({r.column}) = {r.value:.4f}")
        s = payload["summary"]["by_status"]
        print(
            f"-- {len(results)} checks: {s['PASS']} pass, "
            f"{s['WARN']} warn, {s['FAIL']} fail"
        )
    worst = {r.status for r in results}
    return 2 if "FAIL" in worst else (1 if "WARN" in worst else 0)


def cmd_quality_genconfig(args) -> int:
    """Emit an auto-generated quality-check config for a file (reference
    quality_commands.py:117-192 `quality generate-config`)."""
    from .governance.quality import QualityMonitor

    spark = _get_spark()
    df = _read_any(spark, args.path)
    checks = QualityMonitor.default_checks(df)
    doc = {"table": args.path, "checks": checks}
    import yaml

    text = yaml.safe_dump(doc, sort_keys=False)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(text)
        print(f"wrote {len(checks)} checks to {args.output}")
    else:
        print(text)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dpf-spark")
    sub = p.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="execute a pipeline YAML")
    run.add_argument("config")
    run.add_argument("--input", help="override the configured input path")
    run.add_argument("--dry-run", action="store_true")
    run.set_defaults(fn=cmd_run)

    gen = sub.add_parser("generate", help="generate analysis code")
    gsub = gen.add_subparsers(dest="generate_command", required=True)
    ga = gsub.add_parser("analysis",
                         help="starter analysis script per table")
    ga.add_argument("table", help="parquet table path, or a directory"
                                  " with --all-tables")
    ga.add_argument("--language", "-l", choices=["python", "scala"],
                    default="python")
    ga.add_argument("--output", "-o")
    ga.add_argument("--all-tables", action="store_true")
    ga.add_argument("--output-dir")
    ga.set_defaults(fn=cmd_generate_analysis)

    ini = sub.add_parser("init", help="scaffold a pipeline YAML")
    ini.add_argument("name")
    ini.add_argument("--source-type",
                     choices=["csv", "json", "parquet", "s3"],
                     default="parquet")
    ini.add_argument("--storage", choices=["parquet", "csv", "json"],
                     default="parquet")
    ini.add_argument("--output", "-o")
    ini.set_defaults(fn=cmd_init)

    inf = sub.add_parser("info", help="describe a pipeline config")
    inf.add_argument("config")
    inf.add_argument("--json", action="store_true")
    inf.set_defaults(fn=cmd_info)

    q = sub.add_parser("queue", help="queue-driven ingestion")
    qsub = q.add_subparsers(dest="queue_command", required=True)
    qa = qsub.add_parser("add")
    qa.add_argument("file")
    qa.add_argument("table")
    qa.add_argument("--priority", type=int, default=5)
    qa.add_argument("--db", default="pipeline_queue.db")
    qa.set_defaults(fn=cmd_queue_add)
    qp = qsub.add_parser("process")
    qp.add_argument("--max-items", type=int, default=None)
    qp.add_argument("--db", default="pipeline_queue.db")
    qp.set_defaults(fn=cmd_queue_process)
    qs = qsub.add_parser("status")
    qs.add_argument("--db", default="pipeline_queue.db")
    qs.set_defaults(fn=cmd_queue_status)
    ql = qsub.add_parser("list", help="list queue items")
    ql.add_argument("--status",
                    choices=["pending", "processing", "completed", "failed"])
    ql.add_argument("--json", action="store_true")
    ql.add_argument("--db", default="pipeline_queue.db")
    ql.set_defaults(fn=cmd_queue_list)
    qr = qsub.add_parser("remove", help="delete one queue item")
    qr.add_argument("item_id", type=int)
    qr.add_argument("--db", default="pipeline_queue.db")
    qr.set_defaults(fn=cmd_queue_remove)
    qc = qsub.add_parser("clear-completed",
                         help="drop completed (and optionally failed) items")
    qc.add_argument("--drop-failed", action="store_true",
                    help="also drop failed items (default keeps them)")
    qc.add_argument("--db", default="pipeline_queue.db")
    qc.set_defaults(fn=cmd_queue_clear_completed)
    qf = qsub.add_parser("retry-failed",
                         help="reset failed items to pending")
    qf.add_argument("--db", default="pipeline_queue.db")
    qf.set_defaults(fn=cmd_queue_retry_failed)

    dash = sub.add_parser(
        "dashboard", help="serve the HTML monitoring dashboard")
    dash.add_argument("--host", default="127.0.0.1")
    dash.add_argument("--port", type=int, default=8050)
    dash.add_argument("--config-dir", default="./pipeline_configs")
    dash.add_argument("--api-key")
    dash.set_defaults(fn=cmd_serve, as_dashboard=True)

    met = sub.add_parser("metrics", help="metrics and monitoring")
    msub = met.add_subparsers(dest="metrics_command", required=True)
    ms = msub.add_parser("show", help="dump collector metrics")
    ms.add_argument("--format", choices=["json", "prometheus"],
                    default="json")
    ms.add_argument("--url", help="read from a running control plane"
                                  " (e.g. http://127.0.0.1:8080)")
    ms.set_defaults(fn=cmd_metrics_show)
    mh = msub.add_parser("health", help="run health checks")
    mh.add_argument("--url")
    mh.add_argument("--json", action="store_true")
    mh.set_defaults(fn=cmd_metrics_health)

    al = sub.add_parser("alerts", help="alerts and notifications")
    asub = al.add_subparsers(dest="alerts_command", required=True)
    aa = asub.add_parser("list", help="active alerts")
    aa.add_argument("--url")
    aa.add_argument("--json", action="store_true")
    aa.set_defaults(fn=cmd_alerts_list)
    ah = asub.add_parser("history", help="alert history")
    ah.add_argument("--hours", type=float, default=24.0)
    ah.add_argument("--url")
    ah.add_argument("--json", action="store_true")
    ah.set_defaults(fn=cmd_alerts_history)

    prof = sub.add_parser("profile", help="profile numeric columns")
    prof.add_argument("path")
    prof.add_argument("--columns", nargs="*")
    prof.set_defaults(fn=cmd_profile)

    idx = sub.add_parser("index", help="ANN index lifecycle")
    isub = idx.add_subparsers(dest="index_command", required=True)
    ist = isub.add_parser(
        "status", help="staleness report (exit 3 when past threshold)")
    ist.add_argument("path")
    ist.add_argument("--threshold", type=float, default=1.25)
    ist.set_defaults(fn=cmd_index_status)
    imt = isub.add_parser(
        "maintain", help="retrain + atomic swap when stale")
    imt.add_argument("path")
    imt.add_argument("--threshold", type=float, default=1.25)
    imt.add_argument("--cells", type=int)
    imt.add_argument("--seed", type=int, default=42)
    imt.set_defaults(fn=cmd_index_maintain)

    sch = sub.add_parser("schema", help="schema inference report")
    sch.add_argument("path")
    sch.set_defaults(fn=cmd_schema)

    aud = sub.add_parser(
        "audit", help="plan scale-audit of a pipeline YAML (no execution)"
    )
    aud.add_argument("config")
    aud.add_argument("--input", default=None)
    aud.set_defaults(fn=cmd_audit)

    srv = sub.add_parser(
        "serve", help="HTTP control plane (pipeline CRUD + execute)"
    )
    srv.add_argument("--config-dir", default="config/pipelines")
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8080)
    srv.add_argument("--api-key", default=None,
                     help="require X-API-Key on every request")
    srv.set_defaults(fn=cmd_serve)

    qual = sub.add_parser("quality", help="data-quality checks")
    qualsub = qual.add_subparsers(dest="quality_command", required=True)
    qc = qualsub.add_parser("check", help="run checks on a data file")
    qc.add_argument("path")
    qc.add_argument("--config", "-c", default=None,
                    help="YAML/JSON check list (default: auto-generate)")
    qc.add_argument("--output", "-o", choices=["table", "json"],
                    default="table")
    qc.set_defaults(fn=cmd_quality_check)
    qg = qualsub.add_parser(
        "generate-config", help="emit an auto-generated check config"
    )
    qg.add_argument("path")
    qg.add_argument("--output", "-o", default=None)
    qg.set_defaults(fn=cmd_quality_genconfig)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
