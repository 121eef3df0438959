"""Queue manager, queue processor, and CLI surface tests."""

from __future__ import annotations

import json

import pytest

from data_pipeline_framework_spark.cli import build_parser, main
from data_pipeline_framework_spark.core.queue import (
    QueueManager,
    QueueProcessor,
    QueueStatus,
    default_item_config,
)


@pytest.fixture()
def queue(tmp_path):
    q = QueueManager(tmp_path / "q.db")
    yield q
    q.close()


def test_queue_priority_fifo_order(queue):
    a = queue.add("/x/a.csv", "t1", priority=5)
    b = queue.add("/x/b.csv", "t2", priority=9)
    c = queue.add("/x/c.csv", "t3", priority=5)
    # highest priority first, FIFO within a priority
    assert queue.next_item().id == b
    assert queue.next_item().id == a
    assert queue.next_item().id == c
    assert queue.next_item() is None  # everything claimed


def test_queue_state_machine(queue):
    i = queue.add("/x/a.csv", "t")
    item = queue.next_item()
    assert item.status == QueueStatus.PROCESSING.value
    queue.complete(item.id)
    assert queue.get(i).status == "completed"
    j = queue.add("/x/b.csv", "t")
    queue.next_item()
    queue.fail(j, "boom")
    got = queue.get(j)
    assert got.status == "failed" and got.error == "boom"
    assert queue.stats() == {"completed": 1, "failed": 1}


def test_default_item_config_shape():
    cfg = default_item_config("/data/in.jsonl", "events")
    assert cfg["source"]["type"] == "json"
    assert cfg["processing"]["operations"][0]["type"] == "clean"
    assert cfg["storage"]["destination"] == "events"


def test_queue_processor_end_to_end(spark, sf_dir, tmp_path, queue):
    out = str(tmp_path / "ingested")
    cfg = {
        "name": "q_orders",
        "source": {"type": "parquet"},
        "processing": {"operations": [
            {"type": "filter", "condition": "o_totalprice > 0"},
        ]},
        "storage": {"type": "parquet", "destination": out, "mode": "append"},
    }
    queue.add(f"{sf_dir}/orders.parquet", "orders_ingested", config=cfg)
    queue.add("/nonexistent/nope.parquet", "broken", config=cfg)

    done = QueueProcessor(queue, spark).process_all()
    assert [d.status for d in done] == ["completed", "failed"]
    assert spark.read.parquet(out).count() > 0
    assert done[1].error


def test_cli_parser_and_queue_commands(tmp_path, capsys):
    db = str(tmp_path / "q.db")
    assert main(["queue", "add", "/x/a.csv", "t1", "--db", db,
                 "--priority", "7"]) == 0
    added = json.loads(capsys.readouterr().out)
    assert added["queued"] == 1
    assert main(["queue", "status", "--db", db]) == 0
    assert json.loads(capsys.readouterr().out) == {"pending": 1}

    parser = build_parser()
    args = parser.parse_args(["run", "p.yaml", "--dry-run"])
    assert args.config == "p.yaml" and args.dry_run is True


def test_next_item_lost_race_retries(tmp_path):
    """If another worker steals the selected row between SELECT and the
    guarded UPDATE, next_item must claim the NEXT pending item, not return
    the stolen one."""
    import sqlite3

    from data_pipeline_framework_spark.core.queue import QueueManager, QueueStatus

    q = QueueManager(tmp_path / "race.db")
    first = q.add("/a.csv", "t", priority=9)
    second = q.add("/b.csv", "t", priority=1)

    thief = sqlite3.connect(str(tmp_path / "race.db"))
    # WAL lets the thief commit while the victim's SELECT cursor is open
    thief.execute("PRAGMA journal_mode=WAL")
    real_conn = q._conn
    stolen = {"done": False}

    class RacingConn:
        def execute(self, sql, *args):
            out = real_conn.execute(sql, *args)
            if sql.lstrip().startswith("SELECT id") and not stolen["done"]:
                stolen["done"] = True
                # another process claims the row we just selected
                thief.execute(
                    "UPDATE queue_items SET status = ? WHERE id = ?",
                    (QueueStatus.PROCESSING.value, first),
                )
                thief.commit()
            return out

        def __getattr__(self, name):
            return getattr(real_conn, name)

        def __enter__(self):
            return real_conn.__enter__()

        def __exit__(self, *a):
            return real_conn.__exit__(*a)

    q._conn = RacingConn()
    item = q.next_item()
    assert item is not None and item.id == second
    thief.close()


def test_cli_audit_reports_findings(spark, sf_dir, tmp_path, capsys):
    import json as _json

    import yaml as _yaml

    from data_pipeline_framework_spark.cli import main as cli_main

    doc = {
        "name": "audit_me",
        "source": {"type": "parquet"},
        "input": {"path": f"{sf_dir}/nation.parquet"},
        "processing": {"operations": [
            {"type": "filter", "condition": "n_regionkey >= 0"},
        ]},
    }
    p = tmp_path / "a.yaml"
    p.write_text(_yaml.safe_dump(doc))
    rc = cli_main(["audit", str(p)])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"] is True and out["findings"] == []


def test_cli_audit_strips_checkpoint_writes(spark, sf_dir, tmp_path, capsys):
    import json as _json
    import os as _os

    import yaml as _yaml

    from data_pipeline_framework_spark.cli import main as cli_main

    ckpt = str(tmp_path / "must_not_exist")
    doc = {
        "name": "audit_no_write",
        "source": {"type": "parquet"},
        "input": {"path": f"{sf_dir}/nation.parquet"},
        "processing": {"operations": [
            {"type": "filter", "condition": "n_regionkey >= 0"},
            {"type": "checkpoint", "path": ckpt},
        ]},
    }
    p = tmp_path / "a.yaml"
    p.write_text(_yaml.safe_dump(doc))
    rc = cli_main(["audit", str(p)])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"] is True
    assert not _os.path.exists(ckpt)  # the audit never wrote storage


def test_cli_serve_starts_real_server(tmp_path, capsys, monkeypatch):
    """`dpf-spark serve` binds the control plane; the loop is cut by a
    simulated Ctrl-C after asserting the server answers over HTTP."""
    import json as _json
    import urllib.request as _url

    from data_pipeline_framework_spark import cli as climod

    bound = {}

    def fake_sleep(_):
        # first tick: probe the live server, then stop like Ctrl-C
        with _url.urlopen(
            f"http://127.0.0.1:{bound['port']}/api/health", timeout=30
        ) as resp:
            bound["health"] = _json.load(resp)
        raise KeyboardInterrupt

    monkeypatch.setattr(climod.time, "sleep", fake_sleep)

    real_start = climod.PipelineServer.start if hasattr(
        climod, "PipelineServer") else None
    assert real_start is None  # serve imports lazily; patch via module

    from data_pipeline_framework_spark.web import PipelineServer

    orig_start = PipelineServer.start

    def capture_start(self, host="127.0.0.1", port=0):
        p = orig_start(self, host=host, port=0)  # ephemeral for the test
        bound["port"] = p
        return p

    monkeypatch.setattr(PipelineServer, "start", capture_start)
    rc = climod.main([
        "serve", "--config-dir", str(tmp_path / "cfgs"), "--port", "0",
    ])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["serving"].startswith("http://127.0.0.1:")
    assert bound["health"]["checks"]["spark_session"]["healthy"] is True


def test_cli_quality_check_and_genconfig(spark, sf_dir, tmp_path, capsys):
    """reference cli/quality_commands.py parity: check + generate-config."""
    import yaml

    src = f"{sf_dir}/customer.parquet"
    cfg = str(tmp_path / "qc.yaml")
    assert main(["quality", "generate-config", src, "--output", cfg]) == 0
    capsys.readouterr()
    doc = yaml.safe_load(open(cfg))
    metrics = {(c["metric"], c["column"]) for c in doc["checks"]}
    assert ("uniqueness", "c_custkey") in metrics
    assert ("completeness", "c_name") in metrics

    # the auto heuristic flags c_nationkey (a foreign key) for
    # uniqueness — drop it, then clean data passes -> exit 0
    doc["checks"] = [
        c for c in doc["checks"]
        if not (c["metric"] == "uniqueness" and c["column"] == "c_nationkey")
    ]
    yaml.safe_dump(doc, open(cfg, "w"))
    assert main(["quality", "check", src, "--config", cfg]) == 0
    out = capsys.readouterr().out
    assert "pass" in out and "0 fail" in out

    # a failing threshold drives the exit code and the alert list
    bad = {"checks": [{
        "metric": "uniqueness", "column": "c_mktsegment",
        "warning_threshold": 0.99, "critical_threshold": 0.9,
    }]}
    cfg2 = str(tmp_path / "qc2.yaml")
    yaml.safe_dump(bad, open(cfg2, "w"))
    rc = main(["quality", "check", src, "--config", cfg2, "-o", "json"])
    assert rc == 2
    payload = json.loads(capsys.readouterr().out)
    assert payload["results"][0]["status"] == "FAIL"
    assert payload["alerts"][0]["severity"] == "critical"
    assert payload["summary"]["by_status"]["FAIL"] == 1


def test_queue_list_remove_clear_retry(queue):
    a = queue.add("/x/a.csv", "t1", priority=5)
    b = queue.add("/x/b.csv", "t2", priority=9)
    c = queue.add("/x/c.csv", "t3", priority=5)
    # claim + finish: b completed, a failed, c stays pending
    queue.complete(queue.next_item().id)      # b (highest priority)
    queue.fail(queue.next_item().id, "disk on fire")  # a

    items = queue.list_items()
    assert [i.id for i in items] == [b, a, c]  # priority DESC, FIFO
    assert [i.status for i in items] == ["completed", "failed", "pending"]
    assert [i.id for i in queue.list_items("failed")] == [a]
    with pytest.raises(ValueError):
        queue.list_items("bogus")

    # retry_failed: FAILED -> PENDING, error cleared, reprocessable
    assert queue.retry_failed() == 1
    got = queue.get(a)
    assert got.status == "pending" and got.error is None
    assert queue.next_item().id == a  # claimable again

    # clear_completed keeps failed by default
    queue.fail(a, "again")
    assert queue.clear_completed() == 1  # only b
    assert queue.get(b) is None and queue.get(a) is not None
    assert queue.clear_completed(keep_failed=False) == 1  # now a too
    assert queue.get(a) is None

    # remove deletes exactly one row and reports misses
    assert queue.remove(c) is True
    assert queue.remove(c) is False
    assert queue.list_items() == []


def test_cli_queue_management_commands(tmp_path, capsys):
    db = str(tmp_path / "q.db")
    assert main(["queue", "add", "/x/a.csv", "t1", "--db", db]) == 0
    assert main(["queue", "add", "/x/b.csv", "t2", "--db", db,
                 "--priority", "9"]) == 0
    capsys.readouterr()

    assert main(["queue", "list", "--db", db, "--json"]) == 0
    items = json.loads(capsys.readouterr().out)
    assert [i["table"] for i in items] == ["t2", "t1"]

    # human table view mentions both files
    assert main(["queue", "list", "--db", db]) == 0
    out = capsys.readouterr().out
    assert "/x/a.csv" in out and "/x/b.csv" in out and "pending" in out

    # fail one via the manager, then drive retry-failed through the CLI
    q = QueueManager(db)
    item = q.next_item()
    q.fail(item.id, "boom")
    q.close()
    assert main(["queue", "list", "--db", db, "--status", "failed"]) == 0
    assert "boom" in capsys.readouterr().out
    assert main(["queue", "retry-failed", "--db", db]) == 0
    assert json.loads(capsys.readouterr().out) == {"reset_to_pending": 1}

    # remove: hit then miss drives the exit code
    assert main(["queue", "remove", "1", "--db", db]) == 0
    capsys.readouterr()
    assert main(["queue", "remove", "1", "--db", db]) == 1
    capsys.readouterr()

    # clear-completed on a completed item
    q = QueueManager(db)
    it = q.next_item()
    q.complete(it.id)
    q.close()
    assert main(["queue", "clear-completed", "--db", db]) == 0
    assert json.loads(capsys.readouterr().out)["cleared"] == 1
    assert main(["queue", "list", "--db", db]) == 0
    assert "empty" in capsys.readouterr().out


def test_cli_init_info_run_roundtrip(spark, sf_dir, tmp_path, capsys,
                                     monkeypatch):
    """init scaffolds a YAML that info can describe and run can execute
    (reference cli/main.py:205-313 parity)."""
    import yaml

    monkeypatch.chdir(tmp_path)
    cfg_path = str(tmp_path / "scaffold.yaml")
    assert main(["init", "orders_demo", "--source-type", "parquet",
                 "-o", cfg_path]) == 0
    out = capsys.readouterr().out
    assert "scaffold.yaml" in out and "dpf-spark run" in out

    doc = yaml.safe_load(open(cfg_path))
    assert doc["name"] == "orders_demo"
    assert doc["processing"]["engine"] == "spark"
    assert doc["processing"]["operations"][0]["type"] == "clean"
    assert doc["validation"]["enabled"] is True

    assert main(["info", cfg_path]) == 0
    out = capsys.readouterr().out
    assert "Name: orders_demo" in out
    assert "Source Type: parquet" in out
    assert "Total Operations: 1" in out

    assert main(["info", cfg_path, "--json"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert data["storage_type"] == "parquet"
    assert data["validation_enabled"] is True

    # the scaffold actually runs: point storage at tmp and feed sf0.001
    doc["storage"]["destination"] = str(tmp_path / "out")
    yaml.safe_dump(doc, open(cfg_path, "w"))
    rc = main(["run", cfg_path, "--input", f"{sf_dir}/orders.parquet"])
    result = json.loads(capsys.readouterr().out)
    assert rc == 0 and result["status"] == "success"
    assert result["rows_written"] == 1500


def test_cli_init_source_variants(tmp_path, capsys, monkeypatch):
    import yaml

    monkeypatch.chdir(tmp_path)
    for stype, want in [
        ("csv", ("delimiter", "*.csv")),
        ("json", ("encoding", "*.json")),
        ("s3", ("bucket", "*.parquet")),
    ]:
        p = str(tmp_path / f"{stype}.yaml")
        assert main(["init", f"p_{stype}", "--source-type", stype,
                     "-o", p]) == 0
        capsys.readouterr()
        doc = yaml.safe_load(open(p))
        key, pattern = want
        assert key in doc["source"]["config"]
        assert doc["input"]["file_pattern"] == pattern


def test_cli_index_status_and_maintain(spark, tmp_path, capsys):
    """`index status` reports staleness (exit 3 past threshold, no
    mutation) and `index maintain` retrains + swaps atomically."""
    import json as _json
    import random as _random

    from data_pipeline_framework_spark.cli import main as cli_main
    from data_pipeline_framework_spark.functions import similarity as SIM

    rng = _random.Random(21)
    base = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf_cli")
    SIM.write_ivf_index(SIM.ivf_index(base, n_cells=4, seed=7), path)

    rc = cli_main(["index", "status", path])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and not rep["retrained"]
    assert 0.7 < rep["staleness_ratio"] < 1.3

    drifted = spark.createDataFrame(
        [(900 + i, [rng.gauss(30, 1) for _ in range(8)])
         for i in range(150)],
        "vec_id long, embedding array<double>",
    )
    SIM.append_ivf_index(spark, path, drifted)
    rc = cli_main(["index", "status", path])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 3 and rep["staleness_ratio"] > 1.25
    assert not rep["retrained"]  # status never mutates

    rc = cli_main(["index", "maintain", path])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and rep["retrained"] and rep["n_vectors"] == 350

    rc = cli_main(["index", "status", path])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and 0.9 < rep["staleness_ratio"] < 1.1


def test_cli_index_status_baseline_missing_is_exit_4(spark, tmp_path, capsys):
    """`index status` on a pre-sidecar index must NOT install a baseline
    (read-only) — it reports baseline_missing and exits 4."""
    import json as _json
    import os
    import random as _random
    import shutil

    from data_pipeline_framework_spark.cli import main as cli_main
    from data_pipeline_framework_spark.functions import similarity as SIM

    rng = _random.Random(41)
    base = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf_nobase")
    SIM.write_ivf_index(SIM.ivf_index(base, n_cells=4, seed=7), path)
    shutil.rmtree(f"{path}/stats")

    rc = cli_main(["index", "status", path])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 4 and rep["baseline_missing"]
    assert rep["staleness_ratio"] is None
    assert not os.path.exists(f"{path}/stats")  # still read-only
