"""Pipeline lifecycle + config + sinks tests.

Ports the intent of the reference's orchestration tests
(reference tests/unit/test_pipeline_core.py) without the mocking: real
YAML -> compiled plan -> parquet sink round trips on the sf0.001 tables.
"""

from __future__ import annotations

import os

import pytest
import yaml

from data_pipeline_framework_spark.core import (
    Pipeline,
    load_config,
    substitute_env,
)
from data_pipeline_framework_spark.sinks.writers import (
    jdbc_upsert,
    kafka_messages,
    write_output,
    write_parquet,
)
from data_pipeline_framework_spark.sources.readers import read_parquet


# -- config ------------------------------------------------------------------


def test_env_substitution(monkeypatch):
    monkeypatch.setenv("DPF_HOST", "db.example")
    cfg = substitute_env(
        {
            "url": "jdbc:postgresql://${DPF_HOST}:${DPF_PORT:5432}/x",
            "exact": "${DPF_HOST}",
            "missing": "${DPF_NOPE:fallback}",
            "empty": "${DPF_NOPE2}",
            "nested": [{"k": "${DPF_HOST}"}],
        }
    )
    assert cfg["url"] == "jdbc:postgresql://db.example:5432/x"
    assert cfg["exact"] == "db.example"
    assert cfg["missing"] == "fallback"
    assert cfg["empty"] == ""
    assert cfg["nested"][0]["k"] == "db.example"


def test_config_validation_errors():
    with pytest.raises(ValueError, match="operations\\[0\\] missing"):
        load_config(
            data={
                "name": "x",
                "processing": {"operations": [{"no_type": 1}]},
            }
        )
    with pytest.raises(ValueError, match="storage.type"):
        load_config(data={"name": "x", "storage": {"destination": "t"}})


def test_params_nesting_normalized():
    cfg = load_config(
        data={
            "name": "x",
            "processing": {
                "operations": [
                    {"type": "select", "params": {"columns": ["a"]}},
                    {"type": "limit", "n": 5},
                ]
            },
        }
    )
    assert cfg.operations == [
        {"type": "select", "columns": ["a"]},
        {"type": "limit", "n": 5},
    ]


# -- full lifecycle ----------------------------------------------------------


def test_yaml_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """YAML -> load parquet -> filter/aggregate -> validate -> parquet sink."""
    out = str(tmp_path / "out")
    doc = {
        "name": "orders_rollup",
        "source": {"type": "parquet"},
        "input": {"path": f"{sf_dir}/orders.parquet"},
        "processing": {
            "operations": [
                {"type": "filter", "condition": "o_totalprice > 1000"},
                {
                    "type": "aggregate",
                    "group_by": ["o_orderstatus"],
                    "aggregations": {"o_totalprice": ["sum", "count"]},
                },
            ]
        },
        "validation": {
            "enabled": True,
            "rules": [
                {"metric": "completeness", "column": "o_orderstatus",
                 "threshold": 1.0},
            ],
        },
        "profiling": {"enabled": True},
        "storage": {"type": "parquet", "destination": out, "mode": "replace"},
    }
    path = tmp_path / "p.yaml"
    path.write_text(yaml.safe_dump(doc))

    result = Pipeline.from_yaml(path, spark).run()
    assert result.status == "success", result.error
    assert result.rows_written and result.rows_written > 0
    assert result.validation[0]["status"] == "PASS"
    assert result.profile  # numeric profile rows present

    back = spark.read.parquet(out)
    assert back.count() == result.rows_written
    assert set(back.columns) == {
        "o_orderstatus", "o_totalprice_sum", "o_totalprice_count",
    }


def test_pipeline_validation_failure(spark, sf_dir):
    cfg = {
        "name": "fails",
        "processing": {"operations": []},
        "validation": {
            "enabled": True,
            "rules": [
                # never 'impossible' -> validity 0.0 < 0.5
                {"metric": "validity", "column": "o_orderpriority",
                 "predicate": "o_orderpriority = 'impossible'",
                 "threshold": 0.5},
            ],
        },
    }
    df = read_parquet(spark, f"{sf_dir}/orders.parquet")
    result = Pipeline(cfg, spark).run(input_df=df)
    assert result.status == "validation_failed"
    assert result.validation[0]["status"] == "FAIL"


def test_pipeline_error_reported_not_raised(spark):
    cfg = {"name": "boom", "source": {"type": "parquet"},
           "input": {"path": "/nonexistent/nope.parquet"}}
    result = Pipeline(cfg, spark).run()
    assert result.status == "failed"
    assert result.error


def test_pipeline_join_resolves_named_tables(spark, sf_dir, tmp_path):
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    customer = read_parquet(spark, f"{sf_dir}/customer.parquet")
    cfg = {
        "name": "joined",
        "processing": {
            "operations": [
                {"type": "join", "right": "customer",
                 "condition": "o_custkey = c_custkey", "how": "inner",
                 "broadcast": True},
                {"type": "select", "columns": ["o_orderkey", "c_name"]},
            ]
        },
    }
    result_df = Pipeline(cfg, spark, tables={"customer": customer}).process(orders)
    assert result_df.columns == ["o_orderkey", "c_name"]
    assert result_df.count() == orders.count()


# -- sinks -------------------------------------------------------------------


def test_write_parquet_partitioned(spark, sf_dir, tmp_path):
    out = str(tmp_path / "part_out")
    df = read_parquet(spark, f"{sf_dir}/orders.parquet").limit(200)
    write_parquet(df, out, mode="replace", partition_by=["o_orderstatus"])
    # hive layout: one dir per status value -> partition pruning works
    dirs = [d for d in os.listdir(out) if d.startswith("o_orderstatus=")]
    assert dirs
    assert spark.read.parquet(out).count() == 200


def test_write_output_dispatch_csv_json(spark, sf_dir, tmp_path):
    df = read_parquet(spark, f"{sf_dir}/region.parquet")
    meta = write_output(
        df, {"type": "csv", "destination": str(tmp_path / "c"),
             "mode": "replace"})
    assert meta["type"] == "csv"
    assert spark.read.option("header", True).csv(str(tmp_path / "c")).count() == 5
    write_output(df, {"type": "json", "destination": str(tmp_path / "j"),
                      "mode": "replace"})
    assert spark.read.json(str(tmp_path / "j")).count() == 5
    with pytest.raises(ValueError, match="unknown storage type"):
        write_output(df, {"type": "wat", "destination": "x"})


def test_kafka_message_shape(spark, sf_dir):
    df = read_parquet(spark, f"{sf_dir}/region.parquet")
    msgs = kafka_messages(df, key_column="r_regionkey")
    assert msgs.columns == ["key", "value"]
    row = msgs.orderBy("key").first()
    assert row["key"] == "0"
    assert '"r_regionkey":0' in row["value"]


def test_jdbc_upsert_sql_shape(spark, sf_dir, monkeypatch):
    df = read_parquet(spark, f"{sf_dir}/region.parquet")
    staged = {}
    monkeypatch.setattr(
        "data_pipeline_framework_spark.sinks.writers.write_jdbc",
        lambda df, url, table, **kw: staged.setdefault("table", table),
    )
    sql = jdbc_upsert(df, "jdbc:postgresql://h/db", "region",
                      conflict_columns=["r_regionkey"])
    assert staged["table"] == "region_staging"
    assert sql == (
        "INSERT INTO region (r_regionkey, r_name) "
        "SELECT r_regionkey, r_name FROM region_staging WHERE true "
        "ON CONFLICT (r_regionkey) DO UPDATE SET "
        "r_name = EXCLUDED.r_name"
    )


def test_five_concurrent_pipelines(spark, sf_dir, tmp_path):
    """Parity with the reference's concurrency benchmark
    (test_benchmarks.py: 5 concurrent pipelines): five pipeline runs
    submitted from five threads against one session must all succeed and
    write consistent outputs — Spark schedules their jobs concurrently."""
    import threading

    from pyspark.sql import functions as F

    results = {}

    def run_one(i):
        out = str(tmp_path / f"out{i}")
        cfg = {
            "name": f"concurrent_{i}",
            "source": {"type": "parquet"},
            "input": {"path": f"{sf_dir}/orders.parquet"},
            "processing": {"operations": [
                {"type": "filter", "condition": f"o_custkey % 5 = {i}"},
                {"type": "aggregate", "group_by": ["o_orderpriority"],
                 "aggregations": {"o_totalprice": ["sum", "count"]}},
            ]},
            "storage": {"type": "parquet", "destination": out,
                        "mode": "replace"},
        }
        results[i] = (Pipeline(cfg, spark).run(), out)

    threads = [threading.Thread(target=run_one, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 5
    total = 0
    for i, (res, out) in results.items():
        assert res.status == "success", (i, res.error)
        back = spark.read.parquet(out)
        total += back.agg(F.sum("o_totalprice_count")).first()[0]
    # the five custkey-residue slices partition the table exactly
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert total == orders.count()


def test_corpus_curation_yaml_example(spark, sf_dir, tmp_path, monkeypatch):
    """the shipped examples/corpus_curation.yaml runs end-to-end: split ->
    train filter -> mixture resample -> chunk -> parquet shards."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "corpus_out")
    monkeypatch.setenv("CORPUS_INPUT", f"{sf_dir}/documents.parquet")
    monkeypatch.setenv("CORPUS_OUT", out)
    result = Pipeline.from_yaml("examples/corpus_curation.yaml", spark).run()
    assert result.status == "success", result.error
    back = spark.read.parquet(out)
    assert set(back.columns) == {
        "doc_id", "chunk_id", "n_tokens", "chunk_text", "n_bpe_tokens"
    }
    assert back.count() == result.rows_written > 0
    # chunks never exceed the window
    assert back.agg(F.max("n_tokens")).first()[0] <= 64
    # every chunk got a learned-BPE budget, and subwords mean it is
    # never below the whitespace token count
    assert back.filter(
        F.col("n_bpe_tokens") < F.col("n_tokens")
    ).count() == 0
    assert result.validation[0]["status"] == "PASS"


def test_layout_optimize_yaml_example(spark, sf_dir, tmp_path, monkeypatch):
    """the shipped examples/layout_optimize.yaml runs end-to-end:
    quota -> durable checkpoint -> zorder clustering -> parquet."""
    import os as _os

    out = str(tmp_path / "lo_out")
    ckpt = str(tmp_path / "lo_ckpt")
    monkeypatch.setenv("LAYOUT_INPUT", f"{sf_dir}/lineitem.parquet")
    monkeypatch.setenv("LAYOUT_OUT", out)
    monkeypatch.setenv("LAYOUT_CKPT", ckpt)
    result = Pipeline.from_yaml("examples/layout_optimize.yaml", spark).run()
    assert result.status == "success", result.error
    assert _os.path.exists(ckpt)          # durable checkpoint materialized
    back = spark.read.parquet(out)
    assert back.count() == result.rows_written > 0
    # quota respected
    from pyspark.sql import functions as F
    mx = back.groupBy("l_suppkey").count().agg(F.max("count")).first()[0]
    assert mx <= 500


def test_product_analytics_yaml_example(spark, sf_dir, tmp_path, monkeypatch):
    """the shipped examples/product_analytics.yaml runs end-to-end:
    NANOS-normalizing parquet source -> funnel op -> parquet."""
    out = str(tmp_path / "pa_out")
    monkeypatch.setenv("EVENTS_INPUT", f"{sf_dir}/events.parquet")
    monkeypatch.setenv("FUNNEL_OUT", out)
    result = Pipeline.from_yaml(
        "examples/product_analytics.yaml", spark
    ).run()
    assert result.status == "success", result.error
    back = spark.read.parquet(out)
    rows = {r["step"]: r for r in back.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["step_name"] == "view"
    assert rows[1]["users"] >= rows[2]["users"] >= rows[3]["users"]
    assert result.validation[0]["status"] == "PASS"


def test_journey_analysis_yaml_example(spark, sf_dir, tmp_path, monkeypatch):
    """the shipped examples/journey_analysis.yaml runs end-to-end:
    NANOS-normalizing parquet source -> top_paths op -> parquet."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "ja_out")
    monkeypatch.setenv("EVENTS_INPUT", f"{sf_dir}/events.parquet")
    monkeypatch.setenv("PATHS_OUT", out)
    result = Pipeline.from_yaml(
        "examples/journey_analysis.yaml", spark
    ).run()
    assert result.status == "success", result.error
    back = spark.read.parquet(out)
    rows = back.collect()
    assert 0 < len(rows) <= 10
    assert all(r["n_users"] >= 1 and r["path"] for r in rows)
    # counts are non-increasing in rank order
    ns = [r["n_users"] for r in back.orderBy(
        F.desc("n_users"), "path").collect()]
    assert ns == sorted(ns, reverse=True)
    assert result.validation[0]["status"] == "PASS"


def test_quality_filtering_yaml_example(spark, sf_dir, tmp_path,
                                        monkeypatch):
    """the shipped examples/quality_filtering.yaml runs end-to-end:
    entropy band -> blocklist cap -> span removal -> winnowing."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "qf_out")
    monkeypatch.setenv("QF_INPUT", f"{sf_dir}/documents.parquet")
    monkeypatch.setenv("QF_OUT", out)
    result = Pipeline.from_yaml(
        "examples/quality_filtering.yaml", spark).run()
    assert result.status == "success", result.error
    back = spark.read.parquet(out)
    assert {"doc_id", "text", "entropy_bits", "blocked_frac",
            "fingerprints"} <= set(back.columns)
    assert back.count() == result.rows_written > 0
    # the entropy band actually applied
    stats = back.agg(
        F.min("entropy_bits"), F.max("entropy_bits")).first()
    assert stats[0] >= 2.0 and stats[1] <= 5.5
    assert result.validation[0]["status"] == "PASS"


def test_privacy_release_yaml_example(spark, sf_dir, tmp_path, monkeypatch):
    """the shipped examples/privacy_release.yaml runs end-to-end:
    k-anonymity suppression drops every sub-k quasi-identifier class."""
    out = str(tmp_path / "pr_out")
    monkeypatch.setenv("PR_INPUT", f"{sf_dir}/customer.parquet")
    monkeypatch.setenv("PR_OUT", out)
    result = Pipeline.from_yaml(
        "examples/privacy_release.yaml", spark).run()
    assert result.status == "success", result.error
    back = spark.read.parquet(out)
    assert back.count() == result.rows_written > 0
    # every surviving class has >= 5 members
    sizes = back.groupBy("c_nationkey", "c_mktsegment").count()
    assert sizes.filter("count < 5").count() == 0
    assert result.validation[0]["status"] == "PASS"


def test_embedding_curation_yaml_example(spark, sf_dir, tmp_path,
                                         monkeypatch):
    """the shipped examples/embedding_curation.yaml runs end-to-end:
    SemDeDup filter -> per-cell coverage sample."""
    out = str(tmp_path / "ec_out")
    monkeypatch.setenv("EC_INPUT", f"{sf_dir}/embeddings.parquet")
    monkeypatch.setenv("EC_OUT", out)
    result = Pipeline.from_yaml(
        "examples/embedding_curation.yaml", spark).run()
    assert result.status == "success", result.error
    back = spark.read.parquet(out)
    assert {"vec_id", "cell", "proto_cos"} <= set(back.columns)
    n = back.count()
    assert 0 < n == result.rows_written
    # at most k_per_cell rows per cell
    assert back.groupBy("cell").count().filter("count > 16").count() == 0


def test_soft_curation_yaml_examples(spark, sf_dir, tmp_path, monkeypatch):
    """the shipped examples/soft_curation.yaml and
    examples/mixed_language_audit.yaml run end-to-end: soft-dedup
    weights (1/|cluster|, 1.0 unclustered) and the per-doc
    language-consistency report."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "sc_out")
    monkeypatch.setenv("SC_INPUT", f"{sf_dir}/documents.parquet")
    monkeypatch.setenv("SC_OUT", out)
    result = Pipeline.from_yaml("examples/soft_curation.yaml", spark).run()
    assert result.status == "success", result.error
    back = spark.read.parquet(out)
    assert result.rows_written == back.count() > 0
    w = back.agg(F.min("weight"), F.max("weight")).first()
    assert 0.0 < w[0] <= w[1] <= 1.0
    # unclustered docs keep weight exactly 1.0
    assert back.filter(
        F.col("component").isNull() & (F.col("weight") != 1.0)
    ).count() == 0

    result2 = Pipeline.from_yaml(
        "examples/mixed_language_audit.yaml", spark
    ).run()
    assert result2.status == "success", result2.error
    rep = spark.read.parquet(out + "_mixed")
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rep.count() == n_docs  # every doc appears in the report
    assert set(rep.columns) == {
        "doc_id", "n_segments", "majority_lang", "n_disagree", "mixed_frac"
    }


def test_audit_sample_yaml_example(spark, sf_dir, tmp_path, monkeypatch):
    """the shipped examples/audit_sample.yaml runs end-to-end: exactly
    k rows, deterministic across runs, priorities carried for audit."""
    out = str(tmp_path / "as_out")
    monkeypatch.setenv("AS_INPUT", f"{sf_dir}/documents.parquet")
    monkeypatch.setenv("AS_OUT", out)
    result = Pipeline.from_yaml("examples/audit_sample.yaml", spark).run()
    assert result.status == "success", result.error
    back = spark.read.parquet(out)
    assert back.count() == 50 == result.rows_written
    ids1 = sorted(r["doc_id"] for r in back.select("doc_id").collect())
    # deterministic: a second run lands the identical subset
    result2 = Pipeline.from_yaml("examples/audit_sample.yaml", spark).run()
    assert result2.status == "success", result2.error
    ids2 = sorted(
        r["doc_id"]
        for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert ids1 == ids2
    assert "priority" in back.columns


def test_trained_quality_filter_yaml_example(
    spark, sf_dir, tmp_path, monkeypatch
):
    """the shipped examples/trained_quality_filter.yaml runs
    end-to-end: trains the hashed classifier in-pipeline from the seed
    label, scores, filters at 0.5, and is deterministic across runs
    (the trainer's dyadic arithmetic is partition-invariant)."""
    out = str(tmp_path / "tq_out")
    monkeypatch.setenv("TQ_INPUT", f"{sf_dir}/documents.parquet")
    monkeypatch.setenv("TQ_OUT", out)
    result = Pipeline.from_yaml(
        "examples/trained_quality_filter.yaml", spark
    ).run()
    assert result.status == "success", result.error
    back = spark.read.parquet(out)
    n = back.count()
    assert 0 < n == result.rows_written
    assert {"prob", "margin", "n_tokens", "seed_label"} <= set(back.columns)
    assert back.filter("prob < 0.5").count() == 0
    ids1 = sorted(r["doc_id"] for r in back.select("doc_id").collect())
    result2 = Pipeline.from_yaml(
        "examples/trained_quality_filter.yaml", spark
    ).run()
    assert result2.status == "success", result2.error
    ids2 = sorted(
        r["doc_id"]
        for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert ids1 == ids2
