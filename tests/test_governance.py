"""Governance tests: lineage graph, catalog registration, quality loop.

Exact-value style ported from the reference's quality tests
(reference tests/test_quality_monitor.py, e.g. 3-of-5 non-null -> 0.6).
"""

from __future__ import annotations

from data_pipeline_framework_spark.governance import (
    DataCatalog,
    LineageTracker,
    QualityMonitor,
)
from data_pipeline_framework_spark.sources.readers import read_parquet


# -- lineage -----------------------------------------------------------------


def test_lineage_graph_and_queries():
    t = LineageTracker()
    t.track(["raw_orders", "raw_customers"], "stg_orders", "join")
    t.track("stg_orders", "orders_daily", "aggregate")
    t.track("orders_daily", "dashboard", "export")

    assert t.upstream("stg_orders") == ["raw_customers", "raw_orders"]
    assert t.downstream("stg_orders") == ["orders_daily"]

    g = t.graph("dashboard", depth=3, direction="upstream")
    assert g["dataset"] == "dashboard"
    chain = g["parents"][0]
    assert chain["dataset"] == "orders_daily"
    assert chain["parents"][0]["dataset"] == "stg_orders"
    assert {n["dataset"] for n in chain["parents"][0]["parents"]} == {
        "raw_customers", "raw_orders",
    }

    down = t.graph("raw_orders", depth=5, direction="downstream")
    leaf = down["children"][0]["children"][0]["children"][0]
    assert leaf["dataset"] == "dashboard"

    rows = t.to_rows()
    assert len(rows) == 4
    assert rows[0]["transformation_type"] == "join"
    assert "Lineage report" in t.report("stg_orders")


def test_lineage_cycle_is_cut():
    t = LineageTracker()
    t.track("a", "b", "step")
    t.track("b", "a", "step")
    g = t.graph("a", depth=10, direction="downstream")
    # a -> b, then the back-edge to a is suppressed
    assert g["children"][0]["dataset"] == "b"
    assert g["children"][0]["children"] == []


# -- catalog -----------------------------------------------------------------


def test_catalog_register_and_search(spark, sf_dir):
    cat = DataCatalog()
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    meta = cat.register_table(
        orders, "orders", description="order headers", tags=["tpch"]
    )
    assert meta.row_count == orders.count()
    assert meta.column_count == len(orders.columns)
    key = next(c for c in meta.columns if c.name == "o_orderkey")
    assert key.null_count == 0
    # approx_count_distinct on a unique key: within 5% of exact
    assert abs(key.distinct_count - meta.row_count) / meta.row_count < 0.05

    region = read_parquet(spark, f"{sf_dir}/region.parquet")
    cat.register_table(region, "region", analyze=False)
    assert cat.get_table("region").row_count == 0  # analysis skipped

    assert [m.name for m in cat.search_tables("o_custkey")] == ["orders"]
    assert [m.name for m in cat.search_tables("tpch")] == ["orders"]
    rep = cat.report()
    assert rep["table_count"] == 2
    assert rep["total_rows"] == meta.row_count


# -- quality monitor ---------------------------------------------------------


def test_quality_checks_exact_values(spark):
    # 3-of-5 non-null -> completeness 0.6 (reference test style)
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None), (5, "a")], ["id", "v"]
    )
    qm = QualityMonitor()
    results = qm.run_quality_checks(df, "t", checks=[
        {"metric": "completeness", "column": "v",
         "warning_threshold": 0.95, "critical_threshold": 0.5},
        {"metric": "uniqueness", "column": "id",
         "warning_threshold": 0.99, "critical_threshold": 0.9},
        {"metric": "validity", "column": "id", "predicate": "id <= 4",
         "warning_threshold": 0.9, "critical_threshold": 0.85},
    ])
    by = {(r.metric, r.column): r for r in results}
    c = by[("completeness", "v")]
    assert c.value == 0.6 and c.status == "WARN"
    u = by[("uniqueness", "id")]
    assert u.value == 1.0 and u.status == "PASS"
    v = by[("validity", "id")]
    assert v.value == 0.8 and v.status == "FAIL"

    assert len(qm.alerts) == 2
    severities = {a.severity for a in qm.alerts}
    assert severities == {"warning", "critical"}
    s = qm.summary()
    assert s["by_status"] == {"PASS": 1, "WARN": 1, "FAIL": 1}
    assert qm.to_rows()[0]["table_name"] == "t"


def test_quality_default_checks(spark, sf_dir):
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    checks = QualityMonitor.default_checks(orders)
    metrics = {(c["metric"], c["column"]) for c in checks}
    assert ("completeness", "o_totalprice") in metrics
    assert ("uniqueness", "o_orderkey") in metrics  # *key heuristic
    qm = QualityMonitor()
    results = qm.run_quality_checks(orders, "orders", checks)
    assert all(r.status == "PASS" for r in results if r.metric == "completeness")


def test_k_anonymity_flags(spark):
    from data_pipeline_framework_spark.functions.privacy import (
        anonymity_summary,
        k_anonymity,
    )

    rows = (
        [("a", "x", i) for i in range(6)]        # class of 6, 6 distinct
        + [("a", "y", 1), ("a", "y", 1)]         # class of 2, 1 distinct
        + [("b", "x", 3)]                        # singleton
    )
    df = spark.createDataFrame(rows, "q1 string, q2 string, s int")
    out = k_anonymity(df, ["q1", "q2"], k=3, sensitive_col="s", l=2)
    got = {(r["q1"], r["q2"]): r for r in out.collect()}
    assert got[("a", "x")]["meets_k"] and got[("a", "x")]["meets_l"]
    assert not got[("a", "y")]["meets_k"]
    assert not got[("a", "y")]["meets_l"]  # k-fail AND same sensitive value
    assert not got[("b", "x")]["meets_k"]
    s = anonymity_summary(df, ["q1", "q2"], k=3).first()
    assert s["n_classes"] == 3 and s["classes_below_k"] == 2
    assert s["rows_at_risk"] == 3 and s["min_class_size"] == 1
    assert abs(s["risk_fraction"] - 3 / 9) < 1e-12
