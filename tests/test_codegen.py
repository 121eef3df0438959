"""generate-analysis codegen (reference cli/main.py:663-1008 parity)."""

from __future__ import annotations

import pytest

from data_pipeline_framework_spark import codegen
from data_pipeline_framework_spark.cli import main


def test_table_info_reads_schema_and_rows(spark, sf_dir):
    info = codegen.table_info(spark, f"{sf_dir}/nation.parquet")
    assert info["estimated_rows"] == 25
    names = [c["name"] for c in info["columns"]]
    assert names == ["n_nationkey", "n_name", "n_regionkey"]
    assert info["columns"][0]["data_type"] == "int"


def test_generated_python_code_executes(spark, sf_dir, tmp_path):
    """The starter script is genuinely runnable: exec it, then drive its
    load function with pruning/filter/limit arguments."""
    path = f"{sf_dir}/orders.parquet"
    info = codegen.table_info(spark, path)
    code = codegen.generate_analysis_code("orders", path, info, "python")
    ns = {"__name__": "analysis_orders"}  # skip the __main__ preview block
    exec(compile(code, "analysis_orders.py", "exec"), ns)

    df = ns["load_orders"](limit=7, where="o_totalprice > 0",
                           columns=["o_orderkey", "o_totalprice"])
    rows = df.collect()
    assert len(rows) == 7
    assert df.columns == ["o_orderkey", "o_totalprice"]

    total, stats = ns["orders_summary"]()
    assert total == 1500
    assert "o_totalprice" in stats.columns


def test_generated_scala_code_shape(spark, sf_dir):
    path = f"{sf_dir}/part.parquet"
    info = codegen.table_info(spark, path)
    code = codegen.generate_analysis_code("part", path, info, "scala")
    assert "object AnalysisPart" in code
    assert 'spark.read.parquet(tablePath)' in code
    assert "// - Columns (9):" in code or "p_partkey" in code
    with pytest.raises(ValueError):
        codegen.generate_analysis_code("part", path, info, "rust")


def test_cli_generate_all_tables(spark, sf_dir, tmp_path, capsys):
    out_dir = str(tmp_path / "analysis")
    rc = main(["generate", "analysis", sf_dir, "--all-tables",
               "--output-dir", out_dir])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Generating analysis code for 10 tables" in out
    import os

    files = sorted(os.listdir(out_dir))
    assert "analysis_lineitem.py" in files
    assert "analysis_nation.py" in files
    assert len(files) == 10


def test_cli_generate_single_table(spark, sf_dir, tmp_path, capsys,
                                   monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main(["generate", "analysis", f"{sf_dir}/region.parquet",
               "-l", "scala", "-o", "r.scala"])
    out = capsys.readouterr().out
    assert rc == 0 and "Columns: 2" in out
    assert "object AnalysisRegion" in (tmp_path / "r.scala").read_text()
