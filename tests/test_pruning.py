"""Footer-stats file pruning (sources/pruning.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark.sources.pruning import (
    file_column_stats,
    prune_files,
    read_parquet_pruned,
)


@pytest.fixture(scope="module")
def ranged_table(spark, tmp_path_factory):
    """lineitem-ish table written as range-disjoint files (the layout
    cluster_by_zorder / repartitionByRange produces)."""
    path = str(tmp_path_factory.mktemp("pruned") / "t")
    df = spark.range(0, 10000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    (
        df.repartitionByRange(10, "k")
        .sortWithinPartitions("k")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def test_file_stats_envelopes(ranged_table):
    stats = file_column_stats(ranged_table, ["k", "v"])
    assert len(stats) == 10
    for st in stats:
        lo, hi = st["k"]
        assert 0 <= lo <= hi <= 9999
        assert st["rows"] > 0
    # range layout => k envelopes are (near-)disjoint: total span ~ rows
    spans = sorted(st["k"] for st in stats)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo  # strictly disjoint for repartitionByRange


def test_prune_files_skips_most_files(ranged_table):
    kept, total = prune_files(ranged_table, [("k", "between", (100, 300))])
    assert total == 10
    assert 1 <= len(kept) <= 2  # ~1000 ids per file

    kept_eq, _ = prune_files(ranged_table, [("k", "=", 5000)])
    assert len(kept_eq) == 1

    kept_gt, _ = prune_files(ranged_table, [("k", ">=", 9000)])
    assert len(kept_gt) <= 2

    kept_in, _ = prune_files(ranged_table, [("k", "in", [10, 9990])])
    assert len(kept_in) == 2

    # unprunable column (v spans 0..96 in every file) keeps everything
    kept_v, _ = prune_files(ranged_table, [("v", "=", 5)])
    assert len(kept_v) == 10


def test_pruned_read_matches_full_filter(spark, ranged_table):
    full = (
        spark.read.parquet(ranged_table)
        .filter("k between 100 and 300")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
        )
        .first()
    )
    pruned = read_parquet_pruned(
        spark, ranged_table, [("k", "between", (100, 300))]
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")).first()
    assert (pruned["n"], pruned["sv"]) == (full["n"], full["sv"])
    assert full["n"] == 201


def test_pruned_read_empty_keeps_schema(spark, ranged_table):
    out = read_parquet_pruned(spark, ranged_table, [("k", ">", 10**9)])
    assert out.count() == 0
    assert set(out.columns) == {"k", "v"}


def test_prune_rejects_bad_op(ranged_table):
    with pytest.raises(ValueError):
        prune_files(ranged_table, [("k", "~", 1)])


def test_conjunction_and_missing_stats(spark, ranged_table):
    # conjunction: both predicates must be satisfiable
    kept, _ = prune_files(
        ranged_table, [("k", ">=", 9000), ("k", "<", 500)]
    )
    assert kept == []
    # unknown column -> treated as may-match, nothing pruned
    kept2, total = prune_files(ranged_table, [("zzz", "=", 1)])
    assert len(kept2) == total


def test_pipeline_source_prune_config(spark, ranged_table, tmp_path):
    """`source.config.prune` drives footer-stats skipping from YAML."""
    import yaml

    from data_pipeline_framework_spark.core import Pipeline

    out = str(tmp_path / "pruned_out")
    cfg = {
        "name": "pruned_scan",
        "source": {
            "type": "parquet",
            "config": {"prune": [["k", "between", [100, 300]]]},
        },
        "input": {"path": ranged_table},
        "processing": {"operations": [
            {"type": "aggregate", "aggregations": {"v": ["sum"]}},
        ]},
        "storage": {"type": "parquet", "destination": out,
                    "mode": "replace"},
    }
    p = str(tmp_path / "p.yaml")
    yaml.safe_dump(cfg, open(p, "w"))
    result = Pipeline.from_yaml(p, spark).run()
    assert result.status == "success", result.error
    got = spark.read.parquet(out).first()
    want = (
        spark.read.parquet(ranged_table)
        .filter("k between 100 and 300")
        .groupBy().sum("v").first()[0]
    )
    assert got[0] == want


def test_pruned_read_threads_source_file_column(spark, ranged_table):
    # prune + source_file_column must compose: the lineage column the
    # plain-parquet branch adds cannot silently vanish when footer
    # pruning is configured.
    from data_pipeline_framework_spark.sources.pruning import (
        read_parquet_pruned,
    )

    df = read_parquet_pruned(
        spark, ranged_table, [("k", "between", (100, 300))],
        source_file_column=True,
    )
    assert "_source_file" in df.columns
    rows = df.select("_source_file").distinct().collect()
    assert 1 <= len(rows) <= 2  # range-disjoint layout -> few files
    assert all(r[0].endswith(".parquet") for r in rows)


def test_pipeline_prune_with_source_file_column(spark, ranged_table, tmp_path):
    import yaml

    from data_pipeline_framework_spark.core import Pipeline

    out = str(tmp_path / "pruned_lineage_out")
    cfg = {
        "name": "pruned_lineage",
        "source": {
            "type": "parquet",
            "config": {
                "prune": [["k", "between", [100, 300]]],
                "source_file_column": True,
            },
        },
        "input": {"path": ranged_table},
        "processing": {"operations": []},
        "storage": {"type": "parquet", "destination": out, "mode": "replace"},
    }
    p = str(tmp_path / "p.yaml")
    yaml.safe_dump(cfg, open(p, "w"))
    result = Pipeline.from_yaml(p, spark).run()
    assert result.status == "success", result.error
    assert "_source_file" in spark.read.parquet(out).columns


def test_fast_row_count_matches_scan(spark, tmp_path):
    from data_pipeline_framework_spark.sources.pruning import (
        fast_row_count,
    )

    p = str(tmp_path / "t")
    spark.range(0, 12345).repartition(7).write.parquet(p)
    assert fast_row_count(p) == 12345
    assert fast_row_count(p) == spark.read.parquet(p).count()
    # single file and glob forms
    one = sorted(str(f) for f in __import__("pathlib").Path(p).rglob("*.parquet"))[0]
    assert 0 < fast_row_count(one) < 12345
