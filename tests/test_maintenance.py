"""Parquet table maintenance: keyed merge, compaction, health stats."""

from __future__ import annotations

import pytest

from data_pipeline_framework_spark.sinks.maintenance import (
    compact_parquet,
    merge_parquet,
    table_stats,
)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, f"u{i}", float(i)) for i in range(100)],
        "id long, name string, score double",
    ).repartition(20).write.parquet(path)
    return path


def test_merge_parquet_updates_and_inserts(spark, table):
    updates = spark.createDataFrame(
        [(5, "five", 555.0), (200, "new", 2.0)],
        "id long, name string, score double",
    )
    meta = merge_parquet(spark, table, updates, keys=["id"])
    assert meta["merged_keys"] == ["id"]
    got = {r["id"]: (r["name"], r["score"])
           for r in spark.read.parquet(table).collect()}
    assert len(got) == 101          # 100 originals, 1 replaced, 1 new
    assert got[5] == ("five", 555.0)   # updated in place
    assert got[200] == ("new", 2.0)    # inserted
    assert got[6] == ("u6", 6.0)       # untouched rows survive


def test_merge_parquet_rejects_missing_columns(spark, table):
    bad = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="missing columns"):
        merge_parquet(spark, table, bad, keys=["id"])


def test_compact_parquet_preserves_data(spark, table):
    before = table_stats(spark, table)
    assert before["n_files"] == 20
    rows_before = sorted(
        tuple(r) for r in spark.read.parquet(table).collect()
    )
    meta = compact_parquet(spark, table, target_file_mb=128)
    assert meta["files_after"] == 1   # tiny table -> one file
    after = table_stats(spark, table)
    assert after["n_files"] == 1
    assert sorted(tuple(r) for r in spark.read.parquet(table).collect()) \
        == rows_before
    assert after["small_file_ratio"] == 1.0  # still < 16 MB, honestly small


def test_write_training_shards_bounded_files(spark, tmp_path):
    from pathlib import Path

    from data_pipeline_framework_spark.sinks.writers import (
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1000)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    write_training_shards(
        df, out, max_records_per_file=100, shard_partitions=2,
        order_by=["doc_id"],
    )
    files = [p for p in Path(out).glob("*.json") if p.stat().st_size > 0]
    # 2 partitions x 500 rows, capped at 100 records/file -> >= 10 files
    assert len(files) >= 10
    for f in files:
        assert sum(1 for _ in open(f)) <= 100
    assert spark.read.json(out).count() == 1000


def test_merge_parquet_partitioned_layout(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(60)],
        "id long, bucket int, score double",
    ).write.partitionBy("bucket").parquet(path)
    updates = spark.createDataFrame(
        [(7, 1, 700.0), (100, 2, 1.0)], "id long, bucket int, score double"
    )
    merge_parquet(spark, path, updates, keys=["id"], partition_by=["bucket"])
    from pathlib import Path

    # hive layout survives the rewrite
    assert sorted(
        p.name for p in Path(path).iterdir() if p.name.startswith("bucket=")
    ) == ["bucket=0", "bucket=1", "bucket=2"]
    got = {r["id"]: r["score"] for r in spark.read.parquet(path).collect()}
    assert len(got) == 61 and got[7] == 700.0 and got[100] == 1.0
