"""Parquet table maintenance: keyed merge (CDC upsert) and small-file
compaction — how a 100 TB parquet table is kept current and scan-friendly
without a table format.

Both rewrite into a temp directory and swap, because Spark cannot safely
overwrite a path it is reading. The swap is a filesystem rename —
atomic-enough on a real filesystem/HDFS; on an object store use a table
format (Delta/Iceberg) whose manifest gives real atomicity (declared out
of scope here, see SURVEY §2.18).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _local(path: str) -> Path:
    return Path(path.removeprefix("file:"))


def _swap(tmp: Path, live: Path) -> None:
    old = live.with_name(live.name + "__old")
    live.rename(old)
    tmp.rename(live)
    shutil.rmtree(old)


def merge_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> dict:
    """Upsert `updates` into the parquet table at `path` by key: current
    rows whose key appears in the updates are replaced, new keys append
    (last-writer-wins CDC merge, the file-sink sibling of jdbc_upsert).

    One anti-join (current minus updated keys) + union + rewrite; the
    updates side is usually the small one — Spark broadcasts it into the
    anti-join. The whole table rewrites, which is what key-level merge
    without a table format costs; partition_by + pre-filtered merges
    bound the rewrite at scale.
    """
    live = _local(path)
    current = spark.read.parquet(path)
    missing = [c for c in current.columns if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing columns: {missing}")
    keep = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = keep.unionByName(updates.select(*current.columns))
    tmp = live.with_name(live.name + "__tmp")
    w = merged.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(str(tmp))
    # the rewrite is an action on a plan READING `live`; only after it
    # completes does the swap touch the live directory
    _swap(tmp, live)
    return {"path": path, "merged_keys": keys}


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
) -> dict:
    """Rewrite a many-small-files parquet directory into ~target-sized
    files. Small files are the classic ingest pathology: a 100 TB scan
    over 10 MB files pays 10x the open/footer overhead and floods the
    driver's file index. File count = ceil(bytes / target); sizes come
    from the filesystem listing (metadata-only, no data read)."""
    live = _local(path)
    files = [p for p in live.rglob("*.parquet") if p.is_file()]
    total = sum(p.stat().st_size for p in files)
    n_out = max(1, -(-total // (target_file_mb << 20)))
    df = spark.read.parquet(path)
    tmp = live.with_name(live.name + "__tmp")
    df.repartition(int(n_out)).write.mode("overwrite").parquet(str(tmp))
    _swap(tmp, live)
    return {
        "path": path,
        "files_before": len(files),
        "files_after": int(n_out),
        "bytes": int(total),
    }


def table_stats(spark: SparkSession, path: str) -> dict:
    """File-level health of a parquet directory: counts, bytes, small-file
    ratio — the signal that schedules compaction."""
    live = _local(path)
    sizes = [
        p.stat().st_size for p in live.rglob("*.parquet") if p.is_file()
    ]
    small = sum(1 for s in sizes if s < (16 << 20))
    return {
        "path": path,
        "n_files": len(sizes),
        "total_bytes": int(sum(sizes)),
        "avg_file_bytes": int(sum(sizes) / len(sizes)) if sizes else 0,
        "small_file_ratio": small / len(sizes) if sizes else 0.0,
    }
