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



def scd2_plan(
    hist: DataFrame | None,
    updates: DataFrame,
    keys: list[str],
    effective_col: str,
    compare_cols: list[str] | None = None,
    broadcast_key_limit: int = 2_000_000,
) -> DataFrame:
    """Lazy SCD2 merge plan (the semantics documented on scd2_merge):
    returns the full new history DataFrame for ``hist`` (None
    bootstraps) merged with ``updates``. Split out so the batch writer
    and the streaming foreachBatch twin share one implementation.

    The update batch's key set is broadcast into the history joins only
    when the batch is small (``updates.count() <= broadcast_key_limit``
    — one cheap narrow scan, right for CDC micro-batches where the hint
    saves three shuffles of the full history). A large backfill merge
    skips the hint and lets AQE pick the join strategy, so a
    billion-key update can't blow the executor broadcast budget."""
    from pyspark.sql.window import Window

    meta = ["valid_from", "valid_to", "is_current"]
    if hist is not None:
        for m in meta:
            if m not in hist.columns:
                raise ValueError(f"not an SCD2 table (missing {m})")
        payload = [c for c in hist.columns if c not in meta]
    else:
        payload = list(updates.columns)
    missing = [c for c in payload if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing columns: {missing}")
    cmp_cols = compare_cols or [
        c for c in payload if c not in keys and c != effective_col
    ]
    if not cmp_cols:
        raise ValueError(
            "no attribute columns to compare: the payload is only keys "
            "+ effective_col, so every later version would be suppressed "
            "as a consecutive duplicate; pass compare_cols explicitly or "
            "add attribute columns"
        )

    ups = (
        updates.select(*payload)
        .dropDuplicates(keys + [effective_col])
        .withColumn("__eff", F.col(effective_col))
    )
    untouched = None
    if hist is not None:
        small_batch = updates.count() <= broadcast_key_limit
        hint = F.broadcast if small_batch else (lambda d: d)
        batch_keys = ups.select(*keys).distinct()
        untouched = hist.join(hint(batch_keys), keys, "left_anti")
        touched = (
            hist.join(hint(batch_keys), keys, "left_semi")
            .select(*payload, F.col("valid_from").alias("__eff"))
        )
        # an update at a stored version's exact effective REPLACES it —
        # otherwise the two rows tie in the window order and the kept
        # one would be partition-dependent
        touched = touched.join(
            hint(ups.select(*keys, "__eff").distinct()),
            keys + ["__eff"],
            "left_anti",
        )
        seq = touched.unionByName(ups)
    else:
        seq = ups

    w = Window.partitionBy(*keys).orderBy(F.col("__eff").asc())
    same_as_prev = F.lit(True)
    for c in cmp_cols:
        same_as_prev = same_as_prev & F.col(c).eqNullSafe(
            F.lag(c).over(w)
        )
    kept = (
        seq.withColumn("__rn", F.row_number().over(w))
        .withColumn("__dup", (F.col("__rn") > 1) & same_as_prev)
        .filter(~F.col("__dup"))
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col("__eff").asc())
    chained = kept.select(
        *payload,
        F.col("__eff").alias("valid_from"),
        F.lead("__eff").over(w2).alias("valid_to"),
        F.lead("__eff").over(w2).isNull().alias("is_current"),
    )
    if untouched is not None:
        meta_cols = ["valid_from", "valid_to", "is_current"]
        return untouched.select(*payload, *meta_cols).unionByName(chained)
    return chained


def scd2_merge(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    effective_col: str,
    compare_cols: list[str] | None = None,
) -> dict:
    """Type-2 slowly-changing-dimension merge into the parquet history
    table at ``path``: instead of overwriting a key's row
    (merge_parquet, SCD1), every change CLOSES the key's current
    version (valid_to = the change's effective timestamp,
    is_current = false) and appends a new open version — the full
    change history stays queryable ("what did this dimension row say
    when that order shipped?").

    History schema = payload columns + (valid_from, valid_to,
    is_current); an empty/new table bootstraps it. Semantics: each
    TOUCHED key's full stored version list merges with its batch
    updates into one effective-ordered sequence, consecutive
    duplicates (equal ``compare_cols``, null-safe) are suppressed, and
    every kept version closes at the next kept version's effective
    timestamp (the last stays open). Re-chaining the whole per-key
    list — not just the open version — buys the SCD2 invariant that a
    key's validity windows NEVER overlap, even for late-arriving
    updates whose effective timestamp predates the current open
    version: the resulting history reads as if all surviving versions
    had been applied at once. (A duplicate suppressed in an earlier
    batch is gone — a later back-dated change does not resurrect it —
    and a back-dated update equal to the then-current value can
    retroactively fold a later stored version away; both are the
    at-once reading of the surviving version multiset.) An update whose
    effective timestamp EQUALS a stored version's valid_from replaces
    that version deterministically (the correction case: re-stating a
    key at the same effective time); two updates inside one batch with
    the same (key, effective) keep an arbitrary one — give simultaneous
    changes distinct effective timestamps.

    Shape: ONE key-partitioned window over (touched keys' stored
    versions ∪ batch updates) — bounded by batch size + version counts
    of touched keys only; untouched keys' rows pass through verbatim —
    plus the table rewrite every keyed parquet merge without a table
    format costs; partition on a stable key prefix to bound it.
    """
    live = _local(path)
    hist = spark.read.parquet(path) if live.exists() else None
    merged = scd2_plan(hist, updates, keys, effective_col, compare_cols)
    tmp = live.with_name(live.name + "__tmp")
    merged.write.mode("overwrite").parquet(str(tmp))
    if live.exists():
        _swap(tmp, live)
    else:
        tmp.rename(live)
    return {"path": path, "keys": keys, "effective": effective_col}
