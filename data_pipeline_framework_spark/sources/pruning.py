"""File-level data skipping from parquet footer statistics.

Spark prunes hive PARTITIONS from directory names and row groups from
footer stats once a file is opened — but the scheduler still lists and
plans a task for every file. On a 100 TB table laid out with
`operators.layout.cluster_by_zorder` (or any range layout), most files
can be proven irrelevant from their footer min/max alone; skipping them
BEFORE `spark.read` shrinks the task count and the listing the driver
ships to executors.

The reference framework has no data-skipping layer (its parquet I/O is
`pandas.read_parquet`, `src/data_pipeline/core/base.py`); this is the
Spark-scale companion to the Z-order writer.

Cost model: one footer read (a few KB) per file, on the driver, in a
thread pool — no data pages are touched. Files with missing stats are
kept (skipping is only ever an optimization; the caller's filter still
runs, so correctness never depends on the pruning decision).
"""

from __future__ import annotations

import operator as _op
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["file_column_stats", "prune_files", "read_parquet_pruned"]

# predicate ops: value(s) vs the file's [min, max] envelope
_KEEP = {
    "=": lambda lo, hi, v: lo <= v <= hi,
    "==": lambda lo, hi, v: lo <= v <= hi,
    ">": lambda lo, hi, v: hi > v,
    ">=": lambda lo, hi, v: hi >= v,
    "<": lambda lo, hi, v: lo < v,
    "<=": lambda lo, hi, v: lo <= v,
    "between": lambda lo, hi, v: not (hi < v[0] or lo > v[1]),
    "in": lambda lo, hi, v: any(lo <= x <= hi for x in v),
}


def _list_files(path: str | Path) -> list[str]:
    p = Path(path)
    if p.is_dir():
        return sorted(str(f) for f in p.rglob("*.parquet"))
    if any(ch in str(path) for ch in "*?["):
        import glob

        return sorted(glob.glob(str(path)))
    return [str(p)]


def file_column_stats(
    path: str | Path,
    columns: Sequence[str],
    max_workers: int = 16,
) -> list[dict[str, Any]]:
    """Per-file [min, max] envelopes for `columns`, read from parquet
    footers only. Returns one dict per file:
    {"file": path, "<col>": (min, max) | None, "rows": n}.
    An envelope is None when any row group lacks stats for the column
    (always treated as may-match)."""
    import pyarrow.parquet as pq

    files = _list_files(path)

    def one(f: str) -> dict[str, Any]:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        out: dict[str, Any] = {"file": f, "rows": md.num_rows}
        for c in columns:
            if c not in idx:
                out[c] = None
                continue
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            out[c] = (lo, hi) if ok and lo is not None else None
        return out

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        return list(ex.map(one, files))


def prune_files(
    path: str | Path,
    predicates: Iterable[tuple[str, str, Any]],
    max_workers: int = 16,
) -> tuple[list[str], int]:
    """Files that MAY satisfy every predicate (conjunction), judged from
    footer min/max. Returns (kept_files, total_files). Predicates are
    (column, op, value) with op in =,==,>,>=,<,<=,between,in ('between'
    takes a (lo, hi) pair, 'in' an iterable)."""
    preds = list(predicates)
    for _, op, _ in preds:
        if op not in _KEEP:
            raise ValueError(f"unsupported prune op: {op!r}")
    cols = sorted({c for c, _, _ in preds})
    kept = []
    stats = file_column_stats(path, cols, max_workers=max_workers)
    for st in stats:
        keep = True
        for c, op, v in preds:
            env = st.get(c)
            if env is None:
                continue  # no stats -> may match
            lo, hi = env
            try:
                if not _KEEP[op](lo, hi, v):
                    keep = False
                    break
            except TypeError:
                continue  # incomparable types -> may match
        if keep:
            kept.append(st["file"])
    return kept, len(stats)


def read_parquet_pruned(
    spark: SparkSession,
    path: str | Path,
    predicates: Iterable[tuple[str, str, Any]],
    nanos_ts_columns: tuple[str, ...] = (),
    max_workers: int = 16,
    source_file_column: bool = False,
) -> DataFrame:
    """spark.read.parquet over only the footer-surviving files, with the
    predicates re-applied as real filters (pruning is an optimization,
    never the correctness boundary). Returns an empty DataFrame with the
    full schema when every file prunes away."""
    from . import readers

    preds = list(predicates)
    kept, total = prune_files(path, preds, max_workers=max_workers)
    files = kept if kept else _list_files(path)[:1]  # schema anchor
    df = readers.read_parquet(
        spark, list(files), nanos_ts_columns=nanos_ts_columns,
        source_file_column=source_file_column,
    )
    for c, op, v in preds:
        col = df[c]
        if op == "between":
            cond = (col >= v[0]) & (col <= v[1])
        elif op == "in":
            cond = col.isin(list(v))
        elif op in ("=", "=="):
            cond = col == v
        else:
            cond = {">": _op.gt, ">=": _op.ge,
                    "<": _op.lt, "<=": _op.le}[op](col, v)
        df = df.filter(cond)
    if not kept:
        return df.limit(0)
    return df


def fast_row_count(path: str | Path, max_workers: int = 16) -> int:
    """Exact table row count from parquet footers only — no data pages
    read, no Spark job. COUNT(*) over a raw parquet directory is the
    most common "is the snapshot complete?" check in an ingest
    pipeline, and the footer already carries the answer: metadata cost
    is a few KB per file (thread-pooled like file_column_stats) versus
    a full scan's task-per-split schedule. Engines with aggregate
    pushdown do this internally for simple counts; this surfaces it for
    raw directories and as a cheap pre-flight before planning a big
    job. Counts deleted/late files at call time — re-check at the
    correctness boundary if the directory mutates concurrently."""
    import pyarrow.parquet as pq

    files = _list_files(path)

    def one(f: str) -> int:
        return pq.ParquetFile(f).metadata.num_rows

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        return sum(ex.map(one, files))
