"""Incremental rollup maintenance — continuous aggregates kept fresh by
merging partial-aggregate STATE with each new data slice, never
re-scanning history (the hypertable-rollup / materialized-aggregate
shape; at 100 TB a daily "recompute the dashboard aggregate" that
rescans the corpus is the bottleneck this removes).

Design: every supported aggregate is ALGEBRAIC — its partial state
merges associatively — so state tables compose like the data does:

    state(A ∪ B) == merge(state(A), state(B))          (tested exactly)

  sum/count  -> sum of partials        min/max -> min/max of partials
  avg        -> derived sum/count      approx distinct -> HLL sketch
                                         union (DataSketches, mergeable)

Non-algebraic aggregates (exact distinct, exact percentiles) are
deliberately NOT offered here: they cannot be maintained incrementally
without keeping per-key value sets; use the profiling/sketches modules
for those trade-offs explicitly. Approximate percentiles ARE offered,
as fixed-range histogram states (`histograms=`): bin counts add, so
the state stays algebraic, and quantile estimates finalize from the
cumulative bin counts deterministically (replayable in plain SQL).

The state is a plain parquet table keyed by the rollup keys; one
micro-batch update = one groupBy over the NEW slice (partial aggs
combine map-side) + one key-equi merge with state — both shuffles are
on the rollup keys and scale with |keys|, not |history|.

`update_rollup` persists via write-new-then-swap on the filesystem
(atomic on HDFS/object-store rename semantics); production tables with
concurrent writers should point `state_path` at a transactional table
format and keep the same merge plan.

The reference has no incremental aggregates (its `aggregate` op
recomputes from the full frame each run, processors/pandas_processor.py
:199-233); this is a scale-path addition under SURVEY §7.2 build step
10 (scale-out additions), sibling to the mergeable CMS/HLL sketch
tables in functions/sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "finalize_rollup",
    "merge_rollup_state",
    "rollup_state",
    "update_rollup",
]

_SUPPORTED = {"sum", "count", "min", "max", "avg", "approx_distinct"}


def _state_cols(metrics: dict[str, list[str]]) -> list[tuple[str, str, str]]:
    """(metric column, fn, state column) triples; avg expands to
    sum+count, approx_distinct to an HLL sketch column."""
    out = []
    for col, fns in metrics.items():
        for fn in fns:
            if fn not in _SUPPORTED:
                raise ValueError(
                    f"unsupported rollup aggregate {fn!r} "
                    f"(algebraic only: {sorted(_SUPPORTED)})"
                )
            if fn == "avg":
                out.append((col, "sum", f"{col}_sum"))
                out.append((col, "count", f"{col}_count"))
            elif fn == "approx_distinct":
                out.append((col, "approx_distinct", f"{col}_hll"))
            else:
                out.append((col, fn, f"{col}_{fn}"))
    # dedup (avg alongside sum/count shares state)
    seen: dict[str, tuple[str, str, str]] = {}
    for t in out:
        seen.setdefault(t[2], t)
    return list(seen.values())


_MAX_BINS = 4096


def _hist_specs(histograms: dict | None) -> list[tuple[str, float, float, int, list[float]]]:
    """(column, lo, hi, bins, quantiles) per histogram metric; validated."""
    out = []
    for col, spec in (histograms or {}).items():
        lo, hi = float(spec["lo"]), float(spec["hi"])
        bins = int(spec.get("bins", 64))
        if not hi > lo:
            raise ValueError(f"histogram {col!r}: hi must exceed lo")
        if not 1 <= bins <= _MAX_BINS:
            raise ValueError(
                f"histogram {col!r}: bins must be in [1, {_MAX_BINS}] "
                "(the state row carries one count per bin)"
            )
        qs = [float(q) for q in spec.get("quantiles", [0.5])]
        if any(not 0.0 < q < 1.0 for q in qs):
            raise ValueError(f"histogram {col!r}: quantiles must be in (0, 1)")
        out.append((col, lo, hi, bins, qs))
    return out


def _bin_expr(col: str, lo: float, hi: float, bins: int):
    """Clamped fixed-width bin index; NULL for NULL values (not counted)."""
    raw = F.floor((F.col(col) - lo) / ((hi - lo) / bins))
    return F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw)).cast("int")


def rollup_state(
    df: DataFrame,
    keys: list[str],
    metrics: dict[str, list[str]],
    lg_k: int = 12,
    histograms: dict | None = None,
) -> DataFrame:
    """Partial-aggregate state for one data slice: one groupBy on the
    rollup keys (map-side combine bounds the shuffle at |keys| rows per
    task). `metrics`: {column: [sum|count|min|max|avg|approx_distinct]};
    `histograms`: {column: {lo, hi, bins=64, quantiles=[0.5]}} adds a
    `{column}_hist` bin-count array (conditional sums — one pass, still
    a single shuffle, combine-friendly)."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for col, fn, sc in _state_cols(metrics):
        if fn == "sum":
            aggs.append(F.sum(col).alias(sc))
        elif fn == "count":
            aggs.append(F.count(col).alias(sc))
        elif fn == "min":
            aggs.append(F.min(col).alias(sc))
        elif fn == "max":
            aggs.append(F.max(col).alias(sc))
        elif fn == "approx_distinct":
            aggs.append(
                F.hll_sketch_agg(F.col(col).cast("string"), lg_k).alias(sc)
            )
    proj = df
    for col, lo, hi, bins, _ in _hist_specs(histograms):
        bc = f"__bin_{col}"
        proj = proj.withColumn(bc, _bin_expr(col, lo, hi, bins))
        aggs.append(
            F.array(*[
                F.sum(
                    F.when(F.col(bc) == i, F.lit(1)).otherwise(F.lit(0))
                    .cast("long")
                )
                for i in range(bins)
            ]).alias(f"{col}_hist")
        )
    return proj.groupBy(*keys).agg(*aggs)


def merge_rollup_state(
    a: DataFrame, b: DataFrame, keys: list[str],
    metrics: dict[str, list[str]],
    histograms: dict | None = None,
) -> DataFrame:
    """Merge two state tables: union + one groupBy re-combining each
    partial (sums add, mins min, sketches union, histogram bins add
    element-wise). Associative — slices can arrive and merge in any
    order."""
    aggs = [F.sum("__rows").alias("__rows")]
    for _, fn, sc in _state_cols(metrics):
        if fn in ("sum", "count"):
            aggs.append(F.sum(sc).alias(sc))
        elif fn == "min":
            aggs.append(F.min(sc).alias(sc))
        elif fn == "max":
            aggs.append(F.max(sc).alias(sc))
        elif fn == "approx_distinct":
            aggs.append(F.hll_union_agg(F.col(sc)).alias(sc))
    for col, _, _, bins, _ in _hist_specs(histograms):
        sc = f"{col}_hist"
        aggs.append(
            F.array(*[
                F.sum(F.element_at(F.col(sc), i + 1)) for i in range(bins)
            ]).alias(sc)
        )
    return a.unionByName(b).groupBy(*keys).agg(*aggs)


def _q_suffix(q: float) -> str:
    return ("p%g" % (q * 100)).replace(".", "_")


def finalize_rollup(
    state: DataFrame, metrics: dict[str, list[str]],
    histograms: dict | None = None,
) -> DataFrame:
    """Materialize user-facing aggregate columns from the state table
    (derive avg = sum/count, estimate sketches, estimate quantiles from
    histogram bins); drops state-only columns that no requested
    aggregate exposes.

    Quantile estimate is deterministic bin-midpoint: the first bin whose
    cumulative count reaches ceil(q * total) answers with its midpoint —
    exactly replayable in plain SQL, so it oracle-checks."""
    out = state
    drop: set[str] = set()
    for col, fns in metrics.items():
        if "avg" in fns:
            out = out.withColumn(
                f"{col}_avg",
                F.col(f"{col}_sum") / F.col(f"{col}_count"),
            )
            if "sum" not in fns:
                drop.add(f"{col}_sum")
            if "count" not in fns:
                drop.add(f"{col}_count")
        if "approx_distinct" in fns:
            out = out.withColumn(
                f"{col}_approx_distinct",
                F.hll_sketch_estimate(F.col(f"{col}_hll")).cast("long"),
            )
            drop.add(f"{col}_hll")
    for col, lo, hi, bins, qs in _hist_specs(histograms):
        sc = f"{col}_hist"
        width = (hi - lo) / bins
        tot = f"__tot_{col}"
        out = out.withColumn(
            tot,
            F.aggregate(
                F.col(sc), F.lit(0).cast("long"), lambda a, x: a + x
            ),
        )
        drop.update({sc, tot})
        for q in qs:
            tgt = f"__tgt_{col}_{_q_suffix(q)}"
            out = out.withColumn(
                tgt,
                F.greatest(
                    F.lit(1).cast("long"),
                    F.ceil(F.col(tot) * F.lit(q)).cast("long"),
                ),
            )
            target = F.col(tgt)
            zero = F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(-1).alias("idx"),
                F.lit(0).alias("i"),
            )

            def make_step(t):
                def step(acc, x):
                    cum2 = acc["cum"] + x
                    return F.struct(
                        cum2.alias("cum"),
                        F.when((acc["idx"] < 0) & (cum2 >= t), acc["i"])
                        .otherwise(acc["idx"]).alias("idx"),
                        (acc["i"] + 1).alias("i"),
                    )

                return step

            idx = F.aggregate(F.col(sc), zero, make_step(target))["idx"]
            out = out.withColumn(
                f"{col}_{_q_suffix(q)}",
                F.when(
                    F.col(tot) > 0,
                    F.lit(lo) + (idx + F.lit(0.5)) * F.lit(width),
                ),
            )
            drop.add(tgt)
    return out.drop(*drop) if drop else out


def _filesystem(spark: SparkSession, state_path: str):
    """Hadoop FileSystem for a path. Module-level so fault-injection
    tests can wrap every metadata operation (create/rename/delete) in a
    crash simulator — the swap protocol below is only trustworthy if a
    kill at ANY point between two operations recovers."""
    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return jvm.org.apache.hadoop.fs.Path(state_path).getFileSystem(conf)


def _commit_path(jvm, dir_path: str):
    return jvm.org.apache.hadoop.fs.Path(dir_path.rstrip("/") + "/_commit")


def _read_commit(fs, jvm, dir_path: str) -> int | None:
    """Commit id stored inside a state dir (None if absent/unreadable).
    Underscore-prefixed, so parquet readers ignore it."""
    p = _commit_path(jvm, dir_path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        line = reader.readLine()
    finally:
        stream.close()
    try:
        return int(line)
    except (TypeError, ValueError):
        return None


def _write_commit(fs, jvm, dir_path: str, commit_id: int | None) -> None:
    out = fs.create(_commit_path(jvm, dir_path), True)
    try:
        out.write(bytearray(
            str(-1 if commit_id is None else int(commit_id)).encode()
        ))
    finally:
        out.close()


def update_rollup(
    spark: SparkSession,
    delta: DataFrame,
    state_path: str,
    keys: list[str],
    metrics: dict[str, list[str]],
    lg_k: int = 12,
    histograms: dict | None = None,
    commit_id: int | None = None,
) -> DataFrame:
    """Fold one new slice into the persisted rollup: read state (if
    any), merge with the slice's partial aggs, atomically swap the
    state table, return the finalized rollup. History is never
    re-scanned — cost per update is one pass over the DELTA plus a
    |keys|-sized merge.

    `commit_id` makes replays exactly-once (the streaming foreachBatch
    contract: a crashed micro-batch is re-delivered with the SAME id):
    the id travels INSIDE the swapped state dir as a `_commit` marker,
    so state and marker land atomically in one rename; an update whose
    id <= the stored marker is a replay and returns the current rollup
    untouched.

    Crash-safe swap: write new state to `<path>__swap` (marker last),
    rename current -> `<path>__old`, swap in, drop old. Every crash
    window is recovered on the next call: a completed swap dir (marker
    present) with no live state is adopted; otherwise a leftover old
    dir is restored.
    """
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(state_path)
    fs = _filesystem(spark, state_path)
    tmp = state_path.rstrip("/") + "__swap"
    old = state_path.rstrip("/") + "__old"
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    old_path = jvm.org.apache.hadoop.fs.Path(old)

    # recover an interrupted previous swap
    if not fs.exists(path):
        if fs.exists(tmp_path) and _read_commit(fs, jvm, tmp) is not None:
            fs.rename(tmp_path, path)  # swap had fully landed; adopt it
        elif fs.exists(old_path):
            fs.rename(old_path, path)  # swap never landed; restore
    if fs.exists(old_path):
        fs.delete(old_path, True)

    if commit_id is not None and fs.exists(path):
        last = _read_commit(fs, jvm, state_path)
        if last is not None and last >= commit_id:
            return finalize_rollup(
                spark.read.parquet(state_path), metrics, histograms
            )

    new_state = rollup_state(delta, keys, metrics, lg_k, histograms)
    if fs.exists(path):
        cur = spark.read.parquet(state_path)
        merged = merge_rollup_state(cur, new_state, keys, metrics, histograms)
    else:
        merged = new_state
    merged.write.mode("overwrite").parquet(tmp)
    _write_commit(fs, jvm, tmp, commit_id)
    if fs.exists(path):
        fs.rename(path, old_path)
    fs.rename(tmp_path, path)
    fs.delete(old_path, True)
    return finalize_rollup(
        spark.read.parquet(state_path), metrics, histograms
    )
