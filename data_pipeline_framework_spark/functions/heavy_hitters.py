"""Bounded-state heavy hitters: distributed Misra-Gries summaries.

At 100 TB the exact "top domains / top tokens / top users" table first
materializes EVERY distinct key through a shuffle — billions of rows of
state for an answer that only needs the head of the distribution. A
Misra-Gries summary caps the state at ``capacity`` counters per group
with the classic deterministic guarantee

    cnt <= true_count <= cnt + err        (per retained key)

and every key whose true count exceeds N / (capacity + 1) is retained
(it cannot be fully decremented away). No randomness, no seeds.

Distributed shape (the mergeable-summaries construction):

1. ``mapInPandas`` builds one bounded summary PER PARTITION — a dict of
   at most ``capacity`` counters, compacted by subtracting the
   (capacity+1)-th largest count whenever it overflows (the batched
   equivalent of Misra-Gries' decrement-all). Zero shuffle, state
   bounded regardless of key cardinality.
2. One groupBy over <= capacity * partitions rows sums the per-partition
   lower-bound counts; per-partition decrement totals (the error
   budget) are summed per group from one sentinel row per partition.
3. A final per-group compaction (window rank) re-caps the merged
   summary at ``capacity`` counters.

``merge_heavy_hitters`` composes two finished summaries the same way,
so per-day / per-corpus-slice summaries roll up without re-scanning
history — the same algebra as operators/rollup.py states.

The reference has no bounded-state frequency operator (its value_counts
paths materialize full cardinality, processors/pandas_processor.py);
this is a scale-path addition (SURVEY §7.2 step 10) alongside the
CMS/HLL sketch tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["heavy_hitters", "merge_heavy_hitters", "top_k"]


def _partition_summaries(df: DataFrame, key_col: str, capacity: int,
                         group_cols: list[str]) -> DataFrame:
    """Per-partition Misra-Gries summaries via mapInPandas: rows
    (groups..., key, cnt, off) — at most ``capacity`` keyed rows plus
    one NULL-key sentinel per (partition, group) carrying that
    partition's total decrement ``off`` (needed even when every key of
    the group was compacted away)."""
    import pandas as pd

    # output schema mirrors the input group/key column types
    struct = []
    for g in group_cols:
        struct.append(f"`{g}` {df.schema[g].dataType.simpleString()}")
    struct.append(f"`{key_col}` {df.schema[key_col].dataType.simpleString()}")
    struct.append("`__cnt` bigint")
    struct.append("`__off` bigint")
    out_schema = ", ".join(struct)

    gcols = list(group_cols)
    kcol = key_col
    cap = int(capacity)

    def summarize(batches):
        state: dict = {}  # group tuple -> (counts dict, off)

        def compact(counts: dict, off: int) -> int:
            if len(counts) <= cap:
                return off
            # subtract the (cap+1)-th largest count from everyone,
            # drop the non-positive — batched Misra-Gries decrement
            t = sorted(counts.values(), reverse=True)[cap]
            for k in list(counts):
                c = counts[k] - t
                if c > 0:
                    counts[k] = c
                else:
                    del counts[k]
            return off + t

        for pdf in batches:
            cols = gcols + [kcol]
            grouped = pdf.groupby(cols, dropna=False, sort=False).size()
            for idx, n in grouped.items():
                row = idx if isinstance(idx, tuple) else (idx,)
                g, k = tuple(row[:-1]), row[-1]
                counts, off = state.setdefault(g, ({}, 0))
                counts[k] = counts.get(k, 0) + int(n)
                state[g] = (counts, compact(counts, off))
        rows = []
        for g, (counts, off) in state.items():
            rows.append(g + (None, 0, off))  # sentinel: group's decrement
            for k, c in counts.items():
                rows.append(g + (k, c, 0))
        yield pd.DataFrame(
            rows, columns=gcols + [kcol, "__cnt", "__off"]
        )

    return df.select(*gcols, kcol).mapInPandas(summarize, out_schema)


def _compact_state(state: DataFrame, key_col: str, capacity: int,
                   group_cols: list[str]) -> DataFrame:
    """Re-cap a merged (groups, key, __cnt, __err) table at ``capacity``
    counters per group: subtract the (capacity+1)-th largest count,
    drop non-positive, fold the subtraction into the error budget."""
    w = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    ranked = state.withColumn(
        "__rk",
        F.row_number().over(
            w.orderBy(F.col("__cnt").desc(), F.col(key_col).asc_nulls_last())
        ),
    )
    thresh = ranked.withColumn(
        "__t",
        F.max(F.when(F.col("__rk") == capacity + 1, F.col("__cnt"))).over(w),
    ).withColumn("__t", F.coalesce("__t", F.lit(0)))
    return (
        thresh.withColumn("__cnt", F.col("__cnt") - F.col("__t"))
        .withColumn("__err", F.col("__err") + F.col("__t"))
        .filter(F.col("__cnt") > 0)
        .drop("__rk", "__t")
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    capacity: int = 1024,
    group_cols: list[str] | str | None = None,
    engine: str = "auto",
) -> DataFrame:
    """Bounded-state frequency summary: (groups..., key, cnt, err) with
    cnt <= true count <= cnt + err, at most ``capacity`` keys per group,
    and guaranteed retention of every key with true count >
    N_group / (capacity + 1). ``err`` is the group-level error budget
    (total decrements), constant within a group.

    When ``capacity`` exceeds the distinct-key count everywhere, no
    compaction ever fires, err == 0 and the summary IS the exact count
    table — which is how the oracle query checks this end-to-end.

    Engines:
    * ``exact`` — plain JVM groupBy().count() + one compaction window.
      In the exact regime (distinct keys <= capacity per group) this
      returns the IDENTICAL summary for ~5x less than the Python
      summary path (no Arrow batches, no per-partition Python state);
      above capacity it still returns a valid summary but materializes
      full key cardinality through the shuffle — the thing Misra-Gries
      exists to avoid.
    * ``mg`` — bounded-state per-partition Misra-Gries summaries
      (mapInPandas), the 100 TB path: shuffle volume is capped at
      capacity * partitions rows regardless of key cardinality.
    * ``auto`` (default) — one cheap approx_count_distinct probe (a
      partial-aggregated scan, no wide shuffle) picks ``exact`` when
      the largest per-group estimate fits ``capacity``, else ``mg``.
      The probe is a FULL extra pass over the input (cheap relative to
      the Python summary path it can save, but real): on corpora where
      you already know the cardinality regime, pass ``engine="mg"``
      (or ``"exact"``) explicitly and skip it."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if engine not in ("auto", "mg", "exact"):
        raise ValueError(f"unknown engine: {engine!r}")
    groups = (
        [group_cols] if isinstance(group_cols, str)
        else list(group_cols or [])
    )
    if engine == "auto":
        probe = (
            df.groupBy(*groups)
            .agg(F.approx_count_distinct(key_col).alias("__d"))
            .agg(F.max("__d").alias("__m"))
            .collect()
        )
        est = probe[0]["__m"] if probe else None
        engine = "exact" if (est or 0) <= capacity else "mg"
    if engine == "exact":
        state = (
            df.groupBy(*groups, key_col)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .withColumn("__err", F.lit(0).cast("long"))
        )
        out = _compact_state(state, key_col, capacity, groups)
        return out.select(
            *groups, key_col,
            F.col("__cnt").alias("cnt"), F.col("__err").alias("err"),
        )
    # NOTE: no repartition here — per-row work is a cheap count, and
    # widening the scan inflates the merged summary (capacity x
    # partitions rows through the compaction window) for no CPU win;
    # measured slower at sf0.1 (1.26 s -> 1.98 s)
    parts = _partition_summaries(df, key_col, capacity, groups)
    # per-group error budget: each partition contributed one sentinel
    # row (key NULL) carrying its decrement total
    err = (
        parts.filter(F.col(key_col).isNull())
        .groupBy(*groups).agg(F.sum("__off").alias("__err"))
    )
    cnts = (
        parts.filter(F.col(key_col).isNotNull())
        .groupBy(*groups, key_col).agg(F.sum("__cnt").alias("__cnt"))
    )
    if groups:
        state = cnts.join(F.broadcast(err), on=groups, how="left")
    else:
        state = cnts.crossJoin(F.broadcast(err))
    state = state.withColumn("__err", F.coalesce("__err", F.lit(0)))
    out = _compact_state(state, key_col, capacity, groups)
    return out.select(
        *groups, key_col,
        F.col("__cnt").alias("cnt"), F.col("__err").alias("err"),
    )


def merge_heavy_hitters(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    capacity: int,
    group_cols: list[str] | str | None = None,
) -> DataFrame:
    """Merge two finished summaries (per-day slices, per-corpus shards):
    keywise count sum + per-group error-budget sum, then one compaction.
    A key absent from one summary truly occurred at most ``err`` times
    there, so the merged bound cnt <= true <= cnt + err still holds —
    summaries compose associatively like the rollup states."""
    groups = (
        [group_cols] if isinstance(group_cols, str)
        else list(group_cols or [])
    )

    def split(s):
        e = s.groupBy(*groups).agg(F.max("err").alias("e"))
        return s.select(*groups, key_col, "cnt"), e

    ca, ea = split(a)
    cb, eb = split(b)
    cnts = (
        ca.unionByName(cb)
        .groupBy(*groups, key_col).agg(F.sum("cnt").alias("__cnt"))
    )
    if groups:
        err = (
            ea.withColumnRenamed("e", "ea")
            .join(eb.withColumnRenamed("e", "eb"), on=groups, how="full")
        )
        err = err.select(
            *groups,
            (F.coalesce("ea", F.lit(0)) + F.coalesce("eb", F.lit(0)))
            .alias("__err"),
        )
        state = cnts.join(F.broadcast(err), on=groups, how="left")
        state = state.withColumn("__err", F.coalesce("__err", F.lit(0)))
    else:
        err = ea.withColumnRenamed("e", "ea").crossJoin(
            eb.withColumnRenamed("e", "eb")
        ).select(
            (F.coalesce("ea", F.lit(0)) + F.coalesce("eb", F.lit(0)))
            .alias("__err")
        )
        state = cnts.crossJoin(F.broadcast(err))
    out = _compact_state(state, key_col, capacity, groups)
    return out.select(
        *groups, key_col,
        F.col("__cnt").alias("cnt"), F.col("__err").alias("err"),
    )


def top_k(
    summary: DataFrame,
    key_col: str,
    k: int,
    group_cols: list[str] | str | None = None,
) -> DataFrame:
    """Deterministic top-k from a summary: count desc, key asc tie-break
    (rank over <= capacity rows per group — trivial window)."""
    groups = (
        [group_cols] if isinstance(group_cols, str)
        else list(group_cols or [])
    )
    w = (Window.partitionBy(*groups) if groups else Window.partitionBy()) \
        .orderBy(F.col("cnt").desc(), F.col(key_col).asc())
    return (
        summary.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
