"""Skew mitigation: salted joins and two-stage aggregations.

AQE's skew-join splitting (on in session.py) handles sort-merge skew at
runtime; these operators cover the cases AQE cannot:

  * salted_join — a hot key whose rows exceed one task's memory even
    after AQE splitting: left rows get a random salt in [0, factor),
    right rows replicate `factor` times, the join key becomes
    (key, salt) so one hot key spreads over `factor` tasks. Right-side
    replication bounds the cost: use for dimension-ish right sides or
    after isolating hot keys.
  * two_stage_agg — decomposable aggregation on a skewed group key:
    partial agg on (key, salt) first (map-side + spread reducers), then
    final merge on key. Equivalent results for sum/count/min/max; avg is
    composed from sum+count.
  * top_keys — cheap skew diagnosis: the heaviest group keys with counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def top_keys(df: DataFrame, key: str | list[str], k: int = 20) -> DataFrame:
    """Heaviest keys and their row counts (skew diagnosis)."""
    keys = [key] if isinstance(key, str) else list(key)
    return (
        df.groupBy(*keys).count()
        .orderBy(F.desc("count"), *keys)
        .limit(k)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt_factor: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi join with the left side's hot keys spread across
    `salt_factor` tasks. Semantics identical to `left.join(right, on,
    how)` for inner/left joins (each left row matches exactly the same
    right rows; right rows are replicated per salt, so right-outer
    semantics are NOT preserved — rejected)."""
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join preserves semantics for inner/left joins only"
        )
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = left.withColumn(
        "__salt", (F.rand(seed) * salt_factor).cast("int")
    )
    rsalt = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))),
    )
    out = lsalt.join(rsalt, on=keys + ["__salt"], how=how)
    return out.drop("__salt")


def two_stage_agg(
    df: DataFrame,
    group_by: str | list[str],
    aggregations: dict[str, list[str] | str],
    salt_factor: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-safe grouped aggregation with `{col}_{func}` output naming.

    Stage 1 aggregates on (keys..., salt) so a hot key's rows land on
    `salt_factor` reducers; stage 2 merges partials per key. Supports
    sum/count/min/max/avg (avg derived as merged sum / merged count)."""
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    norm: list[tuple[str, str]] = []
    for col, funcs in aggregations.items():
        for f in [funcs] if isinstance(funcs, str) else list(funcs):
            norm.append((col, "avg" if f == "mean" else f))
    for col, f in norm:
        if f not in ("sum", "count", "min", "max", "avg"):
            raise ValueError(f"two_stage_agg cannot decompose {f!r}")

    needs: set[tuple[str, str]] = set()
    for col, f in norm:
        if f == "avg":
            needs |= {(col, "sum"), (col, "count")}
        else:
            needs.add((col, f))

    salted = df.withColumn("__salt", (F.rand(seed) * salt_factor).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*[
        getattr(F, f)(col).alias(f"__p_{col}_{f}") for col, f in needs
    ])
    merged = partial.groupBy(*keys).agg(*[
        _MERGE[f](f"__p_{col}_{f}").alias(f"__m_{col}_{f}")
        for col, f in needs
    ])
    outputs = []
    for col, f in norm:
        if f == "avg":
            outputs.append(
                (F.col(f"__m_{col}_sum") / F.col(f"__m_{col}_count"))
                .alias(f"{col}_avg")
            )
        else:
            outputs.append(F.col(f"__m_{col}_{f}").alias(f"{col}_{f}"))
    return merged.select(*keys, *outputs)


def diagnose_skew(
    df: DataFrame,
    key: str | list[str],
    top_k: int = 10,
    rows_per_task: int = 2_000_000,
) -> DataFrame:
    """Key-distribution diagnosis BEFORE a join/agg on `key`: the top-k
    hottest keys with their row share and the salt bucket count that
    would bound each salted partition to ~rows_per_task rows — the
    detect step whose mitigate steps are salted_join / two_stage_agg.

    One groupBy + a broadcast 1-row total; share and salt are plain
    arithmetic. At 100 TB run it on a hash_sample and scale
    rows_per_task accordingly.

    Output: key cols, cnt, share, salt_buckets (1 = no salting needed).
    """
    keys = [key] if isinstance(key, str) else list(key)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "cnt",
            (F.col("cnt") / F.col("__total")).alias("share"),
            F.greatest(
                F.ceil(F.col("cnt") / F.lit(int(rows_per_task))),
                F.lit(1),
            ).cast("long").alias("salt_buckets"),
        )
        .orderBy(F.desc("cnt"), *keys)
        .limit(top_k)
    )
