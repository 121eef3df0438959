"""Join operators beyond Spark's built-ins: as-of join, range join.

The reference has only equi/theta joins (SURVEY §2.5); these are the
standard time-series extensions (kdb/Pandas merge_asof/DuckDB ASOF JOIN
semantics), implemented Spark-first:

  * asof_join — NOT a join at all physically: union both sides, one
    window pass per key carries the latest right-side values forward
    (backward mode) or backward (forward mode). One shuffle on the key,
    no row explosion, no range predicate for the optimizer to mis-plan.
    This is the scalable shape at 100 TB: cost is a sort within key
    partitions, identical to any windowed aggregation.
  * range_join — point-in-interval joins. With keys: equi-join + range
    filter (sort-merge). Without keys — or with huge per-key fan-in —
    the bucketed variant explodes each interval into covered time
    buckets so the join is EQUI on (key, bucket): Catalyst never falls
    back to a broadcast-nested-loop over the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance: str | float | None = None,
    right_prefix: str = "",
) -> DataFrame:
    """Pandas merge_asof / DuckDB ASOF JOIN semantics.

    For every left row, attach the right row with the same `by` keys and
    the closest `on` value at-or-before it (backward) / at-or-after it
    (forward). `tolerance` (seconds for timestamps, or a plain number)
    nulls out matches farther than the bound. Right value columns keep
    their names (prefixed if `right_prefix`); the right `on` value
    arrives as `{prefix}{on}_right`.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    by = list(by or [])
    rcols = [c for c in right.columns if c not in by and c != on]

    def rname(c: str) -> str:
        return f"{right_prefix}{c}"

    on_right = rname(f"{on}_right")
    # union both sides: left carries payload nulls, right carries values
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(rname(c))
          for c in rcols],
        F.lit(None).cast(right.schema[on].dataType).alias(on_right),
    )
    rt = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by and c != on],
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(rname(c)) for c in rcols],
        F.col(on).alias(on_right),
    ).select(*lt.columns)  # align column order
    u = lt.unionByName(rt)

    if direction == "backward":
        # right rows sort before left rows at equal ts => ties match
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = {c: F.last(rname(c), ignorenulls=True).over(w) for c in rcols}
        carried_on = F.last(on_right, ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__is_left").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carried = {c: F.first(rname(c), ignorenulls=True).over(w) for c in rcols}
        carried_on = F.first(on_right, ignorenulls=True).over(w)

    out = u.select(
        *[F.col(c) for c in left.columns],
        F.col("__is_left"),
        *[carried[c].alias(rname(c)) for c in rcols],
        carried_on.alias(on_right),
    ).filter(F.col("__is_left") == 1).drop("__is_left")

    if tolerance is not None:
        on_type = left.schema[on].dataType.typeName()
        if on_type in ("timestamp", "timestamp_ntz"):
            gap = F.abs(
                F.col(on).cast("double") - F.col(on_right).cast("double")
            )
            bound = F.lit(float(tolerance))
        else:
            gap = F.abs(F.col(on) - F.col(on_right))
            bound = F.lit(tolerance)
        keep = gap <= bound
        out = out.select(
            *[F.col(c) for c in left.columns],
            *[F.when(keep, F.col(rname(c))).alias(rname(c)) for c in rcols],
            F.when(keep, F.col(on_right)).alias(on_right),
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lower: str,
    upper: str,
    by: list[str] | None = None,
    how: str = "inner",
    bucket_width: float | None = None,
) -> DataFrame:
    """Point-in-interval join: left.point in [right.lower, right.upper).

    With `by` keys the plan is an equi join plus range filter (sort-merge,
    no cartesian risk). `bucket_width` switches to the bucketed strategy:
    intervals explode into the buckets they cover and the join becomes
    equi on (keys..., bucket) — use when there are no keys (avoiding a
    broadcast-nested-loop) or when single keys span too many rows.
    Bucketed mode requires numeric/epoch columns and bounded interval
    width; pick bucket_width near the median interval length.
    """
    by = list(by or [])
    cond = (F.col(point) >= F.col(lower)) & (F.col(point) < F.col(upper))
    if bucket_width is None:
        if by:
            return left.join(right, on=by, how=how).filter(cond)
        return left.join(right, cond, how=how)

    bw = float(bucket_width)

    def bucket(col: Column) -> Column:
        return F.floor(col.cast("double") / bw).cast("long")

    lb = left.withColumn("__b", bucket(F.col(point)))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(bucket(F.col(lower)), bucket(F.col(upper))),
        ),
    )
    out = lb.join(rb, on=by + ["__b"], how="inner").filter(cond).drop("__b")
    return out
