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
from pyspark.sql import types as T


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
    # union both sides: left carries a NULL payload struct, right rows carry
    # ONE struct of all payload columns + the right `on` value. Carrying a
    # single struct (not each column independently) guarantees every
    # attached value comes from the SAME matched right row — including that
    # row's own NULLs (pandas merge_asof / DuckDB ASOF JOIN semantics; a
    # per-column last(ignorenulls) would backfill NULL payload fields from
    # older rows and could mix rows).
    pay_type = T.StructType(
        [T.StructField(rname(c), right.schema[c].dataType) for c in rcols]
        + [T.StructField(on_right, right.schema[on].dataType)]
    )
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(pay_type).alias("__rpay"),
    )
    rt = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by and c != on],
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__is_left"),
        F.struct(
            *[F.col(c).alias(rname(c)) for c in rcols],
            F.col(on).alias(on_right),
        ).alias("__rpay"),
    ).select(*lt.columns)  # align column order
    u = lt.unionByName(rt)

    if direction == "backward":
        # right rows sort before left rows at equal ts => ties match
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried_pay = F.last("__rpay", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__is_left").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carried_pay = F.first("__rpay", ignorenulls=True).over(w)

    out = u.select(
        *[F.col(c) for c in left.columns],
        F.col("__is_left"),
        *[carried_pay.getField(rname(c)).alias(rname(c)) for c in rcols],
        carried_pay.getField(on_right).alias(on_right),
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
            if how == "inner":
                return left.join(right, on=by, how=how).filter(cond)
            # Non-inner: the range predicate must live IN the join condition
            # (a post-join filter would drop the null-extended rows and
            # silently degrade to inner). Rename right keys so the output
            # keeps single key columns.
            r2 = right
            for k in by:
                r2 = r2.withColumnRenamed(k, f"__r_{k}")
            jcond = cond
            for k in by:
                jcond = (F.col(k) == F.col(f"__r_{k}")) & jcond
            out = left.join(r2, jcond, how=how)
            if how in ("semi", "left_semi", "leftsemi",
                       "anti", "left_anti", "leftanti"):
                return out  # left columns only; no right keys to merge
            for k in by:
                out = out.withColumn(
                    k, F.coalesce(F.col(k), F.col(f"__r_{k}"))
                ).drop(f"__r_{k}")
            return out
        return left.join(right, cond, how=how)

    bw = float(bucket_width)
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"bucketed range_join supports how='inner'/'left', got {how!r}"
        )

    def bucket(col: Column) -> Column:
        return F.floor(col.cast("double") / bw).cast("long")

    lb = left.withColumn("__b", bucket(F.col(point)))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(bucket(F.col(lower)), bucket(F.col(upper))),
        ),
    )
    inner = lb.join(rb, on=by + ["__b"], how="inner").filter(cond).drop("__b")
    if how == "inner":
        return inner
    # left outer: re-add left rows that matched no interval, null-extended.
    # Row identity comes from a transient id so duplicate left rows survive.
    lid = left.withColumn("__lid", F.monotonically_increasing_id())
    lb = lid.withColumn("__b", bucket(F.col(point)))
    matched = lb.join(rb, on=by + ["__b"], how="inner").filter(cond).drop("__b")
    unmatched = lid.join(
        matched.select("__lid").distinct(), on="__lid", how="left_anti"
    )
    rextra = [c for c in matched.columns if c not in lid.columns]
    for c in rextra:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(matched.schema[c].dataType)
        )
    return matched.unionByName(unmatched).drop("__lid")
