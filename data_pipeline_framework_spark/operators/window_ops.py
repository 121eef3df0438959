"""Window-function library (reference transformations/window_functions.py).

Every function appends one column to the frame and returns it — the
reference's WindowFunctions class surface, re-expressed as pyspark.sql.Window
specs. All execute as a single window exchange per distinct (partition,
order, frame) spec; Catalyst collapses adjacent window ops sharing a spec.

Scale note: an un-partitioned window (`partition_by=[]`) funnels all rows
through ONE task. The reference's pandas library had the same single-node
semantics implicitly; here callers must opt in, and the docstring of each
entry point warns. Prefer a partition key at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _spec(
    partition_by: list[str] | None,
    order_by: list[str] | None,
    descending: bool | list[bool] = False,
) -> WindowSpec:
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    if order_by:
        if isinstance(descending, bool):
            descending = [descending] * len(order_by)
        cols = [
            F.desc(c) if d else F.asc(c) for c, d in zip(order_by, descending)
        ]
        w = w.orderBy(*cols)
    return w


def _ranked(fn_factory: Callable[[], Column], name: str):
    def impl(
        df: DataFrame,
        partition_by: list[str] | None = None,
        order_by: list[str] | None = None,
        new_column: str | None = None,
        descending: bool | list[bool] = False,
        **_,
    ) -> DataFrame:
        w = _spec(partition_by, order_by, descending)
        return df.withColumn(new_column or name, fn_factory().over(w))

    return impl


# ranking family (reference window_functions.py:15-115, 363-384)
row_number = _ranked(F.row_number, "row_number")
rank = _ranked(F.rank, "rank")
dense_rank = _ranked(F.dense_rank, "dense_rank")
percent_rank = _ranked(F.percent_rank, "percent_rank")
cume_dist = _ranked(F.cume_dist, "cume_dist")


def rank_max(
    df: DataFrame,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    new_column: str | None = None,
    descending: bool | list[bool] = False,
    **_,
) -> DataFrame:
    """pandas rank(method='max'): ties get the LAST rank of their tie group.
    SQL has no direct twin (reference window_functions.py:38-55); count of
    rows ordered <= current over a RANGE frame gives exactly that."""
    from pyspark.sql import Window as W

    w = _spec(partition_by, order_by, descending).rangeBetween(
        W.unboundedPreceding, W.currentRow
    )
    return df.withColumn(
        new_column or "rank_max", F.count(F.lit(1)).over(w)
    )


def ntile(
    df: DataFrame,
    n: int,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    new_column: str = "ntile",
    descending: bool | list[bool] = False,
    **_,
) -> DataFrame:
    """n-quantile bucket 1..n (reference window_functions.py:95-115; the
    reference used pd.qcut over ranks — F.ntile is the SQL-standard twin)."""
    w = _spec(partition_by, order_by, descending)
    return df.withColumn(new_column, F.ntile(int(n)).over(w))


def lag(
    df: DataFrame,
    column: str,
    periods: int = 1,
    default=None,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    new_column: str | None = None,
    **_,
) -> DataFrame:
    """reference window_functions.py:117-148; output `{col}_lag_{k}`."""
    w = _spec(partition_by, order_by)
    name = new_column or f"{column}_lag_{periods}"
    return df.withColumn(name, F.lag(column, int(periods), default).over(w))


def lead(
    df: DataFrame,
    column: str,
    periods: int = 1,
    default=None,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    new_column: str | None = None,
    **_,
) -> DataFrame:
    """reference window_functions.py:150-168; output `{col}_lead_{k}`."""
    w = _spec(partition_by, order_by)
    name = new_column or f"{column}_lead_{periods}"
    return df.withColumn(name, F.lead(column, int(periods), default).over(w))


def first_value(
    df: DataFrame,
    column: str,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    new_column: str | None = None,
    **_,
) -> DataFrame:
    w = _spec(partition_by, order_by)
    return df.withColumn(
        new_column or f"{column}_first_value", F.first(column).over(w)
    )


def last_value(
    df: DataFrame,
    column: str,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    new_column: str | None = None,
    **_,
) -> DataFrame:
    """Whole-partition last value — frame must extend to unbounded following
    (reference window_functions.py:195-218)."""
    w = _spec(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return df.withColumn(
        new_column or f"{column}_last_value", F.last(column).over(w)
    )


def nth_value(
    df: DataFrame,
    column: str,
    n: int,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    new_column: str | None = None,
    **_,
) -> DataFrame:
    w = _spec(partition_by, order_by)
    return df.withColumn(
        new_column or f"{column}_nth_{n}", F.nth_value(column, int(n)).over(w)
    )


def running_sum(
    df: DataFrame,
    column: str,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    new_column: str | None = None,
    **_,
) -> DataFrame:
    """reference window_functions.py:253-276; output `{col}_running_sum`."""
    w = _spec(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(new_column or f"{column}_running_sum", F.sum(column).over(w))


def running_average(
    df: DataFrame,
    column: str,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    new_column: str | None = None,
    **_,
) -> DataFrame:
    w = _spec(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        new_column or f"{column}_running_avg", F.avg(column).over(w)
    )


def _moving(agg, suffix: str):
    def impl(
        df: DataFrame,
        column: str,
        window: int,
        min_periods: int = 1,
        partition_by: list[str] | None = None,
        order_by: list[str] | None = None,
        new_column: str | None = None,
        **_,
    ) -> DataFrame:
        """Trailing row-frame stat over `window` rows; rows with fewer than
        `min_periods` observations yield NULL (pandas rolling semantics,
        reference window_functions.py:303-361)."""
        w = _spec(partition_by, order_by).rowsBetween(-(int(window) - 1), 0)
        name = new_column or f"{column}_{suffix}_{window}"
        value = agg(column).over(w)
        if min_periods > 1:
            value = F.when(F.count(column).over(w) >= int(min_periods), value)
        return df.withColumn(name, value)

    return impl


moving_average = _moving(F.avg, "moving_avg")
moving_sum = _moving(F.sum, "moving_sum")


WINDOW_FUNCTIONS = {
    "row_number": row_number,
    "rank": rank,
    "dense_rank": dense_rank,
    "percent_rank": percent_rank,
    "cume_dist": cume_dist,
    "rank_max": rank_max,
    "ntile": ntile,
    "lag": lag,
    "lead": lead,
    "first_value": first_value,
    "last_value": last_value,
    "nth_value": nth_value,
    "running_sum": running_sum,
    "running_average": running_average,
    "moving_average": moving_average,
    "moving_sum": moving_sum,
}

_WINDOWED_AGGS = {"sum", "avg", "mean", "count", "min", "max"}


def apply_window_function(
    df: DataFrame,
    function: str,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    column: str | None = None,
    new_column: str | None = None,
    rows_between: tuple[int, int] | None = None,
    range_between: tuple[int, int] | None = None,
    **kwargs,
) -> DataFrame:
    """Name-dispatch entry (reference window_functions.py:386-435 and the
    Spark engine's window op, spark_processor.py:225-265). Also accepts a
    plain agg name (sum/avg/count/min/max) with an explicit frame spec."""
    if function in WINDOW_FUNCTIONS:
        fn = WINDOW_FUNCTIONS[function]
        if column is not None:
            return fn(
                df,
                column=column,
                partition_by=partition_by,
                order_by=order_by,
                new_column=new_column,
                **kwargs,
            )
        return fn(
            df,
            partition_by=partition_by,
            order_by=order_by,
            new_column=new_column,
            **kwargs,
        )

    if function in _WINDOWED_AGGS:
        w = _spec(partition_by, order_by)
        if rows_between is not None:
            lo, hi = rows_between
            w = w.rowsBetween(
                Window.unboundedPreceding if lo is None else int(lo),
                Window.unboundedFollowing if hi is None else int(hi),
            )
        elif range_between is not None:
            lo, hi = range_between
            w = w.rangeBetween(
                Window.unboundedPreceding if lo is None else int(lo),
                Window.unboundedFollowing if hi is None else int(hi),
            )
        name = new_column or f"{column}_{function}"
        spark_fn = "avg" if function == "mean" else function
        return df.withColumn(name, getattr(F, spark_fn)(column).over(w))

    raise ValueError(f"unsupported window function: {function!r}")
