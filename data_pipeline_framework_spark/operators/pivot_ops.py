"""Pivot suite: every reshaping variant the reference ships, one-pass on Spark.

Parity with reference transformations/pivot_operations.py:
  * pivot_table (:14-66) — multi-aggfunc, fill_value, margins ('All')
  * cross_tab (:108-166) — counts or agg, normalize all/index/columns, margins
  * pivot_multiple_values (:168-213) — `{val}_{cat}` output names
  * pivot_with_subtotals (:215-282) — 'Subtotal' rows per index prefix +
    'Grand Total'
  * dynamic_pivot (:284-339) — data-driven categories, max_categories cap
  * conditional_pivot (:341-387) — pre-filter then pivot
  * time_based_pivot (:389-435) — D/W/M/Q/Y bucketing then pivot
  * pivot_summary_stats (:437-477) — multiple stat funcs per cell

Scale design: the reference re-pivots pandas frames once per subtotal
level / margin. Here margins and subtotals come from ONE cube/rollup pass
(Catalyst's Expand), then the long grouping-set output is reshaped with a
cheap `first()` pivot over pre-aggregated cells — no second scan of the
fact table. Explicit `pivot_values` skips Spark's implicit distinct-scan
job; `dynamic_pivot` caps and sorts the collected categories so the output
schema is deterministic.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGG = {
    "mean": "avg", "average": "avg", "avg": "avg", "sum": "sum",
    "min": "min", "max": "max", "count": "count", "first": "first",
    "last": "last", "median": "median", "std": "stddev", "var": "variance",
    "nunique": "count_distinct",
}


def _listify(x) -> list:
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


def _agg_col(func: str, col: str) -> Column:
    return getattr(F, _AGG.get(func, func))(col)


def _pivot(gp, pivot_col: str, pivot_values: list | None):
    return gp.pivot(pivot_col, pivot_values) if pivot_values else gp.pivot(pivot_col)


# ---------------------------------------------------------------------------


def pivot_table(
    df: DataFrame,
    values: str | list[str],
    index: str | list[str],
    columns: str,
    aggfunc: str | list[str] | Mapping[str, str] = "mean",
    fill_value=None,
    margins: bool = False,
    margins_name: str = "All",
    pivot_values: list | None = None,
) -> DataFrame:
    """Pivot with multi-agg + margins (reference pivot_operations.py:14-66).

    margins=True computes row/column totals from the SAME single pass via
    `cube(index, columns)`: the grouping-set nulls become the margins_name
    row/column (pandas margins semantics — aggfunc over the whole slice,
    not a sum of cells), distinguished from genuine null data by
    `grouping()`.
    """
    values = _listify(values)
    index = _listify(index)
    if isinstance(aggfunc, Mapping):
        pairs = [(v, aggfunc.get(v, "mean")) for v in values]
    else:
        funcs = _listify(aggfunc)
        pairs = [(v, f) for v in values for f in funcs]
    multi = len(pairs) > 1

    def cell_name(v: str, f: str) -> str:
        # pandas flattens multi-level names as '{func}_{value}_{category}'
        # suffix order; we mirror the reference's '_'.join of levels with
        # the category LAST (reference :53-60 column flattening).
        return f"{f}_{v}" if multi else "cell"

    aggs = [
        _agg_col(f, v).alias(cell_name(v, f)) for v, f in pairs
    ]

    if not margins:
        gp = df.groupBy(*index)
        out = _pivot(gp, columns, pivot_values).agg(*aggs)
    else:
        # one Expand pass: all grouping sets of (index..., columns)
        cube = df.cube(*index, columns).agg(
            *aggs, F.grouping(columns).alias("__gcol"),
            *[F.grouping(i).alias(f"__g_{i}") for i in index],
        )
        # keep sets where each index col is either fully present or fully
        # rolled up in prefix order (pandas margins: all-index row + total)
        full = F.lit(True)
        for i in index:
            full = full & (F.col(f"__g_{i}") == 0)
        allrolled = F.lit(True)
        for i in index:
            allrolled = allrolled & (F.col(f"__g_{i}") == 1)
        cube = cube.filter(full | allrolled)
        label_index = [
            F.when(F.col(f"__g_{i}") == 1, F.lit(margins_name))
            .otherwise(F.col(i).cast("string")).alias(i)
            for i in index
        ]
        cat = (
            F.when(F.col("__gcol") == 1, F.lit(margins_name))
            .otherwise(F.col(columns).cast("string"))
            .alias(columns)
        )
        long = cube.select(
            *label_index, cat,
            *[F.col(cell_name(v, f)) for v, f in pairs],
        )
        gp = long.groupBy(*index)
        pv = _pivot(
            gp, columns,
            ([str(x) for x in pivot_values] + [margins_name]) if pivot_values else None,
        )
        out = pv.agg(*[
            F.first(cell_name(v, f)).alias(cell_name(v, f)) for v, f in pairs
        ])
    if fill_value is not None:
        out = out.fillna(fill_value)
    return out


def pivot_multiple_values(
    df: DataFrame,
    index: str | list[str],
    columns: str,
    values: list[str],
    aggfunc: str = "first",
    fill_value=None,
    pivot_values: list | None = None,
) -> DataFrame:
    """Multi-value pivot named `{val}_{cat}` (reference :168-213).

    One `groupBy().pivot().agg(f(v1), f(v2), ...)` — Spark pivots every
    value column in the same shuffle (the reference looped one pandas
    pivot per value column). Spark names cells `{cat}_{val}`; renamed to
    the reference's `{val}_{cat}`.
    """
    index = _listify(index)
    gp = df.groupBy(*index)
    out = _pivot(gp, columns, pivot_values).agg(
        *[_agg_col(aggfunc, v).alias(v) for v in values]
    )
    if len(values) > 1:
        # Spark names cells '{cat}_{val}'. Match by known value-name suffix
        # (longest first) — rpartition would split at the wrong underscore
        # whenever a value column itself contains one (e.g. 'unit_price').
        by_len = sorted(values, key=len, reverse=True)
        for c in out.columns:
            if c in index:
                continue
            for val in by_len:
                if c.endswith(f"_{val}"):
                    cat = c[: -len(val) - 1]
                    out = out.withColumnRenamed(c, f"{val}_{cat}")
                    break
    else:
        out = out.select(
            *index,
            *[F.col(c).alias(f"{values[0]}_{c}") for c in out.columns
              if c not in index],
        )
    if fill_value is not None:
        out = out.fillna(fill_value)
    return out


def cross_tab(
    df: DataFrame,
    index: str,
    columns: str,
    values: str | None = None,
    aggfunc: str = "count",
    normalize: bool | str = False,
    margins: bool = False,
    margins_name: str = "All",
    pivot_values: list | None = None,
) -> DataFrame:
    """Cross-tabulation (reference :108-166).

    Count cells by default; with `values` an aggregated cell. normalize
    in {True,'all'}: divide by grand total; 'index': by row sum;
    'columns': by column sum — computed with window sums over the pivoted
    frame (no second scan).
    """
    cell = (
        F.count(F.lit(1)).alias("cell") if values is None
        else _agg_col(aggfunc, values).alias("cell")
    )
    gp = df.groupBy(index)
    out = _pivot(gp, columns, pivot_values).agg(cell)
    cats = [c for c in out.columns if c != index]

    if normalize:
        mode = "all" if normalize is True else normalize
        zero = [F.coalesce(F.col(c), F.lit(0)).alias(c) for c in cats]
        out = out.select(index, *zero)
        if mode == "all":
            total = sum(F.sum(c) for c in cats)
            totals = out.agg(total.alias("__t"))
            out = out.crossJoin(F.broadcast(totals)).select(
                index, *[(F.col(c) / F.col("__t")).alias(c) for c in cats]
            )
        elif mode == "index":
            row_total = sum(F.coalesce(F.col(c), F.lit(0)) for c in cats)
            out = out.select(
                index, *[(F.col(c) / row_total).alias(c) for c in cats]
            )
        elif mode == "columns":
            col_totals = out.agg(
                *[F.sum(c).alias(f"__t_{c}") for c in cats]
            )
            out = out.crossJoin(F.broadcast(col_totals)).select(
                index,
                *[(F.col(c) / F.col(f"__t_{c}")).alias(c) for c in cats],
            )
        else:
            raise ValueError(f"unknown normalize mode: {normalize!r}")
        return out

    if margins:
        row_total = sum(F.coalesce(F.col(c), F.lit(0)) for c in cats)
        out = out.withColumn(margins_name, row_total)
        total_row = out.agg(
            F.lit(margins_name).alias(index),
            *[F.sum(c).alias(c) for c in cats + [margins_name]],
        )
        out = out.unionByName(
            total_row.select(F.col(index).cast("string").alias(index),
                             *cats, margins_name)
            if dict(out.dtypes)[index] == "string" else total_row
        )
    return out


def pivot_with_subtotals(
    df: DataFrame,
    index: list[str],
    columns: str,
    values: str,
    aggfunc: str = "sum",
    subtotal_label: str = "Subtotal",
    grand_total_label: str = "Grand Total",
    pivot_values: list | None = None,
) -> DataFrame:
    """Subtotal rows per index prefix + grand total (reference :215-282).

    ONE `rollup(index...)` Expand pass produces every prefix level; the
    rolled-up levels become `subtotal_label` rows and the all-null set the
    grand-total row — the reference re-ran a pandas pivot per level.
    """
    index = _listify(index)
    # cube + filter = GROUPING SETS ((i1..in,cat), (i1..in-1,cat), ..., (cat)):
    # category always concrete, index rolled up right-to-left (prefix sets).
    rolled = df.cube(*index, columns).agg(
        _agg_col(aggfunc, values).alias("cell"),
        F.grouping(columns).alias("__gcol"),
        *[F.grouping(i).alias(f"__g_{i}") for i in index],
    ).filter(F.col("__gcol") == 0)
    prefix_ok = F.lit(True)
    for left, right in zip(index, index[1:]):
        prefix_ok = prefix_ok & (F.col(f"__g_{left}") <= F.col(f"__g_{right}"))
    rolled = rolled.filter(prefix_ok)
    first_idx = index[0]
    labels = []
    for pos, i in enumerate(index):
        if pos == 0:
            lab = (
                F.when(F.col(f"__g_{i}") == 1, F.lit(grand_total_label))
                .otherwise(F.col(i).cast("string"))
            )
        else:
            lab = (
                F.when(
                    F.col(f"__g_{first_idx}") == 1, F.lit("")
                ).when(F.col(f"__g_{i}") == 1, F.lit(subtotal_label))
                .otherwise(F.col(i).cast("string"))
            )
        labels.append(lab.alias(i))
    long = rolled.select(*labels, F.col(columns), F.col("cell"))
    gp = long.groupBy(*index)
    out = _pivot(gp, columns, pivot_values).agg(F.first("cell"))
    return out.fillna(0, subset=[c for c in out.columns if c not in index])


def dynamic_pivot(
    df: DataFrame,
    index: str | list[str],
    columns: str,
    values: str,
    aggfunc: str = "sum",
    max_categories: int = 50,
    fill_value=None,
) -> DataFrame:
    """Data-driven pivot with bounded, deterministic columns
    (reference :284-339). Collects the distinct category list ONCE
    (sorted, capped at max_categories — a driver-safe scalar list even at
    100 TB) and passes it as explicit pivot values."""
    cats = [
        r[0]
        for r in df.select(F.col(columns).cast("string"))
        .where(F.col(columns).isNotNull())
        .distinct().orderBy(columns).limit(max_categories).collect()
    ]
    gp = df.groupBy(*_listify(index))
    out = gp.pivot(columns, cats).agg(_agg_col(aggfunc, values))
    if fill_value is not None:
        out = out.fillna(fill_value)
    return out


def conditional_pivot(
    df: DataFrame,
    index: str | list[str],
    columns: str,
    values: str,
    condition: str,
    aggfunc: str = "sum",
    pivot_values: list | None = None,
    fill_value=None,
) -> DataFrame:
    """Filter-then-pivot (reference :341-387); the filter is a SQL
    expression pushed into the scan by Catalyst."""
    gp = df.filter(condition).groupBy(*_listify(index))
    out = _pivot(gp, columns, pivot_values).agg(_agg_col(aggfunc, values))
    if fill_value is not None:
        out = out.fillna(fill_value)
    return out


_PERIODS = {"D": "day", "W": "week", "M": "month", "Q": "quarter", "Y": "year"}


def time_based_pivot(
    df: DataFrame,
    time_column: str,
    columns: str,
    values: str,
    period: str = "M",
    aggfunc: str = "sum",
    pivot_values: list | None = None,
) -> DataFrame:
    """Bucket timestamps to a period then pivot (reference :389-435).
    Output index column is `period` (a truncated timestamp)."""
    trunc = _PERIODS.get(period)
    if trunc is None:
        raise ValueError(f"unknown period {period!r}; use {list(_PERIODS)}")
    bucketed = df.withColumn("period", F.date_trunc(trunc, F.col(time_column)))
    gp = bucketed.groupBy("period")
    return _pivot(gp, columns, pivot_values).agg(_agg_col(aggfunc, values))


def pivot_summary_stats(
    df: DataFrame,
    index: str | list[str],
    columns: str,
    values: str,
    stats: list[str] = ("mean", "sum", "count"),
    pivot_values: list | None = None,
) -> DataFrame:
    """Pivot with several stat funcs per cell (reference :437-477);
    Spark computes all stats in one shuffle, cells named `{cat}_{stat}`."""
    gp = df.groupBy(*_listify(index))
    return _pivot(gp, columns, pivot_values).agg(
        *[_agg_col(s, values).alias(s) for s in stats]
    )
