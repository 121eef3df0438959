"""Pivot suite tests: margins, subtotals, normalize, multi-value naming."""

from __future__ import annotations

import pytest

from data_pipeline_framework_spark.operators import pivot_ops as P


@pytest.fixture()
def sales(spark):
    rows = [
        ("east", "A", "red", 10.0, 1),
        ("east", "A", "blue", 20.0, 2),
        ("east", "B", "red", 30.0, 3),
        ("west", "A", "red", 40.0, 4),
        ("west", "B", "blue", 50.0, 5),
        ("west", "B", "red", 60.0, 6),
    ]
    return spark.createDataFrame(
        rows, ["region", "product", "color", "amount", "qty"]
    )


def test_pivot_table_margins_all(sales):
    out = P.pivot_table(
        sales, values="amount", index="region", columns="color",
        aggfunc="sum", margins=True, fill_value=0.0,
    )
    rows = {r["region"]: r for r in out.collect()}
    assert rows["east"]["red"] == 40.0 and rows["east"]["blue"] == 20.0
    assert rows["east"]["All"] == 60.0
    assert rows["west"]["All"] == 150.0
    assert rows["All"]["red"] == 140.0
    assert rows["All"]["All"] == 210.0


def test_pivot_table_margins_mean_is_not_sum_of_cells(sales):
    out = P.pivot_table(
        sales, values="amount", index="region", columns="color",
        aggfunc="mean", margins=True,
    )
    rows = {r["region"]: r for r in out.collect()}
    # pandas-margin semantics: All = mean over the slice, not sum of cells
    assert rows["east"]["All"] == pytest.approx(20.0)  # (10+20+30)/3
    assert rows["All"]["red"] == pytest.approx(35.0)   # (10+30+40+60)/4
    assert rows["All"]["All"] == pytest.approx(35.0)   # mean of all 6


def test_pivot_multiple_values_naming(sales):
    out = P.pivot_multiple_values(
        sales, index="region", columns="color",
        values=["amount", "qty"], aggfunc="sum", fill_value=0,
    )
    assert set(out.columns) == {
        "region", "amount_red", "amount_blue", "qty_red", "qty_blue",
    }
    rows = {r["region"]: r for r in out.collect()}
    assert rows["east"]["amount_red"] == 40.0
    assert rows["east"]["qty_blue"] == 2
    assert rows["west"]["qty_red"] == 10


def test_cross_tab_counts_and_normalize(sales):
    counts = P.cross_tab(sales, "region", "color")
    rows = {r["region"]: r for r in counts.collect()}
    assert rows["east"]["red"] == 2 and rows["east"]["blue"] == 1

    norm_all = P.cross_tab(sales, "region", "color", normalize=True)
    rows = {r["region"]: r for r in norm_all.collect()}
    assert rows["east"]["red"] == pytest.approx(2 / 6)

    norm_idx = P.cross_tab(sales, "region", "color", normalize="index")
    rows = {r["region"]: r for r in norm_idx.collect()}
    assert rows["east"]["red"] == pytest.approx(2 / 3)
    assert rows["west"]["blue"] == pytest.approx(1 / 3)

    norm_col = P.cross_tab(sales, "region", "color", normalize="columns")
    rows = {r["region"]: r for r in norm_col.collect()}
    assert rows["east"]["blue"] == pytest.approx(1 / 2)


def test_cross_tab_margins(sales):
    out = P.cross_tab(sales, "region", "color", margins=True)
    rows = {r["region"]: r for r in out.collect()}
    assert rows["east"]["All"] == 3
    assert rows["All"]["red"] == 4 and rows["All"]["All"] == 6


def test_pivot_with_subtotals(sales):
    out = P.pivot_with_subtotals(
        sales, index=["region", "product"], columns="color",
        values="amount", aggfunc="sum",
    )
    rows = {(r["region"], r["product"]): r for r in out.collect()}
    assert rows[("east", "A")]["red"] == 10.0
    assert rows[("east", "Subtotal")]["red"] == 40.0
    assert rows[("east", "Subtotal")]["blue"] == 20.0
    assert rows[("west", "Subtotal")]["red"] == 100.0
    assert rows[("Grand Total", "")]["red"] == 140.0
    assert rows[("Grand Total", "")]["blue"] == 70.0


def test_dynamic_and_conditional_pivot(sales):
    dyn = P.dynamic_pivot(
        sales, index="region", columns="color", values="amount",
        max_categories=1,
    )
    # capped + sorted -> only 'blue' survives
    assert set(dyn.columns) == {"region", "blue"}

    cond = P.conditional_pivot(
        sales, index="region", columns="color", values="amount",
        condition="qty >= 3", aggfunc="sum", fill_value=0.0,
    )
    rows = {r["region"]: r for r in cond.collect()}
    assert rows["east"]["red"] == 30.0 and rows["east"]["blue"] == 0.0


def test_time_based_pivot(spark):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 5), "x", 1.0),
        (dt.datetime(2024, 1, 20), "x", 2.0),
        (dt.datetime(2024, 2, 3), "y", 4.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "k", "v"])
    out = P.time_based_pivot(df, "ts", "k", "v", period="M", aggfunc="sum")
    got = {r["period"].month: r for r in out.collect()}
    assert got[1]["x"] == 3.0 and got[1]["y"] is None
    assert got[2]["y"] == 4.0
    with pytest.raises(ValueError, match="unknown period"):
        P.time_based_pivot(df, "ts", "k", "v", period="X")


def test_pivot_summary_stats(sales):
    out = P.pivot_summary_stats(
        sales, index="region", columns="color", values="amount",
        stats=["mean", "count"],
    )
    rows = {r["region"]: r for r in out.collect()}
    assert rows["east"]["red_mean"] == 20.0
    assert rows["east"]["red_count"] == 2


def test_pivot_multiple_values_underscore_value_names(spark):
    from data_pipeline_framework_spark.operators.pivot_ops import (
        pivot_multiple_values,
    )

    df = spark.createDataFrame(
        [("r1", "a", 1.0, 10.0), ("r1", "b", 2.0, 20.0)],
        "id string, cat string, unit_price double, qty double",
    )
    out = pivot_multiple_values(
        df, index="id", columns="cat", values=["unit_price", "qty"]
    )
    assert sorted(c for c in out.columns if c != "id") == [
        "qty_a", "qty_b", "unit_price_a", "unit_price_b"
    ]
    r = out.first()
    assert r["unit_price_a"] == 1.0 and r["qty_b"] == 20.0
