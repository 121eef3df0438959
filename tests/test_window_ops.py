from __future__ import annotations

import pytest
from pyspark.sql import Row

from data_pipeline_framework_spark.operators import window_ops as W


@pytest.fixture(scope="module")
def series(spark):
    rows = [Row(g="a", t=i, v=float(v)) for i, v in enumerate([10, 20, 30, 40])]
    rows += [Row(g="b", t=i, v=float(v)) for i, v in enumerate([5, 15])]
    return spark.createDataFrame(rows)


def _by_key(df, col):
    return {(r.g, r.t): r[col] for r in df.collect()}


def test_row_number_rank(series):
    out = W.row_number(series, partition_by=["g"], order_by=["t"])
    got = _by_key(out, "row_number")
    assert got[("a", 0)] == 1 and got[("a", 3)] == 4 and got[("b", 1)] == 2


def test_rank_ties(spark):
    df = spark.createDataFrame(
        [Row(g="a", t=0, v=1.0), Row(g="a", t=1, v=1.0), Row(g="a", t=2, v=2.0)]
    )
    out = W.rank(df, partition_by=["g"], order_by=["v"], new_column="r")
    out = W.dense_rank(out, partition_by=["g"], order_by=["v"], new_column="dr")
    rows = sorted(out.collect(), key=lambda r: r.t)
    assert [r.r for r in rows] == [1, 1, 3]
    assert [r.dr for r in rows] == [1, 1, 2]


def test_lag_lead_defaults(series):
    out = W.lag(series, "v", periods=1, default=-1.0,
                partition_by=["g"], order_by=["t"])
    got = _by_key(out, "v_lag_1")
    assert got[("a", 0)] == -1.0 and got[("a", 1)] == 10.0
    out = W.lead(series, "v", periods=1, partition_by=["g"], order_by=["t"])
    got = _by_key(out, "v_lead_1")
    assert got[("a", 3)] is None and got[("b", 0)] == 15.0


def test_first_last_nth(series):
    out = W.first_value(series, "v", partition_by=["g"], order_by=["t"])
    out = W.last_value(out, "v", partition_by=["g"], order_by=["t"])
    out = W.nth_value(out, "v", 2, partition_by=["g"], order_by=["t"])
    got_f = _by_key(out, "v_first_value")
    got_l = _by_key(out, "v_last_value")
    got_n = _by_key(out, "v_nth_2")
    assert got_f[("a", 2)] == 10.0
    assert got_l[("a", 0)] == 40.0  # unbounded-following frame
    assert got_n[("a", 0)] is None and got_n[("a", 1)] == 20.0


def test_running_and_moving(series):
    out = W.running_sum(series, "v", partition_by=["g"], order_by=["t"])
    out = W.moving_average(out, "v", window=2, partition_by=["g"], order_by=["t"])
    got_rs = _by_key(out, "v_running_sum")
    got_ma = _by_key(out, "v_moving_avg_2")
    assert got_rs[("a", 3)] == 100.0
    assert got_ma[("a", 1)] == 15.0 and got_ma[("a", 0)] == 10.0


def test_moving_min_periods(series):
    out = W.moving_average(series, "v", window=3, min_periods=3,
                           partition_by=["g"], order_by=["t"])
    got = _by_key(out, "v_moving_avg_3")
    assert got[("a", 1)] is None and got[("a", 2)] == 20.0


def test_ntile_and_dispatch(series):
    out = W.apply_window_function(
        series, "ntile", n=2, partition_by=["g"], order_by=["t"],
        new_column="bucket")
    got = _by_key(out, "bucket")
    assert got[("a", 0)] == 1 and got[("a", 3)] == 2


def test_dispatch_windowed_agg_frame(series):
    out = W.apply_window_function(
        series, "sum", column="v", partition_by=["g"], order_by=["t"],
        rows_between=(-1, 0), new_column="s2")
    got = _by_key(out, "s2")
    assert got[("a", 2)] == 50.0


def test_unknown_function_raises(series):
    with pytest.raises(ValueError):
        W.apply_window_function(series, "nope")


def test_rank_max_matches_pandas_semantics(spark):
    """ties share the LAST rank of the tie group (pandas method='max');
    single ordering column as pandas rank requires."""
    from data_pipeline_framework_spark.operators import window_ops as W

    df = spark.createDataFrame(
        [("a", 10), ("a", 10), ("a", 20), ("a", 30), ("b", 5)],
        "g string, v int",
    )
    out = W.rank_max(df, partition_by=["g"], order_by=["v"],
                     new_column="r")
    got = sorted((r["g"], r["v"], r["r"]) for r in out.collect())
    assert got == [("a", 10, 2), ("a", 10, 2), ("a", 20, 3),
                   ("a", 30, 4), ("b", 5, 1)]
