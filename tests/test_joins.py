"""As-of join and range join semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from data_pipeline_framework_spark.operators.joins import asof_join, range_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            ("AAPL", _ts(9, 31), 100),
            ("AAPL", _ts(10, 0), 200),
            ("MSFT", _ts(9, 35), 300),
            ("MSFT", _ts(9, 29), 50),  # before any quote
        ],
        "sym string, ts timestamp, qty int",
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("AAPL", _ts(9, 30), 185.0),
            ("AAPL", _ts(9, 45), 186.5),
            ("MSFT", _ts(9, 30), 402.0),
        ],
        "sym string, ts timestamp, px float",
    )


def test_asof_backward(trades, quotes):
    out = asof_join(trades, quotes, on="ts", by=["sym"]).orderBy("sym", "ts")
    rows = out.collect()
    got = {(r["sym"], r["ts"].minute): (r["px"], r["ts_right"]) for r in rows}
    assert got[("AAPL", 31)][0] == 185.0
    assert got[("AAPL", 0)][0] == 186.5   # 10:00 -> latest quote 9:45
    assert got[("MSFT", 35)][0] == 402.0
    assert got[("MSFT", 29)] == (None, None)  # no quote yet


def test_asof_tie_matches_equal_timestamp(spark):
    left = spark.createDataFrame([("k", 10, "L")], "k string, t int, l string")
    right = spark.createDataFrame([("k", 10, "R")], "k string, t int, v string")
    out = asof_join(left, right, on="t", by=["k"]).first()
    assert out["v"] == "R" and out["t_right"] == 10


def test_asof_forward_and_tolerance(trades, quotes):
    fwd = asof_join(trades, quotes, on="ts", by=["sym"], direction="forward")
    got = {(r["sym"], r["ts"].minute): r["px"] for r in fwd.collect()}
    assert got[("MSFT", 29)] == 402.0       # next quote at 9:30
    assert got[("AAPL", 0)] is None          # nothing after 10:00

    tol = asof_join(trades, quotes, on="ts", by=["sym"],
                    tolerance=5 * 60)  # 5 minutes
    got = {(r["sym"], r["ts"].minute): r["px"] for r in tol.collect()}
    assert got[("AAPL", 31)] == 185.0        # 1 min gap kept
    assert got[("AAPL", 0)] is None          # 15 min gap nulled


def test_asof_right_prefix(trades, quotes):
    out = asof_join(trades, quotes, on="ts", by=["sym"], right_prefix="q_")
    assert {"q_px", "q_ts_right"} <= set(out.columns)


def test_range_join_keyed(spark):
    events = spark.createDataFrame(
        [("a", 5.0), ("a", 15.0), ("b", 5.0)], "k string, x double"
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0, "lo"), ("a", 10.0, 20.0, "hi"),
         ("b", 100.0, 200.0, "out")],
        "k string, lo double, hi double, label string",
    )
    out = range_join(events, intervals, point="x", lower="lo", upper="hi",
                     by=["k"])
    got = {(r["k"], r["x"]): r["label"] for r in out.collect()}
    assert got == {("a", 5.0): "lo", ("a", 15.0): "hi"}


def test_range_join_bucketed_matches_plain(spark):
    import random

    rng = random.Random(7)
    pts = [(float(rng.randrange(0, 1000)),) for _ in range(300)]
    ivs = [
        (s, s + rng.randrange(1, 50), i)
        for i, s in enumerate(
            float(rng.randrange(0, 1000)) for _ in range(40)
        )
    ]
    points = spark.createDataFrame(pts, "x double")
    intervals = spark.createDataFrame(ivs, "lo double, hi double, iid long")
    plain = range_join(points, intervals, "x", "lo", "hi")
    bucketed = range_join(points, intervals, "x", "lo", "hi",
                          bucket_width=25.0)
    key = lambda r: (r["x"], r["iid"])
    assert sorted(map(key, plain.collect())) == \
        sorted(map(key, bucketed.collect()))
    # bucketed plan must be an equi join, not nested-loop
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan

def test_asof_null_payload_comes_from_matched_row(spark):
    """The matched right row's own NULLs must be attached, not backfilled
    from an older right row (pandas merge_asof / DuckDB ASOF semantics)."""
    left = spark.createDataFrame([("k", 30, "L")], "k string, t int, l string")
    right = spark.createDataFrame(
        [("k", 10, 1.0, "old"), ("k", 20, None, "new")],
        "k string, t int, v double, tag string",
    )
    out = asof_join(left, right, on="t", by=["k"]).first()
    assert out["t_right"] == 20 and out["tag"] == "new"
    assert out["v"] is None  # NOT 1.0 from the older row


def test_range_join_left_outer_keeps_unmatched(spark):
    events = spark.createDataFrame(
        [("a", 5.0), ("a", 95.0), ("b", 5.0)], "k string, x double"
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0, "lo"), ("b", 100.0, 200.0, "out")],
        "k string, lo double, hi double, label string",
    )
    out = range_join(events, intervals, "x", "lo", "hi", by=["k"], how="left")
    got = {(r["k"], r["x"]): r["label"] for r in out.collect()}
    assert got == {("a", 5.0): "lo", ("a", 95.0): None, ("b", 5.0): None}

    semi = range_join(events, intervals, "x", "lo", "hi", by=["k"],
                      how="left_semi")
    assert {(r["k"], r["x"]) for r in semi.collect()} == {("a", 5.0)}
    assert semi.columns == ["k", "x"]


def test_range_join_bucketed_left_matches_plain(spark):
    events = spark.createDataFrame(
        [(5.0,), (42.0,), (999.0,), (42.0,)], "x double"  # dup left row
    )
    intervals = spark.createDataFrame(
        [(0.0, 10.0, 1), (40.0, 50.0, 2)], "lo double, hi double, iid long"
    )
    plain = range_join(events, intervals, "x", "lo", "hi", how="left")
    bucketed = range_join(events, intervals, "x", "lo", "hi", how="left",
                          bucket_width=20.0)
    key = lambda r: (r["x"], r["iid"])
    assert sorted(map(key, plain.collect()), key=str) == \
        sorted(map(key, bucketed.collect()), key=str)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        range_join(events, intervals, "x", "lo", "hi", how="full",
                   bucket_width=20.0)
