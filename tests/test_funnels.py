"""Ordered funnel and cohort retention operators."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark.operators.funnels import (
    cohort_retention,
    funnel_conversion,
    funnel_stages,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(uid, minutes, etype):
    return (uid, T0 + dt.timedelta(minutes=minutes), etype)


@pytest.fixture()
def events(spark):
    rows = [
        # user 1 completes view -> click -> purchase in order
        _ev(1, 0, "view"), _ev(1, 5, "click"), _ev(1, 10, "purchase"),
        # user 2: click before view — only the view counts (stage 1)
        _ev(2, 0, "click"), _ev(2, 5, "view"),
        # user 3: view then purchase (skips click) -> stage 1
        _ev(3, 0, "view"), _ev(3, 5, "purchase"),
        # user 4: full funnel but purchase arrives 2h after view
        _ev(4, 0, "view"), _ev(4, 3, "click"), _ev(4, 120, "purchase"),
        # user 5: no step events at all (filtered out pre-shuffle)
        _ev(5, 0, "error"),
        # user 6: out-of-order duplicates; chain = earliest valid
        _ev(6, 10, "view"), _ev(6, 2, "view"), _ev(6, 6, "click"),
        _ev(6, 12, "click"), _ev(6, 11, "purchase"), _ev(6, 30, "purchase"),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


STEPS = ["view", "click", "purchase"]


def _minchain_ref(rows, steps, within=None):
    """Plain-python min-chain funnel reference."""
    by_user = {}
    for uid, ts, et in rows:
        by_user.setdefault(uid, []).append((ts, et))
    out = {}
    for uid, evs in by_user.items():
        if not any(et in steps for _, et in evs):
            continue
        t_prev, t0, stage = None, None, 0
        for k, step in enumerate(steps):
            cand = [
                ts for ts, et in evs
                if et == step
                and (t_prev is None or ts > t_prev)
                and (within is None or k == 0 or
                     (ts - t_prev).total_seconds() <= within)
            ]
            if not cand:
                break
            t_prev = min(cand)
            if k == 0:
                t0 = t_prev
            stage = k + 1
        out[uid] = stage
    return out


def test_funnel_stages_matches_minchain(spark, events):
    rows = [(r["user_id"], r["ts"], r["event_type"]) for r in events.collect()]
    got = {
        r["user_id"]: r["stages_completed"]
        for r in funnel_stages(events, STEPS).collect()
    }
    assert got == _minchain_ref(rows, STEPS)
    # known values pin the semantics
    assert got[1] == 3 and got[2] == 1 and got[3] == 1 and got[4] == 3
    assert 5 not in got  # no step events -> filtered before the shuffle
    # user 6: chain view@2 -> click@6 -> purchase@11
    assert got[6] == 3


def test_funnel_within_window(spark, events):
    rows = [(r["user_id"], r["ts"], r["event_type"]) for r in events.collect()]
    got = {
        r["user_id"]: r["stages_completed"]
        for r in funnel_stages(events, STEPS, within_seconds=3600).collect()
    }
    assert got == _minchain_ref(rows, STEPS, within=3600)
    assert got[4] == 2  # purchase at +120min falls outside the hour
    assert got[1] == 3


def test_funnel_completion_timestamps(spark, events):
    out = {r["user_id"]: r for r in funnel_stages(events, STEPS).collect()}
    assert out[1]["step1_ts"] == T0
    assert out[1]["completed_ts"] == T0 + dt.timedelta(minutes=10)
    assert out[3]["completed_ts"] is None
    assert out[6]["step1_ts"] == T0 + dt.timedelta(minutes=2)


def test_funnel_strict_tie_semantics(spark):
    # click at exactly the view timestamp does NOT advance (ts > t_prev)
    rows = [
        (1, T0, "view"), (1, T0, "click"),
        (2, T0, "view"), (2, T0 + dt.timedelta(seconds=1), "click"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r["user_id"]: r["stages_completed"]
        for r in funnel_stages(df, ["view", "click"]).collect()
    }
    assert got == {1: 1, 2: 2}


def test_funnel_repeated_step_types(spark):
    rows = [
        (1, T0, "view"),
        (2, T0, "view"), (2, T0 + dt.timedelta(seconds=5), "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r["user_id"]: r["stages_completed"]
        for r in funnel_stages(df, ["view", "view"]).collect()
    }
    assert got == {1: 1, 2: 2}


def test_funnel_conversion_counts(spark, events):
    out = {
        r["step"]: r for r in funnel_conversion(events, STEPS).collect()
    }
    # stage >= 1: users 1,2,3,4,6 ; >= 2: 1,4,6 ; >= 3: 1,4,6
    assert out[1]["users"] == 5
    assert out[2]["users"] == 3
    assert out[3]["users"] == 3
    assert out[1]["conversion"] == pytest.approx(1.0)
    assert out[3]["conversion"] == pytest.approx(3 / 5)
    assert out[2]["step_name"] == "click"


def test_funnel_conversion_emits_zero_rows(spark, events):
    out = {
        r["step"]: r
        for r in funnel_conversion(
            events, ["view", "click", "refund"]
        ).collect()
    }
    assert out[3]["users"] == 0
    assert out[3]["conversion"] == pytest.approx(0.0)
    assert out[3]["step_name"] == "refund"


def test_cohort_retention_weekly(spark):
    rows = []
    # cohort A: users 1,2 first seen week of Jan 1; user 1 returns wk+1
    rows += [(1, T0, "view"), (2, T0 + dt.timedelta(days=1), "view")]
    rows += [(1, T0 + dt.timedelta(days=8), "view")]
    # cohort B: user 3 first seen next week
    rows += [(3, T0 + dt.timedelta(days=8), "view")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        (r["cohort"], r["period_offset"]): r
        for r in cohort_retention(df, period="week").collect()
    }
    a = dt.datetime(2024, 1, 1)
    b = dt.datetime(2024, 1, 8)
    assert out[(a, 0)]["n_users"] == 2 and out[(a, 0)]["cohort_size"] == 2
    assert out[(a, 1)]["n_users"] == 1
    assert out[(a, 1)]["retention"] == pytest.approx(0.5)
    assert out[(b, 0)]["n_users"] == 1
    assert out[(a, 0)]["retention"] == pytest.approx(1.0)


def test_funnel_plan_pushes_step_filter_and_single_shuffle(spark, events):
    out = funnel_stages(events, STEPS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # exactly one exchange: the user-key aggregation
    assert plan.count("Exchange") <= 2  # partial+final agg pair


def test_funnel_rejects_empty_steps(spark, events):
    with pytest.raises(ValueError):
        funnel_stages(events, [])
    with pytest.raises(ValueError):
        cohort_retention(events, period="year")


def test_funnel_stages_ansi_safe(spark):
    # A user completing every stage makes the fold look up index n+1;
    # under ANSI mode (Spark 4 default) a plain element_at would throw.
    # try_element_at keeps the operator usable on a vanilla session.
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = [
            ("u1", "view", "2024-01-01 00:00:00"),
            ("u1", "cart", "2024-01-01 00:01:00"),
            ("u1", "buy", "2024-01-01 00:02:00"),
            ("u1", "view", "2024-01-01 00:03:00"),  # post-completion event
        ]
        df = spark.createDataFrame(rows, "user_id string, etype string, ts string")
        out = funnel_stages(
            df, ["view", "cart", "buy"],
            user_col="user_id", type_col="etype", ts_col="ts",
        ).collect()
        assert len(out) == 1 and out[0]["stages_completed"] == 3
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_event_transitions_hand_checked(spark):
    from data_pipeline_framework_spark.operators.funnels import (
        event_transitions,
    )

    rows = [
        (1, _ev(1, 0, "a")[1], 10, "a"), (1, _ev(1, 1, "b")[1], 11, "b"),
        (1, _ev(1, 2, "a")[1], 12, "a"),
        (2, _ev(2, 0, "a")[1], 20, "a"), (2, _ev(2, 1, "a")[1], 21, "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in event_transitions(df, tiebreak_col="event_id").collect()
    }
    # user1: a->b, b->a; user2: a->a. from 'a': {b:1, a:1} -> prob .5
    assert got[("a", "b")] == (1, 0.5)
    assert got[("a", "a")] == (1, 0.5)
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 3


def test_top_paths_hand_checked(spark):
    from data_pipeline_framework_spark.operators.funnels import top_paths

    rows = [
        (1, _ev(1, 0, "v")[1], 1, "v"), (1, _ev(1, 1, "c")[1], 2, "c"),
        (1, _ev(1, 2, "p")[1], 3, "p"), (1, _ev(1, 3, "x")[1], 4, "x"),
        (2, _ev(2, 0, "v")[1], 5, "v"), (2, _ev(2, 1, "c")[1], 6, "c"),
        (2, _ev(2, 2, "p")[1], 7, "p"),
        (3, _ev(3, 0, "v")[1], 8, "v"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = [
        (r["path"], r["n_users"])
        for r in top_paths(
            df, tiebreak_col="event_id", max_steps=3, k=5
        ).collect()
    ]
    # users 1 and 2 share the first-3 path; the max_steps cut drops x
    assert got[0] == ("v > c > p", 2)
    assert ("v", 1) in got
    assert len(got) == 2
    # assignment invariant to partitioning
    re = top_paths(
        df.repartition(7), tiebreak_col="event_id", max_steps=3, k=5
    ).collect()
    assert [(r["path"], r["n_users"]) for r in re] == got

    with pytest.raises(ValueError):
        top_paths(df, max_steps=0)
    with pytest.raises(ValueError):
        top_paths(df, k=0)


def test_grouped_ols_hand_checked(spark):
    from data_pipeline_framework_spark.operators.features import grouped_ols

    rows = (
        # group "lin": exact line y = 3x + 2 -> slope 3, r2 1
        [("lin", float(x), 3.0 * x + 2.0) for x in range(10)]
        # group "flat": zero x-variance -> NULL slope/r2
        + [("flat", 1.0, float(y)) for y in range(5)]
        # group "one": single point -> NULLs (n < 2)
        + [("one", 2.0, 7.0)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in grouped_ols(df, ["g"], "x", "y").collect()}
    assert got["lin"]["n"] == 10
    assert got["lin"]["slope"] == pytest.approx(3.0)
    assert got["lin"]["intercept"] == pytest.approx(2.0)
    assert got["lin"]["r2"] == pytest.approx(1.0)
    assert got["flat"]["slope"] is None and got["flat"]["r2"] is None
    assert got["one"]["slope"] is None and got["one"]["n"] == 1
