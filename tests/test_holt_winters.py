"""Holt(-Winters) exponential smoothing."""

from __future__ import annotations

import datetime as dt

import pytest

from data_pipeline_framework_spark.operators.timeseries import holt_winters

T0 = dt.datetime(2024, 1, 1)


def _mk(spark, ys, uid=1):
    rows = [
        (uid, i, T0 + dt.timedelta(hours=i), float(v))
        for i, v in enumerate(ys)
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def _holt_ref(ys, a=0.3, B=0.1):
    l, b = float(ys[0]), 0.0
    hat = [float(ys[0])]
    for y in ys[1:]:
        hat.append(l + b)
        l_new = a * y + (1 - a) * (l + b)
        b = B * (l_new - l) + (1 - B) * b
        l = l_new
    return hat, l, b


def test_holt_matches_reference(spark):
    ys = [3.0, 5.0, 4.0, 8.0, 7.0, 9.0, 12.0]
    out = (
        holt_winters(_mk(spark, ys), "value", "ts", group_by=["user_id"])
        .orderBy("ts")
        .collect()
    )
    want, _, _ = _holt_ref(ys)
    got = [r["value_hat"] for r in out]
    assert got == pytest.approx(want, abs=1e-12)


def test_holt_linear_series_tracks_trend(spark):
    ys = [float(2 * i) for i in range(60)]
    out = (
        holt_winters(
            _mk(spark, ys), "value", "ts",
            group_by=["user_id"], alpha=0.5, beta=0.3,
            forecast_periods=3,
        )
        .orderBy("ts")
        .collect()
    )
    hist = [r for r in out if r["event_id"] is not None]
    # converged one-step forecasts approach the true next value
    assert hist[-1]["value_hat"] == pytest.approx(2 * 59, rel=0.02)
    # appended forecast rows continue the trend, keys kept, rest null
    fc = [r for r in out if r["event_id"] is None]
    assert len(fc) == 3
    assert all(r["user_id"] == 1 for r in fc)
    assert fc[-1]["value_hat"] > fc[0]["value_hat"] > hist[-1]["value_hat"]


def test_holt_constant_series_is_flat(spark):
    ys = [5.0] * 20
    out = holt_winters(
        _mk(spark, ys), "value", "ts",
        group_by=["user_id"], forecast_periods=2,
    ).collect()
    assert all(r["value_hat"] == pytest.approx(5.0) for r in out)


def test_seasonal_tracks_cycle(spark):
    import math

    m = 12
    ys = [10 + 5 * math.sin(2 * math.pi * i / m) for i in range(6 * m)]
    out = (
        holt_winters(
            _mk(spark, ys), "value", "ts",
            season_length=m, group_by=["user_id"], forecast_periods=m,
        )
        .orderBy("ts")
        .collect()
    )
    hist = [r for r in out if r["event_id"] is not None]
    # after warmup the additive model locks onto a pure seasonal cycle
    err = [abs(r["value_hat"] - ys[i]) for i, r in enumerate(hist)][2 * m:]
    assert max(err) < 0.6
    fc = [r["value_hat"] for r in out if r["event_id"] is None]
    want = [10 + 5 * math.sin(2 * math.pi * (6 * m + k) / m)
            for k in range(m)]
    assert fc == pytest.approx(want, abs=1.0)


def test_multi_series_isolation(spark):
    df1 = _mk(spark, [1.0, 2.0, 3.0], uid=1)
    df2 = _mk(spark, [100.0, 100.0, 100.0], uid=2)
    out = holt_winters(
        df1.union(df2), "value", "ts", group_by=["user_id"]
    ).collect()
    by_uid = {}
    for r in out:
        by_uid.setdefault(r["user_id"], []).append(r["value_hat"])
    assert all(v == pytest.approx(100.0) for v in by_uid[2])
    assert max(by_uid[1]) < 4.0


def test_short_series_and_empty_groups(spark):
    out = holt_winters(
        _mk(spark, [7.0]), "value", "ts", group_by=["user_id"]
    ).collect()
    assert len(out) == 1 and out[0]["value_hat"] == 7.0


def test_batched_path_matches_scalar_spec_randomized(spark):
    """The time-step-major batched kernel must be bit-identical to the
    sequential per-series recurrence for ragged series lengths (incl.
    length-1), shuffled input order, and appended forecasts."""
    import random

    rng = random.Random(0xB0)
    series = {
        uid: [rng.uniform(-50, 50) for _ in range(rng.randint(1, 40))]
        for uid in range(1, 51)
    }
    rows = [
        (uid, i, T0 + dt.timedelta(hours=i), v)
        for uid, ys in series.items()
        for i, v in enumerate(ys)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = holt_winters(
        df, "value", "ts", alpha=0.3, beta=0.1,
        group_by=["user_id"], forecast_periods=2,
    ).collect()
    hist = {}
    fc = {}
    for r in out:
        if r["event_id"] is None:
            fc.setdefault(r["user_id"], []).append((r["ts"], r["value_hat"]))
        else:
            hist[(r["user_id"], r["event_id"])] = r["value_hat"]
    for uid, ys in series.items():
        want, l, b = _holt_ref(ys)
        for i, w in enumerate(want):
            assert hist[(uid, i)] == w, (uid, i)
        got_fc = [v for _, v in sorted(fc[uid])]
        assert got_fc == [l + 1 * b, l + 2 * b], uid
        if len(ys) >= 2:  # forecast timestamps extrapolate the cadence
            assert sorted(fc[uid])[0][0] == T0 + dt.timedelta(
                hours=len(ys)
            )
