"""Incremental rollup maintenance: algebraic-state composition
(state(A ∪ B) == merge(state(A), state(B))), persisted update loop
equivalence with the direct aggregate, sketch linearity for approx
distinct, and the unsupported-aggregate guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark.operators.rollup import (
    finalize_rollup,
    merge_rollup_state,
    rollup_state,
    update_rollup,
)

METRICS = {"value": ["sum", "avg", "min", "max"], "user_id": ["count"]}


@pytest.fixture(scope="module")
def events(spark):
    from data_pipeline_framework_spark.sources import read_table

    return read_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type", "user_id", "value",
        F.date_trunc("hour", "ts").alias("hour"),
    )


def _rows(df, keys=("event_type",)):
    return {
        tuple(r[k] for k in keys): r.asDict() for r in df.collect()
    }


def test_state_merge_equals_direct(spark, events):
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = merge_rollup_state(
        rollup_state(a, ["event_type"], METRICS),
        rollup_state(b, ["event_type"], METRICS),
        ["event_type"], METRICS,
    )
    direct = rollup_state(events, ["event_type"], METRICS)
    got = _rows(finalize_rollup(merged, METRICS))
    want = _rows(finalize_rollup(direct, METRICS))
    assert set(got) == set(want)
    for k in want:
        for c in ("value_min", "value_max", "user_id_count", "__rows"):
            assert got[k][c] == want[k][c], (k, c)
        # float sums are order-dependent across partials; exact to rel tol
        for c in ("value_sum", "value_avg"):
            assert got[k][c] == pytest.approx(want[k][c], rel=1e-9), (k, c)


def test_merge_is_order_independent(spark, events):
    slices = [
        rollup_state(
            events.filter(F.col("event_id") % 3 == i), ["event_type"], METRICS
        )
        for i in range(3)
    ]
    ab_c = merge_rollup_state(
        merge_rollup_state(slices[0], slices[1], ["event_type"], METRICS),
        slices[2], ["event_type"], METRICS,
    )
    c_ba = merge_rollup_state(
        slices[2],
        merge_rollup_state(slices[1], slices[0], ["event_type"], METRICS),
        ["event_type"], METRICS,
    )
    got, want = _rows(ab_c), _rows(c_ba)
    assert got.keys() == want.keys()
    for k in want:
        for c in want[k]:
            if isinstance(want[k][c], float):
                assert got[k][c] == pytest.approx(want[k][c], rel=1e-9)
            else:
                assert got[k][c] == want[k][c], (k, c)


def test_update_rollup_never_rescans_history(spark, events, tmp_path):
    state = str(tmp_path / "rollup_state")
    final = None
    for i in range(3):
        delta = events.filter(F.col("event_id") % 3 == i)
        final = update_rollup(spark, delta, state, ["event_type"], METRICS)
    got = _rows(final)
    want = _rows(finalize_rollup(
        rollup_state(events, ["event_type"], METRICS), METRICS
    ))
    assert got.keys() == want.keys()
    for k in want:
        assert got[k]["value_sum"] == pytest.approx(
            want[k]["value_sum"], rel=1e-9
        )
        assert got[k]["__rows"] == want[k]["__rows"]
    # replay safety surface: state is a real parquet table on disk
    back = spark.read.parquet(state)
    assert back.count() == len(want)


def test_approx_distinct_sketch_linearity(spark, events):
    m = {"user_id": ["approx_distinct"]}
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = finalize_rollup(
        merge_rollup_state(
            rollup_state(a, ["event_type"], m),
            rollup_state(b, ["event_type"], m),
            ["event_type"], m,
        ), m,
    )
    direct = finalize_rollup(rollup_state(events, ["event_type"], m), m)
    assert _rows(merged) == _rows(direct)  # sketch union is exact-linear
    exact = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d")).collect()
    }
    for (k,), row in _rows(merged).items():
        est = row["user_id_approx_distinct"]
        assert abs(est - exact[k]) <= max(3, 0.05 * exact[k])


def test_unsupported_aggregate_raises(spark, events):
    with pytest.raises(ValueError, match="algebraic only"):
        rollup_state(events, ["event_type"], {"value": ["median"]})


def _hist_spec(events, bins=50, quantiles=(0.5, 0.9)):
    lo, hi = events.agg(F.min("value"), F.max("value")).first()
    return {"value": {"lo": lo, "hi": hi, "bins": bins,
                      "quantiles": list(quantiles)}}, lo, hi


def test_histogram_state_merges_and_estimates_quantiles(spark, events):
    hist, lo, hi = _hist_spec(events)
    width = (hi - lo) / 50
    m = {"value": ["count"]}
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged_state = merge_rollup_state(
        rollup_state(a, ["event_type"], m, histograms=hist),
        rollup_state(b, ["event_type"], m, histograms=hist),
        ["event_type"], m, histograms=hist,
    )
    direct_state = rollup_state(events, ["event_type"], m, histograms=hist)
    # bin counts are integers: merge must be EXACTLY the direct histogram
    got = {r["event_type"]: list(r["value_hist"])
           for r in merged_state.collect()}
    want = {r["event_type"]: list(r["value_hist"])
            for r in direct_state.collect()}
    assert got == want
    fin = finalize_rollup(merged_state, m, histograms=hist)
    assert "value_hist" not in fin.columns  # state-only column dropped
    est = {r["event_type"]: (r["value_p50"], r["value_p90"])
           for r in fin.collect()}
    exact = {
        r["event_type"]: (r["e50"], r["e90"])
        for r in events.groupBy("event_type").agg(
            F.expr("percentile(value, 0.5)").alias("e50"),
            F.expr("percentile(value, 0.9)").alias("e90"),
        ).collect()
    }
    for k, (p50, p90) in est.items():
        assert abs(p50 - exact[k][0]) <= width, k
        assert abs(p90 - exact[k][1]) <= width, k


def test_histogram_spec_validation(spark, events):
    with pytest.raises(ValueError, match="hi must exceed lo"):
        rollup_state(events, ["event_type"], {},
                     histograms={"value": {"lo": 1.0, "hi": 1.0}})
    with pytest.raises(ValueError, match="bins"):
        rollup_state(events, ["event_type"], {},
                     histograms={"value": {"lo": 0, "hi": 1, "bins": 10**6}})
    with pytest.raises(ValueError, match="quantiles"):
        rollup_state(events, ["event_type"], {},
                     histograms={"value": {"lo": 0, "hi": 1,
                                           "quantiles": [1.5]}})


def test_replayed_commit_id_is_exactly_once(spark, events, tmp_path):
    state = str(tmp_path / "state")
    d0 = events.filter(F.col("event_id") % 2 == 0)
    d1 = events.filter(F.col("event_id") % 2 == 1)
    r1 = _rows(update_rollup(
        spark, d0, state, ["event_type"], METRICS, commit_id=0))
    # crash-before-checkpoint: foreachBatch re-delivers the SAME batch id
    r2 = _rows(update_rollup(
        spark, d0, state, ["event_type"], METRICS, commit_id=0))
    assert r2 == r1  # replay folded nothing in
    final = _rows(update_rollup(
        spark, d1, state, ["event_type"], METRICS, commit_id=1))
    want = _rows(finalize_rollup(
        rollup_state(events, ["event_type"], METRICS), METRICS))
    assert final.keys() == want.keys()
    for k in want:
        assert final[k]["__rows"] == want[k]["__rows"]
        assert final[k]["value_sum"] == pytest.approx(
            want[k]["value_sum"], rel=1e-9)


def test_crash_windows_recover(spark, events, tmp_path):
    import os

    state = str(tmp_path / "state")
    d0 = events.filter(F.col("event_id") % 3 == 0)
    d1 = events.filter(F.col("event_id") % 3 == 1)
    d2 = events.filter(F.col("event_id") % 3 == 2)
    update_rollup(spark, d0, state, ["event_type"], METRICS, commit_id=0)
    # window A: crashed after current->old rename, swap dir complete.
    # the completed swap (marker inside) must be adopted, not the old dir.
    update_rollup(spark, d1, state, ["event_type"], METRICS, commit_id=1)
    os.rename(state, state + "__swap")
    final = update_rollup(
        spark, d2, state, ["event_type"], METRICS, commit_id=2)
    want = _rows(finalize_rollup(
        rollup_state(events, ["event_type"], METRICS), METRICS))
    got = _rows(final)
    for k in want:
        assert got[k]["__rows"] == want[k]["__rows"]
    # window B: crashed BEFORE the swap landed — only the old dir remains.
    os.rename(state, state + "__old")
    recovered = update_rollup(
        spark, events.limit(0), state, ["event_type"], METRICS, commit_id=3)
    got2 = _rows(recovered)
    for k in want:
        assert got2[k]["__rows"] == want[k]["__rows"]


def test_random_kill_points_property(spark, events, tmp_path, monkeypatch):
    """Chaos property: kill the swap protocol at EVERY fault point
    (before the Nth filesystem metadata op) across a 20-update sequence
    with exactly-once re-delivery; the final rollup must equal the
    direct aggregate over all deltas applied once.

    The crash is injected by wrapping the real Hadoop FileSystem in a
    proxy that raises before the scheduled create/rename/delete call —
    everything already on disk at that moment is exactly what a process
    kill would leave behind.
    """
    import itertools
    import random

    from data_pipeline_framework_spark.operators import rollup as mod

    class SimulatedCrash(RuntimeError):
        pass

    real_filesystem = mod._filesystem

    class CrashingFS:
        """Dies before the scheduled metadata operation."""

        def __init__(self, fs, die_at: int):
            self._fs = fs
            self._left = die_at

        def _tick(self):
            if self._left == 0:
                raise SimulatedCrash("kill -9")
            self._left -= 1

        def create(self, *a):
            self._tick()
            return self._fs.create(*a)

        def rename(self, *a):
            self._tick()
            return self._fs.rename(*a)

        def delete(self, *a):
            self._tick()
            return self._fs.delete(*a)

        def __getattr__(self, name):
            return getattr(self._fs, name)

    state = str(tmp_path / "chaos_state")
    n_updates = 20
    deltas = [
        events.filter(F.col("event_id") % n_updates == i)
        for i in range(n_updates)
    ]
    rng = random.Random(42)
    crash_schedule = {i: rng.randint(0, 5) for i in rng.sample(
        range(n_updates), 12)}  # 12 of 20 updates get a kill point

    applied = 0
    for i, delta in enumerate(deltas):
        if i in crash_schedule:
            monkeypatch.setattr(
                mod, "_filesystem",
                lambda sp, p, _die=crash_schedule[i]: CrashingFS(
                    real_filesystem(sp, p), _die),
            )
            try:
                update_rollup(spark, delta, state, ["event_type"],
                              METRICS, commit_id=i)
                crashed = False
            except SimulatedCrash:
                crashed = True
            monkeypatch.setattr(mod, "_filesystem", real_filesystem)
            # foreachBatch contract: the same batch id is re-delivered
            update_rollup(spark, delta, state, ["event_type"],
                          METRICS, commit_id=i)
        else:
            update_rollup(spark, delta, state, ["event_type"],
                          METRICS, commit_id=i)
        applied += 1

    final = _rows(update_rollup(
        spark, events.limit(0), state, ["event_type"], METRICS,
        commit_id=n_updates))
    want = _rows(finalize_rollup(
        rollup_state(events, ["event_type"], METRICS), METRICS))
    assert final.keys() == want.keys()
    for k in want:
        assert final[k]["__rows"] == want[k]["__rows"]
        assert final[k]["value_sum"] == pytest.approx(
            want[k]["value_sum"], rel=1e-9)
        assert final[k]["value_min"] == want[k]["value_min"]
        assert final[k]["value_max"] == want[k]["value_max"]
