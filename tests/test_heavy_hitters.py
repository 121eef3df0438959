"""Misra-Gries heavy hitters: exactness when capacity covers the key
space, the cnt <= true <= cnt+err sandwich under compaction, the
N/(capacity+1) retention guarantee, bounded output size, and merge
composition — all against exact counts on the driver fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions.heavy_hitters import (
    heavy_hitters,
    merge_heavy_hitters,
    top_k,
)
from data_pipeline_framework_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )


def _exact(df, key, groups=()):
    out = {}
    for r in df.groupBy(*groups, key).count().collect():
        g = tuple(r[c] for c in groups)
        out.setdefault(g, {})[r[key]] = r["count"]
    return out


def test_exact_when_capacity_covers_keyspace(spark, lineitem):
    distinct = lineitem.select("l_suppkey").distinct().count()
    hh = heavy_hitters(lineitem, "l_suppkey", capacity=distinct + 10)
    got = {r["l_suppkey"]: (r["cnt"], r["err"]) for r in hh.collect()}
    want = _exact(lineitem, "l_suppkey")[()]
    assert set(got) == set(want)
    for k, (cnt, err) in got.items():
        assert err == 0
        assert cnt == want[k]


def test_engines_agree_in_exact_regime(spark, lineitem):
    """auto must pick the JVM exact path when capacity covers the key
    space, and all three engines return the identical summary there."""
    distinct = lineitem.select("l_suppkey").distinct().count()
    cap = distinct + 10
    want = sorted(
        (r["l_suppkey"], r["cnt"], r["err"])
        for r in heavy_hitters(
            lineitem, "l_suppkey", capacity=cap, engine="mg"
        ).collect()
    )
    for eng in ("auto", "exact"):
        got = sorted(
            (r["l_suppkey"], r["cnt"], r["err"])
            for r in heavy_hitters(
                lineitem, "l_suppkey", capacity=cap, engine=eng
            ).collect()
        )
        assert got == want, eng
    # the exact engine's plan carries no Python stage
    plan = heavy_hitters(
        lineitem, "l_suppkey", capacity=cap, engine="exact"
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "EvalPython" not in plan

    with pytest.raises(ValueError):
        heavy_hitters(lineitem, "l_suppkey", capacity=cap, engine="nope")


def test_exact_engine_valid_summary_above_capacity(spark, lineitem):
    """Forced exact engine under compaction still satisfies the summary
    contract (sandwich bound, retention, bounded output) — the cost is
    the full-cardinality shuffle, not correctness."""
    cap = 7
    hh = heavy_hitters(lineitem, "l_suppkey", capacity=cap, engine="exact")
    rows = hh.collect()
    assert len(rows) <= cap
    want = _exact(lineitem, "l_suppkey")[()]
    n = sum(want.values())
    for r in rows:
        true = want[r["l_suppkey"]]
        assert r["cnt"] <= true <= r["cnt"] + r["err"], r
    kept = {r["l_suppkey"] for r in rows}
    for k, c in want.items():
        if c > n / (cap + 1):
            assert k in kept, (k, c)


def test_bounds_and_retention_under_compaction(spark, lineitem):
    cap = 7  # far below distinct suppkeys: compaction must fire
    hh = heavy_hitters(lineitem, "l_suppkey", capacity=cap)
    rows = hh.collect()
    assert len(rows) <= cap
    want = _exact(lineitem, "l_suppkey")[()]
    n = sum(want.values())
    for r in rows:
        true = want[r["l_suppkey"]]
        assert r["cnt"] <= true <= r["cnt"] + r["err"], r
    # every key above the MG threshold must have been retained
    kept = {r["l_suppkey"] for r in rows}
    for k, c in want.items():
        if c > n / (cap + 1):
            assert k in kept, (k, c)


def test_grouped_summary_bounds(spark, lineitem):
    cap = 5
    hh = heavy_hitters(
        lineitem, "l_suppkey", capacity=cap, group_cols=["l_returnflag"]
    )
    want = _exact(lineitem, "l_suppkey", groups=("l_returnflag",))
    sizes: dict = {}
    for r in hh.collect():
        g = (r["l_returnflag"],)
        sizes[g] = sizes.get(g, 0) + 1
        true = want[g][r["l_suppkey"]]
        assert r["cnt"] <= true <= r["cnt"] + r["err"], r
    assert sizes and all(v <= cap for v in sizes.values())


def test_merge_matches_direct_when_exact(spark, lineitem):
    distinct = lineitem.select("l_suppkey").distinct().count()
    cap = distinct + 10
    a = lineitem.filter(F.col("l_orderkey") % 2 == 0)
    b = lineitem.filter(F.col("l_orderkey") % 2 == 1)
    merged = merge_heavy_hitters(
        heavy_hitters(a, "l_suppkey", cap),
        heavy_hitters(b, "l_suppkey", cap),
        "l_suppkey", cap,
    )
    got = {r["l_suppkey"]: (r["cnt"], r["err"]) for r in merged.collect()}
    want = _exact(lineitem, "l_suppkey")[()]
    assert set(got) == set(want)
    for k, (cnt, err) in got.items():
        assert (cnt, err) == (want[k], 0)


def test_merge_bounds_under_compaction(spark, lineitem):
    cap = 9
    a = lineitem.filter(F.col("l_orderkey") % 2 == 0)
    b = lineitem.filter(F.col("l_orderkey") % 2 == 1)
    merged = merge_heavy_hitters(
        heavy_hitters(a, "l_suppkey", cap),
        heavy_hitters(b, "l_suppkey", cap),
        "l_suppkey", cap,
    )
    rows = merged.collect()
    assert len(rows) <= cap
    want = _exact(lineitem, "l_suppkey")[()]
    for r in rows:
        true = want[r["l_suppkey"]]
        assert r["cnt"] <= true <= r["cnt"] + r["err"], r


def test_top_k_deterministic_tiebreak(spark, lineitem):
    distinct = lineitem.select("l_suppkey").distinct().count()
    hh = heavy_hitters(lineitem, "l_suppkey", capacity=distinct + 10)
    got = [(r["l_suppkey"], r["cnt"]) for r in
           top_k(hh, "l_suppkey", 5).orderBy("rank").collect()]
    want = sorted(
        _exact(lineitem, "l_suppkey")[()].items(),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert got == want


def test_capacity_validation(spark, lineitem):
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(lineitem, "l_suppkey", capacity=0)
