"""PageRank: hand-checked rounds, rank conservation, dangling mass."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_framework_spark.operators.graph import pagerank


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_pagerank_cycle_is_uniform(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = _ranks(pagerank(e, iters=2))
    for v in got.values():
        assert v == pytest.approx(1 / 3)


def test_pagerank_dangling_hand_checked(spark):
    # a -> b, b dangling; after one round (d=.85, N=2):
    # r(a) = .075 + .85*(0 + .25) = .2875 ; r(b) = .075 + .85*.75 = .7125
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = _ranks(pagerank(e, iters=1))
    assert got["a"] == pytest.approx(0.2875)
    assert got["b"] == pytest.approx(0.7125)


def test_pagerank_conserves_total_mass(spark):
    e = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(60)], "src long, dst long"
    )
    total = pagerank(e, iters=3).agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_authority_ordering(spark):
    # star: everyone links to hub 0 -> hub outranks the spokes
    e = spark.createDataFrame(
        [(i, 0) for i in range(1, 8)], "src long, dst long"
    )
    got = _ranks(pagerank(e, iters=4))
    assert got[0] > max(v for k, v in got.items() if k != 0) * 3


def test_pagerank_duplicate_edges_count_once(spark):
    e1 = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], "src string, dst string"
    )
    e2 = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    assert _ranks(pagerank(e1, iters=2)) == _ranks(pagerank(e2, iters=2))


def test_weighted_pagerank_follows_flow(spark):
    # b receives 9x the weight of c from a: rank(b) > rank(c); the
    # unweighted graph treats them identically
    e = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0),
         ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    got_w = _ranks(pagerank(e, iters=3, weight_col="w"))
    assert got_w["b"] > got_w["c"]
    got_u = _ranks(pagerank(e, iters=3))
    assert got_u["b"] == pytest.approx(got_u["c"])
    # both conserve total mass
    assert sum(got_w.values()) == pytest.approx(1.0, abs=1e-9)


def test_weighted_pagerank_parallel_edges_aggregate(spark):
    # two (a,b,2.0) edges == one (a,b,4.0) edge
    e1 = spark.createDataFrame(
        [("a", "b", 2.0), ("a", "b", 2.0), ("a", "c", 1.0)],
        "src string, dst string, w double",
    )
    e2 = spark.createDataFrame(
        [("a", "b", 4.0), ("a", "c", 1.0)],
        "src string, dst string, w double",
    )
    assert _ranks(pagerank(e1, iters=2, weight_col="w")) == \
        _ranks(pagerank(e2, iters=2, weight_col="w"))
