"""Pin the r10 in-plan cut-point form against the old driver-collect
form: _inplan_cuts must reproduce sorted(set(percentile_approx(...)))
element-for-element (same sketch, same sample, doubles never leaving
the JVM), and _inplan_bucket must reproduce the chained-CASE ordinal
the collected literals produced."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions.profiling import (
    _double_array_lit,
    _inplan_bucket,
    _inplan_cuts,
    _ordinal_bucket_expr,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


@pytest.mark.parametrize("n_buckets", [4, 8])
def test_inplan_cuts_match_driver_collect(spark, n_buckets):
    import random

    rng = random.Random(7)
    xs = [rng.gauss(0, 100) for _ in range(2000)] + [3.25] * 500
    df = _vals(spark, xs)
    # old form: collect the sketch, sorted(set(...)) on the driver
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.sample(fraction=0.1, seed=42).agg(
        F.percentile_approx("v", _double_array_lit(probs), 100).alias("c")
    ).first()
    want = sorted(set(row["c"] or []))
    got = _inplan_cuts(df, "v", n_buckets).first()["__cuts"]
    assert list(got) == want  # element-for-element, bit-identical


def test_inplan_bucket_matches_ordinal_expr(spark):
    import random

    rng = random.Random(11)
    xs = [rng.uniform(-50, 50) for _ in range(500)]
    df = _vals(spark, xs)
    cuts = [-20.0, 0.5, 17.25]
    old = df.select(
        "v", _ordinal_bucket_expr("v", cuts).alias("b")
    ).collect()
    new = df.crossJoin(
        F.broadcast(
            df.sparkSession.createDataFrame(
                [(cuts,)], "__cuts array<double>"
            )
        )
    ).select("v", _inplan_bucket("v").alias("b")).collect()
    assert sorted((r["v"], r["b"]) for r in old) == sorted(
        (r["v"], r["b"]) for r in new
    )


def test_inplan_cuts_empty_input_degrades_to_no_cuts(spark):
    df = _vals(spark, [])
    got = _inplan_cuts(df, "v", 8).first()["__cuts"]
    assert list(got) == []
