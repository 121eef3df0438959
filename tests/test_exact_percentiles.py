from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions.profiling import (
    _exact_percentiles_sort,
    exact_percentiles,
)
from data_pipeline_framework_spark.sources.readers import read_parquet


def test_exact_percentiles_match_builtin(spark, sf_dir):
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    probs = [0.25, 0.5, 0.75]
    expected = li.agg(*[
        F.percentile(F.col(c), F.array(*[F.lit(p) for p in probs])).alias(c)
        for c in cols
    ]).first()
    for kernel in (exact_percentiles, _exact_percentiles_sort):
        got = kernel(li, cols, probs)
        for c in cols:
            for i, p in enumerate(probs):
                assert got[c][i] == pytest.approx(
                    expected[c][i], abs=1e-9
                ), (kernel.__name__, c, p)


def test_exact_percentiles_degenerate_sketch_still_exact(spark, sf_dir):
    """accuracy=1 degrades the bracket to [min, max] (margin clamps to
    the whole range); the kernel must stay exact regardless of sketch
    quality because the rank arithmetic is verified, not trusted."""
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    got = exact_percentiles(li, ["l_quantity"], [0.5], accuracy=1)
    expected = li.agg(F.percentile("l_quantity", F.lit(0.5))).first()[0]
    assert got["l_quantity"][0] == pytest.approx(expected, abs=1e-9)


def test_exact_percentiles_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [(1.0, None), (2.0, None), (3.0, None), (4.0, None)],
        "a double, b double",
    )
    for kernel in (exact_percentiles, _exact_percentiles_sort):
        got = kernel(df, ["a", "b"], [0.5])
        assert got["a"] == [2.5], kernel.__name__
        assert got["b"] == [None], kernel.__name__


def test_average_ranks_ties_and_nulls(spark):
    """tie groups share the mean of their positions; nulls rank as null."""
    from data_pipeline_framework_spark.functions.profiling import average_ranks

    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 20.0), (4, None), (5, 5.0)],
        "id int, v double",
    )
    out = {r["id"]: r["__rk_v"] for r in average_ranks(df, ["v"]).collect()}
    assert out[5] == 1.0
    assert out[1] == out[2] == 2.5   # positions 2,3 averaged
    assert out[3] == 4.0
    assert out[4] is None
