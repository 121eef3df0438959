"""Salted join / two-stage agg equivalence tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark.operators.skew import (
    salted_join,
    top_keys,
    two_stage_agg,
)
from data_pipeline_framework_spark.sources.readers import read_parquet


@pytest.fixture()
def skewed(spark):
    # 90% of rows share one key
    rows = [("hot", float(i % 10)) for i in range(900)]
    rows += [(f"k{i}", float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "k string, v double")


def test_top_keys_diagnosis(skewed):
    top = top_keys(skewed, "k", k=3).collect()
    assert top[0]["k"] == "hot" and top[0]["count"] == 900


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "k string, label string"
    )
    plain = skewed.join(dim, "k", "inner")
    salted = salted_join(skewed, dim, on="k", salt_factor=4)
    key = lambda r: (r["k"], r["v"], r["label"])
    assert sorted(map(key, plain.collect())) == \
        sorted(map(key, salted.collect()))

    left_plain = skewed.join(dim, "k", "left")
    left_salted = salted_join(skewed, dim, on="k", how="left", salt_factor=4)
    assert left_plain.count() == left_salted.count() == 1000

    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, on="k", how="right")


def test_two_stage_agg_matches_plain(spark, sf_dir, skewed):
    got = two_stage_agg(
        skewed, "k",
        {"v": ["sum", "count", "min", "max", "avg"]},
        salt_factor=8,
    )
    exp = skewed.groupBy("k").agg(
        F.sum("v").alias("v_sum"), F.count("v").alias("v_count"),
        F.min("v").alias("v_min"), F.max("v").alias("v_max"),
        F.avg("v").alias("v_avg"),
    )
    g = {r["k"]: r for r in got.collect()}
    e = {r["k"]: r for r in exp.collect()}
    assert set(g) == set(e)
    for k in e:
        for m in ("v_sum", "v_count", "v_min", "v_max"):
            assert g[k][m] == e[k][m], (k, m)
        assert g[k]["v_avg"] == pytest.approx(e[k]["v_avg"])

    with pytest.raises(ValueError, match="cannot decompose"):
        two_stage_agg(skewed, "k", {"v": ["median"]})


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with NO
    shuffle exchange — the co-located join that saves a full-cluster
    shuffle at scale."""
    from data_pipeline_framework_spark.sinks.writers import write_bucketed
    from data_pipeline_framework_spark.sources.readers import read_parquet

    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    customer = read_parquet(spark, f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "b_orders", 4, ["o_custkey"],
                   sort_by=["o_custkey"], path=str(tmp_path / "bo"))
    write_bucketed(customer, "b_customer", 4, ["c_custkey"],
                   sort_by=["c_custkey"], path=str(tmp_path / "bc"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
        assert joined.count() == orders.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_diagnose_skew_hot_key_and_salt(spark):
    from data_pipeline_framework_spark.operators.skew import diagnose_skew

    rows = [(1, "hot") for _ in range(900)] + [(i, "k%d" % i)
                                               for i in range(2, 102)]
    df = spark.createDataFrame(rows, "v long, key string")
    out = diagnose_skew(df, "key", top_k=3, rows_per_task=100).collect()
    assert out[0]["key"] == "hot" and out[0]["cnt"] == 900
    assert out[0]["share"] == pytest.approx(900 / 1000)
    assert out[0]["salt_buckets"] == 9     # ceil(900/100)
    assert all(r["salt_buckets"] == 1 for r in out[1:])
