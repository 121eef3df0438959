"""Blocked fuzzy join: recall within blocks, distance filter, no
cross-join plan, clash guard."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_framework_spark.operators.linkage import (
    block_key_prefix,
    block_key_suffix,
    fuzzy_join,
)


def test_fuzzy_join_matches_typos_within_blocks(spark):
    left = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "mary jones"), (3, "zzz unrelated")],
        "lid long, lname string",
    )
    right = spark.createDataFrame(
        [(10, "jonathon smith"),   # 1 substitution, prefix+suffix intact
         (20, "mary joness"),      # 1 insertion at end -> prefix block hits
         (30, "completely other")],
        "rid long, rname string",
    )
    out = fuzzy_join(left, right, "lname", "rname", max_distance=1)
    got = {(r["lid"], r["rid"]): r["edit_distance"] for r in out.collect()}
    assert got == {(1, 10): 1, (2, 20): 1}


def test_fuzzy_join_distance_zero_is_exact(spark):
    left = spark.createDataFrame([(1, "Alice  ")], "lid long, lname string")
    right = spark.createDataFrame([(2, "alice")], "rid long, rname string")
    out = fuzzy_join(left, right, "lname", "rname", max_distance=0)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["edit_distance"] == 0


def test_fuzzy_join_never_cross_joins(spark):
    left = spark.createDataFrame([(1, "abcd")], "lid long, lname string")
    right = spark.createDataFrame([(2, "abce")], "rid long, rname string")
    out = fuzzy_join(left, right, "lname", "rname")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_join_custom_blocks_and_clash_guard(spark):
    left = spark.createDataFrame([(1, "xxabcd")], "lid long, name string")
    right = spark.createDataFrame([(2, "yyabcd")], "rid long, name string")
    with pytest.raises(ValueError):
        fuzzy_join(left, right, "name", "name")
    r2 = right.withColumnRenamed("name", "rname")
    # suffix-only blocking still finds the pair (prefixes differ)
    out = fuzzy_join(
        left, r2, "name", "rname", max_distance=2,
        blocks=[(block_key_suffix("name", 4), block_key_suffix("rname", 4))],
    )
    assert out.count() == 1
    # prefix-only blocking misses it: documented recall trade-off
    out2 = fuzzy_join(
        left, r2, "name", "rname", max_distance=2,
        blocks=[(block_key_prefix("name", 4), block_key_prefix("rname", 4))],
    )
    assert out2.count() == 0
