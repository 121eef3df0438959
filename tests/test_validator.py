"""Expectation-suite validation tests."""

from __future__ import annotations

from data_pipeline_framework_spark.governance.validator import (
    ExpectationSuite,
    auto_generate_suite,
    validate,
)
from data_pipeline_framework_spark.sources.readers import read_parquet


def test_manual_suite_pass_fail(spark):
    df = spark.createDataFrame(
        [(1, "a@x.com", 10.0), (2, "bad-email", 25.0), (3, None, 90.0)],
        "id int, email string, score double",
    )
    suite = (
        ExpectationSuite("emails")
        .add("expect_column_values_to_be_unique", column="id")
        .add("expect_column_values_to_match_regex", column="email",
             regex=r"^[^@]+@[^@]+\.[^@]+$")
        .add("expect_column_values_to_be_between", column="score",
             min_value=0, max_value=50, mostly=0.6)
        .add("expect_table_row_count_to_be_between", min_value=1, max_value=10)
        .add("expect_column_to_exist", column="missing_col")
    )
    report = validate(df, suite)
    by_type = {
        (r["expectation"]["expectation_type"],
         r["expectation"]["kwargs"].get("column")): r
        for r in report["results"]
    }
    assert by_type[("expect_column_values_to_be_unique", "id")]["success"]
    regex_r = by_type[("expect_column_values_to_match_regex", "email")]
    assert not regex_r["success"]  # 1 of 2 non-null violates, mostly=1.0
    assert regex_r["observed"]["violations"] == 1
    # 2 of 3 in [0,50] -> 0.667 >= mostly 0.6
    assert by_type[("expect_column_values_to_be_between", "score")]["success"]
    assert by_type[("expect_table_row_count_to_be_between", None)]["success"]
    assert not by_type[("expect_column_to_exist", "missing_col")]["success"]
    assert report["statistics"]["failed"] == 2
    assert not report["success"]


def test_auto_suite_validates_own_data(spark, sf_dir):
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    suite = auto_generate_suite(orders, "orders_auto")
    types = {e["expectation_type"] for e in suite.expectations}
    assert "expect_column_values_to_be_between" in types
    assert "expect_column_value_lengths_to_be_between" in types
    # low-cardinality status column got an in-set expectation
    in_sets = [e for e in suite.expectations
               if e["expectation_type"] == "expect_column_values_to_be_in_set"]
    assert any(e["kwargs"]["column"] == "o_orderstatus" for e in in_sets)
    # a suite generated FROM the data must pass ON the data
    report = validate(orders, suite)
    assert report["success"], [
        r for r in report["results"] if not r["success"]
    ]


def test_suite_save_load_roundtrip(spark, tmp_path):
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_not_be_null", column="x"
    )
    p = tmp_path / "suite.json"
    suite.save(p)
    loaded = ExpectationSuite.load(p)
    assert loaded.name == "s"
    assert loaded.expectations == suite.expectations

    df = spark.createDataFrame([(1,), (None,)], "x int")
    report = validate(df, loaded)
    assert not report["success"]
    assert report["results"][0]["observed"]["violations"] == 1
