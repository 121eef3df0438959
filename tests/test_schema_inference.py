"""Schema-inference enrichment: PK/FK candidates, constraints, index
recommendations, string patterns, and the assembled report
(reference utils/schema_inference.py:36-78, :288-374)."""

from __future__ import annotations

from pyspark.sql import Row

from data_pipeline_framework_spark.functions import profiling as PR


def _fixture(spark):
    rows = [
        Row(
            user_id=i,
            dept_id=i % 3,
            email=f"user{i}@example.com" if i % 10 else None,
            status="active" if i % 2 else "inactive",
            balance=float(i) * 1.5,
        )
        for i in range(100)
    ]
    return spark.createDataFrame(rows)


def test_schema_constraints_flags(spark):
    df = _fixture(spark)
    out = {r["column"]: r.asDict() for r in PR.schema_constraints(df).collect()}

    # user_id: all-unique non-null int, ends _id -> unique + fk-index
    uid = out["user_id"]
    assert uid["unique_ok"] == 1 and uid["not_null_ok"] == 1
    assert uid["check_nonneg"] == 1
    assert uid["cardinality"] == "high"
    assert uid["index_reason"] == "foreign_key_performance"

    # dept_id: 3 distinct of 100 -> low cardinality, but FK wins priority
    assert out["dept_id"]["cardinality"] == "low"
    assert out["dept_id"]["index_reason"] == "foreign_key_performance"

    # status: low-cardinality non-FK string -> filtering index
    assert out["status"]["index_reason"] == "low_cardinality_filtering"
    assert out["status"]["check_nonneg"] is None

    # email: 10% nulls -> not_null fails
    assert out["email"]["not_null_ok"] == 0


def test_string_patterns_detects_email(spark):
    df = _fixture(spark)
    out = {
        (r["column"], r["pattern"]): r.asDict()
        for r in PR.string_patterns(df, ["email", "status"]).collect()
    }
    assert out[("email", "email")]["detected"] == 1
    assert out[("email", "email")]["match_frac"] == 1.0  # of non-null values
    assert out[("status", "email")]["detected"] == 0
    assert out[("status", "numeric_id")]["match_frac"] == 0.0


def test_infer_schema_report_assembly(spark):
    df = _fixture(spark)
    rep = PR.infer_schema_report(df, table_name="users")

    assert rep["table_name"] == "users"
    assert rep["total_columns"] == 5
    assert "user_id" in rep["primary_key_candidates"]
    fk_cols = {f["column"] for f in rep["foreign_key_candidates"]}
    assert {"user_id", "dept_id"} <= fk_cols
    assert "status" in rep["constraints"]["not_null"]
    assert "balance >= 0" in rep["constraints"]["check"]
    # user_id is PK candidate -> excluded from plain UNIQUE list
    assert "user_id" not in rep["constraints"]["unique"]
    reasons = {
        r["columns"][0]: r["reason"] for r in rep["indexes_recommended"]
    }
    assert reasons["status"] == "low_cardinality_filtering"
    # email column: 10% nulls -> per-column score penalty applied
    assert rep["columns"]["email"]["data_quality_score"] == 90.0
    assert rep["data_quality"]["primary_key_coverage"] is True


def test_default_profile_is_single_scan(spark, sf_dir):
    """Default (approx) schema profiling folds distinct sketches into the
    one stats scan: no per-column crossJoin, no Expand replication."""
    from data_pipeline_framework_spark.functions.profiling import (
        schema_constraints,
        schema_profile,
    )
    from data_pipeline_framework_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    for fn in (schema_profile, schema_constraints):
        plan = fn(orders)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan") + plan.count("Scan parquet") <= 2, plan
        assert "Expand" not in plan, plan
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan

    exact_plan = (
        schema_profile(orders, exact=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exact opt-in adds ONE dedicated distinct pass, never one per column
    assert exact_plan.count("Expand") <= 1


def test_approx_distincts_close_and_flags_sane(spark, sf_dir):
    from data_pipeline_framework_spark.functions.profiling import schema_profile
    from data_pipeline_framework_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    approx = {r["column"]: r for r in schema_profile(orders).collect()}
    exact = {r["column"]: r for r in schema_profile(orders, exact=True).collect()}
    for c, e in exact.items():
        a = approx[c]
        if e["n_distinct"]:
            assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
                0.05 * e["n_distinct"], 2
            )
        assert a["pk_candidate"] == e["pk_candidate"]  # holds at rsd=0.01


def test_dataset_fingerprint_invariance_and_sensitivity(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from data_pipeline_framework_spark.functions.profiling import (
        dataset_fingerprint,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "")],
        "id long, v string",
    )
    base = dataset_fingerprint(df).collect()[0]
    assert base["n_rows"] == 4 and base["n_cols"] == 2

    # row order / partitioning invariant
    shuffled = dataset_fingerprint(
        df.orderBy(F.desc("id")).repartition(7)
    ).collect()[0]
    assert tuple(shuffled) == tuple(base)

    # one changed value flips the content hash, not the schema hash
    changed = dataset_fingerprint(
        df.withColumn("v", F.when(F.col("id") == 1, "z")
                      .otherwise(F.col("v")))
    ).collect()[0]
    assert changed["content_xor"] != base["content_xor"]
    assert changed["schema_hash"] == base["schema_hash"]

    # NULL and '' are distinct content
    swapped = dataset_fingerprint(
        df.withColumn("v", F.when(F.col("id") == 3, "")
                      .when(F.col("id") == 4, F.lit(None).cast("string"))
                      .otherwise(F.col("v")))
    ).collect()[0]
    assert swapped["content_xor"] != base["content_xor"]

    # a type migration flips the schema hash even if values print alike
    cast = dataset_fingerprint(
        df.withColumn("id", F.col("id").cast("int"))
    ).collect()[0]
    assert cast["schema_hash"] != base["schema_hash"]
    assert cast["content_xor"] == base["content_xor"]

    # empty input: well-defined zero fingerprint
    empty = dataset_fingerprint(df.filter(F.lit(False))).collect()[0]
    assert empty["n_rows"] == 0 and empty["content_xor"] == 0
    assert empty["content_sum"] == 0

    # XOR alone cancels even-multiplicity changes; the modular-sum fold
    # separates {X, X} from {Y, Y}
    xx = dataset_fingerprint(
        spark.createDataFrame([(1, "x"), (1, "x")], "id long, v string")
    ).collect()[0]
    yy = dataset_fingerprint(
        spark.createDataFrame([(2, "y"), (2, "y")], "id long, v string")
    ).collect()[0]
    assert xx["content_xor"] == 0 and yy["content_xor"] == 0  # the trap
    assert xx["content_sum"] != yy["content_sum"]             # the fix

    with _pytest.raises(ValueError):
        dataset_fingerprint(df, ["nope"])

    # native xxhash64 mode: same invariance/sensitivity properties,
    # no string casts (floats fingerprint exactly), Spark-only values
    fast = dataset_fingerprint(df, portable=False).collect()[0]
    fast2 = dataset_fingerprint(
        df.orderBy(F.desc("id")).repartition(3), portable=False
    ).collect()[0]
    assert tuple(fast) == tuple(fast2)
    assert fast["content_xor"] != base["content_xor"]  # different hash
    fast_changed = dataset_fingerprint(
        df.withColumn("v", F.when(F.col("id") == 1, "z")
                      .otherwise(F.col("v"))),
        portable=False,
    ).collect()[0]
    assert fast_changed["content_xor"] != fast["content_xor"]

    # xxhash64 skips nulls; the interleaved isNull flags keep a value
    # migrating across a null neighbor visible: (null, 7) != (7, null)
    a = dataset_fingerprint(
        spark.createDataFrame([(None, 7)], "x long, y long"),
        portable=False,
    ).collect()[0]
    b = dataset_fingerprint(
        spark.createDataFrame([(7, None)], "x long, y long"),
        portable=False,
    ).collect()[0]
    assert a["content_xor"] != b["content_xor"]
