"""Op-compiler unit tests (exact-value style, mirroring the reference's
tests/test_quality_monitor.py assertions — SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_framework_spark import apply_ops, compile_ops


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            Row(id=1, name=" Alice ", age=34, dept="eng", salary=100.0),
            Row(id=2, name="bob", age=28, dept="eng", salary=80.0),
            Row(id=3, name="N/A", age=45, dept="sales", salary=None),
            Row(id=4, name="dora", age=None, dept="sales", salary=60.0),
            Row(id=5, name="", age=51, dept="hr", salary=90.0),
        ]
    )


def test_select_include_exclude(people):
    assert apply_ops(people, [{"type": "select", "columns": ["id", "age"]}]).columns == [
        "id",
        "age",
    ]
    assert "salary" not in apply_ops(
        people, [{"type": "select", "exclude": ["salary"]}]
    ).columns


def test_filter_condition_and_predicates(people):
    out = apply_ops(people, [{"type": "filter", "condition": "age > 30"}])
    assert {r.id for r in out.collect()} == {1, 3, 5}
    out = apply_ops(
        people,
        [{"type": "filter", "filters": [
            {"column": "dept", "operator": "in", "value": ["eng", "hr"]},
            {"column": "salary", "operator": ">=", "value": 90.0},
        ]}],
    )
    assert {r.id for r in out.collect()} == {1, 5}


def test_filter_string_predicates(people):
    got = apply_ops(
        people,
        [{"type": "filter", "filters": [
            {"column": "name", "operator": "contains", "value": "o"}]}],
    )
    assert {r.id for r in got.collect()} == {2, 4}


def test_transform_chain(people):
    out = apply_ops(
        people,
        [
            {"type": "transform", "transformations": [
                {"type": "rename", "mapping": {"salary": "pay"}},
                {"type": "cast", "columns": {"age": "double"}},
                {"type": "calculate", "column": "pay2", "expression": "pay * 2"},
                {"type": "string_operations", "columns": ["name"],
                 "operations": ["trim", "upper"]},
            ]},
        ],
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].pay2 == 200.0
    assert rows[1].name == "ALICE"
    assert dict(out.dtypes)["age"] == "double"


def test_fill_null_value_and_mean(people):
    out = apply_ops(
        people,
        [{"type": "transform", "transformations": [
            {"type": "fill_null", "columns": ["salary"], "method": "mean"}]}],
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[3].salary == pytest.approx((100 + 80 + 60 + 90) / 4)


def test_fill_null_ffill(spark):
    df = spark.createDataFrame(
        [Row(k="a", t=1, v=None), Row(k="a", t=2, v=5.0), Row(k="a", t=3, v=None),
         Row(k="b", t=1, v=1.0), Row(k="b", t=2, v=None)]
    )
    out = apply_ops(
        df,
        [{"type": "transform", "transformations": [
            {"type": "fill_null", "columns": ["v"], "method": "ffill",
             "order_by": ["t"], "partition_by": ["k"]}]}],
    )
    got = {(r.k, r.t): r.v for r in out.collect()}
    assert got[("a", 1)] is None          # nothing before
    assert got[("a", 3)] == 5.0           # carried forward
    assert got[("b", 2)] == 1.0


def test_aggregate_naming_and_group_count(people):
    out = apply_ops(
        people,
        [{"type": "aggregate", "group_by": ["dept"],
          "aggregations": {"salary": ["sum", "mean"], "id": "count"}}],
    )
    assert set(out.columns) == {"dept", "salary_sum", "salary_mean", "id_count"}
    out2 = apply_ops(people, [{"type": "aggregate", "group_by": ["dept"]}])
    got = {r.dept: r["count"] for r in out2.collect()}
    assert got == {"eng": 2, "sales": 2, "hr": 1}


def test_join_left_on_right_on(spark, people):
    depts = spark.createDataFrame(
        [Row(dname="eng", floor=3), Row(dname="hr", floor=1)]
    )
    out = apply_ops(
        people,
        [{"type": "join", "right": "depts", "left_on": "dept",
          "right_on": "dname", "how": "left"}],
        tables={"depts": depts},
    )
    rows = {r.id: r.floor for r in out.collect()}
    assert rows[1] == 3 and rows[3] is None


def test_join_anti(spark, people):
    depts = spark.createDataFrame([Row(dept="eng")])
    out = apply_ops(
        people,
        [{"type": "join", "right": depts, "on": "dept", "how": "left_anti"}],
    )
    assert {r.id for r in out.collect()} == {3, 4, 5}


def test_deduplicate_keep_last(spark):
    df = spark.createDataFrame(
        [Row(k="a", t=1, v=10), Row(k="a", t=2, v=20), Row(k="b", t=1, v=30)]
    )
    out = apply_ops(
        df,
        [{"type": "deduplicate", "subset": ["k"], "keep": "last",
          "order_by": ["t"]}],
    )
    got = {r.k: r.v for r in out.collect()}
    assert got == {"a": 20, "b": 30}


def test_clean_standardize_nulls_and_trim(people):
    out = apply_ops(people, [{"type": "clean", "operations": [
        "standardize_nulls", "trim_strings"]}])
    rows = {r.id: r.name for r in out.collect()}
    assert rows[3] is None and rows[5] is None and rows[1] == "Alice"


def test_clean_remove_empty_columns(spark):
    df = spark.createDataFrame([Row(a=1, b=None), Row(a=2, b=None)], "a int, b string")
    out = apply_ops(df, [{"type": "clean", "operations": ["remove_empty_columns"]}])
    assert out.columns == ["a"]


def test_pivot_and_melt_roundtrip(spark):
    df = spark.createDataFrame(
        [Row(k="x", cat="A", v=1.0), Row(k="x", cat="B", v=2.0),
         Row(k="y", cat="A", v=3.0)]
    )
    wide = apply_ops(df, [{"type": "pivot", "index": ["k"], "columns": "cat",
                           "values": ["v"], "aggfunc": "sum",
                           "pivot_values": ["A", "B"]}])
    got = {r.k: (r.A, r.B) for r in wide.collect()}
    assert got == {"x": (1.0, 2.0), "y": (3.0, None)}
    long = apply_ops(wide, [{"type": "melt", "id_vars": ["k"],
                             "value_vars": ["A", "B"],
                             "var_name": "cat", "value_name": "v"}])
    assert long.count() == 4


def test_union_missing_columns(spark):
    a = spark.createDataFrame([Row(x=1, y="p")])
    b = spark.createDataFrame([Row(x=2)])
    out = apply_ops(a, [{"type": "union", "other": b}])
    got = sorted([(r.x, r.y) for r in out.collect()])
    assert got == [(1, "p"), (2, None)]


def test_custom_sql(people):
    out = apply_ops(
        people,
        [{"type": "custom_sql", "view_name": "p",
          "query": "SELECT dept, count(*) AS n FROM p GROUP BY dept"}],
    )
    assert {(r.dept, r.n) for r in out.collect()} == {("eng", 2), ("sales", 2), ("hr", 1)}


def test_limit_sample_repartition(people):
    assert apply_ops(people, [{"type": "limit", "n": 2}]).count() == 2
    assert apply_ops(people, [{"type": "sample", "fraction": 0.99, "seed": 1}]).count() <= 5
    assert apply_ops(
        people, [{"type": "repartition", "num": 2, "columns": ["dept"]}]
    ).rdd.getNumPartitions() == 2


def test_compile_is_lazy_single_plan(people):
    fn = compile_ops([
        {"type": "filter", "condition": "age > 30"},
        {"type": "select", "columns": ["id", "age"]},
    ])
    plan = fn(people)._jdf.queryExecution().optimizedPlan().toString()
    # column pruning + filter present in ONE optimized plan
    assert "age" in plan


def test_unknown_op_raises(people):
    with pytest.raises(ValueError, match="unknown operation"):
        compile_ops([{"type": "frobnicate"}])


def test_custom_op_expression_and_udf(spark):
    import pandas
    import pytest

    from data_pipeline_framework_spark import apply_ops

    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "id int, v double")
    out = apply_ops(df, [
        {"type": "custom", "column": "v2", "expression": "v * v"},
    ])
    assert [r["v2"] for r in out.orderBy("id").collect()] == [4.0, 9.0]

    def celsius(f: pandas.Series) -> pandas.Series:
        return (f - 32.0) * 5.0 / 9.0

    celsius.__annotations__ = {"f": pandas.Series, "return": pandas.Series}
    out = apply_ops(
        df,
        [{"type": "custom", "column": "c", "function": "to_c",
          "args": ["v"], "returns": "double"}],
        udfs={"to_c": celsius},
    )
    got = [round(r["c"], 4) for r in out.orderBy("id").collect()]
    assert got == [round((2.0 - 32) * 5 / 9, 4), round((3.0 - 32) * 5 / 9, 4)]

    with pytest.raises(ValueError, match="not registered"):
        apply_ops(df, [{"type": "custom", "column": "x",
                        "function": "nope", "args": ["v"]}]).collect()


def test_clean_dataset_audit(spark):
    from data_pipeline_framework_spark.operators.cleaning import clean_dataset

    df = spark.createDataFrame(
        [
            (1, "555-123-4567", "a@x.com"),
            (1, "555-123-4567", "a@x.com"),     # dup
            (2, "(555) 999-8888", "bad"),
            (3, None, "c@y.com"),
        ],
        "id int, phone string, email string",
    )
    cleaned, audit = clean_dataset(df, [
        {"operation": "remove_duplicates", "subset": ["id"],
         "keep": "first", "order_by": ["email"]},
        {"operation": "standardize_phones", "column": "phone"},
        {"operation": "validate_emails", "column": "email",
         "strategy": "flag"},
        {"operation": "drop_rows_where", "condition": "id = 3"},
    ])
    by = {a.operation: a for a in audit}
    assert by["remove_duplicates"].rows_before == 4
    assert by["remove_duplicates"].rows_after == 3
    assert by["standardize_phones"].values_changed == 1  # (555) form fixed
    assert by["validate_emails"].values_changed == 1     # 'bad'
    assert by["drop_rows_where"].rows_after == 2
    rows = {r["id"]: r for r in cleaned.collect()}
    assert rows[2]["phone"] == "(555) 999-8888" or rows[2]["phone"]
    assert set(rows) == {1, 2}
    assert audit[0].as_dict()["operation"] == "remove_duplicates"


def test_clean_dataset_audit_is_single_action(spark):
    """The audit threads Observations through ONE terminal action: a
    k-step config must cost well under 1 Spark job per step (the old
    per-step count() shape re-scanned the cumulative plan ~2x/step)."""
    from data_pipeline_framework_spark.operators.cleaning import clean_dataset

    df = spark.createDataFrame(
        [(i % 50, f"555-123-{4000 + i:04d}", f"u{i}@x.com")
         for i in range(200)],
        "id int, phone string, email string",
    )
    config = [
        {"operation": "remove_duplicates", "subset": ["id"],
         "keep": "first", "order_by": ["email"]},
        {"operation": "standardize_phones", "column": "phone"},
        {"operation": "validate_emails", "column": "email",
         "strategy": "flag"},
    ]
    sc = spark.sparkContext
    group = "clean_single_action_test"
    sc.setJobGroup(group, "audit job-count check")
    try:
        cleaned, audit = clean_dataset(df, config)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup(None, None)
    assert len(jobs) <= len(config), (
        f"{len(jobs)} jobs for {len(config)} audited steps"
    )
    assert [a.operation for a in audit] == [c["operation"] for c in config]
    assert audit[0].rows_before == 200 and audit[0].rows_after == 50
    assert audit[1].values_changed == 50  # every phone reformats
    assert audit[2].values_changed == 0   # all emails valid


def test_token_count_op_tokenizers(spark, tmp_path):
    """the token_count op dispatches regex/whitespace/bpe tokenizers and
    honors an explicit merges_path."""
    from data_pipeline_framework_spark import apply_ops

    df = spark.createDataFrame([(1, "the sand and the sea")], ["id", "text"])
    for kind, expect in (("regex", 5), ("whitespace", 5)):
        out = apply_ops(df, [{
            "type": "token_count", "text_column": "text",
            "tokenizer": kind, "output_column": "n",
        }])
        assert out.collect()[0]["n"] == expect
    bpe = apply_ops(df, [{
        "type": "token_count", "text_column": "text", "tokenizer": "bpe",
        "output_column": "n",
    }])
    assert bpe.collect()[0]["n"] >= 5  # packaged merges: subword counts
    p = tmp_path / "m.txt"
    p.write_text("t h\nth e\n")
    custom = apply_ops(df, [{
        "type": "token_count", "text_column": "text", "tokenizer": "bpe",
        "merges_path": str(p), "output_column": "n",
    }])
    # 'the'->1 token twice, sand/and/sea stay chars: 1+4+3+1+3 = 12
    assert custom.collect()[0]["n"] == 12
    with pytest.raises(ValueError, match="unsupported tokenizer"):
        apply_ops(df, [{"type": "token_count", "text_column": "text",
                        "tokenizer": "nope"}])


def test_aggregate_describe_fallback(spark):
    """aggregate with neither group_by nor aggregations -> summary stats
    (reference pandas_processor.py:176-177, spark_processor.py:182-183)."""
    from data_pipeline_framework_spark import apply_ops

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id int, v double"
    )
    out = apply_ops(df, [{"type": "aggregate"}])
    rows = {r["summary"]: r for r in out.collect()}
    assert rows["count"]["v"] == "3"
    assert float(rows["mean"]["v"]) == 20.0
    assert float(rows["max"]["v"]) == 30.0


def test_curation_ops_in_config_pipeline(spark):
    """the round-3 curation operators drive from YAML-shaped op lists."""
    from data_pipeline_framework_spark.plans.compiler import compile_ops

    df = spark.createDataFrame(
        [(i, "src%d" % (i % 2), "w%d x y z" % i, 4) for i in range(200)],
        "doc_id long, source string, text string, toks long",
    )
    fn = compile_ops([
        {"type": "hash_split", "id_column": "doc_id",
         "fractions": {"train": 0.9, "test": 0.1}},
        {"type": "hash_sample", "id_column": "doc_id", "rate": 0.5},
    ])
    out = fn(df)
    assert set(out.columns) == set(df.columns) | {"split"}
    n = out.count()
    assert 0 < n < 200  # sampled
    assert set(r["split"] for r in out.select("split").distinct().collect()) \
        <= {"train", "test"}

    chunked = compile_ops([
        {"type": "chunk", "id_column": "doc_id", "text_column": "text",
         "window": 2, "stride": 2},
    ])(df)
    assert chunked.columns == ["doc_id", "chunk_id", "n_tokens", "chunk_text"]
    assert chunked.count() == 400  # 4 tokens / window 2 -> 2 chunks each

    mixed = compile_ops([
        {"type": "mixture_sample", "id_column": "doc_id",
         "source_column": "source", "token_column": "toks",
         "weights": {"src0": 0.5, "src1": 0.5}},
    ])(df)
    assert mixed.count() > 0

    z = compile_ops([
        {"type": "zorder", "bits": 4, "partitions": 2,
         "columns": [{"column": "doc_id", "min": 0, "max": 200},
                     {"column": "toks", "min": 0, "max": 10}]},
    ])(df)
    assert z.count() == 200 and set(z.columns) == set(df.columns)


def test_checkpoint_op_truncates_lineage(spark, tmp_path):
    from data_pipeline_framework_spark.plans.compiler import compile_ops

    df = spark.range(100).withColumnRenamed("id", "x")
    # durable path variant: materializes parquet and re-reads
    p = str(tmp_path / "ckpt")
    out = compile_ops([
        {"type": "filter", "condition": "x > 10"},
        {"type": "checkpoint", "path": p},
        {"type": "filter", "condition": "x < 50"},
    ])(df)
    assert out.count() == 39
    import os
    assert any(f.endswith(".parquet") for f in os.listdir(p))
    # downstream plan reads from the checkpoint, not the original range
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ckpt" in plan and "Range" not in plan

    # local (non-durable) variant also cuts the plan back to a scan
    out2 = compile_ops([
        {"type": "checkpoint"},
        {"type": "filter", "condition": "x % 2 = 0"},
    ])(df)
    assert out2.count() == 50


def test_cap_and_weighted_sample_ops(spark):
    from data_pipeline_framework_spark.plans.compiler import compile_ops

    df = spark.createDataFrame(
        [(i, "dom%d" % (i % 3), float(1 + i % 5)) for i in range(90)],
        "doc_id long, domain string, w double",
    )
    capped = compile_ops([
        {"type": "cap_per_key", "keys": ["domain"], "cap": 7,
         "id_column": "doc_id"},
    ])(df)
    per = {r["domain"]: r["n"] for r in
           capped.groupBy("domain").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    assert all(n == 7 for n in per.values())

    sampled = compile_ops([
        {"type": "weighted_sample", "id_column": "doc_id",
         "weight_column": "w", "k": 20},
    ])(df)
    assert sampled.count() == 20


def test_analytics_ops_in_config_pipeline(spark):
    """funnel / cohort_retention / bm25 / semantic_dedup drive from
    YAML-shaped op lists."""
    import datetime as dt

    from data_pipeline_framework_spark.plans.compiler import compile_ops

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, t0, "view"), (1, t0 + dt.timedelta(minutes=1), "click"),
            (2, t0, "view"),
            (2, t0 + dt.timedelta(days=8), "view"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    conv = compile_ops(
        [{"type": "funnel", "steps": ["view", "click"]}]
    )(ev)
    rows = {r["step"]: r["users"] for r in conv.collect()}
    assert rows == {1: 2, 2: 1}

    stages = compile_ops(
        [{"type": "funnel", "steps": ["view", "click"],
          "output": "stages"}]
    )(ev)
    assert set(stages.columns) == {
        "user_id", "stages_completed", "step1_ts", "completed_ts"
    }

    ret = compile_ops(
        [{"type": "cohort_retention", "period": "week"}]
    )(ev)
    m = {(r["cohort"], r["period_offset"]): r["n_users"]
         for r in ret.collect()}
    assert m[(t0, 0)] == 2 and m[(t0, 1)] == 1

    docs = spark.createDataFrame(
        [(0, "spark shuffles data"), (1, "cats sleep all day")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("q0", "spark data")], "query_id string, query_text string"
    )
    hits = compile_ops(
        [{"type": "bm25", "queries_table": "qs", "k": 1}],
        tables={"qs": queries},
    )(docs)
    assert [r["doc_id"] for r in hits.collect()] == [0]

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.999, 0.01]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    kept = compile_ops(
        [{"type": "semantic_dedup", "threshold": 0.95, "n_cells": 1,
          "dim": 2, "filter": True}]
    )(emb)
    assert sorted(r["vec_id"] for r in kept.collect()) == [0, 2]


def test_op_classifier_score_paths(spark):
    """classifier_score: explicit weights score like the library fn;
    the committed-default path adds the score columns; in-pipeline
    training matches calling the trainer directly."""
    from data_pipeline_framework_spark.functions.text import (
        hashed_classifier_score,
        train_hashed_classifier,
    )
    from data_pipeline_framework_spark.plans.compiler import compile_ops

    docs = spark.createDataFrame(
        [(0, "clean fast spark", 1), (1, "spam junk bait", 0)] * 10,
        "doc_id long, text string, lab int",
    ).withColumn("doc_id", F.monotonically_increasing_id())
    w = [0.25] * 8
    got = compile_ops(
        [{"type": "classifier_score", "weights": w, "bias": 0.5,
          "n_buckets": 8}]
    )(docs)
    want = hashed_classifier_score(docs, "doc_id", "text", w, bias=0.5)
    assert (
        {(r["doc_id"], r["margin"], r["prob"]) for r in got.collect()}
        == {(r["doc_id"], r["margin"], r["prob"]) for r in want.collect()}
    )

    # committed default model
    d = compile_ops([{"type": "classifier_score"}])(docs)
    assert {"prob", "margin", "n_tokens"} <= set(d.columns)

    # in-pipeline training == the trainer called directly
    trained = compile_ops(
        [{"type": "classifier_score", "train_label_column": "lab",
          "n_buckets": 16, "steps": 3, "min_score": 0.5}]
    )(docs)
    model = train_hashed_classifier(
        docs, "doc_id", "text", "lab", n_buckets=16, steps=3
    )
    direct = hashed_classifier_score(
        docs, "doc_id", "text", model["weights"], bias=model["bias"]
    ).filter("prob >= 0.5")
    assert (
        sorted(r["doc_id"] for r in trained.collect())
        == sorted(r["doc_id"] for r in direct.collect())
    )


def test_op_remove_duplicate_spans_rewrites_text(spark):
    df = spark.createDataFrame(
        [(1, "a b x y z c"), (2, "p x y z q r")],
        "doc_id long, text string",
    )
    fn = compile_ops([
        {"type": "remove_duplicate_spans",
         "params": {"n": 3, "id_column": "doc_id",
                    "text_column": "text"}},
    ])
    out = {r["doc_id"]: r for r in fn(df).collect()}
    assert out[1]["text"] == "a b x y z c"
    assert out[2]["text"] == "p q r"
    assert out[2]["removed_tokens"] == 3


def test_op_blocklist_filter_drops_over_cap(spark):
    df = spark.createDataFrame(
        [(1, "bad bad bad"), (2, "mostly clean text bad")],
        "doc_id long, text string",
    )
    fn = compile_ops([
        {"type": "blocklist_filter",
         "params": {"blocklist": ["bad"], "max_fraction": 0.5}},
    ])
    got = [r["doc_id"] for r in fn(df).collect()]
    assert got == [2]
    annotate = compile_ops([
        {"type": "blocklist_filter",
         "params": {"blocklist": ["bad"], "max_fraction": None}},
    ])
    assert annotate(df).count() == 2


def test_op_curriculum_and_pack_shards(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7), 100) for i in range(40)],
        "doc_id long, score double, n_tokens long",
    )
    fn = compile_ops([
        {"type": "curriculum",
         "params": {"score_column": "score", "id_column": "doc_id",
                    "n_phases": 4, "n_buckets": 4}},
        {"type": "pack_shards",
         "params": {"order_column": "doc_id", "token_column": "n_tokens",
                    "budget": 1000}},
    ])
    out = fn(df)
    rows = out.collect()
    assert {r["phase"] for r in rows} == {1, 2, 3, 4}
    assert max(r["shard"] for r in rows) == 3   # 40*100 / 1000


def test_op_char_entropy_band_filter(spark):
    df = spark.createDataFrame(
        [(1, "aaaaaaaaaaaaaaaa"), (2, "a normal english sentence here")],
        "doc_id long, text string",
    )
    fn = compile_ops([
        {"type": "char_entropy", "params": {"min_bits": 1.5}},
    ])
    rows = fn(df).collect()
    assert [r["doc_id"] for r in rows] == [2]
    assert {"entropy_bits", "n_chars", "distinct_chars"} <= set(
        rows[0].asDict()
    )
    annotate = compile_ops([{"type": "char_entropy", "params": {}}])
    assert annotate(df).count() == 2


def test_op_centroid_score_and_winnowing(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 1), (2, [0.9, 0.1], 0), (3, [-1.0, 0.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    fn = compile_ops([
        {"type": "centroid_score",
         "params": {"seed_filter": "label = 1", "min_cosine": 0.0}},
    ])
    got = [r["vec_id"] for r in fn(emb).orderBy("vec_id").collect()]
    assert got == [1, 2]      # 3 is anti-aligned, dropped

    docs = spark.createDataFrame(
        [(1, "shared stolen fragment here"), (2, "shared stolen fragment too")],
        "doc_id long, text string",
    )
    wfn = compile_ops([
        {"type": "winnowing", "params": {"k": 4, "window": 3}},
    ])
    rows = {r["doc_id"]: r for r in wfn(docs).collect()}
    assert set(rows[1]["fingerprints"]) & set(rows[2]["fingerprints"])


def test_op_hamming_dedup_and_k_anonymity(spark):
    sig = spark.createDataFrame(
        [(1, 0b1010), (2, 0b1010), (3, 0b0101_0101)],
        "doc_id long, h long",
    )
    fn = compile_ops([
        {"type": "hamming_dedup",
         "params": {"hash_column": "h", "bits": 8, "max_hamming": 1}},
    ])
    kept = sorted(r["doc_id"] for r in fn(sig).collect())
    assert kept == [1, 3]  # 2 is an exact dup of 1

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 9)], "g string, v int"
    )
    sup = compile_ops([
        {"type": "k_anonymity",
         "params": {"quasi_columns": ["g"], "k": 2, "mode": "suppress"}},
    ])
    assert sorted(r["v"] for r in sup(df).collect()) == [1, 2, 3]
    summ = compile_ops([
        {"type": "k_anonymity",
         "params": {"quasi_columns": ["g"], "k": 2, "mode": "summary"}},
    ])
    s = summ(df).first()
    assert s["n_classes"] == 2 and s["classes_below_k"] == 1


def test_op_diversity_sample_and_threshold_sweep(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    fn = compile_ops([
        {"type": "diversity_sample",
         "params": {"k_per_cell": 1, "n_cells": 2, "dim": 2}},
    ])
    out = fn(emb)
    assert {"cell", "proto_cos"} <= set(out.columns)
    # one representative per populated cell, original columns kept
    assert out.count() == out.select("cell").distinct().count()

    scores = spark.createDataFrame(
        [(0.2, 0), (0.8, 1)], "s double, y int"
    )
    sweep = compile_ops([
        {"type": "threshold_sweep",
         "params": {"score_column": "s", "label_column": "y",
                    "n_thresholds": 4}},
    ])
    rows = sweep(scores).collect()
    assert len(rows) == 4 and {r["tp"] for r in rows} <= {0, 1, 2}


def test_op_round5_analytics_ops(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, t0, 1, "view"), (1, t0 + dt.timedelta(minutes=1), 2, "buy"),
         (2, t0, 3, "view"), (2, t0 + dt.timedelta(minutes=2), 4, "view")],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    trans = compile_ops([
        {"type": "event_transitions",
         "params": {"tiebreak_column": "event_id"}},
    ])(ev)
    got = {(r["from_type"], r["to_type"]): r["n"] for r in trans.collect()}
    assert got == {("view", "buy"): 1, ("view", "view"): 1}

    paths = compile_ops([
        {"type": "top_paths",
         "params": {"tiebreak_column": "event_id", "max_steps": 2, "k": 5}},
    ])(ev)
    assert {(r["path"], r["n_users"]) for r in paths.collect()} == {
        ("view > buy", 1), ("view > view", 1)
    }

    pts = spark.createDataFrame(
        [("a", float(x), 2.0 * x + 1.0) for x in range(6)],
        "g string, x double, y double",
    )
    ols = compile_ops([
        {"type": "grouped_ols",
         "params": {"group_columns": ["g"], "x_column": "x",
                    "y_column": "y"}},
    ])(pts)
    row = ols.collect()[0]
    assert row["slope"] == pytest.approx(2.0)

    docs = spark.createDataFrame(
        [(i, (i * 13) % 300 + 1) for i in range(50)],
        "doc_id long, n_tok long",
    )
    batches = compile_ops([
        {"type": "pack_length_batches",
         "params": {"id_column": "doc_id", "token_column": "n_tok",
                    "batch_tokens": 600, "n_shards": 2}},
    ])(docs)
    rows = batches.collect()
    assert len(rows) == 50
    assert all(
        r["batch_n_docs"] * r["batch_max_len"] <= 600
        or r["batch_n_docs"] == 1
        for r in rows
    )


def test_op_round6_analytics_ops(spark):
    import random

    rng = random.Random(3)
    rows = [("R" if i % 2 else "N", rng.gauss(0, 1)) for i in range(300)]
    df = spark.createDataFrame(rows, "flag string, v double")
    ks = compile_ops([
        {"type": "ks_drift",
         "params": {"column": "v", "side_a": "flag = 'R'",
                    "side_b": "flag = 'N'", "n_buckets": 4}},
    ])(df)
    row = ks.first()
    assert 0.0 <= row["ks_stat"] <= 1.0 and row["n_a"] == 150

    pans = spark.createDataFrame(
        [(1, "card 4111 1111 1111 1111 ok")], "id long, text string"
    )
    out = compile_ops([
        {"type": "luhn_scan",
         "params": {"column": "text", "id_columns": ["id"]}},
    ])(pans).first()
    assert out["luhn_valid"] and out["pan_network"] == "visa"

    vals = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(list(range(1, 10)) + [99])],
        "id long, value double",
    )
    flagged = compile_ops([
        {"type": "robust_outliers", "params": {"column": "value"}},
    ])(vals).collect()
    assert [r["id"] for r in flagged] == [9]

    vecs = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(20)]
    vecs += [(100 + i, [x + rng.gauss(0, 0.01) for x in v])
             for i, v in vecs[:5]]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    mined = compile_ops([
        {"type": "bitext_mine",
         "params": {"side_a": "vec_id < 100", "side_b": "vec_id >= 100",
                    "k": 3}},
    ])(emb)
    got = {r["src_id"]: r["tgt_id"] for r in mined.collect()}
    for i in range(5):
        assert got[i] == 100 + i


def test_op_round7_analytics_ops(spark):
    # gini: grouped and the distributed ungrouped kernel
    rows = [("a", 10)] * 5 + [("b", 0)] * 4 + [("b", 100)]
    df = spark.createDataFrame(rows, "g string, x long")
    grouped = {r["g"]: r["gini"] for r in compile_ops([
        {"type": "gini", "params": {"column": "x", "group_by": ["g"]}},
    ])(df).collect()}
    assert grouped["a"] == pytest.approx(0.0, abs=1e-12)
    assert grouped["b"] == pytest.approx(0.8, abs=1e-12)
    glob = compile_ops([
        {"type": "gini", "params": {"column": "x"}},
    ])(df).first()
    assert glob["n"] == 10 and glob["total"] == 150

    # max_window_group=0 forces the bucketed grouped kernel through the
    # DSL — identical values (r8 size dispatch)
    bucketed = {r["g"]: r["gini"] for r in compile_ops([
        {"type": "gini", "params": {"column": "x", "group_by": ["g"],
                                    "max_window_group": 0}},
    ])(df).collect()}
    assert bucketed == grouped

    # priority_sample: exact-size deterministic bottom-k through the DSL
    ids = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    samp = compile_ops([
        {"type": "priority_sample", "params": {"k": 10}},
    ])(ids).collect()
    assert len(samp) == 10
    again = compile_ops([
        {"type": "priority_sample", "params": {"k": 10}},
    ])(ids.repartition(5)).collect()
    assert sorted(r["doc_id"] for r in samp) == sorted(
        r["doc_id"] for r in again
    )

    # bpe_encode -> bpe_detokenize round-trips the normalized text
    docs = spark.createDataFrame(
        [(1, "The SAND and the sea!"), (2, None)], "doc_id long, text string"
    )
    rt = compile_ops([
        {"type": "bpe_encode", "params": {"column": "text"}},
        {"type": "bpe_detokenize", "params": {"column": "bpe_ids"}},
    ])(docs).collect()
    got = {r["doc_id"]: r["text_decoded"] for r in rt}
    assert got[1] == "the sand and the sea"
    assert got[2] == ""  # null text -> empty id stream -> empty string

    # soft_dedup: duplicated text shares weight, unique text weighs 1.0
    corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again " * 4)
         for i in (1, 2)]
        + [(3, "completely different content about spark engines and "
               "columnar execution at scale for training corpora")],
        "doc_id long, text string",
    )
    weights = {r["doc_id"]: r["weight"] for r in compile_ops([
        {"type": "soft_dedup",
         "params": {"id_column": "doc_id", "text_column": "text"}},
    ])(corpus).collect()}
    assert weights[1] == weights[2] == 0.5 and weights[3] == 1.0

    # language_consistency: mixed doc flagged, clean doc clean
    en = ("the cat sat on the mat and it was good. "
          "it is a fine day for the team.")
    de = "der hund und die katze sind nicht hier und das ist ein tag."
    docs2 = spark.createDataFrame(
        [(1, en), (2, en + " " + de)], "doc_id long, text string"
    )
    lc = {r["doc_id"]: r for r in compile_ops([
        {"type": "language_consistency",
         "params": {"id_column": "doc_id", "column": "text"}},
    ])(docs2).collect()}
    assert lc[1]["majority_lang"] == "en" and lc[1]["n_disagree"] == 0
    assert lc[2]["n_disagree"] >= 1
