"""Round-9 optimization pin test: minhash_signature_select folds all k
permutation minima in ONE F.aggregate instead of k unrolled
array_min(transform(...)) columns (each higher-order-function
construction costs ~12-15 ms of py4j driver round trips — ~240 ms per
plan for k=16). The fold must be BIT-IDENTICAL to the unrolled form the
DuckDB oracles replay, including NULL/empty-array edge cases."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_framework_spark.functions.dedup import (
    MINHASH_PARAMS,
    minhash_signature_cols,
    minhash_signature_select,
    minhash_signatures,
)


def _hash_df(spark, n, seed):
    rng = random.Random(seed)
    rows = [
        (
            i,
            [rng.randrange(0, 1 << 52) for _ in range(rng.randrange(1, 40))],
        )
        for i in range(n)
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.IntegerType()),
            T.StructField("__sh", T.ArrayType(T.LongType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_fold_matches_unrolled_form(spark):
    df = _hash_df(spark, 300, seed=11)
    got = {
        r["doc_id"]: r
        for r in minhash_signature_select(df, "doc_id").collect()
    }
    ref = {
        r["doc_id"]: r
        for r in df.select("doc_id", *minhash_signature_cols()).collect()
    }
    assert set(got) == set(ref) and len(got) == 300
    k = len(MINHASH_PARAMS)
    for i in got:
        for j in range(k):
            assert got[i][f"mh_{j}"] == ref[i][f"mh_{j}"]


def test_fold_edge_cases_match(spark):
    # empty array, NULL array, NULL elements, single element
    schema = T.StructType(
        [
            T.StructField("doc_id", T.IntegerType()),
            T.StructField("__sh", T.ArrayType(T.LongType())),
        ]
    )
    df = spark.createDataFrame(
        [
            (0, []),
            (1, None),
            (2, [None, 5]),
            (3, [None]),
            (4, [7]),
        ],
        schema,
    )
    got = {
        r["doc_id"]: r
        for r in minhash_signature_select(df, "doc_id").collect()
    }
    ref = {
        r["doc_id"]: r
        for r in df.select("doc_id", *minhash_signature_cols()).collect()
    }
    for i in range(5):
        for j in range(len(MINHASH_PARAMS)):
            assert got[i][f"mh_{j}"] == ref[i][f"mh_{j}"], (i, j)


def test_fold_not_duplicated_into_extractors(spark):
    # the two-step select must survive CollapseProject: the plan should
    # contain the aggregate fold ONCE, not once per mh_i column
    df = _hash_df(spark, 10, seed=3)
    plan = minhash_signature_select(df, "doc_id")._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("aggregate(") == 1


def test_minhash_signatures_end_to_end(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different words here entirely")],
        "doc_id int, text string",
    )
    sig = minhash_signatures(docs, "doc_id", "text").collect()
    assert len(sig) == 3
    assert all(r[f"mh_{j}"] is not None for r in sig for j in range(16))
