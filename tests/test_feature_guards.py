"""Guard-rail tests for feature operators: bounded category discovery
(no unbounded distinct-collect at 100 TB) and chunking edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark.operators.features import (
    create_categorical_features,
)
from data_pipeline_framework_spark.functions.text import chunk_documents


def test_onehot_high_cardinality_raises_not_ooms(spark):
    df = spark.range(10_000).select(
        F.concat(F.lit("cat_"), F.col("id")).alias("c")
    )
    with pytest.raises(ValueError, match="more than 256 distinct"):
        create_categorical_features(df, "c", encoding="onehot")


def test_onehot_small_cardinality_still_auto_discovers(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("a",), (None,)], ["c"]
    )
    out = create_categorical_features(df, "c", encoding="onehot")
    assert set(out.columns) == {"c", "c_a", "c_b"}
    rows = {(r["c"], r["c_a"], r["c_b"]) for r in out.collect()}
    assert ("a", 1, 0) in rows and ("b", 0, 1) in rows


def test_onehot_explicit_values_skip_discovery(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("v"), F.col("id") % 3).alias("c")
    )
    out = create_categorical_features(
        df, "c", encoding="onehot", one_hot_values=["v0", "v1"]
    )
    assert set(out.columns) == {"c", "c_v0", "c_v1"}


def test_chunk_stride_beyond_window_emits_no_empty_chunk(spark):
    # n=5 tokens, window=4, stride=10: the second chunk start (index 10)
    # is past the document; it must be dropped, not emitted empty.
    df = spark.createDataFrame([(1, "a b c d e")], ["id", "text"])
    rows = chunk_documents(
        df, "id", "text", window=4, stride=10
    ).orderBy("chunk_id").collect()
    assert [(r["chunk_id"], r["n_tokens"], r["chunk_text"]) for r in rows] == [
        (0, 4, "a b c d")
    ]
    assert all(r["n_tokens"] > 0 for r in rows)


def test_chunk_gapped_sampling_keeps_real_tail(spark):
    # stride > window with a tail that DOES exist: 12 tokens, window=3,
    # stride=5 -> starts 0,5,10; last chunk is the 2-token tail.
    text = " ".join(f"t{i}" for i in range(12))
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    rows = chunk_documents(
        df, "id", "text", window=3, stride=5
    ).orderBy("chunk_id").collect()
    assert [(r["chunk_id"], r["chunk_text"]) for r in rows] == [
        (0, "t0 t1 t2"), (1, "t5 t6 t7"), (2, "t10 t11"),
    ]
