"""Round-9 optimization pin tests: the transform-based expression
builders in functions/similarity.py (lsh_signature, random_projection,
_literal_cell_argmin, pq_encode / pq_topk distance tables) replaced
unrolled per-element expression lists to cut driver-side plan
construction (~12 ms of py4j round trips per higher-order-function
built). These tests pin the new forms BIT-IDENTICAL to the old unrolled
forms on random data — the oracles replay exact floats, so any drift is
a correctness regression, not a style choice."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions import similarity as SIM
from data_pipeline_framework_spark.functions.similarity import (
    _dot,
    _double_lit,
    _literal_cell_argmin,
    _nested_double_lit,
    _sq_dist_lit,
    hyperplanes,
    lsh_signature,
)


def _vec_df(spark, n, dim, seed):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def _unrolled_signature(vec_col, planes):
    """The pre-round-9 unrolled form, verbatim."""
    P = _nested_double_lit([[float(x) for x in p] for p in planes])
    bits = []
    for j in range(len(planes)):
        p = F.element_at(P, j + 1)
        bits.append(
            F.when(_dot(vec_col, p) > 0, F.shiftleft(F.lit(1).cast("long"), j))
            .otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def test_lsh_signature_transform_matches_unrolled(spark):
    planes = hyperplanes(8, 12, seed=7)
    df = _vec_df(spark, 200, 8, seed=1)
    got = df.select(
        "vec_id",
        lsh_signature(F.col("embedding"), planes).alias("sig"),
        _unrolled_signature(F.col("embedding"), planes).alias("ref"),
    ).collect()
    assert all(r["sig"] == r["ref"] for r in got)
    # signatures are non-trivial (not all zero / all equal)
    assert len({r["sig"] for r in got}) > 1


def test_random_projection_transform_matches_unrolled(spark):
    dim, out_dim, seed = 10, 6, 11
    df = _vec_df(spark, 150, dim, seed=2)
    planes = hyperplanes(dim, out_dim, seed)
    scale = 1.0 / (out_dim ** 0.5)
    P = _nested_double_lit([[float(x) for x in p] for p in planes])
    v = F.col("embedding").cast("array<double>")
    ref = F.array(*[
        (_dot(v, F.element_at(P, j + 1)) * F.lit(scale))
        for j in range(len(planes))
    ])
    proj = SIM.random_projection(
        df, out_dim=out_dim, vec_col="embedding", out_col="proj",
        seed=seed, dim=dim,
    ).withColumn("ref", ref)
    got = proj.select("proj", "ref").collect()
    for r in got:
        assert list(r["proj"]) == list(r["ref"])


def test_literal_cell_argmin_matches_unrolled(spark):
    rng = random.Random(3)
    dim, n_cells = 6, 9
    centers = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_cells)
    ]
    df = _vec_df(spark, 300, dim, seed=4).withColumn(
        "__v", F.col("embedding").cast("array<double>")
    )
    P = _nested_double_lit([[float(x) for x in c] for c in centers])
    cells = []
    for j in range(n_cells):
        c = F.element_at(P, j + 1)
        d2 = _dot(F.col("__v"), F.col("__v")) - 2.0 * _dot(
            F.col("__v"), c
        ) + _dot(c, c)
        cells.append(F.struct(d2.alias("d"), F.lit(j).alias("cell")))
    ref = F.array_min(F.array(*cells))["cell"]
    got = df.select(
        _literal_cell_argmin(centers).alias("cell"), ref.alias("ref")
    ).collect()
    assert all(r["cell"] == r["ref"] for r in got)
    assert len({r["cell"] for r in got}) > 1


def test_python_self_dot_matches_spark_fold(spark):
    """_literal_cell_argmin now folds centroid self-dots in Python;
    pin the fold order against Spark's aggregate(zip_with(c, c))."""
    rng = random.Random(5)
    centers = [[rng.uniform(-3, 3) for _ in range(7)] for _ in range(5)]
    py = []
    for c in centers:
        acc = 0.0
        for x in c:
            acc = acc + float(x) * float(x)
        py.append(acc)
    row = spark.range(1).select(*[
        _dot(
            _double_lit(c), _double_lit(c)
        ).alias(f"d{i}")
        for i, c in enumerate(centers)
    ]).first()
    assert [row[f"d{i}"] for i in range(len(centers))] == py


def test_pq_encode_transform_matches_unrolled(spark):
    rng = random.Random(6)
    m, k, sub = 3, 5, 4
    dim = m * sub
    codebooks = [
        [[rng.uniform(-1, 1) for _ in range(sub)] for _ in range(k)]
        for _ in range(m)
    ]
    df = _vec_df(spark, 200, dim, seed=8)
    enc = SIM.pq_encode(df, codebooks, id_col="vec_id", vec_col="embedding")

    v = F.col("embedding").cast("array<double>")
    ref_codes = []
    for j, book in enumerate(codebooks):
        sv = F.slice(v, j * sub + 1, sub)
        B = _nested_double_lit([[float(x) for x in c] for c in book])
        cands = [
            F.struct(
                _sq_dist_lit(sv, F.element_at(B, i + 1)).alias("d"),
                F.lit(i).alias("i"),
            )
            for i in range(len(book))
        ]
        ref_codes.append(F.array_min(F.array(*cands))["i"].cast("int"))
    ref = df.select("vec_id", F.array(*ref_codes).alias("ref"))
    got = (
        enc.join(ref, "vec_id")
        .select("pq_code", "ref")
        .collect()
    )
    for r in got:
        assert list(r["pq_code"]) == list(r["ref"])
