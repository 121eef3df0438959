"""int8 embedding quantization + ORC source/sink round-trips."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions.similarity import (
    quantize_embeddings,
)
from data_pipeline_framework_spark.sinks.writers import write_orc
from data_pipeline_framework_spark.sources.readers import read_orc


def test_quantize_embeddings_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [2.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert got[1]["q"] == [64, -127, 32]
    assert got[1]["scale"] == pytest.approx(1.0 / 127.0)
    # reconstruction error bounded by scale/2
    assert got[1]["max_abs_err"] <= got[1]["scale"] / 2 + 1e-12
    # all-zero vector: zero codes, zero scale, zero error
    assert got[2]["q"] == [0, 0, 0]
    assert got[2]["scale"] == 0.0 and got[2]["max_abs_err"] == 0.0
    # max element maps exactly to 127
    assert got[3]["q"] == [127] and got[3]["max_abs_err"] == 0.0


def test_quantize_embeddings_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    plan = quantize_embeddings(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_orc_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)],
        "k long, grp string, v double",
    )
    path = os.path.join(str(tmp_path), "orc")
    write_orc(df, path, mode="replace", partition_by=["grp"])
    # hive layout on disk
    assert any(d.startswith("grp=") for d in os.listdir(path))
    back = read_orc(spark, path, source_file_column=True)
    rows = sorted(
        (r["k"], r["grp"], r["v"]) for r in back.collect()
    )
    assert rows == [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)]
    assert back.filter(F.col("_source_file").isNull()).count() == 0


def test_orc_partition_pruning(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("p")
    )
    path = os.path.join(str(tmp_path), "orc2")
    write_orc(df, path, mode="replace", partition_by=["p"])
    plan = (
        read_orc(spark, path).filter(F.col("p") == 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # partition filter must prune at scan time, not post-filter
    assert "PartitionFilters: [" in plan and "(p" in plan


def test_random_projection_preserves_distances(spark):
    import math
    import random as pyrandom

    from data_pipeline_framework_spark.functions.similarity import (
        random_projection,
    )

    rng = pyrandom.Random(3)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["proj"]
           for r in random_projection(df, out_dim=16, dim=64).collect()}
    orig = dict(vecs)

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    # JL: projected distances track original distances within a loose
    # factor at k=16 (ratios concentrate around 1)
    ratios = []
    for i in range(0, 40, 7):
        for j in range(i + 1, 40, 7):
            ratios.append(d(out[i], out[j]) / d(orig[i], orig[j]))
    avg = sum(ratios) / len(ratios)
    assert 0.7 < avg < 1.3
    assert all(0.3 < r < 1.9 for r in ratios)


def test_random_projection_no_shuffle_no_fit(spark):
    from data_pipeline_framework_spark.functions.similarity import (
        random_projection,
    )

    df = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id long, embedding array<double>"
    )
    out = random_projection(df, out_dim=4, dim=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow projection, zero jobs before it


def test_quantized_topk_recall_vs_full_precision(spark):
    import random as pyrandom

    from data_pipeline_framework_spark.functions.similarity import (
        cosine_topk,
        quantized_cosine_topk,
    )

    rng = pyrandom.Random(11)
    corpus = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, [rng.gauss(0, 1) for _ in range(32)])],
        "query_id long, embedding array<double>",
    )
    full = {r["vec_id"] for r in cosine_topk(corpus, queries, k=10).collect()}
    quant = {r["vec_id"]
             for r in quantized_cosine_topk(corpus, queries, k=10).collect()}
    # int8 quantization preserves most of the top-10 neighborhood
    assert len(full & quant) >= 8


def test_pq_topk_approximates_exact_l2(spark):
    import math
    import random as pyrandom

    from data_pipeline_framework_spark.functions.similarity import (
        pq_codebooks,
        pq_encode,
        pq_topk,
    )

    rng = pyrandom.Random(21)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(250)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        rows[:1], "query_id long, embedding array<double>"
    )
    books = pq_codebooks(16, m=4, k=8, seed=5)
    got = pq_topk(corpus, queries, books, k=25).collect()
    assert len(got) == 25 and got[0]["rank"] == 1
    # exact L2 ground truth in Python
    q = rows[0][1]
    exact = sorted(
        rows, key=lambda r: sum((a - b) ** 2 for a, b in zip(r[1], q))
    )
    top_exact = {r[0] for r in exact[:25]}
    overlap = len({r["vec_id"] for r in got} & top_exact)
    # data-independent 3-bit codebooks: coarse, but far above chance
    # (random 25-of-250 would overlap ~2.5; observed 7 with this seed)
    assert overlap >= 6
    # codes are within range and deterministic
    enc = pq_encode(corpus, books)
    codes = enc.select("pq_code").first()[0]
    assert len(codes) == 4 and all(0 <= c < 8 for c in codes)


def test_trained_pq_codebooks_beat_fixed(spark):
    import random as pyrandom

    from data_pipeline_framework_spark.functions.similarity import (
        pq_codebooks,
        pq_topk,
        train_pq_codebooks,
    )

    rng = pyrandom.Random(33)
    # off-center data: fixed zero-mean codebooks quantize it terribly,
    # trained codebooks move to the data (observed 3 -> 10 overlap)
    rows = [
        (i, [5.0 + rng.gauss(0, 1) for _ in range(16)])
        for i in range(250)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        rows[:1], "query_id long, embedding array<double>"
    )
    q = rows[0][1]
    exact = sorted(
        rows, key=lambda r: sum((a - b) ** 2 for a, b in zip(r[1], q))
    )
    top_exact = {r[0] for r in exact[:25]}

    def overlap(books):
        got = {r["vec_id"]
               for r in pq_topk(corpus, queries, books, k=25).collect()}
        return len(got & top_exact)

    fixed = overlap(pq_codebooks(16, m=4, k=8, seed=5))
    trained = overlap(
        train_pq_codebooks([r[1] for r in rows[:200]], m=4, k=8, seed=5)
    )
    assert trained > fixed
    assert trained >= 8


def test_random_projection_empty_input_clear_error(spark):
    import pytest as _pytest

    from data_pipeline_framework_spark.functions.similarity import (
        random_projection,
    )

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="pass dim"):
        random_projection(empty)
    # with dim given, empty in -> empty out, no probe
    assert random_projection(empty, dim=8, out_dim=2).count() == 0
