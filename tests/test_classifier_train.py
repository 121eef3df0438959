"""Distributed logistic-regression trainer (train_hashed_classifier):
exact equality with a driver-side pure-python reference, partition
invariance (the dyadic-grid sums are order-independent), and
provenance of the committed TRAINED_QUALITY_WEIGHTS."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions.text import (
    TRAINED_QUALITY_BIAS,
    TRAINED_QUALITY_WEIGHTS,
    dyadic_round,
    train_hashed_classifier,
)


def _ref_train(rows, nb, steps, lr):
    """Pure-python replay of the trainer's exact op order: tokens =
    lowercase whitespace split, md5-52bit bucket hash, margin = bias +
    (sum_b cnt_b*w_b)/n_tok (ascending b), residual on the 2^-12 grid,
    per-doc gradient contributions on 2^-30, weights on 2^-20."""
    feats = []
    for text, y in rows:
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        if not toks:
            continue
        cnt = [0] * nb
        for t in toks:
            cnt[int(hashlib.md5(t.encode()).hexdigest()[:13], 16) % nb] += 1
        feats.append((cnt, float(len(toks)), float(y)))
    w = [0.0] * nb
    bias = 0.0
    n = len(feats)
    for _ in range(steps):
        g = [0.0] * nb
        gb = 0.0
        for cnt, ntok, y in feats:
            dot = 0.0
            for b in range(nb):
                dot = dot + cnt[b] * w[b]
            m = bias + dot / ntok
            p = 1.0 / (1.0 + math.exp(-m))
            r = dyadic_round(p - y, 12)
            gb += r
            for b in range(nb):
                g[b] += dyadic_round(r * cnt[b] / ntok, 30)
        w = [dyadic_round(w[b] - lr * (g[b] / n), 20) for b in range(nb)]
        bias = dyadic_round(bias - lr * (gb / n), 20)
    return w, bias, n


def _toy_rows():
    # positives talk about "clean fast spark", negatives about "spam junk"
    rows = []
    for i in range(40):
        rows.append((f"clean fast spark table scan row {i % 5}", 1))
        rows.append((f"spam junk noise garbage click bait {i % 7}", 0))
    rows.append(("   ", 1))  # zero-token doc: excluded from training
    return rows


def test_trainer_matches_python_reference_exactly(spark):
    rows = _toy_rows()
    df = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(rows)],
        "doc_id long, text string, label int",
    )
    model = train_hashed_classifier(
        df, "doc_id", "text", "label", n_buckets=16, steps=5, lr=1.0
    )
    w_ref, b_ref, n_ref = _ref_train(rows, 16, 5, 1.0)
    assert model["n_docs"] == n_ref == 80  # zero-token doc excluded
    assert model["weights"] == w_ref  # exact, not approx
    assert model["bias"] == b_ref

    # the trainer actually learns: log-loss under the trained model is
    # lower than under the zero init, on the training sample itself
    def loss(w, bias):
        tot = 0.0
        for text, y in rows:
            toks = [t for t in re.split(r"\s+", text.lower()) if t]
            if not toks:
                continue
            s = sum(
                w[int(hashlib.md5(t.encode()).hexdigest()[:13], 16) % 16]
                for t in toks
            )
            p = 1.0 / (1.0 + math.exp(-(bias + s / len(toks))))
            p = min(max(p, 1e-12), 1 - 1e-12)
            tot += -(y * math.log(p) + (1 - y) * math.log(1 - p))
        return tot

    assert loss(model["weights"], model["bias"]) < loss([0.0] * 16, 0.0)


def test_trainer_partition_invariant(spark):
    rows = _toy_rows()
    df = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(rows)],
        "doc_id long, text string, label int",
    )
    a = train_hashed_classifier(
        df.repartition(13), "doc_id", "text", "label",
        n_buckets=16, steps=4,
    )
    b = train_hashed_classifier(
        df.coalesce(1), "doc_id", "text", "label",
        n_buckets=16, steps=4,
    )
    assert a["weights"] == b["weights"] and a["bias"] == b["bias"]


def test_trainer_edge_cases(spark):
    import pytest

    # baseline: other session-scoped tests may leave checkpoints cached
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    df = spark.createDataFrame(
        [(1, "a b", 1), (2, None, 0)], "doc_id long, text string, label int"
    )
    # steps=0 keeps the deterministic zero init
    m0 = train_hashed_classifier(
        df, "doc_id", "text", "label", n_buckets=8, steps=0
    )
    assert m0["weights"] == [0.0] * 8 and m0["bias"] == 0.0
    # empty training set
    me = train_hashed_classifier(
        df.where("label IS NULL"), "doc_id", "text", "label",
        n_buckets=8, steps=3,
    )
    assert me["n_docs"] == 0 and me["weights"] == [0.0] * 8
    with pytest.raises(ValueError):
        train_hashed_classifier(
            df, "doc_id", "text", "label", n_buckets=0
        )

    # no cached frame may outlive the calls above
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= before


def test_committed_weights_reproduce_from_fixture(spark):
    """TRAINED_QUALITY_WEIGHTS provenance: retraining on the sf0.01
    documents fixture with tools/train_classifier.py's exact recipe
    reproduces the committed literals bit-for-bit."""
    from data_pipeline_framework_spark.sources.readers import read_parquet

    docs = read_parquet(
        spark, "/root/testdata/sf0.01/documents.parquet"
    ).withColumn(
        "label",
        (F.substring("source", 4, 10).cast("int") % 2 == 0).cast("int"),
    )
    model = train_hashed_classifier(
        docs, "doc_id", "text", "label", n_buckets=64, steps=20, lr=1.0
    )
    assert model["weights"] == TRAINED_QUALITY_WEIGHTS
    assert model["bias"] == TRAINED_QUALITY_BIAS
    assert model["n_docs"] == 500
