"""BM25 retrieval, TF-IDF keyword extraction, and semantic dedup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions.retrieval import (
    bm25_topk,
    keyword_topk,
)
from data_pipeline_framework_spark.functions.similarity import (
    fixed_codebook,
    semantic_dedup,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown cat sleeps"),
        (2, "spark shuffles the quick data across executors"),
        (3, "dogs and cats and dogs again dogs"),
        (4, "completely unrelated text about volcanoes"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bm25_ref(corpus_rows, query_terms, k1=1.2, b=0.75):
    """Plain-python BM25 reference (same Lucene idf)."""
    docs = {i: t.lower().split() for i, t in corpus_rows}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    out = {}
    for term in set(query_terms):
        df = sum(1 for v in docs.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, toks in docs.items():
            tf = toks.count(term)
            if tf == 0:
                continue
            norm = tf + k1 * (1 - b + b * len(toks) / avgdl)
            out[i] = out.get(i, 0.0) + idf * tf * (k1 + 1) / norm
    return out


def test_bm25_matches_reference(spark, corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    queries = spark.createDataFrame(
        [("q0", "quick dogs")], ["query_id", "query_text"]
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(corpus, queries, k=10).collect()
    }
    want = _bm25_ref(rows, ["quick", "dogs"])
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9)


def test_bm25_rank_order_and_k(spark, corpus):
    queries = spark.createDataFrame(
        [("q0", "quick dogs"), ("q1", "volcanoes")],
        ["query_id", "query_text"],
    )
    out = bm25_topk(corpus, queries, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) <= 2 for v in by_q.values())
    for v in by_q.values():
        scores = [r["score"] for r in sorted(v, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
    # q1 matches only doc 4
    assert [r["doc_id"] for r in by_q["q1"]] == [4]


def test_bm25_repeated_query_terms_count_once(spark, corpus):
    q1 = spark.createDataFrame([("q", "dogs")], ["query_id", "query_text"])
    q2 = spark.createDataFrame(
        [("q", "dogs dogs dogs")], ["query_id", "query_text"]
    )
    s1 = {r["doc_id"]: r["score"] for r in bm25_topk(corpus, q1).collect()}
    s2 = {r["doc_id"]: r["score"] for r in bm25_topk(corpus, q2).collect()}
    assert s1 == s2


def test_bm25_no_match_returns_empty(spark, corpus):
    queries = spark.createDataFrame(
        [("q0", "zzz qqq")], ["query_id", "query_text"]
    )
    assert bm25_topk(corpus, queries).count() == 0


def test_keyword_topk(spark, corpus):
    out = keyword_topk(corpus, k=2)
    rows = [r for r in out.collect() if r["doc_id"] == 3]
    assert [r["term"] for r in sorted(rows, key=lambda r: r["rank"])][0] == (
        "dogs"
    )  # tf=3 of a rare term dominates
    n = len(corpus.collect())
    # weight formula spot-check: dogs appears in docs 0? no ("dog"), 3.
    df_dogs = 1
    tf = 3
    want = tf * math.log((n + 1) / (df_dogs + 1))
    assert rows[0]["weight"] == pytest.approx(want, rel=1e-12)
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) <= 2 for v in per_doc.values())


def test_semantic_dedup_drops_near_identical_in_same_cell(spark):
    # two near-identical vectors + one orthogonal-ish vector
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]
    far = [0.0, 1.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], ["vec_id", "embedding"]
    )
    # single cell => pure pairwise semantics, no blocking effects
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, threshold=0.95, centers=[[0.0, 0.0, 0.0, 0.0]]
        ).collect()
    }
    assert out[0]["keep"] and out[0]["dup_of"] is None
    assert not out[1]["keep"] and out[1]["dup_of"] == 0
    assert out[2]["keep"]


def test_semantic_dedup_cells_block_comparisons(spark):
    # near-identical vectors straddling a Voronoi boundary land in
    # different cells and are BOTH kept: cells bound the comparison
    # scope (that is the scale contract, and the approximation cost)
    df = spark.createDataFrame(
        [(0, [1.0, 0.9]), (1, [0.9, 1.0])], ["vec_id", "embedding"]
    )
    out = semantic_dedup(
        df, threshold=0.9, centers=[[1.0, 0.0], [0.0, 1.0]]
    ).collect()
    assert {r["cell"] for r in out} == {0, 1}
    assert all(r["keep"] for r in out)
    # in ONE cell the same pair deduplicates (cosine ~0.9945 >= 0.9)
    one = semantic_dedup(df, threshold=0.9, centers=[[0.0, 0.0]])
    assert sorted(r["keep"] for r in one.collect()) == [False, True]


def test_semantic_dedup_assignment_matches_argmin(spark):
    import random

    rng = random.Random(3)
    vecs = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)
    ]
    centers = fixed_codebook(8, n_cells=4, seed=7)
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = {
        r["vec_id"]: r["cell"]
        for r in semantic_dedup(df, threshold=2.0, centers=centers).collect()
    }

    def d2(v, c):
        return sum((a - b) ** 2 for a, b in zip(v, c))

    for i, v in vecs:
        dists = [d2(v, c) for c in centers]
        assert out[i] == dists.index(min(dists))


def test_semantic_dedup_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    out = semantic_dedup(df, centers=fixed_codebook(2, n_cells=2, seed=7))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_bm25_plan_broadcasts_and_filters_before_shuffle(spark, corpus):
    queries = spark.createDataFrame(
        [("q0", "quick dogs")], ["query_id", "query_text"]
    )
    # cache=False returns the lazy plan (the eager default materializes
    # a LocalRelation, which has no join plan left to inspect)
    out = bm25_topk(corpus, queries, cache=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bm25_releases_cache(spark, corpus):
    # ADVICE r8: the tokenized-corpus persist (eager cache=True path)
    # must not outlive the call — per-query sweeps would accumulate
    # executor storage forever — and it must score identically to the
    # lazy default.
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    queries = spark.createDataFrame(
        [("q0", "quick dogs")], ["query_id", "query_text"]
    )
    out = bm25_topk(corpus, queries, k=3, cache=True)
    rows = {(r["query_id"], r["doc_id"], r["score"]) for r in out.collect()}
    assert rows
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= before
    lazy = {
        (r["query_id"], r["doc_id"], r["score"])
        for r in bm25_topk(corpus, queries, k=3).collect()
    }
    assert rows == lazy


def test_semantic_dedup_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        semantic_dedup(df, threshold=0.9)


def test_semantic_dedup_releases_cache(spark):
    # The embedding-carrying intermediate must not stay persisted after
    # the call (per-epoch sweeps would accumulate executor storage).
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, threshold=0.95, dim=2, n_cells=2)
    assert out.count() == 3
    out.unpersist()
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= before


def test_hard_negative_mining_basics(spark):
    from data_pipeline_framework_spark.functions.similarity import (
        hard_negative_mining,
    )

    # two tight clusters; labels mixed inside each
    rows = [
        (1, [1.0, 0.0], "a"), (2, [0.99, 0.01], "b"),
        (3, [0.98, 0.02], "a"), (4, [0.0, 1.0], "a"),
        (5, [0.01, 0.99], "b"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    out = hard_negative_mining(
        df, k=2, dim=2, n_cells=2, label_col="label")
    rowsd = [(r["anchor_id"], r["negative_id"], r["rank"])
             for r in out.orderBy("anchor_id", "rank").collect()]
    # anchor 1 (label a): only different-label neighbor in its cell is 2
    assert (1, 2, 1) in rowsd
    # no pair ever has matching labels
    assert out.filter(
        F.col("anchor_label") == F.col("negative_label")).count() == 0
    # min_cosine floor removes easy negatives
    floored = hard_negative_mining(
        df, k=2, dim=2, n_cells=2, label_col="label", min_cosine=0.9)
    assert floored.filter(F.col("neg_cosine") < 0.9).count() == 0
    out.unpersist(); floored.unpersist()


def test_hard_negative_mining_empty_raises(spark):
    from data_pipeline_framework_spark.functions.similarity import (
        hard_negative_mining,
    )

    df = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label string")
    with pytest.raises(ValueError, match="empty"):
        hard_negative_mining(df)


def test_rrf_fuse_ranks_and_scores(spark):
    from data_pipeline_framework_spark.functions.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query_id string, doc_id long, rank int",
    )
    den = spark.createDataFrame(
        [("q", 2, 1), ("q", 4, 2)],
        "query_id string, doc_id long, rank int",
    )
    out = rrf_fuse([lex, den], k_rrf=60, topk=3).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 2 appears in both systems -> highest fused score, rank 1
    assert by_id[2]["rank"] == 1 and by_id[2]["n_systems"] == 2
    assert abs(by_id[2]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-12
    # doc 1: lexical-only rank 1
    assert abs(by_id[1]["rrf_score"] - 1 / 61) < 1e-12
    # topk=3 keeps exactly 3 rows; doc with lowest fused score dropped
    assert len(out) == 3
    # deterministic tie-break: docs 1 and 4 tie (1/61 each) -> lower id first
    assert by_id[1]["rank"] == 2 and 4 in by_id and by_id[4]["rank"] == 3


def test_semantic_decontamination_geometry(spark):
    """hand-checked: unit vectors at known angles — only the train
    vector within the cosine threshold of an eval vector is flagged,
    with the best (highest-cosine) eval id and ties to the lowest id."""
    import math

    from data_pipeline_framework_spark.functions.similarity import (
        semantic_decontamination,
    )

    def at(theta):  # unit vector in the plane
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    ref = spark.createDataFrame(
        [(0, at(0.0)), (1, at(0.05))],
        "vec_id long, embedding array<double>",
    )
    train = spark.createDataFrame(
        [(10, at(0.06)),   # cos vs ref1 ~ 0.99995 -> flagged, best=1
         (11, at(1.2)),    # cos ~ 0.36 vs ref0 -> below 0.9
         (12, at(0.0))],   # identical to ref0 -> flagged, best=0
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in semantic_decontamination(
        train, ref, threshold=0.9
    ).collect()}
    assert set(got) == {10, 12}
    assert got[10]["ref_id"] == 1
    assert got[12]["ref_id"] == 0
    assert got[12]["cosine"] == pytest.approx(1.0)
