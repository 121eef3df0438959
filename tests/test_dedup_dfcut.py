"""Document-frequency cut in the n-gram Jaccard inverted index.

A stop-shingle present in every document must not drive candidate
generation: without the cut, one shingle shared by N docs emits N^2/2
candidate pairs — the scale-killer the df-cut exists to prevent.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions.dedup import (
    ngram_candidate_pairs,
    ngram_jaccard_pairs,
    shingle_hashes,
)

STOP = "all rights reserved worldwide in perpetuity"


def _corpus(spark, n_docs=40):
    rows = []
    for i in range(n_docs):
        # unique body + the planted boilerplate every doc carries
        body = f"document {i} talks about topic{i} subject{i} entity{i}"
        rows.append((i, f"{body} {STOP}"))
    # one true near-dup pair: 100 and 101 share a rare long body
    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows.append((100, f"{dup} variant one {STOP}"))
    rows.append((101, f"{dup} variant two {STOP}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingled(df):
    return df.select("doc_id", shingle_hashes("text", 3).alias("__sh"))


def test_df_cut_bounds_candidates(spark):
    docs = _corpus(spark)
    sh = _shingled(docs)
    uncut = ngram_candidate_pairs(sh, "doc_id", max_df=None).count()
    cut = ngram_candidate_pairs(sh, "doc_id", max_df=0.05).count()
    # stop-shingles connect every doc to every other without the cut
    assert uncut > 500
    # with the cut only rare-shingle co-occurrence survives
    assert cut < 10


def test_df_cut_keeps_true_neardups(spark):
    docs = _corpus(spark)
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, n=3, max_df=0.05
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(100, 101)}
    # jaccard is computed on FULL shingle sets, not the cut index
    exact = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, n=3, max_df=None
    ).collect()
    want = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact}
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got == {k: v for k, v in want.items() if k in got}


def test_absolute_max_df(spark):
    docs = _corpus(spark)
    sh = _shingled(docs)
    # absolute cut of 3 docs behaves like the fractional cut here
    cut = ngram_candidate_pairs(sh, "doc_id", max_df=3).count()
    assert cut < 10


def test_connected_components_vs_bfs(spark):
    """Alternating-star contraction must agree with a reference BFS on
    random graphs, and converge on a long chain (the label-propagation
    worst case) within the round budget."""
    import collections
    import random

    from data_pipeline_framework_spark.functions.dedup import (
        connected_components,
    )

    rng = random.Random(7)
    edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    comp, seen = {}, set()
    for s in sorted(adj):
        if s in seen:
            continue
        stack, mem = [s], {s}
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in mem:
                    mem.add(y)
                    stack.append(y)
        for x in mem:
            seen.add(x)
            comp[x] = min(mem)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    # all three execution regimes must agree with the BFS reference:
    # immediate driver union-find, fully distributed star contraction,
    # and distributed rounds that hand off to the driver mid-way
    for threshold in (250_000, 0, 30):
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                df, driver_finish_threshold=threshold
            ).collect()
        }
        assert got == comp, f"threshold={threshold}"

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "id_a long, id_b long"
    )
    labels = connected_components(
        chain, max_iter=12, driver_finish_threshold=0
    ).collect()
    assert len(labels) == 121
    assert {r["component"] for r in labels} == {0}


def test_cross_corpus_neardup(spark):
    from data_pipeline_framework_spark.functions.dedup import (
        cross_corpus_neardup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    train = spark.createDataFrame(
        [
            (1, base + " extra tail words"),          # near-dup of ref 100
            (2, "completely unrelated text about astrophysics and quasars"
                " spinning in deep space far away"),
            (3, base + " extra tail words"),          # also near ref 100
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(100, base + " extra tail words indeed"),
         (200, "numbers one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           cross_corpus_neardup(train, ref, threshold=0.5).collect()}
    assert set(out) == {1, 3}
    assert out[1]["ref_id"] == 100 and out[1]["jaccard"] >= 0.5
    # clean doc 2 untouched; one row per contaminated doc (best match)
    assert out[3]["ref_id"] == 100
    # id type preserved: long in, long out (no silent cast)
    sch = dict(cross_corpus_neardup(train, ref, threshold=0.5).dtypes)
    assert sch["ref_id"] == "bigint"


def test_cross_corpus_neardup_string_ids(spark):
    """Arbitrary (non-numeric) doc ids flow through unchanged — the
    best-match pick is a row_number window, not a numeric negation."""
    from data_pipeline_framework_spark.functions.dedup import (
        cross_corpus_neardup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    train = spark.createDataFrame(
        [("tr-a", base + " extra tail words"),
         ("tr-b", "completely unrelated text about astrophysics and"
                  " quasars spinning in deep space far away")],
        "doc_id string, text string",
    )
    ref = spark.createDataFrame(
        [("ref-x", base + " extra tail words indeed"),
         ("ref-y", base + " extra tail words indeed")],  # tie on jaccard
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in
           cross_corpus_neardup(train, ref, threshold=0.5).collect()}
    assert set(out) == {"tr-a"}
    # ties break to the LOWEST ref id, and the string id survives intact
    assert out["tr-a"]["ref_id"] == "ref-x"


def test_canonical_by_quality(spark):
    from data_pipeline_framework_spark.functions.dedup import (
        canonical_by_quality,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    quality = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 50.0), (7, 5.0), (8, 5.0)],
        "doc_id long, quality double",
    )
    out = {r["doc_id"]: r for r in
           canonical_by_quality(pairs, quality).collect()}
    assert len(out) == 5
    # chain 1-2-3 is one component; best quality (2) is canonical
    comp = out[1]["component"]
    assert out[2]["component"] == comp and out[3]["component"] == comp
    assert out[2]["keep"] and not out[1]["keep"] and not out[3]["keep"]
    # quality tie in {7,8} -> lowest id wins
    assert out[7]["keep"] and not out[8]["keep"]


def test_set_similarity_pairs_generic_arrays(spark):
    """the generic array-column API: exact Jaccard over tag sets,
    empty/null sets never pair, and the df-cut suppresses a hot
    element's candidate blowup while exact verification keeps every
    pair that shares any non-hot element."""
    from data_pipeline_framework_spark.functions.dedup import (
        set_similarity_pairs,
    )

    rows = [
        (1, ["a", "b", "c", "c"]),       # duplicates collapse
        (2, ["a", "b", "c"]),            # jaccard(1,2) = 1.0
        (3, ["a", "b", "x"]),            # jaccard(1,3) = 0.5
        (4, ["z"]),
        (5, []),                         # never pairs
        (6, None),                       # never pairs
    ]
    df = spark.createDataFrame(rows, "id long, tags array<string>")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in set_similarity_pairs(
            df, "id", "tags", threshold=0.5, max_df=None
        ).collect()
    }
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == 0.5 and got[(2, 3)] == 0.5
    assert all(5 not in p and 6 not in p and 4 not in p for p in got)

    # df-cut: 'hot' is in every row; pairs sharing ONLY 'hot' are not
    # candidates, but pairs sharing a rare element verify exactly
    hot = [(i, ["hot", f"rare{i % 2}"]) for i in range(10)]
    hdf = spark.createDataFrame(hot, "id long, tags array<string>")
    cut = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_pairs(
            hdf, "id", "tags", threshold=0.9, max_df=2, min_df_cut=1
        ).collect()
    }
    # rare0/rare1 each appear 5x (df=5 > cut 2) -> everything cut: the
    # bound holds even when it costs recall (documented trade)
    assert cut == set()
    loose = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_pairs(
            hdf, "id", "tags", threshold=0.9, max_df=6, min_df_cut=1
        ).collect()
    }
    # rare elements survive the cut; identical-set pairs found with
    # their exact jaccard of 1.0 (they share 'hot' too, verified on
    # FULL sets even though 'hot' never generated candidates)
    assert loose == {
        (a, b) for a in range(10) for b in range(a + 1, 10)
        if a % 2 == b % 2
    }


def test_soft_dedup_weights_known_clusters(spark):
    """weights: 1/|cluster| for clustered docs, 1.0 for the rest;
    alpha interpolates; total weighted mass of a cluster == 1 at
    alpha=1 (the hard-dedup-equivalent mass)."""
    from data_pipeline_framework_spark.functions.dedup import (
        soft_dedup_weights,
    )

    # clusters: {1,2,3} (chain), {10,11}; 20 unclustered
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20)], "doc_id long"
    )
    out = {
        r["doc_id"]: r
        for r in soft_dedup_weights(pairs, docs).collect()
    }
    assert out[1]["weight"] == out[2]["weight"] == out[3]["weight"]
    assert out[1]["weight"] == pytest.approx(1 / 3, abs=1e-15)
    assert out[10]["weight"] == 0.5 and out[11]["weight"] == 0.5
    assert out[20]["weight"] == 1.0 and out[20]["component"] is None
    assert out[1]["component"] == out[2]["component"] == out[3]["component"]
    # alpha=0.5: sqrt damping
    half = {
        r["doc_id"]: r["weight"]
        for r in soft_dedup_weights(pairs, docs, alpha=0.5).collect()
    }
    assert half[1] == pytest.approx(3 ** -0.5, abs=1e-12)
    assert half[20] == 1.0
