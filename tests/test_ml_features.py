"""MLlib feature ops: text vectors, clustering, PCA.

Deterministic structure/variance assertions (seeds fixed; exact
coefficients are basis/implementation-dependent — SURVEY §7.4).
"""

from __future__ import annotations

import math

import pytest

from data_pipeline_framework_spark.operators.ml_features import (
    create_clustering_features,
    create_pca_features,
    create_text_features,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark compiles the query plan"),
            (2, "spark optimizes the query"),
            (3, "pandas copies the frame"),
            (4, None),
        ],
        ["id", "body"],
    )


def test_text_basic_stats(docs):
    out = create_text_features(docs, ["body"], method="basic_stats")
    rows = {r["id"]: r for r in out.collect()}
    r1 = rows[1]
    assert r1["body_length"] == len("spark compiles the query plan")
    assert r1["body_word_count"] == 5
    assert r1["body_char_count"] == len("sparkcompilesthequeryplan")
    assert r1["body_avg_word_length"] == pytest.approx(25 / 5)
    # null text -> zeros, not nulls
    r4 = rows[4]
    assert r4["body_length"] == 0 and r4["body_word_count"] == 0
    assert r4["body_avg_word_length"] == 0.0


def test_text_count_vectors(docs):
    out = create_text_features(docs, ["body"], method="count", max_features=10)
    cols = [c for c in out.columns if c.startswith("body_count_")]
    # stopword 'the' must be removed from the vocabulary
    assert cols and "body_count_the" not in cols
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["body_count_spark"] == 1.0
    assert rows[3]["body_count_spark"] == 0.0
    assert rows[2]["body_count_query"] == 1.0


def test_text_tfidf_bigrams(docs):
    out = create_text_features(
        docs, ["body"], method="tfidf", max_features=20, ngram_range=(1, 2)
    )
    cols = [c for c in out.columns if c.startswith("body_tfidf_")]
    assert any("_" in c.removeprefix("body_tfidf_") for c in cols)  # bigram present
    rows = {r["id"]: r for r in out.collect()}
    # 'spark' appears in 2 of 4 docs -> positive idf, positive tfidf where present
    assert rows[1]["body_tfidf_spark"] > 0
    assert rows[3]["body_tfidf_spark"] == 0.0


def test_clustering_features(spark):
    # two obvious blobs around (0,0) and (10,10)
    pts = [(i, float(i % 3) * 0.1, float(i % 3) * 0.1) for i in range(20)]
    pts += [(i + 100, 10 + float(i % 3) * 0.1, 10 + float(i % 3) * 0.1)
            for i in range(20)]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    out = create_clustering_features(df, ["x", "y"], n_clusters=2)
    assert {"cluster_label", "distance_to_cluster_0", "distance_to_cluster_1",
            "min_cluster_distance"} <= set(out.columns)
    rows = out.collect()
    labels_low = {r["cluster_label"] for r in rows if r["x"] < 5}
    labels_high = {r["cluster_label"] for r in rows if r["x"] > 5}
    assert len(labels_low) == 1 and len(labels_high) == 1
    assert labels_low != labels_high
    for r in rows:
        assert r["min_cluster_distance"] == pytest.approx(
            min(r["distance_to_cluster_0"], r["distance_to_cluster_1"])
        )

def test_clustering_features_pretrained_centers(spark):
    # fixed centers in raw space: no fit, no scaling, argmin assignment
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 10.0, 10.0), (3, 5.0, 5.0), (4, None, 1.0)],
        ["id", "x", "y"],
    )
    out = create_clustering_features(
        df, ["x", "y"], centers=[[0.0, 0.0], [10.0, 10.0]]
    )
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["cluster_label"] == 0
    assert got[2]["cluster_label"] == 1
    # equidistant point ties to the LOWEST cluster id
    assert got[3]["cluster_label"] == 0
    # nulls fill to 0.0 before distance math
    assert got[4]["cluster_label"] == 0
    assert got[1]["min_cluster_distance"] == pytest.approx(0.0)
    assert got[2]["distance_to_cluster_0"] == pytest.approx(200.0 ** 0.5)
    # no MLlib stage ran: plan is pure projection (no scaler/fit columns)
    assert "__scaled" not in out.columns and "__features" not in out.columns


def test_grid_dbscan_blobs_and_noise(spark):
    # two tight blobs of 30 + isolated noise points; grid-DBSCAN on scaled
    # features must find exactly two clusters and flag the noise with -1
    pts = [(i, 0.0 + (i % 5) * 0.01, 0.0 + (i % 7) * 0.01) for i in range(30)]
    pts += [(100 + i, 10.0 + (i % 5) * 0.01, 10.0 + (i % 7) * 0.01)
            for i in range(30)]
    pts += [(200, -40.0, 35.0), (201, 42.0, -38.0)]  # noise, far away
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    out = create_clustering_features(
        df, ["x", "y"], algorithm="dbscan"
    )
    rows = out.collect()
    lab_a = {r["cluster_label"] for r in rows if 0 <= r["id"] < 30}
    lab_b = {r["cluster_label"] for r in rows if 100 <= r["id"] < 130}
    noise = {r["cluster_label"] for r in rows if r["id"] >= 200}
    assert len(lab_a) == 1 and len(lab_b) == 1
    assert lab_a != lab_b
    assert -1 not in lab_a | lab_b
    assert noise == {-1}
    # labels deterministic and dense: {0, 1}
    assert lab_a | lab_b == {0, 1}
    # no MLlib vector residue in the output schema
    assert {"__cell", "__features", "__scaled"}.isdisjoint(out.columns)


def test_pca_features_auto_components(spark):
    # all three columns collinear -> after standardization one component
    # still explains ~all variance (scaling gives every column unit
    # variance, so "tiny noise" columns would NOT stay tiny)
    data = [(float(i), 2.0 * i, -3.0 * i + 7) for i in range(50)]
    df = spark.createDataFrame(data, ["x", "y", "z"])
    out = create_pca_features(df, ["x", "y", "z"], variance_threshold=0.95)
    comp_cols = [c for c in out.columns if c.startswith("pca_component_")]
    assert comp_cols == ["pca_component_1"]
    vals = [r["pca_component_1"] for r in out.collect()]
    # projection onto the dominant axis spans the standardized range
    assert max(vals) - min(vals) > 2.0

    out2 = create_pca_features(df, ["x", "y", "z"], n_components=2)
    assert [c for c in out2.columns if c.startswith("pca_")] == [
        "pca_component_1", "pca_component_2",
    ]


def test_lloyd_kmeans_hand_checked(spark):
    """Two tight integer clusters + one far point with k=2: all near
    points join cluster 0/1 correctly and iteration moves the centers."""
    from data_pipeline_framework_spark.operators.ml_features import (
        lloyd_kmeans,
    )

    rows = [(0, 0.0, 0.0), (1, 100.0, 100.0), (2, 1.0, 0.0), (3, 0.0, 1.0),
            (4, 99.0, 100.0), (5, 100.0, 99.0), (6, 2.0, 2.0)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = {r["id"]: r["cluster"]
           for r in lloyd_kmeans(df, "id", ["x", "y"], k=2, iters=3,
                                 init_ids=[0, 1]).collect()}
    assert {out[0], out[2], out[3], out[6]} == {0}
    assert {out[1], out[4], out[5]} == {1}


def test_lloyd_kmeans_empty_cluster_keeps_center(spark):
    """An init center far from every point empties immediately; the
    cluster must keep its previous center instead of crashing."""
    from data_pipeline_framework_spark.operators.ml_features import (
        lloyd_kmeans,
    )

    rows = [(0, 0.0), (1, 1.0), (2, 2.0), (3, 1000.0)]
    df = spark.createDataFrame(rows, "id long, x double")
    # init on ids 0 and 3: point 3 is alone; then re-init on 0,1 where
    # cluster 1's members all sit nearer cluster 0 after one step
    out = lloyd_kmeans(df, "id", ["x"], k=2, iters=5, init_ids=[0, 1])
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert got[3] != got[0]  # far point separates
    assert len(set(got.values())) == 2


def test_diversity_sample_coverage(spark):
    from data_pipeline_framework_spark.functions.similarity import (
        diversity_sample,
    )

    # two well-separated directions -> two populated cells with a
    # hand-made codebook; most-prototypical = exactly on the centroid
    centers = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (0, [1.0, 0.0]),      # cell 0, cos 1.0
        (1, [0.9, 0.1]),      # cell 0
        (2, [0.8, 0.3]),      # cell 0, least aligned
        (3, [0.0, 1.0]),      # cell 1, cos 1.0
        (4, [0.2, 0.9]),      # cell 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = diversity_sample(df, k_per_cell=2, centers=centers).collect()
    got = {(r["cell"], r["rank"]): r["vec_id"] for r in out}
    assert len(out) == 4  # 2 per cell, both cells represented
    assert got[(0, 1)] == 0 and got[(1, 1)] == 3  # exact-centroid first
    assert got[(0, 2)] == 1 and got[(1, 2)] == 4
    # vec 2 (least prototypical in the fuller cell) dropped
    assert all(r["vec_id"] != 2 for r in out)


def test_diversity_sample_empty_raises(spark):
    import pytest as _pytest

    from data_pipeline_framework_spark.functions.similarity import (
        diversity_sample,
    )

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="empty"):
        diversity_sample(df)
