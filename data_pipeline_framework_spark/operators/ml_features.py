"""ML-backed feature engineering: text vectors, clustering, PCA.

Parity with reference transformations/feature_engineering.py:
  * create_text_features (:141-225) — tf-idf / count vectors with
    max_features, n-gram range, min/max document frequency, English
    stopwords; output columns `{col}_tfidf_{term}` / `{col}_count_{term}`;
    `basic_stats` variant emits `{col}_length`, `{col}_word_count`,
    `{col}_char_count`, `{col}_sentence_count`, `{col}_avg_word_length`.
  * create_clustering_features (:450-511) — StandardScaler + KMeans
    (seed 42), output `cluster_label`, `distance_to_cluster_{i}`,
    `min_cluster_distance`. DBSCAN has no MLlib implementation (the
    reference used sklearn); raises NotImplementedError by design.
  * create_pca_features (:513-567) — StandardScaler + PCA with auto
    component count by cumulative explained-variance threshold; output
    `pca_component_{i}` (1-based).

All three run on MLlib (JVM, distributed). The flattened per-term /
per-component columns mirror the reference's observable surface; at
100 TB keep `output_vector=True` instead, which skips the wide select
and carries a single vector column.

Semantics deviations (documented per SURVEY §7.4): MLlib IDF is
log((N+1)/(df+1)) without sklearn's +1 smoothing-then-l2-normalize, and
PCA component signs are basis-dependent — tests assert structure and
variance, not exact coefficients.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.ml.feature import (
    IDF,
    NGram,
    PCA,
    CountVectorizer,
    RegexTokenizer,
    StandardScaler,
    StopWordsRemover,
    VectorAssembler,
)
from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import vector_to_array

SEED = 42


# ---------------------------------------------------------------------------
# text features


def _sanitize(term: str) -> str:
    return term.replace(" ", "_")


def create_text_features(
    df: DataFrame,
    text_cols: list[str],
    method: str = "tfidf",
    max_features: int = 100,
    ngram_range: tuple[int, int] = (1, 1),
    min_df: float = 1.0,
    max_df: float = 1.0,
    output_vector: bool = False,
) -> DataFrame:
    """Text vectorization / stats (reference feature_engineering.py:141-225)."""
    if method == "basic_stats":
        for col in text_cols:
            t = F.coalesce(F.col(col).cast("string"), F.lit(""))
            words = F.split(F.trim(t), r"\s+")
            word_count = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(words))
            char_count = F.length(F.regexp_replace(t, " ", ""))
            df = (
                df.withColumn(f"{col}_length", F.length(t))
                .withColumn(f"{col}_word_count", word_count)
                .withColumn(f"{col}_char_count", char_count)
                .withColumn(f"{col}_sentence_count", F.size(F.split(t, r"\.")))
                .withColumn(
                    f"{col}_avg_word_length",
                    F.when(word_count > 0, char_count / word_count).otherwise(0.0),
                )
            )
        return df

    if method not in ("tfidf", "count"):
        raise ValueError(f"unknown text feature method: {method!r}")

    lo, hi = ngram_range
    for col in text_cols:
        base = f"__{col}"
        work = df.withColumn(
            base, F.coalesce(F.col(col).cast("string"), F.lit(""))
        )
        tokenizer = RegexTokenizer(
            inputCol=base, outputCol=f"{base}_tok", pattern=r"\W+", minTokenLength=1
        )
        work = tokenizer.transform(work)
        remover = StopWordsRemover(
            inputCol=f"{base}_tok", outputCol=f"{base}_clean",
            stopWords=StopWordsRemover.loadDefaultStopWords("english"),
        )
        work = remover.transform(work)
        # n-gram range: union token streams for each n in [lo, hi]
        gram_cols = []
        for n in range(lo, hi + 1):
            gcol = f"{base}_g{n}"
            if n == 1:
                work = work.withColumn(gcol, F.col(f"{base}_clean"))
            else:
                work = NGram(n=n, inputCol=f"{base}_clean", outputCol=gcol).transform(work)
            gram_cols.append(gcol)
        terms_col = f"{base}_terms"
        work = work.withColumn(terms_col, F.concat(*[F.col(g) for g in gram_cols]))

        # sklearn-style semantics: max_df >= 1.0 (the sklearn default, a
        # fraction meaning "no limit") must not hit MLlib's "absolute count
        # when >= 1" rule, which would cap terms at one document.
        mlib_max_df = max_df if max_df < 1.0 else float(2**62)
        cv = CountVectorizer(
            inputCol=terms_col, outputCol=f"{base}_vec",
            vocabSize=max_features, minDF=min_df, maxDF=mlib_max_df,
        )
        cv_model = cv.fit(work)
        work = cv_model.transform(work)
        vocab = cv_model.vocabulary

        out_vec = f"{base}_vec"
        prefix = f"{col}_{method}"
        if method == "tfidf":
            idf = IDF(inputCol=out_vec, outputCol=f"{base}_tfidf")
            work = idf.fit(work).transform(work)
            out_vec = f"{base}_tfidf"

        if output_vector:
            df = work.withColumnRenamed(out_vec, f"{prefix}_vector").drop(
                *[c for c in work.columns if c.startswith("__") and c != out_vec]
            )
            continue
        arr = vector_to_array(F.col(out_vec))
        keep = [c for c in df.columns]
        term_cols = [
            arr[i].alias(f"{prefix}_{_sanitize(term)}")
            for i, term in enumerate(vocab)
        ]
        df = work.select(*keep, *term_cols)
    return df


# ---------------------------------------------------------------------------
# clustering features


def _assemble_scaled(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    filled = df
    for c in feature_cols:
        filled = filled.withColumn(
            c, F.coalesce(F.col(c).cast("double"), F.lit(0.0))
        )
    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="__features"
    ).transform(filled)
    scaler = StandardScaler(
        inputCol="__features", outputCol="__scaled", withMean=True, withStd=True
    )
    return scaler.fit(assembled).transform(assembled)


def create_clustering_features(
    df: DataFrame,
    feature_cols: list[str],
    n_clusters: int = 5,
    algorithm: str = "kmeans",
    include_distances: bool = True,
    centers: list[list[float]] | None = None,
) -> DataFrame:
    """KMeans cluster label + center distances, or grid-DBSCAN labels
    (reference :450-511; DBSCAN params eps=0.5 / min_samples=5 at :498).

    ``centers``: pretrained centroids in RAW feature space. When given,
    no MLlib fit and no scaling run — assignment is a pure argmin column
    expression (ties -> lowest cluster id) and distances are codegen
    arithmetic. This is the 100 TB path: fit on a bounded sample (or via
    lloyd_kmeans), assign the full table without an iterative job; it is
    also deterministic, so a cross-engine oracle can replay it."""
    if algorithm == "dbscan":
        return _grid_dbscan(df, feature_cols)
    if algorithm != "kmeans":
        raise ValueError(f"unknown clustering algorithm: {algorithm!r}")

    if centers is not None:
        work = df
        for c in feature_cols:
            work = work.withColumn(
                c, F.coalesce(F.col(c).cast("double"), F.lit(0.0))
            )
        sq = [
            sum(
                (F.col(c) - F.lit(float(ctr[j]))) ** 2
                for j, c in enumerate(feature_cols)
            )
            for ctr in centers
        ]
        # argmin via array_min over (dist, idx) structs (ties -> lowest
        # idx, same as the old when-chain, with each distance expression
        # appearing once instead of O(k) times)
        label = F.array_min(
            F.array(*[
                F.struct(sq[i].alias("d"), F.lit(i).alias("i"))
                for i in range(len(centers))
            ])
        )["i"]
        work = work.withColumn("cluster_label", label)
        if include_distances:
            work = work.select(
                "*",
                *[F.sqrt(sq[i]).alias(f"distance_to_cluster_{i}")
                  for i in range(len(centers))],
            ).withColumn(
                "min_cluster_distance",
                F.least(*[F.col(f"distance_to_cluster_{i}")
                          for i in range(len(centers))]),
            )
        return work

    work = _assemble_scaled(df, feature_cols)
    km = KMeans(k=n_clusters, seed=SEED, featuresCol="__scaled",
                predictionCol="cluster_label")
    model = km.fit(work)
    work = model.transform(work)

    if include_distances:
        centers = [list(map(float, c)) for c in model.clusterCenters()]
        arr = vector_to_array(F.col("__scaled"))
        dist_cols = []
        for i, center in enumerate(centers):
            sq = None
            for j, cj in enumerate(center):
                term = (arr[j] - F.lit(cj)) ** 2
                sq = term if sq is None else sq + term
            dist_cols.append(F.sqrt(sq).alias(f"distance_to_cluster_{i}"))
        work = work.select("*", *dist_cols)
        work = work.withColumn(
            "min_cluster_distance",
            F.least(*[F.col(f"distance_to_cluster_{i}") for i in range(len(centers))]),
        )
    return work.drop("__features", "__scaled")


def _grid_dbscan(
    df: DataFrame,
    feature_cols: list[str],
    eps: float = 0.5,
    min_samples: int = 5,
) -> DataFrame:
    """Distributed density clustering approximating DBSCAN (the reference
    ran sklearn.DBSCAN(eps=0.5, min_samples=5) on scaled features,
    feature_engineering.py:496-503 — impossible to run single-node at scale).

    Grid approximation: standardize, bucket points into eps-sized grid
    cells, call a cell "core" when it holds >= min_samples points, and
    union core cells that are grid-adjacent (Chebyshev distance 1 — every
    eps-neighbor pair lives in adjacent cells). Points in core cells get
    the component label; points in non-core cells adjacent to exactly a
    core component become border members; the rest are noise (-1).

    Scale shape: the point->cell map and per-cell counts are one shuffle;
    only the DENSE-cell list (bounded by n/min_samples, typically orders
    of magnitude smaller than the data, independent of row count for
    fixed-density data) reaches the driver for the union-find. Labels are
    deterministic: components renumbered 0..k-1 by size desc, then lexical
    min cell. Deviation from exact DBSCAN (documented): density is tested
    per-cell, not per eps-ball, so clusters separated by < eps*sqrt(d) may
    merge and sparse cluster fringes can read as noise."""
    work = _assemble_scaled(df, feature_cols)
    arr = vector_to_array(F.col("__scaled"))
    d = len(feature_cols)
    cell = F.array(*[
        F.floor(arr[j] / F.lit(float(eps))).cast("long") for j in range(d)
    ])
    pts = work.withColumn("__cell", cell)
    counts = pts.groupBy("__cell").agg(F.count(F.lit(1)).alias("__n"))
    core = [
        tuple(r["__cell"])
        for r in counts.filter(F.col("__n") >= min_samples).collect()
    ]

    # driver-side union-find over dense cells (cell graph, not point graph)
    parent = {c: c for c in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    core_set = set(core)
    from itertools import product as _product

    for c in core:
        for off in _product((-1, 0, 1), repeat=d):
            if all(o == 0 for o in off):
                continue
            nb = tuple(ci + o for ci, o in zip(c, off))
            if nb in core_set:
                ra, rb = find(c), find(nb)
                if ra != rb:
                    parent[ra] = rb
    comp: dict[tuple, int] = {}
    sizes: dict[tuple, int] = {}
    for c in core:
        sizes[find(c)] = sizes.get(find(c), 0) + 1
    roots = sorted(sizes, key=lambda r: (-sizes[r], r))
    root_label = {r: i for i, r in enumerate(roots)}
    for c in core:
        comp[c] = root_label[find(c)]

    # border assignment: every non-core cell adjacent to a core cell
    # inherits the smallest adjacent component. Derived from the CORE set
    # (bounded, already on the driver) — never by collecting sparse cells,
    # whose count is O(points) in the noise-heavy worst case.
    border: dict[tuple, int] = {}
    for c, lab in comp.items():
        for off in _product((-1, 0, 1), repeat=d):
            if all(o == 0 for o in off):
                continue
            nb = tuple(ci + o for ci, o in zip(c, off))
            if nb not in comp:
                border[nb] = (
                    lab if nb not in border else min(border[nb], lab)
                )

    spark = df.sparkSession
    label_rows = [(list(c), l) for c, l in comp.items()] + [
        (list(c), l) for c, l in border.items()
    ]
    if label_rows:
        labels = spark.createDataFrame(
            label_rows, "__cell array<bigint>, cluster_label int"
        )
        out = pts.join(F.broadcast(labels), "__cell", "left").withColumn(
            "cluster_label", F.coalesce("cluster_label", F.lit(-1))
        )
    else:
        out = pts.withColumn("cluster_label", F.lit(-1))
    return out.drop("__cell", "__features", "__scaled")


# ---------------------------------------------------------------------------
# PCA features


def create_pca_features(
    df: DataFrame,
    feature_cols: list[str],
    n_components: int | None = None,
    variance_threshold: float = 0.95,
    keep_input: bool = True,
) -> DataFrame:
    """Scaled PCA projection with auto component count (reference :513-567).

    Fits once at full rank; because principal components nest, the first
    n columns of the full-rank projection equal an n-component PCA — no
    second fit needed for the auto-n path.
    """
    work = _assemble_scaled(df, feature_cols)
    k = len(feature_cols)
    pca = PCA(k=k, inputCol="__scaled", outputCol="__pca")
    model = pca.fit(work)
    if n_components is None:
        cum = 0.0
        n_components = k
        for i, ratio in enumerate(model.explainedVariance):
            cum += float(ratio)
            if cum >= variance_threshold:
                n_components = i + 1
                break
    n_components = min(n_components, k)
    work = model.transform(work)
    arr = vector_to_array(F.col("__pca"))
    comp_cols = [
        arr[i].alias(f"pca_component_{i + 1}") for i in range(n_components)
    ]
    base_cols = df.columns if keep_input else []
    return work.select(*base_cols, *comp_cols)


def lloyd_kmeans(
    df: DataFrame,
    id_col: str,
    feature_cols: list[str],
    k: int = 3,
    iters: int = 4,
    init_ids: list | None = None,
) -> DataFrame:
    """Deterministic, engine-differentiable Lloyd k-means over DataFrame
    expressions (MLlib's KMeans is seeded but implementation-ordered, so
    it can't be replayed in another engine; this can).

    Init: the rows whose ids are `init_ids` (sorted; default the k
    smallest ids — deterministic, no RNG). Each iteration assigns every
    point to its nearest center (squared-distance argmin, ties -> lowest
    cluster id) and recomputes centers as per-cluster means; an emptied
    cluster keeps its previous center. Centers are collected per
    iteration — k x |features| doubles, the same bounded-driver pattern
    as the IVF codebook — while assignment stays a pure column
    expression over the full data.

    Exactness note: with integer-valued DOUBLE features, every sum /
    mean / squared distance is exact IEEE arithmetic independent of
    partition order (integer-valued additions below 2^53 never round),
    so another engine replaying the same iterations reproduces the
    assignments bit-for-bit — see the kmeans_lloyd driver oracle.
    """
    pts = df.select(
        F.col(id_col), *[F.col(c).cast("double").alias(c) for c in feature_cols]
    ).persist()
    # narrow (id + |features| doubles) and read by EVERY action here:
    # the init collect(s), one mean-collect per iteration, and the
    # returned assignment — without the persist each iteration re-ran
    # the caller's upstream (scan + feature projection) from scratch
    if init_ids is None:
        init_ids = [
            r[0] for r in
            pts.select(id_col).orderBy(id_col).limit(k).collect()
        ]
    init = {
        r[id_col]: [r[c] for c in feature_cols]
        for r in pts.filter(F.col(id_col).isin(list(init_ids))).collect()
    }
    centers = [init[i] for i in sorted(init)]

    def assign(centers_now):
        dists = [
            sum(
                (F.col(c) - F.lit(ctr[j])) * (F.col(c) - F.lit(ctr[j]))
                for j, c in enumerate(feature_cols)
            )
            for ctr in centers_now
        ]
        cluster = F.array_min(
            F.array(*[
                F.struct(dists[i].alias("d"), F.lit(i).alias("i"))
                for i in range(len(centers_now))
            ])
        )["i"]
        return pts.withColumn("cluster", cluster)

    for _ in range(iters):
        assigned = assign(centers)
        rows = {
            r["cluster"]: [r[f"__m_{c}"] for c in feature_cols]
            for r in assigned.groupBy("cluster").agg(
                *[F.avg(c).alias(f"__m_{c}") for c in feature_cols]
            ).collect()
        }
        centers = [rows.get(i, centers[i]) for i in range(k)]
    return assign(centers).select(id_col, "cluster")
