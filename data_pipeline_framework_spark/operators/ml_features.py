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
) -> DataFrame:
    """KMeans cluster label + center distances (reference :450-511)."""
    if algorithm == "dbscan":
        raise NotImplementedError(
            "DBSCAN has no MLlib implementation; the reference used sklearn "
            "(feature_engineering.py:496-503). Use kmeans, or a density "
            "approximation via LSH bucketing."
        )
    if algorithm != "kmeans":
        raise ValueError(f"unknown clustering algorithm: {algorithm!r}")

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
