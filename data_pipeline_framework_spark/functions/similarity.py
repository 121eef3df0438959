"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k — a broadcast of the (small)
query set against the corpus, dot products as JVM-side array expressions
(F.zip_with + F.aggregate), ranked per query with a window. No Python in
the loop.

Scale path: LSH (random-hyperplane) bucketing — signatures computed from
seeded literal hyperplanes, candidates restricted to matching buckets
(optionally with multi-probe via allowing b-1 of b blocks to match), then
exact rerank. At 100 TB the bucket join replaces the full cross product;
recall is tunable with #planes/#probes.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def _nested_double_lit(arrs: list[list[float]]) -> Column:
    """array<array<double>> literal built in ONE driver call.

    Building a codebook literal element-by-element
    (``F.array(*[F.array(*[F.lit(x) ...]) ...])``) costs one py4j round
    trip PER FLOAT — a 3200x64 adaptive codebook spent ~3 minutes of
    pure driver-side plan construction, dwarfing the query it fed
    (caught by the round-8 sf10 probe of diverse_prototype_sample).
    from_json over a single string literal is constant-folded by
    Catalyst into the identical nested literal (verified: the optimized
    plan inlines the values), and json.dumps round-trips every finite
    double exactly. NaN/Inf are not JSON-representable — codebooks and
    hyperplanes are finite by construction.
    """
    import json

    return F.from_json(
        F.lit(json.dumps(arrs)), "array<array<double>>"
    )


def _double_lit(vals: list[float]) -> Column:
    """array<double> literal in ONE driver call — the 1-D sibling of
    _nested_double_lit, for single centroids/planes (64 F.lit py4j
    round trips otherwise). Constant-folded by Catalyst into the
    identical array literal; json round-trips every finite double
    exactly."""
    import json

    return F.from_json(
        F.lit(json.dumps([float(v) for v in vals])), "array<double>"
    )


def cosine(a, b) -> Column:
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. The query side is
    broadcast (it is small by construction); ranking tie-breaks on corpus
    id for determinism. Norms are hoisted to one per row — the identical
    IEEE expression the inline cosine would compute, so oracle floats
    are unchanged while per-pair work drops to one dot product."""
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__qn", _norm(F.col("__qv")))
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv")
    ).withColumn("__cn", _norm(F.col("__cv")))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.try_divide(
            _dot(F.col("__qv"), F.col("__cv")),
            F.col("__qn") * F.col("__cn"),
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def adaptive_planes(
    n_vectors: int,
    n_blocks: int = 4,
    anchor: int = 500,
    anchor_bits: int = 4,
) -> int:
    """LSH signature width for a corpus of ``n_vectors``: bits per
    block grow ~log2(n / anchor) above the anchor population, so the
    expected bucket population — and with it per-block candidate
    PAIRS — stays bounded as the corpus grows. Fixed-width signatures
    make banded self-joins quadratic (n^2 / 2^bits per block); this
    rule keeps them linear. 500 -> 16 planes, 2K -> 24, 20K -> 40,
    200K -> 52, 100 TB-scale corpora keep fitting a BIGINT until
    ~2^59 vectors. Recall per true pair decays as bits grow (p^bits
    per block) — raise n_blocks alongside if recall is the binding
    constraint."""
    import math

    bits = anchor_bits + max(
        0, math.ceil(math.log2(max(n_vectors, anchor) / anchor))
    )
    return n_blocks * bits


def adaptive_cells(
    n_vectors: int, anchor: int = 500, anchor_cells: int = 8
) -> int:
    """IVF / SemDeDup cell count for a corpus of ``n_vectors``: cells
    grow linearly with the corpus so the per-cell population — and the
    within-cell pairwise work (Σ cell²) — stays bounded. 500 -> 8
    cells, 2K -> 32, 1M -> 16K (the FAISS ballpark of sqrt-to-linear
    sizing for flat quantizers at these populations)."""
    return max(anchor_cells, (n_vectors // anchor) * anchor_cells)


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Seeded gaussian hyperplanes as plain literals (identical on every
    executor — no runtime randomness)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def fixed_codebook(
    dim: int, n_cells: int = 8, seed: int = 7
) -> list[list[float]]:
    """Seeded gaussian codebook literals — a data-independent IVF codebook.
    Recall is below a trained codebook's, but cell assignment becomes a
    deterministic function of (dim, n_cells, seed), so results are exactly
    reproducible by an external oracle and index builds touch no data.

    Centers are UNIT-NORMALIZED: with raw gaussian centers the squared
    distance v.v - 2 v.c + c.c is dominated by the c.c spread (~±2
    sqrt(2 dim) across centers vs a ±2|v||c| data term), so for
    normalized embeddings nearly every vector lands in the
    smallest-norm cell — the "blocked" join silently degenerates into
    an all-pairs cross join. Equal-norm centers make argmin a pure
    direction comparison (argmax v.c), which keeps cells populated by
    data direction and the within-cell joins genuinely bounded."""
    rng = random.Random(seed)
    cents = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_cells)
    ]
    return [
        [x / math.sqrt(sum(y * y for y in c)) for x in c] for c in cents
    ]


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit j = 1 iff dot(vec, plane_j) > 0.

    Plane constants enter as ONE nested literal (from_json, one driver
    call) and ALL plane dots are computed by ONE ``transform`` over it
    (bit j = shiftleft(1, j) when dot > 0, summed with one left-fold
    ``aggregate``). The round-9 profile showed the previous unrolled
    per-plane loop spending ~1.2 s of DRIVER time per plan: each
    zip_with/aggregate construction costs ~12 ms of py4j round trips
    creating server-side lambdas, and 24 planes x 2 HOFs + the when
    chain added up (guide §1.2 per-plan work). The transform form
    builds 4 lambda expressions total regardless of plane count.
    Per-element arithmetic is unchanged — the same zip_with multiply +
    left-fold add per plane, the same > 0 test, and the bit sum is an
    exact long addition in the same order — so every signature value
    is bit-identical to the unrolled form (pinned by the oracle gates
    and test_lsh_signature_transform_matches_unrolled)."""
    P = _nested_double_lit([[float(x) for x in p] for p in planes])
    bits = F.transform(
        P,
        lambda p, i: F.when(
            _dot(vec_col, p) > 0,
            # call_function: F.shiftleft only takes a python int for
            # numBits, but this resolves to the same ShiftLeft expr
            F.call_function("shiftleft", F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, b: acc + b
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 16,
    n_blocks: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing at least one
    signature block (n_planes/n_blocks bits) with the query, then exact
    cosine rerank. Multi-probe comes free from the block decomposition.

    Pass ``dim`` (the embedding width) to keep plan construction fully
    lazy; parquet list columns don't carry a length, so without it a
    bounded one-row probe runs before planning."""
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    bits_per_block = n_planes // n_blocks

    def with_blocks(df, idc):
        sig = lsh_signature(F.col("__v"), planes)
        d = df.withColumn("__sig", sig)
        return d.select(
            idc, "__v",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright("__sig", b * bits_per_block)
                        .bitwiseAND(F.lit((1 << bits_per_block) - 1))
                        .alias("key"),
                    )
                    for b in range(n_blocks)
                ])
            ).alias("bk"),
        ).select(idc, "__v", "bk.blk", "bk.key")

    c = with_blocks(
        corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("__v")),
        id_col,
    )
    q = with_blocks(
        queries.select(
            query_id_col, F.col(vec_col).cast("array<double>").alias("__v")
        ),
        query_id_col,
    )
    cand = (
        c.join(
            F.broadcast(q).withColumnRenamed("__v", "__qv"),
            ["blk", "key"],
        )
        .select(query_id_col, id_col, "__v", "__qv")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        query_id_col, id_col, cosine(F.col("__qv"), F.col("__v")).alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _kmeans_numpy(train, n_cells: int, seed: int, n_iter: int = 20):
    """Seeded Lloyd's k-means on an in-driver sample (kmeans++-style
    farthest-point init from a fixed RandomState). Training an n_cells-entry
    codebook needs only ~O(256 * n_cells) vectors, so the sample fits any
    driver; this is the FAISS recipe (train on a sample, assign the corpus
    distributed) and replaces an iterative MLlib fit — ~2 Spark jobs
    instead of ~40."""
    import numpy as np

    rng = np.random.RandomState(seed)
    x = np.asarray(train, dtype="float64")
    n = len(x)
    # kmeans++ init
    centers = [x[rng.randint(n)]]
    d2 = ((x - centers[0]) ** 2).sum(axis=1)
    for _ in range(1, n_cells):
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        idx = rng.choice(n, p=probs)
        centers.append(x[idx])
        d2 = np.minimum(d2, ((x - centers[-1]) ** 2).sum(axis=1))
    c = np.stack(centers)
    for _ in range(n_iter):
        # pairwise squared distances via the expansion trick (no N×K×D temp)
        dist = (
            (x ** 2).sum(axis=1, keepdims=True)
            - 2.0 * x @ c.T
            + (c ** 2).sum(axis=1)
        )
        assign = dist.argmin(axis=1)
        new_c = c.copy()
        for j in range(n_cells):
            members = x[assign == j]
            if len(members):
                new_c[j] = members.mean(axis=0)
        if np.allclose(new_c, c):
            c = new_c
            break
        c = new_c
    return c


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    max_train: int = 65536,
    centers: list[list[float]] | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF (inverted-file) index: seeded k-means partitions the corpus into
    `n_cells` Voronoi cells; returns (assignments, centroids).

    Codebook training happens on a bounded driver-side sample (max_train
    vectors — the FAISS practice; a codebook never needs the full corpus),
    then every corpus vector is assigned to its nearest centroid in ONE
    distributed Arrow-batched pass. The assignments DataFrame
    (id, vector, __cell) is the persistent index — at 100 TB, write it
    `partitionBy("__cell")` so a probe scans only the probed cells' files
    (partition pruning does the work)."""
    import numpy as np
    import pandas as pd

    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    if centers is not None:
        # pretrained / fixed codebook: zero driver actions, zero data reads
        centers_arr = np.asarray(centers, dtype="float64")
    else:
        n_total = c.count()
        if n_total <= max_train:
            sample = [r["__v"] for r in c.select("__v").collect()]
        else:
            frac = min(1.0, (max_train * 1.2) / n_total)
            sample = [
                r["__v"]
                for r in c.select("__v").sample(frac, seed=seed)
                .limit(max_train).collect()
            ]
        centers_arr = _kmeans_numpy(sample, n_cells, seed)

    def _assign(vecs):
        m = np.stack(vecs.to_numpy())
        dist = (
            (m ** 2).sum(axis=1, keepdims=True)
            - 2.0 * m @ centers_arr.T
            + (centers_arr ** 2).sum(axis=1)
        )
        return pd.Series(dist.argmin(axis=1).astype("int32"))

    _assign.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    assign_udf = F.pandas_udf(_assign, "int")
    assigned = c.withColumn("__cell", assign_udf(F.col("__v")))
    centers = [list(map(float, cc)) for cc in centers_arr]
    return assigned, centers


def _mean_assigned_dist(assigned: DataFrame, centers) -> float:
    """Mean squared-L2 distance from each indexed vector to its
    assigned centroid — ONE map-side aggregate (centroid looked up from
    a literal array by cell id), no joins, no driver funnel."""
    cent_lit = _nested_double_lit(
        [[float(x) for x in c] for c in centers]
    )
    cv = F.element_at(cent_lit, F.col("__cell") + 1)
    d2 = (
        _dot(F.col("__v"), F.col("__v"))
        - 2.0 * _dot(F.col("__v"), cv)
        + _dot(cv, cv)
    )
    row = assigned.agg(
        F.avg(d2).alias("m"), F.count(F.lit(1)).alias("n")
    ).first()
    return float(row["m"] or 0.0)


def write_ivf_index(
    index: tuple[DataFrame, list[list[float]]], path: str, mode: str = "overwrite"
) -> None:
    """Persist an ivf_index: assignments parquet `partitionBy("__cell")` +
    the codebook as a one-row-per-cell parquet sidecar + a stats sidecar
    recording the TRAINING-TIME mean assigned distance (the staleness
    baseline append_ivf_index compares against).

    Cell-partitioned layout is the at-scale probe story: a query touching
    nprobe cells scans ONLY those cells' files — Spark partition pruning,
    so probe I/O is ~nprobe/n_cells of the corpus regardless of its size."""
    assigned, centers = index
    assigned.write.mode(mode).partitionBy("__cell").parquet(f"{path}/cells")
    spark = assigned.sparkSession
    spark.createDataFrame(
        [(i, list(map(float, c))) for i, c in enumerate(centers)],
        "cell int, center array<double>",
    ).coalesce(1).write.mode(mode).parquet(f"{path}/codebook")
    base = _mean_assigned_dist(assigned, centers)
    spark.createDataFrame(
        [(float(base),)], "baseline_mean_dist double"
    ).coalesce(1).write.mode(mode).parquet(f"{path}/stats")


def read_ivf_index(
    spark, path: str
) -> tuple[DataFrame, list[list[float]]]:
    """Load a persisted IVF index; the assignments scan keeps the
    partition column so downstream `__cell` filters prune at the source."""
    assigned = spark.read.parquet(f"{path}/cells")
    codebook = spark.read.parquet(f"{path}/codebook").orderBy("cell").collect()
    centers = [list(r["center"]) for r in codebook]
    return assigned, centers


def append_ivf_index(
    spark,
    path: str,
    new_corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    retrain_ratio: float = 1.25,
) -> dict:
    """Incrementally grow a persisted IVF index — the continuous-crawl
    path that was missing: a pipeline ingesting new embeddings every
    hour must not retrain + re-assign the whole corpus per batch.

    New vectors are assigned with the EXISTING codebook (one Arrow
    map-side pass, exactly ivf_index's assignment stage) and appended
    into the cell-partitioned layout, so searches through the updated
    index are IDENTICAL to a from-scratch rebuild with the same
    codebook (pytest-pinned). Cost is O(new batch), never O(corpus).

    Drift control: the stats sidecar stores the training-time mean
    squared distance to the assigned centroid. Each append recomputes
    the mean over the batch; the returned ``staleness_ratio`` =
    batch_mean / baseline_mean. A drifting corpus lands its new
    vectors ever farther from the frozen centroids, inflating the
    ratio — ``retrain_recommended`` fires above ``retrain_ratio``
    (default 1.25), the documented retrain trigger: rebuild with
    ivf_index + write_ivf_index, which resets the baseline.

    Returns {n_added, baseline_mean_dist, batch_mean_dist,
    staleness_ratio, retrain_recommended}.
    """
    existing, centers = read_ivf_index(spark, path)
    assigned, _ = ivf_index(
        new_corpus, id_col=id_col, vec_col=vec_col, centers=centers
    )
    assigned = assigned.persist()
    n_added = assigned.count()
    batch_mean = _mean_assigned_dist(assigned, centers)
    assigned.write.mode("append").partitionBy("__cell").parquet(
        f"{path}/cells"
    )
    assigned.unpersist()
    from ..operators.rollup import _filesystem

    fs = _filesystem(spark, path)
    P = spark._jvm.org.apache.hadoop.fs.Path
    # existence check, not a bare except: a present-but-unreadable
    # sidecar must raise, never silently rebaseline (ADVICE r7)
    if fs.exists(P(f"{path.rstrip('/')}/stats")):
        stats = spark.read.parquet(f"{path}/stats").first()
        baseline = float(stats["baseline_mean_dist"])
    else:
        # index written before the stats sidecar existed: baseline it
        # once from the pre-append assignments (one-time O(corpus))
        baseline = _mean_assigned_dist(
            existing.select(
                F.col(id_col),
                F.col("__v"),
                F.col("__cell").cast("int").alias("__cell"),
            ),
            centers,
        )
        spark.createDataFrame(
            [(float(baseline),)], "baseline_mean_dist double"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    ratio = (batch_mean / baseline) if baseline > 0 else float("inf")
    return {
        "n_added": int(n_added),
        "baseline_mean_dist": baseline,
        "batch_mean_dist": float(batch_mean),
        "staleness_ratio": float(ratio),
        "retrain_recommended": bool(ratio > retrain_ratio),
    }


def maybe_retrain_ivf(
    spark,
    path: str,
    threshold: float = 1.25,
    n_cells: int | None = None,
    seed: int = 42,
    max_train: int = 65536,
    read_only: bool = False,
) -> dict:
    """The WIRED form of append_ivf_index's documented retrain trigger:
    measure the index's current staleness and, when it exceeds
    ``threshold``, rebuild the codebook and re-assign — atomically.

    Staleness here is corpus-wide (mean squared assigned distance over
    ALL indexed vectors vs the stats sidecar's training-time baseline
    — one map-side aggregate, no joins), not the per-batch signal the
    append returns: a retrain decision should weigh the whole index,
    and a single aggregate scan is the natural cost of making it.

    The swap reuses the rollup commit-marker protocol
    (operators/rollup.py): the rebuilt index (cells + codebook + fresh
    baseline stats) is written to ``<path>__swap`` with a ``_commit``
    marker written LAST, then current -> ``<path>__old``, swap in,
    drop old. A crash at any point recovers on the next call: a
    completed swap (marker present) with no live index is adopted; an
    incomplete one is discarded and the old index restored. Searches
    against the retrained index are IDENTICAL to a from-scratch
    ivf_index + write_ivf_index build with the same seed
    (pytest-pinned in test_ivf.py).

    ``read_only=True`` is the pure-report mode behind ``index status``:
    it NEVER mutates — no swap-recovery renames/deletes, no sidecar
    writes, no retrain. An interrupted swap is still reported
    consistently by READING whichever copy the recovery protocol would
    adopt (live index, else committed ``__swap``, else ``__old``)
    without touching it. A missing stats sidecar yields
    ``staleness_ratio=None`` + ``baseline_missing=True`` instead of
    silently installing the current (possibly drifted) mean as the
    baseline. In BOTH modes an unreadable-but-present sidecar raises
    (transient read errors must not rebaseline a drifted index).

    Returns {staleness_ratio, retrained, n_vectors, n_cells} (+
    ``baseline_missing`` when read_only finds no sidecar).
    """
    from ..operators.rollup import (
        _filesystem,
        _read_commit,
        _write_commit,
    )

    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    root = path.rstrip("/")
    tmp, old = root + "__swap", root + "__old"
    fs = _filesystem(spark, root)

    # recover an interrupted previous swap
    live = P(root + "/cells")
    read_root = root
    if read_only:
        # report-only: read whichever copy recovery WOULD adopt,
        # renaming/deleting nothing
        if not fs.exists(live):
            if (
                fs.exists(P(tmp))
                and _read_commit(fs, jvm, tmp) is not None
            ):
                read_root = tmp
            elif fs.exists(P(old + "/cells")):
                read_root = old
    else:
        if not fs.exists(live):
            if fs.exists(P(tmp)) and _read_commit(fs, jvm, tmp) is not None:
                if fs.exists(P(root)):
                    fs.delete(P(root), True)
                fs.rename(P(tmp), P(root))  # swap had fully landed; adopt
            elif fs.exists(P(old)):
                fs.rename(P(old), P(root))  # swap never landed; restore
        if fs.exists(P(old)):
            fs.delete(P(old), True)
        if fs.exists(P(tmp)):
            fs.delete(P(tmp), True)

    existing, centers = read_ivf_index(spark, read_root)
    id_col = next(
        c for c in existing.columns if c not in ("__v", "__cell")
    )
    assigned = existing.select(
        F.col(id_col),
        F.col("__v"),
        F.col("__cell").cast("int").alias("__cell"),
    )
    row = assigned.agg(F.count(F.lit(1)).alias("n")).first()
    n_vectors = int(row["n"])
    cur_mean = _mean_assigned_dist(assigned, centers)
    # 'sidecar missing' (legitimate pre-lifecycle layout -> baseline
    # once) is an EXISTENCE check, not a bare except: a present-but-
    # unreadable sidecar raises in both modes, so a transient read
    # error can never install a drifted mean as the new baseline.
    if fs.exists(P(read_root + "/stats")):
        baseline = float(
            spark.read.parquet(f"{read_root}/stats")
            .first()["baseline_mean_dist"]
        )
    elif read_only:
        return {
            "staleness_ratio": None,
            "retrained": False,
            "n_vectors": n_vectors,
            "n_cells": len(centers),
            "baseline_missing": True,
        }
    else:
        # pre-sidecar index: current state becomes the baseline
        baseline = cur_mean
        spark.createDataFrame(
            [(float(baseline),)], "baseline_mean_dist double"
        ).coalesce(1).write.mode("overwrite").parquet(f"{root}/stats")
    ratio = (cur_mean / baseline) if baseline > 0 else float("inf")
    out = {
        "staleness_ratio": float(ratio),
        "retrained": False,
        "n_vectors": n_vectors,
        "n_cells": len(centers),
    }
    if read_only or ratio <= threshold:
        return out

    cells = n_cells if n_cells is not None else len(centers)
    # Deterministic retrain regardless of parquet read-back order: the
    # codebook-training sample is collected in id order (the sort runs
    # AFTER the row-sample, so it touches <= ~max_train rows at any
    # corpus size), making the rebuild reproducible — ivf_index over
    # the same corpus sorted by id with the same seed yields the
    # identical codebook (pytest-pinned).
    ids_vecs = assigned.select(F.col(id_col), F.col("__v"))
    if n_vectors <= max_train:
        svecs = [
            r["__v"]
            for r in ids_vecs.orderBy(F.col(id_col)).select("__v").collect()
        ]
    else:
        frac = min(1.0, (max_train * 1.2) / n_vectors)
        svecs = [
            r["__v"]
            for r in ids_vecs.sample(frac, seed=seed)
            .orderBy(F.col(id_col)).limit(max_train)
            .select("__v").collect()
        ]
    new_centers_arr = _kmeans_numpy(svecs, cells, seed)
    new_centers = [list(map(float, cc)) for cc in new_centers_arr]
    new_assigned, _ = ivf_index(
        ids_vecs, id_col=id_col, vec_col="__v", centers=new_centers
    )
    write_ivf_index((new_assigned, new_centers), tmp)
    _write_commit(fs, jvm, tmp, None)  # marker LAST: swap is now live
    if fs.exists(P(root)):
        fs.rename(P(root), P(old))
    fs.rename(P(tmp), P(root))
    fs.delete(P(old), True)
    out["retrained"] = True
    out["n_cells"] = cells
    return out


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    index: tuple[DataFrame, list[list[float]]] | None = None,
    centers: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the `nprobe` nearest cells per query,
    exact cosine rerank inside them. Candidates shrink by ~n_cells/nprobe
    versus brute force; recall is tunable with nprobe. Pass a prebuilt
    `index` (from ivf_index) to amortize training across query batches."""
    import numpy as np
    import pandas as pd

    assigned, centers = index if index is not None else ivf_index(
        corpus, id_col, vec_col, n_cells, seed, centers=centers
    )
    centers_arr = np.asarray(centers)

    def _probe(vecs):
        # one batch matmul instead of a per-row python loop. In exact
        # arithmetic ||c||^2 - 2 v.c orders like ||v-c||^2 (the
        # per-row ||v||^2 shift is argsort-invariant); in IEEE doubles
        # the two forms can round near-ties differently, so probe
        # selection is deterministic for THIS form but not promised
        # bit-identical to the loop form on near-tied cells — fine for
        # an approximate index, and EXACT ties still break to the
        # lower cell (stable argsort).
        if len(vecs) == 0:  # arrow can hand an empty batch
            return pd.Series([], dtype=object)
        m = np.stack(vecs.to_numpy())
        d = (centers_arr ** 2).sum(axis=1) - 2.0 * m @ centers_arr.T
        idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe].astype(
            "int32"
        )
        return pd.Series(list(idx))

    # real annotation objects: `from __future__ import annotations` turns
    # inline hints into strings pandas_udf can't resolve from this scope
    _probe.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    probe_cells = F.pandas_udf(_probe, "array<int>")

    # norms hoisted to one per row on BOTH sides (the cosine_topk /
    # semantic_dedup treatment, r10): the inline cosine() recomputed
    # each side's norm per CANDIDATE — at nprobe * n/n_cells candidates
    # per query that is ~3x the per-pair array arithmetic for values
    # the row already determines. Identical IEEE expression per value,
    # so every cosine (and the oracle hash) is unchanged.
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumns({
        "__qn": _norm(F.col("__qv")),
        "__cell": F.explode(probe_cells(F.col("__qv"))),
    })
    cand = (
        assigned.withColumn("__cn", _norm(F.col("__v")))
        .join(F.broadcast(q), "__cell")
        .select(
            query_id_col, id_col,
            F.try_divide(
                _dot(F.col("__qv"), F.col("__v")),
                F.col("__qn") * F.col("__cn"),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_blocks: int = 4,
    seed: int = 42,
    dim: int | None = None,
    vector_join: str = "broadcast",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) with LSH-block
    candidate generation — the embedding twin of minhash_dedup_pairs.
    Pass ``dim`` to keep plan construction fully lazy (see lsh_topk).

    Plan shape (the round-9 rewrite — a stagewise sf10 profile showed
    the old plan spent ~90% of its 227 s shuffling candidate rows that
    carried BOTH 64-double vectors through the self-join and the
    pair-dedup exchange): candidates stay NARROW (id_a, id_b) through
    the block self-join and dropDuplicates, and the vectors attach
    AFTER dedup via two joins against the (id, vector, norm) table, so
    wide rows never shuffle — the exact-cosine verify runs map-side in
    the same stage and only surviving pairs flow on. ``vector_join``:
    "broadcast" (default) attaches map-side — right whenever the
    embedding table fits executor memory (it is ~dim x 8 bytes per
    row; 100 MB at 200K x 64d), the common per-shard/per-epoch case;
    "shuffle" for tables beyond broadcast reach (two sort-merge joins
    — still strictly narrower than shuffling vectors through the
    dedup). Cosines are the identical float values either way (same
    precomputed norms, same dot fold)."""
    if vector_join not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown vector_join {vector_join!r}")
    base = df.select(id_col, F.col(vec_col).cast("array<double>").alias("__v"))
    if dim is None:
        dim = len(base.select("__v").first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    bits_per_block = n_planes // n_blocks
    sig = base.withColumn("__sig", lsh_signature(F.col("__v"), planes))
    blocks = sig.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("blk"),
                    F.shiftright("__sig", b * bits_per_block)
                    .bitwiseAND(F.lit((1 << bits_per_block) - 1))
                    .alias("key"),
                )
                for b in range(n_blocks)
            ])
        ).alias("bk"),
    ).select(id_col, "bk.blk", "bk.key")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        # dedup BEFORE attach+verify: a pair matching in several blocks
        # would otherwise verify once per duplicate, and the dedup
        # exchange moves 16-byte id pairs instead of 1 KB vector rows
        .dropDuplicates(["id_a", "id_b"])
    )
    # per-row norm computed ONCE here: the per-pair cosine below is then
    # a single dot-product aggregate instead of three (dot + 2 norms) —
    # the identical float value (same inputs, same ops)
    vec = base.select(
        F.col(id_col).alias("__vid"), "__v", _norm(F.col("__v")).alias("__n")
    )
    va = vec.select(
        F.col("__vid").alias("id_a"),
        F.col("__v").alias("__va"), F.col("__n").alias("__na"),
    )
    vb = vec.select(
        F.col("__vid").alias("id_b"),
        F.col("__v").alias("__vb"), F.col("__n").alias("__nb"),
    )
    if vector_join == "broadcast":
        va, vb = F.broadcast(va), F.broadcast(vb)
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine",
            F.try_divide(
                _dot(F.col("__va"), F.col("__vb")),
                F.col("__na") * F.col("__nb"),
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "q",
) -> DataFrame:
    """Symmetric max-abs int8 quantization — the standard 4x storage
    shrink for embedding tables before they ship to an index (per-vector
    scale, codes in [-127, 127]).

    code_i = floor(x_i * 127 / max|x| + 0.5) (round-half-up via the
    floor trick, so every engine computing the same IEEE ops reproduces
    the codes bit-for-bit); dequantized value = code_i * scale with
    scale = max|x| / 127. All-zero vectors get scale 0 and zero codes.

    Entirely narrow — per-row array expressions, no shuffle, no UDF.
    Output: df columns + {out_col} (array<int>), scale (double),
    max_abs_err (double, reconstruction error bound check).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.withColumn("__v", v)
    ma = F.array_max(F.transform(F.col("__v"), F.abs))
    base = base.withColumn("__ma", ma)
    zero = F.col("__ma") == 0
    codes = F.when(
        zero, F.transform(F.col("__v"), lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            F.col("__v"),
            lambda x: F.floor(x * 127.0 / F.col("__ma") + 0.5).cast("int"),
        )
    )
    scale = F.when(zero, F.lit(0.0)).otherwise(F.col("__ma") / 127.0)
    out = (
        base.withColumn(out_col, codes)
        .withColumn("scale", scale)
        .withColumn(
            "max_abs_err",
            F.array_max(
                F.zip_with(
                    F.col("__v"),
                    F.col(out_col),
                    lambda a, c: F.abs(a - c.cast("double") * F.col("scale")),
                )
            ),
        )
    )
    return out.drop("__v", "__ma")


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 8,
    seed: int = 7,
    dim: int | None = None,
    out_col: str = "proj",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: y = R v / sqrt(out_dim)
    with a seeded gaussian matrix compiled to literals — dimensionality
    reduction with ZERO driver-side fitting (contrast create_pca_features,
    which trains on data): pairwise distances are preserved in
    expectation, and the projection of a 100 TB embedding table is a
    narrow codegen projection with no job before it.

    Pass ``dim`` (input width) to keep plan construction fully lazy;
    without it a bounded one-row probe reads the width."""
    if dim is None:
        probe = df.select(vec_col).first()
        if probe is None or probe[0] is None:
            raise ValueError(
                "cannot infer embedding width from an empty DataFrame; "
                "pass dim= explicitly"
            )
        dim = len(probe[0])
    planes = hyperplanes(dim, out_dim, seed)
    scale = 1.0 / (out_dim ** 0.5)
    v = F.col("__v")
    out = df.withColumn("__v", F.col(vec_col).cast("array<double>"))
    P = _nested_double_lit([[float(x) for x in p] for p in planes])
    # ONE transform over the plane matrix instead of an unrolled
    # per-plane list: same per-plane dot (zip_with multiply, left-fold
    # add) times the same scale literal, in the same element order, so
    # the projected floats are bit-identical — while plan construction
    # builds 3 lambda expressions instead of out_dim x 2 (each HOF
    # construction costs ~12 ms of py4j round trips; round-9 profile)
    comps = F.transform(P, lambda p: _dot(v, p) * F.lit(scale))
    return out.withColumn(out_col, comps).drop("__v")


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine over int8-QUANTIZED vectors — the search
    half of quantize_embeddings: both sides quantize (4x smaller scan),
    and because per-vector scales cancel inside the cosine, similarity
    is integer-code arithmetic end-to-end (sums bounded by
    dim * 127^2 — exact in doubles, so another engine reproduces every
    score bit-for-bit before rounding).

    Same plan shape as cosine_topk: broadcast query side, per-query
    rank window, id tie-break.
    """
    # Lean search-side quantization: same code formula as
    # quantize_embeddings (floor(x*127/max|x| + 0.5)) but skips the
    # scale / max_abs_err bookkeeping columns the search never reads,
    # emits codes directly as doubles (no second cast pass), and drops
    # zero vectors (no direction -> NULL cosine; engines disagree on
    # NULL sort order) via the already-computed max|x| instead of a
    # fresh pass over the code array. Three array traversals per row
    # instead of six — this is the whole corpus-side scan cost.
    def _search_codes(side: DataFrame, key: str, out: str) -> DataFrame:
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        staged = side.select(F.col(key), v.alias("__v")).withColumn(
            "__ma", F.array_max(F.transform("__v", F.abs))
        )
        codes = F.transform(
            "__v",
            lambda x: F.floor(x * 127.0 / F.col("__ma") + 0.5)
            .cast("double"),
        )
        return staged.filter(F.col("__ma") > 0).select(
            key, codes.alias(out)
        )

    c = _search_codes(corpus, id_col, "__cv")
    q = _search_codes(queries, query_id_col, "__qv")
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.try_divide(
            _dot(F.col("__qv"), F.col("__cv")),
            _norm(F.col("__qv")) * _norm(F.col("__cv")),
        ).alias("qcosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("qcosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "qcosine", "rank")
    )


def pq_codebooks(
    dim: int, m: int = 8, k: int = 8, seed: int = 5
) -> list[list[list[float]]]:
    """Seeded per-subspace codebooks for product quantization:
    m subspaces of dim/m dims, k centroids each, as plain literals
    (data-independent, like fixed_codebook — reproducible by an
    external oracle; train on a sample for better recall and pass the
    result in the same shape)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(sub)] for _ in range(k)]
        for _ in range(m)
    ]


def _pq_sub(vec: Column, j: int, sub: int) -> Column:
    return F.slice(vec, j * sub + 1, sub)


def _sq_dist_lit(sub_vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid — loop form
    (zip_with + left-fold aggregate), NOT an unrolled per-dimension
    chain: the unrolled terms, inlined m*k times into one generated
    method, blew janino's 64KB limit at (m=8, k=8, sub=8) and silently
    demoted the whole PQ stage to interpreted eval (ERROR CodeGenerator
    in the gate logs; ann_pq_topk spent 10.7 s on a 5K-row corpus).
    The fold is left-associative with a +0.0 identity seed and squares
    through the same POWER expr, so every double is bit-identical to
    the unrolled chain and the SQL oracles replay unchanged.

    ``centroid`` may be a list of floats or an already-built literal
    Column (element_at on a _nested_double_lit codebook — folds to the
    same array literal without per-float py4j calls)."""
    lit_c = (
        centroid if isinstance(centroid, Column)
        else _double_lit(centroid)
    )
    return F.aggregate(
        F.zip_with(sub_vec, lit_c, lambda a, b: (a - b) ** 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Product-quantization encoding: each subvector becomes the index
    of its nearest subspace centroid (ties -> lowest index), giving
    m * log2(k) bits per vector — 64x smaller than float32 at
    (m=8, k=8, dim=64). Pure argmin expressions, narrow, bit-identical
    across engines."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    base = df.withColumn("__v", v)
    codes = []
    for j, book in enumerate(codebooks):
        sv = _pq_sub(F.col("__v"), j, sub)
        B = _nested_double_lit([[float(x) for x in c] for c in book])
        # argmin via array_min over (dist, idx) structs: lexicographic
        # struct comparison gives ties -> lowest index, and each
        # distance expression appears ONCE — the chained-when argmin
        # repeated every dist O(k) times, blowing the expression tree
        # past janino's method limit (codegen fallback) and costing
        # k/2x redundant interpreted evaluation. ONE transform over the
        # codebook literal replaces the unrolled per-codeword list:
        # same zip_with/left-fold distance per codeword in the same
        # order, so codes are bit-identical, while plan construction
        # builds 3 lambdas per subspace instead of k x 2 (round-9
        # driver profile: ~12 ms of py4j round trips per HOF built)
        cands = F.transform(
            B,
            lambda c, i: F.struct(
                _sq_dist_lit(sv, c).alias("d"), i.alias("i")
            ),
        )
        codes.append(F.array_min(cands)["i"].cast("int"))
    return base.withColumn(out_col, F.array(*codes)).drop("__v")


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate L2 top-k via asymmetric distance computation (ADC):
    the corpus is scanned as PQ codes only; each query precomputes its
    m x |book| table of subvector->centroid squared distances ONCE (as
    array columns on the tiny broadcast query side), and per corpus row
    the approximate distance is m array lookups + a sum — the classic
    memory-bound ANN layout (Jegou et al.), here as pure DataFrame
    expressions with no index library.

    Output: query_id, id, approx_dist, rank (ascending distance,
    id tie-break)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    enc = pq_encode(corpus, codebooks, id_col, vec_col).select(
        id_col, "pq_code"
    )
    qv = F.col(vec_col).cast("array<double>")
    q = queries.withColumn("__qv", qv)
    for j, book in enumerate(codebooks):
        sv = _pq_sub(F.col("__qv"), j, sub)
        B = _nested_double_lit([[float(x) for x in c] for c in book])
        # one transform per subspace, not k unrolled distance exprs —
        # identical per-codeword arithmetic and element order
        q = q.withColumn(
            f"__qd{j}", F.transform(B, lambda c: _sq_dist_lit(sv, c))
        )
    q = q.select(query_id_col, *[f"__qd{j}" for j in range(m)])
    approx = None
    for j in range(m):
        term = F.element_at(
            F.col(f"__qd{j}"),
            F.element_at(F.col("pq_code"), j + 1) + 1,
        )
        approx = term if approx is None else approx + term
    scored = enc.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col, approx.alias("approx_dist")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("approx_dist"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_dist", "rank")
    )


def train_pq_codebooks(
    sample: list[list[float]],
    m: int = 8,
    k: int = 8,
    seed: int = 5,
    n_iter: int = 20,
) -> list[list[list[float]]]:
    """Train PQ codebooks on a bounded driver-side sample (the FAISS
    recipe: ~O(256*k) vectors suffice): per-subspace seeded k-means via
    the same _kmeans_numpy kernel as the IVF index. Returns the same
    shape pq_encode/pq_topk consume, so swapping data-independent
    codebooks for trained ones is a parameter change — recall
    improvement is measured in tests/test_quantize_orc.py."""
    if not sample:
        raise ValueError("empty training sample")
    dim = len(sample[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = []
    for j in range(m):
        subvecs = [v[j * sub:(j + 1) * sub] for v in sample]
        centers = _kmeans_numpy(subvecs, k, seed + j, n_iter)
        books.append([[float(x) for x in c] for c in centers])
    return books


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    index: tuple[DataFrame, list[list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ: the production ANN shape (FAISS IndexIVFPQ) as a
    composition of the engine's own primitives — the IVF coarse
    quantizer restricts each query to its nprobe nearest cells
    (partition-prunable at rest via write_ivf_index), and within those
    cells the corpus scans as PQ codes with per-query ADC tables. Probe
    cost ~ (nprobe / n_cells) * |corpus| rows of m small lookups each;
    the full-precision corpus is never read at query time.

    Pass a prebuilt `index` (from ivf_index / read_ivf_index) to skip
    coarse training; `codebooks` come from pq_codebooks or
    train_pq_codebooks."""
    import numpy as np

    if index is None:
        index = ivf_index(
            corpus, id_col, vec_col, n_cells=n_cells, seed=seed
        )
    assigned, centers = index
    enc = pq_encode(
        assigned.withColumnRenamed("__v", "__vec"),
        codebooks, id_col, "__vec",
    ).select(id_col, "__cell", "pq_code")

    centers_arr = np.asarray(centers, dtype="float64")
    m = len(codebooks)
    sub = len(codebooks[0][0])
    qv = F.col(vec_col).cast("array<double>")
    q = queries.withColumn("__qv", qv)
    # nprobe nearest cells per query: ONE transform over the nested
    # codebook literal (built in one driver call — the per-centroid
    # expression list cost n_cells x dim py4j round trips and minutes
    # of plan construction at adaptive cell counts), ranked in-plan.
    # The per-cell distance is the same zip_with + left-fold shape as
    # _sq_dist_lit, so every double — and the SQL oracles replaying the
    # unrolled form — is bit-identical. The loop form also keeps the
    # generated method under janino's 64KB limit (the unrolled chain
    # demoted the whole stage to interpreted eval).
    cent_lit = _nested_double_lit(
        [[float(x) for x in c] for c in centers_arr]
    )
    probes = q.select(
        query_id_col, "__qv",
        F.explode(
            F.transform(
                cent_lit,
                lambda c, i: F.struct(
                    i.alias("__cell"),
                    F.aggregate(
                        F.zip_with(
                            F.col("__qv"), c, lambda a, b: (a - b) ** 2
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                ),
            )
        ).alias("cd"),
    ).select(query_id_col, "__qv", "cd.__cell", "cd.d")
    wprobe = Window.partitionBy(query_id_col).orderBy("d", "__cell")
    probes = (
        probes.withColumn("__pr", F.row_number().over(wprobe))
        .filter(F.col("__pr") <= nprobe)
        .drop("d", "__pr")
    )
    for j, book in enumerate(codebooks):
        sv = _pq_sub(F.col("__qv"), j, sub)
        B = _nested_double_lit([[float(x) for x in c] for c in book])
        # one transform per subspace, not k unrolled distance exprs —
        # identical per-codeword arithmetic and element order
        probes = probes.withColumn(
            f"__qd{j}", F.transform(B, lambda c: _sq_dist_lit(sv, c))
        )
    probes = probes.drop("__qv")

    approx = None
    for j in range(m):
        term = F.element_at(
            F.col(f"__qd{j}"),
            F.element_at(F.col("pq_code"), j + 1) + 1,
        )
        approx = term if approx is None else approx + term
    scored = enc.join(F.broadcast(probes), "__cell").select(
        query_id_col, id_col, approx.alias("approx_dist")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("approx_dist"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_dist", "rank")
    )



def _literal_cell_argmin(centers: list[list[float]]) -> Column:
    """argmin over literal centroids as a pure expression (array_min of
    (d2, cell) structs; ties to the lowest cell, matching np.argmin).
    Bit-exactly replayable by a SQL oracle — but O(n_cells * dim) ops
    PER ROW, and past ~64 cells the generated method outgrows codegen
    and falls back to interpreted eval. Use the Arrow path beyond that."""
    P = _nested_double_lit([[float(x) for x in c] for c in centers])
    # the centroid self-dots are constants: fold them in PYTHON with the
    # exact left-fold order _dot uses (acc = acc + x*x over doubles), so
    # the literal is bit-identical to what Catalyst used to constant-fold
    # out of _dot(c, c)
    cc = []
    for c in centers:
        acc = 0.0
        for x in c:
            acc = acc + float(x) * float(x)
        cc.append(acc)
    CC = _double_lit(cc)
    # ONE transform over the centroid matrix instead of an unrolled
    # per-cell struct list: same d2 arithmetic per cell in the same
    # element order, so argmin (array_min over (d, cell) structs,
    # lexicographic = ties to lowest cell) is unchanged, while plan
    # construction builds ~6 lambda expressions instead of n_cells x 6
    cells = F.transform(
        P,
        lambda c, i: F.struct(
            (
                _dot(F.col("__v"), F.col("__v"))
                - 2.0 * _dot(F.col("__v"), c)
                + F.element_at(CC, i + 1)
            ).alias("d"),
            i.alias("cell"),
        ),
    )
    return F.array_min(cells)["cell"]


def _arrow_cell_argmin(centers: list[list[float]]) -> Column:
    """argmin via one Arrow-batched numpy matmul per batch — the scale
    path for large codebooks (the same shape ivf_index uses). Same
    assignment as the literal expression except at exact-tie Voronoi
    boundaries (summation order), which is measure-zero for real data."""
    import numpy as np
    import pandas as pd

    centers_arr = np.asarray(centers, dtype="float64")

    def _assign(vecs):
        m = np.stack(vecs.to_numpy())
        dist = (
            (m ** 2).sum(axis=1, keepdims=True)
            - 2.0 * m @ centers_arr.T
            + (centers_arr ** 2).sum(axis=1)
        )
        return pd.Series(dist.argmin(axis=1).astype("int32"))

    return F.pandas_udf(_assign, "int")(F.col("__v"))


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: list[list[float]] | None = None,
    n_cells: int = 8,
    seed: int = 7,
    dim: int | None = None,
    assign: str = "literal",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
    assign every embedding to its nearest codebook centroid, then compare
    pairs ONLY within a cell; a vector is a duplicate if some lower-id
    vector in its cell has cosine >= threshold.

    Returns one row per input vector: (id_col, cell, dup_of, keep) where
    dup_of is the smallest matching lower id (null if none) and
    keep = dup_of IS NULL. Chains are not contracted (1~2, 2~3, !1~3
    drops both 2 and 3) — use dedup.neardup_clusters for transitive
    canonicalization.

    Scale: the all-pairs comparison is confined to cells — the self-join
    is an equi-join on cell, never a cross join, and cell population is
    corpus_size / n_cells on average; grow n_cells with the corpus (the
    SemDeDup paper uses ~100k clusters at web scale). Assignment is a
    pure codegen expression over literal centroids (argmin of squared L2
    via an array_min over (dist, cell) structs — ties to the lowest cell,
    matching np.argmin); with `centers` supplied (or the default seeded
    codebook) plan construction touches no data, so an external oracle
    can replay the whole pipeline.
    """
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    if centers is None:
        if dim is None:
            first = base.select("__v").first()
            if first is None or first[0] is None:
                raise ValueError(
                    "semantic_dedup: cannot infer embedding dim from an "
                    "empty (or all-null) input; pass dim= or centers="
                )
            dim = len(first[0])
        centers = fixed_codebook(dim, n_cells=n_cells, seed=seed)
    cell_expr = (
        _arrow_cell_argmin(centers) if assign == "arrow"
        else _literal_cell_argmin(centers)
    )
    assigned = base.withColumns({
        "cell": cell_expr,
        # one norm per ROW: the per-pair cosine is a single dot-product
        # (same float value as cosine(), 3x less interpreted work)
        "__n": _norm(F.col("__v")),
    }).persist()
    # persisted: the n_cells distance expressions feed both join sides
    a, b = assigned.alias("a"), assigned.alias("b")
    dup_of = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(
            F.try_divide(
                _dot(F.col("a.__v"), F.col("b.__v")),
                F.col("a.__n") * F.col("b.__n"),
            ) >= F.lit(threshold)
        )
        .groupBy(F.col(f"b.{id_col}").alias(id_col))
        .agg(F.min(F.col(f"a.{id_col}")).alias("dup_of"))
    )
    out = (
        assigned.join(dup_of, id_col, "left")
        .select(
            id_col, "cell", "dup_of", F.col("dup_of").isNull().alias("keep")
        )
    )
    # Swap caches: the 4-column verdict table is far smaller than the
    # embedding-carrying intermediate, so materialize it eagerly and
    # release `assigned` — repeated sweeps (per-epoch dedup) no longer
    # accumulate executor storage.
    out = out.persist()
    out.count()
    assigned.unpersist()
    return out


def hard_negative_mining(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    min_cosine: float | None = None,
    centers: list[list[float]] | None = None,
    n_cells: int = 8,
    seed: int = 7,
    dim: int | None = None,
    assign: str = "literal",
) -> DataFrame:
    """Contrastive-training data mining: for every anchor vector, the
    top-k most cosine-similar vectors carrying a DIFFERENT label —
    the "hard negatives" that sit near the anchor in embedding space
    but belong to another class. `min_cosine` optionally drops easy
    negatives below a similarity floor.

    Scale shape is SemDeDup's: vectors are assigned to literal-codebook
    cells by an argmin expression, and candidate pairs come ONLY from a
    within-cell equi-join — never a corpus cross join. Grow n_cells
    with the corpus; mined negatives are approximate (cell-local) by
    design, which is exactly how production contrastive pipelines
    bound the search. With `centers` supplied (or the seeded default
    codebook) plan construction reads no data, so an external oracle
    replays every pair.

    Output: (anchor_id, negative_id, anchor_label, negative_label,
    cell, neg_cosine, rank).
    """
    base = df.select(
        F.col(id_col), F.col(label_col).alias("__lbl"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    if centers is None:
        if dim is None:
            first = base.select("__v").first()
            if first is None or first[0] is None:
                raise ValueError(
                    "hard_negative_mining: cannot infer embedding dim "
                    "from an empty input; pass dim= or centers="
                )
            dim = len(first[0])
        centers = fixed_codebook(dim, n_cells=n_cells, seed=seed)
    cell_expr = (
        _arrow_cell_argmin(centers) if assign == "arrow"
        else _literal_cell_argmin(centers)
    )
    assigned = base.withColumns({
        "cell": cell_expr,
        "__n": _norm(F.col("__v")),  # once per row, not per pair
    }).persist()
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.__lbl") != F.col("b.__lbl")),
    ).select(
        F.col(f"a.{id_col}").alias("anchor_id"),
        F.col(f"b.{id_col}").alias("negative_id"),
        F.col("a.__lbl").alias("anchor_label"),
        F.col("b.__lbl").alias("negative_label"),
        F.col("a.cell").alias("cell"),
        F.try_divide(
            _dot(F.col("a.__v"), F.col("b.__v")),
            F.col("a.__n") * F.col("b.__n"),
        ).alias("neg_cosine"),
    )
    if min_cosine is not None:
        pairs = pairs.filter(F.col("neg_cosine") >= float(min_cosine))
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("neg_cosine"), F.asc("negative_id")
    )
    out = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    out = out.persist()
    out.count()
    assigned.unpersist()
    return out


def centroid_similarity(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    seed_pred: Column,
    dim: int | None = None,
) -> DataFrame:
    """Seed-centroid quality scoring: cosine of every embedding to the
    centroid of a trusted seed subset (`seed_pred` rows). The GPT-3 /
    CCNet move — "score the whole crawl by similarity to Wikipedia" —
    done in embedding space: one tiny aggregation builds the centroid,
    then scoring is a narrow per-row projection over the corpus.

    Scale shape: the centroid is a per-dimension aggregate of the seed
    rows via posexplode -> groupBy(pos) -> sum — fully distributed; the
    only driver materialization is the `dim`-row centroid itself
    (bounded by the embedding width, never the corpus). The centroid is
    then inlined as a literal array, so corpus scoring is a single
    codegen projection: no join, no shuffle, no second pass. Cosine is
    invariant to positive scaling, so the UN-normalized per-dim sums
    are used directly — with integer-quantized inputs every arithmetic
    step is exact IEEE, reproducible across partition orders and
    engines.

    Output: df's columns + `centroid_cosine`.
    """
    base = df.select(F.col(vec_col).alias("__v"))
    if dim is None:
        row = base.filter(F.size("__v") > 0).first()
        if row is None:
            raise ValueError(
                "cannot infer dim from an empty input; pass dim="
            )
        dim = len(row[0])
    sums = (
        df.filter(seed_pred)
        .select(F.posexplode(vec_col).alias("__pos", "__x"))
        .groupBy("__pos")
        .agg(F.sum(F.col("__x").cast("double")).alias("__s"))
        .collect()
    )
    if not sums:
        raise ValueError("seed_pred selected no rows; centroid undefined")
    cvals = [0.0] * dim
    for r in sums:
        cvals[r["__pos"]] = float(r["__s"])
    cnorm = math.sqrt(math.fsum(v * v for v in cvals))
    if cnorm == 0.0:
        raise ValueError("seed centroid is the zero vector")
    cen = _double_lit(cvals)
    v = F.col(vec_col)
    return df.withColumn(
        "centroid_cosine",
        F.try_divide(
            _dot(v, cen),
            _norm(v) * F.lit(cnorm),
        ),
    )


def diversity_sample(
    df: DataFrame,
    k_per_cell: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: list[list[float]] | None = None,
    n_cells: int = 8,
    seed: int = 7,
    dim: int | None = None,
    assign: str = "literal",
) -> DataFrame:
    """Coverage-driven diverse subset selection: assign every embedding
    to its nearest codebook cell, keep the k most prototypical vectors
    per cell (highest cosine to the cell centroid, ties to the lower
    id). The cheap distributed stand-in for k-center/facility-location
    prototype selection: every region of embedding space contributes
    representatives, so the sample spans the corpus instead of
    oversampling its dense core — the selection step SemDeDup-style
    curation pipelines run after dedup.

    Shape: assignment is the same literal-argmin (or Arrow matmul)
    projection semantic_dedup uses; ranking is one window partitioned by
    cell. Cell count grows with the corpus (see semantic_dedup), so
    per-cell populations — and thus per-partition window sorts — stay
    bounded at scale.

    Output: (id_col, cell, proto_cos, rank), rank 1..k_per_cell.
    """
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    if centers is None:
        if dim is None:
            first = base.select("__v").first()
            if first is None or first[0] is None:
                raise ValueError(
                    "diversity_sample: cannot infer embedding dim from an "
                    "empty (or all-null) input; pass dim= or centers="
                )
            dim = len(first[0])
        centers = fixed_codebook(dim, n_cells=n_cells, seed=seed)
    cell_expr = (
        _literal_cell_argmin(centers)
        if assign == "literal"
        else _arrow_cell_argmin(centers)
    )
    cent_lit = _nested_double_lit(
        [[float(x) for x in c] for c in centers]
    )
    assigned = base.select(
        F.col(id_col), F.col("__v"), cell_expr.alias("cell")
    ).withColumn(
        "proto_cos",
        cosine(F.col("__v"), F.element_at(cent_lit, F.col("cell") + 1)),
    )
    w = Window.partitionBy("cell").orderBy(
        F.desc("proto_cos"), F.asc(id_col)
    )
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_per_cell)
        .select(id_col, "cell", "proto_cos", "rank")
    )


def semantic_decontamination(
    train: DataFrame,
    reference: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-space eval-set decontamination: flag every training
    vector whose cosine similarity to ANY reference (eval) vector
    reaches ``threshold`` — the semantic complement to the exact n-gram
    scrub (decontamination.py) and the shingle-Jaccard fuzzy match
    (dedup.cross_corpus_neardup). Paraphrased or translated eval
    leakage survives both lexical nets; an embedding match doesn't.

    Shape: the reference side is an eval set — small by construction —
    so it BROADCASTS and the corpus scan is one map-side pass over the
    training corpus (per train row: cosine vs each broadcast eval
    vector, a dim-bounded loop in codegen). The only shuffle is the
    per-id best-match argmax over the CONTAMINATED subset — a
    partial_min(struct) aggregate with map-side combine (plan-checked:
    Spark picks SortAggregate for struct min, so partitions key-sort
    the contaminated rows, but the exchange carries at most ONE row
    per contaminated train id, never per pair, and no per-group
    cosine ordering is materialized the way the former row_number
    window did). Linear in corpus size; grow the reference beyond
    broadcast size and you want the banded/celled pipelines instead.

    Output: one row per CONTAMINATED train vector —
    (id_col, ref_id, cosine) with ref_id the best-matching reference
    vector (highest cosine, ties to the lowest ref id; the argmax is
    min(struct(-cosine, ref_id)), which realizes exactly that order).
    """
    # norms precomputed ONCE per side (identical IEEE expression to the
    # inline cosine — same ops on the same operands — so oracle floats
    # are unchanged; the per-pair work drops to one dot product).
    # cast("array<double>") BEFORE any arithmetic, like every sibling
    # op: float32 inputs are exact in double, so products/sums match a
    # double-computing oracle bitwise — without it, float32 product
    # rounding (~1e-8) straddles the 1e-6 oracle rounding once per few
    # thousand rows (found by the first full sf0.1 gate)
    rv = F.col(vec_col).cast("array<double>")
    ref = reference.select(
        F.col(id_col).alias("__rid"),
        rv.alias("__rv"),
        _norm(rv).alias("__rnorm"),
    )
    t = train.select(
        F.col(id_col),
        rv.alias("__tv"),
        _norm(rv).alias("__tnorm"),
    )
    joined = t.join(F.broadcast(ref))
    cos = F.try_divide(
        _dot(F.col("__tv"), F.col("__rv")),
        F.col("__tnorm") * F.col("__rnorm"),
    )
    # argmax via min(struct(-cos, rid, cos)): smallest -cos = largest
    # cos, ties break to the lowest rid; the third field just carries
    # the original cosine back out (it can only be compared when
    # (-cos, rid) ties, i.e. never across distinct ref rows). A struct
    # min is a plain hash aggregate — partial (map-side) combine, one
    # shuffled row per contaminated id, no window sort.
    best = F.min(
        F.struct(
            (-F.col("__cos")).alias("neg"),
            F.col("__rid").alias("rid"),
            F.col("__cos").alias("cos"),
        )
    ).alias("__best")
    return (
        joined.withColumn("__cos", cos)
        .filter(F.col("__cos") >= threshold)
        .groupBy(id_col)
        .agg(best)
        .select(
            id_col,
            F.col("__best.rid").alias("ref_id"),
            F.col("__best.cos").alias("cosine"),
        )
    )


def margin_bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mutual: bool = True,
    method: str = "auto",
    nprobe: int = 4,
    seed: int = 42,
    brute_max: int = 4096,
    centers_factory=None,
) -> DataFrame:
    """Parallel-pair mining by ratio-margin scoring (the public
    CCMatrix / Artetxe-Schwenk criterion): a candidate pair (x, y)
    scores margin = cos(x, y) / (0.5 * (mean cos of x to its k nearest
    targets + mean cos of y to its k nearest sources)). The
    normalization cancels hubness — a target that is "close to
    everything" inflates its neighbors' mean too, so only pairs that
    are close RELATIVE to their neighborhoods rank high. This is the
    standard mining step that pairs sentences across languages in a
    shared embedding space before translation-pair training.

    Candidates are each source's k nearest targets (forward mining);
    `mutual=True` keeps only pairs where the target also ranks the
    source as its best candidate — the high-precision setting.

    The k-NN means fold in rank order (array_sort then one aggregate),
    so the float sum is deterministic and an external oracle replays
    it exactly.

    `method`: the top-k engine per direction. "brute" is exact
    `cosine_topk` (O(|src|*|tgt|) scored pairs — correct and
    oracle-replayable, quadratic); "ivf" builds a seeded-kmeans IVF
    index per side (`adaptive_cells` sizing, so per-cell candidate
    work stays bounded as the corpora grow) and probes `nprobe` cells
    per query — the corpus-scale path, approximate with tunable
    recall. "auto" (default) picks brute up to `brute_max` vectors on
    the larger side (one bounded count() each), IVF above — the same
    data-probed engine dispatch as heavy_hitters. True pairs sit at
    high cosine, exactly where IVF recall concentrates, so mining
    quality degrades far slower than raw k-NN recall.

    `centers_factory` (optional): called as centers_factory(n_side) to
    supply each IVF side's codebook instead of seeded-kmeans training —
    with a deterministic factory (e.g. fixed_codebook + adaptive_cells)
    the whole probed mining path becomes a pure function of the data,
    so an external SQL oracle can replay it exactly. Ignored on the
    brute path.

    Output: (src_id, tgt_id, cosine, src_knn_avg, tgt_knn_avg, margin)
    — one row per source (forward best) or per mutual pair.
    """
    from pyspark.sql import Window

    if method not in ("auto", "brute", "ivf"):
        raise ValueError(f"unknown method {method!r}")

    def _both_counts():
        # ONE action for both side counts (r9: was two count() jobs):
        # tag each side, count rows and sum the tag — exact longs, so
        # n_src/n_tgt are the same integers the two counts returned
        row = (
            src.select(F.lit(1).alias("__s"))
            .unionAll(tgt.select(F.lit(0).alias("__s")))
            .agg(F.sum("__s").alias("s"), F.count(F.lit(1)).alias("t"))
            .first()
        )
        n_s = int(row["s"] or 0)
        return n_s, int(row["t"]) - n_s

    n_src = n_tgt = None
    if method == "auto":
        n_src, n_tgt = _both_counts()
        method = "brute" if max(n_src, n_tgt) <= brute_max else "ivf"
    src_q = src.select(F.col(id_col).alias("query_id"), vec_col)
    tgt_q = tgt.select(F.col(id_col).alias("query_id"), vec_col)
    if method == "brute":
        fwd = cosine_topk(tgt, src_q, k=k, id_col=id_col, vec_col=vec_col)
        bwd = cosine_topk(src, tgt_q, k=k, id_col=id_col, vec_col=vec_col)
    else:
        if n_src is None:
            n_src, n_tgt = _both_counts()
        fwd = ivf_topk(
            tgt, src_q, k=k, id_col=id_col, vec_col=vec_col,
            n_cells=adaptive_cells(n_tgt), nprobe=nprobe, seed=seed,
            centers=(
                centers_factory(n_tgt) if centers_factory else None
            ),
        )
        bwd = ivf_topk(
            src, tgt_q, k=k, id_col=id_col, vec_col=vec_col,
            n_cells=adaptive_cells(n_src), nprobe=nprobe, seed=seed,
            centers=(
                centers_factory(n_src) if centers_factory else None
            ),
        )

    def knn_mean(topk: DataFrame, out: str) -> DataFrame:
        # rank-ordered fold: identical float order on every engine
        return topk.groupBy("query_id").agg(
            (
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct("rank", "cosine"))
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["cosine"],
                )
                / F.count(F.lit(1))
            ).alias(out)
        )

    src_avg = knn_mean(fwd, "src_knn_avg").withColumnRenamed(
        "query_id", "src_id"
    )
    tgt_avg = knn_mean(bwd, "tgt_knn_avg").withColumnRenamed(
        "query_id", "tgt_id"
    )
    cand = (
        fwd.select(
            F.col("query_id").alias("src_id"),
            F.col(id_col).alias("tgt_id"),
            "cosine",
        )
        .join(src_avg, "src_id")
        .join(tgt_avg, "tgt_id")
        .withColumn(
            "margin",
            F.try_divide(
                F.col("cosine"),
                (F.col("src_knn_avg") + F.col("tgt_knn_avg")) * 0.5,
            ),
        )
    )
    w_src = Window.partitionBy("src_id").orderBy(
        F.desc("margin"), F.asc("tgt_id")
    )
    best = cand.withColumn("__r", F.row_number().over(w_src)).filter(
        F.col("__r") == 1
    ).drop("__r")
    if not mutual:
        return best.select(
            "src_id", "tgt_id", "cosine",
            "src_knn_avg", "tgt_knn_avg", "margin",
        )
    w_tgt = Window.partitionBy("tgt_id").orderBy(
        F.desc("margin"), F.asc("src_id")
    )
    best_t = (
        cand.withColumn("__r", F.row_number().over(w_tgt))
        .filter(F.col("__r") == 1)
        .select(F.col("src_id").alias("__bs"), F.col("tgt_id").alias("__bt"))
    )
    return best.join(
        best_t,
        (best["src_id"] == best_t["__bs"])
        & (best["tgt_id"] == best_t["__bt"]),
    ).select(
        "src_id", "tgt_id", "cosine",
        "src_knn_avg", "tgt_knn_avg", "margin",
    )
