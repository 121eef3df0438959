"""IVF ANN: recall vs brute force, candidate pruning."""

from __future__ import annotations

from data_pipeline_framework_spark.functions.similarity import (
    cosine_topk,
    ivf_index,
    ivf_topk,
)
from data_pipeline_framework_spark.sources.readers import read_parquet


def test_ivf_recall_and_pruning(spark, sf_dir):
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    queries = (
        emb.limit(5)
        .selectExpr("vec_id AS query_id", "embedding")
    )
    exact = cosine_topk(emb, queries, k=10)
    index = ivf_index(emb, n_cells=8, seed=42)
    approx = ivf_topk(emb, queries, k=10, n_cells=8, nprobe=4, index=index)

    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx.collect():
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])

    # probing half the cells must recover most of the true top-10
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6

    # the query vector itself lives in a probed cell -> always found
    for q in exact_sets:
        assert q in approx_sets[q]

    # pruning: candidates scanned < full corpus per query
    assigned, _ = index
    n = emb.count()
    largest_4_cells = (
        assigned.groupBy("__cell").count()
        .orderBy("count", ascending=False).limit(4)
        .agg({"count": "sum"}).first()[0]
    )
    assert largest_4_cells < n  # probing 4 of 8 cells cannot scan everything


def test_embedding_neardup_vector_join_modes_identical(spark):
    """r9 narrow-candidate rewrite: broadcast and shuffle vector
    attachment produce the identical pair set and cosines (same
    precomputed norms, same dot fold), and bad modes are rejected."""
    import pytest

    from data_pipeline_framework_spark.functions.similarity import (
        embedding_neardup_pairs,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    a = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(
            vecs, threshold=0.8, dim=3, vector_join="broadcast"
        ).collect()
    }
    b = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(
            vecs, threshold=0.8, dim=3, vector_join="shuffle"
        ).collect()
    }
    assert a and a == b
    with pytest.raises(ValueError, match="vector_join"):
        embedding_neardup_pairs(vecs, vector_join="nope", dim=3)


def test_ivf_probe_empty_batch_and_exact_ties(spark):
    """ADVICE r8: the vectorized probe must survive an empty arrow
    batch (np.stack raises on []), and EXACT centroid ties must still
    break to the lower cell index (stable argsort)."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    centers = [[1.0, 0.0], [0.0, 1.0]]

    # empty queries -> empty result, no ValueError from the udf
    empty_q = spark.createDataFrame(
        [], "query_id long, embedding array<double>"
    )
    out = ivf_topk(
        corpus, empty_q, k=2, nprobe=1, centers=centers, n_cells=2
    )
    assert out.count() == 0

    # a query exactly equidistant from both centroids probes cell 0
    tie_q = spark.createDataFrame(
        [(99, [1.0, 1.0])], "query_id long, embedding array<double>"
    )
    got = ivf_topk(
        corpus, tie_q, k=3, nprobe=1, centers=centers, n_cells=2
    ).collect()
    # cell 0 holds vec 1 ([1,0]) and vec 3 ([1,1] ties to lower cell)
    assert sorted(r["vec_id"] for r in got) == [1, 3]


def test_lsh_topk_with_dim_is_fully_lazy(spark, monkeypatch):
    """With dim given, no driver action may run during plan construction."""
    from pyspark.sql import DataFrame

    from data_pipeline_framework_spark.functions import similarity as SIM

    vecs = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    qs = vecs.limit(2).selectExpr("vec_id as query_id", "embedding")

    def boom(self, *a, **k):
        raise AssertionError("driver action during plan construction")

    monkeypatch.setattr(DataFrame, "first", boom)
    monkeypatch.setattr(DataFrame, "collect", boom)
    monkeypatch.setattr(DataFrame, "count", boom)
    plan_a = SIM.lsh_topk(vecs, qs, k=3, dim=3)
    plan_b = SIM.embedding_neardup_pairs(vecs, threshold=0.5, dim=3)
    monkeypatch.undo()
    assert plan_a.count() > 0 and plan_b.count() >= 0


def test_ivf_index_roundtrip_and_partition_pruning(spark, tmp_path):
    from data_pipeline_framework_spark.functions import similarity as SIM

    import random
    rng = random.Random(3)
    vecs = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    qs = vecs.limit(3).selectExpr("vec_id as query_id", "embedding")
    idx = SIM.ivf_index(vecs, n_cells=4, seed=11)
    path = str(tmp_path / "ivf")
    SIM.write_ivf_index(idx, path)
    loaded = SIM.read_ivf_index(spark, path)
    assert [
        [round(x, 9) for x in c] for c in loaded[1]
    ] == [[round(x, 9) for x in c] for c in idx[1]]

    fresh = SIM.ivf_topk(vecs, qs, k=5, index=idx)
    reread = SIM.ivf_topk(vecs, qs, k=5, index=loaded)
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"])
    assert sorted(map(key, fresh.collect())) == \
        sorted(map(key, reread.collect()))

    # a cell filter on the persisted layout must prune at the source
    probe = loaded[0].filter("__cell IN (0, 1)")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "__cell" in plan.split(
        "PartitionFilters"
    )[1][:200], plan


def test_ivfpq_recall_and_probe_bound(spark):
    import random as pyrandom

    from data_pipeline_framework_spark.functions.similarity import (
        ivf_index,
        ivfpq_topk,
        train_pq_codebooks,
    )

    from pyspark.sql import functions as F

    rng = pyrandom.Random(9)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(400)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        rows[:1], "query_id long, embedding array<double>"
    )
    books = train_pq_codebooks([r[1] for r in rows[:200]], m=4, k=8)
    index = ivf_index(corpus, n_cells=8, seed=11)
    out = ivfpq_topk(
        corpus, queries, books, k=20, n_cells=8, nprobe=3, index=index
    ).collect()
    assert len(out) == 20
    q = rows[0][1]
    exact = sorted(
        rows, key=lambda r: sum((a - b) ** 2 for a, b in zip(r[1], q))
    )
    top = {r[0] for r in exact[:20]}
    overlap = len({r["vec_id"] for r in out} & top)
    assert overlap >= 7  # observed 9 with these seeds; chance ~1
    # probe bound: candidates scanned <= rows in the 3 probed cells,
    # strictly fewer than the whole corpus
    assigned, _ = index
    cell_sizes = {r["__cell"]: r["n"] for r in
                  assigned.groupBy("__cell")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
    top3 = sum(sorted(cell_sizes.values(), reverse=True)[:3])
    assert top3 < 400  # probing can never touch the full corpus


def test_fixed_codebook_unit_norm_and_balanced_cells(spark):
    """Raw gaussian centers let the c.c spread dominate the argmin, so
    normalized embeddings all land in the smallest-norm cell and every
    'blocked' join silently becomes all-pairs. Guard both properties:
    centers are unit norm, and real testdata spreads across cells."""
    import math

    from pyspark.sql import functions as F

    from data_pipeline_framework_spark.functions.similarity import (
        fixed_codebook,
    )

    cents = fixed_codebook(64, n_cells=8, seed=7)
    for c in cents:
        assert math.isclose(sum(x * x for x in c), 1.0, rel_tol=1e-9)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.select(F.col("embedding").cast("array<double>").alias("v"))
    cells = []
    for j, cvec in enumerate(cents):
        c = F.array(*[F.lit(float(x)) for x in cvec])
        dot = F.aggregate(
            F.zip_with(F.col("v"), c, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        d2 = -2.0 * dot + sum(x * x for x in cvec)
        cells.append(F.struct(d2.alias("d"), F.lit(j).alias("cell")))
    counts = [
        r["count"]
        for r in base.withColumn(
            "cell", F.array_min(F.array(*cells))["cell"]
        ).groupBy("cell").count().collect()
    ]
    total = sum(counts)
    assert len(counts) >= 4            # several cells populated
    assert max(counts) < 0.5 * total   # no degenerate mega-cell


def test_semantic_dedup_arrow_assignment_matches_literal(spark):
    """the Arrow matmul cell assignment must agree with the oracle-exact
    literal argmin on real data (ties are measure-zero here)."""
    from pyspark.sql import functions as F

    from data_pipeline_framework_spark.functions.similarity import (
        fixed_codebook,
        semantic_dedup,
    )
    from data_pipeline_framework_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = fixed_codebook(64, n_cells=16, seed=7)
    lit = semantic_dedup(emb, threshold=0.35, centers=cents)
    arw = semantic_dedup(emb, threshold=0.35, centers=cents,
                         assign="arrow")
    j = lit.alias("l").join(arw.alias("a"), "vec_id")
    assert j.filter(
        (F.col("l.cell") != F.col("a.cell"))
        | (F.col("l.keep") != F.col("a.keep"))
    ).count() == 0
    lit.unpersist(); arw.unpersist()


def test_append_ivf_index_matches_rebuild_and_flags_drift(spark, tmp_path):
    """incremental append: (1) searching the appended index returns
    EXACTLY what a from-scratch rebuild with the same codebook returns,
    (2) an in-distribution batch reads ~1.0 staleness, (3) a drifted
    batch trips the retrain trigger."""
    import random

    from data_pipeline_framework_spark.functions import similarity as SIM

    rng = random.Random(5)
    base_rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(300)
    ]
    new_rows = [
        (1000 + i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(80)
    ]
    base = spark.createDataFrame(
        base_rows, "vec_id long, embedding array<double>"
    )
    new = spark.createDataFrame(
        new_rows, "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf_inc")
    idx = SIM.ivf_index(base, n_cells=4, seed=11)
    SIM.write_ivf_index(idx, path)

    rep = SIM.append_ivf_index(spark, path, new)
    assert rep["n_added"] == 80
    # same distribution -> mean distance comparable to training time
    assert 0.7 < rep["staleness_ratio"] < 1.3
    assert not rep["retrain_recommended"]

    # search through the updated index == rebuild with the SAME codebook
    # over the union corpus
    union = base.unionByName(new)
    rebuilt = SIM.ivf_index(union, centers=idx[1])
    loaded = SIM.read_ivf_index(spark, path)
    qs = union.limit(4).selectExpr("vec_id as query_id", "embedding")
    a = SIM.ivf_topk(union, qs, k=5, nprobe=2, index=loaded)
    b = SIM.ivf_topk(union, qs, k=5, nprobe=2, index=rebuilt)
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"])  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))
    # and the appended rows actually landed in the persisted layout
    assert loaded[0].count() == 380

    # drifted batch (shifted far off every centroid) -> retrain fires
    drifted = spark.createDataFrame(
        [
            (2000 + i, [rng.gauss(25, 1) for _ in range(8)])
            for i in range(40)
        ],
        "vec_id long, embedding array<double>",
    )
    rep2 = SIM.append_ivf_index(spark, path, drifted)
    assert rep2["staleness_ratio"] > 1.25
    assert rep2["retrain_recommended"]


def test_append_ivf_index_baselines_legacy_index(spark, tmp_path):
    """an index persisted WITHOUT the stats sidecar (pre-lifecycle
    layout) gets baselined from its existing assignments on first
    append instead of failing."""
    import random
    import shutil

    from data_pipeline_framework_spark.functions import similarity as SIM

    rng = random.Random(9)
    base = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf_legacy")
    SIM.write_ivf_index(SIM.ivf_index(base, n_cells=4, seed=3), path)
    shutil.rmtree(f"{path}/stats")  # simulate the old layout

    new = spark.createDataFrame(
        [(500 + i, [rng.gauss(0, 1) for _ in range(20)][:8]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    rep = SIM.append_ivf_index(spark, path, new)
    assert rep["n_added"] == 30
    assert 0.5 < rep["staleness_ratio"] < 1.5
    # sidecar now exists for subsequent appends
    assert spark.read.parquet(f"{path}/stats").count() == 1


def test_margin_bitext_mining_finds_planted_pairs(spark):
    import random

    from data_pipeline_framework_spark.functions.similarity import (
        margin_bitext_mine,
    )

    rng = random.Random(11)
    dim = 16

    def vec():
        return [rng.gauss(0.0, 1.0) for _ in range(dim)]

    # planted true pairs: tgt = src + tiny noise; decoys are independent
    srcs, tgts = [], []
    for i in range(6):
        v = vec()
        srcs.append((i, v))
        tgts.append((100 + i, [x + rng.gauss(0, 0.01) for x in v]))
    for i in range(6, 20):
        srcs.append((i, vec()))
        tgts.append((100 + i, vec()))
    src = spark.createDataFrame(
        srcs, "vec_id long, embedding array<double>"
    )
    tgt = spark.createDataFrame(
        tgts, "vec_id long, embedding array<double>"
    )
    out = {
        r["src_id"]: r
        for r in margin_bitext_mine(src, tgt, k=4, mutual=True).collect()
    }
    # every planted pair is mined mutual-best with a dominant margin
    for i in range(6):
        assert i in out and out[i]["tgt_id"] == 100 + i
        assert out[i]["cosine"] > 0.99
        assert out[i]["margin"] > 1.5
    # margins of true pairs dominate whatever decoys survive mutuality
    decoy_margins = [r["margin"] for s, r in out.items() if s >= 6]
    true_margins = [out[i]["margin"] for i in range(6)]
    if decoy_margins:
        assert min(true_margins) > max(decoy_margins)
    # forward-only mode emits exactly one row per source
    fwd = margin_bitext_mine(src, tgt, k=4, mutual=False)
    assert fwd.count() == 20
    assert fwd.select("src_id").distinct().count() == 20


def test_margin_bitext_ivf_engine_recovers_planted_pairs(spark):
    import random

    from data_pipeline_framework_spark.functions.similarity import (
        margin_bitext_mine,
    )

    rng = random.Random(23)
    dim = 16

    def vec():
        return [rng.gauss(0.0, 1.0) for _ in range(dim)]

    srcs, tgts = [], []
    for i in range(8):
        v = vec()
        srcs.append((i, v))
        tgts.append((100 + i, [x + rng.gauss(0, 0.01) for x in v]))
    for i in range(8, 40):
        srcs.append((i, vec()))
        tgts.append((100 + i, vec()))
    src = spark.createDataFrame(srcs, "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(tgts, "vec_id long, embedding array<double>")
    # force the IVF arm at toy size via brute_max=0
    out = {
        r["src_id"]: r
        for r in margin_bitext_mine(
            src, tgt, k=4, mutual=True, method="auto", brute_max=0
        ).collect()
    }
    # a near-identical pair lands in the same probed cell: all planted
    # pairs are recovered mutual-best even on the approximate engine
    for i in range(8):
        assert i in out and out[i]["tgt_id"] == 100 + i, i
        assert out[i]["cosine"] > 0.99
    import pytest

    with pytest.raises(ValueError):
        margin_bitext_mine(src, tgt, method="nope")

    # centers_factory replaces kmeans training with a supplied codebook
    # — the probed mining becomes a pure function of the data (what
    # lets the sf1 value gate replay this path in SQL), and the
    # planted pairs are still recovered
    from data_pipeline_framework_spark.functions.similarity import (
        fixed_codebook,
    )

    calls = []

    def factory(n):
        calls.append(n)
        return fixed_codebook(dim, n_cells=4, seed=7)

    out_f = {
        r["src_id"]: r
        for r in margin_bitext_mine(
            src, tgt, k=4, mutual=True, brute_max=0,
            centers_factory=factory,
        ).collect()
    }
    assert sorted(calls) == [40, 40]  # one codebook per side
    for i in range(8):
        assert i in out_f and out_f[i]["tgt_id"] == 100 + i, i


def test_maybe_retrain_ivf_rebuilds_and_swaps_atomically(spark, tmp_path):
    """wired retrain trigger: (1) a healthy index is a no-op, (2) drift
    past the threshold rebuilds the codebook and the swapped index
    equals a from-scratch build (same seed, id-ordered sample) down to
    the codebook floats, (3) the baseline resets so the next check
    reads ~1.0, (4) an interrupted swap (marker present, live index
    gone) is adopted on the next call."""
    import random
    import shutil

    from data_pipeline_framework_spark.functions import similarity as SIM

    rng = random.Random(13)
    base = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf_rt")
    SIM.write_ivf_index(SIM.ivf_index(base, n_cells=4, seed=11), path)

    rep = SIM.maybe_retrain_ivf(spark, path)
    assert not rep["retrained"]
    assert 0.7 < rep["staleness_ratio"] < 1.3
    assert rep["n_vectors"] == 300 and rep["n_cells"] == 4

    # drift the corpus far off every centroid, past the trigger
    drifted = spark.createDataFrame(
        [(2000 + i, [rng.gauss(25, 1) for _ in range(8)])
         for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    SIM.append_ivf_index(spark, path, drifted)
    rep2 = SIM.maybe_retrain_ivf(spark, path, threshold=1.25, seed=99)
    assert rep2["retrained"]
    assert rep2["staleness_ratio"] > 1.25
    assert rep2["n_vectors"] == 500

    # the swapped index == a from-scratch build over the same corpus in
    # id order with the same seed: identical codebook, identical search
    union = base.unionByName(drifted)
    scratch = SIM.ivf_index(union.orderBy("vec_id"), n_cells=4, seed=99)
    loaded = SIM.read_ivf_index(spark, path)
    assert loaded[1] == scratch[1]
    qs = union.limit(4).selectExpr("vec_id as query_id", "embedding")
    a = SIM.ivf_topk(union, qs, k=5, nprobe=2, index=loaded)
    b = SIM.ivf_topk(union, qs, k=5, nprobe=2, index=scratch)
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"])  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))

    # baseline was reset by the rebuild: immediately re-checking is calm
    rep3 = SIM.maybe_retrain_ivf(spark, path, threshold=1.25)
    assert not rep3["retrained"]
    assert 0.9 < rep3["staleness_ratio"] < 1.1

    # crash recovery: a completed swap (marker inside) whose rename of
    # the live index happened but whose swap-in never did is adopted
    shutil.copytree(path, f"{path}__swap")
    shutil.rmtree(path)
    rep4 = SIM.maybe_retrain_ivf(spark, f"{path}", threshold=1.25)
    assert not rep4["retrained"] and rep4["n_vectors"] == 500

    # and a swap WITHOUT a marker (died mid-write) is discarded in
    # favor of the old index
    shutil.copytree(path, f"{path}__old")
    shutil.copytree(path, f"{path}__swap")
    import os
    os.remove(f"{path}__swap/_commit")
    shutil.rmtree(path)
    rep5 = SIM.maybe_retrain_ivf(spark, path, threshold=1.25)
    assert not rep5["retrained"] and rep5["n_vectors"] == 500


def test_maybe_retrain_read_only_never_mutates(spark, tmp_path):
    """read_only=True (the `index status` path) must not recover swaps,
    write sidecars, or retrain — and a missing stats sidecar reports
    baseline_missing instead of installing the current (drifted) mean
    as the baseline (ADVICE r7)."""
    import os
    import random
    import shutil

    from data_pipeline_framework_spark.functions import similarity as SIM

    rng = random.Random(31)
    base = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf_ro")
    SIM.write_ivf_index(SIM.ivf_index(base, n_cells=4, seed=5), path)

    # pre-sidecar index: report-only, no sidecar write
    shutil.rmtree(f"{path}/stats")
    rep = SIM.maybe_retrain_ivf(spark, path, read_only=True)
    assert rep["baseline_missing"] and rep["staleness_ratio"] is None
    assert not rep["retrained"] and rep["n_vectors"] == 200
    assert not os.path.exists(f"{path}/stats")  # nothing installed

    # non-read-only still baselines a pre-sidecar index once (legacy)
    rep = SIM.maybe_retrain_ivf(spark, path, threshold=float("inf"))
    assert os.path.exists(f"{path}/stats")
    assert 0.9 < rep["staleness_ratio"] < 1.1

    # interrupted committed swap: read_only reports FROM the swap copy
    # without adopting it; the on-disk layout is untouched
    shutil.copytree(path, f"{path}__swap")
    with open(f"{path}__swap/_commit", "w") as fh:
        fh.write("-1")  # marker a completed retrain swap would carry
    shutil.rmtree(path)
    rep = SIM.maybe_retrain_ivf(spark, path, read_only=True)
    assert not rep["retrained"] and rep["n_vectors"] == 200
    assert 0.9 < rep["staleness_ratio"] < 1.1
    assert os.path.exists(f"{path}__swap") and not os.path.exists(path)

    # uncommitted swap + old copy: read_only reads the old copy
    shutil.copytree(f"{path}__swap", f"{path}__old")
    os.remove(f"{path}__swap/_commit")
    rep = SIM.maybe_retrain_ivf(spark, path, read_only=True)
    assert rep["n_vectors"] == 200
    assert os.path.exists(f"{path}__swap") and os.path.exists(f"{path}__old")

    # a mutating call afterwards recovers exactly as before
    rep = SIM.maybe_retrain_ivf(spark, path, threshold=float("inf"))
    assert rep["n_vectors"] == 200
    assert os.path.exists(path)
    assert not os.path.exists(f"{path}__swap")
    assert not os.path.exists(f"{path}__old")


def test_sidecar_read_errors_raise_not_rebaseline(spark, tmp_path):
    """a PRESENT but unreadable stats sidecar must raise — a transient
    read error must never install the current mean as baseline."""
    import random

    import pytest as _pytest

    from data_pipeline_framework_spark.functions import similarity as SIM

    rng = random.Random(33)
    base = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf_corrupt")
    SIM.write_ivf_index(SIM.ivf_index(base, n_cells=4, seed=5), path)
    # corrupt the sidecar: replace parquet files with junk bytes
    import glob
    import os

    for f in glob.glob(f"{path}/stats/*.parquet"):
        with open(f, "wb") as fh:
            fh.write(b"not a parquet file")
    with _pytest.raises(Exception):
        SIM.maybe_retrain_ivf(spark, path, read_only=True)
    with _pytest.raises(Exception):
        SIM.maybe_retrain_ivf(spark, path)
    new = spark.createDataFrame(
        [(500 + i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception):
        SIM.append_ivf_index(spark, path, new)
    # baseline was NOT overwritten by any of the failed calls
    assert open(glob.glob(f"{path}/stats/*.parquet")[0], "rb").read() \
        == b"not a parquet file"
