"""Decontamination + per-key quota: planted-case semantics and the
skew-proof two-stage top-k equivalence."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions.decontamination import (
    contamination_stats,
    decontaminate,
)
from data_pipeline_framework_spark.functions.sampling import (
    _bucket,
    cap_per_key,
)


def _corpus(spark):
    rows = [
        # doc 1 embeds eval doc 100's 4-gram verbatim -> contaminated
        (1, "alpha beta gamma delta epsilon zeta"),
        # doc 2 shares no 4-gram with the eval set
        (2, "one two three four five six seven"),
        # doc 3 too short to emit any 4-gram -> zero row, not missing
        (3, "tiny doc"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _evalset(spark):
    return spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta suffix")], ["doc_id", "text"]
    )


def test_contamination_flags_planted_overlap(spark):
    out = contamination_stats(
        _corpus(spark), _evalset(spark), n=4
    ).orderBy("doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {1, 2, 3}, "every corpus doc gets a row"
    # doc 1: 3 grams total, 'alpha beta gamma delta' is dirty
    assert by_id[1]["n_grams"] == 3
    assert by_id[1]["dirty_grams"] == 1
    assert by_id[1]["contaminated"] is True
    assert abs(by_id[1]["contamination_frac"] - 1 / 3) < 1e-12
    assert by_id[2]["dirty_grams"] == 0 and by_id[2]["contaminated"] is False
    assert by_id[3]["n_grams"] == 0 and by_id[3]["contaminated"] is False


def test_decontaminate_drops_only_contaminated(spark):
    kept = decontaminate(_corpus(spark), _evalset(spark), n=4)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    # original columns survive
    assert kept.columns == ["doc_id", "text"]


def test_stream_twin_matches_batch_on_real_docs(spark, tmp_path):
    """contamination_stats_stream over an actual readStream must produce
    the same per-doc stats as the batch op (python md5 == hash52)."""
    from data_pipeline_framework_spark.functions.decontamination import (
        contamination_stats,
        contamination_stats_stream,
    )
    from data_pipeline_framework_spark.sources import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    evalset = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    want = {
        (r["doc_id"], r["n_grams"], r["dirty_grams"], r["contaminated"])
        for r in contamination_stats(corpus, evalset, n=5).collect()
    }
    d = tmp_path / "docs_in"
    corpus.write.mode("overwrite").parquet(str(d))
    sdf = (
        spark.readStream.schema(corpus.schema).parquet(str(d))
    )
    out = contamination_stats_stream(sdf, evalset, n=5)
    q = (
        out.writeStream.format("memory")
        .queryName("decontam_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["n_grams"], r["dirty_grams"], r["contaminated"])
        for r in spark.table("decontam_stream").collect()
    }
    assert got == want
    assert any(r[3] for r in got), "stream flagged at least one real hit"


def test_duplicate_span_stats_cross_doc_only(spark):
    from data_pipeline_framework_spark.functions.dedup import (
        duplicate_span_stats,
    )

    rows = [
        # docs 1 and 2 share the window "a b c"; doc 1 also repeats it
        # INTERNALLY — internal repeats count toward n_windows and both
        # occurrences are dup (the span exists elsewhere)
        (1, "a b c x a b c"),
        (2, "z a b c z"),
        # doc 3: internal repeat only, nothing shared -> dup 0
        (3, "q r s q r s"),
        # doc 4: too short for a 3-window
        (4, "t u"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(df, "doc_id", "text", n=3).collect()
    }
    assert out[1]["n_windows"] == 5 and out[1]["dup_windows"] == 2
    assert out[2]["n_windows"] == 3 and out[2]["dup_windows"] == 1
    assert out[3]["n_windows"] == 4 and out[3]["dup_windows"] == 0, (
        "within-doc repetition alone is not cross-doc duplication"
    )
    assert out[4]["n_windows"] == 0 and out[4]["dup_frac"] == 0.0


def test_cap_per_key_matches_single_window(spark):
    # skewed: key 'hot' has 200 rows, 'cold' has 3; cap 5
    rows = [(i, "hot" if i < 200 else "cold", float(i % 17)) for i in range(203)]
    df = spark.createDataFrame(rows, ["id", "key", "score"])
    capped = cap_per_key(
        df, "key", cap=5, id_col="id", order_col=F.col("score").desc(),
        salt_buckets=4,
    )
    got = {(r["key"], r["id"]) for r in capped.collect()}
    # reference: plain single-window row_number with the same ordering
    w = Window.partitionBy("key").orderBy(
        F.col("score").desc(), _bucket("id", "quota").asc(), F.col("id").asc()
    )
    want = {
        (r["key"], r["id"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter("rk <= 5").collect()
    }
    assert got == want
    by_key = {}
    for k, _ in got:
        by_key[k] = by_key.get(k, 0) + 1
    assert by_key == {"hot": 5, "cold": 3}, "cap binds only where exceeded"


def test_cap_per_key_hash_tiebreak_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "k") for i in range(50)], ["id", "key"]
    )
    a = sorted(r["id"] for r in cap_per_key(df, "key", 7, "id").collect())
    b = sorted(
        r["id"]
        for r in cap_per_key(df.repartition(13), "key", 7, "id").collect()
    )
    assert a == b, "selection is partitioning-independent"
