"""Count-min sketch: never-underestimate guarantee, linearity (merge),
bounded table size, broadcast lookup plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions.sketches import (
    cms_lookup,
    count_min_table,
)


def _freqs(spark, pairs):
    rows = [(k,) for k, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_underestimates_and_is_exact_when_wide(spark):
    data = [("a", 50), ("b", 20), ("c", 5), ("d", 1)]
    df = _freqs(spark, data)
    table = count_min_table(df, "k", depth=4, width=1024)
    keys = spark.createDataFrame([(k,) for k, _ in data] + [("nope",)],
                                 "k string")
    est = {r["k"]: r["cms_estimate"]
           for r in cms_lookup(table, keys, "k", 4, 1024).collect()}
    for k, n in data:
        assert est[k] >= n            # CMS guarantee
        assert est[k] == n            # wide sketch, 4 keys: no collisions
    assert est["nope"] == 0


def test_cms_collisions_only_inflate(spark):
    # width 2 forces collisions: estimates must still be >= truth
    data = [("a", 10), ("b", 7), ("c", 3)]
    df = _freqs(spark, data)
    table = count_min_table(df, "k", depth=3, width=2)
    keys = spark.createDataFrame([(k,) for k, _ in data], "k string")
    est = {r["k"]: r["cms_estimate"]
           for r in cms_lookup(table, keys, "k", 3, 2).collect()}
    for k, n in data:
        assert est[k] >= n
    assert sum(est.values()) >= sum(n for _, n in data)


def test_cms_table_bounded_and_mergeable(spark):
    df1 = _freqs(spark, [("a", 30), ("b", 10)])
    df2 = _freqs(spark, [("a", 5), ("c", 8)])
    t1 = count_min_table(df1, "k", depth=4, width=64)
    t2 = count_min_table(df2, "k", depth=4, width=64)
    assert t1.count() <= 4 * 64
    # CMS is linear: union + re-agg == sketch of the union
    merged = (
        t1.unionByName(t2)
        .groupBy("sketch_row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = count_min_table(
        df1.unionByName(df2), "k", depth=4, width=64
    )
    a = {(r["sketch_row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    b = {(r["sketch_row"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert a == b


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame([("a", 3), ("a", 4), ("b", 2)],
                               "k string, w long")
    table = count_min_table(df, "k", depth=4, width=256, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",)], "k string")
    est = {r["k"]: r["cms_estimate"]
           for r in cms_lookup(table, keys, "k", 4, 256).collect()}
    assert est["a"] == 7 and est["b"] == 2


def test_cms_lookup_broadcasts_table(spark):
    df = _freqs(spark, [("a", 3)])
    table = count_min_table(df, "k", depth=2, width=16)
    keys = spark.createDataFrame([("a",)], "k string")
    plan = cms_lookup(table, keys, "k", 2, 16)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hll_sketch_merge_equals_direct_and_accuracy(spark):
    from data_pipeline_framework_spark.functions.sketches import (
        hll_distinct_table,
        hll_estimate,
        hll_merge,
    )

    # two "days" of (source, user) events with overlapping users
    d1 = spark.range(5000).select(
        (F.col("id") % 2).cast("string").alias("src"),
        (F.col("id") % 3000).alias("user"),
    )
    d2 = spark.range(5000, 12000).select(
        (F.col("id") % 2).cast("string").alias("src"),
        (F.col("id") % 4000).alias("user"),
    )
    t1 = hll_distinct_table(d1, "src", "user")
    t2 = hll_distinct_table(d2, "src", "user")
    merged = hll_estimate(hll_merge([t1, t2], "src"))
    direct = hll_estimate(hll_distinct_table(d1.unionByName(d2), "src", "user"))
    m = {r["src"]: r["distinct_estimate"] for r in merged.collect()}
    d = {r["src"]: r["distinct_estimate"] for r in direct.collect()}
    # sketches are linear: merged union == sketch of the union, exactly
    assert m == d
    # and estimates land within ~3 standard errors of exact
    exact = {r["src"]: r["n"] for r in
             d1.unionByName(d2).groupBy("src")
             .agg(F.countDistinct("user").alias("n")).collect()}
    for k in exact:
        assert abs(m[k] - exact[k]) / exact[k] < 0.05


def test_count_min_composes_with_streaming_windows(spark, tmp_path):
    """the CMS build is explode + groupBy agg, so it runs per event-time
    window on a stream — bounded sketch state per window, replay matches
    the batch sketch of the same window exactly."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, (i * 7) % 50),
         ["tok%d" % (i % 5), "tok%d" % ((i * 3) % 5)][i % 2])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, tok string")
    in_dir = str(tmp_path / "in")
    df.write.mode("overwrite").parquet(in_dir)

    from data_pipeline_framework_spark.functions.sketches import cms_bucket

    def windowed_cms(src):
        probes = src.select(
            "ts",
            F.explode(F.array(*[
                F.struct(F.lit(r).alias("sketch_row"),
                         cms_bucket("tok", r, 64).alias("bucket"))
                for r in range(3)
            ])).alias("p"),
        ).select("ts", "p.sketch_row", "p.bucket")
        return probes.groupBy(
            F.window("ts", "20 minutes"), "sketch_row", "bucket"
        ).agg(F.count(F.lit(1)).alias("cnt")).select(
            F.col("window.start").alias("ws"), "sketch_row", "bucket", "cnt"
        )

    sdf = (
        spark.readStream.schema(df.schema).parquet(in_dir)
        .withWatermark("ts", "1 minute")
    )
    q = (
        windowed_cms(sdf).writeStream.format("memory")
        .queryName("t_cms_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["ws"], r["sketch_row"], r["bucket"]): r["cnt"]
           for r in spark.table("t_cms_stream").collect()}
    assert got, "no closed windows emitted"
    want = {(r["ws"], r["sketch_row"], r["bucket"]): r["cnt"]
            for r in windowed_cms(df).collect()}
    # every emitted (window, cell) matches the batch sketch exactly
    for key, cnt in got.items():
        assert want[key] == cnt


# ---------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_merge(spark):
    from data_pipeline_framework_spark.functions.sketches import (
        bloom_build,
        bloom_probe,
    )

    members = [(f"url-{i}",) for i in range(200)]
    others = [(f"other-{i}",) for i in range(200)]
    mdf = spark.createDataFrame(members, "k string")
    odf = spark.createDataFrame(others, "k string")
    bloom = bloom_build(mdf, "k", m_bits=4096, k=4)
    # filter state is bounded by m_bits/32 words
    assert bloom.count() <= 4096 // 32

    probed = bloom_probe(bloom, mdf.union(odf), "k", m_bits=4096, k=4)
    got = {r["k"]: r["maybe_member"] for r in probed.collect()}
    # every true member answers True (no false negatives, ever)
    assert all(got[k] for k, in members)
    # FP rate at kn/m = 4*200/4096: overwhelming majority of
    # non-members answer False
    fps = sum(1 for k, in others if got[k])
    assert fps < 20

    # linearity: build over halves, union + re-agg == direct build
    h1 = bloom_build(mdf.limit(100), "k", m_bits=4096, k=4)
    h2 = bloom_build(
        spark.createDataFrame(members[100:], "k string"),
        "k", m_bits=4096, k=4,
    )
    merged = (
        h1.unionByName(h2).groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    direct = {(r["word"], r["bits"]) for r in bloom.collect()}
    assert {(r["word"], r["bits"]) for r in merged.collect()} == direct


def test_bloom_probe_missing_words_are_nonmember(spark):
    from data_pipeline_framework_spark.functions.sketches import (
        bloom_build,
        bloom_probe,
    )

    empty = bloom_build(
        spark.createDataFrame([], "k string"), "k", m_bits=256, k=3
    )
    probed = bloom_probe(
        empty, spark.createDataFrame([("x",)], "k string"), "k",
        m_bits=256, k=3,
    )
    assert [r["maybe_member"] for r in probed.collect()] == [False]


def test_bloom_rejects_bad_params(spark):
    import pytest

    from data_pipeline_framework_spark.functions.sketches import bloom_build

    df = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(ValueError):
        bloom_build(df, "k", m_bits=100, k=4)   # not a multiple of 32
    with pytest.raises(ValueError):
        bloom_build(df, "k", m_bits=256, k=0)
