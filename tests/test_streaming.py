"""Structured Streaming: availableNow replay of the events table must match
the batch twin of each windowed aggregation (SURVEY §2.14 — the reference's
streaming semantics re-based on event time + watermarks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark import streaming as ST
from data_pipeline_framework_spark.operators import timeseries as TS
from data_pipeline_framework_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return read_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@pytest.fixture(scope="module")
def stream_dir(spark, events, tmp_path_factory):
    # re-write through Spark so the streaming schema matches the batch DF
    # (raw events.parquet is TIMESTAMP(NANOS), which readStream can't infer)
    d = tmp_path_factory.mktemp("events_stream")
    events.write.mode("overwrite").parquet(str(d / "in"))
    return d


def _run_to_memory(spark, sdf, name, tmpdir, output_mode="append"):
    q = ST.write_stream(
        sdf, fmt="memory", checkpoint=str(tmpdir / f"ckpt_{name}"),
        output_mode=output_mode, query_name=name, trigger_available_now=True,
    )
    q.awaitTermination(120)
    return spark.table(name)


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def _closed_only(batch_df, events, watermark="1 minute"):
    """Append mode emits only windows finalized by the watermark: the batch
    twin must be cut at window_end <= max(ts) - watermark."""
    cutoff = events.agg(
        (F.max("ts") - F.expr(f"INTERVAL {watermark}")).alias("c")
    ).first()["c"]
    return batch_df.filter(F.col("window_end") <= F.lit(cutoff))


def test_tumbling_stream_matches_batch(spark, events, stream_dir):
    sdf = ST.read_stream_files(
        spark, str(stream_dir / "in"), schema=events.schema
    )
    streamed = ST.tumbling_stream(
        sdf, "ts", "15 minutes", {"value": ["count", "sum"]},
        group_by=["event_type"], watermark="1 minute",
    )
    got = _run_to_memory(spark, streamed, "t_tumble", stream_dir)
    want = _closed_only(TS.tumbling_window(
        events, "ts", "15 minutes", {"value": ["count", "sum"]},
        group_by=["event_type"],
    ), events)
    cols = ["window_start", "window_end", "event_type", "value_count"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    # sums compared with rounding (float accumulation order differs)
    g = {tuple(r[:3]): round(r[3], 6) for r in
         got.select("window_start", "window_end", "event_type", "value_sum").collect()}
    w = {tuple(r[:3]): round(r[3], 6) for r in
         want.select("window_start", "window_end", "event_type", "value_sum").collect()}
    assert g == w


def test_sliding_stream_matches_batch(spark, events, stream_dir):
    sdf = ST.read_stream_files(
        spark, str(stream_dir / "in"), schema=events.schema
    )
    streamed = ST.sliding_stream(
        sdf, "ts", "30 minutes", "15 minutes", {"value": ["count"]},
        watermark="1 minute",
    )
    got = _run_to_memory(spark, streamed, "t_slide", stream_dir)
    want = _closed_only(TS.sliding_window(
        events, "ts", "30 minutes", "15 minutes", {"value": ["count"]}
    ), events)
    cols = ["window_start", "window_end", "value_count"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_session_stream_matches_batch(spark, events, stream_dir):
    sdf = ST.read_stream_files(
        spark, str(stream_dir / "in"), schema=events.schema
    )
    streamed = ST.sessionized_stream(
        sdf, "ts", "5 minutes", {"value": ["count"]},
        group_by=["user_id"], watermark="1 minute",
    )
    got = _run_to_memory(spark, streamed, "t_session", stream_dir)
    want = _closed_only(TS.session_window(
        events, "ts", "5 minutes", {"value": ["count"]}, group_by=["user_id"]
    ), events)
    cols = ["window_start", "window_end", "user_id", "value_count"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_record_transforms_and_filters(spark, events, stream_dir):
    """transform chain -> filter chain -> sink (the reference's record
    pipeline, stream_processor.py:231-274) on a streaming DF."""
    sdf = ST.read_stream_files(
        spark, str(stream_dir / "in"), schema=events.schema
    )
    sdf = ST.rename_field(sdf, "event_type", "kind")
    sdf = ST.calculate_field(sdf, "value2", "value * 2")
    sdf = sdf.filter(ST.field_filters("field_not_null", "value"))
    sdf = sdf.filter(ST.field_filters("field_in_list", "kind",
                                      ["click", "view", "purchase"]))
    got = _run_to_memory(spark, sdf, "t_records", stream_dir)
    want = (
        events.withColumnRenamed("event_type", "kind")
        .withColumn("value2", F.col("value") * 2)
        .filter("value IS NOT NULL AND kind IN ('click','view','purchase')")
    )
    assert got.count() == want.count()
    assert sorted(got.columns) == sorted(want.columns)


def test_exactly_once_restart(spark, events, stream_dir):
    """checkpointed availableNow re-run must not duplicate output rows
    (exactly-once delivery the reference only declared in config)."""
    out = stream_dir / "eo_out"
    ck = stream_dir / "eo_ckpt"
    for _ in range(2):  # second run replays from checkpoint -> no new rows
        sdf = ST.read_stream_files(
            spark, str(stream_dir / "in"), schema=events.schema
        )
        q = ST.write_stream(
            sdf, fmt="parquet", path=str(out), checkpoint=str(ck),
            trigger_available_now=True,
        )
        q.awaitTermination(120)
    n = spark.read.parquet(str(out)).count()
    assert n == events.count()


def test_dedup_stream_emits_first_per_key(spark, events, stream_dir):
    """stateful applyInPandasWithState dedup: each user_id appears exactly
    once in the output regardless of how many micro-batches carry it."""
    schema = events.schema
    sdf = ST.read_stream_files(
        spark, str(stream_dir / "in"), schema=schema,
        max_files_per_trigger=1,  # force multiple micro-batches
    )
    deduped = ST.dedup_stream(sdf, ["user_id"])
    got = _run_to_memory(spark, deduped, "t_dedup", stream_dir)
    n_users = events.select("user_id").distinct().count()
    assert got.count() == n_users
    assert got.select("user_id").distinct().count() == n_users
    assert got.columns == events.columns


def test_dedup_stream_ttl_state_config(spark, events, stream_dir):
    """ttl variant builds a ProcessingTimeTimeout stateful plan (executing
    it under availableNow would idle-wait on the timeout clock, so this is
    a plan-level check)."""
    schema = events.schema
    sdf = ST.read_stream_files(spark, str(stream_dir / "in"), schema=schema)
    deduped = ST.dedup_stream(sdf, ["user_id"], ttl="1 hour")
    plan = deduped._jdf.queryExecution().logical().toString()
    assert "ProcessingTimeTimeout" in plan
    assert "FlatMapGroupsInPandasWithState" in plan


def test_kafka_producer_consumer_roundtrip(spark, sf_dir):
    """kafka_messages -> parse_kafka_envelope round-trips payload columns
    without a broker: the producer envelope is materialized as a
    Kafka-shaped frame and parsed back with the consumer's own splat."""
    from data_pipeline_framework_spark.sinks.writers import kafka_messages
    from data_pipeline_framework_spark.sources.readers import read_table
    from data_pipeline_framework_spark.streaming.pipeline import (
        parse_kafka_envelope,
    )

    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    msgs = kafka_messages(nation, key_column="n_nationkey")
    shaped = msgs.select(
        F.lit("nation").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
    )
    parsed = parse_kafka_envelope(
        shaped, "n_nationkey long, n_name string, n_regionkey long"
    )
    got = {
        (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        for r in parsed.collect()
    }
    want = {tuple(r) for r in nation.collect()}
    assert got == want
    keys = {r["key"] for r in parsed.collect()}
    assert keys == {str(k) for k, _, _ in want}
