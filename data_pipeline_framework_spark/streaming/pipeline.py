"""Structured Streaming pipeline: sources, record ops, windowed aggs, sinks.

The reference's streaming engine (reference streaming/stream_processor.py) is
a single-threaded record loop with in-memory window dicts: tumbling windows
close on next-arrival (:84-121), sliding windows run on the processing-time
clock (:123-144), session windows are declared but unimplemented (:33), and
the watermark/exactly-once keys in streaming_pipeline.yaml have no
implementation. This module delivers those semantics honestly on Structured
Streaming: event-time windows, real watermarks, checkpointed exactly-once
sinks — and every transformation here is the same Column expression that the
batch engine uses, so one operator library serves both.

Scale: state lives in the Spark state store (RocksDB/HDFS-backed, spillable)
instead of the reference's bounded deques; windowed agg state is pruned by
the watermark, so an unbounded stream runs in bounded memory per key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..operators.timeseries import _window_aggs

# ---------------------------------------------------------------------------
# sources


def read_stream_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    max_files_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """File-discovery stream (the deterministic-replay twin of the
    reference's Kafka source; also how historical backfill runs the same
    pipeline). Streaming file sources REQUIRE an explicit schema."""
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    value_schema=None,
    **options,
) -> DataFrame:
    """Kafka source (reference streaming/kafka_source.py:140-213). The
    reference's hand-built message envelope (topic/partition/offset/
    timestamp/key/headers, kafka_source.py:128-138) is exactly the built-in
    Kafka source schema. If `value_schema` is given, the JSON payload is
    parsed and splatted into columns next to the envelope — the reference's
    to_dataframe shape.

    Requires the spark-sql-kafka connector on the classpath; this module
    only builds the plan, so it imports cleanly without it.
    """
    df = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        df = df.option(k, v)
    out = df.load()
    if value_schema is not None:
        out = parse_kafka_envelope(out, value_schema)
    return out


def parse_kafka_envelope(df: DataFrame, value_schema) -> DataFrame:
    """Split a Kafka-shaped frame (topic/partition/offset/timestamp/key/
    value) into envelope columns + the JSON payload splatted to columns —
    the reference's to_dataframe shape (kafka_source.py:178-213). Pure
    column expressions, so it works on batch frames too (and is the exact
    inverse of sinks.writers.kafka_messages for the payload columns)."""
    return df.select(
        "topic", "partition", "offset",
        F.col("timestamp").alias("kafka_timestamp"),
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
    ).select("topic", "partition", "offset", "kafka_timestamp", "key", "v.*")


# ---------------------------------------------------------------------------
# record transforms (reference stream_processor.py:382-437) — plain Column
# ops, valid on both batch and streaming DataFrames


def add_timestamp(df: DataFrame, column: str = "processed_at") -> DataFrame:
    return df.withColumn(column, F.current_timestamp())


def rename_field(df: DataFrame, old: str, new: str) -> DataFrame:
    return df.withColumnRenamed(old, new)


def calculate_field(df: DataFrame, column: str, expression: str) -> DataFrame:
    """Expression-string calculation (the reference accepted arbitrary
    Python lambdas, stream_processor.py:403-411; we require SQL expressions
    — no eval of config strings)."""
    return df.withColumn(column, F.expr(expression))


def flatten_nested(df: DataFrame, column: str) -> DataFrame:
    """Splat a struct column into top-level fields
    (reference stream_processor.py:414-423 dict flattening)."""
    others = [c for c in df.columns if c != column]
    return df.select(*others, f"{column}.*")


def parse_json_field(df: DataFrame, column: str, schema) -> DataFrame:
    return df.withColumn(column, F.from_json(F.col(column), schema))


def field_filters(kind: str, column: str, value=None) -> Column:
    """Stream filter vocabulary (reference stream_processor.py:440-493)."""
    c = F.col(column)
    if kind == "field_equals":
        return c == value
    if kind == "field_in_list":
        return c.isin(*value)
    if kind == "field_greater_than":
        return c > value
    if kind == "field_not_null":
        return c.isNotNull()
    if kind == "timestamp_range":
        lo, hi = value
        return (c >= lo) & (c <= hi)
    raise ValueError(f"unsupported stream filter: {kind!r}")


# ---------------------------------------------------------------------------
# watermarked windowed aggregations


def _watermarked(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """withWatermark, coercing TIMESTAMP_NTZ event time to TIMESTAMP first.

    Spark watermarks only accept TIMESTAMP_LTZ; NANOS-parquet sources (the
    events table) arrive as NTZ. The cast interprets NTZ wall-clock in the
    session timezone (UTC in get_spark sessions), which is the only
    consistent event-time reading available."""
    field = next((f for f in df.schema.fields if f.name == ts_col), None)
    if field is not None and isinstance(field.dataType, T.TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


def tumbling_stream(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggregations: dict,
    group_by: list[str] | None = None,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the honest version of the
    reference's close-on-next-arrival tumbling windows plus the
    `watermark_delay` config key it never implemented."""
    from ..operators.timeseries import tumbling_window

    return tumbling_window(
        _watermarked(df, ts_col, watermark), ts_col, duration,
        aggregations, group_by,
    )


def sliding_stream(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggregations: dict,
    group_by: list[str] | None = None,
    watermark: str = "10 seconds",
) -> DataFrame:
    from ..operators.timeseries import sliding_window

    return sliding_window(
        _watermarked(df, ts_col, watermark), ts_col, duration, slide,
        aggregations, group_by,
    )


def sessionized_stream(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggregations: dict,
    group_by: list[str] | None = None,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Watermarked session windows — declared-but-unimplemented in the
    reference (stream_processor.py:33)."""
    from ..operators.timeseries import session_window

    return session_window(
        _watermarked(df, ts_col, watermark), ts_col, gap,
        aggregations, group_by,
    )


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ttl: str | None = None,
) -> DataFrame:
    """Custom stateful operator: exactly-once-per-key streaming dedup via
    `applyInPandasWithState` — emit the first record seen for each key and
    suppress every later duplicate, across micro-batches.

    This is the streaming twin of exact dedup (functions/dedup.py): a
    training-data ingest stream drops re-crawled/replayed documents on
    arrival instead of re-deduplicating the corpus later. State per key is
    one boolean in the Spark state store (RocksDB-spillable, partitioned by
    key — no driver state, unbounded key cardinality scales out). `ttl`
    (e.g. "1 hour", processing-time) bounds state for keys that stop
    arriving; the reference's stream engine had no stateful ops at all
    (SURVEY §2.14).

    Built-in `dropDuplicates` on a stream needs a watermark + event-time
    column in the key; this operator exists for the keyed-forever/TTL
    semantics and as the template for arbitrary stateful kernels.
    """
    import pandas as pd  # noqa: F401  (worker-side dependency)
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = df.schema
    ttl_ms = None
    if ttl is not None:
        n, unit = ttl.split()
        ttl_ms = int(n) * {
            "millisecond": 1, "milliseconds": 1,
            "second": 1000, "seconds": 1000,
            "minute": 60_000, "minutes": 60_000,
            "hour": 3_600_000, "hours": 3_600_000,
        }[unit]

    def first_only(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        if not state.exists:
            for pdf in pdfs:
                if len(pdf):
                    yield pdf.head(1)
                    break
            state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(*key_cols).applyInPandasWithState(
        first_only, out_schema, "seen boolean", "append", timeout
    )


def join_streams(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi join bounded by an event-time range — the state
    Spark must hold is capped by the watermark + the `max_delay` band, so
    a forever-running join never grows without bound (unbounded
    stream-stream joins are rejected by Spark for exactly this reason).

    Semantics: left row matches right rows with equal `on` keys whose
    event time lies in [left_ts - max_delay, left_ts]. Outer variants
    need BOTH watermarks (nulls emit once the watermark passes); Spark
    enforces that, we just pass them through. The reference processed
    streams record-at-a-time and had no stream joins at all; batch twins
    of the same predicate verify results in tests."""
    l = _watermarked(left, left_ts, watermark)
    r = _watermarked(right, right_ts, watermark)
    cond = None
    for k in on:
        c = l[k] == r[k]
        cond = c if cond is None else cond & c
    band = (
        (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {max_delay}"))
        & (r[right_ts] <= l[left_ts])
    )
    out = l.join(r, cond & band, how)
    # drop the duplicated right-side key columns (USING-style output)
    for k in on:
        out = out.drop(r[k])
    return out


# ---------------------------------------------------------------------------
# sinks


def write_stream(
    df: DataFrame,
    fmt: str = "parquet",
    path: str | None = None,
    checkpoint: str | None = None,
    output_mode: str = "append",
    query_name: str | None = None,
    trigger_available_now: bool = False,
    foreach_batch: Callable | None = None,
    **options,
):
    """writeStream with checkpointed exactly-once delivery (the
    `enable_exactly_once_processing` / `checkpoint_interval` keys the
    reference declared, streaming_pipeline.yaml, with no implementation).

    foreach_batch(fn: (DataFrame, int) -> None) is the generic sink escape —
    the Redis/JDBC record sinks of the reference (redis_sink.py) become
    per-microbatch batch writes here (same foreachPartition pattern, but
    with replay-safe batch ids for idempotence).
    """
    w = df.writeStream.outputMode(output_mode)
    if foreach_batch is not None:
        w = w.foreachBatch(foreach_batch)
    else:
        w = w.format(fmt)
        if path:
            w = w.option("path", path)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if query_name:
        w = w.queryName(query_name)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    for k, v in options.items():
        w = w.option(k, v)
    return w.start()


def idempotent_batch_sink(
    table: str,
    conflict_columns: list[str],
    connection_factory: Callable,
    url: str = "",
    properties=None,
    commits_table: str = "stream_commits",
    query_id: str = "stream",
) -> Callable:
    """Exactly-once foreachBatch target over a transactional JDBC/DB-API
    sink (the reference's `enable_exactly_once_processing` flag, given an
    implementation).

    Per micro-batch: (1) skip if (query_id, batch_id) is already in
    `commits_table` — a replay after checkpoint restart; (2) otherwise
    apply the batch as ONE set-based upsert (jdbc_upsert: parallel
    staging write + INSERT..ON CONFLICT) and insert the commit marker in
    the SAME transaction, so data and marker land atomically. The upsert
    itself is idempotent on `conflict_columns`, so even the no-marker
    crash window (merge committed, next run replays) cannot duplicate
    rows — the marker makes replays cheap, the merge makes them safe.

    `connection_factory` -> a fresh driver-side DB-API connection per
    batch (psycopg2, sqlite3, ...). Usage:
        write_stream(df, foreach_batch=idempotent_batch_sink(...),
                     checkpoint=...)
    """
    from ..sinks.writers import jdbc_upsert

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            try:
                cur.execute(
                    f"CREATE TABLE IF NOT EXISTS {commits_table} ("
                    "query_id TEXT NOT NULL, batch_id BIGINT NOT NULL, "
                    "PRIMARY KEY (query_id, batch_id))"
                )
                conn.commit()
                qid = query_id.replace("'", "''")
                cur.execute(
                    f"SELECT 1 FROM {commits_table} "
                    f"WHERE query_id = '{qid}' AND batch_id = {int(batch_id)}"
                )
                if cur.fetchone():
                    return  # replayed batch: already committed
            finally:
                cur.close()
            jdbc_upsert(
                batch_df, url, table, conflict_columns,
                properties=properties, connection=conn,
                pre_commit_sql=[
                    f"INSERT INTO {commits_table} VALUES "
                    f"('{qid}', {int(batch_id)})"
                ],
            )
        finally:
            conn.close()

    return sink


def rollup_batch_fn(
    state_path: str,
    keys: list[str],
    metrics: dict[str, list[str]],
    lg_k: int = 12,
    histograms: dict | None = None,
) -> Callable:
    """Continuous-aggregate maintenance over a stream: each micro-batch
    folds into the persisted algebraic rollup state
    (operators/rollup.update_rollup) instead of re-aggregating history —
    the streaming twin of the reference's full-recompute `aggregate`
    (processors/pandas_processor.py:199), kept fresh per batch at
    |delta| + |keys| cost.

    Exactly-once under replay: the micro-batch id is passed as the
    rollup commit id, which travels inside the atomically-swapped state
    dir — a re-delivered batch (crash between sink and checkpoint
    commit) is detected and skipped, so no slice is ever double-counted.

    Usage:
        write_stream(df, foreach_batch=rollup_batch_fn(...),
                     checkpoint=...)
    """
    from ..operators.rollup import update_rollup

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        update_rollup(
            batch_df.sparkSession, batch_df, state_path, keys, metrics,
            lg_k=lg_k, histograms=histograms, commit_id=int(batch_id),
        )

    return run_batch


def heavy_hitters_batch_fn(
    state_path: str,
    key_col: str,
    capacity: int = 1024,
    group_cols: list[str] | None = None,
) -> Callable:
    """Continuous bounded-state top-k over a stream: each micro-batch's
    Misra-Gries summary (functions/heavy_hitters.py) merges into the
    persisted summary — "top domains in the crawl, so far, forever"
    in O(capacity) state instead of an unbounded exact count table.

    Replay-safe the same way as rollup_batch_fn: the batch id rides
    inside the atomically-swapped state dir as a commit marker, so a
    re-delivered batch merges nothing twice. The merged summary keeps
    the MG sandwich guarantee (cnt <= true <= cnt + err) across every
    batch ever folded in.
    """
    from ..functions.heavy_hitters import heavy_hitters, merge_heavy_hitters
    from ..operators.rollup import _read_commit, _write_commit

    groups = list(group_cols or [])

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(state_path)
        fs = path.getFileSystem(conf)
        tmp = state_path.rstrip("/") + "__swap"
        old = state_path.rstrip("/") + "__old"
        tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
        old_path = jvm.org.apache.hadoop.fs.Path(old)
        if not fs.exists(path):
            if fs.exists(tmp_path) and _read_commit(fs, jvm, tmp) is not None:
                fs.rename(tmp_path, path)
            elif fs.exists(old_path):
                fs.rename(old_path, path)
        if fs.exists(old_path):
            fs.delete(old_path, True)
        if fs.exists(path):
            last = _read_commit(fs, jvm, state_path)
            if last is not None and last >= int(batch_id):
                return  # replayed batch: already folded in
        summary = heavy_hitters(batch_df, key_col, capacity, groups)
        if fs.exists(path):
            summary = merge_heavy_hitters(
                spark.read.parquet(state_path), summary,
                key_col, capacity, groups,
            )
        summary.write.mode("overwrite").parquet(tmp)
        _write_commit(fs, jvm, tmp, int(batch_id))
        if fs.exists(path):
            fs.rename(path, old_path)
        fs.rename(tmp_path, path)
        fs.delete(old_path, True)

    return run_batch


def neardup_filter_batch_fn(
    id_col: str,
    text_col: str,
    store_path: str,
    out_path: str,
    n: int = 3,
):
    """Streaming near-duplicate filtering against a persistent MinHash
    signature store — the continuous-crawl twin of the batch
    MinHash+LSH pipeline (functions/dedup.py): every micro-batch is
    checked against ALL previously admitted documents, not just this
    run's state.

    Returns a foreachBatch callable. Per batch: (1) shingle+minhash the
    batch docs and explode their LSH band keys, (2) equi-join those
    keys against the parquet signature store (never all-pairs — a doc
    is a near-dup candidate iff it shares a full band with an admitted
    doc, standard LSH semantics; exact-Jaccard verification happens
    offline on the flagged subset if needed), (3) also flag docs whose
    band collides with a LOWER-id doc of the same batch (first-wins
    within a batch), (4) append batch rows + `is_dup` to `out_path`
    and the admitted docs' band keys to the store.

    Store appends are idempotent-on-read: keys are
    (id, band, key)-unique per doc, and a replayed batch re-admits the
    same ids, so readers dedup with dropDuplicates — the same
    at-least-once + dedup-on-read contract as any append-only log.
    State lives in parquet, partition-parallel and unbounded (no
    driver/state-store memory), and survives across runs and engines.
    """
    from data_pipeline_framework_spark.functions.dedup import (
        band_keys,
        minhash_signatures,
    )

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select(id_col, text_col).persist()
        sig = minhash_signatures(docs, id_col, text_col, n)
        bands = band_keys(sig, id_col).persist()

        # Probe existence explicitly: only a genuinely-missing store means
        # "first batch". Transient IO/permission errors or a corrupt store
        # must propagate so the micro-batch retries instead of silently
        # admitting everything un-deduplicated.
        jvm = spark._jvm
        jsc = spark.sparkContext._jsc.hadoopConfiguration()
        hpath = jvm.org.apache.hadoop.fs.Path(store_path)
        fs = hpath.getFileSystem(jsc)
        if fs.exists(hpath):
            store = spark.read.parquet(store_path).dropDuplicates(
                [id_col, "band", "key"]
            )
        else:  # first batch: no store yet
            store = None

        dup_vs_store = None
        if store is not None:
            # exclude same-id matches: a replayed batch re-encounters its
            # own appended bands and must re-admit, not self-flag (the
            # at-least-once + dedup-on-read contract)
            dup_vs_store = (
                bands.join(
                    store.withColumnRenamed(id_col, "__prev"),
                    ["band", "key"],
                )
                .filter(F.col("__prev") != F.col(id_col))
                .select(id_col)
                .distinct()
            )
        a = bands.alias("a")
        b = bands.alias("b")
        dup_in_batch = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")),
            )
            .select(F.col(f"a.{id_col}").alias(id_col))
            .distinct()
        )
        dups = (
            dup_in_batch if dup_vs_store is None
            else dup_in_batch.unionByName(dup_vs_store).distinct()
        )
        flagged = docs.join(
            dups.withColumn("__dup", F.lit(True)), id_col, "left"
        ).withColumn(
            "is_dup", F.coalesce("__dup", F.lit(False))
        ).drop("__dup")
        flagged.withColumn("batch_id", F.lit(int(batch_id))) \
            .write.mode("append").parquet(out_path)
        admitted = flagged.filter(~F.col("is_dup")).select(id_col)
        bands.join(admitted, id_col).write.mode("append").parquet(store_path)
        bands.unpersist()
        docs.unpersist()

    return run_batch


def priority_sample_batch_fn(
    id_col: str,
    k: int,
    state_path: str,
    seed: str = "s0",
):
    """Streaming fixed-size uniform sample: maintain the k rows with the
    smallest seeded hash priorities over everything that ever arrived —
    the exactly-once twin of `sampling.priority_sample`. Bottom-k is a
    semilattice, so folding each micro-batch into the persisted k-row
    state IS the batch answer: after any prefix of batches the state
    equals `priority_sample` over that prefix's union, row-for-row
    (pytest-pinned). The classic use: keep a live uniform audit sample
    of an unbounded ingest without ever re-reading history.

    Exactly-once via the rollup commit-marker swap (batch id inside the
    atomically-renamed state dir): a re-delivered batch is skipped, a
    crash mid-swap recovers, and because the fold is deterministic a
    replayed crash-before-swap batch recomputes the identical state.
    Per-batch cost: O(batch + k); state is k rows, period.
    """
    from ..functions.sampling import priority_sample
    from ..operators.rollup import _read_commit, _write_commit

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        P = jvm.org.apache.hadoop.fs.Path
        root = state_path.rstrip("/")
        tmp, old = root + "__swap", root + "__old"
        fs = P(root).getFileSystem(conf)
        if not fs.exists(P(root)):
            if fs.exists(P(tmp)) and _read_commit(fs, jvm, tmp) is not None:
                fs.rename(P(tmp), P(root))
            elif fs.exists(P(old)):
                fs.rename(P(old), P(root))
        if fs.exists(P(old)):
            fs.delete(P(old), True)
        if fs.exists(P(tmp)):
            fs.delete(P(tmp), True)
        if fs.exists(P(root)):
            last = _read_commit(fs, jvm, root)
            if last is not None and last >= int(batch_id):
                return  # replayed batch: already folded in
        pool = priority_sample(batch_df, id_col, k, seed)
        if fs.exists(P(root)):
            prev = spark.read.parquet(root).drop("priority")
            pool = priority_sample(
                prev.unionByName(batch_df), id_col, k, seed
            )
        pool.write.mode("overwrite").parquet(tmp)
        _write_commit(fs, jvm, tmp, int(batch_id))
        if fs.exists(P(root)):
            fs.rename(P(root), P(old))
        fs.rename(P(tmp), P(root))
        fs.delete(P(old), True)

    return run_batch


def priority_sample_state(spark, state_path: str) -> DataFrame:
    """Read the live sample maintained by priority_sample_batch_fn —
    whichever copy the swap protocol would adopt, without mutating."""
    from ..operators.rollup import _read_commit

    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    P = jvm.org.apache.hadoop.fs.Path
    root = state_path.rstrip("/")
    tmp, old = root + "__swap", root + "__old"
    fs = P(root).getFileSystem(conf)
    if fs.exists(P(root)):
        return spark.read.parquet(root)
    if fs.exists(P(tmp)) and _read_commit(fs, jvm, tmp) is not None:
        return spark.read.parquet(tmp)
    return spark.read.parquet(old)


def soft_dedup_batch_fn(
    id_col: str,
    text_col: str,
    state_path: str,
    threshold: float = 0.7,
    n: int = 3,
):
    """Streaming SOFT deduplication: incrementally maintain the exact
    near-dup cluster labels behind 1/|cluster|^alpha training weights
    (functions/dedup.soft_dedup_weights) as documents arrive — the
    operator a continuously-ingesting curation pipeline actually runs:
    cluster sizes (and therefore EXISTING docs' weights) change as new
    captures of the same content land.

    Returns a foreachBatch callable. State under ``state_path``:
      shingles/  append-only (id, __sh)       — dedup-on-read by id
      bands/     append-only (id, band, key)  — dedup-on-read
      cc/        (node, component) labels, atomically swapped with the
                 micro-batch id as commit marker (rollup protocol)

    Per batch: shingle + minhash the batch docs with the SAME library
    kernels as the batch pipeline; candidates = within-batch LSH pairs
    UNION band collisions against the persistent store; exact-Jaccard
    verify; fold into the labels by running connected components over
    (previous labels as component->node edges UNION new verified
    pairs). A component id is the min member id, so this equals CC over
    every verified pair ever seen — label state after batch k is
    IDENTICAL to the batch operator over the first k batches' union
    (pytest-pinned through weights_from_labels).

    Exactly-once: shingle/band appends land BEFORE the label swap. A
    crash between them replays the batch — re-appends are dropped on
    read, same-id band collisions are excluded, and the recomputed pair
    set is identical; a crash after the swap is caught by the commit
    marker and the whole batch is skipped. Scale: per batch cost is
    O(batch + collisions + clustered nodes); unclustered corpus mass
    never enters the CC state.
    """
    from ..functions.dedup import (
        band_keys,
        connected_components,
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signature_select,
        shingled_docs,
    )
    from ..operators.rollup import _read_commit, _write_commit

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        P = jvm.org.apache.hadoop.fs.Path
        root = state_path.rstrip("/")
        cc, tmp, old = root + "/cc", root + "/cc__swap", root + "/cc__old"
        fs = P(cc).getFileSystem(conf)
        # recover an interrupted previous swap
        if not fs.exists(P(cc)):
            if fs.exists(P(tmp)) and _read_commit(fs, jvm, tmp) is not None:
                fs.rename(P(tmp), P(cc))
            elif fs.exists(P(old)):
                fs.rename(P(old), P(cc))
        if fs.exists(P(old)):
            fs.delete(P(old), True)
        if fs.exists(P(tmp)):
            fs.delete(P(tmp), True)
        if fs.exists(P(cc)):
            last = _read_commit(fs, jvm, cc)
            if last is not None and last >= int(batch_id):
                return  # replayed batch: already folded in

        docs = batch_df.select(id_col, text_col)
        sh_b = shingled_docs(docs, id_col, text_col, n).persist()
        sig_b = minhash_signature_select(sh_b, id_col)
        bands_b = band_keys(sig_b, id_col).persist()

        cand = lsh_candidate_pairs(sig_b, id_col)
        shingles_all = sh_b
        if fs.exists(P(root + "/bands")):
            store_bands = spark.read.parquet(
                root + "/bands"
            ).dropDuplicates([id_col, "band", "key"])
            store_sh = spark.read.parquet(
                root + "/shingles"
            ).dropDuplicates([id_col])
            # same-id matches excluded: a replayed batch re-encounters
            # its own appended bands (at-least-once + dedup-on-read)
            cross = (
                bands_b.join(
                    store_bands.withColumnRenamed(id_col, "__sid"),
                    ["band", "key"],
                )
                .filter(F.col("__sid") != F.col(id_col))
                .select(
                    F.least(id_col, "__sid").alias("id_a"),
                    F.greatest(id_col, "__sid").alias("id_b"),
                )
                .distinct()
            )
            cand = cand.unionByName(cross).distinct()
            shingles_all = sh_b.unionByName(store_sh).dropDuplicates(
                [id_col]
            )
        edges = jaccard_verify(
            cand, shingles_all, id_col, threshold
        ).select("id_a", "id_b")

        if fs.exists(P(cc)):
            prev = spark.read.parquet(cc)
            prev_edges = prev.filter(
                F.col("node") != F.col("component")
            ).select(
                F.col("component").alias("id_a"),
                F.col("node").alias("id_b"),
            )
            edges = edges.unionByName(prev_edges).distinct()
        labels = connected_components(edges)

        # at-least-once side effects FIRST, the exactly-once swap LAST
        sh_b.write.mode("append").parquet(root + "/shingles")
        bands_b.write.mode("append").parquet(root + "/bands")
        labels.write.mode("overwrite").parquet(tmp)
        _write_commit(fs, jvm, tmp, int(batch_id))
        if fs.exists(P(cc)):
            fs.rename(P(cc), P(old))
        fs.rename(P(tmp), P(cc))
        fs.delete(P(old), True)
        sh_b.unpersist()
        bands_b.unpersist()

    return run_batch


def soft_dedup_state_weights(
    spark,
    state_path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    alpha: float = 1.0,
    out_col: str = "weight",
) -> DataFrame:
    """Read side of soft_dedup_batch_fn: apply the maintained label
    state to a corpus snapshot through the SAME weights_from_labels
    expressions as the batch operator — stream == batch is pinned on
    shared code, not parallel implementations. Reads whichever label
    copy the swap protocol would adopt (live, else committed swap, else
    old) without mutating; no state yet -> every doc weighs 1.0."""
    from ..functions.dedup import weights_from_labels
    from ..operators.rollup import _read_commit

    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    P = jvm.org.apache.hadoop.fs.Path
    root = state_path.rstrip("/")
    cc, tmp, old = root + "/cc", root + "/cc__swap", root + "/cc__old"
    fs = P(cc).getFileSystem(conf)
    read_from = None
    if fs.exists(P(cc)):
        read_from = cc
    elif fs.exists(P(tmp)) and _read_commit(fs, jvm, tmp) is not None:
        read_from = tmp
    elif fs.exists(P(old)):
        read_from = old
    if read_from is None:
        labels = (
            docs.select(F.col(id_col).alias("node"))
            .limit(0)
            .withColumn("component", F.col("node"))
        )
    else:
        labels = spark.read.parquet(read_from)
    return weights_from_labels(labels, docs, id_col, alpha, out_col)


def bloom_dedup_batch_fn(
    key_col: str,
    store_path: str,
    out_path: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    order_col: str | None = None,
):
    """Streaming EXACT-key seen-before filtering against a persistent
    Bloom filter — the bounded-state complement of
    neardup_filter_batch_fn: where the MinHash store grows with the
    corpus, the Bloom store is FIXED at m_bits/32 rows forever, the
    right shape when the key set (URLs, content fingerprints) is
    billions and the question is only "probably seen?" (no false
    negatives; FP rate set by m and k).

    Returns a foreachBatch callable. Per batch: (1) OR-merge the
    store's appended partial filters (bit_or groupBy over <= m/32
    rows), (2) probe batch keys, also flagging within-batch repeats
    when ``order_col`` is given (first-wins), (3) append rows +
    `maybe_seen` to `out_path`, (4) append this batch's partial
    filter to the store.

    At-least-once safety comes from Bloom linearity: re-appending a
    replayed batch's partial filter ORs in bits that are already set —
    a no-op — and readers always merge before probing. No driver
    state, no state-store memory; everything is a bounded parquet
    table.
    """
    from data_pipeline_framework_spark.functions.sketches import (
        bloom_build,
        bloom_probe,
    )

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.persist()

        jvm = spark._jvm
        jsc = spark.sparkContext._jsc.hadoopConfiguration()
        hpath = jvm.org.apache.hadoop.fs.Path(store_path)
        fs = hpath.getFileSystem(jsc)
        if fs.exists(hpath):
            bloom = (
                spark.read.parquet(store_path)
                .groupBy("word")
                .agg(F.bit_or("bits").alias("bits"))
            )
            probed = bloom_probe(
                bloom, batch, key_col, m_bits=m_bits, k=k,
                out_col="maybe_seen",
            )
        else:  # first batch: nothing seen yet
            probed = batch.withColumn("maybe_seen", F.lit(False))

        if order_col is not None:
            w = Window.partitionBy(key_col).orderBy(order_col)
            probed = probed.withColumn(
                "maybe_seen",
                F.col("maybe_seen") | (F.row_number().over(w) > 1),
            )
        probed.withColumn("batch_id", F.lit(int(batch_id))) \
            .write.mode("append").parquet(out_path)
        bloom_build(
            batch.select(key_col), key_col, m_bits=m_bits, k=k
        ).write.mode("append").parquet(store_path)
        batch.unpersist()

    return run_batch


def quota_stream(
    df: DataFrame,
    key_cols: list[str],
    cap: int,
) -> DataFrame:
    """Per-key admission quota across micro-batches: pass through the
    first `cap` records seen for each key, drop everything after — the
    crawl-intake throttle (per-domain/source caps) as a custom stateful
    operator; the batch twin is functions/sampling.py:cap_per_key.

    State per key is one counter in the Spark state store (partitioned
    by key, RocksDB-spillable — unbounded key cardinality scales out,
    no driver state). Admission is arrival-order within the stream,
    exactly the semantics a live intake wants (batch cap_per_key is the
    deterministic re-run twin).
    """
    import pandas as pd  # noqa: F401  (worker-side dependency)
    from pyspark.sql.streaming.state import GroupStateTimeout

    if cap <= 0:
        raise ValueError("cap must be positive")
    out_schema = df.schema

    def admit(key, pdfs, state):
        seen = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if seen >= cap:
                break
            take = min(cap - seen, len(pdf))
            if take > 0:
                yield pdf.head(take)
                seen += take
        state.update((seen,))

    return df.groupBy(*key_cols).applyInPandasWithState(
        admit, out_schema, "seen long", "append",
        GroupStateTimeout.NoTimeout,
    )


def funnel_stream(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: float | None = None,
) -> DataFrame:
    """Streaming twin of operators.funnels.funnel_stages: per-user funnel
    progress maintained across micro-batches via applyInPandasWithState.

    State per user = that user's step-type events seen so far (timestamps
    + step names); each batch re-runs the greedy earliest-chain automaton
    over the merged, time-sorted buffer, so the emitted progress is
    EXACTLY the batch operator's answer on the events seen so far — late
    or out-of-order arrivals reorder into place instead of being dropped
    (a forward-only automaton would silently skip them). State is bounded
    by the user's step-event count, already filtered to the funnel's
    types before the shuffle; it lives in the Spark state store
    (partitioned by user, RocksDB-spillable — no driver state).

    Emits one row per user per batch in which that user had events
    (update semantics): (user, stages_completed, step1_ts, completed_ts,
    events_buffered). Without `within_seconds`, stages_completed is
    monotone across emissions.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)
    win = (
        int(within_seconds * 1_000_000)
        if within_seconds is not None
        else None
    )
    user_field = df.schema[user_col]
    out_schema = T.StructType([
        user_field,
        T.StructField("stages_completed", T.IntegerType()),
        T.StructField("step1_ts", T.TimestampType()),
        T.StructField("completed_ts", T.TimestampType()),
        T.StructField("events_buffered", T.IntegerType()),
    ])

    def run(key, pdfs, state):
        ts_list, st_list = (
            (list(state.get[0]), list(state.get[1]))
            if state.exists
            else ([], [])
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            t = (pdf[ts_col].astype("datetime64[ns]").astype("int64")
                 // 1000)
            ts_list.extend(int(x) for x in t)
            st_list.extend(str(s) for s in pdf[type_col])
        order = sorted(range(len(ts_list)),
                       key=lambda i: (ts_list[i], st_list[i]))
        stage, t0, tlast = 0, None, None
        for i in order:
            t, s = ts_list[i], st_list[i]
            if stage >= n or s != steps[stage]:
                continue
            if stage > 0 and t <= tlast:
                continue
            if win is not None and stage > 0 and t - tlast > win:
                continue
            stage += 1
            t0 = t if t0 is None else t0
            tlast = t
        state.update((ts_list, st_list))
        ts_of = lambda v: (  # noqa: E731
            pd.Timestamp(v * 1000) if v is not None else pd.NaT
        )
        yield pd.DataFrame({
            user_col: [key[0]],
            "stages_completed": np.array([stage], dtype="int32"),
            "step1_ts": [ts_of(t0)],
            "completed_ts": [ts_of(tlast) if stage == n else pd.NaT],
            "events_buffered": np.array([len(ts_list)], dtype="int32"),
        })

    filtered = df.filter(F.col(type_col).isin(steps))
    return filtered.groupBy(user_col).applyInPandasWithState(
        run, out_schema,
        "ts array<long>, st array<string>",
        "update", GroupStateTimeout.NoTimeout,
    )


def transitions_stream(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming twin of operators.funnels.event_transitions: per-user
    first-order transition counts maintained across micro-batches via
    applyInPandasWithState.

    State per user = that user's (ts, tiebreak, type) events seen so
    far; each batch re-derives the user's adjacent-pair counts over the
    merged, time-sorted buffer, so the emission is EXACTLY the batch
    operator's answer on the events seen so far — a late event that
    lands between two already-seen ones re-splices the adjacency
    instead of being appended (a last-event-only state would emit a
    phantom transition). State is bounded by the user's own event
    count and lives in the Spark state store (partitioned by user,
    RocksDB-spillable — no driver state).

    Emits, per user per batch in which that user had events, one row
    per (from_type, to_type) with the user's CURRENT count plus a
    monotone ``events_seen`` version column (update semantics — the
    snapshot with the largest events_seen per user is that user's
    latest; a late arrival can legitimately DECREASE a pair count by
    re-splicing adjacency, so version-select rather than max-n). The
    global matrix is a downstream groupBy over the latest per-user
    snapshots; a pytest pins the availableNow replay equal to the
    batch operator.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    user_field = df.schema[user_col]
    out_schema = T.StructType([
        user_field,
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("events_seen", T.LongType()),
    ])

    def run(key, pdfs, state):
        ts_list, tb_list, ty_list = (
            (list(state.get[0]), list(state.get[1]), list(state.get[2]))
            if state.exists
            else ([], [], [])
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            t = (pdf[ts_col].astype("datetime64[ns]").astype("int64")
                 // 1000)
            ts_list.extend(int(x) for x in t)
            if tiebreak_col is not None:
                # keep native values: int() coercion would crash on
                # string event ids and silently order numeric strings
                # numerically where the batch twin orders them
                # lexicographically. Tiebreak values must be non-null
                # and of one orderable type (ids are).
                tb_list.extend(pdf[tiebreak_col].tolist())
            else:
                tb_list.extend(0 for _ in range(len(pdf)))
            ty_list.extend(str(s) for s in pdf[type_col])
        order = sorted(
            range(len(ts_list)),
            key=lambda i: (ts_list[i], tb_list[i], ty_list[i]),
        )
        counts: dict = {}
        for a, b in zip(order, order[1:]):
            pair = (ty_list[a], ty_list[b])
            counts[pair] = counts.get(pair, 0) + 1
        state.update((ts_list, tb_list, ty_list))
        if not counts:
            yield pd.DataFrame({
                user_col: [], "from_type": [], "to_type": [],
                "n": [], "events_seen": [],
            })
            return
        items = sorted(counts.items())
        yield pd.DataFrame({
            user_col: [key[0]] * len(items),
            "from_type": [p[0] for p, _ in items],
            "to_type": [p[1] for p, _ in items],
            "n": [int(n) for _, n in items],
            "events_seen": [len(ts_list)] * len(items),
        })

    tb_type = (
        df.schema[tiebreak_col].dataType.simpleString()
        if tiebreak_col is not None
        else "long"
    )
    return df.groupBy(user_col).applyInPandasWithState(
        run, out_schema,
        f"ts array<long>, tb array<{tb_type}>, ty array<string>",
        "update", GroupStateTimeout.NoTimeout,
    )


def scd2_batch_fn(
    state_path: str,
    keys: list[str],
    effective_col: str,
    compare_cols: list[str] | None = None,
) -> Callable:
    """Continuous SCD2 dimension maintenance over a CDC stream: each
    micro-batch of change records merges into the persisted type-2
    history (sinks/maintenance.scd2_plan — close-and-append versioning,
    non-overlapping validity windows, no-op suppression), so the
    queryable dimension history stays current per batch instead of
    being rebuilt by a nightly job.

    Exactly-once under replay, the rollup_batch_fn pattern: the
    micro-batch id travels as a commit marker inside the atomically
    swapped state dir — a re-delivered batch (crash between sink write
    and checkpoint commit) is detected and skipped. scd2_plan's merge
    is additionally idempotent for identical re-delivered updates, so
    even a marker loss degrades to a no-op re-merge rather than
    duplicate versions.

    Usage:
        write_stream(cdc_df, foreach_batch=scd2_batch_fn(...),
                     checkpoint=...)
    """
    from ..operators.rollup import _read_commit, _write_commit
    from ..sinks.maintenance import scd2_plan

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(state_path)
        fs = path.getFileSystem(conf)
        tmp = state_path.rstrip("/") + "__swap"
        old = state_path.rstrip("/") + "__old"
        tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
        old_path = jvm.org.apache.hadoop.fs.Path(old)
        # crash recovery: a committed swap dir finishes its rename; a
        # dangling old dir rolls back
        if not fs.exists(path):
            if fs.exists(tmp_path) and _read_commit(fs, jvm, tmp) is not None:
                fs.rename(tmp_path, path)
            elif fs.exists(old_path):
                fs.rename(old_path, path)
        if fs.exists(old_path):
            fs.delete(old_path, True)
        if fs.exists(path):
            last = _read_commit(fs, jvm, state_path)
            if last is not None and last >= int(batch_id):
                return  # replayed batch: already merged
        hist = spark.read.parquet(state_path) if fs.exists(path) else None
        merged = scd2_plan(
            hist, batch_df, keys, effective_col, compare_cols
        )
        merged.write.mode("overwrite").parquet(tmp)
        _write_commit(fs, jvm, tmp, int(batch_id))
        if fs.exists(path):
            fs.rename(path, old_path)
        fs.rename(tmp_path, path)
        fs.delete(old_path, True)

    return run_batch
