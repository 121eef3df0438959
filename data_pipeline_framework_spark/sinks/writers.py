"""Distributed writers.

Design rules for the 100 TB target:
  * all file/JDBC writes go through ``df.write`` so each executor writes its
    own partitions — never ``toPandas()`` (the reference's anti-pattern,
    reference storage/postgresql_storage.py:58-62);
  * external KV/queue systems (Redis, Kafka) are written per-partition with
    one connection + pipelined batches per partition, not per-row;
  * partitioned layouts (``partition_by``) implement the reference's
    declared-but-unimplemented YAML ``partitioning:`` section (reference
    config/pipelines/iot_pipeline.yaml; SURVEY.md §4.2).

Redis and JDBC drivers are not installed in the test container, so those
writers gate their imports and raise a clear error at call time; the plan
construction around them is real and unit-tested via the generic
``foreachPartition`` machinery.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator, Mapping
from typing import Any

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# file sinks


def _mode(mode: str) -> str:
    # reference modes: append / replace (storage/postgresql_storage.py:64-66)
    return {"replace": "overwrite"}.get(mode, mode)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    """Parquet sink with real partition layouts.

    The reference's YAML declares ``partitioning: {column: timestamp,
    strategy: daily}`` but never consumes it (SURVEY.md §4.2); here
    ``partition_by`` produces an actual hive-partitioned layout so
    downstream scans get partition pruning for free.
    """
    w = df.write.mode(_mode(mode)).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "append",
    header: bool = True,
    sep: str = ",",
) -> None:
    df.write.mode(_mode(mode)).option("header", header).option("sep", sep).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "append") -> None:
    df.write.mode(_mode(mode)).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    compression: str = "zlib",
) -> None:
    """ORC sink — same partition-layout contract as write_parquet."""
    w = df.write.mode(_mode(mode)).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    fmt: str = "json",
    max_records_per_file: int | None = 100_000,
    shard_partitions: int | None = None,
    order_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Materialize a training corpus as bounded shards (JSONL by default —
    the interchange format data loaders stream).

    `max_records_per_file` caps records per output file via Spark's
    maxRecordsPerFile (enforced inside each write task, no extra pass);
    `shard_partitions` optionally repartitions first so shard count and
    task parallelism match the consumer; `order_by` sorts WITHIN each
    shard (sortWithinPartitions — deterministic shard contents without a
    global sort barrier)."""
    if shard_partitions:
        df = df.repartition(shard_partitions)
    if order_by:
        df = df.sortWithinPartitions(*order_by)
    w = df.write.mode(_mode(mode))
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if compression:
        w = w.option("compression", compression)
    getattr(w, fmt)(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_by: list[str],
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Bucketed table write: pre-shuffles data into `buckets` hash buckets
    on `bucket_by` (optionally sorted within buckets).

    This is the co-located-join primitive: two tables bucketed on the
    same keys with the same bucket count join WITHOUT an exchange —
    at 100 TB the difference between a full-cluster shuffle per join and
    none. Bucketing requires the table catalog (`saveAsTable`); `path`
    makes it an external table at that location.
    """
    w = (
        df.write.format(fmt).mode(_mode(mode))
        .bucketBy(buckets, *bucket_by)
    )
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


# ---------------------------------------------------------------------------
# JDBC (PostgreSQL et al.)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: Mapping[str, str] | None = None,
    batch_size: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """JDBC table write, executor-parallel.

    Replaces the reference's ``toPandas() -> to_sql(chunksize=10000)``
    driver funnel (reference storage/postgresql_storage.py:52-77) with
    ``df.write.jdbc``: each of ``num_partitions`` tasks holds one
    connection and inserts ``batch_size``-row batches. ``num_partitions``
    bounds concurrent DB connections the way the reference's SQLAlchemy
    pool (size 10) did (reference storage/postgresql_storage.py:27-28).
    """
    if num_partitions:
        df = df.coalesce(num_partitions)
    props = {"batchsize": str(batch_size)}
    if properties:
        props.update(properties)
    df.write.mode(_mode(mode)).jdbc(url, table, properties=props)


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    conflict_columns: list[str],
    update_columns: list[str] | None = None,
    properties: Mapping[str, str] | None = None,
    staging_suffix: str = "_staging",
    connection=None,
    pre_commit_sql: list[str] | None = None,
) -> str:
    """Bulk upsert: staged write + one ``INSERT .. ON CONFLICT`` statement.

    The reference iterates rows on the driver and executes per-chunk
    ``INSERT ... ON CONFLICT DO UPDATE`` (reference
    storage/postgresql_storage.py:267-306). At scale the row stream must
    not pass through the driver, so: (1) ``df.write.jdbc`` the batch into
    ``{table}{staging_suffix}`` (parallel), (2) run a single set-based
    upsert from staging into the target, (3) drop staging.

    ``connection`` is a driver-side DB-API connection (psycopg2 et al.);
    when given, steps (2)-(3) execute and commit here. Without it the
    staging table is written and the SQL returned for the caller to run —
    the upsert has NOT reached the target yet.

    ``pre_commit_sql``: statements executed after the merge INSIDE the
    same transaction (e.g. a stream batch-commit marker, so marker and
    data commit atomically — see streaming idempotent_batch_sink).
    """
    staging = f"{table}{staging_suffix}"
    cols = df.columns
    update_columns = update_columns or [c for c in cols if c not in conflict_columns]
    if update_columns:
        action = "DO UPDATE SET " + ", ".join(
            f"{c} = EXCLUDED.{c}" for c in update_columns
        )
    else:
        action = "DO NOTHING"
    # WHERE true disambiguates INSERT..SELECT..ON CONFLICT for SQLite's
    # parser; harmless on Postgres.
    sql = (
        f"INSERT INTO {table} ({', '.join(cols)}) "
        f"SELECT {', '.join(cols)} FROM {staging} WHERE true "
        f"ON CONFLICT ({', '.join(conflict_columns)}) {action}"
    )
    write_jdbc(df, url, staging, mode="overwrite", properties=properties)
    if connection is not None:
        cur = connection.cursor()
        try:
            cur.execute(sql)
            cur.execute(f"DROP TABLE {staging}")
            for extra in pre_commit_sql or ():
                cur.execute(extra)
            connection.commit()
        finally:
            cur.close()
    return sql


def _upsert_connection(cfg: Mapping[str, Any]):
    """Build the driver-side DB-API connection for the upsert finalize step.

    Programmatic callers put a live connection under ``connection``;
    YAML configs name a DB-API module (``dbapi: psycopg2``) plus
    ``dbapi_args`` connect kwargs.
    """
    if cfg.get("connection") is not None:
        return cfg["connection"], False
    if cfg.get("dbapi"):
        import importlib

        mod = importlib.import_module(cfg["dbapi"])
        return mod.connect(**dict(cfg.get("dbapi_args") or {})), True
    return None, False


# ---------------------------------------------------------------------------
# Kafka


def kafka_messages(df: DataFrame, key_column: str | None = None) -> DataFrame:
    """Shape a DataFrame into Kafka's (key, value) envelope.

    Row-per-message JSON like the reference's producer loop (reference
    streaming/kafka_source.py:319-335), but built with ``to_json(struct(*))``
    so serialization happens JVM-side in codegen, not ``iterrows``.
    """
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    if key_column:
        return df.select(F.col(key_column).cast("string").alias("key"), value)
    return df.select(value)


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_column: str | None = None,
) -> None:
    """Batch Kafka producer via Spark's kafka sink (executor-parallel)."""
    (
        kafka_messages(df, key_column)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


# ---------------------------------------------------------------------------
# Redis (foreachPartition; redis-py gated — not in the test container)


def foreach_partition_writer(
    df: DataFrame,
    make_sink: Callable[[], Any],
    write_batch: Callable[[Any, list[Row]], None],
    batch_size: int = 500,
) -> None:
    """Generic partition-parallel external-KV writer.

    One ``make_sink()`` connection per partition, rows pushed in
    ``batch_size`` batches — the scalable shape for any non-Spark sink.
    """

    def _write(rows: Iterator[Row]) -> None:
        sink = make_sink()
        batch: list[Row] = []
        for row in rows:
            batch.append(row)
            if len(batch) >= batch_size:
                write_batch(sink, batch)
                batch = []
        if batch:
            write_batch(sink, batch)

    df.foreachPartition(_write)


def redis_kv_writer(
    host: str,
    port: int = 6379,
    db: int = 0,
    key_column: str = "key",
    key_prefix: str = "",
    ttl: int | None = None,
    mode: str = "kv",
    stream_name: str = "stream",
    max_stream_length: int | None = None,
) -> Callable[[DataFrame], None]:
    """Redis sink factory covering the reference's four write shapes.

    kv: ``SET {prefix}{key} json(row)`` with TTL (reference
    streaming/redis_sink.py:69-125); stream: ``XADD`` flattened records
    with maxlen (:127-173); list: ``RPUSH`` (:175-225); zset:
    time-series ``ZADD score=ts`` (:258-329). All four pipeline commands
    per partition batch instead of the reference's per-record round trip.
    """
    try:
        import redis  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no redis
        raise ImportError(
            "redis-py is required for Redis sinks; install `redis`"
        ) from exc

    def _sink(df: DataFrame) -> None:
        import redis

        def make_sink():
            return redis.Redis(host=host, port=port, db=db)

        def write_batch(client, rows: list[Row]) -> None:
            pipe = client.pipeline()
            for row in rows:
                d = row.asDict(recursive=True)
                if mode == "kv":
                    key = f"{key_prefix}{d.get(key_column)}"
                    pipe.set(key, json.dumps(d, default=str))
                    if ttl:
                        pipe.expire(key, ttl)
                elif mode == "stream":
                    flat = {k: str(v) for k, v in d.items()}
                    if max_stream_length:
                        pipe.xadd(stream_name, flat, maxlen=max_stream_length)
                    else:
                        pipe.xadd(stream_name, flat)
                elif mode == "list":
                    pipe.rpush(stream_name, json.dumps(d, default=str))
                elif mode == "zset":
                    score = d.get(key_column, 0)
                    pipe.zadd(stream_name, {json.dumps(d, default=str): score})
            pipe.execute()

        foreach_partition_writer(df, make_sink, write_batch)

    return _sink


# ---------------------------------------------------------------------------
# dispatch (storage section of the YAML config)


def write_output(df: DataFrame, storage: Mapping[str, Any]) -> dict[str, Any]:
    """Execute a pipeline ``storage:`` section; returns write metadata.

    Mirrors the reference's storage dispatch (reference core/pipeline.py:
    258-274 + PipelineFactory :49-59) with types: parquet/csv/json file
    sinks, jdbc/postgresql, kafka, redis, and ``none`` (dry-run).
    """
    stype = storage.get("type", "parquet")
    dest = storage.get("destination") or storage.get("path")
    mode = storage.get("mode", "append")
    cfg = dict(storage.get("config") or {})
    if stype in ("parquet", "file"):
        write_parquet(df, dest, mode, storage.get("partition_by"), cfg.get("compression", "snappy"))
    elif stype == "csv":
        write_csv(df, dest, mode, cfg.get("header", True), cfg.get("delimiter", ","))
    elif stype == "json":
        write_json(df, dest, mode)
    elif stype in ("jdbc", "postgresql"):
        if storage.get("upsert"):
            conn, own = _upsert_connection(cfg)
            if conn is None:
                # Refuse to half-run: without a finalize connection only the
                # staging table would be written and the MERGE never issued —
                # a silent no-op that reports success.
                raise NotImplementedError(
                    "storage.upsert needs a finalize connection: pass "
                    "config.connection (DB-API connection) or config.dbapi "
                    "(+ dbapi_args) naming the driver module"
                )
            try:
                jdbc_upsert(
                    df, cfg["url"], dest,
                    conflict_columns=storage["upsert"]["conflict_columns"],
                    update_columns=storage["upsert"].get("update_columns"),
                    properties=cfg.get("properties"),
                    connection=conn,
                )
            finally:
                if own:
                    conn.close()
        else:
            write_jdbc(
                df, cfg["url"], dest, mode,
                properties=cfg.get("properties"),
                batch_size=int(cfg.get("batch_size", 10_000)),
                num_partitions=cfg.get("num_partitions"),
            )
    elif stype == "kafka":
        write_kafka(df, cfg["bootstrap_servers"], dest, cfg.get("key_column"))
    elif stype == "redis":
        redis_kv_writer(**cfg)(df)
    elif stype in ("none", "noop"):
        pass
    else:
        raise ValueError(f"unknown storage type: {stype!r}")
    return {"type": stype, "destination": dest, "mode": mode}
