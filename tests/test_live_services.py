"""Live-service integration smokes — env-gated, skipped by default.

These exercise the REAL external-service paths (Postgres over JDBC,
Kafka over the Spark Kafka source/sink) that the rest of the suite
covers via sqlite3 / fake clients / file streams. They skip cleanly
when the services aren't reachable, so CI containers without them stay
green; any user with docker can run:

    docker compose -f docker-compose.live.yml up -d
    # (or: docker run -d -p 5432:5432 -e POSTGRES_PASSWORD=pg postgres:16
    #      docker run -d -p 9092:9092 apache/kafka:3.8.0)

    export DPF_TEST_PG_URL="jdbc:postgresql://localhost:5432/postgres"
    export DPF_TEST_PG_USER=postgres DPF_TEST_PG_PASSWORD=pg
    export DPF_TEST_KAFKA_BOOTSTRAP="localhost:9092"
    python -m pytest tests/test_live_services.py -v

The Postgres tests additionally need the JDBC driver jar on the Spark
classpath (spark.jars.packages org.postgresql:postgresql:42.7.4) and
psycopg2 for the upsert finalize step; the Kafka tests need
spark-sql-kafka-0-10 for the session's Spark version.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

PG_URL = os.environ.get("DPF_TEST_PG_URL")
KAFKA = os.environ.get("DPF_TEST_KAFKA_BOOTSTRAP")

pg = pytest.mark.skipif(
    not PG_URL, reason="set DPF_TEST_PG_URL to run live Postgres smokes"
)
kafka = pytest.mark.skipif(
    not KAFKA, reason="set DPF_TEST_KAFKA_BOOTSTRAP to run live Kafka smokes"
)


def _pg_props() -> dict:
    return {
        "user": os.environ.get("DPF_TEST_PG_USER", "postgres"),
        "password": os.environ.get("DPF_TEST_PG_PASSWORD", ""),
        "driver": "org.postgresql.Driver",
    }


def _pg_conn():
    psycopg2 = pytest.importorskip("psycopg2")
    # jdbc:postgresql://host:port/db -> DSN pieces
    rest = PG_URL.split("://", 1)[1]
    hostport, db = rest.split("/", 1)
    host, _, port = hostport.partition(":")
    return psycopg2.connect(
        host=host, port=int(port or 5432), dbname=db,
        user=_pg_props()["user"], password=_pg_props()["password"],
    )


@pg
def test_write_jdbc_roundtrip_postgres(spark, sf_dir):
    from data_pipeline_framework_spark.sinks.writers import write_jdbc
    from data_pipeline_framework_spark.sources import read_table

    nation = read_table(spark, sf_dir, "nation")
    write_jdbc(nation, PG_URL, "dpf_smoke_nation", mode="overwrite",
               properties=_pg_props(), num_partitions=2)
    back = spark.read.jdbc(PG_URL, "dpf_smoke_nation",
                           properties=_pg_props())
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


@pg
def test_jdbc_upsert_postgres_on_conflict(spark):
    from data_pipeline_framework_spark.sinks.writers import jdbc_upsert

    conn = _pg_conn()
    cur = conn.cursor()
    cur.execute("DROP TABLE IF EXISTS dpf_smoke_upsert")
    cur.execute(
        "CREATE TABLE dpf_smoke_upsert"
        " (k INT PRIMARY KEY, v TEXT, n INT)"
    )
    cur.execute("INSERT INTO dpf_smoke_upsert VALUES (1, 'old', 0)")
    conn.commit()

    df = spark.createDataFrame(
        [(1, "new", 10), (2, "fresh", 20)], "k int, v string, n int"
    )
    jdbc_upsert(df, PG_URL, "dpf_smoke_upsert", ["k"],
                properties=_pg_props(), connection=conn)
    cur.execute("SELECT k, v, n FROM dpf_smoke_upsert ORDER BY k")
    assert cur.fetchall() == [(1, "new", 10), (2, "fresh", 20)]
    # staging table was dropped inside the transaction
    cur.execute(
        "SELECT COUNT(*) FROM information_schema.tables"
        " WHERE table_name = 'dpf_smoke_upsert_staging'"
    )
    assert cur.fetchone()[0] == 0
    cur.close()
    conn.close()


@kafka
def test_kafka_sink_and_batch_source_roundtrip(spark):
    from data_pipeline_framework_spark.sinks.writers import write_kafka

    topic = f"dpf_smoke_{int(time.time())}"
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, payload string"
    )
    write_kafka(df, bootstrap_servers=KAFKA, topic=topic, key_column="id")

    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    rows = back.select(
        F.col("key").cast("string"), F.col("value").cast("string")
    ).collect()
    assert len(rows) == 3
    payloads = {json.loads(r["value"])["payload"] for r in rows}
    assert payloads == {"a", "b", "c"}


@kafka
def test_kafka_stream_envelope_parses(spark, tmp_path):
    """readStream from the live broker through the streaming pipeline's
    JSON envelope, drained with availableNow."""
    from data_pipeline_framework_spark.sinks.writers import write_kafka

    topic = f"dpf_smoke_stream_{int(time.time())}"
    df = spark.createDataFrame(
        [(i, f"u{i % 3}", float(i)) for i in range(30)],
        "event_id int, user_id string, value double",
    )
    write_kafka(df, bootstrap_servers=KAFKA, topic=topic)

    stream = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(F.col("value").cast("string").alias("json"))
        .select(F.from_json(
            "json", "event_id INT, user_id STRING, value DOUBLE"
        ).alias("r"))
        .select("r.*")
    )
    out = str(tmp_path / "kafka_out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 30
    assert got.agg(F.sum("value")).first()[0] == sum(range(30))
