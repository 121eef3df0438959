"""Sinks: distributed writers for every storage target the reference supports.

Reference surface (SURVEY.md §2.2): PostgreSQL table write + bulk upsert
(reference storage/postgresql_storage.py:52-84, :267-306), Redis KV/stream/
list/time-series sinks (reference streaming/redis_sink.py), Kafka producer
(reference streaming/kafka_source.py:307-341), plus file outputs. The
reference funnels every Spark write through ``toPandas()`` on the driver
(reference storage/postgresql_storage.py:58-62) — here every writer is
executor-parallel (``df.write`` / ``foreachPartition``), so a 100 TB write
never touches the driver.
"""

from .ddl import (
    create_table,
    ddl_for_schema,
    drop_table,
    get_table_info,
    list_tables,
)
from .writers import (
    write_csv,
    write_json,
    write_parquet,
    write_jdbc,
    jdbc_upsert,
    kafka_messages,
    write_kafka,
    redis_kv_writer,
    write_output,
)

__all__ = [
    "write_csv",
    "write_json",
    "write_parquet",
    "write_jdbc",
    "jdbc_upsert",
    "kafka_messages",
    "write_kafka",
    "redis_kv_writer",
    "write_output",
    "create_table",
    "ddl_for_schema",
    "drop_table",
    "get_table_info",
    "list_tables",
]
