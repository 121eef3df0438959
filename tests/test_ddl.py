"""DDL helpers against a real sqlite3 database (the portable dialect;
the postgresql dialect differs only in metadata queries and type names).
Reference surface: storage/postgresql_storage.py:120-253, :308-322."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import types as T

from data_pipeline_framework_spark.sinks import ddl as D


@pytest.fixture()
def conn():
    c = sqlite3.connect(":memory:")
    yield c
    c.close()


SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("tags", T.ArrayType(T.StringType()), True),
])


def test_ddl_generation_postgres_and_sqlite():
    pg = D.ddl_for_schema(SCHEMA, "t", "postgresql")
    assert pg == (
        'CREATE TABLE "t" ("id" BIGINT NOT NULL, "name" TEXT, '
        '"score" DOUBLE PRECISION, "tags" JSONB)'
    )
    lite = D.ddl_for_schema(SCHEMA, "t", "sqlite")
    assert '"id" INTEGER NOT NULL' in lite and '"tags" TEXT' in lite


def test_create_list_info_drop_roundtrip(conn):
    D.create_table(conn, SCHEMA, "events_tbl", dialect="sqlite")
    assert D.list_tables(conn, dialect="sqlite") == ["events_tbl"]

    # if_exists semantics
    with pytest.raises(sqlite3.OperationalError):
        D.create_table(conn, SCHEMA, "events_tbl", dialect="sqlite")
    D.create_table(
        conn, SCHEMA, "events_tbl", if_exists="skip", dialect="sqlite"
    )
    D.create_table(
        conn, SCHEMA, "events_tbl", if_exists="replace", dialect="sqlite"
    )

    conn.execute("INSERT INTO events_tbl VALUES (1, 'a', 0.5, '[]')")
    info = D.get_table_info(conn, "events_tbl", dialect="sqlite")
    assert [c["name"] for c in info["columns"]] == [
        "id", "name", "score", "tags"
    ]
    assert info["columns"][0]["is_nullable"] is False
    assert info["estimated_rows"] == 1

    D.drop_table(conn, "events_tbl")
    assert D.list_tables(conn, dialect="sqlite") == []
    with pytest.raises(ValueError):
        D.get_table_info(conn, "events_tbl", dialect="sqlite")


def test_create_from_dataframe_schema(spark, conn):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    ddl = D.create_table(conn, df, "from_df", dialect="sqlite")
    assert ddl.startswith('CREATE TABLE "from_df"')
    assert D.list_tables(conn, dialect="sqlite") == ["from_df"]


def test_unmappable_type_raises():
    s = T.StructType([T.StructField("v", T.NullType(), True)])
    with pytest.raises(ValueError, match="no postgresql mapping"):
        D.ddl_for_schema(s, "t")
