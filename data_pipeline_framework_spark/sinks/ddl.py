"""JDBC DDL helpers: create-from-DataFrame, drop, list_tables,
get_table_info (reference storage/postgresql_storage.py:120-253, :308-322).

The reference created tables by writing an empty pandas frame through
SQLAlchemy; here DDL is generated straight from the Spark schema and
executed over an injected DB-API connection, so the helpers work with any
driver (psycopg2, sqlite3 in tests) and never touch executor data paths.
These are driver-side metadata operations — the 100 TB data write itself
always goes through ``df.write.jdbc`` (writers.write_jdbc).

Dialects: ``postgresql`` (information_schema metadata) and ``sqlite``
(sqlite_master / PRAGMA) — the latter exists so the container's tests can
exercise the real SQL without a Postgres server.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Spark type -> Postgres column type (reference stored exactly these
# logical types; nested types are serialized JSON — the reference
# flattened nested data at ingest and never stored arrays,
# SURVEY.md §1.3).
_PG_TYPES: dict[type, str] = {
    T.ByteType: "SMALLINT",
    T.ShortType: "SMALLINT",
    T.IntegerType: "INTEGER",
    T.LongType: "BIGINT",
    T.FloatType: "REAL",
    T.DoubleType: "DOUBLE PRECISION",
    T.StringType: "TEXT",
    T.BooleanType: "BOOLEAN",
    T.TimestampType: "TIMESTAMP",
    T.DateType: "DATE",
    T.BinaryType: "BYTEA",
}

_SQLITE_TYPES: dict[type, str] = {
    T.ByteType: "INTEGER",
    T.ShortType: "INTEGER",
    T.IntegerType: "INTEGER",
    T.LongType: "INTEGER",
    T.FloatType: "REAL",
    T.DoubleType: "REAL",
    T.StringType: "TEXT",
    T.BooleanType: "INTEGER",
    T.TimestampType: "TEXT",
    T.DateType: "TEXT",
    T.BinaryType: "BLOB",
}


def _column_type(dt: T.DataType, dialect: str) -> str:
    if isinstance(dt, T.DecimalType):
        return (
            f"NUMERIC({dt.precision},{dt.scale})"
            if dialect == "postgresql" else "NUMERIC"
        )
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "JSONB" if dialect == "postgresql" else "TEXT"
    table = _PG_TYPES if dialect == "postgresql" else _SQLITE_TYPES
    try:
        return table[type(dt)]
    except KeyError:
        raise ValueError(
            f"no {dialect} mapping for Spark type {dt.simpleString()}"
        ) from None


def _quote(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'


def ddl_for_schema(
    schema: T.StructType, table: str, dialect: str = "postgresql"
) -> str:
    """CREATE TABLE statement for a Spark schema (pure function)."""
    cols = ", ".join(
        f"{_quote(f.name)} {_column_type(f.dataType, dialect)}"
        + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    )
    return f"CREATE TABLE {_quote(table)} ({cols})"


def create_table(
    conn: Any,
    df: DataFrame | T.StructType,
    table: str,
    if_exists: str = "fail",
    dialect: str = "postgresql",
) -> str:
    """Create `table` from a DataFrame's schema (reference
    create_table_from_dataframe, postgresql_storage.py:231-253).
    ``if_exists``: 'fail' | 'replace' (drop first) | 'skip'
    (CREATE TABLE IF NOT EXISTS). Returns the DDL executed."""
    schema = df.schema if isinstance(df, DataFrame) else df
    ddl = ddl_for_schema(schema, table, dialect)
    if if_exists == "replace":
        drop_table(conn, table)
    elif if_exists == "skip":
        ddl = ddl.replace("CREATE TABLE", "CREATE TABLE IF NOT EXISTS", 1)
    elif if_exists != "fail":
        raise ValueError(f"unknown if_exists: {if_exists!r}")
    cur = conn.cursor()
    cur.execute(ddl)
    conn.commit()
    return ddl


def drop_table(conn: Any, table: str, if_exists: bool = True) -> None:
    """DROP TABLE (reference postgresql_storage.py:308-322)."""
    cur = conn.cursor()
    cur.execute(
        f"DROP TABLE {'IF EXISTS ' if if_exists else ''}{_quote(table)}"
    )
    conn.commit()


def list_tables(
    conn: Any, schema: str = "public", dialect: str = "postgresql"
) -> list[str]:
    """Base tables in a schema, sorted (reference
    postgresql_storage.py:120-140)."""
    cur = conn.cursor()
    if dialect == "postgresql":
        cur.execute(
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = %s AND table_type = 'BASE TABLE' "
            "ORDER BY table_name",
            (schema,),
        )
    else:
        cur.execute(
            "SELECT name FROM sqlite_master WHERE type = 'table' "
            "ORDER BY name"
        )
    return [r[0] for r in cur.fetchall()]


def get_table_info(
    conn: Any, table: str, schema: str = "public",
    dialect: str = "postgresql",
) -> dict:
    """Column metadata + row estimate (reference
    postgresql_storage.py:142-229, trimmed to the portable core:
    name/data_type/nullable per column, estimated_rows)."""
    cur = conn.cursor()
    if dialect == "postgresql":
        cur.execute(
            "SELECT column_name, data_type, is_nullable "
            "FROM information_schema.columns "
            "WHERE table_schema = %s AND table_name = %s "
            "ORDER BY ordinal_position",
            (schema, table),
        )
        columns = [
            {"name": r[0], "data_type": r[1], "is_nullable": r[2] == "YES"}
            for r in cur.fetchall()
        ]
        cur.execute(
            "SELECT reltuples::BIGINT FROM pg_class WHERE relname = %s",
            (table,),
        )
        row = cur.fetchone()
        est = int(row[0]) if row else 0
    else:
        cur.execute(f"PRAGMA table_info({_quote(table)})")
        columns = [
            {"name": r[1], "data_type": r[2], "is_nullable": not r[3]}
            for r in cur.fetchall()
        ]
        if not columns:
            raise ValueError(f"table {schema}.{table} not found")
        cur.execute(f"SELECT COUNT(*) FROM {_quote(table)}")
        est = cur.fetchone()[0]
    if not columns:
        raise ValueError(f"table {schema}.{table} not found")
    return {
        "schema": schema, "table": table,
        "columns": columns, "estimated_rows": est,
    }
