"""JDBC upsert finalize path: the MERGE SQL must actually execute.

Round-1 regression (ADVICE): write_output's upsert branch wrote the staging
table, discarded the returned INSERT..ON CONFLICT SQL, and reported success
— rows never reached the target. Now the finalize connection executes it
(tested here with sqlite3, whose ON CONFLICT syntax matches Postgres's) and
write_output refuses to run without one.

The staging leg itself is df.write.jdbc (no sqlite JDBC driver in the
container), so the test routes it into the same sqlite database via a
monkeypatched write_jdbc — the SQL that runs against the DB is the real
product SQL.
"""

from __future__ import annotations

import sqlite3

import pytest

from data_pipeline_framework_spark.sinks import writers


def _sqlite_staging_writer(conn):
    def fake_write_jdbc(df, url, table, mode="append", properties=None,
                        batch_size=10_000, num_partitions=None):
        rows = [tuple(r) for r in df.collect()]
        cols = df.columns
        conn.execute(f"DROP TABLE IF EXISTS {table}")
        conn.execute(
            f"CREATE TABLE {table} ({', '.join(c + ' BLOB' for c in cols)})"
        )
        conn.executemany(
            f"INSERT INTO {table} VALUES ({', '.join('?' for _ in cols)})",
            rows,
        )
        conn.commit()

    return fake_write_jdbc


@pytest.fixture()
def target_db(tmp_path):
    conn = sqlite3.connect(str(tmp_path / "up.db"))
    conn.execute(
        "CREATE TABLE users (id INTEGER PRIMARY KEY, name TEXT, score REAL)"
    )
    conn.executemany(
        "INSERT INTO users VALUES (?, ?, ?)",
        [(1, "ann", 1.0), (2, "bob", 2.0)],
    )
    conn.commit()
    yield conn
    conn.close()


def test_upsert_executes_merge_and_drops_staging(spark, target_db, monkeypatch):
    monkeypatch.setattr(writers, "write_jdbc", _sqlite_staging_writer(target_db))
    df = spark.createDataFrame(
        [(2, "bobby", 20.0), (3, "cyd", 3.0)],
        "id int, name string, score double",
    )
    writers.jdbc_upsert(
        df, "jdbc:ignored", "users", conflict_columns=["id"],
        connection=target_db,
    )
    got = sorted(target_db.execute("SELECT * FROM users").fetchall())
    assert got == [(1, "ann", 1.0), (2, "bobby", 20.0), (3, "cyd", 3.0)]
    staging = target_db.execute(
        "SELECT name FROM sqlite_master WHERE name = 'users_staging'"
    ).fetchall()
    assert staging == []  # dropped after the merge


def test_write_output_upsert_uses_config_connection(spark, target_db, monkeypatch):
    monkeypatch.setattr(writers, "write_jdbc", _sqlite_staging_writer(target_db))
    df = spark.createDataFrame([(1, "anne", 10.0)], "id int, name string, score double")
    writers.write_output(df, {
        "type": "jdbc",
        "destination": "users",
        "upsert": {"conflict_columns": ["id"]},
        "config": {"url": "jdbc:ignored", "connection": target_db},
    })
    row = target_db.execute("SELECT * FROM users WHERE id = 1").fetchone()
    assert row == (1, "anne", 10.0)


def test_write_output_upsert_without_connection_refuses(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(NotImplementedError):
        writers.write_output(df, {
            "type": "jdbc",
            "destination": "users",
            "upsert": {"conflict_columns": ["id"]},
            "config": {"url": "jdbc:ignored"},
        })
