"""Every registered oracle must EXPLAIN cleanly in DuckDB against the
benchmark views — catches SQL drift before the correctness gate runs."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def test_every_oracle_explains():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    oracles = entry.oracle_sql()
    qs = entry.queries()
    assert set(oracles) == set(qs), (
        "oracle/queries registries diverge: "
        f"missing={sorted(set(qs) - set(oracles))} "
        f"extra={sorted(set(oracles) - set(qs))}"
    )
    bad = []
    for name, sql in oracles.items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 - collect all failures
            bad.append(f"{name}: {str(exc)[:120]}")
    assert not bad, "\n".join(bad)
