"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given SF, then compares:
row count, sorted column names, and order-insensitive values
(exact for non-floats, tiny-tolerance + bitwise-report for floats).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    # integer-typed columns may come back int32 vs int64 — normalize
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount {len(spark_pdf)} vs {len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns {s_cols} vs {o_cols}")
        return problems
    if problems:
        return problems
    s = canonicalize(spark_pdf)
    o = canonicalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
            both_nan = sv.isna() & ov.isna()
            close = np.isclose(sv.fillna(0), ov.fillna(0), rtol=1e-9, atol=1e-9)
            ok = (both_nan | (close & ~(sv.isna() ^ ov.isna()))).all()
            exact = (sv.fillna(-1.5) == ov.fillna(-1.5)).all()
            if not ok:
                bad = (~(both_nan | close)).idxmax()
                problems.append(
                    f"col {c}: value mismatch e.g. row {bad}: {sv[bad]!r} vs {ov[bad]!r}"
                )
            elif not exact:
                bad = (sv.fillna(-1.5) != ov.fillna(-1.5)).idxmax()
                problems.append(
                    f"col {c}: NOT BITWISE EQUAL (hash risk) e.g. {sv[bad]!r} vs {ov[bad]!r}"
                )
        else:
            sv2 = sv.astype(str)
            ov2 = ov.astype(str)
            if not (sv2 == ov2).all():
                bad = (sv2 != ov2).idxmax()
                problems.append(
                    f"col {c}: mismatch e.g. row {bad}: {sv[bad]!r} vs {ov[bad]!r} "
                    f"(dtypes {sv.dtype}/{ov.dtype})"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # Deliberately VANILLA session — replicates the driver's correctness
    # harness (which does NOT use get_spark()), so any session-default
    # assumption in a query fails here first. Only the master is set.
    spark = (
        SparkSession.builder.appName("check")
        .master("local[8]")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            opdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spdf, opdf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems) + f" [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"pass  {name}: rows={len(spdf)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
