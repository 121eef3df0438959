"""Round-9 optimization: read_table memoizes the inferred parquet
schema per (path, mtime_ns, size) so repeated reads of the same static
file skip the driver-side footer re-read (~65 ms/call). Metadata only —
these tests pin that results are unchanged, the nanos-timestamp
normalization still applies, and a rewritten file is re-inferred."""

from __future__ import annotations

import shutil
import time

from pyspark.sql import types as T

from data_pipeline_framework_spark.sources import readers


def test_memo_returns_identical_schema_and_rows(spark, sf_dir):
    readers._TABLE_SCHEMA_MEMO.clear()
    a = readers.read_table(spark, sf_dir, "nation")
    assert len(readers._TABLE_SCHEMA_MEMO) == 1
    b = readers.read_table(spark, sf_dir, "nation")
    assert len(readers._TABLE_SCHEMA_MEMO) == 1  # hit, not a new entry
    assert a.schema == b.schema
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0


def test_memo_preserves_nanos_normalization(spark, sf_dir):
    readers._TABLE_SCHEMA_MEMO.clear()
    first = readers.read_table(spark, sf_dir, "events")
    again = readers.read_table(spark, sf_dir, "events")  # memoized path
    for df in (first, again):
        f = next(x for x in df.schema.fields if x.name == "ts")
        # not the raw nanos long — normalized to a timestamp type
        assert isinstance(
            f.dataType, (T.TimestampType, T.TimestampNTZType)
        )
    assert first.select("ts").orderBy("ts").first() == \
        again.select("ts").orderBy("ts").first()


def test_memo_invalidates_on_rewrite(spark, sf_dir, tmp_path):
    readers._TABLE_SCHEMA_MEMO.clear()
    p = tmp_path / "tbl.parquet"
    shutil.copyfile(f"{sf_dir}/nation.parquet", p)
    df1 = readers.read_table(spark, str(tmp_path), "tbl")
    n_cols1 = len(df1.columns)
    # rewrite the file with a different schema (single-column)
    tmp_out = tmp_path / "out"
    spark.range(3).toDF("only_col").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_out))
    part = next(tmp_out.glob("part-*.parquet"))
    time.sleep(0.01)  # ensure mtime_ns differs even on coarse clocks
    shutil.copyfile(part, p)
    df2 = readers.read_table(spark, str(tmp_path), "tbl")
    assert len(df2.columns) == 1 != n_cols1
    assert [r[0] for r in df2.orderBy("only_col").collect()] == [0, 1, 2]


def test_non_file_paths_bypass_memo(spark, sf_dir, tmp_path):
    readers._TABLE_SCHEMA_MEMO.clear()
    out = tmp_path / "dirtbl.parquet"
    spark.range(5).write.parquet(str(out))  # directory, not a file
    df = readers.read_table(spark, str(tmp_path), "dirtbl")
    assert df.count() == 5
    assert len(readers._TABLE_SCHEMA_MEMO) == 0
