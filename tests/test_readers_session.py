"""read_parquet must not depend on session-construction-time confs.

Round-1 regression: an external harness built its own vanilla SparkSession
(without spark.sql.legacy.parquet.nanosAsLong) and every events-table read
died with PARQUET_TYPE_ILLEGAL. read_parquet now sets the conf at call time,
so it works on ANY session.
"""

from __future__ import annotations

from pyspark.sql import types as T

from data_pipeline_framework_spark.sources.readers import read_table


def test_read_table_sets_nanos_conf_at_call_time(spark, sf_dir):
    # Simulate a caller session that never configured the legacy conf.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = read_table(spark, sf_dir, "events")
        # ts arrives as a real timestamp (nanos long -> micros truncation)
        ts_field = next(f for f in df.schema.fields if f.name == "ts")
        assert isinstance(ts_field.dataType, (T.TimestampType, T.TimestampNTZType))
        assert df.limit(5).count() == 5
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
