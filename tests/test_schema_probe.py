from __future__ import annotations

from data_pipeline_framework_spark.sources.readers import get_schema


def test_get_schema_csv_probe(spark, tmp_path):
    p = tmp_path / "people.csv"
    p.write_text("id,name,age\n1,ann,30\n2,bob,\n3,cara,41\n")
    schema = get_schema(spark, str(p))
    assert schema["format"] == "csv"
    assert schema["sampled_rows"] == 3
    cols = {c["name"]: c for c in schema["columns"]}
    assert cols["id"]["dtype"] == "int"
    assert cols["age"]["null_count"] == 1
    assert cols["name"]["distinct_count"] == 3


def test_get_schema_parquet_probe(spark, sf_dir):
    schema = get_schema(spark, f"{sf_dir}/region.parquet")
    assert schema["format"] == "parquet"
    names = [c["name"] for c in schema["columns"]]
    assert names == ["r_regionkey", "r_name"]
