from __future__ import annotations

from data_pipeline_framework_spark.core import Pipeline
from data_pipeline_framework_spark.governance import LineageTracker
from data_pipeline_framework_spark.sources.readers import read_parquet


def test_pipeline_records_lineage(spark, sf_dir, tmp_path):
    lineage = LineageTracker()
    out = str(tmp_path / "o")
    cfg = {
        "name": "orders_enriched",
        "source": {"type": "parquet"},
        "input": {"path": f"{sf_dir}/orders.parquet"},
        "processing": {
            "operations": [
                {"type": "join", "right": "customer",
                 "condition": "o_custkey = c_custkey", "broadcast": True},
            ]
        },
        "storage": {"type": "parquet", "destination": out, "mode": "replace"},
    }
    customer = read_parquet(spark, f"{sf_dir}/customer.parquet")
    result = Pipeline(cfg, spark, tables={"customer": customer},
                      lineage=lineage).run()
    assert result.status == "success", result.error
    assert lineage.upstream(out) == sorted(
        [f"{sf_dir}/orders.parquet", "customer"]
    )
    edge = lineage.to_rows()[0]
    assert edge["metadata"]["operations"] == ["join"]
