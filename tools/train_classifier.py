"""Regenerate the committed quality-classifier weights.

Trains functions.text.train_hashed_classifier on the sf0.01 documents
fixture (label = even-numbered source) and prints the Python literals
to paste into functions/text.py (TRAINED_QUALITY_WEIGHTS /
TRAINED_QUALITY_BIAS). The trainer is engine-exact (dyadic grids,
order-independent sums), so reruns reproduce the committed values
bit-for-bit on any partitioning — tests/test_classifier_train.py pins
that.

Usage: python tools/train_classifier.py [sf_dir]
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_framework_spark import get_spark  # noqa: E402
from data_pipeline_framework_spark.functions.text import (  # noqa: E402
    train_hashed_classifier,
)
from data_pipeline_framework_spark.sources.readers import (  # noqa: E402
    read_parquet,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]")
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").withColumn(
        "label",
        (F.substring("source", 4, 10).cast("int") % 2 == 0).cast("int"),
    )
    model = train_hashed_classifier(
        docs, "doc_id", "text", "label", n_buckets=64, steps=20, lr=1.0
    )
    print(f"# trained on {sf_dir}: n_docs={model['n_docs']}, "
          f"steps={model['steps']}, lr={model['lr']}")
    print("TRAINED_QUALITY_WEIGHTS: list[float] = [")
    for i in range(0, 64, 4):
        row = ", ".join(repr(w) for w in model["weights"][i:i + 4])
        print(f"    {row},")
    print("]")
    print(f"TRAINED_QUALITY_BIAS: float = {model['bias']!r}")


if __name__ == "__main__":
    main()
