"""Train the packaged BPE merges table from the sf0.001 documents sample.

Run from the repo root:  python tools/train_bpe.py [n_merges]
Writes data_pipeline_framework_spark/resources/bpe_merges.txt (committed;
deterministic: ordered sample + deterministic tie-breaks).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_framework_spark import get_spark  # noqa: E402
from data_pipeline_framework_spark.functions.tokenize import (
    save_merges,
    train_bpe_merges,
)
from data_pipeline_framework_spark.sources import read_table


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    spark = get_spark(app_name="train-bpe", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    merges = train_bpe_merges(
        docs, "text", n_merges=n_merges, max_train_docs=10_000,
        order_col="doc_id",
    )
    out = "data_pipeline_framework_spark/resources/bpe_merges.txt"
    save_merges(merges, out)
    print(f"wrote {len(merges)} merges to {out}")


if __name__ == "__main__":
    main()
