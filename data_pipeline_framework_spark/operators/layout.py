"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping.

A 100 TB table written sorted by one column gets parquet min/max
pruning on that column only. Interleaving the bits of several
quantized columns (Morton order) and range-partitioning + sorting on
the interleaved key gives file-order locality in EVERY interleaved
dimension, so row-group min/max stats prune scans filtered on any of
them — the Spark-native equivalent of Delta/Iceberg
``OPTIMIZE ... ZORDER BY``. The reference has no layout optimizer
(its writers append row files; storage/postgresql_storage.py), so
this is an engine extra justified by the scale target.

Everything here is pure integer column expressions (codegen; no UDF,
no shuffle beyond the single range exchange that the clustering
itself requires).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_uniform", "zorder_key", "cluster_by_zorder"]


def quantize_uniform(
    col: Column | str, lo: float, hi: float, bits: int = 8
) -> Column:
    """Map a numeric column into [0, 2^bits - 1] by uniform scaling with
    clamping — the per-dimension preparation step for zorder_key.
    Deterministic floor bucketing (no ties): values at ``hi`` land in
    the top bucket."""
    c = F.col(col) if isinstance(col, str) else col
    n = (1 << bits) - 1
    x = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    x = F.least(F.greatest(x, F.lit(0.0)), F.lit(1.0))
    return F.least(F.floor(x * (n + 1)).cast("long"), F.lit(n)).cast("long")


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton interleave of ``len(cols)`` already-quantized non-negative
    integer columns, ``bits`` bits each: output bit (b * ncols + i)
    carries input i's bit b. Pure shift/mask arithmetic — whole-stage
    codegen, identical in any engine (the driver oracle replays it in
    SQL)."""
    ncols = len(cols)
    if ncols == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * ncols > 62:
        raise ValueError(f"{bits} bits x {ncols} cols overflows a long")
    out = None
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            term = F.shiftleft(
                F.shiftright(col, b).bitwiseAND(F.lit(1)), b * ncols + i
            )
            out = term if out is None else out + term
    return out.cast("long")


def cluster_by_zorder(
    df: DataFrame,
    specs: list[tuple[Column | str, float, float]],
    bits: int = 8,
    num_partitions: int | None = None,
    key_col: str = "__zorder",
    keep_key: bool = False,
) -> DataFrame:
    """Reorder a DataFrame into Z-order over ``specs`` =
    [(col, lo, hi), ...]: quantize each dimension, interleave,
    range-partition on the key (one exchange — AQE balances the ranges
    from a sampled sketch) and sort within partitions. Writing the
    result with any file sink yields row groups whose min/max stats are
    tight in every clustered dimension."""
    key = zorder_key(
        [quantize_uniform(c, lo, hi, bits) for c, lo, hi in specs], bits
    )
    out = df.withColumn(key_col, key)
    parts = [key_col] if num_partitions is None else [num_partitions, key_col]
    out = out.repartitionByRange(*parts).sortWithinPartitions(key_col)
    return out if keep_key else out.drop(key_col)
