"""Distributed frequency sketches: count-min tables and sketch lookups.

At 100 TB an exact token/key frequency table can itself be enormous
(billions of distinct keys); a count-min sketch bounds the state to
depth x width counters while guaranteeing estimate >= true count (and
estimate <= true + eps*N with probability 1 - delta). The sketch here
is a plain DataFrame of (row, bucket, cnt):

- building it is ONE groupBy shuffle whose map-side partial
  aggregation caps the shuffled volume at depth*width rows per input
  partition — independent of key cardinality;
- merging sketches from different corpora is a union + re-agg (CMS is
  a linear sketch);
- lookups are a broadcast join of the probe keys' (row, bucket) pairs
  against the table, then min over rows.

Hashing is the portable md5-based hash52 (functions/text.py), so a
DuckDB oracle replays the whole sketch bit-for-bit — estimates are
deterministic, not seeded-random.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash52

__all__ = ["cms_bucket", "count_min_table", "cms_lookup"]


def cms_bucket(key: Column | str, row: int, width: int) -> Column:
    """Bucket of ``key`` in sketch row ``row``: md5-derived, portable."""
    c = F.col(key) if isinstance(key, str) else key
    return hash52(F.concat(F.lit(f"cm{row}:"), c.cast("string"))) % width


def count_min_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the (depth x width) count-min table over ``key_col``
    (optionally weighted). Output: sketch_row, bucket, cnt — at most
    depth*width rows total, whatever the input size.

    Plan shape: a narrow explode into depth probe rows, then one
    groupBy(sketch_row, bucket) count whose partial aggregation bounds
    shuffle output per partition at depth*width rows.
    """
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    probes = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("sketch_row"),
                    cms_bucket(key_col, r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("p"),
        w.alias("__w"),
    )
    return (
        probes.select("p.sketch_row", "p.bucket", "__w")
        .groupBy("sketch_row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_lookup(
    table: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "cms_estimate",
) -> DataFrame:
    """Estimate each key's frequency from a count_min_table built with
    the same (depth, width): probe the key's bucket in every sketch row
    and take the minimum. Missing buckets count as 0. The sketch table
    is tiny (<= depth*width rows) and broadcast."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("sketch_row"),
                    cms_bucket(key_col, r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("p"),
    ).select(key_col, "p.sketch_row", "p.bucket")
    joined = probes.join(
        F.broadcast(table), on=["sketch_row", "bucket"], how="left"
    ).withColumn("cnt", F.coalesce("cnt", F.lit(0)))
    return joined.groupBy(key_col).agg(F.min("cnt").alias(out_col))


def hll_distinct_table(
    df: DataFrame,
    group_cols: list[str] | str,
    key_col: str,
    lg_k: int = 12,
    out_col: str = "distinct_sketch",
) -> DataFrame:
    """Per-group distinct-count sketches (Apache DataSketches HLL via
    Spark's native hll_sketch_agg): one groupBy pass emits a binary
    sketch per group instead of a distinct count, so sketches from
    different corpus slices / days MERGE (hll_union_agg) without
    re-scanning — the incremental-distinct pattern an exact
    countDistinct can't give at 100 TB. Estimate with
    hll_estimate(); standard error ~1.04/sqrt(2^lg_k) (~1.6% at the
    default lg_k=12)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*groups).agg(
        F.hll_sketch_agg(F.col(key_col).cast("string"), lg_k).alias(out_col)
    )


def hll_merge(
    tables: list[DataFrame],
    group_cols: list[str] | str,
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Union per-group sketches from several slices into one table —
    sketch linearity means merged == direct-over-union, verified in
    tests/test_sketches.py."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if not tables:
        raise ValueError("need at least one sketch table")
    u = tables[0]
    for t in tables[1:]:
        u = u.unionByName(t)
    return u.groupBy(*groups).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )


def hll_estimate(
    table: DataFrame, sketch_col: str = "distinct_sketch",
    out_col: str = "distinct_estimate",
) -> DataFrame:
    """Materialize the distinct-count estimates from a sketch table."""
    return table.withColumn(
        out_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)
