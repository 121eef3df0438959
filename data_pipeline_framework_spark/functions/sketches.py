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

__all__ = [
    "cms_bucket", "count_min_table", "cms_lookup",
    "bloom_build", "bloom_probe",
]


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


def _bloom_probes(
    key: Column | str, k: int, m_bits: int
) -> list[Column]:
    """k (word, mask) probe structs for ``key``. Bit positions are
    md5-derived (portable — a DuckDB oracle replays them exactly);
    the filter is stored as 32-bit words inside BIGINTs so shifted
    masks never touch the sign bit in either engine."""
    c = F.col(key) if isinstance(key, str) else key
    out = []
    for j in range(k):
        p = hash52(F.concat(F.lit(f"bl{j}:"), c.cast("string"))) % m_bits
        # F.shiftleft needs a literal shift; pow is exact to 2^31 and
        # the bit index is < 32, so the mask is integer-exact
        mask = F.pow(F.lit(2.0), (p % 32).cast("double")).cast("long")
        out.append(
            F.struct(
                (p / 32).cast("long").alias("word"),
                mask.alias("mask"),
            )
        )
    return out


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a DataFrame of
    (word, bits) — at most m_bits/32 rows, whatever the input size.

    The incremental-crawl membership primitive: yesterday's URL/doc
    fingerprint set compresses to m_bits of state that today's scan
    probes without re-reading history. No false negatives; false
    positives bounded by the classic (1-e^{-kn/m})^k. Like the CMS,
    it is a linear sketch: filters from different corpus slices merge
    with a union + re-agg (bit_or is idempotent/associative), and the
    build is ONE groupBy whose map-side partial aggregation caps
    shuffle volume at m_bits/32 rows per input partition —
    independent of key cardinality.
    """
    if m_bits <= 0 or m_bits % 32:
        raise ValueError("m_bits must be a positive multiple of 32")
    if k <= 0:
        raise ValueError("k must be positive")
    probes = df.select(
        F.explode(F.array(*_bloom_probes(key_col, k, m_bits))).alias("p")
    )
    return (
        probes.select("p.word", "p.mask")
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 4,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Probe each row's ``key_col`` against a bloom_build table with
    the same (m_bits, k): true iff every one of the key's k bits is
    set. The filter is tiny (<= m_bits/32 rows) and broadcast; the
    probe is an explode -> broadcast-join -> bool_and regroup, so
    cost stays linear in probe rows with no shuffle of the corpus
    beyond the k-row expansion."""
    keys = df.select(F.col(key_col)).distinct()
    probes = keys.select(
        key_col,
        F.explode(F.array(*_bloom_probes(key_col, k, m_bits))).alias("p"),
    ).select(key_col, "p.word", "p.mask")
    hit = F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
        F.col("mask")
    ) == F.col("mask")
    member = (
        probes.join(F.broadcast(bloom), "word", "left")
        .groupBy(key_col)
        .agg(F.bool_and(hit).alias(out_col))
    )
    return df.join(member, key_col, "left")


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
