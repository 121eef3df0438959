"""Iterative graph algorithms over edge DataFrames.

Companion to the connected-components operator (functions/dedup.py:435):
where components answer "which docs are the same", PageRank answers
"which nodes matter" — e.g. ranking crawl domains by link authority to
prioritize ingestion, or weighting suppliers/customers by trade flow.

Everything is DataFrame joins + aggregations per iteration; per-round
scalars (total node count, dangling mass) ride along as broadcast
1-row aggregates instead of driver collects, so the loop is
cluster-side end-to-end. Iterations are fixed-count and the arithmetic
is plain IEEE doubles, so another engine replaying the same rounds
reproduces the ranks (see the driver oracle's chained CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    cache: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list (self-loops
    allowed). Unweighted (default): duplicate edges count once and each
    out-edge carries rank/out_degree. With ``weight_col``, parallel
    edges aggregate by weight sum and each edge carries
    rank * w / out_strength — flow-proportional authority (e.g. trade
    volume, link counts). Dangling-node mass is redistributed uniformly
    each round, so total rank stays 1.

    r_{t+1}(v) = (1-d)/N + d * (sum_{u->v} r_t(u)*w(u,v)/s(u)
                                + dangling_t/N)

    Per iteration: one join of edges with current ranks + one groupBy on
    dst (the only wide shuffles, both keyed on node id), plus two
    broadcast 1-row scalars. Each round's ranks persist so round t+1
    rebuilds from materialized data, not a growing lineage.

    Output: id, rank.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if weight_col is None:
        e = edges.select(
            F.col(src).alias("__s"), F.col(dst).alias("__d")
        ).distinct().withColumn("__w", F.lit(1.0))
    else:
        e = edges.groupBy(
            F.col(src).alias("__s"), F.col(dst).alias("__d")
        ).agg(F.sum(F.col(weight_col).cast("double")).alias("__w"))
    if cache:
        e = e.persist()
    nodes = (
        e.select(F.col("__s").alias("id"))
        .unionByName(e.select(F.col("__d").alias("id")))
        .distinct()
    )
    if cache:
        nodes = nodes.persist()
    ncount = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    deg = e.groupBy("__s").agg(F.sum("__w").alias("__deg"))
    if cache:
        deg = deg.persist()

    ranks = nodes.crossJoin(F.broadcast(ncount)).select(
        "id", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    d = float(damping)
    prev = None
    for _ in range(iters):
        if cache:
            ranks = ranks.persist()
            ranks.count()  # materialize this round so the previous one
            if prev is not None:  # can be released immediately
                prev.unpersist()
            prev = ranks
        contrib = (
            e.join(ranks, e.__s == ranks.id)
            .join(deg, "__s")
            .groupBy("__d")
            .agg(F.sum(F.col("rank") * F.col("__w") / F.col("__deg"))
                 .alias("__in"))
            .withColumnRenamed("__d", "id")
        )
        dangling = (
            ranks.join(deg, ranks.id == deg.__s, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .crossJoin(F.broadcast(ncount))
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - d)) / F.col("__n")
                    + F.lit(d) * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dm") / F.col("__n")
                    )
                ).alias("rank"),
            )
        )
    if cache:
        # Materialize the final round, then release every intermediate —
        # a call leaves exactly one persisted DataFrame (the result; the
        # caller may unpersist it) instead of pinning iters+3.
        ranks = ranks.persist()
        ranks.count()
        for h in (prev, e, nodes, deg):
            if h is not None and h is not ranks:
                h.unpersist()
    return ranks
