"""Record linkage: blocked fuzzy joins for entity resolution.

Matching dirty strings (names, titles, addresses) across two tables
can't be an equi join, and a cross join is quadratic death at scale.
The standard shape — used here — is blocking + verify: each row emits
one or more cheap BLOCK KEYS (prefix, suffix, phonetic code, ...);
candidate pairs are rows sharing any block key (an equi join per key,
never all-pairs); the exact edit-distance check runs only on
candidates. Recall is bounded by the blocking scheme (an edit that
mutates every block key hides the pair) — the universal trade-off of
blocked linkage; pick keys the expected noise won't touch, or add
more keys (each is one more cheap equi join).

Both Spark and DuckDB implement classic Levenshtein, so the whole
pipeline is cross-engine differentiable (see the driver oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["block_key_prefix", "block_key_suffix", "fuzzy_join"]


def _norm(c: Column) -> Column:
    return F.lower(F.trim(c))


def block_key_prefix(col: Column | str, n: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(_norm(c), 1, n)


def block_key_suffix(col: Column | str, n: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(_norm(c), -n, n)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 1,
    blocks: list[tuple[Column, Column]] | None = None,
    out_col: str = "edit_distance",
    left_id: str | None = None,
    right_id: str | None = None,
) -> DataFrame:
    """Blocked fuzzy inner join: candidate pairs share at least one
    block key; pairs with levenshtein(left_col, right_col) <=
    max_distance survive. Output: left.* + right.* + {out_col}
    (column names must not clash — pre-rename).

    `blocks` is a list of (left_expr, right_expr) key pairs; default
    is prefix-4 + suffix-4 of the match columns. Plan shape: one
    explode into len(blocks) keyed rows per side, one equi join on
    (block_id, key), distinct on the pair, then the levenshtein
    filter — no cross join at any key distribution, and a hot block
    key degrades one bucket, not the whole join.
    """
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")
    if blocks is None:
        blocks = [
            (block_key_prefix(left_col), block_key_prefix(right_col)),
            (block_key_suffix(left_col), block_key_suffix(right_col)),
        ]
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"rename clashing columns first: {sorted(clash)}")

    def keyed(df: DataFrame, exprs: list[Column]) -> DataFrame:
        return df.select(
            "*",
            F.explode(
                F.array(*[
                    F.struct(F.lit(i).alias("__blk"), e.alias("__key"))
                    for i, e in enumerate(exprs)
                ])
            ).alias("__bk"),
        ).select("*", "__bk.__blk", "__bk.__key").drop("__bk")

    lk = keyed(left, [le for le, _ in blocks])
    rk = keyed(right, [re for _, re in blocks])
    # a pair matching on several block keys appears once: dedup on the
    # row identities when given (cheap narrow keys), else on the full
    # row — pass left_id/right_id at scale so the dedup shuffle hashes
    # two ids instead of wide string payloads
    dedup_keys = (
        [left_id, right_id]
        if left_id and right_id
        else list(left.columns) + list(right.columns)
    )
    cand = (
        lk.join(rk, ["__blk", "__key"])
        .drop("__blk", "__key")
        .dropDuplicates(dedup_keys)
    )
    dist = F.levenshtein(_norm(F.col(left_col)), _norm(F.col(right_col)))
    return cand.withColumn(out_col, dist).filter(
        F.col(out_col) <= max_distance
    )
