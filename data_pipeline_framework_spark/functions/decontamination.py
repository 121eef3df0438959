"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation set (the GPT-3 appendix-C / PaLM recipe —
a training doc is contaminated when any length-n word gram also occurs
in a benchmark prompt/answer).

Scale shape (the 100 TB design point):

  * The EVAL side is small by construction (benchmarks are MBs), so its
    distinct gram hashes broadcast; the corpus-side gram stream joins
    against them map-side — no shuffle of corpus grams by gram key.
  * The corpus is touched by exactly one wide op: a groupBy(doc) to
    fold the per-gram hit stream back to per-doc counts. Gram explosion
    happens inside whole-stage codegen (explode(sequence)+element_at,
    see functions.text._gram_stream — no higher-order-function lambdas
    on the hot path).
  * Gram equality is tested on 52-bit md5 hashes (functions.text.hash52),
    not gram strings: the broadcast table stays ~8 bytes/gram and the
    DuckDB oracle can reproduce the hash exactly.

This module complements the near-dup family in functions.dedup: dedup
asks "are these two corpus docs alike", decontamination asks "does this
corpus doc leak a *known external* set". No all-pairs path exists here
either — candidates never form; the eval set is a semi-join filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _gram_stream, hash52, tokens


def eval_gram_hashes(
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Distinct 52-bit hashes of every word n-gram in the eval set.

    One column ``__h``. Bounded by the eval corpus size (distinct runs on
    the small side only); cache + reuse across corpus shards when
    decontaminating incrementally.
    """
    base = eval_df.select(tokens(text_col).alias("__w")).select(
        F.lit(0).alias("__id"), "__w", F.size("__w").alias("n_words")
    )
    return (
        _gram_stream(base, "__id", n)
        .select(hash52(F.col("__gram")).alias("__h"))
        .distinct()
    )


def contamination_stats(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-corpus-doc contamination against ``eval_df``'s n-grams.

    Output: ``id_col``, ``n_grams`` (total gram occurrences in the doc;
    0 for docs shorter than n words), ``dirty_grams`` (occurrences whose
    gram also appears anywhere in the eval set), ``contamination_frac``,
    and ``contaminated`` (any hit — the GPT-3 rule).

    Plan: corpus gram stream -> broadcast LEFT join on gram hash against
    the distinct eval hashes -> one groupBy(doc). Docs too short to emit
    grams are restored by a final left join from the corpus projection,
    so every input doc has an output row.
    """
    ghits = eval_gram_hashes(eval_df, eval_text_col, n).select(
        "__h", F.lit(1).alias("__hit")
    )
    base = corpus.select(
        F.col(id_col), tokens(text_col).alias("__w")
    ).select(id_col, "__w", F.size("__w").alias("n_words"))
    stream = _gram_stream(base, id_col, n).select(
        id_col, hash52(F.col("__gram")).alias("__h")
    )
    per_doc = (
        stream.join(F.broadcast(ghits), "__h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("dirty_grams"),
        )
    )
    out = (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("dirty_grams"), F.lit(0)).alias("dirty_grams"),
        )
    )
    return out.select(
        id_col,
        "n_grams",
        "dirty_grams",
        F.when(
            F.col("n_grams") > 0, F.col("dirty_grams") / F.col("n_grams")
        ).otherwise(F.lit(0.0)).alias("contamination_frac"),
        (F.col("dirty_grams") > 0).alias("contaminated"),
    )


def contamination_stats_stream(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
):
    """Streaming twin of contamination_stats: works on a readStream
    DataFrame (or batch), stateless per row, so no watermark/state-store
    is involved — incoming docs get flagged in the micro-batch they
    arrive in.

    The batch shape (explode grams -> join -> groupBy(doc)) would need
    unbounded streaming state; instead the bounded eval hash set (eval
    benchmarks are MBs by definition) is collected ONCE from the static
    side and broadcast, and each doc's grams are checked inside an
    Arrow-batched mapInPandas — the sanctioned vectorized escape hatch.
    Python-side hashing replicates functions.text.hash52 (md5 13-hex
    prefix) bit-for-bit, asserted against the batch op in
    tests/test_decontamination.py.
    """
    import hashlib

    spark = docs.sparkSession
    hashes = frozenset(
        r["__h"] for r in eval_gram_hashes(eval_df, eval_text_col, n).collect()
    )
    bc = spark.sparkContext.broadcast(hashes)

    import pandas as pd  # noqa: PLC0415 - executor-side dependency

    def _h52(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:13], 16)

    def flag(batches):
        ev = bc.value
        for pdf in batches:
            out_rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (text or "").lower().split() if w]
                grams = max(len(words) - n + 1, 0)
                dirty = sum(
                    1
                    for i in range(grams)
                    if _h52(" ".join(words[i:i + n])) in ev
                )
                out_rows.append((did, grams, dirty))
            out = pd.DataFrame(
                out_rows, columns=[id_col, "n_grams", "dirty_grams"]
            )
            out["contamination_frac"] = (
                out["dirty_grams"] / out["n_grams"].where(out["n_grams"] > 0)
            ).fillna(0.0)
            out["contaminated"] = out["dirty_grams"] > 0
            yield out

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.mapInPandas(
        flag,
        schema=(
            f"{id_col} {id_type}, n_grams long, dirty_grams long, "
            "contamination_frac double, contaminated boolean"
        ),
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
    max_dirty_frac: float = 0.0,
) -> DataFrame:
    """Drop contaminated docs (keep docs with contamination_frac <=
    ``max_dirty_frac``; the default 0.0 is the strict any-hit rule).
    Returns the surviving corpus rows with their original columns."""
    flags = contamination_stats(
        corpus, eval_df, id_col, text_col, eval_text_col, n
    ).filter(F.col("contamination_frac") <= F.lit(max_dirty_frac))
    return corpus.join(flags.select(id_col), id_col, "left_semi")
