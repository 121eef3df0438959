"""Importance-based data selection (DSIR).

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023):
score every raw-corpus document by how much more likely its hashed
n-gram features are under a small TARGET corpus (the data you want
more of) than under the raw corpus itself, then keep/resample by that
weight. The reference framework has no equivalent; this is a
first-class operator a 100 TB pretraining pipeline runs ahead of
mixture sampling (SURVEY §2 training-data extensions).

Scale shape: both feature distributions are B-bucket hashed histograms
(B = `buckets`, default 4096), so the model state is two bounded
tables regardless of corpus size. The raw-side histogram is one
map-side-combined aggregation over the gram stream; scoring joins each
document's grams to the B-row log-ratio table via broadcast — no
shuffle keyed on anything unbounded, no driver collect of corpus data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash52, tokens

__all__ = ["dsir_importance_weights"]


def _gram_stream(df: DataFrame, id_col: str, text_col: str,
                 n: int) -> DataFrame:
    """(id, gram) rows: word n-grams joined by a single space."""
    tk = tokens(text_col)
    base = df.select(F.col(id_col), tk.alias("__tk")).withColumn(
        "__len", F.size("__tk")
    ).filter(F.col("__len") >= n)
    if n == 1:
        gram: Column = F.explode("__tk")
        return base.select(id_col, gram.alias("__gram"))
    slices = [
        F.slice("__tk", i + 1, F.col("__len") - (n - 1)).alias(f"w{i}")
        for i in range(n)
    ]
    zipped = F.arrays_zip(*slices)
    return base.select(
        id_col, F.explode(zipped).alias("__z")
    ).select(
        id_col,
        F.concat_ws(
            " ", *[F.col(f"__z.w{i}") for i in range(n)]
        ).alias("__gram"),
    )


def _bucket_hist(grams: DataFrame, buckets: int) -> DataFrame:
    """bucket -> count histogram (<= `buckets` rows)."""
    return (
        grams.select(
            F.pmod(hash52(F.col("__gram")), F.lit(buckets)).alias("__b")
        )
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    alpha: float = 1.0,
    ngram: int = 2,
    cache: bool = True,
) -> DataFrame:
    """Per-document DSIR importance weight.

    weight(x) = sum over grams g of x of
        ln( p_target(bucket(g)) / p_raw(bucket(g)) )
    with add-`alpha` smoothing over the `buckets`-bucket hashed feature
    space: p(b) = (count(b) + alpha) / (N + alpha * buckets).

    Output: (id_col, n_grams, log_weight, avg_log_weight). Documents
    with fewer than `ngram` tokens emit nothing (no feature evidence).
    Positive log_weight means the document looks more like the target
    corpus than like the raw corpus average.

    The bucket hash is the portable 52-bit md5 prefix (text.hash52), so
    an external engine replays the exact weights.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    raw_grams = _gram_stream(raw, id_col, text_col, ngram)
    tgt_grams = _gram_stream(target, id_col, text_col, ngram)

    # One corpus scan: collapse the raw gram stream to per-(doc, bucket)
    # counts first — at most min(n_grams, buckets) rows per document —
    # then both the corpus histogram (roll up by bucket) and the scoring
    # join read THIS table instead of re-tokenizing the corpus. The
    # target side stays a direct histogram (it is small by construction).
    doc_buckets = (
        raw_grams.select(
            id_col,
            F.pmod(hash52(F.col("__gram")), F.lit(buckets)).alias("__b"),
        )
        .groupBy(id_col, "__b")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    if cache:
        # doc_buckets feeds the corpus histogram AND the scoring join;
        # without this the corpus is tokenized twice. It is the
        # compressed form (<= min(n_grams, buckets) ints per doc), far
        # smaller than the text — caller-releasable via cache=False when
        # scoring many corpora in one session (bigram_logprob contract).
        doc_buckets = doc_buckets.persist()
    raw_hist = doc_buckets.groupBy("__b").agg(
        F.sum("__n").alias("__c"))
    tgt_hist = _bucket_hist(tgt_grams, buckets)
    if cache:
        # tgt_hist feeds the ratio join AND the __nt total below; the
        # frame is <= `buckets` rows but computing it scans the target
        # corpus, so without this the target is tokenized twice (the
        # second pass hid inside the total-grams aggregate).
        tgt_hist = tgt_hist.persist()

    # log-ratio per bucket, dense over all `buckets` ids so unseen
    # buckets still get the smoothed prior ratio (B rows, broadcast)
    spark = raw.sparkSession
    all_b = spark.range(buckets).select(F.col("id").alias("__b"))
    a = float(alpha)
    ratio = (
        all_b.join(tgt_hist, "__b", "left")
        .withColumnRenamed("__c", "__ct")
        .join(raw_hist, "__b", "left")
        .withColumnRenamed("__c", "__cr")
        # total target grams = sum of the histogram's bucket counts —
        # integer-identical to counting tgt_grams directly, but read off
        # the <=B-row tgt_hist instead of re-tokenizing the target corpus
        # a second time (guide §1.2: the stream was already aggregated).
        # coalesce keeps the empty-target case at 0, matching count().
        .join(F.broadcast(tgt_hist.agg(
            F.coalesce(F.sum("__c"), F.lit(0)).alias("__nt"))))
        .join(F.broadcast(raw_hist.agg(
            F.sum("__c").alias("__nr"))))
        .select(
            "__b",
            (
                F.log((F.coalesce(F.col("__ct"), F.lit(0)) + a)
                      / (F.col("__nt") + a * buckets))
                - F.log((F.coalesce(F.col("__cr"), F.lit(0)) + a)
                        / (F.col("__nr") + a * buckets))
            ).alias("__lr"),
        )
    )
    scored = doc_buckets.join(F.broadcast(ratio), "__b")
    return scored.groupBy(id_col).agg(
        F.sum("__n").cast("long").alias("n_grams"),
        F.sum(F.col("__n") * F.col("__lr")).alias("log_weight"),
        (F.sum(F.col("__n") * F.col("__lr")) / F.sum("__n"))
        .alias("avg_log_weight"),
    )
