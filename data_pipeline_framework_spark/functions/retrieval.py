"""Full-text retrieval over document tables: Okapi BM25 top-k and
per-document TF-IDF keyword extraction.

Scale-ops extension (no counterpart in the reference framework — its text
surface stops at tf-idf aggregates, `src/data_pipeline/utils/
data_profiler.py` has no retrieval): a training-data pipeline needs
keyword search for corpus QA ("show me docs about X"), eval-set mining,
and targeted decontamination sweeps.

Design for 100 TB:
- The query-term filter lands BEFORE the (doc, term) shuffle: exploded
  tokens are semi-joined against the broadcast query vocabulary first, so
  the tf aggregation shuffles only matched postings — a handful of terms'
  posting lists, not the corpus token stream.
- Corpus stats (N, avgdl) ride as a broadcast 1-row aggregate; document
  frequencies are per-query-term (tiny) and broadcast back. No driver
  collects anywhere.
- Everything is built-in column expressions (codegen); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["bm25_topk", "keyword_topk", "rrf_fuse"]


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    min_score: float = 0.0,
    cache: bool = False,
) -> DataFrame:
    """Okapi BM25 top-k documents per query.

    score(q, d) = sum over distinct terms t of q present in d of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    with the Lucene-style non-negative idf
        idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Repeated query terms count once (standard bag-of-terms query form).
    Returns (query_id, doc_id-named id_col, score, rank), rank dense per
    query by (score desc, id asc).

    `queries` is assumed small (it is broadcast); `docs` is the corpus.

    The tokenized corpus feeds both the stats aggregate and the
    postings explode. With ``cache=False`` (default) the plan is fully
    lazy and simply tokenizes the corpus twice — tokenization is cheap
    whole-stage-codegen string work, and a measured A/B (sf0.1, 20K
    docs) put the double scan at 0.36 s vs 0.53 s for materializing
    the token arrays into storage memory, so the "obvious" persist is
    actually the slow path here as well as a session-lifetime cache
    leak (ADVICE r8). ``cache=True`` is the EAGER bounded variant: the
    tokenized corpus is persisted for the duration of one action and
    unpersisted in a ``finally``, and the bounded result (<= k rows
    per query) returns as a small materialized DataFrame — the shape
    to reach for when tokenization is made expensive (custom
    tokenizer) or the corpus scan itself is the bottleneck; at 100 TB
    this stage boundary would be a checkpoint instead.
    """
    base = (
        docs.select(F.col(id_col), tokens(text_col).alias("__tk"))
        .withColumn("__dl", F.size("__tk").cast("double"))
    )
    if cache:
        base = base.persist()
    # one bounded 1-row aggregate carries both corpus scalars
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(F.array_distinct(tokens(query_text_col))).alias("__t"),
        )
    )
    vocab = qterms.select("__t").distinct()
    # term filter BEFORE the tf shuffle: only matched postings shuffle
    posted = (
        base.select(id_col, "__dl", F.explode("__tk").alias("__t"))
        .join(F.broadcast(vocab), "__t")
        .groupBy(id_col, "__t", "__dl")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    # (doc, term) rows are unique after the agg, so df = row count per term
    dfreq = posted.groupBy("__t").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    norm = F.col("__tf") + k1 * (
        1.0 - b + b * F.col("__dl") / F.col("__avgdl")
    )
    contrib = idf * (F.col("__tf") * (k1 + 1.0) / norm)
    scored = (
        posted.join(F.broadcast(dfreq), "__t")
        .join(F.broadcast(qterms), "__t")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", contrib)
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__s").alias("score"))
        .filter(F.col("score") > min_score)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )
    if not cache:
        return out
    try:
        rows = out.collect()  # bounded: <= k rows per query
        return docs.sparkSession.createDataFrame(rows, out.schema)
    finally:
        base.unpersist()


def keyword_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF keywords per document (the per-term drill-down of
    text.tfidf_doc_stats, which only emits per-doc aggregates).

    idf = ln((N+1)/(df+1)) (the MLlib smoothing, matching
    tfidf_doc_stats); weight = tf * idf; rank per doc by (weight desc,
    term asc). Returns (id_col, term, tf, weight, rank).

    Shape: explode -> (doc,term) tf agg -> term df agg -> co-partitioned
    join back on term -> per-doc window. The df side of the join is the
    full vocabulary, so it is a shuffle join on term (NOT broadcast —
    corpus vocabularies don't fit an executor); both inputs arrive
    already partitioned by term from their aggs, so the join adds no
    extra exchange.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
    tf = toks.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__N"))
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    weighted = (
        tf.join(dfreq, "__t")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "weight",
            F.col("tf") * F.log((F.col("__N") + 1) / (F.col("__df") + 1)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("weight"), F.asc("__t")
    )
    return (
        weighted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("__t").alias("term"), "tf", "weight", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_rrf: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (Cormack et al., the
    standard lexical+dense hybrid-search combiner):

        rrf(q, d) = sum over systems s ranking d of 1 / (k_rrf + rank_s)

    Each input must carry (query_id_col, id_col, rank). Scores from
    different systems never need calibration — only ranks enter — which
    is why RRF is the robust default for BM25 + embedding hybrids.

    Shape: inputs are already top-k-per-query (bounded), so the union +
    one (query, doc) groupBy shuffles at most sum(k_s) rows per query
    regardless of corpus size; ranking is a per-query window over <=
    sum(k_s) rows. No counterpart in the reference (its text surface
    stops at tf-idf aggregates); this is the retrieval-stack extension.
    """
    parts = [
        r.select(query_id_col, id_col, F.col("rank").cast("int").alias("rank"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(query_id_col, id_col).agg(
        F.sum(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank")))
        .alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_systems"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("rrf_score"), F.asc(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(query_id_col, id_col, "rrf_score", "n_systems", "rank")
    )
