"""Text-analysis operators for large-scale training-data pipelines.

Everything is built from JVM-side column expressions (split / filter /
aggregate / regexp) — no Python UDFs in the hot path, so a 100 TB document
scan stays inside whole-stage codegen. The generalization source is the
reference's basic text stats (reference
transformations/feature_engineering.py:141-225: length, word/char/sentence
counts, avg word length); language-ID, quality scoring, BPE-ish token
counting and fingerprinting are the scale-path additions BASELINE.json
calls for.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A 52-bit portable string hash: hex prefix of md5, parseable identically in
# DuckDB (CAST('0x'||substr(md5(x),1,13) AS BIGINT)). Used everywhere a
# cross-engine-stable hash is needed (shingles, fingerprints, buckets).

def _spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Repartition up to the cluster's parallelism before CPU-bound
    shingle/hash work. Small-file corpora (one 128 MB split = one task)
    otherwise serialize the most expensive stage of the pipeline on a
    single core; at 100 TB inputs are already wide and this is a no-op.

    Width probe: `inputFiles()` (metadata-only, ~ms). File count lower-
    bounds the scan's partition count (block splitting only adds tasks),
    so `files >= target` safely skips the shuffle. Only non-file-backed
    plans fall through to the JVM-side RDD probe; the Python `df.rdd`
    probe is never used (it builds a Python-serialized RDD — ~1 s of
    plan conversion per call)."""
    sc = df.sparkSession.sparkContext
    target = parallelism or sc.defaultParallelism
    try:
        n = len(df.inputFiles())
    except Exception:
        n = 0
    if n >= target:
        return df
    if n == 0:  # non-file plan (in-memory, stream, join output)
        try:
            n = df._jdf.rdd().getNumPartitions()
        except Exception:
            return df.repartition(target)
    if n < target:
        return df.repartition(target)
    return df

def hash52(col: Column | str) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("bigint")


def tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokens, empty strings dropped. array_remove instead of
    a filter() lambda: higher-order functions are interpreted per
    element, array_remove stays in codegen — and tokens() sits on every
    text/dedup hot path."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.array_remove(F.split(c, r"\s+"), "")


# BPE-ish token regex: runs of letters, runs of digits, or single
# non-space punctuation — a standard pre-tokenizer shape.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0)


# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "por", "para", "que"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["on", "with", "as", "at", "by", "an"]


def text_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Length / word / sentence counts + ratios (superset of reference
    feature_engineering.py:200-224 'basic' text features).

    Adds: n_chars, n_words, n_sentences, avg_word_len, punct_ratio,
    digit_ratio, upper_ratio, stopword_ratio, whitespace_ratio.
    """
    c = F.col(text_col)
    # bind the token array to a column FIRST: lambda bodies re-evaluate
    # captured expressions per element, so filter/aggregate over an
    # inline tokens() would re-split the text once per token
    toks = F.col("__toks")
    n_chars = F.length(c)
    n_words = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS_EN))
    )
    return df.withColumn("__toks", tokens(c)).withColumns({
        "n_chars_calc": n_chars,
        "n_words": n_words,
        "n_sentences": F.size(
            F.filter(F.split(c, r"[.!?]+"), lambda s: F.trim(s) != "")
        ),
        "avg_word_len": F.try_divide(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)),
            n_words,
        ),
        "punct_ratio": F.try_divide(
            n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", "")), n_chars
        ),
        "digit_ratio": F.try_divide(
            n_chars - F.length(F.regexp_replace(c, r"[0-9]", "")), n_chars
        ),
        "upper_ratio": F.try_divide(
            n_chars - F.length(F.regexp_replace(c, r"[A-Z]", "")), n_chars
        ),
        "stopword_ratio": F.try_divide(stop_hits, n_words),
    }).drop("__toks")


def token_count(
    df: DataFrame,
    text_col: str,
    out_col: str = "n_tokens",
    tokenizer=None,
) -> DataFrame:
    """Token count. Default: pre-tokenizer regex (runs of letters/digits,
    single punctuation — not a learned vocab). Pass `tokenizer=` (any
    object with a `count_expr(col) -> Column`, e.g.
    functions.tokenize.BPETokenizer for a learned vocab or
    PandasTokenizer wrapping tiktoken/HF) to budget in real tokens."""
    if tokenizer is not None:
        return df.withColumn(out_col, tokenizer.count_expr(text_col))
    return df.withColumn(out_col, F.size(bpe_tokens(text_col)))


def language_id(
    df: DataFrame, text_col: str, out_col: str = "lang_pred"
) -> DataFrame:
    """Marker-stopword language heuristic: per-language marker hit-rate over
    tokens; argmax (ties -> lexicographically first language). Adds
    `{lang}_score` columns + `out_col`."""
    # bound first: filter()'s lambda re-evaluates captured expressions
    # per element, so an inline tokens() would re-split per token per lang
    toks = F.col("__toks")
    n = F.size(toks)

    # closure factory: a default-arg lambda would change the lambda's arity
    # as seen by PySpark's higher-order-function binder
    def _marker_pred(markers: list[str]):
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.try_divide(
            F.size(F.filter(toks, _marker_pred(markers))), n
        )
        for lang, markers in LANG_MARKERS.items()
    }
    out = df.withColumn("__toks", tokens(text_col)).withColumns(
        {f"{lang}_score": s for lang, s in scores.items()}
    ).drop("__toks")
    # argmax via greatest + chained when (deterministic tie-break: lang order)
    best = F.greatest(*[F.col(f"{lang}_score") for lang in LANG_MARKERS])
    pred = F.lit(None).cast("string")
    for lang in sorted(LANG_MARKERS):
        pred = F.coalesce(pred, F.when(F.col(f"{lang}_score") == best, lang))
    return out.withColumn(out_col, F.when(best > 0, pred).otherwise("unknown"))


def language_consistency(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 3,
) -> DataFrame:
    """Per-document language-consistency audit — the mixed-language
    detector a multilingual curation pipeline runs AFTER doc-level
    language ID: a document assembled from several languages
    (boilerplate + content, code-switched crawls, bad extractions)
    passes a whole-doc argmax yet poisons a language-targeted training
    mix. Text splits into sentence/paragraph segments ([.!?]+ or
    newline runs); segments under `min_tokens` whitespace tokens are
    ignored (fragments carry no signal); each remaining segment is
    language-ID'd with the SAME marker hit-rate argmax as
    `language_id` (ties -> lexicographically first language; zero
    hits -> unknown, excluded from voting); ONE groupBy(id) folds the
    votes. Output per document (every input doc appears):
      n_segments    — scored segments (unknown excluded)
      majority_lang — most common segment language ('unknown' if none)
      n_disagree    — scored segments voting against the majority
      mixed_frac    — n_disagree / n_segments (null when none scored)
    Shape: explode + pure per-segment expressions + one key shuffle +
    one co-keyed left join back to the id set — no window, no Python,
    linear at any corpus size.
    """
    seg = F.explode(
        F.split(F.col(text_col), r"[.!?]+|\n+")
    ).alias("__seg")
    base = (
        df.select(F.col(id_col), seg)
        .withColumn(
            "__toks",
            F.array_remove(F.split(F.lower(F.col("__seg")), r"\s+"), ""),
        )
        .where(F.size("__toks") >= int(min_tokens))
    )
    n = F.size("__toks")

    def _marker_pred(markers: list[str]):
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.try_divide(
            F.size(F.filter(F.col("__toks"), _marker_pred(m))), n
        )
        for lang, m in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    for lang in sorted(LANG_MARKERS):
        pred = F.coalesce(
            pred, F.when(scores[lang] == best, F.lit(lang))
        )
    lab = base.select(
        F.col(id_col),
        F.when(best > 0, pred).otherwise(F.lit("unknown")).alias("__lang"),
    )
    g = lab.groupBy(id_col).agg(*[
        F.sum(F.when(F.col("__lang") == lang, 1).otherwise(0))
        .alias(f"__n_{lang}")
        for lang in LANG_MARKERS
    ])
    cnts = [F.coalesce(F.col(f"__n_{lang}"), F.lit(0))
            for lang in LANG_MARKERS]
    n_scored = cnts[0]
    for c in cnts[1:]:
        n_scored = n_scored + c
    top = F.greatest(*cnts)
    maj = F.lit(None).cast("string")
    for lang in sorted(LANG_MARKERS):
        maj = F.coalesce(
            maj,
            F.when(
                F.coalesce(F.col(f"__n_{lang}"), F.lit(0)) == top,
                F.lit(lang),
            ),
        )
    out = df.select(F.col(id_col)).distinct().join(g, id_col, "left")
    return out.select(
        F.col(id_col),
        n_scored.cast("long").alias("n_segments"),
        F.when(n_scored > 0, maj).otherwise(F.lit("unknown"))
        .alias("majority_lang"),
        (n_scored - top).cast("long").alias("n_disagree"),
        F.try_divide(n_scored - top, n_scored).alias("mixed_frac"),
    )


def quality_score(
    df: DataFrame, text_col: str, out_col: str = "quality"
) -> DataFrame:
    """Composite document-quality heuristic in [0,1]: rewards mid-length
    documents, moderate average word length, presence of stopwords and
    sentence structure; penalizes punctuation/digit noise. All terms are
    bounded ratios; weights sum to 1."""
    d = text_stats(df, text_col)
    len_term = F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0))
    wordlen_ok = F.when(
        F.col("avg_word_len").between(3.0, 10.0), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    stop_term = F.least(F.col("stopword_ratio") * 3, F.lit(1.0))
    noise = F.greatest(
        F.lit(0.0),
        F.lit(1.0) - F.col("punct_ratio") * 4 - F.col("digit_ratio") * 2,
    )
    score = (
        0.3 * len_term + 0.2 * wordlen_ok + 0.2 * stop_term + 0.3 * noise
    )
    return d.withColumn(out_col, score)


def fingerprint(
    df: DataFrame, text_col: str, out_col: str = "fingerprint"
) -> DataFrame:
    """Deterministic 52-bit content fingerprint over normalized text
    (whitespace-collapsed, lowercased) — the exact-dedup key."""
    normalized = F.concat_ws(" ", tokens(text_col))
    return df.withColumn(out_col, hash52(normalized))


def tfidf_doc_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document tf-idf aggregates over the WHOLE corpus vocabulary —
    no driver-side vocabulary (CountVectorizer collects its vocab to the
    driver; at corpus scale that is the bottleneck, and top-N truncation
    changes results). idf = ln((N+1)/(df+1)), the MLlib smoothing.

    Output per doc: tfidf_mass (sum of tf*idf over its distinct terms),
    tfidf_max (strongest term weight), n_distinct_terms.
    Shape: explode -> (doc,term) agg -> term-df agg -> co-partitioned join
    back on term -> doc agg. Two shuffle keys (doc+term, term); the corpus
    size N arrives as a broadcast scalar, not a driver action."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
    tf = toks.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__tf"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__N"))
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    weighted = (
        tf.join(dfreq, "__t")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "__w",
            F.col("__tf") * F.log((F.col("__N") + 1) / (F.col("__df") + 1)),
        )
    )
    return weighted.groupBy(id_col).agg(
        F.sum("__w").alias("tfidf_mass"),
        F.max("__w").alias("tfidf_max"),
        F.count(F.lit(1)).alias("n_distinct_terms"),
    )


def _gram_stream(base: DataFrame, id_col: str, n: int) -> DataFrame:
    """One row per word n-gram of `base` (id, n_words, __n, __gram).
    explode(sequence) + element_at instead of a transform() lambda: the
    higher-order function is interpreted per element (measured ~10x
    slower end-to-end), while this shape stays entirely inside
    whole-stage codegen. The size>=n filter also guards short docs —
    sequence(a, b) with a > b counts DOWN rather than returning empty."""
    gram = F.concat_ws(
        " ", *[F.element_at("__w", F.col("__i") + k) for k in range(n)]
    )
    return (
        base.filter(F.size("__w") >= n)
        .select(
            id_col, "n_words", F.lit(n).alias("__n"),
            F.explode(
                F.sequence(F.lit(1), F.size("__w") - (n - 1))
            ).alias("__i"),
            "__w",
        )
        .select(id_col, "n_words", "__n", gram.alias("__gram"))
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher-style repetition filters per document: the fraction of word
    bigrams taken by the single most frequent bigram, and the fraction of
    trigram occurrences that are duplicates (trigrams seen more than
    once). High values flag boilerplate/spam for corpus curation
    (the repetition rules of Rae et al., "Scaling Language Models" /
    the C4 cleanup heuristics).

    Shape: both gram sizes explode into ONE (doc, n, gram) stream ->
    count per gram -> per-doc conditional agg. Two shuffle keys
    ((doc,n,gram) then doc) regardless of corpus size; no per-doc Python,
    no driver state. Docs shorter than a gram size report 0 for it.

    Output: id, n_words, top_bigram_count, bigram_total, top_bigram_frac,
    dup_trigram_count, trigram_total, dup_trigram_frac.
    """
    base = df.select(
        F.col(id_col),
        tokens(text_col).alias("__w"),
    ).select(id_col, "__w", F.size("__w").alias("n_words"))
    stream = _gram_stream(base, id_col, 2).unionByName(
        _gram_stream(base, id_col, 3)
    )
    cnt = stream.groupBy(id_col, "__n", "__gram").agg(
        F.count(F.lit(1)).alias("__c"), F.first("n_words").alias("n_words")
    )
    two, three = F.col("__n") == 2, F.col("__n") == 3
    dup = F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)
    out = cnt.groupBy(id_col).agg(
        F.first("n_words").alias("n_words"),
        F.coalesce(F.max(F.when(two, F.col("__c"))), F.lit(0)).alias(
            "top_bigram_count"
        ),
        F.coalesce(F.sum(F.when(two, F.col("__c"))), F.lit(0)).alias(
            "bigram_total"
        ),
        F.coalesce(F.sum(F.when(three, dup)), F.lit(0)).alias(
            "dup_trigram_count"
        ),
        F.coalesce(F.sum(F.when(three, F.col("__c"))), F.lit(0)).alias(
            "trigram_total"
        ),
    )
    frac = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0, F.col(num) / F.col(den)
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col, "n_words", "top_bigram_count", "bigram_total",
        frac("top_bigram_count", "bigram_total").alias("top_bigram_frac"),
        "dup_trigram_count", "trigram_total",
        frac("dup_trigram_count", "trigram_total").alias("dup_trigram_frac"),
    )


def line_repetition_exprs(text: Column) -> dict[str, Column]:
    """Line-level repetition metrics as pure column expressions (for real
    multi-line corpora; the benchmark documents are single-line). Zero
    shuffles — everything evaluates inside the row's projection:
    n_lines, dup_line_frac (lines that are repeats of an earlier line),
    dup_line_char_frac (chars in lines whose line occurs > once)."""
    lines = F.filter(F.split(text, "\n"), lambda x: F.trim(x) != "")
    n = F.size(lines)
    n_uniq = F.size(F.array_distinct(lines))
    # chars in lines occurring more than once: O(L^2) per row in the
    # lambda, fine for documents (L = lines per doc, not corpus size)
    dup_chars = F.aggregate(
        lines,
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.when(
            F.size(F.filter(lines, lambda y: y == x)) > 1, F.length(x)
        ).otherwise(F.lit(0)).cast("long"),
    )
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x).cast("long"),
    )
    return {
        "n_lines": n,
        "dup_line_frac": F.when(
            n > 0, (n - n_uniq) / n.cast("double")
        ).otherwise(F.lit(0.0)),
        "dup_line_char_frac": F.when(
            total_chars > 0, dup_chars / total_chars.cast("double")
        ).otherwise(F.lit(0.0)),
    }


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    unigram distribution — the classic cheap fluency/quality signal
    (documents of rare or shuffled tokens score low; cf. CCNet's LM
    perplexity filtering, here with the corpus itself as the model).

    Shape: explode -> token counts (one shuffle on token) -> join tokens
    back on token -> per-doc agg. The corpus token total joins in as a
    broadcast scalar, same pattern as tfidf_doc_stats — no driver action.

    Output: id, n_tokens, avg_logprob (natural log), min_logprob.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
    cnt = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    total = cnt.agg(F.sum("__c").alias("__total"))
    scored = (
        toks.join(cnt, "__t")
        .crossJoin(F.broadcast(total))
        .withColumn("__lp", F.log(F.col("__c") / F.col("__total")))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("__lp").alias("avg_logprob"),
        F.min("__lp").alias("min_logprob"),
    )


def classifier_weights(n_buckets: int = 64, seed: int = 13) -> list[float]:
    """Deterministic pseudo-trained weight vector in [-1, 1] (Knuth
    multiplicative mixing) — stands in for a trained linear model's
    weights in tests and driver queries; real use passes trained
    weights straight into hashed_classifier_score.

    Weights sit on the DYADIC 2^-20 grid, so every weight — and every
    partial sum of up to 2^33 of them — is exactly representable in
    float64. That makes hashed_classifier_score's per-doc weight sum
    EXACT and therefore order-independent: Spark's partial-aggregate
    order and DuckDB's scan order produce bit-identical margins (a
    10^-6-grid version of these weights straddled a rounding boundary
    at sf0.1 — one doc in 5000)."""
    return [
        (((i + seed) * 2654435761) % 2097153) / 1048576.0 - 1.0
        for i in range(n_buckets)
    ]


def hashed_classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: list[float],
    bias: float = 0.0,
    out_col: str = "prob",
) -> DataFrame:
    """fastText-style linear document classifier over hashed
    bag-of-words features: each token hashes into one of len(weights)
    buckets, the document margin is bias + mean bucket weight, and the
    score is its sigmoid. This is the standard cheap quality-classifier
    shape (cf. fastText quality filters in CCNet/RefinedWeb pipelines);
    weights come from any offline trainer.

    Scale shape: explode -> map-side partial sum -> one shuffle on the
    doc id; the bucket->weight lookup is element_at on a literal array
    (codegen, no join, no UDF). Documents with zero tokens keep their
    row via the left join and score sigmoid(bias).

    Output: df columns + n_tokens, margin, {out_col}.
    """
    nb = len(weights)
    warr = F.array(*[F.lit(float(w)) for w in weights])
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__t")
    )
    scored = toks.select(
        id_col,
        F.element_at(warr, (hash52(F.col("__t")) % nb + 1).cast("int"))
        .alias("__w"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("__w").alias("__sw"),
    )
    out = df.join(agg, on=id_col, how="left")
    margin = F.lit(float(bias)) + F.coalesce(
        F.col("__sw") / F.col("n_tokens"), F.lit(0.0)
    )
    return (
        out.withColumn("n_tokens", F.coalesce("n_tokens", F.lit(0)))
        .withColumn("margin", margin)
        .withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))))
        .drop("__sw")
    )


def _dyadic(x: Column, g: int) -> Column:
    """Round-half-up onto the 2^-g dyadic grid — every rounded value
    (and any sum of < 2^(53-g) of them) is exactly representable in
    float64, so aggregates over them are order-independent."""
    s = F.lit(float(1 << g))
    return F.floor(x * s + F.lit(0.5)) / s


def dyadic_round(x: float, g: int) -> float:
    """Driver-side twin of _dyadic (same IEEE ops)."""
    s = float(1 << g)
    return math.floor(x * s + 0.5) / s


def train_hashed_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n_buckets: int = 64,
    steps: int = 20,
    lr: float = 1.0,
) -> dict:
    """Distributed logistic-regression trainer for
    `hashed_classifier_score`'s model: margin(d) = bias + mean hashed
    bucket weight, p = sigmoid(margin), full-batch gradient descent on
    log-loss. This is the TRAINING half of the CCNet/RefinedWeb-style
    quality-classifier recipe (fit a linear model on labeled seed
    sets, then score the corpus); the reference's closest surface is
    the text-feature + model pipeline in its feature-engineering
    module (reference transformations/feature_engineering.py:141-225).

    Every gradient step is ONE whole-stage-codegen aggregation over a
    persisted feature frame (per-doc dense bucket-count arrays — built
    once with a single shuffle), with the current weights broadcast
    back as literals; no per-row Python anywhere.

    ENGINE-EXACT BY CONSTRUCTION: weights live on the 2^-20 dyadic
    grid (like classifier_weights), per-doc residuals are rounded to
    2^-12 and per-doc gradient contributions to 2^-30 before
    aggregation — so every sum in the trainer is a sum of exactly-
    representable dyadics (exact integer arithmetic inside float64),
    order-independent, and therefore identical under any partitioning,
    any executor count, and on a driver-side reference replaying the
    same op order. The learned model scores engine-exactly through
    hashed_classifier_score, and an external SQL oracle replays the
    scoring bit-for-bit.

    Zero-token documents carry no features and are excluded from
    training (the scorer still scores them at sigmoid(bias)); rows
    with NULL labels are excluded.

    Returns {"weights", "bias", "n_docs", "steps", "lr", "n_buckets"}.
    """
    nb = n_buckets
    if nb <= 0 or steps < 0:
        raise ValueError("n_buckets must be positive, steps >= 0")
    toks = df.where(F.col(label_col).isNotNull()).select(
        F.col(id_col),
        F.col(label_col).cast("double").alias("__y"),
        F.explode(tokens(text_col)).alias("__t"),
    )
    cnts = toks.select(
        id_col, "__y", (hash52(F.col("__t")) % nb).cast("int").alias("__b")
    ).groupBy(id_col, "__y", "__b").agg(F.count(F.lit(1)).alias("__c"))
    feat = (
        cnts.groupBy(id_col, "__y")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__b", "__c"))
            ).alias("__m"),
            F.sum("__c").alias("__n"),
        )
        .select(
            "__y",
            F.col("__n").cast("double").alias("__n"),
            F.transform(
                F.sequence(F.lit(0), F.lit(nb - 1)),
                lambda b: F.coalesce(
                    F.element_at(F.col("__m"), b), F.lit(0)
                ).cast("double"),
            ).alias("__x"),
        )
        .persist()
    )
    try:
        n_docs = feat.count()
        weights = [0.0] * nb
        bias = 0.0
        if n_docs == 0:
            return {
                "weights": weights, "bias": bias, "n_docs": 0,
                "steps": steps, "lr": lr, "n_buckets": nb,
            }
        for _ in range(steps):
            w_lit = F.array(*[F.lit(w) for w in weights])
            dot = F.aggregate(
                F.sequence(F.lit(1), F.lit(nb)),
                F.lit(0.0),
                lambda acc, i: acc
                + F.element_at(F.col("__x"), i) * F.element_at(w_lit, i),
            )
            margin = F.lit(bias) + dot / F.col("__n")
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            stepdf = feat.withColumn(
                "__r", _dyadic(p - F.col("__y"), 12)
            )
            row = stepdf.agg(
                *[
                    F.sum(
                        _dyadic(
                            F.col("__r")
                            * F.element_at(F.col("__x"), b + 1)
                            / F.col("__n"),
                            30,
                        )
                    ).alias(f"g{b}")
                    for b in range(nb)
                ],
                F.sum("__r").alias("gb"),
            ).first()
            weights = [
                dyadic_round(
                    weights[b] - lr * (row[f"g{b}"] / n_docs), 20
                )
                for b in range(nb)
            ]
            bias = dyadic_round(bias - lr * (row["gb"] / n_docs), 20)
        return {
            "weights": weights, "bias": bias, "n_docs": n_docs,
            "steps": steps, "lr": lr, "n_buckets": nb,
        }
    finally:
        feat.unpersist()


# Committed trained weights for the quality-classifier demo query:
# produced by tools/train_classifier.py — train_hashed_classifier on
# the sf0.01 documents fixture (/root/testdata/sf0.01), label =
# even-numbered source (CAST(substr(source, 4) AS INT) % 2 == 0),
# n_buckets=64, steps=20, lr=1.0. The trainer is engine-exact (dyadic
# grids, order-independent sums), so retraining reproduces these
# bit-for-bit — pinned by tests/test_classifier_train.py.
TRAINED_QUALITY_WEIGHTS: list[float] = [
    0.008654594421386719, -0.0028314590454101562, 0.0, 0.0,
    0.0, 0.004414558410644531, 0.0, 0.0,
    0.0, 0.013702392578125, 0.0, -0.019166946411132812,
    -0.013753890991210938, -0.0214691162109375, 0.0, 0.0,
    0.0, 0.0, 0.01409149169921875, 0.00933837890625,
    0.0, 0.0, 0.011091232299804688, -0.008755683898925781,
    0.0, 0.0, 0.0, -0.02282428741455078,
    0.0, 0.0, 0.0, 0.018639564514160156,
    -0.011964797973632812, 0.0, 0.0, 0.011571884155273438,
    0.0, 0.0, 0.00774383544921875, 0.0,
    -0.01883697509765625, 0.0, -0.00347137451171875, -0.00141143798828125,
    0.0, 0.0, 0.001659393310546875, -0.014071464538574219,
    0.0, 0.0, 0.0, 0.0,
    0.00025177001953125, 0.0, 0.010698318481445312, 0.003509521484375,
    0.02334308624267578, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.00046062469482421875, -0.0005826950073242188,
]
TRAINED_QUALITY_BIAS: float = 3.0517578125e-05


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
    tokenizer=None,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard long-document -> training-context step (window tokens per
    chunk, stride tokens between chunk starts; the final chunk is
    whatever remains and may be shorter).

    Entirely narrow: tokenization, chunk counting, and slicing are
    column expressions (sequence + explode + slice), so chunking never
    shuffles — each 100 TB input partition streams to output chunks in
    place. Tokens keep original case; zero-token documents emit no
    chunks.

    `tokenizer`: any object with `tokens_expr(col) -> Column`
    (functions.tokenize.BPETokenizer / PandasTokenizer) — windows are
    then measured and cut in real tokens; chunk_text joins the
    tokenizer's tokens with spaces (token stream, not surface text).

    Output: id, chunk_id (0-based), n_tokens, chunk_text.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if tokenizer is not None:
        toks = tokenizer.tokens_expr(F.col(text_col))
    else:
        toks = F.array_remove(F.split(F.col(text_col), r"\s+"), "")
    base = df.select(F.col(id_col), toks.alias("__tk"))
    n = F.size("__tk")
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - F.lit(window)) / F.lit(float(stride))) + 1
    )
    out = (
        base.filter(n > 0)
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn(
            "__chunk",
            F.slice(
                F.col("__tk"),
                (F.col("chunk_id") * stride + 1).cast("int"),
                window,
            ),
        )
    )
    # stride > window (gapped sampling) can place the last chunk start
    # past the end of short documents — drop the empty slice it yields.
    return out.filter(F.size("__chunk") > 0).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("__chunk").cast("long").alias("n_tokens"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )


def bigram_logprob(
    df: DataFrame, id_col: str, text_col: str, alpha: float = 0.5,
    cache: bool = True,
) -> DataFrame:
    """Per-document mean conditional bigram log-probability under the
    corpus's own add-alpha-smoothed bigram LM — the KenLM-perplexity
    quality filter with the corpus as its own model (the bigram
    upgrade of unigram_logprob: word order now matters, so shuffled or
    templated text scores low even when its vocabulary is ordinary).

    log P(w2|w1) = ln((c(w1,w2) + alpha) / (c(w1) + alpha * V)),
    V = unigram vocabulary size.

    Shape: one narrow zip makes the bigram stream, bigram and unigram
    counts are two groupBy passes over it, scoring joins them back on
    (w1,w2) and w1, and V rides along as a broadcast 1-row aggregate —
    the same bounded pattern as tfidf/unigram_logprob; no driver
    action, no UDF.

    Output: id, n_bigrams, avg_logprob, min_logprob. Documents with
    fewer than 2 tokens emit nothing (no bigram evidence).
    """
    tk = tokens(text_col)
    base = df.select(F.col(id_col), tk.alias("__tk")).withColumn(
        "__n", F.size("__tk")
    ).filter(F.col("__n") >= 2)
    # the bigram stream feeds three consumers (bigram counts, unigram
    # counts, scoring) — persist it so tokenization+zip runs once, the
    # same pattern as the minhash candidate pipeline
    bg = base.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice("__tk", 1, F.col("__n") - 1).alias("w1"),
                F.slice("__tk", 2, F.col("__n") - 1).alias("w2"),
            )
        ).alias("b"),
    ).select(
        id_col, F.col("b.w1").alias("__w1"), F.col("b.w2").alias("__w2")
    )
    if cache:
        # caller-releasable via cache=False when scoring many corpora in
        # one session (same contract as minhash_dedup_pairs)
        bg = bg.persist()
    c2 = bg.groupBy("__w1", "__w2").agg(F.count(F.lit(1)).alias("__c2"))
    # unigram counts and the vocabulary both roll up from the (much
    # smaller) bigram table rather than re-scanning the stream:
    # sum_w2 c(w1,w2) == c(w1), and in a >=2-token doc every token
    # occurs as some bigram's w1 or w2, so distinct(w1 ∪ w2) == V
    c1 = c2.groupBy("__w1").agg(F.sum("__c2").alias("__c1"))
    vocab = c2.select(
        F.explode(F.array("__w1", "__w2")).alias("__t")
    ).agg(F.countDistinct("__t").alias("__v"))
    scored = (
        bg.join(c2, ["__w1", "__w2"])
        .join(c1, "__w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__lp",
            F.log((F.col("__c2") + F.lit(float(alpha)))
                  / (F.col("__c1") + F.lit(float(alpha)) * F.col("__v"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("__lp").alias("avg_logprob"),
        F.min("__lp").alias("min_logprob"),
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_len: int = 32,
    window: int = 4,
) -> DataFrame:
    """Content-defined chunking: chunk boundaries fall where a rolling
    hash of the last `window` tokens hits 0 mod `target_len`, so chunk
    edges are determined by CONTENT, not position — insert a paragraph
    at the top of a document and every downstream chunk keeps its
    identity (fixed-stride chunking shifts them all), which is what
    makes chunk-level dedup/caching work across corpus versions
    (the rsync/CDC trick applied to token streams). Average chunk
    length ~= target_len.

    Shape: posexplode -> two windows keyed on the doc id (rolling hash,
    running boundary count) -> one (doc, chunk) aggregation with an
    ordered rebuild. All shuffles are keyed by doc id; no UDFs.

    Output: id, chunk_id (0-based), n_tokens, chunk_text.
    """
    if target_len <= 1 or window <= 0:
        raise ValueError("target_len must be > 1 and window > 0")
    from pyspark.sql.window import Window as W

    toks = F.array_remove(F.split(F.col(text_col), r"\s+"), "")
    base = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    h = F.pmod(hash52(F.lower(F.col("tok"))), F.lit(2 ** 31))
    wroll = (
        W.partitionBy(id_col).orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    rolled = base.withColumn("__rh", F.sum(h).over(wroll))
    boundary = (
        (F.col("pos") > 0)
        & (F.pmod(F.col("__rh"), F.lit(target_len)) == 0)
    ).cast("int")
    wcum = (
        W.partitionBy(id_col).orderBy("pos")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    chunked = rolled.withColumn(
        "chunk_id", F.sum(boundary).over(wcum).cast("long")
    )
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s.tok,
                ),
                " ",
            ).alias("chunk_text"),
        )
        .select(id_col, "chunk_id",
                F.col("n_tokens").cast("long").alias("n_tokens"),
                "chunk_text")
    )


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Per-document novelty: the fraction of the doc's distinct word
    n-gram shingles that occur in NO other document — high novelty
    marks genuinely fresh text, low novelty marks boilerplate and
    near-copies (the corpus-level complement of pairwise near-dup:
    cheap enough to score every doc, no candidate generation).

    Shape: the dedup pipeline's shingle machinery -> explode -> one
    document-frequency agg on the gram hash -> join back -> per-doc
    agg. Same two shuffle keys as tfidf_doc_stats.

    Output: id, n_grams, novel_grams, novelty.
    """
    from .dedup import shingled_docs

    sh = shingled_docs(df.select(id_col, text_col), id_col, text_col, n)
    grams = sh.select(F.col(id_col), F.explode("__sh").alias("__g"))
    dfreq = grams.groupBy("__g").agg(F.count(F.lit(1)).alias("__df"))
    return (
        grams.join(dfreq, "__g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("__df") == 1).cast("long")).alias("novel_grams"),
        )
        .withColumn(
            "novelty", F.col("novel_grams") / F.col("n_grams")
        )
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 10,
    min_line_chars: int = 5,
    sep: str = "\n",
) -> DataFrame:
    """Cross-document boilerplate stripping (the CCNet / RefinedWeb
    line-dedup step): any line whose normalized form (lower+trim)
    appears in >= `min_docs` DISTINCT documents is removed from every
    document; lines shorter than `min_line_chars` after normalization
    are never candidates (they'd be all-noise: "", "-", "ok").

    Scale shape: posexplode lines -> one distinct-count agg on the
    normalized line (two-phase, map-side partial) -> the hot-line set
    is SMALL relative to the corpus (it's the lines shared by many
    docs), so the anti-join against it is cheap -> one groupBy(id) to
    reassemble in original order. No driver collect of lines; the hot
    set never leaves the executors. Reassembly sorts the collected
    (pos, line) structs per document, so output text is deterministic.

    Reference anchor: the reference's cleaning ops are per-row pandas
    (reference src/data_pipeline/utils/data_cleaner.py) and have
    no cross-document step; this is the corpus-level generalization a
    100 TB curation pipeline needs.

    Output: id, clean_text (kept lines re-joined with `sep`; "" when
    every line was removed), n_lines, n_lines_removed.
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2")
    # `sep` is a literal separator: quote it for the Java-regex split
    # (\Q...\E) so metacharacters like '.' or '||' split on the exact
    # string, matching the literal array_join used for reassembly.
    parts = df.select(
        F.col(id_col),
        F.split(F.col(text_col), "\\Q" + sep + "\\E").alias("__ls"),
    )
    lines = parts.select(
        id_col, F.posexplode("__ls").alias("__pos", "__line")
    ).withColumn("__key", F.lower(F.trim("__line")))
    hot = (
        lines.filter(F.length("__key") >= min_line_chars)
        .groupBy("__key")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__key")
    )
    kept = lines.join(hot, "__key", "left_anti")
    reb = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("clean_text"),
    )
    base = parts.select(
        id_col, F.size("__ls").cast("long").alias("n_lines")
    )
    return (
        base.join(reb, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            (
                F.col("n_lines") - F.coalesce(F.col("__n_kept"), F.lit(0))
            ).cast("long").alias("n_lines_removed"),
        )
    )


# HTML entity decode order matters: "&amp;" must be last so that
# double-escaped sequences ("&amp;lt;") resolve one level per pass, the
# standard unescape semantics.
_MARKUP_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(col: Column | str) -> Column:
    """HTML/XML markup -> plain text as a pure column expression chain:
    drop <script>/<style> blocks and comments (content included), strip
    remaining tags, decode the common entities, collapse whitespace.

    This is the markup-removal step of a web-extraction pipeline
    (C4/RefinedWeb run trafilatura-class extractors upstream; at the
    Spark layer this covers the residual-markup case without leaving
    whole-stage codegen). Regexes avoid backreferences so the same
    patterns run on RE2-class engines for oracle parity.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in _MARKUP_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def strip_markup_text(
    df: DataFrame, text_col: str, out_col: str = "clean_text"
) -> DataFrame:
    """Apply :func:`strip_markup` and report size deltas. One projection,
    zero shuffles — safe to fuse into the scan stage of any corpus plan.

    Output adds: ``out_col``, ``n_chars_raw``, ``n_chars_clean``.
    """
    return (
        df.withColumn(out_col, strip_markup(text_col))
        .withColumn("n_chars_raw", F.length(text_col).cast("long"))
        .withColumn("n_chars_clean", F.length(out_col).cast("long"))
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_paragraph_chars: int = 1,
) -> DataFrame:
    """Intra-document repeated-paragraph removal: keep the FIRST
    occurrence of each normalized (lower+trim) paragraph within a
    document, drop later repeats. The within-document half of the
    dedup story (remove_boilerplate_lines is the cross-document half);
    templated pages repeat nav blocks / disclaimers inside one page,
    and repeated spans are exactly what an LM memorizes first.

    Paragraphs shorter than `min_paragraph_chars` after normalization
    are never dropped (blank separators survive structurally).

    Shape: posexplode -> row_number over (doc, normalized paragraph) in
    position order -> keep rank 1 -> one groupBy(doc) reassembly in
    original order. Two shuffles keyed on the doc id (plus the
    paragraph key inside the window partition) — no driver state, no
    UDF; `sep` is treated as a literal (\\Q...\\E), matching the
    literal array_join on reassembly.

    Output: id, clean_text, n_paragraphs, n_removed.
    """
    parts = df.select(
        F.col(id_col),
        F.split(F.col(text_col), "\\Q" + sep + "\\E").alias("__ps"),
    )
    paras = parts.select(
        id_col, F.posexplode("__ps").alias("__pos", "__p")
    ).withColumn("__key", F.lower(F.trim("__p")))
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col, "__key").orderBy("__pos")
    ranked = paras.withColumn("__rn", F.row_number().over(w))
    kept = ranked.filter(
        (F.col("__rn") == 1)
        | (F.length("__key") < min_paragraph_chars)
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__p"))),
                    lambda s: s["__p"],
                ),
                sep,
            ).alias("clean_text"),
        )
        .join(
            paras.groupBy(id_col).agg(
                F.count(F.lit(1)).alias("n_paragraphs")),
            id_col,
        )
        .select(
            id_col,
            "clean_text",
            F.col("n_paragraphs").cast("long").alias("n_paragraphs"),
            (F.col("n_paragraphs") - F.col("__n_kept"))
            .cast("long").alias("n_removed"),
        )
    )


def collocation_pmi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
) -> DataFrame:
    """Corpus collocations by pointwise mutual information:
    PMI(a,b) = ln( p(ab) / (p(a) p(b)) ) over within-document word
    bigrams — the classic collocation / multi-word-expression extractor
    (Church & Hanks 1990), used in corpus curation to find phrases
    worth protecting from tokenizer splits.

    Output: w1, w2, pair_count, pmi — pairs seen >= ``min_count``
    times. The expression shape (two divides, one multiply, one ln) is
    kept verbatim in the SQL oracle so PMI values are IEEE-identical.

    Scale shape: unigram and bigram counts are each ONE groupBy with
    map-side partials; the two count joins shuffle on the token key.
    No pair enumeration beyond bigrams that actually occur.
    """
    base = df.select(F.col(id_col), tokens(text_col).alias("__w")).select(
        id_col, "__w", F.size("__w").alias("n_words")
    )
    uni = (
        base.select(F.explode("__w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t1 = uni.agg(F.sum("c").alias("t")).withColumnRenamed("t", "__t1")
    bi_all = (
        _gram_stream(base, id_col, 2)
        .select(
            F.split_part(F.col("__gram"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("__gram"), F.lit(" "), F.lit(2)).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    # the pair-count table feeds BOTH the min_count filter and the
    # bigram total below. Catalyst does NOT reuse the aggregation
    # subtree between them (r9's fold produced two full gram-stream
    # passes — zero ReusedExchange in the after plan), so persist the
    # bounded post-aggregation table: one tokenize+explode+shuffle
    # builds it, both consumers read the cache. Released by the
    # caller's/session's cache clear — the same lazy-return contract
    # as the other persisting kernels (r10; guide §5).
    bi_all = bi_all.persist()
    bi = bi_all.filter(F.col("pair_count") >= min_count)
    # total bigrams from the bigram counts themselves: sum(pair_count)
    # over the UNfiltered pair table == the gram-stream row count ==
    # Σ max(n_words - 1, 0) (docs with < 2 words emit no grams). Exact
    # long arithmetic either way; coalesce keeps the no-bigrams edge
    # case at the old count-form's 0 instead of a NULL sum.
    t2 = bi_all.agg(
        F.coalesce(F.sum("pair_count"), F.lit(0).cast("bigint")).alias("__t2")
    )
    j = (
        bi.join(uni.withColumnRenamed("w", "w1")
                .withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2")
              .withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
    )
    pmi = F.log(
        (F.col("pair_count").cast("double") / F.col("__t2"))
        / (
            (F.col("c1").cast("double") / F.col("__t1"))
            * (F.col("c2").cast("double") / F.col("__t1"))
        )
    )
    return j.select("w1", "w2", "pair_count", pmi.alias("pmi"))


def blocklist_fraction(
    df: DataFrame,
    text_col: str,
    blocklist: list[str],
    out_prefix: str = "blocked",
) -> DataFrame:
    """Word-blocklist scoring (the C4/RefinedWeb "bad words" filter
    family): per document, the count and fraction of tokens that
    appear in ``blocklist``, plus a boolean flag any curation config
    thresholds on. The blocklist becomes an array literal evaluated
    inside the row's projection — zero shuffles, zero UDFs; for
    blocklists too big for a literal (>~10k terms), join a broadcast
    DataFrame of terms against exploded tokens instead.

    Adds: {prefix}_count, {prefix}_frac, {prefix}_any.
    """
    if not blocklist:
        raise ValueError("blocklist must be non-empty")
    terms = [t.lower() for t in blocklist]
    toks = tokens(F.col(text_col))
    hits = F.size(F.filter(toks, lambda t: t.isin(*terms)))
    n = F.size(toks)
    return (
        df.withColumn(f"{out_prefix}_count", hits.cast("long"))
        .withColumn(
            f"{out_prefix}_frac",
            F.when(n > 0, hits / n.cast("double")).otherwise(F.lit(0.0)),
        )
        .withColumn(f"{out_prefix}_any", hits > 0)
    )


def char_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution, in
    bits/char. The cheapest spam/garbage signal there is: keyboard
    mash, repeated-char padding, and base64/hex blobs all sit far from
    natural text (English prose ~4.1 bits/char), so curation configs
    threshold on it before spending anything heavier (reference quality
    checks: src/data_pipeline/utils/quality_monitor.py's
    validity/consistency family; this is the corpus-curation analogue).

    Shape: one per-row projection (plus `_spread`'s repartition when —
    and only when — the scan is narrower than the cluster: a one-file
    corpus otherwise serializes the whole fold on one core). The naive
    plan (explode chars ->
    count per (doc, char) -> regroup) shuffles one row per CHARACTER,
    i.e. the entire corpus byte volume; instead the chars are sorted
    within the row, run BOUNDARIES are located with one filtered index
    pass, run lengths fall out of one zip_with over the shifted
    boundary list, and a fold over that SMALL counts array (≤ alphabet
    size) accumulates Σ c·ln(c); then
    H = (ln n − Σ c·ln(c) / n) / ln 2. The sorted array is bound to a
    column first so the per-element work is O(1) attribute access (see
    advisor rule `hof-inlined-producer`), and the heavy per-CHAR stages
    carry no struct allocation — only the ≤|alphabet| fold does any
    float math. Fold order = sorted char order, so the float is
    deterministic across partition orders and bit-identical to a SQL
    twin folding the same histogram in the same order.

    Empty documents report 0.0 entropy (no characters, no surprise).

    Output: id, n_chars, distinct_chars, entropy_bits.
    """
    bound = _spread(df).select(
        F.col(id_col),
        F.array_sort(
            F.filter(
                F.split(F.col(text_col), ""), lambda c: c != F.lit("")
            )
        ).alias("__sc"),
    )
    s = F.col("__sc")
    n = F.size(s)
    # run END positions, capture-free (no lambda references `s` — a
    # captured producer column is quadratic under CollapseProject /
    # filter-pushdown substitution, see advisor rule
    # `hof-inlined-producer`): a position is a run end when the next
    # char differs (the null pad marks the final position).
    nxt = F.concat(
        F.slice(s, 2, F.greatest(n - 1, F.lit(0))),
        F.array(F.lit(None).cast("string")),
    )
    bnd = F.zip_with(
        s, nxt, lambda a, b: b.isNull() | (a != b)
    )
    marked = F.zip_with(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        bnd,
        lambda i, e: F.when(e, i),
    )
    with_runs = bound.select(
        id_col,
        n.alias("__n"),
        F.array_compact(marked).alias("__en"),
    )
    en = F.col("__en")
    # run lengths = ends minus the previous end (0 prepended); the
    # null-padded tail element compacts away.
    counts = F.array_compact(
        F.zip_with(
            en,
            F.concat(F.array(F.lit(0)), en),
            lambda e, p: (e - p).cast("double"),
        )
    )
    folded = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, c: acc + c * F.log(c),
    )
    nd = F.col("__n").cast("double")
    ent = F.when(
        F.col("__n") > 0,
        (F.log(nd) - folded / nd) / math.log(2.0),
    ).otherwise(F.lit(0.0))
    return with_runs.select(
        F.col(id_col),
        F.col("__n").cast("long").alias("n_chars"),
        F.size(en).cast("long").alias("distinct_chars"),
        ent.alias("entropy_bits"),
    )


def zipf_stats(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = None,
    top_k: int = 100,
) -> DataFrame:
    """Corpus-health statistics per group (or globally): token count,
    vocabulary size, type-token ratio, hapax fraction (share of the
    vocabulary seen exactly once), and the Zipf slope — the OLS slope of
    ln(freq) on ln(rank) over the top_k most frequent terms (a healthy
    natural-language corpus sits near -1; boilerplate-heavy or
    template-generated corpora drift far from it).

    Shape: one (group, token) count shuffle, then a TWO-STAGE top-k —
    stage 1 pre-prunes to the top_k of each (group, hash-bucket) slice
    (n_buckets parallel windows, each sorting only ~vocab/n_buckets
    rows), stage 2 ranks the surviving <= top_k * n_buckets rows per
    group. Any global top-k token is by construction in its bucket's
    top-k, so the result is identical to a single vocab-wide sort while
    no partition ever sorts more than a 1/n_buckets slice of the
    vocabulary — the same bound the repo's other cell-blocked windows
    carry. The slope is computed from explicit moment sums — the same
    formula any external replayer uses, no engine-specific regression
    function.

    Output: [group_col,] n_tokens, vocab_size, type_token_ratio,
    hapax_frac, zipf_slope.
    """
    from pyspark.sql import Window

    keys = [group_col] if group_col else []
    n_buckets = 64
    toks = df.select(
        *keys, F.explode(tokens(text_col)).alias("__t")
    )
    counts = toks.groupBy(*keys, "__t").agg(
        F.count(F.lit(1)).alias("__c")
    )
    vocab = counts.groupBy(*keys).agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0)).alias("__hapax"),
    )
    order = [F.desc("__c"), F.asc("__t")]
    wb = Window.partitionBy(
        *keys, F.pmod(F.hash("__t"), F.lit(n_buckets))
    ).orderBy(*order)
    pruned = (
        counts.withColumn("__rb", F.row_number().over(wb))
        .filter(F.col("__rb") <= top_k)
        .drop("__rb")
    )
    if keys:
        w = Window.partitionBy(*keys).orderBy(*order)
    else:
        w = Window.partitionBy().orderBy(*order)
    ranked = (
        pruned.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= top_k)
        .select(
            *keys,
            F.log(F.col("__r").cast("double")).alias("__x"),
            F.log(F.col("__c").cast("double")).alias("__y"),
        )
    )
    slope = ranked.groupBy(*keys).agg(
        (
            (F.avg(F.col("__x") * F.col("__y"))
             - F.avg("__x") * F.avg("__y"))
            / (F.avg(F.col("__x") * F.col("__x"))
               - F.avg("__x") * F.avg("__x"))
        ).alias("zipf_slope")
    )
    joined = (
        vocab.join(slope, keys) if keys else vocab.crossJoin(slope)
    )
    return joined.select(
        *keys,
        "n_tokens",
        "vocab_size",
        (F.col("vocab_size").cast("double") / F.col("n_tokens")).alias(
            "type_token_ratio"
        ),
        (F.col("__hapax").cast("double") / F.col("vocab_size")).alias(
            "hapax_frac"
        ),
        "zipf_slope",
    )


def source_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    smooth: float = 0.5,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram
    distributions of each source — the mixture-design companion to
    source_overlap_matrix (that one asks "do sources share literal
    shingles?", this one asks "do they use language the same way?").
    JS is symmetric and bounded by ln 2, so scores are comparable
    across corpus sizes.

    Distributions are add-``smooth`` smoothed over the GLOBAL shared
    vocabulary (every token seen in ANY source), computed from one
    (source, token) count shuffle; the pair join is per-token on the
    bounded per-source count table (rows = vocab x sources, never the
    corpus), and sources are few by construction, so the pair expansion
    is bounded. Note the global-vocabulary convention deliberately:
    tokens absent from BOTH sources of a pair still contribute when the
    sources' totals differ (their smoothed masses differ), so adding an
    unrelated source can shift an existing pair's JS value. The shared
    grid keeps every pair's distribution a true probability vector over
    one common support — the convention the DuckDB oracle replays.

    Output: source_a, source_b, js_divergence (one row per unordered
    pair, a < b).
    """
    toks = df.select(
        F.col(group_col).alias("__g"), F.explode(tokens(text_col)).alias("__t")
    )
    counts = toks.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    counts = counts.persist()  # feeds totals, vocab, and both join sides
    totals = counts.groupBy("__g").agg(F.sum("__c").alias("__n"))
    # ONE bounded driver action for both scalars the plan needs as
    # literals (r9: was two — a distinct().count() and a sorted source
    # collect, each a full pass + driver round trip over the cache):
    # count_distinct is the same exact count, and sort_array(collect_set)
    # over the (source, token) count table is exactly the distinct
    # ordered source list totals would have produced — one row per
    # SOURCE, never per token or document. NON-NULL assumption, by
    # design: count_distinct and collect_set skip NULLs, so a NULL
    # source group (or NULL token — impossible from tokens()) is
    # excluded from the pair matrix; callers with NULL-able source
    # columns should fillna/filter upstream if they want NULL as a
    # real group.
    mrow = counts.agg(
        F.count_distinct("__t").alias("__v"),
        F.sort_array(F.collect_set("__g")).alias("__gs"),
    ).first()
    vocab_n = mrow["__v"]
    srcs = list(mrow["__gs"])
    pairs = [(x, y) for i, x in enumerate(srcs) for y in srcs[i + 1:]]
    spark = df.sparkSession
    if not pairs:  # zero or one source: no pairs, typed empty result
        counts.unpersist()
        return spark.createDataFrame(
            [], "source_a string, source_b string, js_divergence double"
        )
    pair_df = spark.createDataFrame(pairs, ["source_a", "source_b"])
    vocab = counts.select("__t").distinct()
    grid = pair_df.crossJoin(vocab)
    ca = counts.select(
        F.col("__g").alias("source_a"), "__t", F.col("__c").alias("__ca")
    )
    cb = counts.select(
        F.col("__g").alias("source_b"), "__t", F.col("__c").alias("__cb")
    )
    ta = totals.select(
        F.col("__g").alias("source_a"), F.col("__n").alias("__na")
    )
    tb = totals.select(
        F.col("__g").alias("source_b"), F.col("__n").alias("__nb")
    )
    s = F.lit(float(smooth))
    joined = (
        grid.join(ca, ["source_a", "__t"], "left")
        .join(cb, ["source_b", "__t"], "left")
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a", "source_b",
            (
                (F.coalesce("__ca", F.lit(0.0)) + s)
                / (F.col("__na") + s * vocab_n)
            ).alias("__p"),
            (
                (F.coalesce("__cb", F.lit(0.0)) + s)
                / (F.col("__nb") + s * vocab_n)
            ).alias("__q"),
        )
    )
    m = (F.col("__p") + F.col("__q")) / 2.0
    contrib = 0.5 * F.col("__p") * F.log(F.col("__p") / m) + 0.5 * F.col(
        "__q"
    ) * F.log(F.col("__q") / m)
    out = (
        joined.groupBy("source_a", "source_b")
        .agg(F.sum(contrib).alias("js_divergence"))
    )
    # Swap caches (the semantic_dedup pattern): the pair table is tiny
    # (#source-pairs rows), so materialize it eagerly and release the
    # vocab-sized counts cache — repeated sweeps don't accumulate
    # executor storage.
    out = out.persist()
    out.count()
    counts.unpersist()
    return out
