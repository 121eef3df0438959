"""Corpus-scale function library: dedup, similarity, text analysis,
sampling, sketches, profiling, decontamination."""

from .dedup import (  # noqa: F401
    connected_components,
    exact_duplicates,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
    snapshot_diff,
)
from .sampling import (  # noqa: F401
    cap_per_key,
    epoch_shuffle,
    hash_sample,
    hash_split,
    mixture_sample,
    pack_contexts,
    pack_length_batches,
    pack_shards,
    stratified_hash_sample,
    weighted_sample,
)
from .retrieval import (  # noqa: F401
    bm25_topk,
    keyword_topk,
)
from .similarity import (  # noqa: F401
    cosine_topk,
    semantic_dedup,
    embedding_neardup_pairs,
    ivf_topk,
    ivfpq_topk,
    lsh_topk,
    pq_codebooks,
    pq_encode,
    pq_topk,
    quantize_embeddings,
    quantized_cosine_topk,
    random_projection,
    train_pq_codebooks,
)
from .heavy_hitters import (  # noqa: F401
    heavy_hitters,
    merge_heavy_hitters,
    top_k,
)
from .sketches import (  # noqa: F401
    cms_lookup,
    count_min_table,
    hll_distinct_table,
    hll_estimate,
    hll_merge,
)
from .tokenize import (  # noqa: F401
    BPETokenizer,
    PandasTokenizer,
    WhitespaceTokenizer,
    bpe_token_count,
    bpe_tokenize,
    train_bpe_merges,
)
from .web import (  # noqa: F401
    domain_rollup,
    extract_url_features,
    filter_blocked_domains,
    url_features,
)
from .text import (  # noqa: F401
    bigram_logprob,
    ngram_novelty,
    cdc_chunks,
    chunk_documents,
    fingerprint,
    hashed_classifier_score,
    language_id,
    quality_score,
    remove_boilerplate_lines,
    strip_markup,
    strip_markup_text,
    text_stats,
    unigram_logprob,
)
