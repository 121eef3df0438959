"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style action (collect on aggregates,
count on wide outputs) so the full plan runs but the driver doesn't funnel
giant results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Queries that return O(input) rows: force them through the noop sink
# instead of collecting. count() is NOT a valid forcing action here —
# Catalyst prunes columns a count doesn't need, which deletes pure
# projections and even whole Window operators from the plan (verified:
# window_ranking's count-plan is a bare parquet scan), so count-based
# timings measured a degenerate query. The noop writer computes every
# output column JVM-side and discards rows without a driver transfer.
_WIDE = {
    "date_parts", "window_ranking", "window_offsets", "window_running",
    "melt_part", "dedup_first_per_key", "select_transform",
    "filter_predicates", "union_by_name", "sort_topk",
    "text_statistics", "token_counts", "doc_fingerprints",
    "tumbling_window_agg", "sessionize_events", "profile_lineitem",
    "rolling_stats", "aggregation_features", "asof_join_events",
    "range_join_acctbal", "dedup_keep_last", "media_waveform_features",
    "savgol_smooth", "seasonal_decomposition", "doc_quality_scores",
    "tfidf_doc_mass", "neardup_clusters", "media_image_features",
    "gopher_repetition", "unigram_logprob_scores", "pii_redaction",
    "stratified_sample_docs", "token_shard_packing", "kmeans_lloyd",
    "benchmark_decontamination", "domain_quota_cap",
    "duplicate_span_flags", "bpe_token_counts", "bpe_shard_packing",
    "bpe_token_count_32k",
    "media_jpeg_roundtrip", "keyword_extraction", "semantic_dedup_keep",
    "holt_trend_smoothing", "funnel_user_stages",
    "bloom_url_membership", "duplicate_span_removal",
    "collocation_pmi_pairs", "semantic_clusters", "badword_scores",
    "luhn_pan_audit", "soft_dedup_weights", "mixed_language_docs",
    # winnowing emits one row per window-min fingerprint (~100/doc):
    # collecting millions of rows measures the driver's pickle loop,
    # not the engine. count() still forces the whole fingerprint
    # pipeline — the isNotNull filter on the exploded column cannot be
    # pruned or pushed below the Generate.
    "winnowing_doc_fingerprints",
}

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q4_order_priority",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q10_returned_items",
    "q18_large_volume",
    "semi_join_urgent_customers",
    "grouped_agg_multi",
    "window_ranking",
    "window_running",
    "pivot_status",
    "rollup_subtotals",
    "dedup_first_per_key",
    "dedup_keep_last",
    "date_parts",
    "asof_join_events",
    "range_join_acctbal",
    "pivot_margins",
    "seasonal_decomposition",
    "savgol_smooth",
    # scale ops: training-data pipeline surface
    "text_statistics",
    "doc_fingerprints",
    "minhash_neardup",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "media_waveform_features",
    "tumbling_window_agg",
    "rolling_stats",
    "profile_lineitem",
    # round-2 additions (appended; earlier entries keep their positions
    # so per-query comparison against prior rounds holds)
    "doc_quality_scores",
    "tfidf_doc_mass",
    "neardup_clusters",
    "media_image_features",
    "gopher_repetition",
    "unigram_logprob_scores",
    "pii_redaction",
    "stratified_sample_docs",
    "token_shard_packing",
    "q7_nation_volume",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q22_idle_rich_customers",
    "salted_join_revenue",
    "q9_product_profit",
    "q16_supplier_counts",
    "q19_disjunctive_revenue",
    "kmeans_lloyd",
    "drift_psi_prices",
    "drift_psi_priorities",
    "benchmark_decontamination",
    "domain_quota_cap",
    "duplicate_span_flags",
    # round-3 additions
    "classifier_quality_scores",
    "document_chunks",
    "embedding_quantization",
    "zorder_locality",
    "sequence_packing",
    "cms_token_frequencies",
    "mixture_sample_docs",
    "bigram_logprob_scores",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q11_important_parts",
    "q12_late_priority",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "fuzzy_name_matches",
    "random_projection_embeddings",
    "skew_diagnosis",
    "corpus_split_stats",
    "weighted_sample_docs",
    "ann_quantized_topk",
    "cdc_document_chunks",
    "corpus_snapshot_diff",
    # round-4 additions
    "bpe_token_counts",
    "bpe_shard_packing",
    "bpe_vocab_usage",
    "media_jpeg_roundtrip",
    "incremental_rollup",
    "rollup_histogram_quantiles",
    "heavy_hitters_suppliers",
    "heavy_hitters_by_flag",
    "bm25_search",
    "keyword_extraction",
    "semantic_dedup_keep",
    "funnel_user_stages",
    "funnel_conversion_events",
    "cohort_retention_weekly",
    "holt_trend_smoothing",
    "dsir_importance_scores",
    "paragraph_dedup_docs",
    "canonical_url_dedup",
    "bpe_fertility_by_lang",
    "hard_negative_pairs",
    "temperature_mixture_docs",
    "bloom_url_membership",
    "duplicate_span_removal",
    "packed_shard_manifest",
    "collocation_pmi_pairs",
    "semantic_clusters",
    "curriculum_phase_stats",
    "badword_scores",
    "char_entropy_scores",
    "centroid_quality_scores",
    "source_overlap",
    "winnowing_doc_fingerprints",
    "image_dhash_dedup",
    "hybrid_rrf_search",
    "diverse_prototype_sample",
    "classifier_threshold_sweep",
    "audio_fingerprint_dedup",
    "k_anonymity_audit",
    "corpus_zipf_stats",
    "source_js_divergence",
    "cross_corpus_decontamination",
    "cluster_best_exemplar",
    # round-5 additions
    "length_batch_packing",
    "event_transition_matrix",
    "top_event_paths",
    "supplier_price_trends",
    "corpus_fingerprint",
    "semantic_decontamination_flags",
    # round-6 additions
    "bpe_token_count_32k",
    "ks_drift_prices",
    "luhn_pan_audit",
    "bitext_margin_pairs",
    "robust_outliers_events",
    "length_gini_by_source",
    # round-7 additions
    "gini_concentration_prices",
    "bpe_roundtrip_audit",
    "soft_dedup_weights",
    "mixed_language_docs",
    # round-8 additions
    "length_gini_bucketed",
    "priority_sample_docs",
    "classifier_trained_scores",
    # token_set_similarity is deliberately NOT a headliner: its gate
    # query runs the exact (uncut) candidate mode, which is quadratic
    # in hot-token postings — correct at sf0.01 gate scale, wrong to
    # time at sf0.1 (the df-cut mode is the scale path)
]

# sf1 VALUE gate (tools/check.py /tmp/spark_graft_sf1 $SF1_VALUE_GATE):
# every SF decade of value-gating has caught a real float-accumulation
# straddle the smaller SFs missed (three at sf0.1 in round 6, the
# profiler money sum at sf1 in round 7). Round 8 widens the gate from
# the 31 TPC-H-ish headliners to the LLM-curation families — dedup /
# similarity / BPE / sampling / drift — whose float paths had never
# been value-checked above sf0.1.
SF1_VALUE_GATE = HEADLINE[:31] + [
    # dedup family
    "dedup_exact_groups",
    "neardup_clusters",
    "soft_dedup_weights",
    "duplicate_span_removal",
    "simhash_sigs",
    "winnowing_doc_fingerprints",
    # similarity / ANN family. Round 9 closed the last exclusions: the
    # oracles now run the 20K x 320-cell assignment as one vectorized
    # DOUBLE[64] min(struct) aggregate (array_inner_product is
    # bit-identical to list_dot_product) instead of an interpreted
    # n x cells window, and bitext replays the IVF-probed path behind
    # the same size dispatch as the engine — all six embedding-family
    # queries are value-gated at sf1 (~35 s each; semantic_clusters
    # ~4.5 min, dominated by DuckDB's recursive-CTE reachability).
    "semantic_dedup_keep",
    "semantic_clusters",
    "embedding_neardup",
    "bitext_margin_pairs",
    "diverse_prototype_sample",
    "hard_negative_pairs",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_lsh_topk",
    "hybrid_rrf_search",
    "semantic_decontamination_flags",
    "paragraph_dedup_docs",
    # tokenizer family
    "bpe_token_counts",
    "bpe_roundtrip_audit",
    # sampling family
    "stratified_sample_docs",
    "temperature_mixture_docs",
    "priority_sample_docs",
    "classifier_trained_scores",
    # text signals / drift
    "badword_scores",
    "language_scores",
    "dsir_importance_scores",
    "gini_concentration_prices",
    "ks_drift_prices",
]


def run_action(name: str, df) -> None:
    """Benchmark forcing action: full computation, bounded driver."""
    if name in _WIDE:
        df.write.format("noop").mode("overwrite").save()
    else:
        df.collect()


def _sf_of(sf_dir: str):
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf = sf.lstrip("_")
    return float(sf) if sf.replace(".", "", 1).isdigit() else sf


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    import __spark_entry__ as entrymod
    from data_pipeline_framework_spark import get_spark

    # benchmark session: no UI/event listeners (29 queries × thousands of
    # tasks of retained UI state otherwise taxes the driver late in the
    # run), tiny retained-execution buffers.
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.ui.retainedExecutions": "8",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "100",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]
    # warm the JVM + parquet footers once with the cheapest query
    qs[names[0]](spark, sf_dir).count()

    # best-of-2 per query: this container's hypervisor steals CPU in
    # bursts (steal time ~20% of user time historically; identical
    # queries swing 3-6x run-to-run). min-of-2 reports the machine's
    # actual capability rather than whichever run a neighbor landed on.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            run_action(name, df)
            best = min(best, time.perf_counter() - t0)
            # queries persist intermediates (LSH candidates, IVF index,
            # ...); drop them so one query's cache doesn't tax the next
            # one's GC, and collect the garbage NOW so its GC pause
            # doesn't land inside (and get billed to) whichever query
            # runs next
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 3)

    payload = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "runs_per_query": runs,
    }

    # optional second sweep at a larger SF (e.g. the synthetic sf1 from
    # tools/make_scale_data.py) over the pre-round-2 headline subset —
    # turns the committed scaling story into a measured 100x-vs-sf0.01
    # point without slowing the default per-round run.
    extra_dir = os.environ.get("SPARK_GRAFT_EXTRA_SF_DIR")
    if extra_dir is None and os.path.isdir("/tmp/spark_graft_sf1"):
        # tools/make_scale_data.py's default output: if the synthetic
        # sf1 exists, fold the 10x sweep into the same JSON so every
        # committed BENCH carries a measured two-SF scaling point
        extra_dir = "/tmp/spark_graft_sf1"
    if extra_dir and os.path.isdir(extra_dir):
        extra_names = names[:31]  # the stable headline core
        extra: dict[str, float] = {}
        for name in extra_names:
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                df = qs[name](spark, extra_dir)
                run_action(name, df)
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            extra[name] = round(best, 3)
        payload["extra_sf"] = {
            "sf": _sf_of(extra_dir),
            "dir": extra_dir,
            "value": round(sum(extra.values()), 3),
            "queries": extra,
        }

    # durable copy: the complete per-query payload goes to a committed
    # file so every number survives for cross-round comparison.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try:
        with open(out_path, "w", encoding="utf-8") as fh:
            json.dump(payload, fh, indent=1)
    except OSError:
        pass

    # the driver's BENCH artifact keeps only a ~2 KB tail of stdout, so
    # the FULL payload line (>10 KB at 137 queries) truncated to an
    # unparseable fragment in rounds 7-8 ("parsed": null). Print ONE
    # compact line guaranteed far under that cap: headline total +
    # control + the 10 slowest queries; everything else lives in the
    # BENCH_LOCAL file above.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": "sec",
        "sf": payload["sf"],
        "n_queries": len(timings),
        "runs_per_query": runs,
        "control_q1": timings.get("q1_pricing_summary"),
        "queries": slowest,
        "full_payload": out_path,
    }
    if "extra_sf" in payload:
        compact["extra_sf"] = {
            "sf": payload["extra_sf"]["sf"],
            "value": payload["extra_sf"]["value"],
            "n_queries": len(payload["extra_sf"]["queries"]),
        }
    line = json.dumps(compact)
    assert len(line) < 1900, f"compact bench line {len(line)}B >= cap"
    print(line)


if __name__ == "__main__":
    main()
