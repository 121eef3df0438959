"""Global plan lint: every registered driver query's physical plan is
checked for scale-killers. Individual plan-quality tests assert the
GOOD patterns (pushdown, broadcast, codegen) on chosen queries; this
lint asserts the BAD patterns appear nowhere across the whole registry —
a regression guard that a new query can't slip past.

Banned everywhere:
  * CartesianProduct — an unconditional all-pairs join
  * BatchEvalPython — row-at-a-time Python UDF on a relational path

Allowed with justification:
  * BroadcastNestedLoopJoin ONLY for queries that cross-join a broadcast
    1-row aggregate (the scalar-subquery pattern) — bounded by design
  * ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas for the
    sanctioned vectorized escape hatches (media decode, seasonal
    decomposition, savgol, kmeans/pca MLlib internals)
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

# scalar-subquery pattern: a broadcast 1-row aggregate cross-joined in
_BNL_OK = {
    "q15_top_supplier",
    "q22_idle_rich_customers",
    "unigram_logprob_scores",
    "tfidf_doc_mass",
    "ann_cosine_topk",      # broadcast bounded query side
    "csv_schema_probe",     # 1-row observed-stats join
    "corpus_curation",      # composes tfidf/quality scalar aggregates
    # broadcast 1-row bounds/stats aggregates (min/max/quantiles/means)
    "binning_uniform",
    "binning_quantile",
    "outliers_iqr",
    "outliers_zscore",
    "quality_report",
    "schema_inference_orders",
    "schema_constraints_orders",
    "drift_psi_priorities",  # per-side broadcast 1-row category totals
    "q11_important_parts",   # broadcast 1-row mean for the HAVING scalar
    "pagerank_trade_graph",  # per-round broadcast 1-row N + dangling mass
    "pagerank_weighted_trade",  # same per-round 1-row scalars
    "bigram_logprob_scores",  # broadcast 1-row vocabulary size
    "skew_diagnosis",         # broadcast 1-row total for the share ratio
    "ann_quantized_topk",     # broadcast query side, small by construction
    "ann_pq_topk",            # broadcast query side, small by construction
    "ngram_jaccard_neardup",  # broadcast 1-row corpus count for the df-cut
    "heavy_hitters_suppliers",  # broadcast 1-row error-budget sentinel
    "bm25_search",          # broadcast 1-row (N, avgdl) corpus stats
    "keyword_extraction",   # broadcast 1-row corpus count for idf
    "funnel_conversion_events",  # broadcast 1-row step-1 denominator
    "dsir_importance_scores",  # broadcast 1-row target/raw gram totals
    "collocation_pmi_pairs",  # broadcast 1-row T1/T2 corpus totals
    "length_gini_bucketed",  # broadcast 1-row cut-point array (r10
    # in-plan sketch — the cuts used to be a separate collected action)
    "ann_recall_report",  # brute-force arm broadcasts the bounded query side
    "hybrid_rrf_search",  # bm25 arm's broadcast 1-row (N, avgdl) stats
    "semantic_decontamination_flags",  # broadcast bounded eval side
    "source_js_divergence",  # broadcast bounded source-pair grid (a
    # handful of rows) crossed with the vocab — sources are few by
    # construction, the cross side is the BROADCAST side
    "bitext_margin_pairs",  # cosine_topk arms broadcast one mining side
    # (the documented brute-force baseline; ivf_topk is the scale path)
}

# queries whose operators legitimately run vectorized Python
_ARROW_OK = {
    "media_waveform_features",
    "media_image_features",
    "media_jpeg_roundtrip",
    "seasonal_decomposition",
    "savgol_smooth",
    "kmeans_cluster_sizes",
    "pca_projection",
    "tfidf_vectors",
    "changepoints",
    "ann_ivf_topk",   # Arrow-batched cell assignment
    "ann_ivfpq_topk",  # Arrow-batched cell assignment (IVF coarse stage)
    "ewm_smoothing",  # sequential recurrence, applyInPandas per series
    "holt_trend_smoothing",  # same: per-series sequential recurrence
    "heavy_hitters_suppliers",  # bounded per-partition MG summaries
    "heavy_hitters_by_flag",    # same, grouped
    "ann_recall_report",  # IVF arm's Arrow-batched cell assignment
    "image_dhash_dedup",   # byte-level PNG decode is inherently Python
    "audio_fingerprint_dedup",  # byte-level waveform decode, same
    # learned-BPE encode: Arrow-batched per-distinct-word fast path is
    # the default above ARROW_MERGE_THRESHOLD merges (the chained JVM
    # replace scales with merge count; the oracle still replays it)
    "bpe_token_counts",
    "bpe_vocab_usage",
    "bpe_shard_packing",
    "bpe_fertility_by_lang",
    # 32,768-merge production vocab: rank-priority per-distinct-word
    # encode (flat in merge count) — a 32K-deep JVM replace chain is
    # not a plan, it's a stack overflow
    "bpe_token_count_32k",
    # 32K encode + inverse-vocab decode: both ends are the Arrow fast
    # path (a 32K-entry literal map expression is not viable either way)
    "bpe_roundtrip_audit",
}


def _plans(spark, sf_dir):
    failures = []
    for name, fn in sorted(entry.queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - report, don't abort the sweep
            failures.append(f"{name}: plan build failed: {exc}")
            continue
        yield name, plan, failures


def test_no_scale_killers_in_any_registered_query(spark, sf_dir):
    failures: list[str] = []
    gen = _plans(spark, sf_dir)
    for name, plan, failures in gen:
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct in plan")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: row-wise Python UDF (BatchEvalPython)")
        if "BroadcastNestedLoopJoin" in plan and name not in _BNL_OK:
            failures.append(
                f"{name}: BroadcastNestedLoopJoin outside the scalar-"
                "subquery allowlist"
            )
        if (
            ("ArrowEvalPython" in plan or "MapInPandas" in plan
             or "FlatMapGroupsInPandas" in plan)
            and name not in _ARROW_OK
        ):
            failures.append(
                f"{name}: vectorized Python outside the sanctioned list"
            )
    assert not failures, "\n".join(failures)


def test_advisor_flags_and_clears(spark):
    """the product-facing audit_plan/assert_scalable mirror this lint."""
    from data_pipeline_framework_spark.plans.advisor import (
        assert_scalable,
        audit_plan,
    )

    import pytest as _pytest
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    a = spark.range(10).withColumnRenamed("id", "x")
    b = spark.range(10).withColumnRenamed("id", "y")

    clean = a.join(b, a.x == b.y)
    assert audit_plan(clean) == []
    assert_scalable(clean)

    cart = a.crossJoin(b)
    rules = {f.rule for f in audit_plan(cart)}
    assert "cartesian-product" in rules or "broadcast-nested-loop" in rules
    with _pytest.raises(AssertionError):
        assert_scalable(cart, warn_ok=False)

    gw = a.withColumn("r", F.row_number().over(Window.orderBy("x")))
    rules = {f.rule for f in audit_plan(gw)}
    assert "single-partition-window" in rules
    with _pytest.raises(AssertionError):
        assert_scalable(gw, warn_ok=False)
    assert_scalable(gw)  # warns pass by default

    py = a.withColumn(
        "u", F.udf(lambda v: v + 1, "long")(F.col("x"))
    )
    assert {f.rule for f in audit_plan(py)} >= {"row-python-udf"}
    with _pytest.raises(AssertionError):
        assert_scalable(py)

    # a correctly KEYED window combined with a bounded 1-row global
    # aggregate (Exchange SinglePartition feeding HashAggregate — the
    # standard scalar pattern) must NOT trip the single-partition rule
    keyed = a.withColumn("grp", F.col("x") % 2).withColumn(
        "r", F.row_number().over(Window.partitionBy("grp").orderBy("x"))
    )
    total = keyed.agg(F.sum("x").alias("t"))
    combined = keyed.crossJoin(F.broadcast(total))
    rules = {f.rule for f in audit_plan(combined)}
    assert "single-partition-window" not in rules


def test_advisor_flags_hof_inlined_producer(spark):
    """a lambda whose body re-evaluates a producer (split/tokenize) per
    element — the CollapseProject O(n^2) hazard — must warn; bound
    arrays in argument position must not."""
    from pyspark.sql import functions as F

    from data_pipeline_framework_spark.plans.advisor import audit_plan

    df = spark.createDataFrame([("a b c d e",)], "text string")
    # producer inlined INTO the lambda body: split() runs per element
    toks = F.split(F.col("text"), " ")
    bad = df.select(
        F.transform(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.element_at(toks, i),
        ).alias("out")
    )
    assert "hof-inlined-producer" in {f.rule for f in audit_plan(bad)}

    # same computation with the array only in ARGUMENT position: clean
    good = df.select(toks.alias("t")).select(
        F.zip_with(
            F.col("t"), F.col("t"), lambda a, b: F.concat(a, b)
        ).alias("out")
    )
    assert "hof-inlined-producer" not in {f.rule for f in audit_plan(good)}
