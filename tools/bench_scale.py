"""Scale-stress bench: the headline queries at sf0.1 AND the 10x
synthetic sf1 (tools/make_scale_data.py), with per-query scaling
exponents — the measured version of the "would this survive 100x?"
argument the plan lint makes statically.

exponent = log(t_big / t_small) / log(10): 1.0 = perfectly linear,
< 1 = fixed overhead amortizing away, > 1 = super-linear (a shuffle,
skew, or candidate-explosion problem). Queries with sub-second small-SF
times are overhead-dominated and their exponents read low; the flag
threshold only fires on queries that are slow enough to measure.

Usage:  python tools/make_scale_data.py          # once
        python tools/bench_scale.py [out.json]
Env: SPARK_GRAFT_SCALE_DIR (default /tmp/spark_graft_sf1),
     SPARK_GRAFT_SF_DIR (small side, default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS.

Optional third decade: if SPARK_GRAFT_SCALE10_DIR is set and exists
(tools/make_scale_data.py <dir> 100 builds it, ~1.7 GB), the cheapest
headliners also run there and the output gains a "probe_sf10" section —
turning the per-query scaling exponents into a 3-point series
(sf0.1 -> sf1 -> sf10) for the queries cheap enough to probe.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: HEADLINE + _WIDE)

# exponent gate: anything >= this on a measurable query is a scaling bug
MAX_EXPONENT = 1.2
# Nothing is skipped at scale any more: round 5 skipped
# semantic_clusters because make_scale_data's epsilon-shifted embedding
# copies made the TRUE near-dup pair set grow ~100x per decade (output-
# bound by construction). The synthetic now rotates each copy (pairwise
# structure preserved within a copy, cross-copy similarity is noise), so
# true pairs grow linearly and the query's exponent measures the ENGINE
# (with its corpus-adaptive LSH signature width), not the construction.
SCALE_SKIP: dict[str, str] = {}
# only gate queries whose small-SF time is above this (else overhead noise)
MIN_MEASURABLE_SEC = 0.35

# third-decade probe set: cheap headliners spanning the main physical
# shapes (scan-agg, window, join, dedup, text, media, streaming twin)
PROBE_SF10 = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "grouped_agg_multi",
    "window_ranking",
    "window_running",
    "date_parts",
    "dedup_first_per_key",
    "rolling_stats",
    "text_statistics",
    "doc_fingerprints",
    "tumbling_window_agg",
    # shuffle-bound dedup family at 100x: banded-bucket candidate
    # generation + exact verify — the round-5 verdict's stretch ask so
    # the three-decade series also covers a shuffle-heavy shape
    "minhash_neardup",
    # the registry's steepest 10x scaler (0.97 in SCALE_r06) — the
    # round-6 verdict asked for a second decade so "probe-limited"
    # is shown, not asserted: the IVF arm's adaptive cells must hold
    # the two-decade exponent at or under 1.0
    "bitext_margin_pairs",
    # round-7 verdict task 1: every single-decade exponent >= 0.9 gets
    # a second decade (bitext proved near-1.0 single-decade numbers can
    # be constant-overhead distortion OR real tails — only sf10 tells).
    # diverse_prototype_sample's probe EXPOSED a real one: plan
    # construction built the adaptive codebook literal one F.lit per
    # float (~n_cells*dim py4j round trips); _nested_double_lit fixed
    # it (157.9 -> 13.7 s at sf10, exponent 0.953 -> 0.569)
    "badword_scores",
    "duplicate_span_removal",
    "hard_negative_pairs",
    "semantic_dedup_keep",
    "diverse_prototype_sample",
    "semantic_clusters",
]


def _run(spark, qs, names, sf_dir, runs=2):
    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            # noop-sink forcing (see bench.run_action): count() lets the
            # optimizer prune projections/windows and times a bare scan
            bench.run_action(name, df)
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 3)
    return timings


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r03.json"
    small = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_sf1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    factor = float(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))

    import __spark_entry__ as entrymod
    from data_pipeline_framework_spark import get_spark

    spark = get_spark(
        app_name="bench-scale", master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.ui.retainedExecutions": "8",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "100",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = [n for n in bench.HEADLINE if n in qs and n not in SCALE_SKIP]
    qs[names[0]](spark, small).count()  # warm JVM/footers

    t_small = _run(spark, qs, names, small)
    t_big = _run(spark, qs, names, big)

    def _exponent(a: float, b: float) -> float:
        return round(
            math.log(max(b, 1e-3) / max(a, 1e-3)) / math.log(factor), 3
        )

    per_query = {}
    flagged = []
    for n in names:
        a, b = t_small[n], t_big[n]
        exp = _exponent(a, b)
        per_query[n] = {"t_small": a, "t_big": b, "exponent": exp}
        if a >= MIN_MEASURABLE_SEC and exp > MAX_EXPONENT:
            flagged.append(n)

    # This container's hypervisor steals CPU in bursts (identical runs
    # swing 3-6x), so a single unlucky window can fabricate a
    # super-linear flag (observed: minhash at a 1.33 exponent from one
    # burst; identical plans, 0.31 measured clean). Before recording a
    # flag, re-measure the suspect at BOTH SFs and keep the overall
    # best-of-all-runs; only a flag that survives the retry is real.
    confirmed = []
    for n in flagged:
        t2s = _run(spark, qs, [n], small, runs=2)[n]
        t2b = _run(spark, qs, [n], big, runs=2)[n]
        a = min(t_small[n], t2s)
        b = min(t_big[n], t2b)
        exp = _exponent(a, b)
        per_query[n] = {
            "t_small": a, "t_big": b, "exponent": exp, "retried": True,
        }
        if a >= MIN_MEASURABLE_SEC and exp > MAX_EXPONENT:
            confirmed.append(n)
    flagged = confirmed

    result = {
        "metric": "scale_stress",
        "factor": factor,
        "small_dir": small,
        "big_dir": big,
        "total_small_sec": round(
            sum(v["t_small"] for v in per_query.values()), 3),
        "total_big_sec": round(
            sum(v["t_big"] for v in per_query.values()), 3),
        "total_exponent": _exponent(
            sum(v["t_small"] for v in per_query.values()),
            sum(v["t_big"] for v in per_query.values())),
        "max_exponent_gate": MAX_EXPONENT,
        "flagged_superlinear": flagged,
        "skipped": SCALE_SKIP,
        "queries": per_query,
    }

    sf10 = os.environ.get("SPARK_GRAFT_SCALE10_DIR")
    if sf10 and os.path.isdir(sf10):
        # filter against t_small (not qs): a probe outside the
        # headliner set would otherwise KeyError after the
        # expensive two-SF runs already completed
        probes = [n for n in PROBE_SF10 if n in t_small]
        t_sf10 = _run(spark, qs, probes, sf10)
        probe = {}
        for n in probes:
            a, c = t_small[n], t_sf10[n]
            probe[n] = {
                "t_small": a,
                "t_mid": t_big.get(n),
                "t_sf10": c,
                # two-decade exponent sf0.1 -> sf10 (factor^2 data)
                "exponent_2dec": round(
                    math.log(max(c, 1e-3) / max(a, 1e-3))
                    / math.log(factor * factor), 3),
            }
        result["probe_sf10"] = {
            "dir": sf10,
            "factor_vs_small": factor * factor,
            "queries": probe,
        }

    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: result[k] for k in (
        "total_small_sec", "total_big_sec", "total_exponent",
        "flagged_superlinear")}))


if __name__ == "__main__":
    main()
