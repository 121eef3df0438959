"""Corpus-curation operators: repetition filters, unigram log-prob,
PII redaction."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions.text import (
    line_repetition_exprs,
    repetition_stats,
    unigram_logprob,
)
from data_pipeline_framework_spark.operators.cleaning import redact_pii


def test_repetition_stats_hand_checked(spark):
    # "a b a b a": bigrams = [a b, b a, a b, b a] -> top count 2 of 4
    # trigrams = [a b a, b a b, a b a] -> "a b a" x2 dup of 3
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z w")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert (r1["n_words"], r1["bigram_total"], r1["top_bigram_count"]) == (5, 4, 2)
    assert r1["top_bigram_frac"] == pytest.approx(0.5)
    assert (r1["trigram_total"], r1["dup_trigram_count"]) == (3, 2)
    assert r1["dup_trigram_frac"] == pytest.approx(2 / 3)
    r2 = out[2]  # all grams unique
    assert r2["top_bigram_frac"] == pytest.approx(1 / 3)
    assert r2["dup_trigram_count"] == 0 and r2["dup_trigram_frac"] == 0.0


def test_repetition_stats_short_docs(spark):
    # 2 words: one bigram, no trigram; 1 word: no grams at all (dropped,
    # like the oracle which has no gram rows to group)
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "solo")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert set(rows) == {1}
    assert rows[1]["bigram_total"] == 1 and rows[1]["trigram_total"] == 0
    assert rows[1]["dup_trigram_frac"] == 0.0


def test_line_repetition_exprs(spark):
    text = "alpha\nbeta\nalpha\ngamma\n\n  \n"
    df = spark.createDataFrame([(text,)], "text string")
    m = line_repetition_exprs(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in m.items()]).first()
    # 4 non-blank lines, 'alpha' repeats: dup_line_frac = 1/4,
    # dup chars = 2*5 alpha chars of 5+4+5+5=19 total
    assert row["n_lines"] == 4
    assert row["dup_line_frac"] == pytest.approx(0.25)
    assert row["dup_line_char_frac"] == pytest.approx(10 / 19)


def test_unigram_logprob_hand_checked(spark):
    # corpus: "a a b" + "a c" -> counts a=3,b=1,c=1, total=5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob(df, "doc_id", "text").collect()}
    lp = lambda c: math.log(c / 5)  # noqa: E731
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_logprob"] == pytest.approx((2 * lp(3) + lp(1)) / 3)
    assert out[1]["min_logprob"] == pytest.approx(lp(1))
    assert out[2]["avg_logprob"] == pytest.approx((lp(3) + lp(1)) / 2)


def test_redact_pii_counts_and_text(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "ssn 123-45-6789 tel 44-123-456-7890"),
            (3, "clean text, nothing to scrub 12-34"),
            (4, "two mails a@b.io c@d.co and ssn 987-65-4321"),
        ],
        "id long, t string",
    )
    out = {r["id"]: r for r in redact_pii(df, ["t"]).collect()}
    assert out[1]["t"] == "mail [EMAIL] now" and out[1]["pii_redactions"] == 1
    assert out[2]["t"] == "ssn [SSN] tel [PHONE]"
    assert out[2]["pii_redactions"] == 2
    assert out[3]["t"].startswith("clean") and out[3]["pii_redactions"] == 0
    assert out[4]["t"] == "two mails [EMAIL] [EMAIL] and ssn [SSN]"
    assert out[4]["pii_redactions"] == 3


def test_redact_pii_multi_column_binds_original(spark):
    # counts must come from the ORIGINAL text, not the already-redacted
    # intermediate (the withColumn-rebind failure mode)
    df = spark.createDataFrame(
        [(1, "a@b.io", "c@d.io 111-22-3333")], "id long, x string, y string"
    )
    row = redact_pii(df, ["x", "y"]).first()
    assert row["x"] == "[EMAIL]"
    assert row["y"] == "[EMAIL] [SSN]"
    assert row["pii_redactions"] == 3


def test_hash_sample_deterministic_and_partition_independent(spark):
    from data_pipeline_framework_spark.functions.sampling import hash_sample

    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.2).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(df.repartition(17), "doc_id", 0.2).collect()
    }
    assert a == b  # same rows regardless of partitioning
    assert 0.17 < len(a) / 10_000 < 0.23  # rate is honored
    c = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.2, seed="s1").collect()}
    assert c != a  # new seed, independent draw
    assert hash_sample(df, "doc_id", 0.0).count() == 0
    assert hash_sample(df, "doc_id", 1.0).count() == 10_000


def test_stratified_hash_sample_rates(spark):
    from data_pipeline_framework_spark.functions.sampling import (
        stratified_hash_sample,
    )

    rows = [(i, "keep" if i % 2 else "drop") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = stratified_hash_sample(
        df, "doc_id", "src", {"keep": 1.0, "drop": 0.0}, default_rate=0.5
    )
    got = out.groupBy("src").count().collect()
    assert {r["src"]: r["count"] for r in got} == {"keep": 2000}


def test_pack_shards_hand_checked(spark):
    from data_pipeline_framework_spark.functions.sampling import pack_shards

    df = spark.createDataFrame(
        [(1, 600), (2, 600), (3, 600), (4, 600), (5, 10)],
        "doc_id long, n_tokens long",
    )
    out = {r["doc_id"]: r for r in
           pack_shards(df, "doc_id", "n_tokens", budget=1000).collect()}
    # offsets 0,600,1200,1800,2400 -> shards 0,0,1,1,2
    assert [out[i]["shard"] for i in (1, 2, 3, 4, 5)] == [0, 0, 1, 1, 2]
    assert out[5]["token_offset"] == 2400


def test_pack_length_batches_properties(spark):
    """Every batch fits the pad-to-max budget (unless a single doc
    alone exceeds it), batches never cross (bucket, shard), padding is
    in [0, 1), and the assignment is invariant to input partitioning."""
    from data_pipeline_framework_spark.functions.sampling import (
        pack_length_batches,
    )

    rows = [(i, (i * 37) % 900 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_length_batches(
        df, "doc_id", "n_tok", batch_tokens=2000, n_shards=4
    )
    got = out.collect()
    assert len(got) == 400
    by_batch: dict = {}
    for r in got:
        key = (r["len_bucket"], r["shard"], r["batch"])
        by_batch.setdefault(key, []).append(r)
    for key, members in by_batch.items():
        n = len(members)
        mx = max(m["n_tok"] for m in members)
        assert all(m["batch_max_len"] == mx for m in members)
        assert all(m["batch_n_docs"] == n for m in members)
        # padded cost fits the budget, or the batch is a singleton
        # whose lone doc exceeds it
        assert n * mx <= 2000 or n == 1
        pf = members[0]["padding_frac"]
        assert 0.0 <= pf < 1.0
        # docs in one batch share the length bucket by construction
        assert len({m["len_bucket"] for m in members}) == 1
    # deterministic across partitionings
    re = {
        (r["doc_id"]): (r["len_bucket"], r["shard"], r["batch"])
        for r in pack_length_batches(
            df.repartition(13), "doc_id", "n_tok",
            batch_tokens=2000, n_shards=4,
        ).collect()
    }
    base = {
        r["doc_id"]: (r["len_bucket"], r["shard"], r["batch"])
        for r in got
    }
    assert re == base
    # length-grouped batching wastes less padding than id-order batching
    import math

    ordered = sorted(rows, key=lambda t: t[0])
    naive_pad = 0
    for i in range(0, len(ordered), 8):
        chunk = [t[1] for t in ordered[i:i + 8]]
        naive_pad += len(chunk) * max(chunk) - sum(chunk)
    packed_pad = sum(
        len(m) * max(x["n_tok"] for x in m) - sum(x["n_tok"] for x in m)
        for m in by_batch.values()
    )
    assert packed_pad < naive_pad

    with pytest.raises(ValueError):
        pack_length_batches(df, "doc_id", "n_tok", batch_tokens=0)
    with pytest.raises(ValueError):
        pack_length_batches(
            df, "doc_id", "n_tok", batch_tokens=10, n_shards=0
        )
    assert math.isfinite(packed_pad)


def test_psi_drift_zero_and_shifted(spark):
    from data_pipeline_framework_spark.functions.profiling import psi_drift

    a = spark.range(0, 1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    same = psi_drift(a, a, "v", edges=[25.0, 50.0, 75.0]).collect()
    assert sum(r["psi_term"] for r in same) == pytest.approx(0.0, abs=1e-12)
    assert len(same) == 4
    # shift the second snapshot up by 50: mass moves across the edges
    b = spark.range(0, 1000).selectExpr("CAST(id % 100 + 50 AS DOUBLE) AS v")
    drift = psi_drift(a, b, "v", edges=[25.0, 50.0, 75.0]).collect()
    psi = sum(r["psi_term"] for r in drift)
    assert psi > 0.25  # the standard "drifted" threshold


def test_psi_drift_categorical_one_sided_category(spark):
    from data_pipeline_framework_spark.functions.profiling import (
        psi_drift_categorical,
    )

    a = spark.createDataFrame([("x",)] * 50 + [("y",)] * 50, "c string")
    b = spark.createDataFrame([("x",)] * 50 + [("z",)] * 50, "c string")
    out = {r["category"]: r for r in
           psi_drift_categorical(a, b, "c").collect()}
    assert set(out) == {"x", "y", "z"}
    assert out["y"]["frac_b"] == 0.0 and out["z"]["frac_a"] == 0.0
    assert out["y"]["psi_term"] > 0 and out["z"]["psi_term"] > 0
    assert out["x"]["psi_term"] == pytest.approx(0.0, abs=1e-12)


def test_hashed_classifier_score_hand_checked(spark):
    from data_pipeline_framework_spark.functions.text import (
        hashed_classifier_score,
    )

    # two buckets: every token lands in bucket hash52(t) % 2
    df = spark.createDataFrame(
        [(1, "aa bb aa"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in hashed_classifier_score(
            df, "doc_id", "text", weights=[1.0, -1.0], bias=0.5
        ).collect()
    }
    r1 = out[1]
    assert r1["n_tokens"] == 3
    # margin = 0.5 + mean of three +-1 weights -> in {-0.5, 0.5+1/3, 1.5, ...}
    assert abs(r1["margin"] - 0.5) <= 1.0 + 1e-9
    assert r1["prob"] == pytest.approx(1 / (1 + math.exp(-r1["margin"])))
    # empty and null docs keep their row with margin == bias
    for d in (2, 3):
        assert out[d]["n_tokens"] == 0
        assert out[d]["margin"] == pytest.approx(0.5)


def test_chunk_documents_windows_and_tail(spark):
    from data_pipeline_framework_spark.functions.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", window=4, stride=3)
    rows = sorted(
        [(r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
         for r in out.collect()]
    )
    # doc 1: ceil((10-4)/3)+1 = 3 chunks at starts 0,3,6 -> last is 4 long
    d1 = [r for r in rows if r[0] == 1]
    assert [r[1] for r in d1] == [0, 1, 2]
    assert d1[0][3] == "t0 t1 t2 t3"
    assert d1[1][3] == "t3 t4 t5 t6"
    assert d1[2][3] == "t6 t7 t8 t9"
    # short doc: one chunk, shorter than the window
    d2 = [r for r in rows if r[0] == 2]
    assert d2 == [(2, 0, 2, "a b")]
    # empty/null docs emit nothing
    assert not [r for r in rows if r[0] in (3, 4)]


def test_chunk_documents_no_shuffle(spark):
    from data_pipeline_framework_spark.functions.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = chunk_documents(df, "doc_id", "text", 2, 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_contexts_hand_checked(spark):
    from data_pipeline_framework_spark.functions.sampling import (
        pack_contexts,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, "h"), (4, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["context_id"], r["doc_id"], r["ctx_offset"], r["n_tokens"],
         r["piece_text"])
        for r in pack_contexts(df, "doc_id", "text", context_len=4).collect()
    )
    # stream a b c | d e f g | h -> contexts [a b c d] [e f g h]
    assert rows == [
        (0, 1, 0, 3, "a b c"),
        (0, 2, 3, 1, "d"),
        (1, 2, 0, 3, "e f g"),
        (1, 3, 3, 1, "h"),
    ]
    # every context except the tail is exactly full
    per_ctx = {}
    for cid, _, _, n, _ in rows:
        per_ctx[cid] = per_ctx.get(cid, 0) + n
    assert per_ctx == {0: 4, 1: 4}


def test_pack_contexts_partitioned_runs_parallel(spark):
    from data_pipeline_framework_spark.functions.sampling import (
        pack_contexts,
    )

    df = spark.createDataFrame(
        [(1, "s0", "a b"), (2, "s0", "c d"), (3, "s1", "e f g")],
        "doc_id long, shard string, text string",
    )
    out = pack_contexts(
        df, "doc_id", "text", context_len=4, partition_col="shard"
    )
    rows = {(r["shard"], r["context_id"], r["doc_id"]): r["piece_text"]
            for r in out.collect()}
    # context ids restart per shard; no cross-shard packing
    assert rows[("s0", 0, 1)] == "a b" and rows[("s0", 0, 2)] == "c d"
    assert rows[("s1", 0, 3)] == "e f g"
    plan = out._jdf.queryExecution().executedPlan().toString()
    # partitioned window: hashpartitioning exchange, not a single-partition
    assert "SinglePartition".lower() not in plan.lower()


def test_hash_split_fractions_and_stability(spark):
    from data_pipeline_framework_spark.functions.sampling import hash_split

    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["train"] / 10_000 - 0.8) < 0.03
    assert abs(counts["val"] / 10_000 - 0.1) < 0.02
    assert abs(counts["test"] / 10_000 - 0.1) < 0.02
    # growing the corpus never moves an existing doc's split
    bigger = hash_split(
        spark.range(20_000).withColumnRenamed("id", "doc_id"),
        "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in bigger.collect()}
    assert all(b[k] == v for k, v in a.items())
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"train": 0.8, "val": 0.1})


def test_mixture_rates_math():
    from data_pipeline_framework_spark.functions.sampling import (
        mixture_rates,
    )

    totals = {"web": 1000, "books": 100, "code": 100}
    # books is the binding source: t_max = 100/0.3
    r = mixture_rates(totals, {"web": 0.5, "books": 0.3, "code": 0.2})
    assert r["books"] == pytest.approx(1.0)
    assert r["web"] == pytest.approx(0.5 * (100 / 0.3) / 1000)
    assert r["code"] == pytest.approx(0.2 * (100 / 0.3) / 100)
    # budget shrinks everything proportionally
    rb = mixture_rates(totals, {"web": 0.5, "books": 0.3, "code": 0.2},
                       budget_tokens=100)
    assert rb["books"] == pytest.approx(0.3 * 100 / 100)
    with pytest.raises(ValueError):
        mixture_rates({"web": 0}, {"web": 1.0})


def test_mixture_sample_hits_target_mix(spark):
    from data_pipeline_framework_spark.functions.sampling import (
        mixture_sample,
    )

    rows = (
        [(i, "web", 10) for i in range(6000)]
        + [(10_000 + i, "books", 10) for i in range(1000)]
        + [(20_000 + i, "code", 10) for i in range(3000)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, tok long")
    out = mixture_sample(
        df, "doc_id", "source", "tok",
        {"web": 0.5, "books": 0.25, "code": 0.25},
    )
    got = {r["source"]: r["t"] for r in
           out.groupBy("source").agg(F.sum("tok").alias("t")).collect()}
    total = sum(got.values())
    # books binds (1000 docs / weight .25): realized mix ~ target
    assert abs(got["web"] / total - 0.5) < 0.05
    assert abs(got["books"] / total - 0.25) < 0.05
    assert abs(got["code"] / total - 0.25) < 0.05
    # unweighted sources are dropped entirely
    out2 = mixture_sample(df, "doc_id", "source", "tok", {"web": 1.0})
    assert out2.filter(F.col("source") != "web").count() == 0


def test_bigram_logprob_hand_checked(spark):
    from data_pipeline_framework_spark.functions.text import bigram_logprob

    # corpus: "a b a b" and "a b"; V = 2; alpha = 0.5
    # bigrams: (a,b) x3, (b,a) x1 -> c(a,b)=3, c(b,a)=1, c1(a)=3, c1(b)=1
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r
           for r in bigram_logprob(df, "doc_id", "text", alpha=0.5).collect()}
    lp_ab = math.log((3 + 0.5) / (3 + 0.5 * 2))
    lp_ba = math.log((1 + 0.5) / (1 + 0.5 * 2))
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logprob"] == pytest.approx((2 * lp_ab + lp_ba) / 3)
    assert out[1]["min_logprob"] == pytest.approx(min(lp_ab, lp_ba))
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_logprob"] == pytest.approx(lp_ab)
    # single-token docs emit nothing (no bigram evidence)
    assert 3 not in out


def test_weighted_sample_proportional_and_deterministic(spark):
    from data_pipeline_framework_spark.functions.sampling import (
        weighted_sample,
    )

    # heavy rows weight 20, light rows weight 1: heavies dominate the draw
    rows = [(i, 20.0) for i in range(200)] + [(1000 + i, 1.0)
                                              for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample(df, "doc_id", "w", k=100)
    ids = {r["doc_id"] for r in out.collect()}
    assert len(ids) == 100
    heavy = sum(1 for i in ids if i < 1000)
    assert heavy > 75  # prob ~ w: heavies should take most slots
    # deterministic across repartitionings
    ids2 = {r["doc_id"]
            for r in weighted_sample(df.repartition(13), "doc_id", "w",
                                     k=100).collect()}
    assert ids == ids2
    # non-positive weights are excluded
    df2 = spark.createDataFrame([(1, 0.0), (2, -1.0), (3, 5.0)],
                                "doc_id long, w double")
    assert [r["doc_id"] for r in
            weighted_sample(df2, "doc_id", "w", k=5).collect()] == [3]


def test_weighted_sample_topk_plan(spark):
    from data_pipeline_framework_spark.functions.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame([(1, 2.0)], "doc_id long, w double")
    plan = weighted_sample(df, "doc_id", "w", 5)._jdf.queryExecution() \
        .executedPlan().toString()
    # global top-k, not a full sort: TakeOrderedAndProject
    assert "TakeOrderedAndProject" in plan


def test_cdc_chunks_shift_invariance_and_coverage(spark):
    from data_pipeline_framework_spark.functions.text import cdc_chunks

    text = " ".join("tok%d" % ((i * 31) % 97) for i in range(300))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = cdc_chunks(df, "doc_id", "text", target_len=16)
    rows = out.collect()
    # chunks tile the doc exactly: token counts sum to the input length
    assert sum(r["n_tokens"] for r in rows) == 300
    # reconstruction: concatenating chunks in order rebuilds the doc
    joined = " ".join(
        r["chunk_text"] for r in sorted(rows, key=lambda r: r["chunk_id"])
    )
    assert joined == text
    # content-defined: prepending tokens preserves most chunk identities
    df2 = spark.createDataFrame(
        [(1, "AAA BBB CCC " + text)], "doc_id long, text string"
    )
    out2 = {r["chunk_text"]
            for r in cdc_chunks(df2, "doc_id", "text", target_len=16)
            .collect()}
    out1 = {r["chunk_text"] for r in rows}
    assert len(out1 & out2) >= len(out1) - 2  # only the head chunk differs


def test_snapshot_diff_classification(spark):
    from data_pipeline_framework_spark.functions.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will vanish"),
         (4, "Same   TEXT")],  # normalization: ws/case-insensitive fp
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same text"), (2, "has changed"), (5, "brand new"),
         (4, "same text")],   # same fingerprint as old despite formatting
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new, "doc_id", "text").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "unchanged", 5: "added"}


def test_ngram_novelty_hand_checked(spark):
    from data_pipeline_framework_spark.functions.text import ngram_novelty

    # docs 1+2 are identical (all shared trigrams); doc 3 is unique
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w q")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r
           for r in ngram_novelty(df, "doc_id", "text", n=3).collect()}
    assert got[1]["n_grams"] == 3 and got[1]["novelty"] == 0.0
    assert got[2]["novelty"] == 0.0
    assert got[3]["novelty"] == 1.0 and got[3]["novel_grams"] == 3


def test_pack_contexts_respects_order_col(spark):
    from data_pipeline_framework_spark.functions.sampling import (
        pack_contexts,
    )

    # stream order comes from ts, not doc_id
    df = spark.createDataFrame(
        [(2, 10, "a b"), (1, 20, "c d")],
        "doc_id long, ts long, text string",
    )
    rows = sorted(
        (r["context_id"], r["ctx_offset"], r["doc_id"], r["piece_text"])
        for r in pack_contexts(
            df, "doc_id", "text", context_len=4, order_col="ts"
        ).collect()
    )
    assert rows == [(0, 0, 2, "a b"), (0, 2, 1, "c d")]


def test_remove_boilerplate_lines(spark):
    # "visit our sponsor" appears in 3 docs -> hot at min_docs=3;
    # "hi" is short (<5 chars after trim) and never a candidate even
    # though it repeats; unique lines survive in original order.
    rows = [
        (1, "alpha body one\nVisit our sponsor\nhi\nending one"),
        (2, "beta body two\n  visit our sponsor  \nhi"),
        (3, "VISIT OUR SPONSOR\ngamma body three"),
        (4, "delta keeps everything\nhi"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from data_pipeline_framework_spark.functions.text import (
        remove_boilerplate_lines,
    )

    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            df, "doc_id", "text", min_docs=3, min_line_chars=5
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha body one\nhi\nending one"
    assert (out[1]["n_lines"], out[1]["n_lines_removed"]) == (4, 1)
    assert out[2]["clean_text"] == "beta body two\nhi"
    assert out[3]["clean_text"] == "gamma body three"
    assert out[4]["clean_text"] == "delta keeps everything\nhi"
    assert out[4]["n_lines_removed"] == 0


def test_remove_boilerplate_all_lines_removed(spark):
    rows = [(i, "same line here") for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from data_pipeline_framework_spark.functions.text import (
        remove_boilerplate_lines,
    )

    out = remove_boilerplate_lines(
        df, "doc_id", "text", min_docs=2, min_line_chars=5
    ).collect()
    assert all(r["clean_text"] == "" and r["n_lines_removed"] == 1 for r in out)
    assert len(out) == 4


def test_strip_markup(spark):
    from data_pipeline_framework_spark.functions.text import strip_markup_text

    rows = [
        (1, '<html><body><h1>Title</h1><p>Hello <b>world</b>.</p>'
            '<script type="text/javascript">var x = 1 < 2;</script>'
            '<!-- note -->Tom &amp; Jerry &lt;3</body></html>'),
        (2, 'no markup at all'),
        (3, '<style>p { color: red; }</style>spaced   out&nbsp;text'),
        (4, 'double escape: &amp;lt;tag&amp;gt;'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in strip_markup_text(df, "text").collect()}
    assert out[1]["clean_text"] == "Title Hello world . Tom & Jerry <3"
    assert out[2]["clean_text"] == "no markup at all"
    assert out[2]["n_chars_raw"] == out[2]["n_chars_clean"]
    assert out[3]["clean_text"] == "spaced out text"
    # one unescape level only: &amp;lt; -> &lt;
    assert out[4]["clean_text"] == "double escape: &lt;tag&gt;"


def test_epoch_shuffle_permutation(spark):
    from data_pipeline_framework_spark.functions.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    e0 = epoch_shuffle(df, "doc_id", epoch=0, n_buckets=16)
    pos0 = {r["doc_id"]: r["shuffle_pos"] for r in e0.collect()}
    # dense permutation of 0..n-1
    assert sorted(pos0.values()) == list(range(200))
    # deterministic: same epoch -> identical order
    pos0b = {
        r["doc_id"]: r["shuffle_pos"]
        for r in epoch_shuffle(df, "doc_id", epoch=0, n_buckets=16).collect()
    }
    assert pos0 == pos0b
    # reshuffle: a new epoch produces a different permutation
    pos1 = {
        r["doc_id"]: r["shuffle_pos"]
        for r in epoch_shuffle(df, "doc_id", epoch=1, n_buckets=16).collect()
    }
    assert sorted(pos1.values()) == list(range(200))
    assert pos0 != pos1
    # repartitioning the input does not change the order
    pos0c = {
        r["doc_id"]: r["shuffle_pos"]
        for r in epoch_shuffle(
            df.repartition(7), "doc_id", epoch=0, n_buckets=16
        ).collect()
    }
    assert pos0 == pos0c


def test_epoch_shuffle_validates_buckets(spark):
    from data_pipeline_framework_spark.functions.sampling import epoch_shuffle

    df = spark.createDataFrame([(1,)], "doc_id long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        epoch_shuffle(df, "doc_id", n_buckets=0)


def test_pack_shards_bucketed_matches_global(spark):
    from data_pipeline_framework_spark.functions.sampling import pack_shards

    rows = [(i, (i * 37) % 91 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    plain = {
        r["doc_id"]: (r["token_offset"], r["shard"])
        for r in pack_shards(df, "doc_id", "n_tokens", budget=300).collect()
    }
    bucketed = {
        r["doc_id"]: (r["token_offset"], r["shard"])
        for r in pack_shards(
            df.repartition(8), "doc_id", "n_tokens", budget=300, n_buckets=16
        ).collect()
    }
    assert plain == bucketed
    # the bucketed plan must NOT contain a single-partition window sort
    plan = pack_shards(
        df, "doc_id", "n_tokens", budget=300, n_buckets=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_remove_boilerplate_regex_metachar_sep(spark):
    # `sep` is documented as a literal; "||" and "." are regex
    # metacharacters that used to make F.split fragment on every char.
    rows = [
        (1, "alpha body one||shared footer line||unique tail"),
        (2, "beta body two||shared footer line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from data_pipeline_framework_spark.functions.text import (
        remove_boilerplate_lines,
    )

    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            df, "doc_id", "text", min_docs=2, min_line_chars=5, sep="||"
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha body one||unique tail"
    assert (out[1]["n_lines"], out[1]["n_lines_removed"]) == (3, 1)
    assert out[2]["clean_text"] == "beta body two"


def test_dedup_paragraphs_keeps_first_occurrence(spark):
    from data_pipeline_framework_spark.functions.text import (
        dedup_paragraphs,
    )

    rows = [
        (1, "intro para\nNAV BLOCK\nbody text\nnav block\nend"),
        (2, "a para\nb para\na para\nb para\na para"),
        (3, "all unique one\nall unique two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in dedup_paragraphs(df, "doc_id", "text").collect()}
    # case-insensitive: "nav block" repeat of "NAV BLOCK" dropped
    assert out[1]["clean_text"] == "intro para\nNAV BLOCK\nbody text\nend"
    assert (out[1]["n_paragraphs"], out[1]["n_removed"]) == (5, 1)
    assert out[2]["clean_text"] == "a para\nb para"
    assert out[2]["n_removed"] == 3
    assert out[3]["n_removed"] == 0


def test_dedup_paragraphs_blank_separators_survive(spark):
    from data_pipeline_framework_spark.functions.text import (
        dedup_paragraphs,
    )

    df = spark.createDataFrame(
        [(1, "para one\n\npara two\n\npara one")],
        "doc_id long, text string",
    )
    out = dedup_paragraphs(
        df, "doc_id", "text", min_paragraph_chars=1
    ).first()
    # both empty separators kept (below min chars), repeat dropped
    assert out["clean_text"] == "para one\n\npara two\n"
    assert out["n_removed"] == 1


def test_dsir_importance_weights_prefers_target_like_docs(spark):
    from data_pipeline_framework_spark.functions.importance import (
        dsir_importance_weights,
    )

    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") 
         for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "the quick brown fox jumps again and again"),
         (2, "completely unrelated spark shuffle partition tokens here"),
         (3, "x")],  # single token -> no bigrams -> emits nothing
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dsir_importance_weights(
        raw, target, buckets=256, ngram=2).collect()}
    assert set(out) == {1, 2}  # doc 3 has no bigram evidence
    assert out[1]["log_weight"] > out[2]["log_weight"]
    assert out[1]["avg_log_weight"] > 0 > out[2]["avg_log_weight"]
    with pytest.raises(ValueError):
        dsir_importance_weights(raw, target, buckets=1)


def test_dsir_unigram_mode(spark):
    from data_pipeline_framework_spark.functions.importance import (
        dsir_importance_weights,
    )

    target = spark.createDataFrame(
        [(10, "alpha beta gamma")], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, "delta epsilon")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in dsir_importance_weights(
        raw, target, buckets=64, ngram=1).collect()}
    assert out[1]["n_grams"] == 2
    assert out[1]["log_weight"] > out[2]["log_weight"]


def test_tokenizer_fertility_groups(spark):
    from data_pipeline_framework_spark.functions.tokenize import (
        tokenizer_fertility,
    )

    rows = [
        ("en", "the cat sat"), ("en", "a dog ran far"),
        ("de", "donaudampfschifffahrt gesellschaft"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {r["lang"]: r for r in tokenizer_fertility(
        df, ["lang"]).collect()}
    assert out["en"]["n_docs"] == 2 and out["en"]["n_words"] == 7
    assert out["de"]["n_words"] == 2
    # long compound words -> more BPE tokens per word than short English
    assert out["de"]["fertility"] > out["en"]["fertility"]
    assert out["en"]["chars_per_token"] > 0


def test_temperature_mixture_flattens_sources(spark):
    from data_pipeline_framework_spark.functions.sampling import (
        temperature_mixture_sample,
        temperature_weights,
    )

    # 10:1 size imbalance; tau=0.5 should keep ALL of the small source
    # and sqrt(1/10) of the big one
    rows = [(i, "big", 10) for i in range(1000)] + [
        (10_000 + i, "small", 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, tok int")
    out = temperature_mixture_sample(
        df, "doc_id", "source", "tok", temperature=0.5)
    kept = {r["source"]: r["n"] for r in out.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kept["small"] == 100            # smallest source fully kept
    import math

    expect_big = math.sqrt(1000 / 10000.0)  # sqrt(min_total/total)
    assert abs(kept["big"] / 1000 - expect_big) < 0.05

    w = temperature_weights({"a": 100, "b": 900}, temperature=0.5)
    assert abs(w["a"] + w["b"] - 1.0) < 1e-12
    assert w["b"] / w["a"] == pytest.approx(3.0)  # sqrt(9)
    with pytest.raises(ValueError):
        temperature_weights({"a": 100}, temperature=0.0)
    # budget path routes through mixture_rates
    capped = temperature_mixture_sample(
        df, "doc_id", "source", "tok", temperature=0.5,
        budget_tokens=2000)
    assert capped.count() < out.count()


def test_remove_duplicate_spans_hand_checked(spark):
    from data_pipeline_framework_spark.functions.dedup import (
        remove_duplicate_spans,
    )

    # doc 1 and doc 2 share the 3-token span "x y z"; doc 1 is
    # canonical (lower id). doc 3 is unique; doc 4 is too short.
    rows = [
        (1, "a b x y z c"),
        (2, "p x y z q r"),
        (3, "unique words only here"),
        (4, "ab"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, "doc_id", "text", n=3).collect()
    }
    assert out[1]["clean_text"] == "a b x y z c"       # canonical kept
    assert out[1]["removed_tokens"] == 0
    assert out[2]["clean_text"] == "p q r"             # span cut
    assert out[2]["removed_tokens"] == 3
    assert out[3]["clean_text"] == "unique words only here"
    assert out[4]["clean_text"] == "ab"                # shorter than n
    assert out[4]["removed_tokens"] == 0


def test_remove_duplicate_spans_within_doc_repeat(spark):
    from data_pipeline_framework_spark.functions.dedup import (
        remove_duplicate_spans,
    )

    # the same 2-gram repeats inside one doc: first occurrence is
    # canonical, the second is removed
    df = spark.createDataFrame(
        [(1, "x y a x y")], "doc_id long, text string"
    )
    [r] = remove_duplicate_spans(df, "doc_id", "text", n=2).collect()
    assert r["clean_text"] == "x y a"
    assert r["removed_tokens"] == 2


def test_remove_duplicate_spans_overlapping_coverage(spark):
    from data_pipeline_framework_spark.functions.dedup import (
        remove_duplicate_spans,
    )

    # doc 2 repeats doc 1's whole 4-token text: every 2-gram window of
    # doc 2 is a duplicate, overlapping spans cover the entire doc
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, "doc_id", "text", n=2).collect()
    }
    assert out[1]["removed_tokens"] == 0
    assert out[2]["clean_text"] == ""
    assert out[2]["removed_tokens"] == 4


def test_shard_manifest_counts_and_merge(spark):
    from pyspark.sql import functions as F

    from data_pipeline_framework_spark.functions.sampling import (
        shard_manifest,
    )

    rows = [
        (1, 0, 10, "aaa"), (2, 0, 20, "bbbb"),
        (3, 1, 5, "cc"), (4, 1, 7, "ddd"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, shard long, n_toks long, text string"
    )
    m = {r["shard"]: r
         for r in shard_manifest(df, "shard", "doc_id", "n_toks",
                                 "text").collect()}
    assert m[0]["n_docs"] == 2 and m[0]["n_tokens"] == 30
    assert m[0]["n_bytes"] == 7
    assert m[0]["min_id"] == 1 and m[0]["max_id"] == 2
    assert m[1]["n_tokens"] == 12

    # fingerprint is order-independent and merges by XOR: manifest of
    # the union == XOR of the partial fingerprints
    half1 = shard_manifest(
        df.filter(F.col("doc_id") == 1), "shard", "doc_id", "n_toks", "text"
    ).collect()[0]["content_fingerprint"]
    half2 = shard_manifest(
        df.filter(F.col("doc_id") == 2), "shard", "doc_id", "n_toks", "text"
    ).collect()[0]["content_fingerprint"]
    assert (half1 ^ half2) == m[0]["content_fingerprint"]


def test_collocation_pmi_hand_checked(spark):
    import math

    from data_pipeline_framework_spark.functions.text import collocation_pmi

    # "new york" appears 3x; unigrams: new=3, york=3, total T1=8;
    # bigrams: T2=5 (doc1 has 4, doc2 has 1)
    df = spark.createDataFrame(
        [(1, "new york new york a"), (2, "new york"), (3, "b")],
        "doc_id long, text string",
    )
    out = {(r["w1"], r["w2"]): r
           for r in collocation_pmi(df, "doc_id", "text",
                                    min_count=3).collect()}
    assert set(out) == {("new", "york")}
    r = out[("new", "york")]
    assert r["pair_count"] == 3
    t1, t2 = 8.0, 5.0
    want = math.log((3 / t2) / ((3 / t1) * (3 / t1)))
    assert abs(r["pmi"] - want) < 1e-12


def test_collocation_pmi_min_count_filters(spark):
    from data_pipeline_framework_spark.functions.text import collocation_pmi

    df = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    assert collocation_pmi(df, "doc_id", "text", min_count=2).count() == 0


def test_curriculum_phases_matches_ntile(spark):
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from data_pipeline_framework_spark.functions.sampling import (
        curriculum_phases,
    )

    rng = random.Random(11)
    rows = [(i, round(rng.random(), 3)) for i in range(137)]
    # inject score ties to exercise the id tiebreak
    rows += [(1000 + i, 0.5) for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, score double")

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    want = {
        r["doc_id"]: r["p"]
        for r in df.withColumn("p", F.ntile(5).over(w)).collect()
    }
    for buckets in (None, 8):
        got = {
            r["doc_id"]: r["phase"]
            for r in curriculum_phases(
                df, "score", "doc_id", n_phases=5, n_buckets=buckets
            ).collect()
        }
        assert got == want, f"n_buckets={buckets}"


def test_curriculum_phases_fewer_rows_than_phases(spark):
    from data_pipeline_framework_spark.functions.sampling import (
        curriculum_phases,
    )

    df = spark.createDataFrame(
        [(1, 0.9), (2, 0.1)], "doc_id long, score double"
    )
    got = sorted(
        (r["doc_id"], r["phase"])
        for r in curriculum_phases(
            df, "score", "doc_id", n_phases=4, n_buckets=4
        ).collect()
    )
    # ntile(4) over 2 rows: phases 1 and 2
    assert got == [(1, 1), (2, 2)]


def test_blocklist_fraction_hand_checked(spark):
    from data_pipeline_framework_spark.functions.text import (
        blocklist_fraction,
    )

    df = spark.createDataFrame(
        [(1, "Bad word bad again fine"), (2, "all clean"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r
           for r in blocklist_fraction(df, "text", ["bad", "worse"]).collect()}
    assert out[1]["blocked_count"] == 2          # case-folded matches
    assert out[1]["blocked_frac"] == pytest.approx(2 / 5)
    assert out[1]["blocked_any"] is True
    assert out[2]["blocked_count"] == 0 and out[2]["blocked_any"] is False
    assert out[3]["blocked_frac"] == 0.0

    with pytest.raises(ValueError):
        blocklist_fraction(df, "text", [])


def test_char_entropy_known_values(spark):
    import math

    from data_pipeline_framework_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaa"),          # zero surprise
            (2, "abab"),          # uniform over 2 chars -> 1 bit
            (3, "abcdefgh"),      # uniform over 8 -> 3 bits
            (4, ""),              # empty doc -> defined as 0
            (5, "aab"),           # -2/3 lg 2/3 - 1/3 lg 1/3
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(df, "doc_id", "text").collect()}
    assert out[1]["entropy_bits"] == pytest.approx(0.0)
    assert out[1]["n_chars"] == 4 and out[1]["distinct_chars"] == 1
    assert out[2]["entropy_bits"] == pytest.approx(1.0)
    assert out[3]["entropy_bits"] == pytest.approx(3.0)
    assert out[4]["entropy_bits"] == 0.0 and out[4]["n_chars"] == 0
    expect5 = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert out[5]["entropy_bits"] == pytest.approx(expect5)


def test_char_entropy_matches_python_reference(spark):
    import math
    from collections import Counter

    from data_pipeline_framework_spark.functions.text import char_entropy

    texts = [
        (1, "The quick brown fox jumps over the lazy dog."),
        (2, "zzzzzzzzzz zz z"),
        (3, "a1b2c3d4e5f6g7h8"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r["doc_id"]: r["entropy_bits"]
           for r in char_entropy(df, "doc_id", "text").collect()}
    for i, t in texts:
        c = Counter(t)
        n = len(t)
        truth = -sum((v / n) * math.log2(v / n) for v in c.values())
        assert out[i] == pytest.approx(truth, abs=1e-12)


def test_centroid_similarity_hand_checked(spark):
    from pyspark.sql import functions as F

    from data_pipeline_framework_spark.functions.similarity import (
        centroid_similarity,
    )

    # seed = {(1,0), (0,1)} -> centroid direction (1,1)
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1),
            (2, [0.0, 1.0], 1),
            (3, [1.0, 1.0], 0),
            (4, [-1.0, -1.0], 0),
            (5, [1.0, -1.0], 0),
        ],
        "vec_id long, v array<double>, label int",
    )
    out = {
        r["vec_id"]: r["centroid_cosine"]
        for r in centroid_similarity(
            df, "vec_id", "v", F.col("label") == 1
        ).collect()
    }
    assert out[3] == pytest.approx(1.0)    # aligned with centroid
    assert out[4] == pytest.approx(-1.0)   # anti-aligned
    assert out[5] == pytest.approx(0.0)    # orthogonal
    assert out[1] == pytest.approx(2 ** -0.5)


def test_centroid_similarity_guards(spark):
    from pyspark.sql import functions as F

    from data_pipeline_framework_spark.functions.similarity import (
        centroid_similarity,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [-1.0, 0.0], 0)],
        "vec_id long, v array<double>, label int",
    )
    with pytest.raises(ValueError, match="no rows"):
        centroid_similarity(df, "vec_id", "v", F.col("label") == 9).collect()
    with pytest.raises(ValueError, match="zero vector"):
        # seeds cancel exactly -> zero centroid
        centroid_similarity(df, "vec_id", "v", F.col("label") == 0)
    empty = df.filter("vec_id > 99")
    with pytest.raises(ValueError, match="empty input"):
        centroid_similarity(empty, "vec_id", "v", F.col("label") == 0)


def test_source_overlap_matrix_hand_checked(spark):
    from data_pipeline_framework_spark.functions.dedup import (
        source_overlap_matrix,
    )

    # s1 and s2 share exactly one trigram; s3 shares nothing
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "s1"),
            (2, "alpha beta gamma other words here", "s2"),
            (3, "completely different text entirely", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    rows = source_overlap_matrix(df, "doc_id", "text", "source").collect()
    out = {(r["source_a"], r["source_b"]): r for r in rows}
    assert set(out) == {("s1", "s2")}          # only the overlapping pair
    r = out[("s1", "s2")]
    # doc1: 2 trigrams, doc2: 4 trigrams, shared: "alpha beta gamma"
    assert r["shared_shingles"] == 1
    assert r["n_a"] == 2 and r["n_b"] == 4
    assert r["jaccard"] == pytest.approx(1 / 5)


def test_source_overlap_matrix_pair_expansion_complete(spark):
    from data_pipeline_framework_spark.functions.dedup import (
        source_overlap_matrix,
    )

    # same text in 4 sources -> all 6 unordered pairs at jaccard 1.0
    df = spark.createDataFrame(
        [(i, "one two three four five", f"s{i}") for i in range(4)],
        "doc_id long, text string, source string",
    )
    rows = source_overlap_matrix(df, "doc_id", "text", "source").collect()
    assert len(rows) == 6
    assert all(r["jaccard"] == pytest.approx(1.0) for r in rows)
    assert all(r["source_a"] < r["source_b"] for r in rows)


def test_winnowing_guarantee_and_shape(spark):
    from data_pipeline_framework_spark.functions.dedup import (
        winnowing_fingerprints,
    )

    k, w = 4, 3
    shared = "the same stolen sentence fragment"
    df = spark.createDataFrame(
        [
            (1, f"left context AAA {shared} right tail one"),
            (2, f"other document BB {shared} different end"),
            (3, "nothing in common with the others at all"),
            (4, "ab"),                       # shorter than k
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r
           for r in winnowing_fingerprints(
               df, "doc_id", "text", k=k, window=w).collect()}
    # guarantee: shared substring of len >= k+w-1 -> >= 1 shared print
    f1, f2, f3 = (set(out[i]["fingerprints"]) for i in (1, 2, 3))
    assert f1 & f2
    assert not (f1 & f3) or len(f1 & f3) < len(f1 & f2)
    # arrays are sorted distinct
    assert out[1]["fingerprints"] == sorted(set(out[1]["fingerprints"]))
    # short doc: zero kgrams, empty set
    assert out[4]["n_kgrams"] == 0 and out[4]["fingerprints"] == []


def test_winnowing_matches_python_reference(spark):
    import hashlib

    from data_pipeline_framework_spark.functions.dedup import (
        winnowing_fingerprints,
    )

    def h52(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)

    def ref(text: str, k: int, w: int):
        norm = " ".join(text.lower().split())
        ng = max(len(norm) - (k - 1), 0)
        if ng == 0:
            return 0, []
        hs = [h52(norm[i:i + k]) for i in range(ng)]
        nw = max(ng - (w - 1), 1)
        mins = {min(hs[j:j + w]) for j in range(nw)}
        return ng, sorted(mins)

    texts = [
        (1, "The quick brown Fox jumps over   the lazy dog"),
        (2, "aaaaaaaaaaaaaaaa"),
        (3, "short"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in winnowing_fingerprints(
               df, "doc_id", "text", k=8, window=4).collect()}
    for i, t in texts:
        ng, fps = ref(t, 8, 4)
        assert out[i]["n_kgrams"] == ng, i
        assert out[i]["fingerprints"] == fps, i


def test_zipf_stats_known_corpus(spark):
    from data_pipeline_framework_spark.functions.text import zipf_stats

    # "a" x4, "b" x2, "c" x1 -> vocab 3, tokens 7, hapax 1/3
    df = spark.createDataFrame(
        [("s", "a a b c"), ("s", "a a b")], "source string, text string"
    )
    row = zipf_stats(df, "text", group_col="source", top_k=3).first()
    assert row["n_tokens"] == 7 and row["vocab_size"] == 3
    assert abs(row["type_token_ratio"] - 3 / 7) < 1e-12
    assert abs(row["hapax_frac"] - 1 / 3) < 1e-12
    # OLS slope of ln(freq) on ln(rank) over (1,4),(2,2),(3,1)
    import math

    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(c) for c in (4, 2, 1)]
    n = 3
    mx, my = sum(xs) / n, sum(ys) / n
    mxy = sum(x * y for x, y in zip(xs, ys)) / n
    mxx = sum(x * x for x in xs) / n
    expect = (mxy - mx * my) / (mxx - mx * mx)
    assert abs(row["zipf_slope"] - expect) < 1e-9
    assert row["zipf_slope"] < 0  # frequency falls with rank


def test_source_divergence_symmetry_and_zero(spark):
    import math

    from data_pipeline_framework_spark.functions.text import (
        source_divergence,
    )

    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z"), ("c", "q q q q")],
        "source string, text string",
    )
    out = {
        (r["source_a"], r["source_b"]): r["js_divergence"]
        for r in source_divergence(df).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    # identical distributions -> JS 0
    assert abs(out[("a", "b")]) < 1e-12
    # disjoint vocabularies -> near the ln(2) ceiling, and symmetric
    assert out[("a", "c")] > 0.2  # smoothing on tiny counts pulls toward uniform
    assert abs(out[("a", "c")] - out[("b", "c")]) < 1e-12
    assert all(v <= math.log(2) + 1e-9 for v in out.values())


def test_source_divergence_single_source_empty(spark):
    from data_pipeline_framework_spark.functions.text import (
        source_divergence,
    )

    df = spark.createDataFrame([("a", "x y")], "source string, text string")
    out = source_divergence(df)
    assert out.count() == 0
    assert out.columns == ["source_a", "source_b", "js_divergence"]


def test_ks_drift_matches_naive_and_properties(spark):
    import math
    import random

    from data_pipeline_framework_spark.functions.profiling import ks_drift

    rng = random.Random(17)
    xs = [rng.gauss(0.0, 1.0) for _ in range(400)]
    ys = [rng.gauss(0.6, 1.3) for _ in range(300)]

    def naive_ks(sa, sb):
        pooled = sorted(set(sa) | set(sb))
        na, nb = len(sa), len(sb)
        best, at = -1.0, None
        for v in pooled:
            d = abs(sum(1 for x in sa if x <= v) / na
                    - sum(1 for x in sb if x <= v) / nb)
            if d > best + 1e-15:
                best, at = d, v
        return best, at

    a = spark.createDataFrame([(x,) for x in xs], "v double")
    b = spark.createDataFrame([(y,) for y in ys], "v double")
    row = ks_drift(a, b, "v", n_buckets=8).first()
    want_d, want_at = naive_ks(xs, ys)
    assert row["ks_stat"] == pytest.approx(want_d, abs=1e-12)
    assert row["at_value"] == pytest.approx(want_at, abs=1e-12)
    assert row["n_a"] == 400 and row["n_b"] == 300
    # asymptotic p-value: replicate the series formula
    ne = 400 * 300 / 700
    lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * row["ks_stat"]
    p = 2 * sum((-1) ** (k - 1) * math.exp(-2 * k * k * lam * lam)
                for k in range(1, 101))
    assert row["p_value"] == pytest.approx(max(0.0, min(1.0, p)), abs=1e-12)
    # strongly shifted samples: confidently rejected
    assert row["p_value"] < 1e-6

    # identical samples -> D = 0, p = 1 (clamped)
    same = ks_drift(a, a, "v").first()
    assert same["ks_stat"] == 0.0 and same["p_value"] == 1.0

    # disjoint supports -> D = 1
    lo = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    hi = spark.createDataFrame(
        [(float(i + 1000),) for i in range(50)], "v double"
    )
    assert ks_drift(lo, hi, "v").first()["ks_stat"] == 1.0


def test_ks_drift_rejects_empty_side(spark):
    from data_pipeline_framework_spark.functions.profiling import ks_drift

    a = spark.createDataFrame([(1.0,)], "v double")
    e = spark.createDataFrame([], "v double")
    with pytest.raises(ValueError):
        ks_drift(a, e, "v")


def test_luhn_pan_scan_textbook_vectors(spark):
    from data_pipeline_framework_spark.operators.cleaning import (
        luhn_pan_scan,
    )

    rows = [
        (1, "pay with 4111 1111 1111 1111 thanks"),   # valid visa
        (2, "card 4111-1111-1111-1112 declined"),     # bad check digit
        (3, "amex 378282246310005 works"),            # valid amex (15)
        (4, "mc 5555555555554444 ok"),                # valid mastercard
        (5, "order 123456789012 too short"),          # 12 digits dropped
        (6, "big 12345678901234567890 run"),          # 20 digits dropped
        (7, "no digits here"),
        (8, "discover 6011111111111117 yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in luhn_pan_scan(df, "text", id_cols=["doc_id"]).collect()
    }
    assert set(out) == {1, 2, 3, 4, 8}  # 5/6/7 produce no candidates
    assert out[1]["luhn_valid"] and out[1]["pan_network"] == "visa"
    assert out[1]["pan_masked"] == "411111******1111"
    assert not out[2]["luhn_valid"]
    assert out[3]["pan_network"] == "amex" and out[3]["pan_len"] == 15
    assert out[3]["pan_masked"] == "378282*****0005"
    assert out[4]["pan_network"] == "mastercard" and out[4]["luhn_valid"]
    assert out[8]["pan_network"] == "discover" and out[8]["luhn_valid"]
    # the raw PAN never appears in the output schema
    assert "pan_masked" in out[1] and "__norm" not in out[1]


def test_ks_drift_split_matches_two_frame_form(spark):
    import random

    from data_pipeline_framework_spark.functions.profiling import (
        ks_drift,
        ks_drift_split,
    )

    rng = random.Random(5)
    rows = [
        (rng.choice(["R", "N", "A"]), rng.gauss(0.0, 1.0))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "flag string, v double")
    two = ks_drift(
        df.filter(F.col("flag") == "R"),
        df.filter(F.col("flag") == "N"),
        "v",
    ).first()
    one = ks_drift_split(
        df, "v", F.col("flag") == "R", "flag = 'N'"
    ).first()
    assert one.asDict() == two.asDict()
    # 'A' rows belong to neither side
    assert one["n_a"] + one["n_b"] < 500


def test_robust_outliers_mad_hand_checked(spark):
    from data_pipeline_framework_spark.functions.profiling import (
        robust_outliers_mad,
    )

    vals = [float(v) for v in range(1, 10)] + [100.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, value double")
    out = robust_outliers_mad(df, "value", threshold=3.5).collect()

    def q50(xs):
        xs = sorted(xs)
        t = (len(xs) - 1) * 0.5
        lo, hi = int(t), -(-t // 1)
        f = t - lo
        return xs[lo] * (1 - f) + xs[int(hi)] * f

    med = q50(vals)
    mad = q50([abs(v - med) for v in vals])
    want = {
        i: abs(v - med) / (1.4826 * mad)
        for i, v in enumerate(vals)
        if abs(v - med) / (1.4826 * mad) > 3.5
    }
    got = {r["id"]: r["robust_z"] for r in out}
    assert set(got) == set(want) == {9}  # only the planted 100.0
    assert got[9] == pytest.approx(want[9], rel=1e-12)

    # constant column: MAD 0 -> no outliers (null score filtered)
    const = spark.createDataFrame([(i, 5.0) for i in range(8)],
                                  "id long, value double")
    assert robust_outliers_mad(const, "value").count() == 0

    # all-null column raises
    nulls = spark.createDataFrame([(1, None)], "id long, value double")
    with pytest.raises(ValueError):
        robust_outliers_mad(nulls, "value")


def test_gini_coefficient_known_values(spark):
    from data_pipeline_framework_spark.functions.profiling import (
        gini_coefficient,
    )

    rows = (
        [("even", 10)] * 5                      # perfectly even -> 0
        + [("conc", 0)] * 4 + [("conc", 100)]   # one holder has all
        + [("mix", v) for v in (1, 2, 3, 4)]
    )
    df = spark.createDataFrame(rows, "g string, x long")
    out = {r["g"]: r for r in
           gini_coefficient(df, "x", group_by=["g"]).collect()}
    assert out["even"]["gini"] == pytest.approx(0.0, abs=1e-12)
    # sample formula: max concentration with n=5 -> (n-1)/n = 0.8
    assert out["conc"]["gini"] == pytest.approx(0.8, abs=1e-12)
    # hand: x=(1,2,3,4): G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    assert out["mix"]["gini"] == pytest.approx(0.25, abs=1e-12)
    assert out["mix"]["n"] == 4 and out["mix"]["total"] == 10

    # the negative guard rides the aggregation pass (no extra scan),
    # so it surfaces at ACTION time as a Spark error, not eagerly
    neg = spark.createDataFrame([("a", -1)], "g string, x long")
    with pytest.raises(Exception, match="negative values"):
        gini_coefficient(neg, "x", group_by=["g"]).collect()


def test_gini_coefficient_excludes_nulls(spark):
    from data_pipeline_framework_spark.functions.profiling import (
        gini_coefficient,
    )

    # [null, 10, 10] must behave exactly like [10, 10]: gini 0, n 2.
    # (Ranking nulls first would inflate the non-null ranks: the old
    # bug yielded 0.333 here.)
    df = spark.createDataFrame(
        [("a", None), ("a", 10), ("a", 10)], "g string, x long"
    )
    row = gini_coefficient(df, "x", group_by=["g"]).collect()[0]
    assert row["n"] == 2 and row["total"] == 20
    assert row["gini"] == pytest.approx(0.0, abs=1e-12)
    # ungrouped path: same sample semantics
    urow = gini_coefficient(df.select("x"), "x").collect()[0]
    assert urow["n"] == 2 and urow["total"] == 20
    assert urow["gini"] == pytest.approx(0.0, abs=1e-12)


def test_gini_ungrouped_distributed(spark):
    """The ungrouped kernel must (a) equal the windowed per-group
    formula, (b) contain NO single-partition window — every
    windowspecdefinition in its optimized plan is partitioned by the
    bucket column."""
    import random

    from data_pipeline_framework_spark.functions.profiling import (
        gini_coefficient,
    )

    rng = random.Random(7)
    vals = [rng.randrange(0, 500) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")

    plans: list = []
    row = gini_coefficient(df, "x", _debug_plans=plans).collect()[0]

    # oracle: exact sample formula in Python over the sorted values
    s = sorted(vals)
    n, total = len(s), sum(s)
    si2 = 2 * sum((i + 1) * v for i, v in enumerate(s))
    want = float(si2) / (float(n) * float(total)) - (n + 1.0) / n
    assert row["n"] == n and row["total"] == total
    assert row["gini"] == pytest.approx(want, abs=1e-15)

    # plan assert: the rank window is per-BUCKET, never global
    assert plans, "debug plan not captured"
    plan = plans[0]
    assert "windowspecdefinition" in plan
    for frag in plan.split("windowspecdefinition(")[1:]:
        assert frag.lstrip().startswith("__b"), (
            "found a window not partitioned by __b:\n" + plan
        )

    # degenerate: ties-only input and negative rejection
    const = spark.createDataFrame([(5,)] * 10, "x long")
    crow = gini_coefficient(const, "x").collect()[0]
    assert crow["gini"] == pytest.approx(0.0, abs=1e-15)
    neg = spark.createDataFrame([(-1,), (2,)], "x long")
    with pytest.raises(ValueError, match="negative values"):
        gini_coefficient(neg, "x")
    empty = spark.createDataFrame([], "x long")
    erow = gini_coefficient(empty, "x").collect()[0]
    assert erow["n"] == 0 and erow["gini"] == 0.0


def test_language_consistency_flags_mixed_docs(spark):
    """segment-level votes: a clean English doc reads 0 disagreement, a
    half-English/half-German doc reads ~0.5 mixed_frac, a doc with no
    scorable segments still appears as 'unknown'."""
    from data_pipeline_framework_spark.functions.text import (
        language_consistency,
    )

    en = "the cat sat on the mat and it was good. it is a fine day for the team."
    de = "der hund und die katze sind nicht hier. das ist ein und der und die tag."
    rows = [
        (1, en),                              # pure en: two en segments
        (2, en + " " + de),                   # mixed: en + de segments
        (3, "zzz qqq. xx!"),                  # nothing scorable
        (4, None),                            # null text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           language_consistency(df, "doc_id", "text").collect()}
    assert len(out) == 4
    assert out[1]["majority_lang"] == "en" and out[1]["n_disagree"] == 0
    assert out[1]["mixed_frac"] == 0.0
    assert out[2]["n_segments"] >= 2 and out[2]["n_disagree"] >= 1
    assert 0.0 < out[2]["mixed_frac"] <= 0.5
    assert out[3]["majority_lang"] == "unknown"
    assert out[3]["n_segments"] == 0 and out[3]["mixed_frac"] is None
    assert out[4]["majority_lang"] == "unknown"


def test_priority_sample_exact_and_mergeable(spark):
    """bottom-k by seeded hash == a python md5 reference (exact size,
    deterministic under repartitioning), and the semilattice property
    holds: bottom-k of shard-wise bottom-k's == global bottom-k."""
    import hashlib

    from data_pipeline_framework_spark.functions.sampling import (
        priority_sample,
    )

    rows = [(i, f"src{i % 3}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def ref_pri(i, seed="s0"):
        return int(hashlib.md5(f"{seed}{i}".encode()).hexdigest()[:13], 16)

    want = sorted(range(500), key=lambda i: (ref_pri(i), i))[:32]
    got = priority_sample(df.repartition(7), "doc_id", 32).collect()
    assert [r["doc_id"] for r in got] == want or {
        r["doc_id"] for r in got
    } == set(want)
    assert all(r["priority"] == ref_pri(r["doc_id"]) for r in got)

    # k > n keeps everything; k <= 0 rejected
    assert priority_sample(df, "doc_id", 10_000).count() == 500
    import pytest as _pytest
    with _pytest.raises(ValueError):
        priority_sample(df, "doc_id", 0)

    # mergeable: union of two shards' bottom-32 -> bottom-32 == global
    a = priority_sample(df.filter("doc_id < 250"), "doc_id", 32)
    b = priority_sample(df.filter("doc_id >= 250"), "doc_id", 32)
    merged = priority_sample(
        a.drop("priority").unionByName(b.drop("priority")), "doc_id", 32
    ).collect()
    assert sorted(r["doc_id"] for r in merged) == sorted(want)

    # plan: TakeOrderedAndProject, not a global sort
    plan = (
        priority_sample(df, "doc_id", 32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan

    # NULL ids are excluded, not sorted-first winners (ADVICE r8): a
    # NULL id hashes to a NULL priority which asc() would rank ahead of
    # every real row — the sample must stay the same uniform k-subset.
    with_nulls = df.unionByName(
        spark.createDataFrame(
            [(None, "junk")] * 40, "doc_id long, source string"
        )
    )
    got_n = priority_sample(with_nulls, "doc_id", 32).collect()
    assert sorted(r["doc_id"] for r in got_n) == sorted(want)
    assert all(r["doc_id"] is not None for r in got_n)


def test_priority_sample_stream_matches_batch(spark, tmp_path):
    """the streaming twin's state after N micro-batches == the batch
    operator over the first N batches' union, row-for-row; replays and
    re-delivered batches fold nothing twice."""
    from data_pipeline_framework_spark import streaming as ST
    from data_pipeline_framework_spark.functions.sampling import (
        priority_sample,
    )

    schema = "doc_id long, source string"
    batches = [
        [(i, f"src{i % 3}") for i in range(100)],
        [(i, f"src{i % 3}") for i in range(100, 160)],
        [(i, f"src{i % 3}") for i in range(160, 300)],
    ]
    in_dir = tmp_path / "in"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(str(in_dir))

    state = str(tmp_path / "sample_state")
    fn = ST.priority_sample_batch_fn("doc_id", 25, state, seed="s1")
    sdf = ST.read_stream_files(
        spark, str(in_dir),
        schema=spark.createDataFrame([], schema).schema,
        max_files_per_trigger=1,
    )
    q = (
        sdf.writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    corpus = spark.createDataFrame(
        [r for rows in batches for r in rows], schema
    )
    want = sorted(
        tuple(r) for r in
        priority_sample(corpus, "doc_id", 25, seed="s1").collect()
    )
    got = sorted(
        tuple(r) for r in ST.priority_sample_state(spark, state).collect()
    )
    assert got == want

    # checkpointed replay: no new files, state unchanged
    q2 = (
        sdf.writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sorted(
        tuple(r) for r in ST.priority_sample_state(spark, state).collect()
    ) == want

    # re-delivered batch (crash between sink and checkpoint commit):
    # the commit marker skips the fold
    fn(spark.createDataFrame(batches[1], schema), 1)
    assert sorted(
        tuple(r) for r in ST.priority_sample_state(spark, state).collect()
    ) == want
