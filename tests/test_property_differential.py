"""Property-based differential testing: random op-DSL programs are
compiled by the engine AND mechanically translated to SQL run on DuckDB
over the same rows; results must agree exactly.

The reference has no randomized or differential oracle anywhere in its
test suite (SURVEY §5 'Absent'); this closes that gap for the compiler's
relational core (filter / calculate / aggregate), where a translation bug
would silently corrupt every downstream pipeline.

Integer-only data keeps the comparison exact (no float-rounding
tolerance); nulls are generated in both the group key and the value
columns to exercise null-group and null-skipping agg semantics.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from data_pipeline_framework_spark.plans.compiler import compile_ops


# --- data strategy: small integer tables with nulls --------------------

_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),   # g
        st.one_of(st.none(), st.integers(-100, 100)),             # v
        st.integers(-50, 50),                                     # u
    ),
    min_size=1,
    max_size=30,
)

_cmp_op = st.sampled_from([">", "<", ">=", "<=", "==", "!="])
_agg_fns = st.lists(
    st.sampled_from(["sum", "min", "max", "count"]),
    min_size=1, max_size=3, unique=True,
)

_filter_step = st.tuples(
    st.just("filter"), _cmp_op, st.integers(-60, 60)
)
_calc_step = st.tuples(
    st.just("calculate"),
    st.sampled_from(["v + u", "u * 2", "v - u", "abs(u)"]),
    st.just(None),
)
_programs = st.tuples(
    st.lists(st.one_of(_filter_step, _calc_step), max_size=3),
    _agg_fns,
)

_SQL_CMP = {"==": "=", "!=": "<>"}


def _to_sql(steps, agg_fns) -> str:
    q = "SELECT g, v, u FROM t"
    n_calc = 0
    for kind, a, b in steps:
        if kind == "filter":
            q = f"SELECT * FROM ({q}) WHERE v {_SQL_CMP.get(a, a)} {b}"
        else:
            n_calc += 1
            q = f"SELECT *, {a} AS c{n_calc} FROM ({q})"
    aggs = ", ".join(
        f"CAST({fn.upper()}(v) AS BIGINT) AS v_{fn}" for fn in agg_fns
    )
    return f"SELECT g, {aggs} FROM ({q}) GROUP BY g"


def _to_ops(steps, agg_fns) -> list[dict]:
    ops: list[dict] = []
    n_calc = 0
    for kind, a, b in steps:
        if kind == "filter":
            ops.append({
                "type": "filter",
                "params": {"column": "v", "operator": a, "value": b},
            })
        else:
            n_calc += 1
            ops.append({
                "type": "transform",
                "params": {"transformations": [{
                    "type": "calculate",
                    "column": f"c{n_calc}",
                    "expression": a,
                }]},
            })
    ops.append({
        "type": "aggregate",
        "params": {"group_by": ["g"], "aggregations": {"v": list(agg_fns)}},
    })
    return ops


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for r in pdf[cols].itertuples(index=False):
        out.append(tuple(
            None if pd.isna(x) else int(x) if not isinstance(x, str) else x
            for x in r
        ))
    return sorted(out, key=lambda t: tuple((x is None, x) for x in t))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_rows, program=_programs)
def test_compiler_matches_duckdb(spark, rows, program):
    steps, agg_fns = program
    pdf = pd.DataFrame(rows, columns=["g", "v", "u"]).astype(
        {"v": "Int64", "u": "int64"}
    )
    sdf = spark.createDataFrame(
        [(g, int(v) if v is not None else None, int(u)) for g, v, u in rows],
        "g string, v long, u long",
    )
    got = compile_ops(_to_ops(steps, agg_fns))(sdf).toPandas()

    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(_to_sql(steps, agg_fns)).df()
    con.close()

    assert _canon(got) == _canon(want)


# --- join differential: every `how`, null keys, duplicate keys ----------

_jrows_l = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 5)),   # k
        st.integers(0, 99),                        # x
    ),
    min_size=0, max_size=12,
)
_jrows_r = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 5)),   # k
        st.integers(100, 199),                     # y
    ),
    min_size=0, max_size=12,
)
_join_how = st.sampled_from(
    ["inner", "left", "right", "full", "left_semi", "left_anti"]
)

_JOIN_SQL = {
    "inner": "SELECT k, x, y FROM l JOIN r USING (k)",
    "left": "SELECT k, x, y FROM l LEFT JOIN r USING (k)",
    "right": "SELECT k, x, y FROM l RIGHT JOIN r USING (k)",
    "full": "SELECT k, x, y FROM l FULL JOIN r USING (k)",
    "left_semi": "SELECT k, x FROM l SEMI JOIN r USING (k)",
    "left_anti": "SELECT k, x FROM l ANTI JOIN r USING (k)",
}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(lrows=_jrows_l, rrows=_jrows_r, how=_join_how)
def test_join_op_matches_duckdb(spark, lrows, rrows, how):
    """The join op must agree with DuckDB for every join type, including
    null-key rows (never match; kept by left/full/anti, dropped by
    inner/semi) and duplicate keys (cross products). `on`-list joins
    coalesce the key column exactly like SQL USING."""
    sdf_l = spark.createDataFrame(lrows, "k long, x long")
    sdf_r = spark.createDataFrame(rrows, "k long, y long")
    ops = [{
        "type": "join",
        "params": {"right": sdf_r, "on": "k", "how": how},
    }]
    got = compile_ops(ops)(sdf_l).toPandas()

    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["k", "x"]).astype(
        {"k": "Int64", "x": "int64"}
    ))
    con.register("r", pd.DataFrame(rrows, columns=["k", "y"]).astype(
        {"k": "Int64", "y": "int64"}
    ))
    want = con.execute(_JOIN_SQL[how]).df()
    con.close()

    assert _canon(got) == _canon(want)


# --- window-function differential --------------------------------------

_wrows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b"])),        # g
        st.one_of(st.none(), st.integers(-100, 100)),             # v
    ),
    min_size=1,
    max_size=25,
)

_wfn = st.sampled_from([
    "row_number", "rank", "dense_rank", "lag", "lead",
    "running_sum", "moving_sum",
])

_W_SQL = {
    "row_number": "row_number() OVER w",
    "rank": "rank() OVER w",
    "dense_rank": "dense_rank() OVER w",
    "lag": "lag(v, 1) OVER w",
    "lead": "lead(v, 1) OVER w",
    "running_sum": "CAST(sum(v) OVER (PARTITION BY g ORDER BY u "
                   "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                   "AS BIGINT)",
    "moving_sum": "CAST(sum(v) OVER (PARTITION BY g ORDER BY u "
                  "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)",
}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_wrows, fn=_wfn)
def test_window_functions_match_duckdb(spark, rows, fn):
    from data_pipeline_framework_spark.operators.window_ops import (
        apply_window_function,
    )

    data = [(g, v, i) for i, (g, v) in enumerate(rows)]  # u: unique order key
    sdf = spark.createDataFrame(data, "g string, v long, u long")
    kw = {"partition_by": ["g"], "order_by": ["u"], "new_column": "out"}
    if fn in ("row_number", "rank", "dense_rank"):
        out = apply_window_function(sdf, fn, **kw)
    elif fn in ("lag", "lead"):
        out = apply_window_function(sdf, fn, column="v", offset=1, **kw)
    elif fn == "running_sum":
        out = apply_window_function(sdf, "running_sum", column="v", **kw)
    else:
        out = apply_window_function(
            sdf, "sum", column="v", rows_between=(-2, 0), **kw
        )
    got = _canon(out.select("g", "v", "u", "out").toPandas())

    con = duckdb.connect()
    con.register("t", pd.DataFrame(data, columns=["g", "v", "u"]))
    sql = (
        f"SELECT g, v, u, {_W_SQL[fn]} AS out FROM t "
        "WINDOW w AS (PARTITION BY g ORDER BY u)"
    )
    want = _canon(con.sql(sql).df())
    con.close()
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    lrows=_rows,
    rrows=_rows,
    op=st.sampled_from(["intersect", "exceptAll", "intersectAll", "unionByName"]),
)
def test_set_ops_match_duckdb(spark, lrows, rrows, op):
    """Multiset semantics of intersect/except/union against DuckDB —
    including NULL rows, duplicate rows, and empty sides."""
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(g, int(v) if v is not None else None, int(u)) for g, v, u in rows],
        "g string, v long, u long",
    )
    l, r = mk(lrows), mk(rrows)
    got = getattr(l, op)(r).toPandas()

    con = duckdb.connect()
    lp = pd.DataFrame(lrows, columns=["g", "v", "u"]).astype(
        {"v": "Int64", "u": "int64"})
    rp = pd.DataFrame(rrows, columns=["g", "v", "u"]).astype(
        {"v": "Int64", "u": "int64"})
    con.register("l", lp)
    con.register("r", rp)
    sql = {
        "intersect": "SELECT * FROM l INTERSECT SELECT * FROM r",
        "intersectAll": "SELECT * FROM l INTERSECT ALL SELECT * FROM r",
        "exceptAll": "SELECT * FROM l EXCEPT ALL SELECT * FROM r",
        "unionByName": "SELECT * FROM l UNION ALL SELECT g, v, u FROM r",
    }[op]
    want = con.execute(sql).df()
    assert _canon(got) == _canon(want), op


# --- as-of join differential -------------------------------------------

# unique (uid, ts) per side avoids tie-order ambiguity, which DuckDB and
# pandas leave implementation-defined
def _asof_side(n_max):
    return st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 60), st.integers(-9, 9)),
        min_size=1, max_size=n_max,
        unique_by=lambda t: (t[0], t[1]),
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    lrows=_asof_side(12),
    rrows=_asof_side(12),
    direction=st.sampled_from(["backward", "forward"]),
)
def test_asof_join_matches_duckdb(spark, lrows, rrows, direction):
    """asof_join must agree with DuckDB's native ASOF LEFT JOIN on random
    keyed series, both directions, including left rows with no match
    (NULL-extended)."""
    from data_pipeline_framework_spark.operators.joins import asof_join

    l = spark.createDataFrame(lrows, "uid long, ts long, lv long")
    r = spark.createDataFrame(rrows, "uid long, ts long, rv long")
    got = asof_join(l, r, on="ts", by=["uid"], direction=direction).toPandas()

    cmp = "l.ts >= r.ts" if direction == "backward" else "l.ts <= r.ts"
    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["uid", "ts", "lv"]))
    con.register("r", pd.DataFrame(rrows, columns=["uid", "ts", "rv"]))
    want = con.execute(
        f"""
        SELECT l.uid, l.ts, l.lv, r.rv AS rv, r.ts AS ts_right
        FROM l ASOF LEFT JOIN r ON l.uid = r.uid AND {cmp}
        """
    ).df()
    con.close()
    assert _canon(got) == _canon(want)


# ---- chunking / packing vs pure-Python references -------------------------

_doc_texts = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "zz"]),
        min_size=0, max_size=40,
    ).map(" ".join),
    min_size=1, max_size=6,
)
_win_stride = st.tuples(st.integers(2, 8), st.integers(1, 8))


def _py_chunks(text: str, window: int, stride: int):
    toks = [t for t in text.split() if t]
    if not toks:
        return []
    n = len(toks)
    n_chunks = 1 if n <= window else -((n - window) // -stride) + 1
    out = []
    for c in range(n_chunks):
        piece = toks[c * stride:c * stride + window]
        if piece:  # stride > window can step past short docs: no empty chunk
            out.append((c, len(piece), " ".join(piece)))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=_doc_texts, ws=_win_stride)
def test_chunk_documents_matches_python_reference(spark, texts, ws):
    from data_pipeline_framework_spark.functions.text import chunk_documents

    window, stride = ws
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, "doc_id", "text", window, stride)
        .collect()
    )
    want = sorted(
        (i, c, n, t)
        for i, text in enumerate(texts)
        for c, n, t in _py_chunks(text, window, stride)
    )
    assert got == want


def _py_pack(texts: list[str], L: int):
    out = []
    start = 0
    for i, text in enumerate(texts):
        toks = [t for t in text.split() if t]
        if not toks:
            continue
        n = len(toks)
        for ctx in range(start // L, (start + n - 1) // L + 1):
            lo = max(ctx * L - start, 0)
            hi = min((ctx + 1) * L - start, n)
            out.append((ctx, i, max(start - ctx * L, 0), hi - lo,
                        " ".join(toks[lo:hi])))
        start += n
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=_doc_texts, L=st.integers(2, 16))
def test_pack_contexts_matches_python_reference(spark, texts, L):
    from data_pipeline_framework_spark.functions.sampling import (
        pack_contexts,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r["context_id"], r["doc_id"], r["ctx_offset"], r["n_tokens"],
         r["piece_text"])
        for r in pack_contexts(df, "doc_id", "text", context_len=L)
        .collect()
    )
    assert got == sorted(_py_pack(texts, L))


# --- hamming_hash_pairs: pigeonhole completeness -------------------------

_hashes = st.lists(
    st.integers(0, (1 << 56) - 1), min_size=2, max_size=24, unique=True
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(hs=_hashes, max_h=st.integers(1, 4))
def test_hamming_hash_pairs_matches_bruteforce(spark, hs, max_h):
    """The banded-bucket join must find EXACTLY the brute-force Hamming
    pairs: completeness is the pigeonhole guarantee (n_blocks =
    max_hamming+1 contiguous blocks -> any pair within max_hamming
    shares at least one block verbatim), soundness is the exact
    bit_count(xor) verify."""
    from data_pipeline_framework_spark.functions.dedup import (
        hamming_hash_pairs,
    )

    df = spark.createDataFrame(
        list(enumerate(hs)), "id long, h long"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_hash_pairs(
            df, "id", "h", bits=56, max_hamming=max_h
        ).collect()
    )
    want = sorted(
        (i, j, bin(hs[i] ^ hs[j]).count("1"))
        for i in range(len(hs))
        for j in range(i + 1, len(hs))
        if bin(hs[i] ^ hs[j]).count("1") <= max_h
    )
    assert got == want


def test_hamming_hash_pairs_narrow_bits_block_layout(spark):
    """Parameter combos where a uniform ceil-width layout would push a
    whole block past `bits` (bits=10, max_hamming=8 -> 9 blocks) must
    still be complete AND non-degenerate: the floor-edge layout keeps
    every block inside [0, bits). Degenerate requests raise."""
    import pytest as _pytest

    from data_pipeline_framework_spark.functions.dedup import (
        hamming_hash_pairs,
    )

    hs = [0b0000000000, 0b1111111111, 0b0000001111, 0b1010101010]
    df = spark.createDataFrame(list(enumerate(hs)), "id long, h long")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_hash_pairs(
            df, "id", "h", bits=10, max_hamming=8
        ).collect()
    )
    want = sorted(
        (i, j, bin(hs[i] ^ hs[j]).count("1"))
        for i in range(len(hs))
        for j in range(i + 1, len(hs))
        if bin(hs[i] ^ hs[j]).count("1") <= 8
    )
    assert got == want

    with _pytest.raises(ValueError, match="max_hamming"):
        hamming_hash_pairs(df, "id", "h", bits=10, max_hamming=10)
    with _pytest.raises(ValueError, match="pigeonhole"):
        hamming_hash_pairs(
            df, "id", "h", bits=10, max_hamming=4, n_blocks=3
        )


# --- round-5 operators: differential properties --------------------------

_ols_rows = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.integers(-30, 30),
        st.integers(-30, 30),
    ),
    min_size=2,
    max_size=25,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_ols_rows)
def test_grouped_ols_matches_numpy(spark, rows):
    """closed-form moment sums must agree with numpy's lstsq line fit
    on every group with n >= 2 and nonzero x-variance; degenerate
    groups yield NULLs."""
    import numpy as np

    from data_pipeline_framework_spark.operators.features import (
        grouped_ols,
    )

    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in grouped_ols(df, ["g"], "x", "y").collect()}
    by_g: dict = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, pts in by_g.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        r = got[g]
        assert r["n"] == len(pts)
        if len(pts) < 2 or np.var(xs) == 0:
            assert r["slope"] is None
            continue
        slope, intercept = np.polyfit(xs, ys, 1)
        assert r["slope"] == pytest.approx(slope, rel=1e-9, abs=1e-9)
        assert r["intercept"] == pytest.approx(
            intercept, rel=1e-9, abs=1e-9
        )
        if np.var(ys) > 0:
            rr = np.corrcoef(xs, ys)[0, 1] ** 2
            assert r["r2"] == pytest.approx(rr, rel=1e-9, abs=1e-9)


_batch_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(0, 600)),
    min_size=1, max_size=40, unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_batch_rows, budget=st.integers(1, 1500))
def test_pack_length_batches_invariants(spark, rows, budget):
    """every row lands in exactly one batch; every batch fits the
    pad-to-max budget or is a singleton; per-batch stats agree with a
    direct recomputation."""
    from data_pipeline_framework_spark.functions.sampling import (
        pack_length_batches,
    )

    df = spark.createDataFrame(rows, "id long, n long")
    out = pack_length_batches(
        df, "id", "n", batch_tokens=budget, n_shards=3
    ).collect()
    assert sorted(r["id"] for r in out) == sorted(t[0] for t in rows)
    groups: dict = {}
    for r in out:
        groups.setdefault(
            (r["len_bucket"], r["shard"], r["batch"]), []
        ).append(r)
    for members in groups.values():
        mx = max(max(m["n"], 1) for m in members)
        tot = sum(max(m["n"], 1) for m in members)
        k = len(members)
        assert k * mx <= budget or k == 1
        assert all(m["batch_max_len"] == mx for m in members)
        assert all(m["batch_n_docs"] == k for m in members)
        assert members[0]["padding_frac"] == pytest.approx(
            1.0 - tot / (k * mx)
        )


_set_rows = st.lists(
    st.lists(st.integers(0, 8), max_size=6),
    min_size=2, max_size=12,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(sets=_set_rows, thr=st.sampled_from([0.3, 0.5, 0.8]))
def test_set_similarity_matches_bruteforce(spark, sets, thr):
    """uncut candidate generation + exact verify must equal the
    brute-force all-pairs Jaccard at any threshold."""
    from data_pipeline_framework_spark.functions.dedup import (
        set_similarity_pairs,
    )

    rows = [(i, s) for i, s in enumerate(sets)]
    df = spark.createDataFrame(rows, "id long, s array<long>")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in set_similarity_pairs(
            df, "id", "s", threshold=thr, max_df=None
        ).collect()
    }
    want = {}
    for i, a in enumerate(sets):
        for j in range(i + 1, len(sets)):
            sa, sb = set(a), set(sets[j])
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if jac >= thr:
                want[(i, j)] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50),
                  st.one_of(st.none(), st.integers(-5, 5))),
        min_size=1, max_size=20,
    ),
    seed=st.integers(0, 10),
)
def test_dataset_fingerprint_permutation_invariant(spark, rows, seed):
    """any permutation/partitioning of the same multiset of rows yields
    the identical fingerprint; appending one extra row changes it."""
    import random as _random

    from data_pipeline_framework_spark.functions.profiling import (
        dataset_fingerprint,
    )

    df = spark.createDataFrame(rows, "a long, b long")
    base = dataset_fingerprint(df).collect()[0]
    perm = list(rows)
    _random.Random(seed).shuffle(perm)
    pdf = spark.createDataFrame(perm, "a long, b long").repartition(5)
    again = dataset_fingerprint(pdf).collect()[0]
    assert tuple(base) == tuple(again)
    more = dataset_fingerprint(
        spark.createDataFrame(rows + [(999, 999)], "a long, b long")
    ).collect()[0]
    assert more["content_xor"] != base["content_xor"] or (
        # XOR self-cancellation: adding a row identical to an existing
        # one flips its hash OUT; (999,999) is outside the generator
        # domain so this branch never triggers — kept as documentation
        False
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    vals=st.lists(
        st.integers(0, 40),  # small domain forces heavy ties
        min_size=1, max_size=120,
    ),
    probs=st.lists(
        st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
        min_size=1, max_size=4, unique=True,
    ),
)
def test_hist_percentiles_match_sorted_reference(spark, vals, probs):
    """histogram-bracketed exact selection == the classic sorted-list
    interpolation, on tie-heavy random integer data, INCLUDING when a
    tiny collect_cap forces the refinement rounds."""
    import math

    from data_pipeline_framework_spark.functions.profiling import (
        _exact_percentiles_hist,
    )

    df = spark.createDataFrame([(v,) for v in vals], "x long")
    meta = {"x": (len(vals), float(min(vals)), float(max(vals)))}
    got = _exact_percentiles_hist(
        df, ["x"], sorted(probs), meta, n_bins=8, collect_cap=16,
        max_rounds=4,
    )["x"]
    s = sorted(float(v) for v in vals)
    for p, g in zip(sorted(probs), got):
        t = (len(s) - 1) * p
        lo, hi = int(math.floor(t)), int(math.ceil(t))
        frac = t - lo
        want = s[lo] if lo == hi else s[lo] * (1 - frac) + s[hi] * frac
        assert g == pytest.approx(want, abs=0.0), (p, vals)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    vals=st.lists(st.integers(0, 30), min_size=1, max_size=80),
)
def test_ungrouped_gini_matches_sorted_reference(spark, vals):
    """the distributed ungrouped Gini (bucketed prefix offsets, decimal
    moment sums) == the textbook sorted-sample formula, exactly."""
    from data_pipeline_framework_spark.functions.profiling import (
        gini_coefficient,
    )

    df = spark.createDataFrame([(v,) for v in vals], "x long")
    row = gini_coefficient(df, "x", n_buckets=4).collect()[0]
    s = sorted(vals)
    n, total = len(s), sum(s)
    assert row["n"] == n and row["total"] == total
    if total == 0:
        assert row["gini"] == 0.0
    else:
        si2 = 2 * sum((i + 1) * v for i, v in enumerate(s))
        want = float(si2) / (float(n) * float(total)) - (n + 1.0) / n
        assert row["gini"] == pytest.approx(want, abs=0.0), vals


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", None]), st.integers(0, 30)
        ),
        min_size=1,
        max_size=80,
    ),
)
def test_grouped_gini_bucketed_kernel_matches_window_path(spark, rows):
    """the size-dispatched bucketed grouped kernel (max_window_group=0)
    == the rank-window path, bit-for-bit on integral data — including
    NULL group keys (a plain equi-join in the bucketed kernel silently
    dropped the NULL-key group; ADVICE r8 high)."""
    from data_pipeline_framework_spark.functions.profiling import (
        gini_coefficient,
    )

    df = spark.createDataFrame(rows, "g string, x long")
    win = {
        r["g"]: (r["n"], r["total"], r["gini"])
        for r in gini_coefficient(
            df, "x", group_by=["g"], max_window_group=float("inf")
        ).collect()
    }
    bkt = {
        r["g"]: (r["n"], r["total"], r["gini"])
        for r in gini_coefficient(
            df, "x", group_by=["g"], n_buckets=4, max_window_group=0
        ).collect()
    }
    assert win == bkt, rows


def test_grouped_gini_skew_dispatch_avoids_group_window(spark):
    """one group holding ~all rows must dispatch to the bucketed kernel
    (no rank window sorting a whole group in one task) and still return
    the window path's exact values (VERDICT r7 task 2)."""
    from data_pipeline_framework_spark.functions.profiling import (
        gini_coefficient,
    )

    rows = [("big", i % 97) for i in range(30_000)] + [
        ("tiny", v) for v in (1, 5, 9)
    ]
    df = spark.createDataFrame(rows, "g string, x long")
    plans: list = []
    got = gini_coefficient(
        df, "x", group_by=["g"], max_window_group=10_000,
        _debug_plans=plans,
    )
    res = {r["g"]: r for r in got.collect()}
    # dispatch fired: the bucketed kernel appended its plan, and no
    # rank window (row_number over the full group) appears anywhere
    assert plans and "row_number" not in plans[-1]
    for spec in [
        ln for ln in plans[-1].splitlines() if "windowspecdefinition" in ln
    ]:
        assert "__b" in spec  # every window is bucket-scoped or <=n_buckets
    want = {
        r["g"]: r
        for r in gini_coefficient(
            df, "x", group_by=["g"], max_window_group=float("inf")
        ).collect()
    }
    for g in ("big", "tiny"):
        assert res[g]["n"] == want[g]["n"]
        assert res[g]["total"] == want[g]["total"]
        assert res[g]["gini"] == want[g]["gini"]  # exact, not approx

    # negative guard still fires on the bucketed path, at action time
    neg = spark.createDataFrame(
        [("a", -1), ("a", 3)] + [("a", 1)] * 50, "g string, x long"
    )
    with pytest.raises(Exception, match="negative"):
        gini_coefficient(
            neg, "x", group_by=["g"], max_window_group=0
        ).collect()


def test_grouped_gini_bucketed_keeps_null_key_group(spark):
    """ADVICE r8 high: the bucketed kernel's (group, bucket) join must
    be null-SAFE — a NULL group key (common in corpus metadata like
    'source') must produce the same row the rank-window path emits, not
    vanish. Pinned exactly against the window path, incl. multi-key."""
    from data_pipeline_framework_spark.functions.profiling import (
        gini_coefficient,
    )

    rows = (
        [(None, i % 13) for i in range(200)]
        + [("a", v) for v in (2, 7, 7, 30)]
        + [(None, 30)]
    )
    df = spark.createDataFrame(rows, "g string, x long")
    win = {
        r["g"]: (r["n"], r["total"], r["gini"])
        for r in gini_coefficient(
            df, "x", group_by=["g"], max_window_group=float("inf")
        ).collect()
    }
    bkt = {
        r["g"]: (r["n"], r["total"], r["gini"])
        for r in gini_coefficient(
            df, "x", group_by=["g"], n_buckets=4, max_window_group=0
        ).collect()
    }
    assert None in bkt and bkt == win

    # multi-key: NULL in one of two keys, and NULL in both
    rows2 = (
        [(None, "x", i % 7) for i in range(40)]
        + [("s", None, v) for v in (1, 4, 9)]
        + [(None, None, v) for v in (5, 5, 6)]
        + [("s", "x", 8)]
    )
    df2 = spark.createDataFrame(rows2, "g string, h string, x long")
    win2 = {
        (r["g"], r["h"]): (r["n"], r["total"], r["gini"])
        for r in gini_coefficient(
            df2, "x", group_by=["g", "h"],
            max_window_group=float("inf"),
        ).collect()
    }
    bkt2 = {
        (r["g"], r["h"]): (r["n"], r["total"], r["gini"])
        for r in gini_coefficient(
            df2, "x", group_by=["g", "h"], n_buckets=4,
            max_window_group=0,
        ).collect()
    }
    assert bkt2 == win2 and len(bkt2) == 4
