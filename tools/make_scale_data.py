"""Materialize a 10x scale-stress dataset from sf0.1 (synthetic "sf1").

The driver container only ships sf0.001/0.01/0.1; the 100x scaling story
needs a measured point, so this replicates every fact table K times with
consistent key offsets (orderkey shifts match between orders and
lineitem, custkey between customer and orders, etc. — join fan-outs stay
exactly TPC-H-shaped instead of multiplying). Dimension-style tables
(region, nation) stay fixed, like TPC-H. Document text gets a per-copy
salt token and embeddings a per-copy epsilon so the copies are near- but
not exact duplicates (near-dup workloads see realistic candidates, not a
degenerate 45-pairs-per-doc explosion of identical rows).

Usage: python tools/make_scale_data.py [out_dir] [K]
Default: /tmp/spark_graft_sf1, K=10. Pure DuckDB; ~170 MB output.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# per-table key shifts: column -> stride (max_key+1 at sf0.1)
SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t, shifts in SHIFTS.items():
        cols = [
            r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if c in shifts:
                sel.append(f"{c} + i * {shifts[c]} AS {c}")
            elif t == "customer" and c == "c_name":
                # entity names must track the shifted key, or every name
                # appears K times and fuzzy/entity workloads see a fake
                # K^2 match explosion
                sel.append(
                    "'Customer#' || lpad(CAST(c_custkey + i * "
                    f"{SHIFTS['customer']['c_custkey']} AS VARCHAR), 9, '0')"
                    " AS c_name"
                )
            elif t == "supplier" and c == "s_name":
                sel.append(
                    "'Supplier#' || lpad(CAST(s_suppkey + i * "
                    f"{SHIFTS['supplier']['s_suppkey']} AS VARCHAR), 9, '0')"
                    " AS s_name"
                )
            elif t == "documents" and c == "text":
                # copy i = every token suffixed with the copy id — an
                # INJECTIVE per-copy token renaming, the text analog of
                # the embedding rotation: within-copy shingle sets map
                # bijectively to copy 0's, so every within-copy Jaccard
                # (and the true near-dup pair set) is preserved
                # EXACTLY per copy, while cross-copy shingle overlap is
                # zero. True pairs grow K-fold like a real corpus. The
                # previous single-salt-token suffix left copies mutual
                # near-dups (~K-cliques): minhash at K=100 spent 301 s
                # verifying a quadratic TRUE pair set — measuring the
                # construction, not the engine.
                sel.append(
                    "CASE WHEN i = 0 THEN text "
                    "ELSE regexp_replace(text, '(\\S+)', "
                    "'\\1c' || CAST(i AS VARCHAR), 'g') END AS text"
                )
            elif t == "embeddings" and c == "embedding":
                # copy i = the vector CIRCULARLY ROTATED by 7*i dims.
                # Rotation is a permutation (orthogonal), so every
                # within-copy pairwise cosine — and therefore the true
                # near-dup pair set — is preserved exactly per copy,
                # while cross-copy cosines of 64-dim gaussians drop to
                # ~N(0, 1/8) noise, far below the 0.35 thresholds. True
                # pairs grow K-fold (linear, like a real corpus with a
                # constant dup rate). The previous epsilon-shift made
                # every copy a near-dup of its original, a 45-pairs-
                # per-vector clique growing K^2-fold that measured the
                # CONSTRUCTION, not the engine (round-5 verdict item 2).
                sel.append(
                    "list_concat(embedding[(i * 7) % 64 + 1 : 64], "
                    "embedding[1 : (i * 7) % 64]) AS embedding"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{SRC}/{t}.parquet'), "
            f"(SELECT unnest(range({k})) AS i) "
            f"ORDER BY {list(shifts)[0]}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote {out} (K={k})")


if __name__ == "__main__":
    main()
