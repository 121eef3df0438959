"""Parquet table maintenance: keyed merge, compaction, health stats."""

from __future__ import annotations

import pytest

from data_pipeline_framework_spark.sinks.maintenance import (
    compact_parquet,
    merge_parquet,
    table_stats,
)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, f"u{i}", float(i)) for i in range(100)],
        "id long, name string, score double",
    ).repartition(20).write.parquet(path)
    return path


def test_merge_parquet_updates_and_inserts(spark, table):
    updates = spark.createDataFrame(
        [(5, "five", 555.0), (200, "new", 2.0)],
        "id long, name string, score double",
    )
    meta = merge_parquet(spark, table, updates, keys=["id"])
    assert meta["merged_keys"] == ["id"]
    got = {r["id"]: (r["name"], r["score"])
           for r in spark.read.parquet(table).collect()}
    assert len(got) == 101          # 100 originals, 1 replaced, 1 new
    assert got[5] == ("five", 555.0)   # updated in place
    assert got[200] == ("new", 2.0)    # inserted
    assert got[6] == ("u6", 6.0)       # untouched rows survive


def test_merge_parquet_rejects_missing_columns(spark, table):
    bad = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="missing columns"):
        merge_parquet(spark, table, bad, keys=["id"])


def test_compact_parquet_preserves_data(spark, table):
    before = table_stats(spark, table)
    assert before["n_files"] == 20
    rows_before = sorted(
        tuple(r) for r in spark.read.parquet(table).collect()
    )
    meta = compact_parquet(spark, table, target_file_mb=128)
    assert meta["files_after"] == 1   # tiny table -> one file
    after = table_stats(spark, table)
    assert after["n_files"] == 1
    assert sorted(tuple(r) for r in spark.read.parquet(table).collect()) \
        == rows_before
    assert after["small_file_ratio"] == 1.0  # still < 16 MB, honestly small


def test_write_training_shards_bounded_files(spark, tmp_path):
    from pathlib import Path

    from data_pipeline_framework_spark.sinks.writers import (
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1000)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    write_training_shards(
        df, out, max_records_per_file=100, shard_partitions=2,
        order_by=["doc_id"],
    )
    files = [p for p in Path(out).glob("*.json") if p.stat().st_size > 0]
    # 2 partitions x 500 rows, capped at 100 records/file -> >= 10 files
    assert len(files) >= 10
    for f in files:
        assert sum(1 for _ in open(f)) <= 100
    assert spark.read.json(out).count() == 1000


def test_merge_parquet_partitioned_layout(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(60)],
        "id long, bucket int, score double",
    ).write.partitionBy("bucket").parquet(path)
    updates = spark.createDataFrame(
        [(7, 1, 700.0), (100, 2, 1.0)], "id long, bucket int, score double"
    )
    merge_parquet(spark, path, updates, keys=["id"], partition_by=["bucket"])
    from pathlib import Path

    # hive layout survives the rewrite
    assert sorted(
        p.name for p in Path(path).iterdir() if p.name.startswith("bucket=")
    ) == ["bucket=0", "bucket=1", "bucket=2"]
    got = {r["id"]: r["score"] for r in spark.read.parquet(path).collect()}
    assert len(got) == 61 and got[7] == 700.0 and got[100] == 1.0


def test_scd2_merge_full_lifecycle(spark, tmp_path):
    """SCD2 history semantics: bootstrap, change closes the old
    version, identical update is a no-op, a no-op followed by a real
    change in ONE batch still records the change, and multi-update
    chains get back-to-back validity windows."""
    import datetime as dt

    from data_pipeline_framework_spark.sinks.maintenance import scd2_merge

    path = str(tmp_path / "dim_customer")
    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731

    def hist():
        rows = spark.read.parquet(path).collect()
        return sorted(
            (r["id"], r["city"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in rows
        )

    # bootstrap
    u1 = spark.createDataFrame(
        [(1, "berlin", t(1)), (2, "paris", t(1))],
        "id long, city string, eff timestamp",
    )
    scd2_merge(spark, path, u1, ["id"], "eff")
    assert hist() == [
        (1, "berlin", t(1), None, True),
        (2, "paris", t(1), None, True),
    ]

    # change for key 1 closes the old version; no-op for key 2
    u2 = spark.createDataFrame(
        [(1, "munich", t(5)), (2, "paris", t(5))],
        "id long, city string, eff timestamp",
    )
    scd2_merge(spark, path, u2, ["id"], "eff")
    assert hist() == [
        (1, "berlin", t(1), t(5), False),
        (1, "munich", t(5), None, True),
        (2, "paris", t(1), None, True),
    ]

    # one batch: no-op at t6 THEN a real change at t7, plus a brand-new
    # key with two distinct versions -> back-to-back windows
    u3 = spark.createDataFrame(
        [(1, "munich", t(6)), (1, "hamburg", t(7)),
         (3, "rome", t(6)), (3, "milan", t(8))],
        "id long, city string, eff timestamp",
    )
    scd2_merge(spark, path, u3, ["id"], "eff")
    assert hist() == [
        (1, "berlin", t(1), t(5), False),
        (1, "hamburg", t(7), None, True),
        (1, "munich", t(5), t(7), False),   # the t6 no-op left no trace
        (2, "paris", t(1), None, True),
        (3, "milan", t(8), None, True),
        (3, "rome", t(6), t(8), False),
    ]

    # untouched keys (2) never re-chained; closed rows pass through
    with pytest.raises(ValueError):
        scd2_merge(
            spark, path,
            spark.createDataFrame([(9,)], "id long"),
            ["id"], "eff",
        )


def test_scd2_merge_random_batches_match_reference(spark, tmp_path):
    """randomized differential: arbitrary update batches applied through
    scd2_merge must produce exactly the history a sequential reference
    state machine produces (same chain, same windows, same no-op
    suppression) — regardless of how updates split across batches."""
    import datetime as dt
    import random

    from data_pipeline_framework_spark.sinks.maintenance import scd2_merge

    for seed in (3, 11, 42):
        rng = random.Random(seed)
        path = str(tmp_path / f"dim_{seed}")
        # unique effective day per key across the whole test: equal
        # (key, eff) pairs across batches are documented-ambiguous
        days = {k: rng.sample(range(1, 29), 12) for k in (1, 2, 3)}
        ptr = {k: 0 for k in days}
        model: dict = {}  # key -> list of (city, eff) kept versions

        def ref_merge(batch):
            by_key: dict = {}
            for k, city, eff in batch:
                by_key.setdefault(k, []).append((city, eff))
            for k, ups in by_key.items():
                # at-once semantics: the key's full surviving version
                # list merges with the batch and re-deduplicates
                seq = sorted(model.get(k, []) + ups, key=lambda t: t[1])
                out = []
                for city, eff in seq:
                    if out and out[-1][0] == city:
                        continue
                    out.append((city, eff))
                model[k] = out

        def expected():
            rows = []
            for k, versions in model.items():
                for i, (city, eff) in enumerate(versions):
                    nxt = versions[i + 1][1] if i + 1 < len(versions) else None
                    rows.append((
                        k, city, dt.datetime(2024, 1, eff),
                        dt.datetime(2024, 1, nxt) if nxt else None,
                        nxt is None,
                    ))
            return sorted(rows)

        for _ in range(4):
            batch = []
            for k in (1, 2, 3):
                for _ in range(rng.randrange(0, 3)):
                    city = rng.choice(["w", "x", "y", "z"])
                    eff = days[k][ptr[k]]
                    ptr[k] += 1
                    batch.append((k, city, eff))
            if not batch:
                batch = [(1, "w", days[1][ptr[1]])]
                ptr[1] += 1
            df = spark.createDataFrame(
                [(k, c, dt.datetime(2024, 1, e)) for k, c, e in batch],
                "id long, city string, eff timestamp",
            )
            scd2_merge(spark, path, df, ["id"], "eff")
            ref_merge(batch)
            got = sorted(
                (r["id"], r["city"], r["valid_from"], r["valid_to"],
                 r["is_current"])
                for r in spark.read.parquet(path).collect()
            )
            assert got == expected(), f"seed={seed}"
            # windows never overlap per key, exactly one open version
            per_key: dict = {}
            for row in got:
                per_key.setdefault(row[0], []).append(row)
            for vs in per_key.values():
                vs.sort(key=lambda r: r[2])
                assert sum(1 for r in vs if r[4]) == 1
                for a, b in zip(vs, vs[1:]):
                    assert a[3] == b[2]  # contiguous, non-overlapping
            # replaying the same batch is a no-op (idempotent merge)
            scd2_merge(spark, path, df, ["id"], "eff")
            again = sorted(
                (r["id"], r["city"], r["valid_from"], r["valid_to"],
                 r["is_current"])
                for r in spark.read.parquet(path).collect()
            )
            assert again == got, f"seed={seed} replay"


def test_scd2_merge_same_effective_correction(spark, tmp_path):
    """an update at a stored version's exact effective timestamp
    REPLACES that version deterministically (re-statement), never a
    partition-dependent coin flip."""
    import datetime as dt

    from data_pipeline_framework_spark.sinks.maintenance import scd2_merge

    path = str(tmp_path / "dim_fix")
    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    scd2_merge(
        spark, path,
        spark.createDataFrame(
            [(1, "berlin", t(1)), (1, "munich", t(5))],
            "id long, city string, eff timestamp",
        ),
        ["id"], "eff",
    )
    # correction: key 1 at t5 was actually hamburg
    scd2_merge(
        spark, path,
        spark.createDataFrame(
            [(1, "hamburg", t(5))], "id long, city string, eff timestamp"
        ),
        ["id"], "eff",
    )
    got = sorted(
        (r["city"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in spark.read.parquet(path).collect()
    )
    assert got == [
        ("berlin", t(1), t(5), False),
        ("hamburg", t(5), None, True),
    ]


def test_scd2_plan_empty_compare_cols_raises(spark):
    """payload consisting only of keys + effective_col leaves nothing
    to compare — same_as_prev would degenerate to lit(True) and every
    later version would be silently suppressed; must refuse instead."""
    import datetime as dt

    from data_pipeline_framework_spark.sinks.maintenance import scd2_plan

    ups = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "id long, eff timestamp"
    )
    with pytest.raises(ValueError, match="no attribute columns"):
        scd2_plan(None, ups, ["id"], "eff")


def test_scd2_plan_broadcast_gated_by_batch_size(spark, tmp_path):
    """the update batch's key set broadcasts only for small batches:
    above broadcast_key_limit the hint is dropped so a huge backfill
    can't blow the executor broadcast budget. Plan-asserted both ways
    with auto-broadcast disabled so only the explicit hint can produce
    a BroadcastHashJoin."""
    import datetime as dt

    from data_pipeline_framework_spark.sinks.maintenance import (
        scd2_merge,
        scd2_plan,
    )

    path = str(tmp_path / "dim_bcast")
    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    scd2_merge(
        spark, path,
        spark.createDataFrame(
            [(i, f"c{i}", t(1)) for i in range(50)],
            "id long, city string, eff timestamp",
        ),
        ["id"], "eff",
    )
    hist = spark.read.parquet(path)
    ups = spark.createDataFrame(
        [(i, f"n{i}", t(5)) for i in range(50)],
        "id long, city string, eff timestamp",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = scd2_plan(hist, ups, ["id"], "eff")
        plan_small = small._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_small

        big = scd2_plan(
            hist, ups, ["id"], "eff", broadcast_key_limit=10
        )
        plan_big = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_big
        # and the gated plan still produces the identical history
        a = sorted(map(tuple, small.collect()))
        b = sorted(map(tuple, big.collect()))
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
