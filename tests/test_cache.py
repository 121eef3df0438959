"""Hierarchical DataFrame cache: tier walk (L1 -> L2 -> compute),
promotion, TTL expiry, LRU count/byte eviction, invalidation, stats,
and the decorator — all against real parquet materializations."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from data_pipeline_framework_spark.performance import (
    DataFrameCache,
    cache_key,
    cached_dataframe,
)


def _df(spark, n=100, tag=0):
    return spark.range(n).select(
        F.col("id"), (F.col("id") * 2 + tag).alias("v")
    )


def test_get_or_compute_tier_walk(spark, tmp_path):
    cache = DataFrameCache(spark, str(tmp_path / "c"))
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return _df(spark)

    a = cache.get_or_compute("k", compute)
    assert a.count() == 100 and calls["n"] == 1
    b = cache.get_or_compute("k", compute)   # L1 hit
    assert b.count() == 100 and calls["n"] == 1
    assert cache.stats["l1_hits"] == 1
    # simulate a fresh session's empty L1: L2 must serve and promote
    cache._l1.clear()
    c = cache.get_or_compute("k", compute)
    assert c.count() == 100 and calls["n"] == 1
    assert cache.stats["l2_hits"] == 1
    assert "k" in cache._l1  # promoted back


def test_cached_values_survive_recomputation_drift(spark, tmp_path):
    """the cache returns what was SET, not what the function would
    return now — that's the point of a cache."""
    cache = DataFrameCache(spark, str(tmp_path / "c"))
    cache.set("k", _df(spark, tag=0))
    drifted = cache.get_or_compute("k", lambda: _df(spark, tag=999))
    assert drifted.agg(F.sum("v")).first()[0] == sum(2 * i for i in range(100))


def test_ttl_expiry(spark, tmp_path):
    cache = DataFrameCache(spark, str(tmp_path / "c"))
    cache.set("k", _df(spark), ttl=3600.0)
    assert cache.exists("k")
    # age the entry on disk instead of sleeping past a short TTL:
    # expiry is evaluated lazily at read time from the meta file, so
    # rewriting `created` is exactly the state a real expiry leaves —
    # and a loaded machine can't stretch set()+exists() past the TTL
    # (a 2 s TTL flaked under a concurrent full-gate run)
    meta = json.loads(cache._meta_path("k").read_text())
    meta["created"] -= 3601.0
    cache._meta_path("k").write_text(json.dumps(meta))
    assert not cache.exists("k")
    assert cache.get("k") is None
    assert cache.stats["expirations"] == 1


def test_lru_entry_eviction(spark, tmp_path):
    cache = DataFrameCache(spark, str(tmp_path / "c"), max_entries=2)
    cache.set("a", _df(spark, 10))
    time.sleep(0.02)
    cache.set("b", _df(spark, 10))
    time.sleep(0.02)
    assert cache.get("a") is not None  # refresh a: b becomes LRU
    time.sleep(0.02)
    cache.set("c", _df(spark, 10))     # evicts b
    assert sorted(cache.keys()) == ["a", "c"]
    assert cache.stats["evictions"] == 1
    assert cache.get("b") is None


def test_byte_budget_eviction(spark, tmp_path):
    cache = DataFrameCache(
        spark, str(tmp_path / "c"), max_entries=100, max_bytes=1
    )
    cache.set("a", _df(spark, 10))
    time.sleep(0.02)
    cache.set("b", _df(spark, 10))  # budget of 1 byte: a must go
    assert cache.keys() == ["b"]
    assert cache.stats["evictions"] >= 1


def test_delete_and_clear(spark, tmp_path):
    cache = DataFrameCache(spark, str(tmp_path / "c"))
    cache.set("a", _df(spark, 10))
    cache.set("b", _df(spark, 10))
    assert cache.delete("a") is True
    assert cache.delete("a") is False
    cache.clear()
    assert cache.keys() == []
    assert cache.get_stats()["entries"] == 0


def test_stats_shape(spark, tmp_path):
    cache = DataFrameCache(spark, str(tmp_path / "c"))
    cache.set("a", _df(spark, 10))
    cache.get("a")
    cache.get("nope")
    s = cache.get_stats()
    assert s["entries"] == 1 and s["bytes"] > 0
    assert s["l1_hits"] == 1 and s["misses"] == 1


def test_cache_key_stability():
    assert cache_key(1, "x", flag=True) == cache_key(1, "x", flag=True)
    assert cache_key(1) != cache_key(2)
    assert cache_key(a=1, b=2) == cache_key(b=2, a=1)  # kwarg order


def test_decorator_memoizes_by_args(spark, tmp_path):
    cache = DataFrameCache(spark, str(tmp_path / "c"))
    calls = {"n": 0}

    @cached_dataframe(cache)
    def load(n):
        calls["n"] += 1
        return _df(spark, n)

    assert load(10).count() == 10
    assert load(10).count() == 10
    assert calls["n"] == 1
    assert load(20).count() == 20   # different args -> new entry
    assert calls["n"] == 2
