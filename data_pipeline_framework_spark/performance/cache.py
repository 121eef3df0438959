"""Hierarchical DataFrame cache: executor memory over shared parquet.

Mirrors the reference's HierarchicalCache (performance/cache.py:98-688:
MemoryCache -> DiskCache tiers with TTL, LRU eviction, promotion,
hit/miss stats, a ``cached`` decorator and ``cache_key`` helper) —
re-based on what caching means in Spark:

- the reference caches PICKLED PYTHON VALUES on the driver box; at
  100 TB the valuable cache entries are DATAFRAMES, and a driver pickle
  of one is either impossible or a collect-the-world anti-pattern;
- L1 here is ``DataFrame.persist(MEMORY_AND_DISK)`` — blocks live on
  the EXECUTORS, sized to the cluster, evicted by Spark's own block
  manager under pressure;
- L2 is a parquet materialization under a shared cache dir — it
  survives the session, every executor scan-reads it in parallel, and
  downstream plans get column pruning/pushdown against it (a pickle
  gives back an opaque blob);
- promotion on an L2 hit re-persists into L1, the same tier walk as
  the reference's ``_promote_to_higher_levels``.

TTL, LRU eviction (entry-count and byte budgets), invalidation,
per-tier hit/miss stats, and the decorator/key helpers keep the
reference's surface.
"""

from __future__ import annotations

import hashlib
import json
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

__all__ = ["DataFrameCache", "cache_key", "cached_dataframe"]


def cache_key(*args, **kwargs) -> str:
    """Stable key from the arguments' reprs (reference cache_key,
    performance/cache.py:691-699)."""
    payload = repr((args, sorted(kwargs.items())))
    return hashlib.md5(payload.encode()).hexdigest()


class DataFrameCache:
    """Two-tier get/set/get_or_compute cache for DataFrames.

    ``max_entries`` / ``max_bytes`` bound the L2 parquet footprint via
    LRU eviction (last-hit order); ``default_ttl`` seconds expire
    entries lazily at read time. All bookkeeping is driver-side file
    metadata — no Spark jobs beyond the materializing write and the
    cache-hit reads themselves.
    """

    def __init__(
        self,
        spark: SparkSession,
        cache_dir: str,
        max_entries: int = 64,
        max_bytes: int | None = None,
        default_ttl: float | None = None,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    ):
        self._spark = spark
        self._dir = Path(cache_dir)
        self._dir.mkdir(parents=True, exist_ok=True)
        self._max_entries = int(max_entries)
        self._max_bytes = max_bytes
        self._default_ttl = default_ttl
        self._level = storage_level
        self._l1: dict[str, DataFrame] = {}
        self.stats = {
            "l1_hits": 0, "l2_hits": 0, "misses": 0,
            "evictions": 0, "expirations": 0,
        }

    # -- paths & metadata --------------------------------------------

    def _entry_dir(self, key: str) -> Path:
        safe = hashlib.md5(key.encode()).hexdigest()
        return self._dir / safe

    def _meta_path(self, key: str) -> Path:
        return self._entry_dir(key).with_suffix(".meta.json")

    def _read_meta(self, key: str) -> dict | None:
        p = self._meta_path(key)
        try:
            return json.loads(p.read_text())
        except (OSError, ValueError):
            return None

    def _expired(self, meta: dict) -> bool:
        ttl = meta.get("ttl")
        return ttl is not None and time.time() > meta["created"] + ttl

    def _touch(self, key: str, meta: dict) -> None:
        meta["last_hit"] = time.time()
        self._meta_path(key).write_text(json.dumps(meta))

    # -- core API -----------------------------------------------------

    def set(self, key: str, df: DataFrame,
            ttl: float | None = None) -> DataFrame:
        """Materialize ``df`` into L2 parquet and persist the cached
        read into L1; returns the cached DataFrame (read back from
        parquet, so every consumer shares one scan plan)."""
        path = self._entry_dir(key)
        df.write.mode("overwrite").parquet(str(path))
        size = sum(
            f.stat().st_size for f in path.rglob("*") if f.is_file()
        )
        now = time.time()
        self._meta_path(key).write_text(json.dumps({
            "key": key,
            "created": now,
            "last_hit": now,
            "ttl": ttl if ttl is not None else self._default_ttl,
            "bytes": size,
        }))
        cached = self._spark.read.parquet(str(path)).persist(self._level)
        self._drop_l1(key)
        self._l1[key] = cached
        self._evict_if_needed(exclude=key)
        return cached

    def get(self, key: str) -> DataFrame | None:
        meta = self._read_meta(key)
        if meta is None:
            self.stats["misses"] += 1
            return None
        if self._expired(meta):
            self.delete(key)
            self.stats["expirations"] += 1
            self.stats["misses"] += 1
            return None
        if key in self._l1:
            self.stats["l1_hits"] += 1
            self._touch(key, meta)
            return self._l1[key]
        # L2 hit: promote back into executor memory
        self.stats["l2_hits"] += 1
        self._touch(key, meta)
        cached = self._spark.read.parquet(
            str(self._entry_dir(key))
        ).persist(self._level)
        self._l1[key] = cached
        return cached

    def get_or_compute(self, key: str, compute,
                       ttl: float | None = None) -> DataFrame:
        hit = self.get(key)
        if hit is not None:
            return hit
        return self.set(key, compute(), ttl=ttl)

    def exists(self, key: str) -> bool:
        meta = self._read_meta(key)
        return meta is not None and not self._expired(meta)

    def delete(self, key: str) -> bool:
        self._drop_l1(key)
        existed = False
        p = self._entry_dir(key)
        if p.exists():
            shutil.rmtree(p, ignore_errors=True)
            existed = True
        self._meta_path(key).unlink(missing_ok=True)
        return existed

    def clear(self) -> None:
        for key in self.keys():
            self.delete(key)

    def keys(self) -> list[str]:
        out = []
        for meta_file in self._dir.glob("*.meta.json"):
            try:
                out.append(json.loads(meta_file.read_text())["key"])
            except (OSError, ValueError, KeyError):
                continue
        return out

    def get_stats(self) -> dict:
        metas = [m for k in self.keys() if (m := self._read_meta(k))]
        return {
            **self.stats,
            "entries": len(metas),
            "bytes": sum(m.get("bytes", 0) for m in metas),
            "l1_entries": len(self._l1),
        }

    # -- internals ----------------------------------------------------

    def _drop_l1(self, key: str) -> None:
        old = self._l1.pop(key, None)
        if old is not None:
            try:
                old.unpersist()
            except Exception:
                pass  # session may already be gone

    def _evict_if_needed(self, exclude: str | None = None) -> None:
        metas = {k: m for k in self.keys() if (m := self._read_meta(k))}

        def lru_order():
            return sorted(
                (k for k in metas if k != exclude),
                key=lambda k: metas[k].get("last_hit", 0),
            )

        while len(metas) > self._max_entries:
            victims = lru_order()
            if not victims:
                break
            v = victims[0]
            self.delete(v)
            metas.pop(v)
            self.stats["evictions"] += 1
        if self._max_bytes is not None:
            while sum(m.get("bytes", 0) for m in metas.values()) \
                    > self._max_bytes:
                victims = lru_order()
                if not victims:
                    break
                v = victims[0]
                self.delete(v)
                metas.pop(v)
                self.stats["evictions"] += 1


def cached_dataframe(cache: DataFrameCache, ttl: float | None = None):
    """Decorator: memoize a DataFrame-producing function by argument
    key (reference ``cached``, performance/cache.py:702-731)."""
    def decorator(fn):
        def wrapper(*args, **kwargs):
            key = f"{fn.__module__}.{fn.__qualname__}:" \
                  f"{cache_key(*args, **kwargs)}"
            return cache.get_or_compute(
                key, lambda: fn(*args, **kwargs), ttl=ttl
            )

        wrapper.__name__ = fn.__name__
        wrapper.__doc__ = fn.__doc__
        return wrapper

    return decorator
