"""Driver/JVM boundary round-trip reduction (optimization guide §4).

PySpark classic mode talks to the JVM over py4j, one synchronous socket
round trip per command. Two fixed costs tax EVERY DataFrame/Column/
functions call and therefore every plan the engine builds — measured at
~0.4-0.6 ms per round trip on this box, hundreds of trips per query plan,
~0.2 s of pure driver latency per query before any job runs:

1. **Call-site capture** (`pyspark.errors.utils.with_origin`): each
   public API call performs ~8 extra round trips (getActiveSession,
   a conf.get, PySparkCurrentOrigin.set/clear with their reflection
   lookups) plus a Python-side stack walk, purely to enrich error
   messages with the user's call site. PySpark gates this behind the
   documented conf ``spark.python.sql.dataFrameDebugging.enabled``
   ("Providing DataFrame debugging options to reduce performance
   slowdown" — pyspark/errors/utils.py); `get_spark` sets it to false.
   Query semantics are untouched — only error-message enrichment.

2. **Uncached JVM reflection**: `pyspark.sql.functions` resolves
   ``org.apache.spark.sql.functions.<name>`` with TWO py4j reflection
   commands on every single call (`_get_jvm_function` does a fresh
   ``getattr(getattr(jvm, class), name)``; py4j caches neither). The
   resolved ``JavaMember`` is a stateless (class, method) handle that
   py4j users routinely hold on to — `install_jvm_function_cache`
   memoizes it per (SparkContext, function name), dropping e.g.
   ``F.col`` from 4 round trips to 1 and compound expressions
   proportionally.

Both are pure driver-latency wins: the constructed Column objects, the
logical plans, and every result are bit-identical.
"""

from __future__ import annotations

from typing import Any, Callable
from weakref import WeakKeyDictionary

# Per-SparkContext memo of resolved org.apache.spark.sql.functions
# members. Keyed weakly so a stopped/replaced context releases its
# handles; a JavaMember is only reachable through its context's gateway,
# so entries can never outlive the JVM connection they belong to.
_FN_CACHE: "WeakKeyDictionary[Any, dict[str, Callable]]" = WeakKeyDictionary()


def install_jvm_function_cache() -> None:
    """Memoize ``_get_jvm_function`` lookups (idempotent)."""
    import pyspark.sql.functions.builtin as _builtin

    if getattr(_builtin._get_jvm_function, "_dpf_cached", False):
        return
    original = _builtin._get_jvm_function

    def cached(name: str, sc: Any) -> Callable:
        try:
            per_ctx = _FN_CACHE.get(sc)
            if per_ctx is None:
                per_ctx = {}
                _FN_CACHE[sc] = per_ctx
        except TypeError:  # un-weakref-able context stand-in
            return original(name, sc)
        fn = per_ctx.get(name)
        if fn is None:
            fn = original(name, sc)
            per_ctx[name] = fn
        return fn

    cached._dpf_cached = True  # type: ignore[attr-defined]
    _builtin._get_jvm_function = cached
