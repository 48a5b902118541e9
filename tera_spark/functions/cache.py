"""Cache-lifetime plumbing for lazily-returned operators.

Several operators persist an intermediate that BOTH branches of the
returned plan read (e.g. a fingerprint table feeding two sides of a
self-join). They cannot unpersist before returning — the caller has not
run the plan yet — so, left alone, each call pins cached partitions in
a long-lived session until LRU eviction (train_kmeans, which collects
internally, is the only shape that can unpersist inline).

`tie_cache_lifetime(result, *persisted)` releases the persisted
intermediates when the RESULT DataFrame is garbage-collected: in the
common run-collect-drop cycle (the query registry, the correctness
driver, any batch job) the executor memory is returned the moment the
caller drops the result, while a caller that holds onto the result for
re-use keeps the cache warm. `release_cached(result)` releases
deterministically without waiting for GC (tests, explicit pipelines).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_FINALIZERS: "weakref.WeakKeyDictionary[DataFrame, weakref.finalize]" = (
    weakref.WeakKeyDictionary()
)


def tie_cache_lifetime(result: DataFrame, *persisted: DataFrame) -> DataFrame:
    """Unpersist each DataFrame in ``persisted`` once ``result`` is
    garbage-collected (or released explicitly via `release_cached`).
    Returns ``result`` unchanged. Unpersisting is always safe in Spark
    — dropped blocks recompute — so a mid-plan release can cost time,
    never correctness."""
    deps = list(persisted)

    def _release() -> None:
        for d in deps:
            try:
                d.unpersist()
            except Exception:
                pass  # session already stopped / JVM gone

    # the closure must not capture `result`, or it would never be GC'd
    _FINALIZERS[result] = weakref.finalize(result, _release)
    return result


def release_cached(result: DataFrame) -> None:
    """Deterministically release the persisted intermediates tied to
    ``result`` by `tie_cache_lifetime`. Idempotent; a no-op for
    DataFrames with no tied cache."""
    fin = _FINALIZERS.pop(result, None)
    if fin is not None:
        fin()
