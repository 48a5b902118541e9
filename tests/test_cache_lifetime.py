"""tie_cache_lifetime: operator-internal persists are released when the
returned DataFrame is dropped (GC) or released explicitly — the fix for
repeated calls pinning cached partitions in a long-lived session."""

from __future__ import annotations

import gc

from pyspark import StorageLevel
from pyspark.sql import functions as F


def _is_cached(df) -> bool:
    return df.storageLevel != StorageLevel.NONE


def test_release_on_gc(spark):
    from tera_spark.functions.cache import tie_cache_lifetime

    dep = spark.range(100).persist()
    out = tie_cache_lifetime(dep.select((F.col("id") * 2).alias("x")), dep)
    assert out.count() == 100
    assert _is_cached(dep)
    del out
    gc.collect()
    assert not _is_cached(dep)


def test_release_explicit_and_idempotent(spark):
    from tera_spark.functions.cache import release_cached, tie_cache_lifetime

    dep = spark.range(10).persist()
    out = tie_cache_lifetime(dep.select("id"), dep)
    release_cached(out)
    assert not _is_cached(dep)
    release_cached(out)  # idempotent
    release_cached(dep.select("id"))  # untied df: no-op


def test_operators_release_their_persists(spark):
    """End-to-end: verified_near_duplicates' fingerprint persist (and
    the candidate stage's signature persist) are gone once the result
    is consumed and dropped."""
    from tera_spark.operators.dedup import verified_near_duplicates

    sc = spark.sparkContext
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + str(i % 3)) for i in range(30)],
        "doc_id long, text string",
    )
    out = verified_near_duplicates(docs, threshold=0.5)
    out.count()
    n_before = len([r for r in sc._jsc.sc().getRDDStorageInfo()])
    assert n_before >= 1  # the self-join persists are live while held
    del out
    gc.collect()
    assert len([r for r in sc._jsc.sc().getRDDStorageInfo()]) == 0
