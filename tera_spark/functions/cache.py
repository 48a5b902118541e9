"""Cache-scope plumbing for lazily-returned operators.

Several operators persist an intermediate that BOTH branches of the
returned plan read (e.g. a fingerprint table feeding two sides of a
self-join). They cannot unpersist before returning — the caller has
not run the plan yet — so in a long-lived session repeated calls pin
cached partitions until Spark's own LRU eviction reclaims them
(persist() defaults to MEMORY_AND_DISK, so the pressure valve is
eviction-to-disk first, recompute last).

A GC-finalizer design (release when the returned DataFrame is
collected by the garbage collector) was tried in round 5 and REVERTED:
Python wrapper lifetime is the wrong signal. Query wrappers routinely
re-project the returned DataFrame (`op(...).select(...)`), the tied
wrapper dies at function exit, and the cache is dropped BEFORE or
DURING execution — the compiled plan keeps its InMemoryTableScan and
recomputes the child subtree per consuming partition (measured 0.6 s →
98 s on dedup_lsh_verified at sf0.1).

The sound contract is explicit: operators accept ``scope=`` and
register their persists there; a caller that wants deterministic
release wraps the RUN (not the build) in the scope:

    with CacheScope(spark) as scope:
        pairs = verified_near_duplicates(docs, scope=scope)
        pairs.count()          # run while caches are live
    # scope exit: every registered intermediate unpersisted

Without a scope, behavior is the long-standing default: cached until
session LRU eviction (correct, occasionally memory-hungry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CacheScope:
    """Collects the persisted intermediates of operator calls so the
    caller can release them after consuming the results. Re-entrant
    safe; release is idempotent."""

    def __init__(self, spark=None):
        self._dfs: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        df = df.persist()
        self._dfs.append(df)
        return df

    def release(self) -> None:
        while self._dfs:
            try:
                self._dfs.pop().unpersist()
            except Exception:
                pass  # session already stopped / JVM gone

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def persist_in_scope(df: DataFrame, scope: CacheScope | None) -> DataFrame:
    """persist() that registers with ``scope`` when one is given; plain
    session-LRU-managed persist otherwise."""
    if scope is not None:
        return scope.persist(df)
    return df.persist()


def materialize(df: DataFrame, storage: str | None, scope: CacheScope | None) -> DataFrame:
    """Share one derivation across plan branches, by cache or by storage.

    ``storage=None`` is the persist path (single-node friendly:
    MEMORY_AND_DISK, but the cached partitions live in the executor —
    in local mode, the DRIVER — heap until evicted). With a path, the
    intermediate is WRITTEN to Parquet and read back: the deployment
    shape for corpus-scale intermediates (a 5M-doc MinHash fingerprint
    table needed a 64 GB driver heap cached; storage-backed it runs at
    the default 16 GB, SCALE.md §11). Every consumer then scans
    storage with column pruning instead of a heap-pinned
    InMemoryRelation; the write itself is the materialization barrier,
    so the upstream pipeline still runs exactly once."""
    if storage is None:
        return persist_in_scope(df, scope)
    if _materialize_observer is not None:
        _materialize_observer(df)
    # zstd for the shared intermediates only: measured equal-or-faster
    # than snappy on the storage-mode dedup row both A/B trials and
    # ~3.7× smaller — fingerprint/signature tables are compressible.
    # NOT a session default: the same A/B on a high-entropy 1 KB-value
    # op-log write showed zstd can cost up to 3.5× write throughput
    # (guide §2.3 — high-entropy payloads), and op-log codecs remain a
    # per-table schema property (sources/tables.schema_codec).
    df.write.mode("overwrite").option("compression", "zstd").parquet(storage)
    return df.sparkSession.read.parquet(storage)


# Observation hook for plan reporting: a storage-backed operator's
# shuffles run in the materialization BUILD jobs, before the returned
# plan exists — so the returned plan honestly reads Ex=0 while the real
# exchanges live here. scripts/plan_report.py sets an observer to
# capture each materialized DataFrame's plan features (the mat-Ex
# column); None (the default) is zero-overhead.
_materialize_observer = None


def set_materialize_observer(fn) -> None:
    """Install ``fn(df)`` to be called with every DataFrame that
    ``materialize()`` is about to write to storage; pass None to
    remove. Driver-side reporting only — never load-bearing."""
    global _materialize_observer
    _materialize_observer = fn


def app_scratch_dir(spark, tag: str) -> str:
    """A scratch directory for storage-backed intermediates that does
    not leak: the path is keyed by the Spark applicationId (so repeated
    invocations in one driver/bench run reuse — and overwrite — ONE
    directory instead of accumulating a fresh Parquet copy per call),
    and an atexit rmtree reaps it when the process exits (a scratch
    keyed to this app is unreachable by any other process anyway, so
    at-exit removal loses nothing)."""
    import atexit
    import shutil
    import tempfile
    from pathlib import Path

    d = Path(tempfile.gettempdir()) / (
        "tera_spark_scratch_" + spark.sparkContext.applicationId + "_" + tag
    )
    if d not in _REAPED_SCRATCH:
        _REAPED_SCRATCH.add(d)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    d.mkdir(parents=True, exist_ok=True)
    return str(d)


_REAPED_SCRATCH: set = set()
