"""Row-key distribution utilities: hash-prefixed keys.

Reference: hash tables rewrite every user key as
``MurmurHash(key) + key`` — a 16-char zero-padded hex of
MurmurHash64A(seed=823) prepended to the key (src/sdk/table_impl.cc:98,
src/sdk/murmur_hash_impl.cc:61-67) — so monotonically-written keys
(timestamps, sequential ids) spread uniformly across tablets instead
of hammering the tail tablet.

Spark-native re-expression with the same contract (deterministic,
uniform, 16-hex-char prefix, original key recoverable by stripping the
prefix) built on ``xxhash64`` — Spark's native 64-bit hash, evaluated
inside codegen. Documented divergence: the hash *function* differs
from MurmurHash64A; only the distribution contract is preserved, and
round-trip (prefix → strip) is pinned by tests.

At 100 TB the prefixed key IS the range-partition key, so hot
monotonic writers scatter; readers of a single user key compute the
prefix first and still prune to one file (point lookups stay O(1)
files; ordered *range* scans are the documented trade-off of hash
tables, exactly as in the reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PREFIX_LEN = 16


def hash_prefix(key: Column) -> Column:
    """16-char zero-padded hex of the key's 64-bit hash."""
    return F.lpad(F.lower(F.hex(F.xxhash64(key))), PREFIX_LEN, "0")


def hash_prefix_key(key: Column) -> Column:
    """user key → distributed key (MurmurHash(key) + key shape)."""
    return F.concat(hash_prefix(key), key)


def strip_hash_prefix(hashed: Column) -> Column:
    """distributed key → user key."""
    return F.substring(hashed, PREFIX_LEN + 1, 2_147_483_647)


def hash_delimiters(hash_num: int) -> list[str]:
    """Evenly-spaced pre-split points over the 64-bit hash space for a
    hash-distributed table — GenerateHashDelimiters
    (src/sdk/sdk_utils.cc:1089-1103, contract pinned by
    src/sdk/test/hash_table_test.cc GenerateHashDelimiters): hash_num−1
    delimiters at i·⌊(2⁶⁴−1)/hash_num⌋, 16-char zero-padded lowercase
    hex; empty for hash_num ≤ 1. Because the distribution prefix is
    the same 16-hex shape (``hash_prefix``), these compare
    lexicographically against prefixed keys exactly as u64s — tablet i
    covers an equal slice of the hash space regardless of key skew."""
    if hash_num <= 1:
        return []
    bulk = (0xFFFFFFFFFFFFFFFF - 0x0) // hash_num
    return [format((i * bulk), "016x") for i in range(1, hash_num)]


def with_hashed_row_key(cells: DataFrame, key_col: str = "row_key") -> DataFrame:
    """Rewrite a cell table's row keys to hash-distributed form."""
    return cells.withColumn(key_col, hash_prefix_key(F.col(key_col)))


def with_plain_row_key(cells: DataFrame, key_col: str = "row_key") -> DataFrame:
    """Recover user keys from a hash-distributed cell table."""
    return cells.withColumn(key_col, strip_hash_prefix(F.col(key_col)))


# --- driver-side twin of Spark's xxhash64 -----------------------------
# The SDK facade (client.Table) translates keys on the DRIVER for
# hash-distributed tables (seek path, mutation builders, scan bounds),
# so it needs the exact same hash Spark evaluates in codegen: XXH64
# over the UTF-8 bytes with Spark's seed of 42. Pinned equal to
# F.xxhash64 by property test (tests/test_txn_keys.py).

_P1, _P2, _P3, _P4, _P5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
)
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def py_xxhash64(data: bytes, seed: int = 42) -> int:
    """XXH64 (Collet's spec), returned as a SIGNED 64-bit int to match
    Spark's long-typed xxhash64."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1 & _M
            v2 = _rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M, 31) * _P1 & _M
            v3 = _rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M, 31) * _P1 & _M
            v4 = _rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M, 31) * _P1 & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _P2) & _M, 31) * _P1 & _M)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = _rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1 & _M
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * _P1) & _M, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def py_hash_prefix_key(key: str) -> str:
    """Driver-side twin of ``hash_prefix_key`` (same 16-hex prefix)."""
    h = py_xxhash64(key.encode("utf-8")) & _M
    return f"{h:016x}{key}"


def py_strip_hash_prefix(hashed: str) -> str:
    return hashed[PREFIX_LEN:]


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple],
    *,
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys with large per-key
    state.

    Plain algebraic aggregates (sum/count/min/max) don't need this —
    map-side partial aggregation already collapses a hot key to one row
    per map task before the shuffle. The skew killer is per-key state
    that partials can't compress: ``count_distinct`` keeps every
    distinct value of a hot key in ONE reducer's hash set. Salting by
    the *value* hash splits that state correctly: each distinct value
    maps to exactly one (key, salt) bucket, so phase 1 counts distinct
    per bucket and phase 2 just sums the bucket counts — no double
    counting, and a hot key's state spreads over ``salt_buckets``
    reducers. The phase-2 shuffle moves ≤ groups × salt_buckets rows —
    noise at 100 TB next to the fact shuffle it fixes. (AQE's skew
    mitigation only splits sort-merge-join sides; it never splits an
    aggregation key.)

    ``aggs`` maps output column → (kind, input column) with kind in
    {"count_distinct", "sum", "count", "min", "max"}; the algebraic
    kinds are allowed so one pass can compute them alongside.
    """
    cd_cols = [col for kind, col in aggs.values() if kind == "count_distinct"]
    if cd_cols:
        # value-hash salt: a given value always lands in one bucket
        salt = F.pmod(F.xxhash64(*cd_cols), F.lit(salt_buckets))
    else:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial_aggs, final_aggs = [], []
    for out, (kind, col) in aggs.items():
        if kind == "count_distinct":
            partial_aggs.append(F.countDistinct(col).alias(out))
            final_aggs.append(F.sum(out).alias(out))
        elif kind == "count":
            partial_aggs.append(F.count(F.lit(1)).alias(out))
            final_aggs.append(F.sum(out).alias(out))
        elif kind in ("sum", "min", "max"):
            fn = getattr(F, kind)
            partial_aggs.append(fn(col).alias(out))
            final_aggs.append(fn(out).alias(out))
        else:
            raise ValueError(f"unsupported agg kind: {kind}")
    partial = df.withColumn("_salt", salt).groupBy(*group_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*group_cols).agg(*final_aggs)
