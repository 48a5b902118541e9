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


def with_hashed_row_key(cells: DataFrame, key_col: str = "row_key") -> DataFrame:
    """Rewrite a cell table's row keys to hash-distributed form."""
    return cells.withColumn(key_col, hash_prefix_key(F.col(key_col)))


def with_plain_row_key(cells: DataFrame, key_col: str = "row_key") -> DataFrame:
    """Recover user keys from a hash-distributed cell table."""
    return cells.withColumn(key_col, strip_hash_prefix(F.col(key_col)))
