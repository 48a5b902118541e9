"""Deterministic training-shard writer: the output stage of a
training-data pipeline, where a curated corpus must land as a fixed
number of size-balanced, reproducibly-assigned shard files for the
tokenizer/dataloader fleet.

Reference analog: tera pre-splits tables into tablets by key
(`src/sdk/client_impl.cc:161-166` delimiters, murmur hash buckets
`src/sdk/table_impl.cc:98`); a shard here is the file-layout version of
a tablet — but assignment must be REPRODUCIBLE across runs and engines
(auditable data lineage), so it hashes the record key, never a random
or round-robin split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_id(key: F.Column | str, n_shards: int) -> F.Column:
    """Stable shard assignment: xxhash64 (fixed seed 42 inside Spark)
    of the key, non-negative mod n_shards. Pure function of the key —
    the same record lands in the same shard on every run and cluster
    size."""
    return F.pmod(F.xxhash64(F.col(key) if isinstance(key, str) else key), F.lit(n_shards))


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    n_shards: int,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``shard=K`` directories, one file per shard.

    Plan shape: one exchange total — `repartitionByRange(n_shards,
    shard)` is a range partitioner over the dense ids 0..n-1, so each
    output task holds exactly one shard's rows and `partitionBy` emits
    exactly one file per shard (hash-repartitioning on the id would
    collide ids into some tasks and leave others empty → file-per-
    shard-per-task blowup). Balance comes from the key hash, not the
    partitioner. At 100 TB the same layout holds with
    `maxRecordsPerFile` splitting oversized shards into numbered parts
    within their directory."""
    out = df.withColumn("shard", shard_id(key_col, n_shards))
    (
        out.repartitionByRange(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )


def read_shard(spark, path: str, shard: int, fmt: str = "parquet") -> DataFrame:
    """Read one shard by directory (partition pruning — only that
    shard's files are listed/scanned)."""
    return spark.read.format(fmt).load(path).filter(F.col("shard") == shard)
