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


def weighted_interleave(
    df: DataFrame,
    weights: dict[str, float],
    *,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted interleaving of sources — the global read
    order a trainer consumes when the data mix is specified as source
    weights (e.g. web 0.6, code 0.3, books 0.1). Stride scheduling:
    the i-th record of a source with weight w sits at virtual position
    (i - 0.5) / w, and the global order sorts by that position — so a
    weight-0.6 source contributes 6 of every 10 consecutive records,
    deterministically, with no RNG and no coordination.

    Scale shape: per-source row_number is one window partitioned by
    source (same exchange the final range-sort would need anyway);
    emitting `global_rank` is a total order — at 100 TB skip the rank
    column and `repartitionByRange(position)` + sortWithinPartitions
    instead, which is the same plan minus the global row_number.
    Sources absent from ``weights`` are dropped (weight 0)."""
    from pyspark.sql import Window as W

    pairs = [p for kv in sorted(weights.items()) for p in (F.lit(kv[0]), F.lit(float(kv[1])))]
    wmap = F.create_map(*pairs)
    wsrc = W.partitionBy(source_col).orderBy(key_col)
    d = (
        df.withColumn("_w", wmap[F.col(source_col)])
        .filter(F.col("_w").isNotNull() & (F.col("_w") > 0))
        .withColumn("_rn", F.row_number().over(wsrc))
        .withColumn("position", (F.col("_rn") - 0.5) / F.col("_w"))
    )
    wg = W.orderBy("position", source_col, key_col)
    return d.withColumn("global_rank", F.row_number().over(wg).cast("long")).select(
        "global_rank", F.col(key_col), F.col(source_col), F.round("position", 6).alias("position")
    )
