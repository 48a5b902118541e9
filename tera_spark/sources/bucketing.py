"""Bucketed cell tables: zero-exchange co-located joins.

The reference co-locates related data by sharding every table on
row_key ranges (tablets) and routing reads to the owning server. The
Spark-native equivalent for *join* locality is bucketing: both sides
pre-hashed into the same number of buckets on the join key, so a join
or aggregation on that key runs with NO Exchange — the shuffle was paid
once at write time. At 100 TB this converts every recurring
key-join/agg over a cell table (secondary-index lookups, op-log ⋈
base-snapshot merges, batch gets) from a per-query shuffle into a
write-once layout decision, exactly like tera's one-time tablet split.

Bucketed tables go through the session catalog (`saveAsTable` with an
explicit path → external table); plain parquet files cannot carry
bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    *,
    key: str = "row_key",
    buckets: int = 32,
    sorted_within: bool = True,
) -> None:
    """Materialize ``df`` as an external bucketed table at ``path``.
    ``sorted_within`` additionally sorts each bucket file by the key, so
    sort-merge joins skip their Sort as well."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sorted_within:
        w = w.sortBy(key)
    w.option("path", path).saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table *through the catalog* — `spark.read.parquet`
    on the same path would drop the bucket metadata and reintroduce the
    exchange."""
    return spark.table(name)
