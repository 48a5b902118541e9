"""Locality-group physical layout: column-family pruning at the store.

The reference shards each tablet's data into one LevelDB per locality
group and opens only the LGs that hold requested column families
(multi-LG DB src/leveldb/db/db_table.cc; LG pruning
src/io/tablet_io.cc:2222-2237). The Spark-native equivalent is a
directory-partitioned op-log: cells land under ``lg=<name>/`` derived
from the schema's cf→LG map, and a scan that asks for specific column
families turns into a *partition filter* — directories of other LGs
are never listed or read. Parquet's column pruning already handles
the within-row case; this adds the reference's storage-level skip,
which at 100 TB means a scan of one small LG ignores the petabytes in
the others entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.model import CellOp
from tera_spark.registry import TableSchema

# a row-delete mark masks every cf, so it must be visible to scans of
# any LG — stored in its own always-read partition (the reference
# equivalently replays DEL marks from the shared WAL/compact pass)
ROW_DELETE_LG = "__row_del"


def lg_of(schema: TableSchema, cf: Column) -> Column:
    """cf → locality-group name as a Column expression."""
    mapping = {name: c.locality_group for name, c in schema.column_families.items()}
    expr: Column = F.lit("lg0")
    for cf_name, lg_name in mapping.items():
        expr = F.when(cf == cf_name, F.lit(lg_name)).otherwise(expr)
    return expr


_CODEC = {"none": "uncompressed", "snappy": "snappy", "lz4": "lz4", "zstd": "zstd"}


def write_lg_partitioned(cells: DataFrame, schema: TableSchema, path: str) -> None:
    """Write an op-log partitioned by locality group, honoring each
    LG's compression property (table_schema.proto:21 `compress` —
    memory/flash LGs typically run uncompressed for latency, disk LGs
    compressed for capacity). Parquet compression is a per-write
    option, so each LG directory is its own write job filtering the
    staged layout (a layout rewrite is already a full-pass job; the
    per-LG passes parallelize within themselves)."""
    lg = F.when(F.col("op") == CellOp.DEL_ROW, F.lit(ROW_DELETE_LG)).otherwise(
        lg_of(schema, F.col("cf"))
    )
    staged = (
        cells.withColumn("lg", lg)
        .repartition("lg", "row_key")
        .sortWithinPartitions("row_key", "cf", "qualifier")
    )
    codecs = {
        name: _CODEC.get(g.compress, "snappy") for name, g in schema.locality_groups.items()
    }
    codecs[ROW_DELETE_LG] = "snappy"
    for lg_name, codec in codecs.items():
        (
            staged.filter(F.col("lg") == lg_name)
            .drop("lg")
            .write.mode("overwrite")
            .option("compression", codec)
            .parquet(f"{path}/lg={lg_name}")
        )


def read_lg_pruned(
    spark: SparkSession,
    path: str,
    schema: TableSchema,
    column_families: list[str] | None = None,
) -> DataFrame:
    """Op-log reader that prunes whole locality-group directories when
    only some column families are requested (plus the row-delete
    partition, which masks rows in every LG)."""
    df = spark.read.parquet(path)
    if column_families is not None:
        lgs = sorted(
            {schema.column_families[c].locality_group for c in column_families}
        ) + [ROW_DELETE_LG]
        df = df.filter(F.col("lg").isin(lgs))
    return df.drop("lg")
