"""Source readers for the driver's TPC-H-ish testdata and for cell
tables persisted as Parquet.

The reference's sources are range scans over tablet-served LevelDB
(`TabletIO::LowLevelScan`) plus a MySQL storage-engine frontend
(`sql/src/ha_tera.cc`); here every source is a Parquet scan with
Catalyst pushdown, and "tablet routing" is partition/file pruning on
the sorted row_key (SURVEY.md §3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Unexecuted-relation memo: spark.read.parquet re-lists the directory
# and re-reads footers for schema on EVERY call, and a hot query
# service (or the bench, which rebuilds each query per timed run) pays
# that driver-side latency per table per invocation — measured 30-70%
# of sub-second query latency at sf0.1. The memo holds the analyzed
# scan DataFrame (metadata only, no rows, no results): every action on
# it still reads the parquet input in full, exactly like a catalog
# table registration. Keyed by applicationId so a new session never
# sees a dead JVM's plan.
_LOAD_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def invalidate(sf_dir: str | None = None, name: str | None = None) -> None:
    """Drop memoized relations — all of them, a directory's, or one
    table's. The memo pins the file listing (InMemoryFileIndex) at
    first load(), which is correct for the driver's static testdata
    but would read deleted/stale files if a table directory were
    overwritten or appended within one application — any future
    write-then-read of a *table dir* must call this first (today every
    ingest/scratch path writes elsewhere)."""
    for key in [
        k
        for k in _LOAD_MEMO
        if (sf_dir is None or k[1] == sf_dir) and (name is None or k[2] == name)
    ]:
        del _LOAD_MEMO[key]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    app = spark.sparkContext.applicationId
    # dead-application entries (restarted sessions) would otherwise
    # accumulate for the life of the module; the dict stays table-count
    # sized so the sweep is trivially cheap
    for k in [k for k in _LOAD_MEMO if k[0] != app]:
        del _LOAD_MEMO[k]
    key = (app, sf_dir, name)
    memo = _LOAD_MEMO.get(key)
    if memo is not None:
        return memo
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which Spark's Parquet
        # reader rejects; read nanos as long and truncate to micros
        # (floor division — can't move an event across a window boundary).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _LOAD_MEMO[key] = df
    return df


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition narrow inputs up to default parallelism.

    Heavy per-row expression pipelines (MinHash, SimHash, embedding
    math, Pandas-UDF decode) are CPU-bound map work; when the source
    parquet arrives as a handful of row-group splits, the whole stage
    runs on that handful of cores. One repartition of the raw input
    unlocks full-cluster parallelism. No-op when the input already has
    enough partitions — the 100 TB case, where inputs arrive as
    thousands of file splits and an extra shuffle would be harmful.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # inputFiles() is a ~millisecond analyzed-plan lookup; df.rdd costs
    # a full physical-plan + RDD conversion (~0.4s of driver time PER
    # CALL on fresh DataFrames — measured; it dominated sub-second
    # queries). File count under-counts splits of large files, which
    # can only cause a harmless repartition of an already-wide input.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    if n_files == 0 and df.rdd.getNumPartitions() >= target:  # non-file source
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TPCH_TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


_CODECS = {
    "none": "uncompressed",
    "snappy": "snappy",
    "gzip": "gzip",
    "zstd": "zstd",
    "lz4": "lz4",
}


def schema_codec(schema) -> str | None:
    """Parquet codec for a table's single-directory layout from its
    locality-group ``compress=`` property (table_schema.proto:21;
    teracli `<compress=snappy|none>`): lg0's codec wins here —
    per-LG codecs apply when the table uses the LG-partitioned layout
    (sources/lg_layout.py). None = engine default."""
    if schema is None or not getattr(schema, "locality_groups", None):
        return None
    lg0 = schema.locality_groups.get("lg0") or next(iter(schema.locality_groups.values()))
    return _CODECS.get((lg0.compress or "").lower())


def write_cell_table(
    cells: DataFrame,
    path: str,
    *,
    buckets: int | None = None,
    row_bloom_filter: bool = False,
    delimiters: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Persist an op-log cell table range-sorted by row_key so point
    gets and range scans prune files via Parquet min/max stats (the
    Spark analog of tablet routing, table_impl.cc:1452).

    ``row_bloom_filter`` additionally writes a Parquet bloom filter on
    row_key — the reference's per-LG RowBloomFilter
    (table_schema.proto:24, tablet_io_test.cc RowBloomFilter): min/max
    stats prune files for *range* predicates, the bloom filter also
    skips row groups for point gets on keys the file doesn't hold.

    ``delimiters`` (sorted row keys) align file boundaries EXACTLY to
    the pre-split points of CreateTable(desc, delimiters)
    (include/tera/client.h:40-46): tablet i covers
    [delimiters[i-1], delimiters[i]). repartitionByRange alone gives
    range-disjoint files but samples its boundaries; with explicit
    delimiters no file ever spans a split point, so per-tenant/-prefix
    isolation and routing hold exactly. One pass: the bucket id is a
    JVM-side expression, a dynamic partitionBy write separates buckets
    per task, and the bucket directories flatten back into one sorted
    file set."""
    if delimiters:
        _write_delimited(cells, path, sorted(delimiters), row_bloom_filter, compression)
        return
    n = buckets or max(cells.sparkSession.sparkContext.defaultParallelism, 4)
    w = (
        cells.repartitionByRange(n, "row_key")
        .sortWithinPartitions("row_key", "cf", "qualifier", "ts")
        .write.mode("overwrite")
    )
    if row_bloom_filter:
        w = w.option("parquet.bloom.filter.enabled#row_key", "true")
    if compression:
        w = w.option("compression", compression)
    w.parquet(path)


def _write_delimited(
    cells: DataFrame,
    path: str,
    delims: list[str],
    row_bloom_filter: bool,
    compression: str | None = None,
) -> None:
    import shutil
    from pathlib import Path

    arr = F.array(*[F.lit(d) for d in delims])
    # bucket = #delimiters <= row_key: hash-repartitioning on it sends
    # every row of a tablet to one task; partitionBy then splits any
    # colliding tablets into separate files — exactly one file per
    # non-empty tablet, each wholly inside its delimiter range
    bucket = F.size(F.filter(arr, lambda d: d <= F.col("row_key")))
    tmp = path + ".split"
    w = (
        cells.withColumn("_tb", bucket)
        .repartition(len(delims) + 1, "_tb")
        .sortWithinPartitions("_tb", "row_key", "cf", "qualifier", "ts")
        .write.partitionBy("_tb")
        .mode("overwrite")
    )
    if row_bloom_filter:
        w = w.option("parquet.bloom.filter.enabled#row_key", "true")
    if compression:
        w = w.option("compression", compression)
    w.parquet(tmp)
    out = Path(path)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    for d in sorted(Path(tmp).glob("_tb=*"), key=lambda p: int(p.name.split("=")[1])):
        tb = int(d.name.split("=")[1])
        for i, f in enumerate(sorted(d.glob("*.parquet"))):
            f.rename(out / f"part-t{tb:05d}-{i:05d}.parquet")
    shutil.rmtree(tmp)


def read_cell_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
