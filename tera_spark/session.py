"""SparkSession factory tuned for this engine.

Local mode mirrors the driver harness (local[$SPARK_GRAFT_CPUS]); on a
real cluster every setting here except master/driver-memory carries
over unchanged. AQE is on so skewed scans/joins re-plan at runtime —
the scale path for the 100 TB target.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tera_spark",
    shuffle_partitions: int | None = None,
    *,
    rocksdb_state: bool = False,
) -> SparkSession:
    """``rocksdb_state=True`` switches Structured Streaming state to the
    RocksDB provider — the scale choice when stateful-operator state
    (sessionizer keys, dedup windows) exceeds executor heap; the default
    in-memory provider is faster for the local test volumes."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's 1 MB floor coalesces small-bytes/CPU-heavy shuffles (the
        # HOF view folds: ~10 MB shuffled, seconds of per-row compute) down
        # to a handful of tasks, idling the other cores. 256k keeps
        # parallelism for those without over-splitting wide-payload scans
        # (64k cost ~20% on 1 KB-value folds); it never binds on big
        # shuffles, where the parallelism-first target dwarfs it.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("TERA_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if rocksdb_state:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
