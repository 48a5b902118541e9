"""Persisted mergeable-sketch tables: incremental distinct counting.

The 100 TB problem: "distinct users per day / over any date range"
re-scans the fact table per question. The sketch-table answer: fold
each ingestion slice ONCE into a per-bucket HLL sketch row (a few KB,
Spark's Datasketches `hll_sketch_agg`), persist the sketches, and
answer any range question by unioning the covered buckets
(`hll_union_agg`) — reading KBs instead of TBs, mergeable across
builds because HLL union is associative/commutative/idempotent.

This is the same engineering stance as the reference's counter cells
(pre-folded, mergeable state instead of rescans) lifted to distinct
counting, where no exact mergeable cell exists. The estimate error is
the standard HLL bound (~1.04/sqrt(2^lgk); lgK=12 → ~1.6%).

The reference has no sketch surface; north-star addition alongside
queries/streaming_batch.py's one-shot sketch profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_hll_table(
    df: DataFrame,
    path: str,
    *,
    bucket_cols: list[str],
    value_col: str,
    lgk: int = 12,
    mode: str = "append",
) -> None:
    """Fold one slice into per-bucket HLL sketch rows and persist.

    Append-mode is the incremental path: a nightly build appends that
    day's buckets; re-running a day just adds another sketch row for
    the same bucket, and the query-side union absorbs duplicates
    (HLL union is idempotent on the same underlying set)."""
    (
        df.groupBy(*bucket_cols)
        .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"))
        .write.mode(mode)
        .parquet(path)
    )


def hll_distinct(
    spark: SparkSession,
    path: str,
    *,
    where: str | None = None,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Estimate distinct counts from a sketch table: filter buckets
    (partition/footer pruning — the scan reads only covered buckets),
    union their sketches, estimate. With ``group_by``, one estimate
    per group (e.g. per event_type over a date range)."""
    sk = spark.read.parquet(path)
    if where:
        sk = sk.filter(where)
    agg = F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(True))).alias(
        "distinct_estimate"
    )
    if group_by:
        return sk.groupBy(*group_by).agg(agg)
    return sk.agg(agg)
