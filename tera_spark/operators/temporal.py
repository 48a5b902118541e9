"""Temporal joins the reference delegates to client code.

The reference has no join engine at all (SURVEY.md §2.4): time-aligned
lookups are hand-rolled client patterns — multi-get loops against
secondary-index tables (`src/benchmark/tpcc/tera_tpccdb.cc`) or
version-bounded point reads (`include/tera/reader.h:35-36`
``SetTimeRange``). At analytics scale those patterns are an as-of join
("newest right row at or before my timestamp") and a range join
("points inside intervals"). Spark also lacks both as primitives, so
this module composes them from shuffle-friendly DataFrame ops — no
cross joins, no per-key driver loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_cols: list[str],
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: attach to each left row the nearest right row at or
    before it (``direction="backward"``: greatest right ``ts_col`` <=
    left's) or at or after it (``"forward"``: smallest right ``ts_col``
    >= left's) within the same ``on`` keys. Ties at equal timestamps
    match, like DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` / ``<=``.

    Plan shape: tagged union of both sides, then ONE window pass with
    ``last(..., ignorenulls=True)`` over rows-preceding — exactly one
    shuffle on the join keys (same exchange a hash join would pay) and
    one Tungsten sort within partitions. No range cross join, no
    per-key loop, nothing driver-side; skew is bounded by per-key row
    counts like any window, and neither side needs to fit in memory —
    this survives a 100 TB fact table on both sides.

    ``right`` must carry ``on + [ts_col] + right_cols``; name/alias the
    payload columns (``right_cols``) before calling. The matched
    payload is packed into one struct so a legitimately-NULL payload
    column can't resolve to an older row's value.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__asof")
    r = right.select(*on, ts_col, payload).withColumn("__side", F.lit(0))
    l = left.withColumn("__asof", F.lit(None).cast(r.schema["__asof"].dataType)).withColumn(
        "__side", F.lit(1)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right (__side=0) sorts before left at equal ts -> inclusive match;
    # forward = the same sweep along descending time
    order = (
        [F.col(ts_col).asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col(ts_col).desc(), F.col("__side").asc()]
    )
    w = (
        W.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        u.withColumn("__m", F.last("__asof", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    return matched.select(
        *left.columns, *[F.col(f"__m.{c}").alias(c) for c in right_cols]
    )


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    condition: Column | None = None,
) -> DataFrame:
    """Range-containment join (point BETWEEN start AND end, inclusive)
    rewritten as an equi-join on bin ids.

    Each interval explodes to every fixed-width bin it overlaps; each
    point maps to exactly one bin; an equi-join on the bin id followed
    by the exact containment filter yields each qualifying pair exactly
    once (bins partition the line, so a point meets each interval in
    one bin only).

    Scale: a naive non-equi join on two fact tables is a nested-loop
    O(P×I); this shuffles O(P + I·(span/bin_width + 1)) rows on a bin
    key both Catalyst and AQE treat as a plain equi-join (skew split,
    broadcast-if-tiny all apply). Pick ``bin_width`` near the typical
    interval span so the explode factor stays ~2. ``condition`` adds an
    extra join predicate (e.g. an equi key shared by both sides).
    """
    b = F.lit(int(bin_width))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b).cast("long"),
                F.floor(F.col(end_col) / b).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__bin", F.floor(F.col(point_col) / b).cast("long"))
    cond = pt["__bin"] == iv["__bin"]
    if condition is not None:
        cond = cond & condition
    return (
        pt.join(iv, cond)
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bin")
    )
