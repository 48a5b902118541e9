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


def subsequence_topk(
    series: DataFrame,
    pattern: list[float],
    *,
    k: int = 20,
    id_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Distributed top-k z-normalized subsequence similarity search:
    find the k subsequences (any series, any offset) closest to the
    query pattern under z-normalized squared Euclidean distance — the
    motif/pattern-matching primitive of time-series stores (the shape
    tera clients hand-roll with ordered scans + client loops).

    Plan shape: one hash aggregation collects each key's ordered
    series (per-key series must fit an executor — the same bound every
    sessionization/window op in this engine assumes; shard long series
    by time range first if not). Sliding windows, per-window moments,
    z-norm and the distance fold all run JVM-side as higher-order
    array functions — no UDFs, no second shuffle; the global top-k is
    a TakeOrdered over window-count rows. Left-fold order is element
    order, so sums are bit-stable across engines (the DuckDB oracle
    folds identically).

    Flat (zero-variance) windows carry no shape and are excluded, as
    is standard for z-normalized distance. Ties break on
    (dist, id, start).
    """
    L = len(pattern)
    if L < 2:
        raise ValueError("pattern must have at least 2 points")
    mu = sum(pattern) / L
    sd = (sum((x - mu) ** 2 for x in pattern) / L) ** 0.5
    if sd == 0:
        raise ValueError("flat query pattern has no shape under z-normalization")
    qz = [(x - mu) / sd for x in pattern]
    qz_arr = F.array(*[F.lit(float(x)) for x in qz])

    s = series.groupBy(F.col(id_col).alias("sid")).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(val_col).alias("v")))),
            lambda p: p["v"].cast("double"),
        ).alias("vals")
    )
    n = F.size("vals")
    s = s.filter(n >= L).withColumn(
        "start", F.explode(F.sequence(F.lit(0), n - L))
    )
    w = F.slice("vals", F.col("start") + 1, L)
    s = s.withColumn("w", w)
    mean = F.aggregate("w", F.lit(0.0), lambda a, x: a + x) / L
    s = s.withColumn("m", mean)
    var = F.aggregate("w", F.lit(0.0), lambda a, x: a + (x - F.col("m")) * (x - F.col("m"))) / L
    s = s.withColumn("sd", F.sqrt(var)).filter(F.col("sd") > 0)
    z = F.transform("w", lambda x: (x - F.col("m")) / F.col("sd"))
    diff2 = F.zip_with(z, qz_arr, lambda a, b: (a - b) * (a - b))
    dist = F.round(F.aggregate(diff2, F.lit(0.0), lambda a, x: a + x), 6)
    return (
        s.select(
            F.col("sid").alias(id_col),
            F.col("start").cast("long").alias("start"),
            dist.alias("dist"),
        )
        .orderBy("dist", id_col, "start")
        .limit(k)
    )
