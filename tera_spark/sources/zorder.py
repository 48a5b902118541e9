"""Z-order (Morton-curve) storage layout for multi-dimensional pruning.

The reference prunes scans along exactly ONE dimension — the row-key
range that tablets shard on (`src/sdk/table_impl.cc:1452` routing;
tablet split keys `src/io/tablet_io.cc:493-604`). A predicate on any
other attribute reads everything. At 100 TB a second frequent scan
dimension (time, tenant, shard) deserves layout support too: writing
files clustered by the interleaved bits of two key columns gives every
file a tight min/max envelope in BOTH dimensions, so Parquet
footer/row-group statistics skip files for predicates on either column
(or both). Same idea Delta/Iceberg expose as OPTIMIZE ZORDER BY.

Normalization is equi-depth, not min/max: each dimension maps to its
approximate quantile bucket (0..255) before interleaving. Linear
min/max normalization collapses under heavy-tailed columns (one
outlier stretches the range; the data mass lands in a handful of z
bins and nothing prunes) — rank space is skew-proof by construction.
The quantile sketch is one pass (`approxQuantile`), the bucket lookup
is a 256-element array scan in JVM expressions, and the only shuffle
is the range partition on the z-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASKS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))
_BUCKETS = 256


def _spread16(c: Column) -> Column:
    """Spread a <=16-bit value's bits to the even bit positions."""
    c = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _MASKS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def zvalue(a: Column, b: Column) -> Column:
    """Morton interleave of two pre-bucketized columns."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def _bucket(col: str, cuts: list[float]) -> Column:
    """Equi-depth bucket id: count of cut points <= value (0..len(cuts))."""
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    v = F.col(col).cast("double")
    return F.size(F.filter(arr, lambda c: c <= v)).cast("long")


def zorder_write(
    df: DataFrame,
    col_a: str,
    col_b: str,
    path: str,
    *,
    n_files: int = 16,
) -> None:
    """Write ``df`` as Parquet clustered on the z-curve of two columns.

    One ``approxQuantile`` pass sketches both dimensions' cut points;
    ``repartitionByRange`` on the z-value is the only shuffle (its
    sampling also absorbs residual skew); within each file rows are
    z-sorted so row-group stats stay tight even when files are large.
    """
    probs = [i / _BUCKETS for i in range(1, _BUCKETS)]
    cuts_a, cuts_b = df.approxQuantile([col_a, col_b], probs, 0.001)
    z = zvalue(_bucket(col_a, cuts_a), _bucket(col_b, cuts_b))
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
