"""Session-timezone-independent epoch arithmetic.

The driver's parquet fixtures store naive ``timestamp[us]`` values
(no UTC flag), which Spark 4 reads as ``TIMESTAMP_NTZ`` when
``spark.sql.parquet.inferTimestampNTZ.enabled`` is true (the default)
and as ``TIMESTAMP`` (LTZ) otherwise.  ``unix_micros`` only accepts
LTZ, and casting NTZ->LTZ goes through the session time zone — wrong
under any non-UTC driver session.  ``timestampdiff`` against the NTZ
epoch is pure wall-clock arithmetic and matches DuckDB's
``epoch_us(ts)`` on the same file bit-for-bit, so queries stay
oracle-exact no matter which session reads them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DateType, TimestampNTZType

_EPOCH_NTZ = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def epoch_micros(df: DataFrame, col: str = "ts") -> Column:
    """Epoch microseconds of ``df[col]``, exact for both TIMESTAMP and
    TIMESTAMP_NTZ inputs and independent of the session time zone."""
    return _epoch_micros(df.schema[col].dataType, col)


def _epoch_micros(dtype: DataType, col: str) -> Column:
    if isinstance(dtype, (TimestampNTZType, DateType)):
        # DATE -> NTZ cast is pure wall-clock (midnight), no tz involved
        return F.expr(
            f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, cast({col} as timestamp_ntz))"
        )
    return F.unix_micros(F.col(col))
