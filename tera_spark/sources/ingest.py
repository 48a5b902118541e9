"""Bulk import/export: relational files ⇄ op-log cell tables.

Reference: bulk load via `teracli put`/`tera_mark` driving RowMutations
from delimited stdin (doc/en/teracli.md:165-213, src/benchmark/mark.cc)
and the MySQL plugin's row codec packing every column of a row into one
value (sql/src/ha_tera_format.cc:32-123). Here import is a reshape:
each input row becomes one cell per non-key column —
(row_key=key, cf, qualifier=column name, ts, PUT, value=string bytes) —
written range-sorted so scans prune (write_cell_table); export is the
inverse pivot back to one row per row_key.

Map-only + one range shuffle at write: holds at 100 TB (the reshape is
`stack`, no join; the sort is the same job any bulk load pays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.model import CellOp


def read_input(spark: SparkSession, path: str, fmt: str = "parquet", **options) -> DataFrame:
    """CSV (header+inferSchema by default), JSON lines, or Parquet."""
    reader = spark.read
    if fmt == "csv":
        reader = reader.options(header=True, inferSchema=True, **options)
    elif options:
        reader = reader.options(**options)
    return reader.format(fmt).load(path)


def rows_to_cells(
    df: DataFrame,
    key_col: str,
    cf: str = "data",
    *,
    ts: int = 1,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """One input row → one PUT cell per value column (qualifier =
    column name, value = string-encoded bytes; NULLs skipped, matching
    the row codec's len=0 convention)."""
    cols = value_cols or [c for c in df.columns if c != key_col]
    stacked = df.select(
        F.col(key_col).cast("string").alias("row_key"),
        F.stack(
            F.lit(len(cols)),
            *[x for c in cols for x in (F.lit(c), F.col(c).cast("string"))],
        ).alias("qualifier", "sval"),
    ).filter(F.col("sval").isNotNull())
    return stacked.select(
        "row_key",
        F.lit(cf).alias("cf"),
        "qualifier",
        F.lit(ts).cast("long").alias("ts"),
        F.lit(CellOp.PUT).alias("op"),
        F.col("sval").cast("binary").alias("value"),
        F.lit(0).cast("long").alias("seq"),
    )


def import_table(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    key_col: str,
    *,
    fmt: str = "parquet",
    cf: str = "data",
    **options,
) -> int:
    """Bulk load: file → sorted cell table. Returns cell count."""
    from tera_spark.sources.tables import write_cell_table

    cells = rows_to_cells(read_input(spark, src_path, fmt, **options), key_col, cf)
    write_cell_table(cells, dest_path)
    return spark.read.parquet(dest_path).count()


def export_rows(
    visible: DataFrame, key_col: str = "row_key", *, max_qualifiers: int = 10_000
) -> DataFrame:
    """Inverse pivot: visible cells → one row per row_key with one
    string column per qualifier (newest version wins; the caller
    controls versions via the view it passes in).

    The distinct-qualifier set becomes the output SCHEMA, so it is
    collected to the driver by construction — bounded by
    ``max_qualifiers`` (mirrors the reference's per-row qualifier cap,
    `include/tera/scan.h:91-94` SetMaxQualifiers). A sparse-wide CF
    (per-row qualifiers as data, e.g. tags) past the cap raises rather
    than OOM-ing the driver / planner: keep such data long-form (the
    cell view itself) or export the map column instead."""
    latest = (
        visible.groupBy("row_key", "qualifier")
        .agg(F.max_by("value", "ts").alias("value"))
        .withColumn("sval", F.col("value").cast("string"))
    )
    wide = (
        latest.groupBy("row_key")
        .agg(F.map_from_entries(F.collect_list(F.struct("qualifier", "sval"))).alias("m"))
    )
    qrows = (
        visible.select("qualifier").distinct().limit(max_qualifiers + 1).collect()
    )
    if len(qrows) > max_qualifiers:
        raise ValueError(
            f"export_rows: more than {max_qualifiers} distinct qualifiers — "
            "a pivoted schema this wide is a sparse-CF misuse; raise "
            "max_qualifiers explicitly or export the long/cell form"
        )
    quals = sorted(r.qualifier for r in qrows)
    return wide.select(
        F.col("row_key").alias(key_col),
        *[F.element_at("m", q).alias(q) for q in quals],
    )
