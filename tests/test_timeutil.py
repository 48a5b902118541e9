"""epoch_micros: exact epoch arithmetic for every timestamp flavor a
parquet read can produce (TIMESTAMP_NTZ, TIMESTAMP/LTZ, DATE), pinned
against DuckDB's epoch_us on the driver fixtures."""

from __future__ import annotations

import duckdb

from tera_spark.functions.timeutil import epoch_micros
from tera_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


def _duck_epochs(expr, table, n=5):
    con = duckdb.connect()
    try:
        return [
            r[0]
            for r in con.execute(
                f"SELECT {expr} FROM '{SF_DIR}/{table}.parquet' ORDER BY 1 LIMIT {n}"
            ).fetchall()
        ]
    finally:
        con.close()


def test_ntz_matches_duckdb_epoch_us(spark):
    ev = load(spark, SF_DIR, "events")
    assert str(ev.schema["ts"].dataType) in ("TimestampNTZType()", "TimestampType()")
    got = [
        r[0]
        for r in ev.select(epoch_micros(ev, "ts").alias("us")).orderBy("us").limit(5).collect()
    ]
    assert got == _duck_epochs("epoch_us(ts)", "events")


def test_ltz_read_matches_duckdb_epoch_us(spark):
    # force the LTZ read path (inference off) — same epochs must come out
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try:
        df = spark.read.parquet(f"{SF_DIR}/events.parquet")
        assert str(df.schema["ts"].dataType) == "TimestampType()"
        got = [
            r[0]
            for r in df.select(epoch_micros(df, "ts").alias("us"))
            .orderBy("us")
            .limit(5)
            .collect()
        ]
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    assert got == _duck_epochs("epoch_us(ts)", "events")


def test_date_column_is_wall_clock_midnight(spark):
    df = load(spark, SF_DIR, "orders")
    dated = df.selectExpr("cast(o_orderdate as date) as d")
    got = [
        r[0]
        for r in dated.select(epoch_micros(dated, "d").alias("us")).orderBy("us").limit(3).collect()
    ]
    want = _duck_epochs("epoch_us(cast(cast(o_orderdate as date) as timestamp))", "orders", 3)
    assert got == want
    assert all(us % 86_400_000_000 == 0 for us in got)
