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


def test_timeoracle_unique_monotonic_and_lease(tmp_path, monkeypatch):
    """timeoracle.h analog: unique strictly-increasing allocation,
    range allocation, clock-regression immunity, and restart safety
    through the persisted lease limit."""
    from tera_spark.functions import timeoracle as TO

    o = TO.Timeoracle(str(tmp_path / "lease.json"))
    a = o.get_timestamp()
    b = o.get_timestamp(5)   # range [b, b+5)
    c = o.get_timestamp()
    assert a < b and b + 5 <= c

    # wall clock regresses: allocation keeps climbing
    real_time = TO.time.time
    monkeypatch.setattr(TO.time, "time", lambda: real_time() - 3600)
    d = o.get_timestamp()
    assert d > c
    monkeypatch.undo()

    # restart: new oracle starts ABOVE the persisted lease limit, so no
    # timestamp can ever repeat even if the first oracle died mid-lease
    o2 = TO.Timeoracle(str(tmp_path / "lease.json"))
    e = o2.get_timestamp()
    assert e > d

    # timestamps embed wall time (10000 ticks per ms over the 2017 base)
    now_ticks = TO.Timeoracle.current_timestamp()
    assert abs(e - now_ticks) < 10 * 60 * 1000 * TO.TS_PER_MS  # within lease+slack


def test_timeoracle_stamps_table_writes(spark, tmp_path):
    from tera_spark.client import Client
    from tera_spark.functions.timeoracle import Timeoracle

    c = Client(spark, str(tmp_path / "root"))
    c.create_table("ts { d <maxversions=9> }")
    t = c.open_table("ts", timeoracle=Timeoracle())
    mu = t.NewRowMutation("r")
    for i in range(4):
        mu.Put("d", "q", f"v{i}")
    t.ApplyMutation(mu)
    versions = t.get("r")["d"]["q"]
    stamps = [ts for ts, _ in versions]
    assert len(set(stamps)) == 4  # unique per cell, not one shared now
    assert [v for _, v in sorted(versions)] == [b"v0", b"v1", b"v2", b"v3"]
