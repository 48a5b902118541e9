"""Oracled temporal-join queries over the `events` table.

The reference's nearest analogs are client-side: time-bounded point
reads (`include/tera/reader.h:35-36`) and hand-maintained index-table
join loops (`src/benchmark/tpcc/tera_tpccdb.cc`). Here they are single
declarative plans; DuckDB's native ASOF JOIN / BETWEEN join is the
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.functions.timeutil import epoch_micros
from tera_spark.operators.temporal import asof_join, binned_range_join
from tera_spark.queries import query
from tera_spark.sources.tables import load


@query(
    "events_asof_prev_click",
    """
    WITH l AS (SELECT * FROM events WHERE event_type = 'error'),
         r AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT l.event_id, l.user_id,
           r.event_id AS click_event_id,
           epoch_us(l.ts) - epoch_us(r.ts) AS gap_us,
           r.value AS click_value
    FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def events_asof_prev_click(spark: SparkSession, sf: str) -> DataFrame:
    """Each error event -> the user's most recent click at or before it."""
    ev = load(spark, sf, "events")
    l = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", epoch_micros(ev, "ts").alias("ts_us")
    )
    r = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        epoch_micros(ev, "ts").alias("ts_us"),
        F.col("event_id").alias("click_event_id"),
        epoch_micros(ev, "ts").alias("click_ts_us"),
        F.col("value").alias("click_value"),
    )
    j = asof_join(
        l, r, on=["user_id"], ts_col="ts_us",
        right_cols=["click_event_id", "click_ts_us", "click_value"],
    )
    return j.select(
        "event_id",
        "user_id",
        "click_event_id",
        (F.col("ts_us") - F.col("click_ts_us")).alias("gap_us"),
        "click_value",
    )


@query(
    "events_range_join_windows",
    """
    WITH w AS (
      SELECT event_id AS window_id,
             epoch_us(ts) - 120000000 AS start_us,
             epoch_us(ts) + 120000000 AS end_us
      FROM events WHERE event_type = 'purchase'
      ORDER BY value DESC, event_id LIMIT 20
    )
    SELECT w.window_id, e.event_id
    FROM w JOIN events e ON epoch_us(e.ts) BETWEEN w.start_us AND w.end_us
    """,
)
def events_range_join_windows(spark: SparkSession, sf: str) -> DataFrame:
    """All events inside +/-120s incident windows around the 20
    highest-value purchases — containment via the binned equi-join, no
    nested loop even when the interval side is also a fact table."""
    ev = load(spark, sf, "events")
    pts = ev.select("event_id", epoch_micros(ev, "ts").alias("ts_us"))
    win = (
        ev.filter(F.col("event_type") == "purchase")
        .orderBy(F.desc("value"), "event_id")
        .limit(20)
        .select(
            F.col("event_id").alias("window_id"),
            (epoch_micros(ev, "ts") - F.lit(120_000_000)).alias("start_us"),
            (epoch_micros(ev, "ts") + F.lit(120_000_000)).alias("end_us"),
        )
    )
    j = binned_range_join(pts, win, "ts_us", "start_us", "end_us", bin_width=240_000_000)
    return j.select("window_id", "event_id")


@query(
    "events_asof_next_purchase",
    """
    WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
         r AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT l.event_id, l.user_id,
           r.event_id AS purchase_event_id,
           epoch_us(r.ts) - epoch_us(l.ts) AS wait_us
    FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)
def events_asof_next_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Forward as-of: each click -> the user's next purchase at or
    after it (time-to-convert)."""
    ev = load(spark, sf, "events")
    l = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", epoch_micros(ev, "ts").alias("ts_us")
    )
    r = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        epoch_micros(ev, "ts").alias("ts_us"),
        F.col("event_id").alias("purchase_event_id"),
        epoch_micros(ev, "ts").alias("purchase_ts_us"),
    )
    j = asof_join(
        l, r, on=["user_id"], ts_col="ts_us",
        right_cols=["purchase_event_id", "purchase_ts_us"],
        direction="forward",
    )
    return j.select(
        "event_id",
        "user_id",
        "purchase_event_id",
        (F.col("purchase_ts_us") - F.col("ts_us")).alias("wait_us"),
    )
