#!/usr/bin/env python
"""Streaming scale smoke: drive N synthetic events through (a) the
watermarked windowed aggregation stream and (b) the dirty-key
materialized-view maintenance loop, and report per-stage throughput.

Measures the streaming path at volume the fixture can't provide
(sf0.1 events is 120k rows); results land in SCALE.md §6. Run
standalone: `python scripts/scale_smoke_stream.py [n_events]`.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from tera_spark.model import CellOp  # noqa: E402
from tera_spark.session import get_spark  # noqa: E402

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
N_BATCHES = 10  # arrival batches for the stream source


def main() -> None:
    spark = get_spark("stream_smoke")
    out: dict = {"n_events": N_EVENTS}

    with tempfile.TemporaryDirectory(prefix="stream_smoke_") as tmp:
        # deterministic event stream: 30 days, 5k users, 4 types
        ev = spark.range(N_EVENTS).select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.pmod(F.xxhash64("id"), F.lit(30 * 86_400)) * 1_000_000
            ).alias("ts"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5000)).alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("refund")),
                (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(4)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000)) / 100.0).alias("value"),
        )
        src = f"{tmp}/events"
        ev.repartition(N_BATCHES).write.parquet(src)

        # (a) windowed aggregation stream, availableNow over all files
        from tera_spark.streaming.observer import windowed_event_stream

        stream = spark.readStream.schema(ev.schema).option(
            "maxFilesPerTrigger", max(N_BATCHES // 5, 1)
        ).parquet(src)
        agg = windowed_event_stream(stream, window="1 hour", watermark="2 hours")
        t0 = time.perf_counter()
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("win_smoke")
            .option("checkpointLocation", f"{tmp}/ckpt_win")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1200)
        win_s = time.perf_counter() - t0
        n_windows = spark.sql("select count(*) n from win_smoke").collect()[0].n
        out["windowed_agg_s"] = round(win_s, 1)
        out["windowed_events_per_s"] = round(N_EVENTS / win_s)
        out["n_windows"] = n_windows

        # (b) materialized-view maintenance: base table + dirty batches
        from tera_spark.catalog import Catalog
        from tera_spark.streaming.mview import MaterializedCurrentView

        cat = Catalog(spark, f"{tmp}/cat")
        cat.create_table("kv { D }")
        n_base = min(N_EVENTS, 1_000_000)
        base = spark.range(n_base).select(
            F.format_string("row%09d", F.col("id")).alias("row_key"),
            F.lit("D").alias("cf"),
            F.lit("v").alias("qualifier"),
            F.lit(1).cast("long").alias("ts"),
            F.lit(CellOp.PUT).alias("op"),
            F.col("id").cast("string").cast("binary").alias("value"),
            F.col("id").alias("seq"),
        )
        cat.append("kv", base)
        mv = MaterializedCurrentView(
            cat, "kv", f"{tmp}/view", f"{tmp}/ckpt_mv", n_tablets=32
        )
        mv.refresh(timeout_s=1200)  # initial full fold
        # three dirty batches of 10k rows each → measure steady refresh
        lat = []
        for i in range(3):
            dirty = spark.range(10_000).select(
                F.format_string("row%09d", F.pmod(F.xxhash64("id", F.lit(i)), F.lit(n_base))).alias("row_key"),
                F.lit("D").alias("cf"),
                F.lit("v").alias("qualifier"),
                F.lit(2 + i).cast("long").alias("ts"),
                F.lit(CellOp.PUT).alias("op"),
                F.lit(b"upd").alias("value"),
                (F.col("id") + n_base + 1 + i * 10_000).alias("seq"),
            )
            cat.append("kv", dirty)
            t0 = time.perf_counter()
            mv.refresh(timeout_s=1200)
            lat.append(time.perf_counter() - t0)
        out["mview_base_rows"] = n_base
        out["mview_dirty_batch_rows"] = 10_000
        out["mview_refresh_s"] = [round(x, 1) for x in lat]
        n_view = spark.read.parquet(f"{tmp}/view").count()
        out["mview_rows"] = n_view
        shutil.rmtree(f"{tmp}/view", ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
