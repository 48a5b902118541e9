"""Observer / notify incremental-processing pipeline on Structured
Streaming.

Reference model (SURVEY.md §2.5): a CF flagged ``notify=on`` makes
transactions write a dirty-marker cell into the ``_N_`` column family
(`Transaction::Notify`, include/tera/transaction.h:69-72;
kNotifyColumnFamily src/types.h:53); a polling scanner executor
(`ScannerImpl::ScanTable`, src/observer/executor/scanner_impl.cc:189-293)
reads markers, row-locks, invokes user observers
(`Observer::OnNotify`, include/observer/observer.h:24-46) and acks by
deleting the marker (`NotificationImpl::Ack`,
src/observer/executor/notification_impl.cc:42-65).

Spark-native re-expression: the op-log parquet directory IS the
notification channel. A file-source stream tails appended cell
batches; ``foreachBatch`` dispatches each micro-batch to registered
observers (exactly the new-cell set — no polling, no row locks: the
micro-batch scheduler serializes batches); the streaming checkpoint
is the ack (a marker is "deleted" by the offset moving past it).
Exactly-once = checkpoint + idempotent sink, replacing the reference's
lock/ack-version dance (scanner_impl.cc:550,683).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.model import CELL_SCHEMA, CellOp

NOTIFY_CF = "_N_"   # kNotifyColumnFamily (src/types.h:53)


@dataclass
class Observer:
    """OnNotify callback bound to an observed column
    (include/observer/observer.h:24-46). ``fn(batch_df, epoch_id)``
    receives exactly the dirty cells of its column for the batch."""

    name: str
    cf: str
    qualifier: str
    fn: Callable[[DataFrame, int], None]


def notify_cells(cf: str, qualifier: str, marked: DataFrame) -> DataFrame:
    """Build ``_N_`` marker cells for rows of an observed column —
    what Transaction::Notify writes. Qualifier is the packed
    'cf+qualifier' name (global_txn_internal.h notify naming)."""
    return marked.select(
        F.col("row_key"),
        F.lit(NOTIFY_CF).alias("cf"),
        F.concat_ws("+", F.lit(cf), F.lit(qualifier)).alias("qualifier"),
        F.col("ts"),
        F.lit(CellOp.PUT).alias("op"),
        F.lit(b"1").alias("value"),
        F.coalesce(F.col("seq"), F.lit(0)).alias("seq"),
    )


class ObserverPipeline:
    """Streaming dispatcher: tails an op-log directory, routes dirty
    cells to observers, acks via checkpoint."""

    def __init__(self, spark: SparkSession, oplog_path: str, checkpoint_path: str):
        self.spark = spark
        self.oplog_path = oplog_path
        self.checkpoint_path = checkpoint_path
        self.observers: list[Observer] = []
        self.scan_hooks: list = []

    def observe(self, name: str, cf: str, qualifier: str, fn) -> "ObserverPipeline":
        self.observers.append(Observer(name, cf, qualifier, fn))
        return self

    def add_scan_hook(self, hook) -> "ObserverPipeline":
        """Register a ScanHook invoked around every micro-batch round
        (ScanHook::Before/After, include/observer/scanner.h:28-42)."""
        self.scan_hooks.append(hook)
        return self

    def _dispatch(self, batch: DataFrame, epoch_id: int) -> None:
        if not self.observers:
            return
        # late/duplicate protection: one invocation per cell version
        # (dropDuplicates ≙ the scanner's ack-version conflict check)
        batch = batch.dropDuplicates(["row_key", "cf", "qualifier", "ts"]).cache()
        try:
            for ob in self.observers:
                marks = batch.filter(
                    (F.col("cf") == NOTIFY_CF)
                    & (F.col("qualifier") == f"{ob.cf}+{ob.qualifier}")
                )
                if marks.isEmpty():
                    continue
                ob.fn(marks, epoch_id)
        finally:
            batch.unpersist()

    def start(self, *, trigger_once: bool = True, max_files_per_trigger: int = 64):
        """``max_files_per_trigger`` sizes the scan round (the
        reference scanner's per-round notification budget,
        scanner_impl.cc ScanTable loop) — smaller rounds mean finer
        ack granularity and less replay after a crash, at more
        per-epoch overhead."""
        stream = (
            self.spark.readStream.schema(CELL_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(self.oplog_path)
        )
        dispatch = self._dispatch
        if self.scan_hooks:
            from tera_spark.streaming.hooks import HookedDispatch

            dispatch = HookedDispatch("oplog", self._dispatch, self.scan_hooks)
        writer = (
            stream.writeStream.foreachBatch(dispatch)
            .option("checkpointLocation", self.checkpoint_path)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def windowed_event_stream(
    events: DataFrame,
    *,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation for event
    streams — the stream analog of queries/streaming_batch.py (the
    reference has no window operators; cell-level triggers only)."""
    # watermarks require TIMESTAMP (LTZ); parquet naive micros arrive NTZ
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
    )


def ohlc_stream(
    events: DataFrame,
    *,
    window: str = "15 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Streaming OHLC bars: open/high/low/close per window per event
    type, incrementally maintained under a watermark — the stream twin
    of queries/streaming_batch.events_ohlc_bars. min_by/max_by are
    declarative aggregates, so state per (window, type) is four
    scalars; late data past the watermark drops deterministically."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    v, t = F.col(val_col), F.col(ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.min_by(v, t).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, t).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type", "open", "high", "low", "close", "n",
        )
    )


def attribution_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase joined to the
    same user's clicks in the preceding ``horizon``.

    Beyond the reference (observers fire per-cell; correlating two
    streams is client code there). Spark keeps both sides in state
    bounded by watermark + the time-interval condition — state eviction
    needs BOTH an event-time bound on each side and the range
    predicate, otherwise the join buffers forever; that is the shape
    this helper pins. Keys shuffle-partition the state, so a 100 TB/day
    stream distributes like any keyed aggregation.
    """
    clicks = clicks.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    purchases = purchases.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    c = clicks.select(
        F.col(key).alias("c_user"),
        F.col(ts_col).alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col(key).alias("p_user"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return p.join(c, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "purchase_value",
    )


def deduped_event_stream(
    events: DataFrame,
    *,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """At-least-once ingestion -> exactly-once rows:
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes, so state is bounded by (keys arriving within
    the watermark window), not by stream history — the difference
    between a dedup that survives a week-long 100 TB replay and one
    that OOMs. Duplicates with *different* event times within the
    watermark window still collapse (retry semantics), which plain
    dropDuplicates on (key, ts) cannot do."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
