"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only incremental-compute primitive is the cell-level
observer trigger (SURVEY.md §2.5); anything with cross-event state
(sessions, running counters) is left to user code. Here the engine
supplies a real distributed stateful operator: per-key session
tracking with Arrow-batched state transitions — state lives in the
streaming state store (checkpointed, exactly-once), keys are hash
partitioned, and each micro-batch touches only the keys present in
the batch plus timed-out ones, which is what keeps it viable when the
key space is millions of users at 100 TB/day.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events int"
)
_STATE_SCHEMA = "start long, last long, n int"


def sessionize_stream(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Per-user session splitting with a ``gap_seconds`` idle gap.

    Emits one row per *closed* session — a newer event arrived more
    than the gap after the session's last event, or the event-time
    watermark passed the session's deadline (EventTimeTimeout, so
    batch-style `availableNow` runs terminate promptly; a
    processing-time timeout would keep the query alive on wall-clock
    waits). Timestamps are epoch-microseconds in the output so
    downstream joins/oracles are exact.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            s, last, n = state.get
            closed.append((uid, s, last, n))
            state.remove()
        else:
            ts_sorted: list[int] = []
            for pdf in pdfs:
                ts_sorted.extend(int(v) for v in pdf["ts_us"])
            ts_sorted.sort()
            if state.exists:
                s, last, n = state.get
            else:
                s, last, n = None, None, 0
            for t in ts_sorted:
                if s is None:
                    s, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((uid, s, last, n))
                    s, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            if s is not None:
                state.update((s, last, n))
                # deadline in ms; must stay ahead of the current watermark
                deadline_ms = (last + gap_us) // 1000
                state.setTimeoutTimestamp(
                    max(deadline_ms, state.getCurrentWatermarkMs() + 1)
                )
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    prepared = events.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark_delay).withColumn(
        "ts_us", F.unix_micros(F.col(ts_col))
    )
    return prepared.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
