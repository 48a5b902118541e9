"""Scan hooks — before/after callbacks around each scan round.

Reference (SURVEY.md §2.7): the observer scanner exposes a ``ScanHook``
with ``Before(table_name, scan_desc)`` / ``After(table_name, stats)``
invoked around every polling round (include/observer/scanner.h:28-42);
users register them to meter scan traffic or veto/annotate rounds.

Spark-native re-expression, two layers:

- **Pipeline hooks** (:class:`ScanHook` on :class:`ObserverPipeline`):
  a micro-batch IS a scan round, so ``before(table, batch_id, rows)``
  / ``after(table, batch_id, rows, duration_s)`` wrap the observer
  dispatch inside ``foreachBatch``. This is the literal analog — same
  call points, same per-round granularity.
- **Engine listener** (:class:`ScanMetricsListener`): a
  ``StreamingQueryListener`` translating Spark's own progress events
  (batchId, numInputRows, batchDuration) into after-round records for
  ANY streaming query, without touching its code — the reference's
  env-injected hook registration (scanner.h: hooks are set on the
  scanner, not the observer).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ScanRound:
    """One scan round's after-stats (the reference's ScanHook::After
    payload: table + per-round counters)."""

    table: str
    batch_id: int
    rows: int
    duration_s: float


class ScanHook:
    """Subclass and override; default implementations are no-ops so a
    hook may implement only one side (scanner.h declares both virtual
    with empty bodies)."""

    def before(self, table: str, batch_id: int, batch: DataFrame) -> None:  # noqa: ARG002
        return

    def after(self, table: str, round_: ScanRound) -> None:  # noqa: ARG002
        return


@dataclass
class RecordingScanHook(ScanHook):
    """Built-in hook that meters rounds (the doc example in the
    reference registers a QPS-counting hook)."""

    befores: list[tuple[str, int]] = field(default_factory=list)
    rounds: list[ScanRound] = field(default_factory=list)

    def before(self, table: str, batch_id: int, batch: DataFrame) -> None:  # noqa: ARG002
        self.befores.append((table, batch_id))

    def after(self, table: str, round_: ScanRound) -> None:
        self.rounds.append(round_)

    @property
    def total_rows(self) -> int:
        return sum(r.rows for r in self.rounds)


class HookedDispatch:
    """Wraps a foreachBatch callable with before/after hook calls.

    ``rows`` is counted once here and shared by both hook sides and
    the wrapped dispatch — a scan round's size is a fact about the
    round, not a per-hook re-computation (the reference counts rows
    once in the scanner loop and hands counters to every hook).
    """

    def __init__(self, table: str, dispatch, hooks: list[ScanHook]):
        self.table = table
        self.dispatch = dispatch
        self.hooks = hooks

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        batch = batch.cache()
        try:
            rows = batch.count()
            for h in self.hooks:
                h.before(self.table, epoch_id, batch)
            t0 = time.perf_counter()
            self.dispatch(batch, epoch_id)
            round_ = ScanRound(self.table, epoch_id, rows, time.perf_counter() - t0)
            for h in self.hooks:
                h.after(self.table, round_)
        finally:
            batch.unpersist()


class ScanMetricsListener(StreamingQueryListener):
    """Engine-level after-round metering for any streaming query:
    records (query_name, batchId, numInputRows, duration_s) from
    Spark's progress events. Register with
    ``spark.streams.addListener(listener)``; remove with
    ``spark.streams.removeListener(listener)``.
    """

    def __init__(self) -> None:
        self.rounds: list[ScanRound] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(event.name or event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.rounds.append(
            ScanRound(
                table=p.name or p.id,
                batch_id=p.batchId,
                rows=int(p.numInputRows or 0),
                duration_s=(p.durationMs.get("triggerExecution", 0) or 0) / 1000.0,
            )
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:
        return
