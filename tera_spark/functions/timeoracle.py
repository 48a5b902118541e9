"""Timestamp oracle: globally unique, strictly monotonic timestamps.

Driver-side analog of the reference's timeoracle service
(src/timeoracle/timeoracle.h): logical int64 timestamps issued at
``kTimestampPerMilliSecond = 10000`` per wall millisecond over a
2017-01-01 base (``kBaseTimestampMilliSecond = 1483200000000``), so a
timestamp embeds wall time yet never repeats or regresses.
``get_timestamp(n)`` allocates the half-open range ``[start,
start+n)`` exactly like the reference's ``Timeoracle::GetTimestamp``.

Two reference behaviors carried over:

* **Never backwards.** If the wall clock regresses, allocation
  continues from the logical head (the reference's
  ``UpdateStartTimestamp`` only ever moves start forward).
* **Lease durability.** The reference persists a limit timestamp and
  refuses to allocate past it until renewed
  (``UpdateLimitTimestamp``), so a restarted oracle can never reissue
  a timestamp some client already used. Here an optional lease file
  plays that role: renewals write the new limit via atomic rename,
  and a fresh oracle starts above the persisted limit.

In this engine the oracle is the opt-in source of auto-assigned cell
timestamps (client.Table(timeoracle=...), MutationBatch.to_df):
without it, all cells of a flush share one wall-clock microsecond and
rely on ``seq`` to break ties; with it, every cell version gets a
distinct, ordered timestamp — the property tera's global transactions
lean on.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

TS_PER_MS = 10_000                  # kTimestampPerMilliSecond
BASE_MS = 1_483_200_000_000         # kBaseTimestampMilliSecond (2017-01-01)


class Timeoracle:
    def __init__(self, lease_path: str | None = None, *, lease_ms: int = 2_000):
        self._lease_path = Path(lease_path) if lease_path else None
        self._lease_ms = lease_ms
        start = self.current_timestamp()
        if self._lease_path is not None and self._lease_path.exists():
            persisted = json.loads(self._lease_path.read_text())["limit"]
            start = max(start, persisted)
        self._next = start
        self._limit = 0
        self._renew(0)

    @staticmethod
    def current_timestamp() -> int:
        """Logical timestamp of 'now' (clock_realtime_ms − base, at
        10000 ticks/ms)."""
        return (int(time.time() * 1000) - BASE_MS) * TS_PER_MS

    def get_timestamp(self, num: int = 1) -> int:
        """Allocate ``num`` timestamps; returns the range start.
        Strictly monotonic across calls, clock regressions included."""
        if num <= 0:
            raise ValueError("num must be positive")
        # track wall time when it's ahead; never go backwards
        cur = self.current_timestamp()
        if cur > self._next:
            self._next = cur
        if self._next + num >= self._limit:
            self._renew(num)
        start = self._next
        self._next += num
        return start

    def _renew(self, num: int) -> None:
        new_limit = max(self.current_timestamp(), self._next + num) + self._lease_ms * TS_PER_MS
        if self._lease_path is not None:
            tmp = self._lease_path.with_suffix(".tmp")
            tmp.write_text(json.dumps({"limit": new_limit}))
            tmp.replace(self._lease_path)  # durable before use, like the reference
        self._limit = new_limit
