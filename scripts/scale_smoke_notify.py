#!/usr/bin/env python
"""Notify→observer→ack pipeline scale smoke WITH mid-stream kill.

Drives N notify-marker cells (default 10M) through ObserverPipeline —
the Spark re-expression of the reference's scanner/observer/ack loop
(src/observer/executor/scanner_impl.cc:189-293, ack at :550,683) — and
proves the exactly-once contract the checkpoint+idempotent-sink design
claims: the pipeline is SIGKILLed mid-stream from a separate process,
restarted on the same checkpoint, and the final census must equal the
corpus exactly (no loss, no double count), cell-checksum included.

The observer's sink is the idempotent shape the module prescribes: one
output partition per epoch, mode=overwrite — a replayed epoch (same
epoch_id after the kill) overwrites its own partial write instead of
appending a duplicate. Results land in SCALE.md. Run standalone:
`python scripts/scale_smoke_notify.py [n_cells]`.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import textwrap
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_CELLS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_FILES = 100  # oplog arrival batches; maxFilesPerTrigger=4 -> ~25 epochs


def _runner_src(tmp: str) -> str:
    """Child source: run the observer pipeline to completion over the
    available oplog. The observer counts its dirty cells and folds an
    order-free checksum, writing one partition per epoch (idempotent)."""
    return textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {_REPO!r})
        from pyspark.sql import functions as F
        from tera_spark.session import get_spark
        from tera_spark.streaming.observer import ObserverPipeline

        spark = get_spark("notify_smoke_child", shuffle_partitions=16)
        tmp = {tmp!r}

        def census(marks, epoch_id):
            # order-free checksum; pmod keeps the 10M-row sum inside a
            # long (ANSI mode: a raw xxhash64 sum overflows and throws)
            (
                marks.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(
                        F.pmod(F.xxhash64("row_key", "ts"), F.lit(1_000_000_007))
                    ).alias("checksum"),
                )
                .write.mode("overwrite")
                .parquet(f"{{tmp}}/census/epoch={{epoch_id}}")
            )

        pipe = ObserverPipeline(spark, f"{{tmp}}/oplog", f"{{tmp}}/ckpt")
        pipe.observe("census", "d", "q", census)
        q = pipe.start(trigger_once=True, max_files_per_trigger=4)
        q.awaitTermination(3600)
        print("DRAINED", flush=True)
        """
    )


def main() -> None:
    from pyspark.sql import functions as F

    from tera_spark.session import get_spark

    spark = get_spark("notify_smoke")
    out: dict = {"metric": "notify_smoke", "n_cells": N_CELLS}
    with tempfile.TemporaryDirectory(prefix="notify_smoke_") as tmp:
        # notify-marker corpus: the _N_ cells a notify=on CF's writers
        # emit, one marker per dirty row (cf "_N_", qualifier "cf+qual")
        cells = spark.range(N_CELLS).select(
            F.concat(F.lit("r"), F.col("id").cast("string")).alias("row_key"),
            F.lit("_N_").alias("cf"),
            F.lit("d+q").alias("qualifier"),
            (F.col("id") % 1000 + 1).cast("long").alias("ts"),
            F.lit(0).cast("int").alias("op"),
            F.lit(b"1").alias("value"),
            F.col("id").alias("seq"),
        )
        cells.repartition(N_FILES).write.parquet(f"{tmp}/oplog")
        oracle = cells.agg(
            F.sum(
                F.pmod(F.xxhash64("row_key", "ts"), F.lit(1_000_000_007))
            ).alias("checksum")
        ).collect()[0]["checksum"]

        # phase 1: start draining in a CHILD process, SIGKILL it once
        # some epochs have committed (mid-stream, possibly mid-epoch)
        t0 = time.perf_counter()
        child = subprocess.Popen(
            [sys.executable, "-c", _runner_src(tmp)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            preexec_fn=os.setsid,  # kill the whole JVM process group
        )
        census_dir = Path(tmp) / "census"
        deadline = time.time() + 900
        while time.time() < deadline:
            done = len(list(census_dir.glob("epoch=*"))) if census_dir.exists() else 0
            if done >= 5:
                break
            if child.poll() is not None:
                break
            time.sleep(0.5)
        killed = child.poll() is None
        if killed:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            child.wait()
        epochs_before_kill = len(list(census_dir.glob("epoch=*")))
        out["killed_mid_stream"] = killed
        out["epochs_before_kill"] = epochs_before_kill

        # phase 2: restart on the SAME checkpoint; availableNow drains
        # the remainder (and replays the interrupted epoch, which must
        # overwrite — not duplicate — its partial census partition)
        rerun = subprocess.run(
            [sys.executable, "-c", _runner_src(tmp)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            timeout=3600,
        )
        if rerun.returncode != 0 or "DRAINED" not in rerun.stdout:
            raise RuntimeError(f"restart failed:\n{rerun.stdout[-3000:]}")
        wall = time.perf_counter() - t0

        got = (
            spark.read.option("basePath", f"{tmp}/census")
            .parquet(f"{tmp}/census")
            .agg(F.sum("n").alias("n"), F.sum("checksum").alias("checksum"))
            .collect()[0]
        )
        n_epochs = len(list(census_dir.glob("epoch=*")))
        out.update(
            {
                "n_epochs": n_epochs,
                "cells_seen": got["n"],
                "exactly_once": bool(
                    got["n"] == N_CELLS and got["checksum"] == oracle
                ),
                "wall_s": round(wall, 1),
                "cells_per_s": round(N_CELLS / wall),
            }
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
