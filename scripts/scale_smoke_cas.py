#!/usr/bin/env python
"""Commit-CAS contention smoke: N OS processes each commit M batches
to ONE table, serialized (slot claim) vs row-disjoint (fast path).
Measures aggregate commit throughput and verifies integrity afterward
(every batch visible, commit windows pairwise disjoint, watermark =
global max). Results land in SCALE.md.

Run standalone: `python scripts/scale_smoke_cas.py [n_procs] [batches]`.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import textwrap
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_PROCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 6
ROWS_PER_BATCH = 50


def _child_src(root: str, table: str, wid: str, mode: str) -> str:
    return textwrap.dedent(
        f"""
        import sys, time
        sys.path.insert(0, {_REPO!r})
        from pyspark.sql import SparkSession
        from tera_spark.catalog import Catalog
        from tera_spark.operators.mutation import MutationBatch

        spark = (
            SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .appName("cas-smoke-{{}}".format({wid!r}))
            .getOrCreate()
        )
        cat = Catalog(spark, {root!r}, writer_id={wid!r})
        t0 = time.perf_counter()
        for i in range({BATCHES}):
            b = MutationBatch()
            for r in range({ROWS_PER_BATCH}):
                b.put(f"{wid}-{{i}}-{{r}}", "d", "q", "v", ts=1)
            if {mode!r} == "disjoint":
                cat.append_cas({table!r}, b, rows=b.row_keys, max_wait_s=300.0)
            else:
                cat.append_cas({table!r}, b, max_wait_s=300.0)
        print("ELAPSED", time.perf_counter() - t0, flush=True)
        """
    )


def run_mode(spark, mode: str) -> dict:
    from tera_spark.catalog import Catalog
    from tera_spark.operators.mutation import MutationBatch

    with tempfile.TemporaryDirectory(prefix=f"cas_smoke_{mode}_") as root:
        cat = Catalog(spark, root, writer_id="setup")
        cat.create_table("t { d }")
        cat.append_cas("t", MutationBatch().put("seed", "d", "q", "v", ts=1))

        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _child_src(root, "t", f"w{i}", mode)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(N_PROCS)
        ]
        t0 = time.perf_counter()
        outs = [p.communicate(timeout=1200)[0] for p in procs]
        wall = time.perf_counter() - t0
        for p, out in zip(procs, outs):
            if p.returncode != 0:
                raise RuntimeError(f"{mode} child failed:\n{out[-2000:]}")

        # integrity: every row visible, windows pairwise disjoint
        n_expect = 1 + N_PROCS * BATCHES * ROWS_PER_BATCH
        n_vis = cat.view("t").count()
        recs = []
        for pth in (Path(root) / "t" / "commits").glob("*.json"):
            r = json.loads(pth.read_text())
            recs.append((r.get("lo", r["seq"]), r["seq"]))
        recs.sort()
        disjoint = all(h1 < l2 for (_, h1), (l2, _) in zip(recs, recs[1:]))
        total_batches = N_PROCS * BATCHES
        return {
            "mode": mode,
            "wall_s": round(wall, 2),
            "commits_per_s": round(total_batches / wall, 2),
            "rows_visible_ok": n_vis == n_expect,
            "windows_disjoint": disjoint,
            "n_commit_records": len(recs),
        }


def main() -> None:
    from tera_spark.session import get_spark

    spark = get_spark("cas_smoke")
    out = {
        "n_procs": N_PROCS,
        "batches_per_proc": BATCHES,
        "rows_per_batch": ROWS_PER_BATCH,
    }
    for mode in ("serialized", "disjoint"):
        out[mode] = run_mode(spark, mode)
    s, d = out["serialized"], out["disjoint"]
    out["speedup_disjoint_vs_serialized"] = round(
        s["wall_s"] / d["wall_s"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
