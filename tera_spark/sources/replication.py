"""Dual-cluster replication (reference: src/sdk/tera_replication.cc).

The reference fans each RowMutation out to N replica tables and lets
flags choose the guarantee: `write_need_all_success` (commit only when
every replica acks) and `read_try_all` (fall back across replicas on
read). Re-expressed Spark-first:

* **Write fan-out** — `ReplicatedWriter.apply` commits one
  MutationBatch to every replica catalog. Each replica commit is one
  atomic parquet append (per-row atomicity per replica, as in the
  reference); `need_all_success=False` tolerates secondary failures
  and reports them for catch-up.
* **Async catch-up** — `sync_replica` makes a lagging replica whole by
  copying exactly the op-log part files it is missing. Part file names
  carry a writer UUID, so the copy is idempotent and needs no data
  rewrite or dedup shuffle; at 100 TB this is a pure manifest diff +
  parallel file copy, never a logical MERGE.
* **Read fallback** — `read_any` returns the first replica that is
  readable (`read_try_all` analog).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame

from tera_spark.catalog import Catalog


class ReplicatedWriter:
    """Fan a mutation batch out to every replica of a table."""

    def __init__(self, catalogs: list[Catalog], table: str, *, need_all_success: bool = True):
        assert catalogs, "at least one replica required"
        self.catalogs = catalogs
        self.table = table
        self.need_all_success = need_all_success

    def apply(self, cells: DataFrame) -> list[int]:
        """Append ``cells`` to each replica. Returns indexes of replicas
        that failed (always empty when need_all_success, which raises)."""
        failed: list[int] = []
        for i, cat in enumerate(self.catalogs):
            try:
                cat.append(self.table, cells)
            except Exception:
                if self.need_all_success or i == 0:
                    raise  # primary failure always surfaces
                failed.append(i)
        return failed


def sync_replica(src: Catalog, dst: Catalog, table: str) -> int:
    """Copy op-log part files present in ``src`` but absent in ``dst``
    (async replication catch-up). Returns files copied."""
    if not dst.is_table_exist(table):
        dst.create_table(src.get_schema(table))
    s_dir = Path(src.oplog_path(table))
    d_dir = Path(dst.oplog_path(table))
    have = {p.name for p in d_dir.glob("part-*")}
    copied = 0
    for f in sorted(s_dir.glob("part-*")):
        if f.name not in have:
            shutil.copy2(f, d_dir / f.name)
            copied += 1
    # mirror the commit records (group-commit watermark) and rollback
    # windows with the data — replicated rows above the replica's
    # watermark would otherwise read as a torn batch
    s_commits = s_dir.parent / "commits"
    if s_commits.exists():
        d_commits = d_dir.parent / "commits"
        d_commits.mkdir(exist_ok=True)
        for f in s_commits.glob("*.json"):
            if not (d_commits / f.name).exists():
                shutil.copy2(f, d_commits / f.name)
    s_rb = s_dir.parent / "rollbacks.json"
    if s_rb.exists():
        shutil.copy2(s_rb, d_dir.parent / "rollbacks.json")
    return copied


def read_any(catalogs: list[Catalog], table: str, **view_kw) -> DataFrame:
    """Current view from the first replica that can serve it
    (`tera_replication_read_try_all` analog)."""
    last: Exception | None = None
    for cat in catalogs:
        try:
            return cat.view(table, **view_kw)
        except Exception as e:  # disabled / missing replica
            last = e
    raise last if last is not None else ValueError("no replicas")
