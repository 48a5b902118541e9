"""Cross-table commit atomicity (Percolator primary-commit +
roll-forward analog; reference global_txn.cc:337-720): a multi-table
`commit(cas=True)` that crashes BETWEEN two tables' commit records
must converge to all-committed (the txn marker is the commit point and
recovery rolls the tail forward), while a crash BEFORE the marker
converges to all-aborted — never half-applied."""

from __future__ import annotations

import json
import time
from pathlib import Path

import pytest

from tera_spark.catalog import Catalog
from tera_spark.operators.mutation import MutationBatch
from tera_spark.operators.txn import new_global_transaction


def _cat(spark, tmp_path, wid="w") -> Catalog:
    c = Catalog(spark, str(tmp_path / "cat"), writer_id=wid)
    for t in ("a", "b"):
        if not c.is_table_exist(t):
            c.create_table(f"{t} {{ d }}")
            c.append_cas(t, MutationBatch().put("seed", "d", "q", "s", ts=1))
    return c


def _expire_reservations(root: Path, table: str) -> None:
    for p in (root / table / "casmeta").glob("resv-*.json"):
        rec = json.loads(p.read_text())
        rec["expires"] = time.time() - 1
        p.write_text(json.dumps(rec))


def test_multi_table_commit_is_atomic(spark, tmp_path):
    """Happy path: both tables commit, marker cleaned up."""
    c = _cat(spark, tmp_path)
    txn = new_global_transaction(c)
    txn.put("a", "r1", "d", "q", "va")
    txn.put("b", "r1", "d", "q", "vb")
    applied = txn.commit(cas=True)
    assert applied == {"a": 1, "b": 1}
    assert not list((Path(c.root) / ".txnlog").glob("txn-*.json"))
    assert {r.row_key for r in c.view("a").collect()} == {"seed", "r1"}
    assert {r.row_key for r in c.view("b").collect()} == {"seed", "r1"}


def _stage_and_mark(c: Catalog, *, write_marker: bool, record_first: bool):
    """Drive _commit_cas's phases by hand up to a crash point: both
    tables' data staged, marker optionally written, table 'a' record
    optionally landed, then the 'writer dies'."""
    ba = MutationBatch().put("rx", "d", "q", "xa")
    bb = MutationBatch().put("rx", "d", "q", "xb")
    ta = c.begin_disjoint_commit("a", 1, ["rx"], "dying", ttl_s=300)
    tb = c.begin_disjoint_commit("b", 1, ["rx"], "dying", ttl_s=300)
    c.stage_disjoint_data(ta, ba)
    c.stage_disjoint_data(tb, bb)
    marker = None
    if write_marker:
        marker = c.write_txn_marker("deadbeef00000001", {"a": ta, "b": tb})
    if record_first:
        c.record_disjoint_commit(ta)
    return marker


def test_crash_after_marker_rolls_tail_forward(spark, tmp_path):
    """Crash between table a's record and table b's: any later READER
    of b (or writer recovery) writes b's missing record from the
    marker — both tables end committed."""
    c = _cat(spark, tmp_path)
    _stage_and_mark(c, write_marker=True, record_first=True)
    root = Path(c.root)
    assert {r.row_key for r in c.view("a").collect()} == {"seed", "rx"}
    _expire_reservations(root, "b")

    r = Catalog(spark, str(root), writer_id="reader-only")
    assert {x.row_key for x in r.view("b").collect()} == {"seed", "rx"}, (
        "marked window must roll FORWARD, not back"
    )
    assert not list((root / ".txnlog").glob("txn-*.json")), "marker retired"
    st = r.table_stats("b")
    assert st["live_reservations"] == 0 and st["commit_gaps"] == 0


def test_crash_after_marker_before_any_record(spark, tmp_path):
    """Crash right after the commit point (marker written, zero records
    landed): recovery commits BOTH tables from the marker."""
    c = _cat(spark, tmp_path)
    _stage_and_mark(c, write_marker=True, record_first=False)
    root = Path(c.root)
    _expire_reservations(root, "a")
    _expire_reservations(root, "b")

    r = Catalog(spark, str(root), writer_id="reader-only")
    assert {x.row_key for x in r.view("a").collect()} == {"seed", "rx"}
    assert {x.row_key for x in r.view("b").collect()} == {"seed", "rx"}
    assert not list((root / ".txnlog").glob("txn-*.json"))


def test_crash_before_marker_aborts_both(spark, tmp_path):
    """Crash before the commit point (data staged, no marker): both
    windows roll back — the staged rows never become visible."""
    c = _cat(spark, tmp_path)
    _stage_and_mark(c, write_marker=False, record_first=False)
    root = Path(c.root)
    _expire_reservations(root, "a")
    _expire_reservations(root, "b")

    r = Catalog(spark, str(root), writer_id="reader-only")
    assert {x.row_key for x in r.view("a").collect()} == {"seed"}
    assert {x.row_key for x in r.view("b").collect()} == {"seed"}
    assert r.table_stats("a")["pending_rollback_windows"] >= 1
    assert r.table_stats("b")["pending_rollback_windows"] >= 1


def test_live_transaction_left_alone(spark, tmp_path):
    """Marker present but reservations LIVE (phase 3 in flight): a
    reader neither rolls forward nor back — the committer owns it."""
    c = _cat(spark, tmp_path)
    _stage_and_mark(c, write_marker=True, record_first=False)
    root = Path(c.root)

    r = Catalog(spark, str(root), writer_id="reader-only")
    assert {x.row_key for x in r.view("b").collect()} == {"seed"}  # masked
    assert list((root / ".txnlog").glob("txn-*.json")), "marker untouched"
    assert r.table_stats("b")["live_reservations"] == 1


def test_commit_cas_still_aborts_cleanly_on_conflict(spark, tmp_path):
    """Regression: the marker phases must not break the conflict-abort
    path — an intersecting live manifest still aborts all-or-nothing
    with no marker left behind."""
    c = _cat(spark, tmp_path)
    # a live manifest holding rx on table b
    blocker = c.begin_disjoint_commit("b", 1, ["rx"], "blocker", ttl_s=300)
    txn = new_global_transaction(c)
    txn.put("a", "rx", "d", "q", "va")
    txn.put("b", "rx", "d", "q", "vb")
    from tera_spark.operators.txn import GlobalTxnConflict

    with pytest.raises(GlobalTxnConflict):
        txn.commit(cas=True)
    c.abort_disjoint_commit(blocker)
    assert not list((Path(c.root) / ".txnlog").glob("txn-*.json"))
    assert {r.row_key for r in c.view("a").collect()} == {"seed"}
    assert {r.row_key for r in c.view("b").collect()} == {"seed"}
