"""Group-commit atomic visibility: torn batches never surface.

The reference's TabletWriter makes a batch visible only after its WAL
append returns (src/io/tablet_writer.cc group commit). Here the commit
record (commits/<max_seq>.json, atomic rename) is that point: parquet
files landing without a record are a torn batch — masked by the
watermark, and permanently discarded (rollback window) by the next
writer's WAL-recovery step, so a rising watermark can never resurrect
them.
"""

from __future__ import annotations

import pytest

from tera_spark.catalog import Catalog
from tera_spark.client import Client
from tera_spark.model import CELL_SCHEMA, CellOp
from tera_spark.operators.seek import Seeker


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "cat"))


def _torn_write(spark, cat, table, rows):
    """Simulate a writer that died between file write and commit
    record: parquet lands, no record."""
    df = spark.createDataFrame(rows, CELL_SCHEMA).coalesce(1)
    df.write.mode("append").parquet(cat.oplog_path(table))


def test_torn_batch_invisible_everywhere(spark, cat):
    client = Client(spark, str(cat.root))
    client.create_table("wm {c}")
    t = client.open_table("wm")
    t.put("r1", "c", "q", b"committed", ts=1)

    _torn_write(spark, cat, "wm", [("r2", "c", "q", 1, CellOp.PUT, b"torn", 50)])

    assert {r.row_key for r in cat.view("wm").collect()} == {"r1"}
    seeker = Seeker(cat, "wm")
    assert set(seeker.multi_get(["r1", "r2"])) == {"r1"}
    assert {c[0] for c in seeker.scan_range()} == {"r1"}


def test_recovery_discards_tail_permanently(spark, cat):
    """The next writer's append must not resurrect torn rows even
    though the watermark rises above their seqs."""
    client = Client(spark, str(cat.root))
    client.create_table("wm2 {c}")
    t = client.open_table("wm2")
    t.put("r1", "c", "q", b"v1", ts=1)                       # seq 0, record 0

    _torn_write(spark, cat, "wm2", [("r9", "c", "q", 1, CellOp.PUT, b"torn", 50)])

    # a NEW writer process (fresh catalog+client) appends: recovery
    # rolls back the (0, 50] window, then allocates seq 51+
    cat2 = Catalog(spark, str(cat.root))
    t2 = Client(spark, str(cat.root)).open_table("wm2")
    t2.put("r3", "c", "q", b"v3", ts=1)

    assert cat2.commit_watermark("wm2") > 50
    vis = {r.row_key for r in cat2.view("wm2").collect()}
    assert vis == {"r1", "r3"}                               # torn r9 stays dead
    assert any(r["upto"] >= 50 for r in cat2._rollbacks("wm2"))
    # seek path agrees
    got = Seeker(cat2, "wm2").multi_get(["r1", "r3", "r9"])
    assert set(got) == {"r1", "r3"}


def test_legacy_tables_without_records_read_unfiltered(spark, cat):
    """Direct-written layouts (no commits dir) keep today's behavior."""
    cat.create_table("legacy {c}")
    _torn_write(spark, cat, "legacy", [("rX", "c", "q", 1, CellOp.PUT, b"raw", 7)])
    assert cat.commit_watermark("legacy") is None
    assert {r.row_key for r in cat.view("legacy").collect()} == {"rX"}


def test_kv_commit_records(spark, cat):
    cat.create_table("wkv")
    cat.kv_put("wkv", "k1", b"v1")
    assert cat.commit_watermark("wkv") is not None
    assert Seeker(cat, "wkv").get_kv("k1") == b"v1"


def test_replication_mirrors_watermark(spark, tmp_path):
    from tera_spark.sources.replication import sync_replica

    a = Catalog(spark, str(tmp_path / "a"))
    b = Catalog(spark, str(tmp_path / "b"))
    ta = Client(spark, str(a.root))
    ta.create_table("rep {c}")
    t = ta.open_table("rep")
    t.put("r1", "c", "q", b"v1", ts=1)
    sync_replica(a, b, "rep")
    assert b.commit_watermark("rep") == a.commit_watermark("rep")
    assert {r.row_key for r in b.view("rep").collect()} == {"r1"}


def test_writer_lease_fences_second_writer(spark, tmp_path):
    """Writer-lease fencing (the ZK tablet-lock analog): the engine's
    single-committing-writer assumption becomes enforced — a second
    process's appends raise while another holder's lease is live,
    expiry allows takeover, and release frees the table."""
    import time as _time

    import pytest

    from tera_spark.catalog import Catalog, WriterFenced
    from tera_spark.operators.mutation import MutationBatch

    root = str(tmp_path / "cat")
    a = Catalog(spark, root, writer_id="writer-a")
    b = Catalog(spark, root, writer_id="writer-b")
    a.create_table("t { d }")

    a.acquire_writer_lease("t", "writer-a", ttl_s=300)
    # the holder writes; the other process is fenced
    a.append("t", MutationBatch(base_seq=1).put("r1", "d", "q", "v1", ts=1).to_df(spark),
             commit_seq=1, op_kinds=[5])
    with pytest.raises(WriterFenced):
        b.append("t", MutationBatch(base_seq=2).put("r2", "d", "q", "v2", ts=1).to_df(spark),
                 commit_seq=2, op_kinds=[5])
    with pytest.raises(WriterFenced):
        b.acquire_writer_lease("t", "writer-b")

    # renewal by the holder succeeds; release frees the table
    a.acquire_writer_lease("t", "writer-a", ttl_s=300)
    a.release_writer_lease("t", "writer-a")
    b.append("t", MutationBatch(base_seq=2).put("r2", "d", "q", "v2", ts=1).to_df(spark),
             commit_seq=2, op_kinds=[5])
    assert {r.row_key for r in a.view("t").collect()} == {"r1", "r2"}

    # expired lease: takeover allowed (crash-fencing path)
    b.acquire_writer_lease("t", "writer-b", ttl_s=0)
    _time.sleep(0.01)
    a.acquire_writer_lease("t", "writer-a", ttl_s=300)
    a.release_writer_lease("t", "writer-a")

    # tables with no lease file stay open-access (back-compat)
    a.create_table("open { d }")
    b.append("open", MutationBatch(base_seq=1).put("r", "d", "q", "v", ts=1).to_df(spark),
             commit_seq=1, op_kinds=[5])
