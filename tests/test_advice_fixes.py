"""Regression tests for the round-2 ADVICE findings: hash-table scan
range+limit ordering, in-place key-translation on retried batches,
global-txn key translation on <hash=on> tables, timeoracle/TTL basis
mismatch, and CLI scanallv on hash tables."""

from __future__ import annotations

import pytest

from tera_spark.catalog import Catalog
from tera_spark.client import Table
from tera_spark.operators.mutation import MutationBatch
from tera_spark.operators.scan import ScanDescriptor


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "cat"))


def _fill(t: Table, n: int = 10):
    b = MutationBatch()
    for i in range(n):
        b.put(f"u{i}", "d", "q", f"v{i}", ts=1)
    t.apply_mutation(b)


def test_hash_scan_range_plus_limit_stays_inside_range(cat):
    """number_limit must apply AFTER the user-key range filter on
    hash-distributed tables — limiting in hash-storage order first
    silently drops in-range rows (ADVICE high, client.py:_hash_desc)."""
    cat.create_table("h <hash=on> {d}")
    t = Table(cat, "h")
    _fill(t)
    rows = list(t.scan(ScanDescriptor(start="u2", end="u8", number_limit=3)))
    assert len(rows) == 3
    assert all("u2" <= r.row_key < "u8" for r in rows)
    # the full range, limited exactly at its size, loses nothing
    rows = list(t.scan(ScanDescriptor(start="u2", end="u8", number_limit=6)))
    assert {r.row_key for r in rows} == {f"u{i}" for i in range(2, 8)}


def test_hash_scan_limit_without_bounds_still_limits(cat):
    cat.create_table("h2 <hash=on> {d}")
    t = Table(cat, "h2")
    _fill(t)
    assert len(list(t.scan(ScanDescriptor(number_limit=4)))) == 4


def test_cas_retry_does_not_double_prefix(cat):
    """A failed CAS retried with the SAME batch must not re-translate
    (double-prefix) its row keys (ADVICE medium, client.py CAS path)."""
    cat.create_table("h <hash=on> {d}")
    t = Table(cat, "h")
    t.put("acct", "d", "st", "open", ts=1)
    batch = MutationBatch().put("acct", "d", "st", "closed", ts=2)
    assert t.check_and_apply("acct", "d", "st", "nope", batch) is False
    # retry with the right expectation and the same object
    assert t.check_and_apply("acct", "d", "st", "open", batch) is True
    got = t.get("acct", columns={"d": ["st"]})
    assert got["d"]["st"][0][1] == b"closed"


def test_apply_mutation_reapply_same_batch(cat):
    """Re-applying a batch (e.g. caller-side retry after a suspected
    failure) must write the same user keys, not prefixed-prefixed
    garbage."""
    cat.create_table("h <maxversions=3, hash=on> {d}")
    t = Table(cat, "h")
    m = MutationBatch().put("k1", "d", "q", "v", ts=5)
    t.apply_mutation(m)
    t.apply_mutation(m)  # same ts → LWW collapses to one version
    got = t.get("k1", columns={"d": ["q"]}, max_versions=3)
    assert [v for _, v in got["d"]["q"]] == [b"v"]
    # the re-apply must NOT have written a double-prefixed stray key
    assert {r.row_key for r in t.scan_df().collect()} == {"k1"}


def test_global_txn_on_hash_table(cat):
    """GlobalTransaction must apply the same hash-prefix translation as
    Table (ADVICE medium, operators/txn.py): reads see prefixed
    storage, writes land where Table.get/scan can see them."""
    cat.create_table("gh <hash=on> {d}")
    cat.create_table("plain {d}")
    th = Table(cat, "gh")
    th.put("bal:alice", "d", "v", "100", ts=1)
    from tera_spark.operators.txn import GlobalTransaction

    txn = GlobalTransaction(cat)
    assert txn.read("gh", "bal:alice", "d", "v") == b"100"
    txn.put("gh", "bal:alice", "d", "v", "90", ts=2)
    txn.put("plain", "audit", "d", "v", "alice-10", ts=2)
    txn.commit()
    assert th.get("bal:alice", columns={"d": ["v"]})["d"]["v"][0][1] == b"90"
    tp = Table(cat, "plain")
    assert tp.get("audit", columns={"d": ["v"]})["d"]["v"][0][1] == b"alice-10"


def test_timeoracle_refused_with_cf_ttl(cat):
    """Timeoracle ticks are logical (10000/ms over a 2017 base), not
    epoch µs — combining them with cf-level TTL expiry would stamp
    cells decades in the future and never expire them (ADVICE low)."""
    from tera_spark.functions.timeoracle import Timeoracle

    cat.create_table("tt {d <ttl=60>}")
    with pytest.raises(ValueError, match="timeoracle"):
        Table(cat, "tt", timeoracle=Timeoracle())
    # ttl=0 table is fine
    cat.create_table("ok {d}")
    Table(cat, "ok", timeoracle=Timeoracle())


def test_cli_scan_all_versions_on_hash_table(spark, tmp_path, capsys):
    """teracli scan --all-versions must lift the version trim on
    <hash=on> tables too (ADVICE low, cli.py hash branch)."""
    from tera_spark.cli import main

    root = str(tmp_path / "cat")
    assert main(["--root", root, "create", "h <maxversions=1, hash=on> {d <maxversions=1>}"]) == 0
    assert main(["--root", root, "put", "h", "k", "d:q", "old", "--ts", "1"]) == 0
    assert main(["--root", root, "put", "h", "k", "d:q", "new", "--ts", "2"]) == 0
    capsys.readouterr()
    assert main(["--root", root, "scan", "h"]) == 0
    out = capsys.readouterr().out
    assert "new" in out and "old" not in out
    assert main(["--root", root, "scan", "h", "--all-versions"]) == 0
    out = capsys.readouterr().out
    assert "new" in out and "old" in out


# --- round-3 ADVICE lows -------------------------------------------------


def test_hash_scan_bounded_limit_returns_first_n_in_key_order(cat):
    """A bounded+limited hash scan must return the FIRST N cells in
    user-key order, not an arbitrary in-range subset (ADVICE low,
    client.py _user_range)."""
    cat.create_table("ho <hash=on> {d}")
    t = Table(cat, "ho")
    b = MutationBatch()
    for i in range(20):
        b.put(f"k{i:02d}", "d", "q", f"v{i}", ts=1)
    t.apply_mutation(b)
    rows = list(t.scan(ScanDescriptor(start="k03", end="k15", number_limit=4)))
    assert [r.row_key for r in rows] == ["k03", "k04", "k05", "k06"]
    df_keys = [r.row_key for r in
               t.scan_df(ScanDescriptor(start="k03", end="k15", number_limit=4)).collect()]
    assert sorted(df_keys) == ["k03", "k04", "k05", "k06"]


def test_update_schema_cannot_sneak_ttl_under_open_oracle_handle(cat):
    """update_schema adding cf ttl>0 after an oracle-stamped handle is
    open must not silently reintroduce the mixed-basis bug — the next
    write through the stale handle is refused (ADVICE low)."""
    from tera_spark.functions.timeoracle import Timeoracle

    from tera_spark.registry import parse_schema_string

    cat.create_table("os {d}")
    t = Table(cat, "os", timeoracle=Timeoracle())
    t.put("r", "d", "q", "fine")
    cat.update_schema(parse_schema_string("os {d <ttl=60>}"))
    with pytest.raises(ValueError, match="timeoracle"):
        t.put("r", "d", "q", "now-mixed-basis")


def test_global_txn_read_returns_newest_version(cat):
    """GlobalTransaction.read on a maxversions>1 cf must return the
    newest surviving version, not an arbitrary collect() row
    (ADVICE low, txn.py)."""
    from tera_spark.operators.txn import GlobalTransaction

    cat.create_table("gv {d <maxversions=3>}")
    t = Table(cat, "gv")
    t.put("r", "d", "q", "v1", ts=10)
    t.put("r", "d", "q", "v3", ts=30)
    t.put("r", "d", "q", "v2", ts=20)
    txn = GlobalTransaction(cat)
    assert txn.read("gv", "r", "d", "q") == b"v3"


def test_cli_scanallv_does_not_leak_version_lift(spark, tmp_path):
    """The scanallv version-trim lift must ride a schema COPY — the
    catalog's own schema object stays untouched (ADVICE low, cli.py)."""
    from tera_spark.cli import main

    root = str(tmp_path / "cat")
    assert main(["--root", root, "create", "hl <hash=on> {d <maxversions=1>}"]) == 0
    assert main(["--root", root, "put", "hl", "k", "d:q", "x", "--ts", "1"]) == 0
    cat2 = Catalog(spark, root)
    before = cat2.get_schema("hl").column_families["d"].max_versions
    assert main(["--root", root, "scan", "hl", "--all-versions"]) == 0
    after = cat2.get_schema("hl").column_families["d"].max_versions
    assert before == after == 1
