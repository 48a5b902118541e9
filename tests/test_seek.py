"""Seek fast path ≡ Spark scan path.

The reference keeps LowLevelSeek (src/io/tablet_io.cc:1148-1343) and
LowLevelScan (:939-1137) behavior-identical by sharing CompactStrategy;
we pin the same invariant between `operators/seek.Seeker` (driver-side
pyarrow reads + Python fold) and `operators/scan.get` (Spark fold) on
random op-logs, plus the footer-bounds routing itself.
"""

from __future__ import annotations

import pytest

from tera_spark.catalog import Catalog
from tera_spark.model import CELL_SCHEMA, CellOp
from tera_spark.operators.scan import get as spark_get
from tera_spark.operators.seek import Seeker, fold_row
from tera_spark.operators.view import current_view

from tests.test_view_model import NOW, _gen_oplog, _schema

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "cat"))


def _mk_table(cat, spark, rows, name="seek_t"):
    cat.create_table(
        f"{name} {{cf0 <maxversions=1>, cf1 <maxversions=3>, "
        f"cfttl <maxversions=2,ttl=1000>}}"
    )
    # three appends → three op-log files (multi-tablet layout)
    third = len(rows) // 3 or 1
    for i in range(0, len(rows), third):
        cat.append(name, spark.createDataFrame(rows[i : i + third], CELL_SCHEMA))
    return name


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_seek_matches_spark_fold(cat, spark, seed):
    rows = _gen_oplog(seed, n=400)
    name = _mk_table(cat, spark, rows, name=f"seek_{seed}")
    oplog = cat.read_oplog(name)
    schema = cat.get_schema(name)

    want = {}
    for r in current_view(oplog, schema, now_us=NOW).collect():
        want.setdefault(r.row_key, set()).add(
            (r.row_key, r.cf, r.qualifier, r.ts, bytes(r.value))
        )

    seeker = Seeker(cat, name)
    keys = sorted({r[0] for r in rows}) + ["row_missing"]
    got = seeker.multi_get(keys, now_us=NOW)
    assert "row_missing" not in got
    got_sets = {k: {(c[0], c[1], c[2], c[3], bytes(c[4])) for c in v} for k, v in got.items()}
    assert got_sets == want


def test_seek_scan_level_options_match(cat, spark):
    rows = _gen_oplog(99, n=400)
    name = _mk_table(cat, spark, rows, name="seek_opts")
    oplog = cat.read_oplog(name)
    schema = cat.get_schema(name)
    seeker = Seeker(cat, name)
    key = sorted({r[0] for r in rows})[3]

    for kw in (
        dict(columns={"cf1": ["log"], "cf0": []}),
        dict(max_versions=1),
        dict(ts_range=(NOW - 40, NOW - 10)),
        dict(columns={"cf1": []}, max_versions=2, ts_range=(NOW - 50, NOW)),
    ):
        want = {
            (r.row_key, r.cf, r.qualifier, r.ts, bytes(r.value))
            for r in spark_get(oplog, schema, key, now_us=NOW, **kw).collect()
        }
        got = {
            (c[0], c[1], c[2], c[3], bytes(c[4]))
            for c in seeker.get(key, now_us=NOW, **kw)
        }
        assert got == want, kw


def test_seek_snapshot_and_rollback(cat, spark):
    rows = _gen_oplog(5, n=300)
    name = _mk_table(cat, spark, rows, name="seek_snap")
    schema = cat.get_schema(name)
    seeker = Seeker(cat, name)
    key = sorted({r[0] for r in rows})[0]
    snap_seq = 150

    want = {
        (r.row_key, r.cf, r.qualifier, r.ts, bytes(r.value))
        for r in spark_get(
            cat.read_oplog(name), schema, key, now_us=NOW
        ).collect()
    }
    # snapshot read: only writes with seq <= 150 visible
    v0 = current_view(cat.read_oplog(name), schema, now_us=NOW, snapshot_seq=snap_seq)
    want_snap = {
        (r.row_key, r.cf, r.qualifier, r.ts, bytes(r.value))
        for r in v0.filter(v0.row_key == key).collect()
    }
    got_snap = {
        (c[0], c[1], c[2], c[3], bytes(c[4]))
        for c in seeker.get(key, now_us=NOW, snapshot_seq=snap_seq)
    }
    assert got_snap == want_snap
    got_full = {
        (c[0], c[1], c[2], c[3], bytes(c[4])) for c in seeker.get(key, now_us=NOW)
    }
    assert got_full == want


def test_footer_routing_prunes_files(cat, spark):
    cat.create_table("seek_route {cf0}")
    for prefix in ("a", "m", "z"):
        batch = [
            (f"{prefix}{i:03d}", "cf0", "q", 100 + i, CellOp.PUT, f"v{i}".encode(), i)
            for i in range(50)
        ]
        cat.append("seek_route", spark.createDataFrame(batch, CELL_SCHEMA).coalesce(1))
    seeker = Seeker(cat, "seek_route")
    plan = seeker._route(["z010"])
    # footer bounds route the key to exactly the one file holding z-keys
    assert len(plan) == 1
    assert seeker.get("z010")[0][4] == b"v10"
    # meta cache populated once per file
    assert len(seeker._meta) == len(seeker._files()) >= 3


def test_get_kv_fast_path(cat, spark):
    cat.create_table("seek_kv")
    cat.kv_put("seek_kv", "k1", b"old")
    cat.kv_put("seek_kv", "k1", b"new")
    cat.kv_put("seek_kv", "k2", b"gone")
    cat.kv_delete("seek_kv", "k2")
    cat.kv_put("seek_kv", "k3", b"short", ttl_s=1)
    seeker = Seeker(cat, "seek_kv")
    assert seeker.get_kv("k1") == b"new"
    assert seeker.get_kv("k2") is None
    far_future = 4_000_000_000_000_000
    assert seeker.get_kv("k3", now_us=far_future) is None
    with pytest.raises(ValueError):
        seeker.multi_get(["k1"])


def test_fold_row_empty_and_marks_only():
    assert fold_row([], _schema(), now_us=NOW) == []
    marks = [("r", "", "", 10, CellOp.DEL_ROW, None, 0)]
    assert fold_row(marks, _schema(), now_us=NOW) == []


def test_client_and_cli_seek_paths(cat, spark, capsys):
    from tera_spark.client import Client

    client = Client(spark, str(cat.root))
    client.create_table("sdk_seek {c <maxversions=2>}")
    t = client.open_table("sdk_seek")
    t.put("r1", "c", "q", b"v1", ts=10)
    t.put("r1", "c", "q", b"v2", ts=20)
    t.put("r2", "c", "q", b"other", ts=5)
    assert t.get("r1", seek=True) == t.get("r1", seek=False)
    assert t.get("r1", seek=True) == {"c": {"q": [(20, b"v2"), (10, b"v1")]}}

    # CLI --seek prints the same cells as the Spark path
    from tera_spark.cli import main as cli_main

    rc = cli_main(["--root", str(cat.root), "get", "sdk_seek", "r1", "--seek"])
    seek_out = capsys.readouterr().out
    assert rc == 0 and "c:q @20 b'v2'" in seek_out


def test_scan_range_matches_spark_scan(cat, spark):
    from tera_spark.operators.scan import ScanDescriptor, scan

    rows = _gen_oplog(13, n=400)
    name = _mk_table(cat, spark, rows, name="seek_scan")
    oplog = cat.read_oplog(name)
    schema = cat.get_schema(name)
    seeker = Seeker(cat, name)

    for desc in (
        ScanDescriptor(start="row02", end="row07"),
        ScanDescriptor(start="row05"),
        ScanDescriptor(end="row03", max_versions=1),
        ScanDescriptor(start="row00", end="row09", ts_start=NOW - 40, ts_end=NOW),
    ):
        want = {
            (r.row_key, r.cf, r.qualifier, r.ts, bytes(r.value))
            for r in scan(oplog, schema, desc, now_us=NOW).collect()
        }
        got = seeker.scan_range(
            desc.start,
            desc.end,
            max_versions=desc.max_versions,
            ts_range=(desc.ts_start, desc.ts_end) if desc.ts_start else None,
            now_us=NOW,
        )
        assert {(c[0], c[1], c[2], c[3], bytes(c[4])) for c in got} == want

    # ordered emission + number_limit truncates deterministically
    full = seeker.scan_range(now_us=NOW)
    assert [c[0] for c in full] == sorted(c[0] for c in full)
    assert seeker.scan_range(now_us=NOW, number_limit=5) == full[:5]


def test_cli_scan_seek(cat, spark, capsys):
    from tera_spark.client import Client
    from tera_spark.cli import main as cli_main

    client = Client(spark, str(cat.root))
    client.create_table("cli_scan {c}")
    t = client.open_table("cli_scan")
    for i in range(5):
        t.put(f"r{i}", "c", "q", f"v{i}".encode(), ts=1)
    rc = cli_main(["--root", str(cat.root), "scan", "cli_scan",
                   "--start", "r1", "--end", "r4", "--seek"])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert [l.split()[0] for l in out] == ["r1", "r2", "r3"]


def test_multi_get_auto_routing(cat, spark):
    from tera_spark.client import Client

    client = Client(spark, str(cat.root))
    client.create_table("route_t {c}")
    t = client.open_table("route_t")
    for i in range(8):
        t.put(f"r{i}", "c", "q", f"v{i}".encode(), ts=1)

    few = t.multi_get(["r1", "r3"])                     # auto → seek
    assert {k: [c[4] for c in v] for k, v in few.items()} == {
        "r1": [b"v1"], "r3": [b"v3"],
    }
    # both explicit paths agree
    many = [f"r{i}" for i in range(8)] + ["missing"]
    via_seek = t.multi_get(many, mode="seek")
    via_join = t.multi_get(many, mode="join")
    assert via_seek == via_join and "missing" not in via_seek
    with pytest.raises(ValueError):
        t.multi_get(["r1"], mode="bogus")


def test_per_cell_ttl_view_compact_seek(cat, spark):
    """RowMutation::Put(value, ttl) — per-cell TTL on top of CF TTL
    (mutation.h:30-33): visibility at read, survival through
    compaction, and seek-path agreement."""
    import time as _t

    from tera_spark.client import Client

    client = Client(spark, str(cat.root))
    client.create_table("ttl_t {c}")
    t = client.open_table("ttl_t")
    t.put("r1", "c", "q", b"eternal", ts=1)
    t.put("r2", "c", "q", b"fresh", ts=1, ttl_s=24 * 3600)
    t.put("r3", "c", "q", b"stale", ts=1, ttl_s=60)
    # generous horizons so slow boxes can't race the clock: the puts
    # stamp expiry at commit wall time, checks sit 30 min / 48 h out
    now = int(_t.time() * 1_000_000)
    soon = now + 30 * 60 * 1_000_000
    later = now + 48 * 3600 * 1_000_000

    def visible(now_us):
        return {r.row_key for r in cat.view("ttl_t", now_us=now_us).collect()}

    assert visible(soon) == {"r1", "r2"}                   # r3 already expired
    assert visible(later) == {"r1"}                        # r2 expires too

    # seek path agrees on both horizons
    seeker = Seeker(cat, "ttl_t")
    assert set(seeker.multi_get(["r1", "r2", "r3"], now_us=soon)) == {"r1", "r2"}
    assert set(seeker.multi_get(["r1", "r2", "r3"], now_us=later)) == {"r1"}
    assert {c[0] for c in seeker.scan_range(now_us=later)} == {"r1"}

    # compaction preserves the pending expiry: r2 folds in as live,
    # but still vanishes once its TTL fires
    cat.compact_inplace("ttl_t", now_us=soon)
    assert visible(soon + 60 * 1_000_000) == {"r1", "r2"}
    assert visible(later) == {"r1"}


@pytest.mark.parametrize("seed", [3, 21])
def test_seek_matches_spark_fold_with_random_ttl(cat, spark, seed):
    """Cross-path property check including per-cell TTL: random
    op-logs where puts carry expire_ts in {past, future, NULL} must
    fold identically through the Spark view and the seek path."""
    import random

    from tera_spark.model import CELL_TTL_SCHEMA

    rng = random.Random(seed)
    rows = []
    for base in _gen_oplog(seed, n=300):
        exp = None
        if base[4] == CellOp.PUT and rng.random() < 0.4:
            exp = NOW - 5 if rng.random() < 0.5 else NOW + 10_000_000
        rows.append(base + (exp,))
    name = f"seek_ttl_{seed}"
    cat.create_table(
        f"{name} {{cf0 <maxversions=1>, cf1 <maxversions=3>, "
        f"cfttl <maxversions=2,ttl=1000>}}"
    )
    third = len(rows) // 3 or 1
    for i in range(0, len(rows), third):
        cat.append(name, spark.createDataFrame(rows[i : i + third], CELL_TTL_SCHEMA))

    want = {}
    for r in cat.view(name, now_us=NOW).collect():
        want.setdefault(r.row_key, set()).add(
            (r.row_key, r.cf, r.qualifier, r.ts, bytes(r.value))
        )
    got = Seeker(cat, name).multi_get(sorted({r[0] for r in rows}), now_us=NOW)
    got_sets = {
        k: {(c[0], c[1], c[2], c[3], bytes(c[4])) for c in v} for k, v in got.items()
    }
    assert got_sets == want
