"""Differential property test: an independent pure-Python model of the
cell-visibility semantics (the documented contract of
operators/view.py, i.e. the reference's ScanDrop + AtomicMergeStrategy
behavior — src/io/default_compact_strategy.cc:275-402,
src/io/atomic_merge_strategy.cc:59-109) is run against randomized
op-logs and must agree cell-for-cell with `current_view`.

Unlike tests/test_compact.py (internal consistency: compact≡view),
this checks the *semantics themselves* against a second
implementation, transliterating the reference's scan-loop state
machine into plain Python.

The generator keeps each qualifier "typed" (counter / append / text),
mirroring real tera usage — merging an ADD into a 3-byte text PUT is
codec-undefined in both implementations and not a behavior we pin.
"""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from tera_spark.functions.codecs import (
    py_decode_be_i64,
    py_decode_le_i64,
    py_encode_be_i64,
    py_encode_le_i64,
)
from tera_spark.model import CELL_SCHEMA, CellOp
from tera_spark.operators.view import current_view
from tera_spark.registry import TableSchema

NOW = 2_000_000_000_000_000

# qualifier → allowed data ops (PUT values typed to match the merge kind)
QUAL_KINDS = {
    "cnt": (CellOp.ADD,),
    "cn2": (CellOp.ADDINT64,),
    "log": (CellOp.APPEND,),
    "txt": (CellOp.PUT_IFABSENT,),
}


def _schema() -> TableSchema:
    t = TableSchema("t")
    t.add_column_family("cf0", max_versions=1)
    t.add_column_family("cf1", max_versions=3)
    t.add_column_family("cfttl", max_versions=2, ttl=1000)  # seconds
    return t


def _gen_oplog(seed: int, n: int = 500) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    cfs = ["cf0", "cf1", "cfttl", "zz_illegal"]
    quals = list(QUAL_KINDS)
    for seq in range(n):
        r = rng.random()
        rk = f"row{rng.randrange(10):02d}"
        cf = rng.choice(cfs)
        qu = rng.choice(quals)
        # cfttl: half the cells land beyond the 1000 s TTL horizon
        if cf == "cfttl" and rng.random() < 0.5:
            ts = rng.randrange(1, 60)
        else:
            ts = NOW - rng.randrange(1, 60)
        if r < 0.03:
            rows.append((rk, "", "", ts, CellOp.DEL_ROW, None, seq))
        elif r < 0.08:
            rows.append((rk, cf, "", ts, CellOp.DEL_FAMILY, None, seq))
        elif r < 0.14:
            rows.append((rk, cf, qu, ts, CellOp.DEL_QUALIFIERS, None, seq))
        elif r < 0.22:
            rows.append((rk, cf, qu, ts, CellOp.DEL_QUALIFIER, None, seq))
        else:
            kind = QUAL_KINDS[qu][0]
            if rng.random() < 0.45:  # a PUT (typed for the column)
                if kind == CellOp.ADD:
                    val = py_encode_be_i64(rng.randrange(0, 1000))
                elif kind == CellOp.ADDINT64:
                    val = py_encode_le_i64(rng.randrange(0, 1000))
                else:
                    val = f"v{seq % 13}".encode()
                rows.append((rk, cf, qu, ts, CellOp.PUT, val, seq))
            else:
                if kind == CellOp.ADD:
                    val = py_encode_be_i64(rng.randrange(-5, 10))
                elif kind == CellOp.ADDINT64:
                    val = py_encode_le_i64(rng.randrange(-5, 10))
                else:
                    val = f"x{seq % 7}".encode()
                rows.append((rk, cf, qu, ts, kind, val, seq))
    return rows


# --- the model ------------------------------------------------------------

ATOMIC = {CellOp.ADD, CellOp.ADDINT64, CellOp.APPEND, CellOp.PUT_IFABSENT}


def model_view(rows: list[tuple], schema: TableSchema, now_us: int) -> set[tuple]:
    cf_props = {c.name: c for c in schema.column_families.values()}

    neg_inf = -(1 << 62)
    del_row = defaultdict(lambda: neg_inf)
    del_cf = defaultdict(lambda: neg_inf)
    del_qu = defaultdict(lambda: neg_inf)
    for rk, cf, qu, ts, op, val, seq in rows:
        if op == CellOp.DEL_ROW:
            del_row[rk] = max(del_row[rk], ts)
        elif op == CellOp.DEL_FAMILY:
            del_cf[(rk, cf)] = max(del_cf[(rk, cf)], ts)
        elif op == CellOp.DEL_QUALIFIERS:
            del_qu[(rk, cf, qu)] = max(del_qu[(rk, cf, qu)], ts)

    cols = defaultdict(list)
    for rk, cf, qu, ts, op, val, seq in rows:
        if op in (CellOp.DEL_ROW, CellOp.DEL_FAMILY, CellOp.DEL_QUALIFIERS):
            continue
        if ts <= max(del_row[rk], del_cf[(rk, cf)], del_qu[(rk, cf, qu)]):
            continue
        if cf not in cf_props:
            continue
        ttl = cf_props[cf].ttl
        if op >= CellOp.PUT and ttl > 0 and ts < now_us - ttl * 1_000_000:
            continue
        cols[(rk, cf, qu)].append((ts, op, val, seq))

    out = set()
    for (rk, cf, qu), entries in cols.items():
        maxv = cf_props[cf].max_versions
        # scan order: ts desc, op asc (delete marks before values), seq desc
        entries.sort(key=lambda x: (-x[0], x[1], -x[3]))
        # leading run of atomic ops
        run = 0
        while run < len(entries) and entries[run][1] in ATOMIC:
            run += 1
        glen = run + (
            1 if run > 0 and run < len(entries) and entries[run][1] == CellOp.PUT else 0
        )
        grp, rest = entries[:glen], entries[glen:]
        if run > 0 and maxv >= 1:
            kind = grp[0][1]
            # same-ts dedup for atomic entries (vs the raw previous entry)
            deduped = [
                x
                for i, x in enumerate(grp)
                if x[1] == CellOp.PUT or i == 0 or x[0] != grp[i - 1][0]
            ]
            mergeable = [x for x in deduped if x[1] in (kind, CellOp.PUT)]
            if kind == CellOp.ADD:
                val = py_encode_be_i64(
                    _wrap(sum(py_decode_be_i64(x[2]) for x in mergeable))
                )
            elif kind == CellOp.ADDINT64:
                val = py_encode_le_i64(
                    _wrap(sum(py_decode_le_i64(x[2]) for x in mergeable))
                )
            elif kind == CellOp.APPEND:
                val = b"".join(x[2] for x in reversed(mergeable))
            else:  # PUT_IFABSENT: oldest wins
                val = mergeable[-1][2]
            out.add((rk, cf, qu, grp[0][0], val))
        # remainder: DEL_QUALIFIER arming + version cap
        vnum = 1 if run > 0 else 0
        prev = 0
        for ts, op, val, seq in rest:
            consumed = prev == CellOp.DEL_QUALIFIER
            if op == CellOp.PUT:
                vnum += 1
                if not consumed and vnum <= maxv:
                    out.add((rk, cf, qu, ts, val))
            prev = op
    return out


def _wrap(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


@pytest.mark.parametrize("seed", [3, 17, 91, 2024])
def test_view_matches_independent_model(spark, seed):
    rows = _gen_oplog(seed)
    schema = _schema()
    got = {
        (r.row_key, r.cf, r.qualifier, r.ts, bytes(r.value) if r.value is not None else None)
        for r in current_view(
            spark.createDataFrame(rows, CELL_SCHEMA), schema, now_us=NOW
        ).collect()
    }
    want = model_view(rows, schema, NOW)
    missing, extra = want - got, got - want
    assert got == want, f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}"


# --- hypothesis: the same differential property under minimized,
# adversarial op-logs (shrinking finds minimal counterexamples; the
# seeded generator above covers volume) -----------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _oplogs(draw):
    n = draw(st.integers(min_value=4, max_value=40))
    rows = []
    for seq in range(n):
        rk = f"row{draw(st.integers(0, 2))}"
        cf = draw(st.sampled_from(["cf0", "cf1", "cfttl", "zz_illegal"]))
        qu = draw(st.sampled_from(sorted(QUAL_KINDS)))
        if cf == "cfttl" and draw(st.booleans()):
            ts = draw(st.integers(1, 59))  # beyond the TTL horizon
        else:
            ts = NOW - draw(st.integers(1, 12))  # tight range -> ts collisions
        kind = draw(
            st.sampled_from(
                ["put", "put", "atomic", "atomic", "del_row", "del_cf", "del_qus", "del_qu"]
            )
        )
        dkind = QUAL_KINDS[qu][0]
        if kind == "del_row":
            rows.append((rk, "", "", ts, CellOp.DEL_ROW, None, seq))
        elif kind == "del_cf":
            rows.append((rk, cf, "", ts, CellOp.DEL_FAMILY, None, seq))
        elif kind == "del_qus":
            rows.append((rk, cf, qu, ts, CellOp.DEL_QUALIFIERS, None, seq))
        elif kind == "del_qu":
            rows.append((rk, cf, qu, ts, CellOp.DEL_QUALIFIER, None, seq))
        else:
            iv = draw(st.integers(-5, 1000))
            if dkind == CellOp.ADD:
                val = py_encode_be_i64(iv)
            elif dkind == CellOp.ADDINT64:
                val = py_encode_le_i64(iv)
            else:
                val = f"v{iv % 13}".encode()
            rows.append(
                (rk, cf, qu, ts, CellOp.PUT if kind == "put" else dkind, val, seq)
            )
    return rows


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_oplogs())
def test_view_model_property_hypothesis(spark, rows):
    schema = _schema()
    got = {
        (r.row_key, r.cf, r.qualifier, r.ts, bytes(r.value) if r.value is not None else None)
        for r in current_view(
            spark.createDataFrame(rows, CELL_SCHEMA), schema, now_us=NOW
        ).collect()
    }
    want = model_view(rows, schema, NOW)
    assert got == want, f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"


# --- KV mode: LWW fold + tombstones + TTL vs a dict replay model ---------

@st.composite
def _kv_oplogs(draw):
    n = draw(st.integers(min_value=3, max_value=30))
    rows = []
    for seq in range(n):
        key = f"k{draw(st.integers(0, 3))}"
        kind = draw(st.sampled_from(["put", "put", "put_ttl_live", "put_ttl_dead", "del"]))
        if kind == "del":
            rows.append((key, None, None, seq))
        else:
            val = f"v{draw(st.integers(0, 9))}".encode()
            expire = {
                "put": None,
                "put_ttl_live": NOW + 10_000_000,
                "put_ttl_dead": NOW - draw(st.integers(1, 1000)),
            }[kind]
            rows.append((key, val, expire, seq))
    return rows


def _kv_model(rows, now_us):
    last = {}
    for key, val, expire, seq in sorted(rows, key=lambda r: r[3]):
        last[key] = (val, expire)
    out = {}
    for key, (val, expire) in last.items():
        if val is None:
            continue  # tombstone
        if expire is not None and 0 < expire <= now_us:
            continue  # expired
        out[key] = val
    return out


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_kv_oplogs())
def test_kv_view_model_property_hypothesis(spark, rows):
    from tera_spark.model import KV_OPLOG_SCHEMA
    from tera_spark.operators.view import kv_current_view

    got = {
        r.key: bytes(r.value)
        for r in kv_current_view(
            spark.createDataFrame(rows, KV_OPLOG_SCHEMA), now_us=NOW
        ).collect()
    }
    assert got == _kv_model(rows, NOW)


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("maxv", [1, 2, 3])
def test_put_only_fast_path_matches_general(spark, seed, maxv):
    """view.py put_only promise: on any PUT-only op-log the fast fold
    (max_by for K=1, sliced sort for K>1) is cell-identical to the
    general delete/merge-aware fold — including ts ties broken by seq,
    per-cell TTL expiry, and snapshot_seq bounds."""
    rng = random.Random(seed)
    rows = []
    for i in range(400):
        rk = f"r{rng.randrange(20):03d}"
        cf = rng.choice(["A", "B"])
        qu = f"q{rng.randrange(4)}"
        ts = rng.randrange(1, 8)  # dense → plenty of ts ties
        ttl = rng.choice([None, None, None, 1])  # some already-expired cells
        exp = (NOW - 10) if ttl else None
        rows.append((rk, cf, qu, ts, CellOp.PUT, f"v{i}".encode(), i, exp))
    df = spark.createDataFrame(
        rows,
        "row_key string, cf string, qualifier string, ts long, op int, "
        "value binary, seq long, expire_ts long",
    )
    schema = (
        TableSchema(name="t")
        .add_column_family("A", max_versions=maxv)
        .add_column_family("B", max_versions=1)  # mixed K exercises the map
    )
    for snap in (None, 200):
        kw = dict(now_us=NOW, snapshot_seq=snap)
        fast = {tuple(r) for r in current_view(df, schema, put_only=True, **kw).collect()}
        slow = {tuple(r) for r in current_view(df, schema, put_only=False, **kw).collect()}
        assert fast == slow
    # no-schema path (default_max_versions governs)
    fast = {tuple(r) for r in current_view(df, None, put_only=True, now_us=NOW,
                                           default_max_versions=maxv).collect()}
    slow = {tuple(r) for r in current_view(df, None, put_only=False, now_us=NOW,
                                           default_max_versions=maxv).collect()}
    assert fast == slow


def test_catalog_routes_put_only_tables_to_fast_fold(spark, tmp_path):
    """Commit records carry the batch's op kinds; a table whose whole
    history is PUT-only reads through the fast fold, and the first
    non-PUT commit permanently demotes it to the general fold."""
    from tera_spark.catalog import Catalog
    from tera_spark.operators.mutation import MutationBatch

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table("t { A }")
    b = MutationBatch(base_seq=1)
    b.put("r1", "A", "q", "v1", ts=5).put("r1", "A", "q", "v2", ts=9)
    assert b.op_kinds == [CellOp.PUT]
    cat.append("t", b.to_df(spark), commit_seq=2, op_kinds=b.op_kinds)
    assert cat._put_only("t")
    got = {(r.row_key, r.ts, bytes(r.value)) for r in cat.view("t").collect()}
    assert got == {("r1", 9, b"v2")}

    d = MutationBatch(base_seq=3)
    d.delete_column("r1", "A", "q", ts=9)
    cat.append("t", d.to_df(spark), commit_seq=3, op_kinds=d.op_kinds)
    assert not cat._put_only("t")
    assert cat.view("t").count() == 0  # the delete is honored


def test_major_compaction_upgrades_to_fast_fold(spark, tmp_path):
    """compact() emits an all-PUT seq-0 base, so major compaction
    re-seeds the commit history and upgrades a previously demoted
    table back to the PUT-only fast fold — with identical visible
    cells before and after."""
    from tera_spark.catalog import Catalog
    from tera_spark.operators.mutation import MutationBatch

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table("t { A }")
    b = MutationBatch(base_seq=1)
    b.put("r1", "A", "q", "v1", ts=5).put("r2", "A", "q", "vx", ts=5)
    cat.append("t", b.to_df(spark), commit_seq=2, op_kinds=b.op_kinds)
    d = MutationBatch(base_seq=3)
    d.delete_row("r2", ts=9)
    cat.append("t", d.to_df(spark), commit_seq=3, op_kinds=d.op_kinds)
    assert not cat._put_only("t")
    before = {(r.row_key, r.ts, bytes(r.value)) for r in cat.view("t").collect()}

    cat.compact_inplace("t", now_us=NOW)
    assert cat._put_only("t")
    after = {(r.row_key, r.ts, bytes(r.value)) for r in cat.view("t").collect()}
    assert after == before == {("r1", 5, b"v1")}


@pytest.mark.parametrize("seed", [5, 6])
@pytest.mark.parametrize("kind", [CellOp.ADD, CellOp.ADDINT64])
def test_counter_only_fast_path_matches_general(spark, seed, kind):
    """view.py counter_only promise: on a pure-ADD (or pure-ADDINT64)
    op-log the stacked-agg SUM fold is cell-identical to the general
    fold — including same-ts dedup (colliding timestamps keep only the
    max-seq delta) and negative deltas."""
    enc = py_encode_be_i64 if kind == CellOp.ADD else py_encode_le_i64
    rng = random.Random(seed)
    rows = []
    for i in range(400):
        rk = f"r{rng.randrange(15):03d}"
        qu = f"q{rng.randrange(3)}"
        ts = rng.randrange(1, 6)  # dense → same-ts dedup exercised
        rows.append((rk, "A", qu, ts, kind, enc(rng.randrange(-50, 100)), i))
    df = spark.createDataFrame(rows, CELL_SCHEMA)
    schema = TableSchema(name="t").add_column_family("A", max_versions=1)
    fast = {tuple(r) for r in current_view(df, schema, now_us=NOW,
                                           counter_only=kind).collect()}
    slow = {tuple(r) for r in current_view(df, schema, now_us=NOW).collect()}
    assert fast == slow and fast


def test_catalog_routes_counter_tables_to_sum_fold(spark, tmp_path):
    """A table whose whole commit history is Add-only reads through
    the counter fold; mixing in a PUT demotes it to the general fold
    (PUT resets the merge base — only the general fold knows that)."""
    from tera_spark.catalog import Catalog
    from tera_spark.functions.codecs import py_decode_be_i64
    from tera_spark.operators.mutation import MutationBatch

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table("t { A }")
    b = MutationBatch(base_seq=1)
    b.add("r1", "A", "hits", 5, ts=1).add("r1", "A", "hits", 7, ts=2)
    cat.append("t", b.to_df(spark), commit_seq=2, op_kinds=b.op_kinds)
    assert cat._op_kinds_union("t") == {CellOp.ADD}
    got = cat.view("t").collect()
    assert [(r.row_key, py_decode_be_i64(bytes(r.value))) for r in got] == [("r1", 12)]

    p = MutationBatch(base_seq=3)
    p.put("r1", "A", "hits", py_encode_be_i64(100), ts=3)
    cat.append("t", p.to_df(spark), commit_seq=3, op_kinds=p.op_kinds)
    assert cat._op_kinds_union("t") == {CellOp.ADD, CellOp.PUT}
    got = cat.view("t").collect()  # general fold: PUT resets the base
    assert [(r.row_key, py_decode_be_i64(bytes(r.value))) for r in got] == [("r1", 100)]


def test_snapshot_compaction_uses_fast_fold_and_preserves_semantics(spark, tmp_path):
    """Catalog.snapshot derives the fold hint from commit records; a
    counter table's compacted base materializes the merged sum as a
    PUT and stays byte-identical to the pre-compaction view."""
    from tera_spark.catalog import Catalog
    from tera_spark.functions.codecs import py_decode_be_i64
    from tera_spark.operators.mutation import MutationBatch

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table("t { A }")
    b = MutationBatch(base_seq=1)
    b.add("r1", "A", "hits", 5, ts=1).add("r1", "A", "hits", 7, ts=2).add("r2", "A", "hits", -3, ts=1)
    cat.append("t", b.to_df(spark), commit_seq=3, op_kinds=b.op_kinds)
    before = {(r.row_key, py_decode_be_i64(bytes(r.value))) for r in cat.view("t").collect()}
    cat.compact_inplace("t", now_us=NOW)
    after = {(r.row_key, py_decode_be_i64(bytes(r.value))) for r in cat.view("t").collect()}
    assert after == before == {("r1", 12), ("r2", -3)}
    assert cat._put_only("t")  # counter table upgraded to PUT-only base


@st.composite
def _put_only_oplogs(draw):
    n = draw(st.integers(min_value=2, max_value=30))
    rows = []
    for seq in range(n):
        rk = f"row{draw(st.integers(0, 2))}"
        cf = draw(st.sampled_from(["A", "B"]))
        qu = f"q{draw(st.integers(0, 2))}"
        ts = draw(st.integers(1, 6))  # tight → heavy ts ties
        rows.append((rk, cf, qu, ts, CellOp.PUT, f"v{seq}".encode(), seq))
    return rows


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=_put_only_oplogs(), maxv=st.integers(1, 3))
def test_hypothesis_put_only_fast_path(spark, rows, maxv):
    """Shrinking search for any PUT-only op-log where the fast fold
    and the general fold disagree (minimal counterexamples beat the
    seeded volume test at pinpointing tie-break bugs)."""
    df = spark.createDataFrame(rows, CELL_SCHEMA)
    schema = (
        TableSchema(name="t")
        .add_column_family("A", max_versions=maxv)
        .add_column_family("B", max_versions=1)
    )
    fast = {tuple(r) for r in current_view(df, schema, now_us=NOW, put_only=True).collect()}
    slow = {tuple(r) for r in current_view(df, schema, now_us=NOW).collect()}
    assert fast == slow


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    deltas=st.lists(
        st.tuples(st.integers(0, 2), st.integers(1, 4), st.integers(-50, 100)),
        min_size=1,
        max_size=25,
    )
)
def test_hypothesis_counter_fast_path(spark, deltas):
    """Same shrinking search for the counter fold (ADD), with dense
    ts collisions so same-ts dedup is always in play."""
    rows = [
        (f"r{rk}", "A", "q", ts, CellOp.ADD, py_encode_be_i64(d), seq)
        for seq, (rk, ts, d) in enumerate(deltas)
    ]
    df = spark.createDataFrame(rows, CELL_SCHEMA)
    schema = TableSchema(name="t").add_column_family("A", max_versions=1)
    fast = {
        tuple(r)
        for r in current_view(df, schema, now_us=NOW, counter_only=CellOp.ADD).collect()
    }
    slow = {tuple(r) for r in current_view(df, schema, now_us=NOW).collect()}
    assert fast == slow


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_no_atomics_fast_path_matches_general(spark, seed):
    """view.py no_atomics promise: on a PUT+tombstone op-log (all four
    delete granularities, multi-version columns, chained single-
    version deletes, same-ts collisions) the merge-free fold is
    cell-identical to the general fold — every merge run would be
    empty, so skipping run detection cannot change results."""
    rng = random.Random(seed)
    ops = [CellOp.PUT] * 6 + [
        CellOp.DEL_ROW, CellOp.DEL_FAMILY, CellOp.DEL_QUALIFIERS, CellOp.DEL_QUALIFIER
    ]
    rows = []
    for i in range(500):
        op = rng.choice(ops)
        rk = f"r{rng.randrange(12):03d}"
        ts = rng.randrange(1, 8)
        if op == CellOp.DEL_ROW:
            rows.append((rk, "", "", ts, op, None, i))
        elif op == CellOp.DEL_FAMILY:
            rows.append((rk, rng.choice(["A", "B"]), "", ts, op, None, i))
        else:
            qu = f"q{rng.randrange(3)}"
            val = f"v{i}".encode() if op == CellOp.PUT else None
            rows.append((rk, rng.choice(["A", "B"]), qu, ts, op, val, i))
    df = spark.createDataFrame(rows, CELL_SCHEMA)
    schema = (
        TableSchema(name="t")
        .add_column_family("A", max_versions=2)
        .add_column_family("B", max_versions=1)
    )
    fast = {tuple(r) for r in current_view(df, schema, now_us=NOW, no_atomics=True).collect()}
    slow = {tuple(r) for r in current_view(df, schema, now_us=NOW).collect()}
    assert fast == slow and fast


def test_catalog_routes_tombstone_tables_to_merge_free_fold(spark, tmp_path):
    """A table whose commit history holds only puts and deletes reads
    through the merge-free fold; an Add demotes it to the general
    fold (only that fold merges counters)."""
    from tera_spark.catalog import Catalog
    from tera_spark.operators.mutation import MutationBatch

    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.create_table("t { A }")
    b = MutationBatch(base_seq=1)
    b.put("r1", "A", "q", "v1", ts=1).put("r2", "A", "q", "v2", ts=1)
    b.delete_row("r2", ts=2)
    cat.append("t", b.to_df(spark), commit_seq=3, op_kinds=b.op_kinds)
    assert cat.fold_hints("t") == {"no_atomics": True}
    assert {r.row_key for r in cat.view("t").collect()} == {"r1"}

    b2 = MutationBatch(base_seq=4)
    b2.add("r1", "A", "n", 5, ts=3)
    cat.append("t", b2.to_df(spark), commit_seq=4, op_kinds=b2.op_kinds)
    assert cat.fold_hints("t") == {}
