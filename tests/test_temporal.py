"""asof_join / binned_range_join: brute-force equivalence on handcrafted
and seeded-random data, plus plan-shape assertions (one exchange for
as-of; no nested-loop/cartesian for the binned range join)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tera_spark.operators.temporal import asof_join, binned_range_join


def _brute_asof(left_rows, right_rows, how="inner"):
    """left/right: (key, ts, id). Returns {(key, ts, id): matched right id}."""
    out = {}
    for k, ts, lid in left_rows:
        cands = [(rts, rid) for rk, rts, rid in right_rows if rk == k and rts <= ts]
        if cands:
            out[(k, ts, lid)] = max(cands)[1]
        elif how == "left":
            out[(k, ts, lid)] = None
    return out


def _asof_spark(spark, left_rows, right_rows, how):
    l = spark.createDataFrame(left_rows, "k long, ts long, lid long")
    r = spark.createDataFrame(
        [(k, ts, rid, rid) for k, ts, rid in right_rows], "k long, ts long, rid long, rpay long"
    )
    j = asof_join(l, r, on=["k"], ts_col="ts", right_cols=["rid", "rpay"], how=how)
    return {(row.k, row.ts, row.lid): row.rid for row in j.collect()}


def test_asof_handcrafted(spark):
    left = [(1, 10, 100), (1, 20, 101), (1, 5, 102), (2, 7, 103), (3, 1, 104)]
    # key 1: rights at 5, 20 (tie with left@20), key 2: right after all lefts
    right = [(1, 5, 200), (1, 20, 201), (2, 9, 202)]
    got = _asof_spark(spark, left, right, "inner")
    assert got == {(1, 10, 100): 200, (1, 20, 101): 201, (1, 5, 102): 200}
    got_left = _asof_spark(spark, left, right, "left")
    assert got_left[(2, 7, 103)] is None and got_left[(3, 1, 104)] is None
    assert len(got_left) == 5


def test_asof_random_vs_brute(spark):
    rng = random.Random(7)
    left = [(rng.randint(1, 5), rng.randint(0, 50), 100 + i) for i in range(80)]
    right = [(rng.randint(1, 5), rng.randint(0, 50), 200 + i) for i in range(60)]
    # de-dupe right (key, ts) so argmax is unique and comparable
    seen, uniq = set(), []
    for k, ts, rid in right:
        if (k, ts) not in seen:
            seen.add((k, ts))
            uniq.append((k, ts, rid))
    for how in ("inner", "left"):
        assert _asof_spark(spark, left, uniq, how) == _brute_asof(left, uniq, how)


def test_asof_null_payload_does_not_leak_older_value(spark):
    # newest matching right row has a NULL payload column; the join must
    # return that NULL, not an older row's non-null payload
    l = spark.createDataFrame([(1, 30, 1)], "k long, ts long, lid long")
    r = spark.createDataFrame([(1, 10, 9, 9), (1, 20, 8, None)], "k long, ts long, rid long, rpay long")
    row = asof_join(l, r, on=["k"], ts_col="ts", right_cols=["rid", "rpay"]).collect()[0]
    assert row.rid == 8 and row.rpay is None


def test_asof_single_exchange(spark):
    l = spark.createDataFrame([(1, 10, 1)], "k long, ts long, lid long")
    r = spark.createDataFrame([(1, 5, 2, 2)], "k long, ts long, rid long, rpay long")
    plan = asof_join(l, r, on=["k"], ts_col="ts", right_cols=["rid"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan  # union+window, not a join operator


def test_binned_range_join_vs_nested_loop(spark):
    rng = random.Random(11)
    pts = [(i, rng.randint(0, 1000)) for i in range(200)]
    ivs = []
    for i in range(30):
        s = rng.randint(0, 950)
        ivs.append((1000 + i, s, s + rng.randint(0, 120)))
    p = spark.createDataFrame(pts, "pid long, x long")
    v = spark.createDataFrame(ivs, "wid long, s long, e long")
    got = {
        (r.wid, r.pid)
        for r in binned_range_join(p, v, "x", "s", "e", bin_width=64).collect()
    }
    want = {(wid, pid) for pid, x in pts for wid, s, e in ivs if s <= x <= e}
    assert got == want
    # multiplicity check: exactly-once per qualifying pair
    cnt = binned_range_join(p, v, "x", "s", "e", bin_width=64).count()
    assert cnt == len(want)


def test_binned_range_join_no_nested_loop_plan(spark):
    p = spark.createDataFrame([(1, 5)], "pid long, x long")
    v = spark.createDataFrame([(9, 0, 10)], "wid long, s long, e long")
    plan = binned_range_join(p, v, "x", "s", "e", bin_width=8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_asof_forward_direction(spark):
    l = spark.createDataFrame([(1, 10, 1), (1, 30, 2), (2, 5, 3)], "k long, ts long, lid long")
    r = spark.createDataFrame(
        [(1, 10, 100, 0), (1, 20, 101, 0), (2, 1, 102, 0)], "k long, ts long, rid long, rpay long"
    )
    got = {
        (row.k, row.ts, row.lid): row.rid
        for row in asof_join(
            l, r, on=["k"], ts_col="ts", right_cols=["rid"], direction="forward"
        ).collect()
    }
    # tie at ts=10 matches; left@30 has no later right; left@5(k=2) has none after
    assert got == {(1, 10, 1): 100}
    got_left = {
        (row.k, row.ts, row.lid): row.rid
        for row in asof_join(
            l, r, on=["k"], ts_col="ts", right_cols=["rid"], direction="forward", how="left"
        ).collect()
    }
    assert got_left == {(1, 10, 1): 100, (1, 30, 2): None, (2, 5, 3): None}


def test_subsequence_topk_finds_planted_pattern(spark):
    from tera_spark.operators.temporal import subsequence_topk

    # user A carries an exact square pulse at offset 3; user B is a ramp
    a_vals = [5.0, 5.0, 5.0, 0.0, 0.0, 3.0, 3.0, 0.0, 0.0, 5.0]
    b_vals = [float(i) for i in range(10)]
    rows = [("A", i, v) for i, v in enumerate(a_vals)] + [
        ("B", i, v) for i, v in enumerate(b_vals)
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts long, value double")
    top = subsequence_topk(ev, [0.0, 0.0, 3.0, 3.0, 0.0, 0.0], k=3).collect()
    assert (top[0].user_id, top[0].start, top[0].dist) == ("A", 3, 0.0)
    # flat windows (zero variance) are excluded entirely
    flat = spark.createDataFrame(
        [("C", i, 1.0) for i in range(8)], "user_id string, ts long, value double"
    )
    assert subsequence_topk(flat, [0.0, 1.0, 0.0, 1.0, 0.0, 1.0]).count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        subsequence_topk(ev, [1.0, 1.0, 1.0])
