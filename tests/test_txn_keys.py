"""Single-row transactions (conflict detection) and hash-distributed
row keys (round-trip + distribution)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tera_spark.functions.keys import (
    hash_prefix_key,
    strip_hash_prefix,
    with_hashed_row_key,
    with_plain_row_key,
)
from tera_spark.model import CellOp
from tera_spark.operators.mutation import MutationBatch
from tera_spark.operators.txn import RowTxnConflict, start_row_transaction
from tera_spark.operators.view import current_view
from tera_spark.registry import TableSchema

NOW = 2_000_000_000_000_000


def _schema():
    return TableSchema("t").add_column_family("cf0", max_versions=1)


def test_row_txn_commit_applies(spark):
    base = MutationBatch().put("r1", "cf0", "q", "v1", ts=10).to_df(spark)
    txn = start_row_transaction(base, _schema(), "r1", now_us=NOW)
    assert txn.read("cf0", "q") == b"v1"
    txn.put("cf0", "q", "v2", ts=20)
    out = txn.commit()
    v = current_view(base.unionByName(out), _schema(), now_us=NOW)
    assert bytes(v.collect()[0].value) == b"v2"


def test_row_txn_conflict_detected(spark):
    base = MutationBatch().put("r1", "cf0", "q", "v1", ts=10).to_df(spark)
    txn = start_row_transaction(base, _schema(), "r1", now_us=NOW)
    txn.put("cf0", "q", "mine", ts=20)
    # concurrent writer lands on the same row before commit
    other = MutationBatch(base_seq=50).put("r1", "cf0", "q", "theirs", ts=15).to_df(spark)
    with pytest.raises(RowTxnConflict):
        txn.commit(current_cells=base.unionByName(other))


def test_row_txn_other_rows_do_not_conflict(spark):
    base = MutationBatch().put("r1", "cf0", "q", "v1", ts=10).to_df(spark)
    txn = start_row_transaction(base, _schema(), "r1", now_us=NOW)
    txn.put("cf0", "q", "mine", ts=20)
    other = MutationBatch(base_seq=50).put("r2", "cf0", "q", "x", ts=15).to_df(spark)
    out = txn.commit(current_cells=base.unionByName(other))
    assert out.count() == 1


def test_hash_key_round_trip(spark):
    df = spark.createDataFrame([(f"user{i:04d}",) for i in range(200)], "row_key string")
    hashed = with_hashed_row_key(df)
    back = with_plain_row_key(hashed)
    assert sorted(r.row_key for r in back.collect()) == sorted(
        r.row_key for r in df.collect()
    )
    one = hashed.limit(1).collect()[0].row_key
    assert len(one) == 16 + len("user0000")


def test_hash_key_spreads_monotonic_keys(spark):
    # sequential keys land in one range; hashed keys spread across the
    # keyspace — check the first hex nibble covers many buckets
    df = spark.createDataFrame([(f"2026-08-13-{i:06d}",) for i in range(512)], "k string")
    nibbles = (
        df.select(F.substring(hash_prefix_key(F.col("k")), 1, 1).alias("n"))
        .distinct()
        .count()
    )
    assert nibbles >= 12  # of 16 possible


def test_hash_key_deterministic(spark):
    df = spark.createDataFrame([("abc",)], "k string")
    a = df.select(hash_prefix_key(F.col("k")).alias("h")).collect()[0].h
    b = df.select(hash_prefix_key(F.col("k")).alias("h")).collect()[0].h
    assert a == b and a.endswith("abc")


def test_strip_is_inverse_expression(spark):
    df = spark.createDataFrame([("k1",), ("a much longer key value",)], "k string")
    out = df.select(
        strip_hash_prefix(hash_prefix_key(F.col("k"))).alias("k2"), "k"
    ).collect()
    for r in out:
        assert r.k2 == r.k


def test_salted_agg_matches_direct(spark):
    from pyspark.sql import functions as F

    from tera_spark.functions.keys import salted_agg

    # one hot key holding ~90% of rows, many distinct values
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 1777).alias("v"),
    )
    got = salted_agg(
        df,
        ["k"],
        {
            "n_distinct": ("count_distinct", "v"),
            "total": ("sum", "v"),
            "n": ("count", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
        },
        salt_buckets=8,
    )
    want = df.groupBy("k").agg(
        F.countDistinct("v").alias("n_distinct"),
        F.sum("v").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
