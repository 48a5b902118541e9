"""Streaming sketch maintenance (streaming/sketch_fold.py): per-epoch
partial folds must answer exactly like one batch build, replays must
be idempotent, and the real foreachBatch path must drive the fold."""

from __future__ import annotations

from pyspark.sql import functions as F

from tera_spark.operators.sketches import cms_heavy_hitters, theta_set_ops, theta_sketch
from tera_spark.sources.tables import load
from tera_spark.streaming.sketch_fold import SketchFold

SF = "/root/testdata/sf0.001"


def _events(spark):
    return load(spark, SF, "events")


def test_folded_cms_equals_batch_cms(spark, tmp_path):
    ev = _events(spark)
    fold = SketchFold(spark, str(tmp_path / "sk"), key_col="user_id")
    for e in range(3):
        fold.fold(ev.filter(f"event_id % 3 = {e}"), e)
    keys = ev.select("user_id").distinct()
    got = {r.user_id: r.cms_count for r in fold.estimate(keys).collect()}
    want = {
        r.user_id: r.cms_count
        for r in cms_heavy_hitters(ev, key_col="user_id", top_k=10_000).collect()
    }
    assert got == want


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    ev = _events(spark)
    fold = SketchFold(spark, str(tmp_path / "sk"), key_col="user_id")
    fold.fold(ev.filter("event_id % 2 = 0"), 0)
    fold.fold(ev.filter("event_id % 2 = 1"), 1)
    keys = ev.select("user_id").distinct()
    before = {r.user_id: r.cms_count for r in fold.estimate(keys).collect()}
    fold.fold(ev.filter("event_id % 2 = 1"), 1)  # replay epoch 1
    after = {r.user_id: r.cms_count for r in fold.estimate(keys).collect()}
    assert before == after


def test_folded_theta_equals_batch_theta(spark, tmp_path):
    ev = _events(spark).withColumn("g", F.col("event_type"))
    fold = SketchFold(
        spark, str(tmp_path / "sk"), key_col="user_id", group_col="g", k=8
    )
    for e in range(4):
        fold.fold(ev.filter(f"event_id % 4 = {e}"), e)
    pairs = spark.createDataFrame(
        [("click", "purchase"), ("view", "error")], "ga string, gb string"
    )
    got = {(r.ga, r.gb): r for r in fold.set_ops(pairs).collect()}
    sk, th = theta_sketch(ev, key_col="user_id", group_col="g", k=8)
    want = {(r.ga, r.gb): r for r in theta_set_ops(sk, th, pairs).collect()}
    assert set(got) == set(want)
    for key, g in got.items():
        w = want[key]
        assert (g.est_union, g.est_intersect, g.est_a, g.est_b) == (
            w.est_union,
            w.est_intersect,
            w.est_a,
            w.est_b,
        )


def test_streaming_foreachbatch_drives_fold(spark, tmp_path):
    """The real Structured Streaming path: events written as files,
    consumed availableNow, folded per micro-batch; merged answers match
    the batch sketch."""
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.filter("event_id % 2 = 0").write.parquet(src + "/p0")
    ev.filter("event_id % 2 = 1").write.parquet(src + "/p1")
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in ev.schema.fields)

    fold = SketchFold(spark, str(tmp_path / "sk"), key_col="user_id")
    q = fold.stream(src + "/p*", str(tmp_path / "ck"), schema)
    q.awaitTermination(120)

    keys = ev.select("user_id").distinct()
    got = {r.user_id: r.cms_count for r in fold.estimate(keys).collect()}
    want = {
        r.user_id: r.cms_count
        for r in cms_heavy_hitters(ev, key_col="user_id", top_k=10_000).collect()
    }
    assert got == want
