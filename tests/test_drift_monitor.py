"""Streaming PSI drift monitor (streaming/drift.py): same-distribution
batches stay under the watch bar, shifted batches alert, replays are
idempotent, and the batch-twin math agrees with events_drift_psi."""

from __future__ import annotations

from pyspark.sql import functions as F

from tera_spark.sources.tables import load
from tera_spark.streaming.drift import DriftMonitor

SF = "/root/testdata/sf0.01"


def _mon(spark, tmp_path) -> DriftMonitor:
    mon = DriftMonitor(spark, str(tmp_path / "drift"), lo=0.0, hi=200.0, bins=20)
    ev = load(spark, SF, "events")
    mon.set_reference(ev.filter("ts < '2024-01-16'"))
    return mon


def test_same_distribution_stays_calm_shifted_alerts(spark, tmp_path):
    mon = _mon(spark, tmp_path)
    ev = load(spark, SF, "events")
    calm = {r.g: r.psi_nano for r in mon.observe(ev.filter("ts >= '2024-01-16'"), 0).collect()}
    assert calm and all(p < 100_000_000 for p in calm.values()), calm  # < 0.1

    shifted = ev.filter("ts >= '2024-01-16'").withColumn("value", F.col("value") * 3.0)
    hot = {r.g: r.psi_nano for r in mon.observe(shifted, 1).collect()}
    assert all(hot[g] > calm[g] for g in calm), (calm, hot)
    assert mon.alerts().filter("epoch = 1").count() == len(hot)
    assert mon.alerts().filter("epoch = 0").count() == 0


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    mon = _mon(spark, tmp_path)
    ev = load(spark, SF, "events").filter("ts >= '2024-01-16'")
    mon.observe(ev, 0)
    before = {(r.epoch, r.g): r.psi_nano for r in mon.log().collect()}
    mon.observe(ev, 0)  # replay
    after = {(r.epoch, r.g): r.psi_nano for r in mon.log().collect()}
    assert before == after


def test_monitor_agrees_with_batch_twin(spark, tmp_path):
    """Reference = first half, one batch = second half → identical
    psi_nano to the events_drift_psi batch query (same formula on the
    same slices; only the spine's bin range is configured to match)."""
    from tera_spark.queries.curation import events_drift_psi

    mon = _mon(spark, tmp_path)
    ev = load(spark, SF, "events")
    got = {r.g: r.psi_nano for r in mon.observe(ev.filter("ts >= '2024-01-16'"), 0).collect()}
    want = {r.event_type: r.psi_nano for r in events_drift_psi(spark, SF).collect()}
    assert got == want


def test_streaming_foreachbatch_drives_monitor(spark, tmp_path):
    ev = load(spark, SF, "events")
    mon = _mon(spark, tmp_path)
    src = str(tmp_path / "src")
    cur = ev.filter("ts >= '2024-01-16'")
    cur.filter("event_id % 2 = 0").write.parquet(src + "/p0")
    cur.filter("event_id % 2 = 1").write.parquet(src + "/p1")
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in ev.schema.fields)
    q = mon.stream(src + "/p*", str(tmp_path / "ck"), schema)
    q.awaitTermination(120)
    log = mon.log().collect()
    assert len(log) >= 5  # at least one epoch × 5 event types
    assert all(r.psi_nano >= 0 for r in log)
