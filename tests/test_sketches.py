"""Persisted mergeable HLL sketch tables (operators/sketches.py):
incremental build, range queries over buckets, merge idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from tera_spark.operators.sketches import build_hll_table, hll_distinct
from tera_spark.sources.tables import load

SF = "/root/testdata/sf0.01"


def _events(spark):
    return load(spark, SF, "events").select(
        F.to_date("ts").alias("day"), "event_type", "user_id"
    )


def test_incremental_build_estimates_range_distinct(spark, tmp_path):
    ev = _events(spark)
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    mid = days[len(days) // 2]
    path = str(tmp_path / "sk")
    # two incremental builds (nightly-batch shape), same sketch table
    build_hll_table(ev.filter(F.col("day") <= mid), path,
                    bucket_cols=["day", "event_type"], value_col="user_id")
    build_hll_table(ev.filter(F.col("day") > mid), path,
                    bucket_cols=["day", "event_type"], value_col="user_id")

    lo, hi = days[2], days[-3]
    exact = (
        ev.filter((F.col("day") >= lo) & (F.col("day") <= hi))
        .select("user_id").distinct().count()
    )
    est = hll_distinct(
        spark, path, where=f"day >= '{lo}' and day <= '{hi}'"
    ).collect()[0].distinct_estimate
    assert abs(est - exact) / exact < 0.05, (est, exact)

    # per-type grouping over the same range
    per_type = {
        r.event_type: r.distinct_estimate
        for r in hll_distinct(
            spark, path, where=f"day >= '{lo}' and day <= '{hi}'",
            group_by=["event_type"],
        ).collect()
    }
    exact_type = {
        r.event_type: r.n
        for r in ev.filter((F.col("day") >= lo) & (F.col("day") <= hi))
        .groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for t, n in exact_type.items():
        assert abs(per_type[t] - n) / n < 0.08, (t, per_type[t], n)


def test_duplicate_slice_rebuild_is_idempotent(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "sk")
    build_hll_table(ev, path, bucket_cols=["day"], value_col="user_id")
    before = hll_distinct(spark, path).collect()[0].distinct_estimate
    # a re-run of the same slice appends duplicate sketch rows; the
    # union absorbs them (HLL union over the same set is idempotent)
    build_hll_table(ev, path, bucket_cols=["day"], value_col="user_id")
    after = hll_distinct(spark, path).collect()[0].distinct_estimate
    assert after == before


def test_hist_table_range_quantiles(spark, tmp_path):
    """Mergeable histogram tables: two incremental slice builds, then
    quantiles over a day range are within one bin width of exact."""
    from tera_spark.operators.sketches import build_hist_table, hist_quantile

    ev = _events_with_value(spark)
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    mid = days[len(days) // 2]
    path = str(tmp_path / "hist")
    vmax = ev.agg(F.max("value")).collect()[0][0]
    hi = float(vmax) + 1.0
    kw = dict(bucket_cols=["day"], value_col="value", lo=0.0, hi=hi, n_bins=200)
    build_hist_table(ev.filter(F.col("day") <= mid), path, **kw)
    build_hist_table(ev.filter(F.col("day") > mid), path, **kw)

    lo_d, hi_d = days[2], days[-3]
    sel = ev.filter((F.col("day") >= lo_d) & (F.col("day") <= hi_d))
    exact = sel.approxQuantile("value", [0.5, 0.9, 0.99], 0.0)
    got = {
        r.q: r.estimate
        for r in hist_quantile(
            spark, path, [0.5, 0.9, 0.99], where=f"day >= '{lo_d}' and day <= '{hi_d}'"
        ).collect()
    }
    bin_w = hi / 200
    for q, ex in zip([0.5, 0.9, 0.99], exact):
        assert abs(got[q] - ex) <= bin_w + 1e-9, (q, got[q], ex)


def _events_with_value(spark):
    return load(spark, SF, "events").select(
        F.to_date("ts").alias("day"), F.col("value").cast("double").alias("value")
    )


def test_streaming_sketch_maintenance(spark, tmp_path):
    """Sketch tables maintained from a stream: each micro-batch folds
    its slice into per-day HLL rows (build_hll_table in foreachBatch,
    append mode), and range estimates stay correct after the drain —
    the continuous-ingestion form of incremental distinct counting."""
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    sk_path = str(tmp_path / "sk")

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 2).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, epoch: build_hll_table(
                batch, sk_path, bucket_cols=["day"], value_col="user_id"
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    exact = ev.select("user_id").distinct().count()
    est = hll_distinct(spark, sk_path).collect()[0].distinct_estimate
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # multiple sketch rows per day (one per covering batch) is the
    # expected steady state; the union absorbs them
    sk = spark.read.parquet(sk_path)
    assert sk.count() >= sk.select("day").distinct().count()
