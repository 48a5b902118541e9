"""Batch-checkable equivalents of the streaming layer's windowed
semantics over the `events` table (the live Structured Streaming
pipeline is in tera_spark/streaming/; these pin the same window math
against the DuckDB oracle, since a running stream can't be oracled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tera_spark.functions.timeutil import epoch_micros
from tera_spark.queries import query
from tera_spark.sources.tables import load


@query(
    "events_tumbling_window",
    """
    SELECT cast(epoch(time_bucket(INTERVAL 5 MINUTE, ts)) AS bigint) AS win_start,
           event_type,
           cast(count(*) AS bigint) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY win_start, event_type
    """,
)
def events_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


@query(
    "events_sliding_window",
    """
    WITH g AS (
      SELECT cast(epoch(time_bucket(INTERVAL 5 MINUTE, ts)) AS bigint) AS slot,
             count(*) AS n
      FROM events WHERE event_type = 'click' GROUP BY slot
    )
    SELECT s.win_start, cast(sum(g.n) AS bigint) AS n
    FROM (SELECT DISTINCT slot - 300 * x AS win_start
          FROM g, (SELECT unnest([0,1]) AS x)) s
    JOIN g ON g.slot BETWEEN s.win_start AND s.win_start + 300
    GROUP BY s.win_start
    """,
)
def events_sliding(spark: SparkSession, sf: str) -> DataFrame:
    # 10-minute windows sliding every 5 — each event lands in 2 windows
    ev = load(spark, sf, "events").filter(F.col("event_type") == "click")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp(F.col("w.start")).alias("win_start"), "n")
    )


@query(
    "events_sessionize",
    """
    WITH marked AS (
      SELECT user_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT user_id, cast(sum(new_sess) AS bigint) AS n_sessions, cast(count(*) AS bigint) AS n_events
    FROM marked GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    # gap > 30 min starts a new session (lag + cumulative-flag pattern);
    # microsecond arithmetic so the oracle comparison is exact
    ev = load(spark, sf, "events")
    ev = ev.withColumn("ts_us", epoch_micros(ev, "ts"))
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("ts_us") - prev > 1_800_000_000), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(F.sum("new_sess").cast("long").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "events_dedup_latest_props",
    """
    SELECT user_id, event_type, cast(max(event_id) AS bigint) AS last_event,
           round(arg_max(value, event_id), 2) AS last_value
    FROM events GROUP BY user_id, event_type
    """,
)
def events_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # "current view" of a keyed stream: newest record per key
    ev = load(spark, sf, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.max("event_id").alias("last_event"),
            F.round(F.max_by("value", "event_id"), 2).alias("last_value"),
        )
    )


@query(
    "events_json_props",
    """
    SELECT event_type,
           cast(sum(json_extract(props, '$.k')::bigint) AS bigint) AS k_sum,
           cast(max(json_extract(props, '$.k')::bigint) AS bigint) AS k_max,
           cast(count(*) AS bigint) AS n
    FROM events
    WHERE json_extract(props, '$.k')::bigint % 2 = 0
    GROUP BY event_type
    """,
)
def events_json(spark: SparkSession, sf: str) -> DataFrame:
    # semi-structured props column: JSON-path extraction feeding
    # predicate + aggregation (the scalar-function surface the
    # reference delegates to MySQL)
    ev = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") % 2 == 0)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "events_sketch_profile",
    """
    WITH h AS (
      SELECT event_type,
             (('0x' || substr(md5(cast(user_id AS varchar)), 1, 15))::bigint) AS hv,
             value
      FROM events
    ),
    regs AS (
      SELECT event_type, hv & 15 AS bkt,
             max(CASE WHEN hv >> 4 = 0 THEN 57
                      ELSE 57 - length(bin(hv >> 4)) END) AS mr
      FROM h GROUP BY event_type, bkt
    ),
    hll AS (
      SELECT event_type,
             count(*) AS present,
             sum(1::bigint << (57 - mr)) AS s_present
      FROM regs GROUP BY event_type
    ),
    est AS (
      SELECT event_type,
             (0.673 * 16 * 16 * 144115188075855872.0)
               / (s_present + (16 - present) * (1::bigint << 57)) AS raw,
             16 - present AS zeros
      FROM hll
    ),
    card AS (
      SELECT event_type,
             round(CASE WHEN raw <= 40 AND zeros > 0
                        THEN 16.0 * ln(16.0 / zeros) ELSE raw END, 4) AS approx_users
      FROM est
    ),
    bins AS (
      SELECT event_type,
             least(127, greatest(0, floor(value / 4.0)::int)) AS bin,
             count(*) AS cnt
      FROM h GROUP BY event_type, bin
    ),
    cdf AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
      FROM bins
    ),
    qs AS (
      SELECT event_type,
             min(CASE WHEN cum >= 0.5 * total THEN (bin + 0.5) * 4.0 END) AS q50,
             min(CASE WHEN cum >= 0.95 * total THEN (bin + 0.5) * 4.0 END) AS q95,
             min(CASE WHEN cum >= 0.99 * total THEN (bin + 0.5) * 4.0 END) AS q99,
             cast(sum(cnt) AS bigint) AS n
      FROM cdf GROUP BY event_type
    )
    SELECT event_type, approx_users, q50, q95, q99, n
    FROM card JOIN qs USING (event_type)
    """,
)
def events_sketch_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-based profiling — the 100 TB path for cardinality and
    quantiles, in the ENGINE-REPRODUCIBLE sketch forms (operators/
    sketches.py): a 60-bit-md5 HLL whose harmonic sum is exact integer
    math, and a fixed-bin histogram CDF for quantiles. Both merge
    associatively (per-bucket max / per-bin sum), so partial
    aggregation stays map-side and reducer state is O(sketch) — the
    same scale story as Spark's built-in Datasketches aggregates
    (which remain in sketches.py build_hll_table for interop), but
    hash-checkable: the DuckDB oracle recomputes the identical
    estimates, so this entry gets a full value-level driver row
    instead of the old rows-only check."""
    from tera_spark.operators.sketches import (
        fixed_bin_quantiles,
        reproducible_hll_distinct,
    )

    ev = load(spark, sf, "events")
    card = reproducible_hll_distinct(
        ev, value_col="user_id", group_cols=["event_type"], m=16
    ).withColumnRenamed("approx_distinct", "approx_users")
    quants = fixed_bin_quantiles(
        ev,
        value_col="value",
        group_cols=["event_type"],
        lo=0.0,
        hi=512.0,
        n_bins=128,
        quantiles=[0.5, 0.95, 0.99],
    )
    n = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return card.join(quants, "event_type").join(n, "event_type")


@query(
    "events_funnel_3step",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT cast((SELECT count(*) FROM s1) AS bigint) AS n_viewed,
           cast((SELECT count(*) FROM s2) AS bigint) AS n_clicked_after,
           cast((SELECT count(*) FROM s3) AS bigint) AS n_purchased_after
    """,
)
def events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered-step funnel: users whose first view precedes a click
    that precedes a purchase. Each stage is a user-keyed aggregate
    joined back to the events of the next type — three shuffles on
    user_id that AQE coalesces, with the per-stage tables shrinking
    monotonically (stage N+1 joins only stage-N survivors), so the
    whole funnel costs one fact scan per stage and no window over the
    raw event stream."""
    ev = load(spark, sf, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_clicked_after")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchased_after")))
    )


@query(
    "events_retention_cohorts",
    """
    WITH w AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hr FROM events
    ),
    f AS (SELECT user_id, min(hr) AS cohort_hr FROM w GROUP BY user_id)
    SELECT f.cohort_hr, w.hr - f.cohort_hr AS offset_hr,
           cast(count(*) AS bigint) AS n_users
    FROM w JOIN f ON w.user_id = f.user_id
    GROUP BY f.cohort_hr, offset_hr
    """,
)
def events_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: users grouped by first-active hour, counted at
    each later activity offset. Two user-keyed aggregates plus one join
    of user-cardinality tables — the raw event stream is touched once
    (the DISTINCT), and everything downstream is sublinear in events."""
    ev = load(spark, sf, "events")
    w = ev.select(
        "user_id", F.floor(epoch_micros(ev, "ts") / F.lit(3_600_000_000)).alias("hr")
    ).distinct()
    f = w.groupBy("user_id").agg(F.min("hr").alias("cohort_hr"))
    return (
        w.join(f, "user_id")
        .groupBy("cohort_hr", (F.col("hr") - F.col("cohort_hr")).alias("offset_hr"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_value_histogram",
    """
    SELECT cast(least(floor(value / 50), 9) AS int) AS bucket,
           cast(count(*) AS bigint) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
    """,
)
def events_value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram (10 buckets, open-ended top) — the
    profiling primitive for monitoring value distributions; map-side
    bucket assignment + one partial/final count aggregation."""
    ev = load(spark, sf, "events")
    bucket = F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("int")
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "events_anomaly_zscore",
    """
    WITH stats AS (
      SELECT event_id, event_type, value,
             avg(value) OVER (PARTITION BY event_type) AS mu,
             stddev_samp(value) OVER (PARTITION BY event_type) AS sigma
      FROM events
    )
    SELECT event_id, event_type,
           round(value, 2) AS value,
           round((value - mu) / sigma, 4) AS zscore
    FROM stats WHERE abs((value - mu) / sigma) > 3
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Population z-score outlier flagging per event type — the
    monitoring primitive over a metric stream. One window shuffle keyed
    by event_type; at scale the same math runs as a two-pass
    (aggregate stats → broadcast join back) when a group's rows exceed
    a partition, with identical semantics."""
    stats = load(spark, sf, "events").select(
        "event_id",
        "event_type",
        "value",
        F.avg("value").over(W.partitionBy("event_type")).alias("mu"),
        F.stddev_samp("value").over(W.partitionBy("event_type")).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return stats.filter(F.abs(z) > 3).select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.round(z, 4).alias("zscore"),
    )


@query(
    "events_window_topk",
    """
    WITH counts AS (
      SELECT cast(epoch(time_bucket(INTERVAL 15 MINUTE, ts)) AS bigint) AS win_start,
             event_type, cast(count(*) AS bigint) AS n
      FROM events GROUP BY win_start, event_type
    ),
    ranked AS (
      SELECT win_start, event_type, n,
             cast(row_number() OVER (PARTITION BY win_start
                    ORDER BY n DESC, event_type) AS bigint) AS rk
      FROM counts
    )
    SELECT win_start, event_type, n, rk FROM ranked WHERE rk <= 3
    """,
)
def events_window_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Trending detection: top-3 event types per 15-minute tumbling
    window by count. Scale shape: one keyed aggregation shuffle, then
    the ranking window runs over window-cardinality rows (counts per
    (win, type) — tiny next to the event stream); deterministic
    tie-break on (n desc, event_type)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events")
    counts = (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp(F.col("w.start")).alias("win_start"), "event_type", "n")
    )
    rk = F.row_number().over(
        W.partitionBy("win_start").orderBy(F.desc("n"), "event_type")
    )
    return counts.withColumn("rk", rk.cast("long")).filter(F.col("rk") <= 3)


@query(
    "events_salted_distinct_users",
    """
    SELECT event_type,
           cast(count(DISTINCT user_id) AS bigint) AS n_users,
           cast(count(*) AS bigint) AS n_events
    FROM events GROUP BY event_type
    """,
)
def events_salted_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe distinct aggregation: distinct users per event type
    through the two-phase value-hash-salted plan (functions/keys.py
    salted_agg) — the oracle states the plain COUNT(DISTINCT) it must
    equal. A hot event type's distinct-user state spreads over 32
    reducers instead of one."""
    from tera_spark.functions.keys import salted_agg

    ev = load(spark, sf, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {"n_users": ("count_distinct", "user_id"), "n_events": ("count", "event_id")},
    )
    return out.select(
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_events").cast("long").alias("n_events"),
    )


@query(
    "events_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           cast(count(*) AS bigint) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Behavioral transition matrix: count (event_type -> next
    event_type) bigrams along each user's time-ordered stream — the
    Markov-chain input for session modeling. Scale shape: one window
    keyed by user_id (user-cardinality partitions, deterministic
    (ts, event_id) order), then a tiny type-pair aggregation."""
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events")
    nxt = F.lead("event_type").over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    return (
        ev.withColumn("next_type", nxt)
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_equidepth_histogram",
    """
    WITH binned AS (
      SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS bucket
      FROM events
    )
    SELECT cast(bucket AS int) AS bucket, cast(count(*) AS bigint) AS n,
           round(min(value), 2) AS lo, round(max(value), 2) AS hi
    FROM binned GROUP BY bucket
    """,
)
def events_equidepth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-depth (quantile) histogram via ntile — the bucketizer a
    curation pipeline uses to stratify by length/score with equal mass
    per bucket (fixed-width histograms starve the tails). Deterministic
    tie order (value, event_id).

    Scale note: ntile is a single total order — fine for profiling
    output-sized metrics; for a 100 TB stratifier use approx
    percentile cut points (one pass) and map-side bucket assignment
    instead, trading exact equal mass for no global sort."""
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events")
    b = F.ntile(10).over(W.orderBy("value", "event_id"))
    return (
        ev.select("value", b.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .select(F.col("bucket").cast("int").alias("bucket"), "n", "lo", "hi")
    )


@query(
    "events_session_transcripts",
    """
    WITH marked AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sess AS (
      SELECT user_id, event_id, event_type, ts_us,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, cast(session_no AS bigint) AS session_no,
           cast(count(*) AS bigint) AS n_events,
           string_agg(event_type, '>' ORDER BY ts_us, event_id) AS transcript
    FROM sess GROUP BY user_id, session_no HAVING count(*) >= 2
    """,
)
def events_session_transcripts(spark: SparkSession, sf: str) -> DataFrame:
    """Assemble per-session event transcripts (the conversation/
    trajectory-assembly step of a behavioral training pipeline):
    sessionize by 30-min gaps, then concatenate the event-type stream
    in time order per session. One exchange on user_id serves the lag
    window, the running session number, AND the final per-session
    aggregation (all partition on user_id prefixes)."""
    ev = load(spark, sf, "events")
    ev = ev.withColumn("ts_us", epoch_micros(ev, "ts"))
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    new_sess = F.when(prev.isNull() | (F.col("ts_us") - prev > 1_800_000_000), 1).otherwise(0)
    sess_no = F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    d = ev.select("user_id", "event_id", "event_type", "ts_us", sess_no.alias("session_no"))
    return (
        d.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts_us", "event_id", "event_type"))),
                    lambda x: x["event_type"],
                ),
            ).alias("transcript"),
        )
        .filter(F.col("n_events") >= 2)
        .select("user_id", F.col("session_no").cast("long").alias("session_no"), "n_events", "transcript")
    )


@query(
    "events_ohlc_bars",
    """
    SELECT cast(epoch(time_bucket(INTERVAL 15 MINUTE, ts)) AS bigint) AS win_start,
           event_type,
           round(arg_min(value, ts), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(arg_max(value, ts), 4) AS close,
           cast(count(*) AS bigint) AS n
    FROM events
    GROUP BY win_start, event_type
    """,
)
def events_ohlc(spark: SparkSession, sf: str) -> DataFrame:
    """OHLC resampling: open/high/low/close per 15-minute bar per
    event type — the time-series downsampling shape every metrics
    store serves. One hash aggregation with min_by/max_by picking the
    boundary values; no window functions, no second shuffle.

    Tie stance: open/close break equal timestamps arbitrarily but
    deterministically IF timestamps are unique per group; the driver
    events table has unique ts per (bar, type), which the oracle
    relies on (arg_min/arg_max on raw ts)."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.round(F.min_by("value", "ts"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", "ts"), 4).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "event_type", "open", "high", "low", "close", "n",
        )
    )


def _znorm_pattern(pattern: list[float]) -> list[float]:
    L = len(pattern)
    mu = sum(pattern) / L
    sd = (sum((x - mu) ** 2 for x in pattern) / L) ** 0.5
    return [(x - mu) / sd for x in pattern]


_SUBSEQ_PATTERN = [0.0, 0.0, 3.0, 3.0, 0.0, 0.0]  # a 6-point square pulse
_SUBSEQ_QZ = _znorm_pattern(_SUBSEQ_PATTERN)
_SUBSEQ_QZ_SQL = "[" + ", ".join(repr(x) for x in _SUBSEQ_QZ) + "]::double[]"


@query(
    "events_subseq_topk",
    f"""
    WITH s AS (
      SELECT user_id, list(value ORDER BY ts) AS vals
      FROM events GROUP BY user_id
    ),
    winds AS (
      SELECT user_id, i AS start, vals[i + 1:i + 6] AS w
      FROM s, unnest(range(0, greatest(len(vals) - 5, 0))) t(i)
    ),
    m AS (
      SELECT user_id, start, w,
             list_reduce(w, (x, y) -> x + y) / 6.0 AS mean
      FROM winds
    ),
    sdv AS (
      SELECT user_id, start, w, mean,
             sqrt(list_reduce(list_transform(w, x -> (x - mean) * (x - mean)),
                              (x, y) -> x + y) / 6.0) AS sd
      FROM m
    )
    SELECT user_id, cast(start AS bigint) AS start,
           round(list_reduce(list_transform(range(1, 7), j ->
             ((w[j] - mean) / sd - ({_SUBSEQ_QZ_SQL})[j])
             * ((w[j] - mean) / sd - ({_SUBSEQ_QZ_SQL})[j])), (x, y) -> x + y), 6) AS dist
    FROM sdv WHERE sd > 0
    ORDER BY dist, user_id, start LIMIT 20
    """,
)
def events_subseq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 z-normalized subsequence matches of a square-pulse
    pattern across every user's event-value series — distributed
    time-series pattern search. See operators/temporal.subsequence_topk."""
    from tera_spark.operators.temporal import subsequence_topk

    ev = load(spark, sf, "events")
    return subsequence_topk(ev, _SUBSEQ_PATTERN, k=20)


def _t6s(expr: str) -> str:
    """floor-truncation to 6 decimals (bit-stable vs Spark)."""
    return f"(floor(({expr}) * 1000000)::double / 1000000)"


@query(
    "events_ab_test_lift",
    f"""
    WITH assign AS (
      SELECT user_id, user_id % 2 AS variant,
             max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT variant, count(*) AS n_users, sum(converted) AS n_conv
      FROM assign GROUP BY variant
    ),
    wide AS (
      SELECT
        max(CASE WHEN variant = 0 THEN n_users END) AS n_a,
        max(CASE WHEN variant = 0 THEN n_conv END) AS conv_a,
        max(CASE WHEN variant = 1 THEN n_users END) AS n_b,
        max(CASE WHEN variant = 1 THEN n_conv END) AS conv_b
      FROM arms
    )
    SELECT cast(n_a AS bigint) AS n_a, cast(conv_a AS bigint) AS conv_a,
           cast(n_b AS bigint) AS n_b, cast(conv_b AS bigint) AS conv_b,
           {_t6s('conv_a::double / n_a')} AS rate_a,
           {_t6s('conv_b::double / n_b')} AS rate_b,
           {_t6s('conv_b::double / n_b - conv_a::double / n_a')} AS lift,
           {_t6s('''(conv_b::double / n_b - conv_a::double / n_a)
             / sqrt(((conv_a + conv_b)::double / (n_a + n_b))
                    * (1 - (conv_a + conv_b)::double / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b))''')} AS z_score
    FROM wide
    """,
)
def events_ab_test_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Two-proportion A/B test on conversion (a high-value purchase):
    per-arm rates, lift, and the pooled z-score — the experiment
    readout an analytics engine serves daily. Deterministic variant
    assignment (user_id parity stands in for the experiment's hash
    bucket); one aggregation tree, scalar output."""
    ev = load(spark, sf, "events")
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 180), 1).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("variant"), "converted")
    arms = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("converted").alias("n_conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("n_conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("n_conv"))).alias("conv_b"),
    )
    t6 = lambda c: (F.floor(c * 1_000_000).cast("double") / 1_000_000)  # noqa: E731
    ra = F.col("conv_a").cast("double") / F.col("n_a")
    rb = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    z = (rb - ra) / F.sqrt(pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        t6(ra).alias("rate_a"),
        t6(rb).alias("rate_b"),
        t6(rb - ra).alias("lift"),
        t6(z).alias("z_score"),
    )


@query(
    "events_value_trend",
    """
    WITH pts AS (
      SELECT user_id,
             cast((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 60000000 AS bigint) AS x,
             cast(floor(value * 100) AS bigint) AS y
      FROM events
    ),
    s AS (
      SELECT user_id, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts GROUP BY user_id
    )
    SELECT cast(user_id AS bigint) AS user_id, cast(n AS bigint) AS n,
           cast(n * sxy - sx * sy AS bigint) AS slope_num,
           cast(n * sxx - sx * sx AS bigint) AS slope_den
    FROM s WHERE n * sxx - sx * sx <> 0
    """,
)
def events_value_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user linear trend of event values over time, as the exact
    least-squares slope RATIONAL (numerator/denominator): inputs
    quantize to integer minutes × integer cents, so the sums — and
    therefore the slope — are bit-exact on any engine and any
    aggregation order. One hash aggregation; the caller divides when a
    float is wanted."""
    ev = load(spark, sf, "events")
    epoch0 = F.lit(1704067200000000)  # 2024-01-01 in epoch micros
    pts = ev.select(
        "user_id",
        ((F.unix_micros(F.col("ts").cast("timestamp")) - epoch0) / 60_000_000)
        .cast("long")
        .alias("x"),
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    s = pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.filter(den != 0).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("n").cast("long").alias("n"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
    )


@query(
    "events_type_correlation",
    f"""
    WITH hourly AS (
      SELECT cast(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS bigint) AS h,
             event_type, cast(count(*) AS bigint) AS c
      FROM events GROUP BY h, event_type
    ),
    grid AS (
      SELECT h.h, t.event_type, coalesce(c.c, 0) AS c
      FROM (SELECT DISTINCT h FROM hourly) h
      CROSS JOIN (SELECT DISTINCT event_type FROM hourly) t
      LEFT JOIN hourly c ON c.h = h.h AND c.event_type = t.event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n, sum(a.c) AS sx, sum(b.c) AS sy,
             sum(a.c * b.c) AS sxy, sum(a.c * a.c) AS sxx, sum(b.c * b.c) AS syy
      FROM grid a JOIN grid b USING (h)
      WHERE a.event_type < b.event_type
      GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, cast(n AS bigint) AS n,
           {_t6s('''(n * sxy - sx * sy)::double
             / sqrt((n * sxx - sx * sx)::double)
             / sqrt((n * syy - sy * sy)::double)''')} AS pearson_r
    FROM pairs
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def events_type_correlation(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson correlation between event types' hourly volumes — the
    co-movement matrix behind anomaly triage (types that normally rise
    together flag independent incidents when they diverge). Counts are
    integers, so the moment sums are exact; only the final ratio is a
    float, truncated to 6 decimals identically on both engines. The
    hour × type grid densifies missing cells to 0 before correlating."""
    ev = load(spark, sf, "events")
    hourly = ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("h"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    hours = hourly.select("h").distinct()
    types = hourly.select("event_type").distinct()
    grid = (
        hours.crossJoin(types)
        .join(hourly, ["h", "event_type"], "left")
        .select("h", "event_type", F.coalesce("c", F.lit(0)).alias("c"))
    )
    a = grid.select(F.col("h"), F.col("event_type").alias("type_a"), F.col("c").alias("ca"))
    b = grid.select(F.col("h"), F.col("event_type").alias("type_b"), F.col("c").alias("cb"))
    pairs = (
        a.join(b, "h")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ca").alias("sx"),
            F.sum("cb").alias("sy"),
            F.sum(F.col("ca") * F.col("cb")).alias("sxy"),
            F.sum(F.col("ca") * F.col("ca")).alias("sxx"),
            F.sum(F.col("cb") * F.col("cb")).alias("syy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    r = (n * F.col("sxy") - sx * sy).cast("double") / F.sqrt(vx.cast("double")) / F.sqrt(vy.cast("double"))
    return (
        pairs.filter((vx > 0) & (vy > 0))
        .select(
            "type_a", "type_b", n.cast("long").alias("n"),
            (F.floor(r * 1_000_000).cast("double") / 1_000_000).alias("pearson_r"),
        )
    )


@query(
    "events_dau_mau_stickiness",
    """
    WITH daily AS (
      SELECT cast(ts AS date) AS day, count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ),
    monthly AS (
      SELECT date_trunc('month', ts) AS month, count(DISTINCT user_id) AS mau
      FROM events GROUP BY 1
    )
    SELECT cast(d.day AS varchar) AS day,
           cast(d.dau AS bigint) AS dau,
           cast(m.mau AS bigint) AS mau,
           (floor(d.dau::double / m.mau * 1000000)::double / 1000000) AS stickiness
    FROM daily d JOIN monthly m ON date_trunc('month', d.day) = m.month
    """,
)
def events_dau_mau(spark: SparkSession, sf: str) -> DataFrame:
    """DAU/MAU stickiness per day — the engagement ratio every product
    dashboard tracks. Two distinct aggregations (day- and month-keyed)
    joined on the month; at 100 TB both become sketch-table reads
    (operators/sketches.build_hll_table bucketed by day: DAU = one
    bucket, MAU = union of the month's buckets — this exact query is
    why the sketch table stores day-level buckets)."""
    ev = load(spark, sf, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    monthly = ev.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    j = daily.join(monthly, F.date_trunc("month", F.col("day")) == F.col("month"))
    return j.select(
        F.col("day").cast("string").alias("day"),
        F.col("dau").cast("long").alias("dau"),
        F.col("mau").cast("long").alias("mau"),
        (F.floor(F.col("dau") / F.col("mau") * 1_000_000).cast("double") / 1_000_000).alias(
            "stickiness"
        ),
    )


@query(
    "events_pareto_concentration",
    """
    WITH per_user AS (
      SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT n_events,
             row_number() OVER (ORDER BY n_events DESC, user_id) AS rnk,
             count(*) OVER () AS n_users,
             sum(n_events) OVER () AS total
      FROM per_user
    )
    SELECT cast(pct AS bigint) AS top_pct,
           cast(sum(n_events) AS bigint) AS events_covered,
           (floor(sum(n_events)::double / any_value(total) * 1000000)::double
             / 1000000) AS share
    FROM ranked, (SELECT unnest([1, 5, 10, 25]) AS pct)
    WHERE rnk <= greatest(1, (pct * n_users) / 100)
    GROUP BY pct
    """,
)
def events_pareto(spark: SparkSession, sf: str) -> DataFrame:
    """Pareto concentration: what share of all events the top 1/5/10/
    25% most-active users generate — the skew audit run before
    hotspot planning (a heavy-hitter head means salting/AQE-skew
    matter; a flat curve means plain hash keys suffice). One user
    aggregation, one rank window over the user-sized relation (never
    the raw events), four threshold sums."""
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    w = W.orderBy(F.desc("n_events"), "user_id")
    ranked = (
        per_user.withColumn("rnk", F.row_number().over(w))
        .withColumn("n_users", F.count(F.lit(1)).over(W.partitionBy()))
        .withColumn("total", F.sum("n_events").over(W.partitionBy()))
    )
    pcts = spark.createDataFrame([(p,) for p in (1, 5, 10, 25)], "pct int")
    hit = ranked.join(
        F.broadcast(pcts),
        F.col("rnk") <= F.greatest(F.lit(1), (F.col("pct") * F.col("n_users")) / 100),
    )
    return hit.groupBy("pct").agg(
        F.sum("n_events").cast("long").alias("events_covered"),
        (
            F.floor(F.sum("n_events") / F.any_value("total") * 1_000_000).cast("double")
            / 1_000_000
        ).alias("share"),
    ).select(F.col("pct").cast("long").alias("top_pct"), "events_covered", "share")


@query(
    "events_bot_regularity",
    """
    WITH deltas AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    stats AS (
      SELECT user_id,
             count(gap_us) AS n_gaps,
             sum(gap_us::HUGEINT) AS s1,
             sum(gap_us::HUGEINT * gap_us::HUGEINT) AS s2
      FROM deltas WHERE gap_us IS NOT NULL GROUP BY user_id
    )
    SELECT cast(user_id AS bigint) AS user_id,
           cast(n_gaps AS bigint) AS n_gaps,
           (floor((n_gaps * s2 - s1 * s1)::double
                  / (n_gaps * n_gaps)::double / 1000000.0)::double) AS gap_var_ms2
    FROM stats
    WHERE n_gaps >= 20
    ORDER BY (n_gaps * s2 - s1 * s1)::double / (n_gaps * n_gaps)::double, user_id
    LIMIT 25
    """,
)
def events_bot_regularity(spark: SparkSession, sf: str) -> DataFrame:
    """Bot/automation detection by inter-event-time regularity: users
    with many events whose gap variance is implausibly low (humans
    are bursty; schedulers tick). Gaps come from one user-partitioned
    lag window; variance from exact integer moments (bit-stable
    across engines), reported in ms² floor-truncated. Emits the 25 most-regular
    heavy users (≥20 gaps) — the review queue a bot audit starts from;
    distributed top-k (orderBy+limit), never a global sort.
    At 100 TB the window partitions by user_id (no global sort) and
    the moment sums are the same one-pass shape as the trend/corr
    queries."""
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    g = F.col("gap_us").cast("decimal(38,0)")
    stats = gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.sum(g).alias("s1"),
        F.sum(g * g).alias("s2"),
    )
    n, s1, s2 = F.col("n_gaps"), F.col("s1"), F.col("s2")
    # numerator exact in decimal, cast once — matches the oracle's
    # HUGEINT-exact-then-::double order so the last bits agree
    num = (n.cast("decimal(38,0)") * s2 - s1 * s1).cast("double")
    var_us2 = num / (n * n).cast("double")
    return (
        stats.filter(n >= 20)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            n.cast("long").alias("n_gaps"),
            var_us2.alias("_v"),
        )
        .orderBy("_v", "user_id")
        .limit(25)
        .select(
            "user_id",
            "n_gaps",
            F.floor(F.col("_v") / 1_000_000.0).cast("double").alias("gap_var_ms2"),
        )
    )


@query(
    "events_m4_downsample",
    """
    WITH b AS (
      SELECT event_type,
             epoch_us(ts) // 21600000000 AS bucket,
             epoch_us(ts) AS t, value, event_id
      FROM events
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY t, event_id) AS rf,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY t DESC, event_id DESC) AS rl
      FROM b
    )
    SELECT event_type, cast(bucket AS bigint) AS bucket,
           cast(min(t) AS bigint) AS t_first,
           round(max(CASE WHEN rf = 1 THEN value END), 2) AS v_first,
           cast(max(t) AS bigint) AS t_last,
           round(max(CASE WHEN rl = 1 THEN value END), 2) AS v_last,
           round(min(value), 2) AS v_min,
           round(max(value), 2) AS v_max,
           cast(count(*) AS bigint) AS n
    FROM r GROUP BY event_type, bucket
    """,
)
def events_m4(spark: SparkSession, sf: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per series and
    6-hour pixel bucket keep first/last/min/max — the lossless-at-
    pixel-resolution reducer every time-series dashboard needs before
    plotting a billion points. ONE hash aggregation (min/max/min_by/
    max_by all partial-aggregatable), no windows, no sort — at 100 TB
    the output is pixels × series regardless of input volume."""
    ev = load(spark, sf, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    b = ev.select(
        "event_type",
        F.floor(t / F.lit(21_600_000_000)).cast("long").alias("bucket"),
        t.alias("t"), "value", "event_id",
    )
    key = F.struct(F.col("t"), F.col("event_id"))
    return b.groupBy("event_type", "bucket").agg(
        F.min("t").alias("t_first"),
        F.round(F.min_by("value", key), 2).alias("v_first"),
        F.max("t").alias("t_last"),
        F.round(F.max_by("value", key), 2).alias("v_last"),
        F.round(F.min("value"), 2).alias("v_min"),
        F.round(F.max("value"), 2).alias("v_max"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "events_trajectory_similarity",
    """
    WITH seqs AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ),
    grams AS (
      SELECT user_id,
             CASE WHEN len(seq) >= 3 THEN
               list_distinct(list_transform(
                 generate_series(1, len(seq) - 2),
                 i -> seq[i] || '>' || seq[i+1] || '>' || seq[i+2]))
             ELSE [] END AS g
      FROM seqs
    ),
    anchors AS (SELECT user_id AS a_id, g AS a_g FROM grams WHERE user_id IN (1, 2, 3)),
    scored AS (
      SELECT a.a_id, o.user_id AS other_id,
             (floor(len(list_intersect(a.a_g, o.g))::double
                    / greatest(len(a.a_g) + len(o.g) - len(list_intersect(a.a_g, o.g)), 1)
                    * 1000000)::double / 1000000) AS jac
      FROM anchors a JOIN grams o ON o.user_id <> a.a_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY jac DESC, other_id) AS rnk
      FROM scored
    )
    SELECT cast(a_id AS bigint) AS anchor_id,
           cast(other_id AS bigint) AS similar_user,
           jac AS jaccard, cast(rnk AS bigint) AS rank
    FROM ranked WHERE rnk <= 10
    """,
)
def events_trajectory_similarity(spark: SparkSession, sf: str) -> DataFrame:
    """Behavioral-trajectory similarity search: top-10 users whose
    event-type sequence most resembles each anchor's, by Jaccard over
    trajectory trigrams (the shingle trick from text dedup applied to
    behavior sequences — REPOSE-style trajectory search re-expressed
    relationally). Per-user sequences fold in one sorted-collect agg;
    the anchor side is tiny and broadcasts, so scoring is map-side
    over the user-sized gram table; top-k is a per-anchor window over
    scored rows, never the raw events."""
    ev = load(spark, sf, "events")
    seqs = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ).alias("seq")
    )
    n = F.size("seq")
    tri = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(
            ">",
            F.element_at(F.col("seq"), i),
            F.element_at(F.col("seq"), i + 1),
            F.element_at(F.col("seq"), i + 2),
        ),
    )
    grams = seqs.select(
        "user_id",
        F.when(n >= 3, F.array_distinct(tri)).otherwise(
            F.expr("cast(array() as array<string>)")
        ).alias("g"),
    )
    anchors = grams.filter(F.col("user_id").isin(1, 2, 3)).select(
        F.col("user_id").alias("a_id"), F.col("g").alias("a_g")
    )
    inter = F.size(F.array_intersect("a_g", "g"))
    union = F.size("a_g") + F.size("g") - inter
    scored = (
        grams.join(F.broadcast(anchors), F.col("user_id") != F.col("a_id"))
        .select(
            "a_id",
            F.col("user_id").alias("other_id"),
            (F.floor(inter / F.greatest(union, F.lit(1)) * 1_000_000).cast("double")
             / 1_000_000).alias("jac"),
        )
    )
    w = W.partitionBy("a_id").orderBy(F.desc("jac"), "other_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            F.col("a_id").cast("long").alias("anchor_id"),
            F.col("other_id").cast("long").alias("similar_user"),
            F.col("jac").alias("jaccard"),
            F.col("rnk").cast("long").alias("rank"),
        )
    )


@query(
    "events_churn_risk",
    """
    WITH horizon AS (SELECT max(epoch_us(ts)) AS h FROM events),
    last_seen AS (
      SELECT user_id, max(epoch_us(ts)) AS last_us, count(*) AS lifetime_events
      FROM events GROUP BY user_id
    )
    SELECT cast(user_id AS bigint) AS user_id,
           cast(lifetime_events AS bigint) AS lifetime_events,
           cast((h - last_us) // 3600000000 AS bigint) AS hours_inactive
    FROM last_seen, horizon
    ORDER BY h - last_us DESC, user_id
    LIMIT 25
    """,
)
def events_churn_risk(spark: SparkSession, sf: str) -> DataFrame:
    """Churn-risk review queue: the 25 longest-silent users relative
    to the corpus horizon (max ts — NOT wall clock, so the query is
    deterministic and replayable). One user-keyed aggregate plus a
    broadcast 1-row horizon, then distributed top-k — the outreach
    list a retention team pulls daily."""
    ev = load(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    horizon = ev.agg(F.max(us).alias("h"))
    last_seen = ev.groupBy("user_id").agg(
        F.max(us).alias("last_us"), F.count(F.lit(1)).alias("lifetime_events")
    )
    j = last_seen.crossJoin(F.broadcast(horizon))
    gap = F.col("h") - F.col("last_us")
    return (
        j.orderBy(gap.desc(), "user_id")
        .limit(25)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("lifetime_events").cast("long").alias("lifetime_events"),
            F.floor(gap / 3_600_000_000).cast("long").alias("hours_inactive"),
        )
    )


@query(
    "events_hourly_seasonality",
    """
    SELECT event_type,
           cast(hour(ts) AS bigint) AS hour_of_day,
           cast(count(*) AS bigint) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY event_type, hour(ts)
    """,
)
def events_hourly_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type — the traffic
    shape capacity planning and anomaly baselines start from. One
    partial-aggregatable hash agg; output is 24 × types regardless of
    volume."""
    ev = load(spark, sf, "events")
    return ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
