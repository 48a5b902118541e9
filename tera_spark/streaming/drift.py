"""Streaming distribution-drift monitor: PSI of every micro-batch
against a pinned reference histogram.

The batch twin (queries/curation.py events_drift_psi) compares two
static slices; this is the deployment shape — a trusted reference
histogram is built ONCE (KBs: groups × bins counts), and each
arriving micro-batch folds to its own bin counts and appends one PSI
row per group to a drift log. Epoch-partition overwrite makes replays
idempotent (same stance as SketchFold). An alert is then just a
filter over the log (psi_nano > 0.25e9 = the classic "drifted" bar).

Identical math to the batch query: fixed-bin spine from the
reference, Laplace smoothing, per-bin terms floor-quantized to
nano-units before the fold (terms are provably non-negative).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DriftMonitor:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        value_col: str = "value",
        group_col: str = "event_type",
        lo: float = 0.0,
        hi: float = 200.0,
        bins: int = 20,
    ):
        self.spark = spark
        self.root = Path(root)
        self.value_col = value_col
        self.group_col = group_col
        self.lo, self.hi, self.bins = float(lo), float(hi), bins
        (self.root / "log").mkdir(parents=True, exist_ok=True)

    def _bin(self):
        width = (self.hi - self.lo) / self.bins
        v = F.col(self.value_col).cast("double")
        return F.least(
            F.lit(self.bins - 1),
            F.greatest(F.lit(0), F.floor((v - F.lit(self.lo)) / F.lit(width))),
        ).cast("int")

    def _bin_counts(self, df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(self.group_col).alias("g"), self._bin().alias("bin"))
            .groupBy("g", "bin")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def set_reference(self, df: DataFrame) -> None:
        """Pin the trusted slice's histogram (groups × bins counts)."""
        self._bin_counts(df).write.mode("overwrite").parquet(str(self.root / "ref"))

    def observe(self, batch: DataFrame, epoch_id: int = 0) -> DataFrame:
        """Fold one micro-batch to bin counts, PSI it against the
        reference per group, append to the drift log (replay-safe).
        Returns the epoch's log rows."""
        ref = self.spark.read.parquet(str(self.root / "ref"))
        cur = self._bin_counts(batch)
        # Spine = reference groups ∪ batch groups: a group that appears
        # only in the micro-batch is exactly the drift signal this
        # monitor exists for — with cr=0 everywhere, Laplace smoothing
        # makes its PSI well-defined (p uniform 1/bins), and it scores
        # maximally rather than being silently dropped from the log.
        spine = (
            ref.select("g")
            .union(cur.select("g"))
            .distinct()
            .crossJoin(
                self.spark.range(self.bins).select(F.col("id").cast("int").alias("bin"))
            )
        )
        filled = (
            spine.join(ref.withColumnRenamed("c", "cr"), ["g", "bin"], "left")
            .join(F.broadcast(cur.withColumnRenamed("c", "cc")), ["g", "bin"], "left")
            .select(
                "g",
                "bin",
                F.coalesce("cr", F.lit(0)).alias("cr"),
                F.coalesce("cc", F.lit(0)).alias("cc"),
            )
        )
        tot = filled.groupBy("g").agg(
            F.sum("cr").cast("double").alias("nr"),
            F.sum("cc").cast("double").alias("nc"),
        )
        bins = float(self.bins)
        p = (F.col("cr") + 1).cast("double") / (F.col("nr") + bins)
        q = (F.col("cc") + 1).cast("double") / (F.col("nc") + bins)
        term = F.floor(((p - q) * F.log(p / q)) * 1_000_000_000).cast("long")
        out = (
            filled.join(F.broadcast(tot), "g")
            .select("g", term.alias("term"), "nc")
            .groupBy("g")
            .agg(
                F.max("nc").cast("long").alias("n_batch"),
                F.sum("term").cast("long").alias("psi_nano"),
            )
            .withColumn("epoch", F.lit(int(epoch_id)))
        )
        out.write.mode("overwrite").parquet(str(self.root / "log" / f"epoch={epoch_id}"))
        return self.spark.read.parquet(str(self.root / "log" / f"epoch={epoch_id}")).withColumn(
            "epoch", F.lit(int(epoch_id))
        )

    def log(self) -> DataFrame:
        return self.spark.read.option("basePath", str(self.root / "log")).parquet(
            str(self.root / "log")
        )

    def alerts(self, threshold_nano: int = 250_000_000) -> DataFrame:
        """Classic PSI bars: > 0.25 drifted (default), 0.1–0.25 watch."""
        return self.log().filter(F.col("psi_nano") > threshold_nano)

    def stream(self, source_path: str, checkpoint: str, schema: str):
        s = self.spark.readStream.schema(schema).parquet(source_path)
        return (
            s.writeStream.foreachBatch(lambda df, eid: (self.observe(df, eid), None)[1])
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
