"""Incremental sketch maintenance over a micro-batch stream.

Each epoch folds the batch's PARTIAL sketches — count-min cells and
theta-sketch candidate hashes — into epoch-partitioned parquet, and
any question is answered by merging on read (cells add; theta rows
min-rank-select). Because both merges are associative AND each epoch
writes `epoch=<id>` with overwrite, a replayed micro-batch rewrites
its own partition instead of double-counting — the same exactly-once
stance as the streaming changefeed (mview.py).

This is the streaming twin of the batch sketch operators
(operators/sketches.py): the sketch a nightly batch build produces
and the one this fold maintains are THE SAME TABLE SHAPE, so a
pipeline can mix both (e.g. backfill batch, then stream).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.operators.sketches import (
    count_min_cells,
    theta_merge,
    theta_set_ops,
)
from tera_spark.functions.text import h60


class SketchFold:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        key_col: str = "user_id",
        group_col: str | None = None,
        d: int = 4,
        w: int = 64,
        k: int = 32,
    ):
        self.spark = spark
        self.root = Path(root)
        self.key_col = key_col
        self.group_col = group_col
        self.d, self.w, self.k = d, w, k
        for sub in ("cms", "theta"):
            (self.root / sub).mkdir(parents=True, exist_ok=True)

    # -- fold one micro-batch -------------------------------------------
    def fold(self, batch: DataFrame, epoch_id: int = 0) -> None:
        """Write this epoch's partial sketches; overwrite-on-replay."""
        cells = count_min_cells(batch, key_col=self.key_col, d=self.d, w=self.w)
        cells.write.mode("overwrite").parquet(str(self.root / "cms" / f"epoch={epoch_id}"))
        if self.group_col is not None:
            from tera_spark.functions.cache import CacheScope

            part = batch.select(
                F.col(self.group_col).alias("g"),
                h60(F.col(self.key_col).cast("string")).alias("h"),
            ).distinct()
            # scope the merge's internal persist to this fold call —
            # a per-micro-batch persist would otherwise pin one cached
            # relation per epoch until LRU eviction
            with CacheScope(self.spark) as scope:
                sk, _ = theta_merge(part, self.k, scope=scope)
                sk.write.mode("overwrite").parquet(
                    str(self.root / "theta" / f"epoch={epoch_id}")
                )

    # -- merged-on-read questions ----------------------------------------
    def _cells(self) -> DataFrame:
        return (
            self.spark.read.option("basePath", str(self.root / "cms"))
            .parquet(str(self.root / "cms"))
            .groupBy("r", "b")
            .agg(F.sum("c").alias("c"))
        )

    def estimate(self, keys: DataFrame, key_col: str | None = None) -> DataFrame:
        """CMS frequency estimate for a candidate-key relation: min over
        the d merged rows of each key's bucket count."""
        key_col = key_col or self.key_col
        cells = self._cells()
        est = keys.select(F.col(key_col).cast("string").alias("k"))
        for i in range(self.d):
            ci = cells.filter(F.col("r") == i).select(
                F.col("b").alias(f"b{i}"), F.col("c").alias(f"c{i}")
            )
            est = est.withColumn(
                f"b{i}", h60(F.concat(F.lit(f"{i}:"), F.col("k"))) % self.w
            ).join(F.broadcast(ci), f"b{i}", "left")
        cms = F.least(*[F.coalesce(F.col(f"c{i}"), F.lit(0)) for i in range(self.d)])
        return est.select(
            F.col("k").alias(key_col), cms.cast("long").alias("cms_count")
        )

    def theta(self) -> tuple[DataFrame, DataFrame]:
        """Merged (sketch, thetas) across every folded epoch."""
        rows = (
            self.spark.read.option("basePath", str(self.root / "theta"))
            .parquet(str(self.root / "theta"))
            .select("g", "h")
        )
        return theta_merge(rows, self.k)

    def set_ops(self, pairs: DataFrame) -> DataFrame:
        sk, th = self.theta()
        return theta_set_ops(sk, th, pairs)

    # -- streaming attachment ---------------------------------------------
    def stream(self, source_path: str, checkpoint: str, schema: str):
        """foreachBatch driver: fold every micro-batch exactly once
        under the checkpoint's replay semantics."""
        s = self.spark.readStream.schema(schema).parquet(source_path)
        return (
            s.writeStream.foreachBatch(lambda df, eid: self.fold(df, eid))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
