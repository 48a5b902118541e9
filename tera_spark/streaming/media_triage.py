"""Streaming media triage over a crawl-asset stream.

Each micro-batch of assets is sniffed by magic bytes (pure JVM
expressions — multimodal.sniff_formats), MP3 payloads additionally
get the container-metadata walk under the quarantine policy, and the
epoch's census — per format: asset count, byte volume, and how many
failed the walk — lands in epoch-partitioned parquet with
overwrite-on-replay. Because a replayed micro-batch rewrites its own
``epoch=<id>`` partition instead of double-counting, the fold is
exactly-once under foreachBatch checkpoint semantics — the same
stance as the streaming sketch fold (sketch_fold.py) and changefeed
(mview.py). Quarantined asset ids land beside the census so a
corrupt-payload spike is inspectable, not just countable.

This is the streaming twin of the batch triage census
(queries/llmops.py multimodal_format_sniff): the per-epoch census
rows merge on read into EXACTLY the batch census, so a pipeline can
backfill batch and then stream (monitor ≡ batch twin, the
drift-monitor discipline).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CENSUS_SCHEMA = (
    "format string, n_assets long, n_bytes long, n_quarantined long"
)


class MediaTriage:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        for sub in ("census", "quarantine"):
            (self.root / sub).mkdir(parents=True, exist_ok=True)

    # -- fold one micro-batch -------------------------------------------
    def fold(self, batch: DataFrame, epoch_id: int = 0) -> None:
        """Sniff + walk this epoch's assets; overwrite-on-replay."""
        from tera_spark.operators.multimodal import (
            extract_flac_features,
            extract_mp3_metadata,
            sniff_formats,
        )

        sniffed = sniff_formats(batch).withColumn(
            "n_bytes", F.coalesce(F.length("payload"), F.lit(0)).cast("long")
        )
        # the deep walks run only on the formats that have one;
        # everything they reject under the typed-error contract is
        # quarantined. MP3 walks the container; FLAC decodes samples
        # (so its quarantine also catches CRC/MD5-corrupt streams).
        bad_mp3 = (
            extract_mp3_metadata(
                sniffed.filter(F.col("format") == "mp3"), on_error="quarantine"
            )
            .filter(F.col("n_frames") == -1)
            .select("asset_id", "n_bytes")
        )
        bad_flac = (
            extract_flac_features(
                sniffed.filter(F.col("format") == "flac"), on_error="quarantine"
            )
            .filter(F.col("n_samples") == -1)
            .select("asset_id", "n_bytes")
        )
        bad = bad_mp3.unionByName(bad_flac)
        qpath = self.root / "quarantine" / f"epoch={epoch_id}"
        bad.write.mode("overwrite").parquet(str(qpath))
        # the census join reads the JUST-WRITTEN quarantine partition
        # back instead of re-deriving `bad` — otherwise the MP3 deep
        # walk (the epoch's most expensive Python stage) would run a
        # second time under the join; the parquet write is the persist
        bad_ids = (
            self.spark.read.schema("asset_id long, n_bytes long")
            .parquet(str(qpath))
            .select("asset_id", F.lit(1).alias("quarantined"))
        )
        # no broadcast hint: the quarantine side is usually tiny, but a
        # pathological epoch (most assets corrupt) makes bad_ids
        # corpus-sized and a FORCED broadcast would blow the broadcast
        # memory limit and fail the epoch — the parquet read-back has
        # real size stats, so Catalyst picks broadcast exactly when the
        # partition is under the threshold
        census = (
            sniffed.join(bad_ids, "asset_id", "left")
            .groupBy("format")
            .agg(
                F.count("*").cast("long").alias("n_assets"),
                F.sum("n_bytes").cast("long").alias("n_bytes"),
                F.coalesce(F.sum("quarantined"), F.lit(0))
                .cast("long")
                .alias("n_quarantined"),
            )
        )
        census.write.mode("overwrite").parquet(
            str(self.root / "census" / f"epoch={epoch_id}")
        )

    # -- merged-on-read questions ----------------------------------------
    def census(self) -> DataFrame:
        """All-epochs census: identical shape to the batch triage agg."""
        return (
            self.spark.read.option("basePath", str(self.root / "census"))
            .schema(CENSUS_SCHEMA + ", epoch int")
            .parquet(str(self.root / "census"))
            .groupBy("format")
            .agg(
                F.sum("n_assets").alias("n_assets"),
                F.sum("n_bytes").alias("n_bytes"),
                F.sum("n_quarantined").alias("n_quarantined"),
            )
        )

    def quarantine(self) -> DataFrame:
        """Asset ids that failed the deep walk, with their epoch."""
        return (
            self.spark.read.option("basePath", str(self.root / "quarantine"))
            .schema("asset_id long, n_bytes long, epoch int")
            .parquet(str(self.root / "quarantine"))
        )

    # -- the real streaming path ------------------------------------------
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
