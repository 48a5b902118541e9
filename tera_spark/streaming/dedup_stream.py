"""Streaming dedup admission: the continuously-ingesting form of
batch-vs-corpus dedup (operators/dedup.py incremental_dedup).

A training-data pipeline at 100 TB never re-dedups the corpus against
itself — it admits arriving batches against two STANDING keyed sets:

    <root>/hashes/     distinct md5(text) of every admitted document
    <root>/buckets/    distinct MinHash LSH band buckets of admitted docs
    <root>/decisions/  (doc_id, verdict, batch) audit log per epoch

Each batch is classified 'exact' / 'near' / 'unique' (the same verdict
semantics as incremental_dedup, extended with deterministic in-batch
rules: an in-batch exact duplicate keeps min(doc_id) as keeper; a doc
sharing an LSH bucket with a smaller-id surviving batch doc is 'near').
Only 'unique' docs extend the standing sets, so set growth is bounded
by admitted volume — the corpus text itself is never re-read.

Exactly-once: driven by Structured Streaming foreachBatch with the
checkpoint as the ack (same stance as the observer pipeline and
mview); re-running a failed epoch re-appends the same decision rows
under the same batch id, and set appends are idempotent by key because
re-classification against the already-extended sets yields the same
admitted subset — the decision log is keyed (batch, doc_id) for
dedup-on-read.

Reference analog: tera's observer framework reacts per-changed-cell
(scanner_impl.cc polling); this is the same arrive→process→ack loop
with dedup as the observer body.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.functions.text import band_keys, with_minhash_signature


class DedupAdmission:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.spark = spark
        self.root = Path(root)
        self.text_col = text_col
        self.id_col = id_col
        for sub in ("hashes", "buckets", "decisions"):
            (self.root / sub).mkdir(parents=True, exist_ok=True)
        self._seed("hashes", "h string")
        self._seed("buckets", "bucket string")

    def _seed(self, sub: str, ddl: str) -> None:
        p = self.root / sub
        if not any(p.glob("*.parquet")) and not any(p.glob("_SUCCESS")):
            self.spark.createDataFrame([], ddl).write.mode("overwrite").parquet(str(p))

    def _read(self, sub: str) -> DataFrame:
        return self.spark.read.parquet(str(self.root / sub))

    def admit(self, batch: DataFrame, epoch_id: int = 0) -> DataFrame:
        """Classify one batch against the standing sets, record the
        decisions, extend the sets with the admitted docs. Returns the
        decision DataFrame (doc_id, verdict)."""
        b = batch.select(
            F.col(self.id_col).alias("id"),
            F.md5(self.text_col).alias("h"),
            F.col(self.text_col).alias("_t"),
        ).persist()

        corp_h = self._read("hashes")
        corp_b = self._read("buckets")

        # exact: vs corpus, then in-batch keeper rule (min id per hash)
        exact_corpus = b.join(corp_h, "h", "left_semi").select("id")
        keeper = b.groupBy("h").agg(F.min("id").alias("kid"))
        exact_batch = (
            b.join(keeper, "h").filter(F.col("id") != F.col("kid")).select("id")
        )
        exact_ids = exact_corpus.unionByName(exact_batch).distinct().persist()

        bands = with_minhash_signature(
            b.select("id", F.col("_t").alias(self.text_col)), self.text_col
        ).select("id", F.explode(band_keys("sig")).alias("bucket")).persist()

        survivors = bands.join(exact_ids, "id", "left_anti")
        near_corpus = survivors.join(corp_b, "bucket", "left_semi").select("id")
        sa, sb = survivors.alias("sa"), survivors.alias("sb")
        near_batch = (
            sa.join(sb, "bucket")
            .filter(F.col("sb.id") < F.col("sa.id"))
            .select(F.col("sa.id").alias("id"))
        )
        near_ids = near_corpus.unionByName(near_batch).distinct()

        decisions = (
            b.select("id")
            .distinct()
            .join(exact_ids.withColumn("_e", F.lit(True)), "id", "left")
            .join(near_ids.withColumn("_n", F.lit(True)), "id", "left")
            .select(
                "id",
                F.when(F.coalesce(F.col("_e"), F.lit(False)), "exact")
                .when(F.coalesce(F.col("_n"), F.lit(False)), "near")
                .otherwise("unique")
                .alias("verdict"),
                F.lit(int(epoch_id)).alias("batch"),
            )
            .persist()
        )

        admitted = decisions.filter(F.col("verdict") == "unique").select("id")
        new_hashes = (
            b.join(admitted, "id", "left_semi").select("h").distinct()
            .join(corp_h, "h", "left_anti")
        )
        new_buckets = (
            bands.join(admitted, "id", "left_semi").select("bucket").distinct()
            .join(corp_b, "bucket", "left_anti")
        )
        # materialize the three outputs BEFORE any append: appending to
        # hashes/ invalidates every cached plan reading that path
        # (CacheManager.recacheByPath), so a lazy new_buckets would
        # re-classify against the just-extended sets and come out empty
        decisions_m = decisions.localCheckpoint()
        new_hashes_m = new_hashes.localCheckpoint()
        new_buckets_m = new_buckets.localCheckpoint()
        decisions_m.write.mode("append").parquet(str(self.root / "decisions"))
        new_hashes_m.write.mode("append").parquet(str(self.root / "hashes"))
        new_buckets_m.write.mode("append").parquet(str(self.root / "buckets"))
        for df in (b, exact_ids, bands, decisions):
            df.unpersist()
        # read the persisted log back — a lazily re-evaluated plan would
        # re-classify against the just-extended sets and flip verdicts
        return (
            self._read("decisions")
            .filter(F.col("batch") == int(epoch_id))
            .dropDuplicates(["id"])
            .select("id", "verdict")
        )

    def decisions(self) -> DataFrame:
        """Audit log, deduped on (batch, id) for replayed epochs."""
        return self._read("decisions").dropDuplicates(["batch", "id"])

    def stream(self, source_path: str, checkpoint: str, schema: str):
        """Drain a parquet-file document stream through admit() with
        availableNow (checkpoint = ack; cron-style like mview.refresh)."""
        s = self.spark.readStream.schema(schema).parquet(source_path)
        q = (
            s.writeStream.foreachBatch(lambda df, eid: (self.admit(df, eid), None)[1])
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q
