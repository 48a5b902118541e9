"""Deduplication operators for large-scale training-data pipelines.

Four families, all shuffle-aware and UDF-free:

* exact     — hash-groupBy on md5(text): one shuffle on the hash.
* MinHash+LSH — shingle → 16 minhashes → 4 bands → bucket join.
  At 100 TB the bucket join is the only shuffle and its key space is
  the band hash, so co-candidates co-locate; everything upstream is a
  map-only expression pipeline.
* SimHash   — 60-bit count-weighted fingerprint; near-dups share
  fingerprints with small Hamming distance (band the fingerprint for
  joins).
* n-gram Jaccard — exact verification over candidate pairs (array
  set ops on distinct shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tera_spark.functions.text import (
    band_keys,
    shingles,
    with_minhash_signature,
    with_simhash,
)
from tera_spark.sources.tables import ensure_parallelism


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents (keeper = min id)."""
    return (
        docs.groupBy(F.md5(text_col).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keeper"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
        .filter(F.col("n_copies") > 1)
    )


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Candidate near-duplicate pairs: documents sharing ≥1 LSH band
    bucket. Returns (id_a, id_b) with id_a < id_b, distinct."""
    sigs = (
        with_minhash_signature(ensure_parallelism(docs), text_col)
        .select(
            F.col(id_col).alias("id"),
            F.explode(band_keys(F.col("sig"))).alias("bucket"),
        )
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return with_simhash(ensure_parallelism(docs), text_col).select(
        F.col(id_col).alias("id"), "simhash"
    )


def jaccard_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_expr=None,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact 3-gram Jaccard over bucketed candidate pairs. The bucket
    expression bounds the quadratic blow-up (LSH buckets in production;
    any deterministic partition key works)."""
    base = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"),
        (bucket_expr if bucket_expr is not None else F.col(id_col) % 100).alias("bkt"),
        F.array_distinct(shingles(F.col(text_col))).alias("sh"),
    )
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = inter.cast("double") / union
    return (
        a.join(b, "bkt")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def verified_near_duplicates(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """The production composition: LSH candidates → exact-Jaccard
    verification (candidates only, never all pairs).

    The per-doc fingerprint row (id, shingle set, minhash signature) is
    derived once behind an explicit repartition on id: the candidate
    join's two band-exploded sides and the verification's two
    shingle-lookup sides all hang off that same Exchange, which Spark
    deduplicates into ONE computation + three ReusedExchange reads.
    Without the boundary each consumer re-derives the whole text
    pipeline from the parquet scan. This is the single-node stand-in
    for the 100 TB deployment shape — a materialized fingerprint table
    read by both phases."""
    base = (
        with_minhash_signature(ensure_parallelism(docs), text_col)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(shingles(F.col(text_col))).alias("sh"),
            F.col("sig"),
        )
        .repartition("id")
    )
    sigs = base.select("id", F.explode(band_keys(F.col("sig"))).alias("bucket"))
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = base.select("id", "sh")
    j = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        j.select(
            "id_a", "id_b", F.round(inter.cast("double") / union, 6).alias("jaccard")
        ).filter(F.col("jaccard") >= threshold)
    )
