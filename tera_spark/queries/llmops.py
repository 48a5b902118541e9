"""LLM-training-pipeline operators over documents/embeddings —
deduplication, similarity search, text analysis. Initial slice; the
operator implementations live in tera_spark/operators/{dedup,
similarity,textops}.py and grow in M4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.queries import query
from tera_spark.sources.tables import load


@query(
    "dedup_exact_hash",
    """
    SELECT md5(text) AS text_hash,
           cast(count(*) AS bigint) AS n_copies,
           cast(min(doc_id) AS bigint) AS keeper
    FROM documents GROUP BY md5(text) HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_copies") > 1)
    )


@query(
    "doc_token_stats",
    """
    SELECT doc_id,
           cast(len(string_split_regex(trim(text), '\\s+')) AS bigint) AS n_tokens,
           cast(length(text) AS bigint) AS n_chars
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def doc_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(F.col("doc_id") % 7 == 0)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
