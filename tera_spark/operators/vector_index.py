"""Persistent IVF-PQ vector index: build once, query many.

Composes the ANN primitives (train_kmeans coarse centroids, train_pq
codebook, map-only pq encode, ADC scoring) into an on-disk artifact a
serving/search pipeline reuses without retraining:

    <path>/meta.json   centroids + PQ codebook (tiny by construction)
    <path>/codes/      parquet (id, cluster, codes[m]) — the ONLY
                       N-sized piece, ~m bytes/vector + the cluster id

Search = FAISS IVF-PQ re-expressed relationally: probe the nprobe
nearest centroid lists (broadcast, query-side), filter the codes
table by cluster — partitioned by cluster on write, so probing is
partition pruning, the tablet-routing story again — then ADC-score
with each query's m×k distance table and rank per query.

Vectors are L2-normalized at build and query time, so ADC-L2 ranking
is cosine ranking. Recall scales with codebook resolution — measured
on the synthetic (near-random, worst-case) embeddings at recall@10 vs
brute force: m=8/k=16 -> 0.18, m=16/k=64 -> 0.55, m=32/k=64 -> 0.75;
structured real embeddings fare far better at equal bits.

The reference has no vector surface; this is north-star LLM-pipeline
work layered on the same storage discipline as the cell tables
(sorted/partitioned parquet + footer pruning).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.operators.similarity import (
    _dot,
    _pq_literal,
    ivf_assign,
    pq_encode,
    train_kmeans,
    train_pq,
)


def _l2_normalize(df: DataFrame, vec_col: str) -> DataFrame:
    """Unit-normalize the vectors (map-only). With unit vectors,
    L2 ordering is cosine ordering — the standard IVF-PQ setup for
    cosine similarity (||a-b||^2 = 2 - 2cos)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(_dot(v, v))
    return df.withColumn(
        vec_col, F.transform(v, lambda x: x / F.greatest(norm, F.lit(1e-12)))
    )


class VectorIndex:
    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = Path(path)
        self.centroids = meta["centroids"]  # [[float]] k_coarse × dim
        self.codebook = meta["codebook"]    # [[[float]]] m × k × dim/m

    # -- build / load --------------------------------------------------
    @classmethod
    def build(
        cls,
        vectors: DataFrame,
        path: str,
        *,
        k_coarse: int = 8,
        m: int = 8,
        k_codes: int = 16,
        iters: int = 3,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "VectorIndex":
        spark = vectors.sparkSession
        vectors = _l2_normalize(vectors, vec_col)
        cents_df = train_kmeans(
            vectors, k=k_coarse, iters=iters, id_col=id_col, vec_col=vec_col
        )
        codebook = train_pq(
            vectors, m=m, k=k_codes, iters=iters, id_col=id_col, vec_col=vec_col
        )
        assigned = ivf_assign(
            vectors, cents_df, id_col=id_col, vec_col=vec_col, cid_col="centroid_id"
        ).select("id", "cluster")
        codes = pq_encode(vectors, codebook, id_col=id_col, vec_col=vec_col)
        table = assigned.join(codes, "id")
        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        # cluster-partitioned layout: a probe reads only its listed
        # partitions (directory pruning = the inverted "lists")
        table.write.mode("overwrite").partitionBy("cluster").parquet(str(p / "codes"))
        meta = {
            "centroids": [list(r["embedding"]) for r in sorted(
                cents_df.collect(), key=lambda r: r["centroid_id"]
            )],
            "codebook": codebook,
        }
        (p / "meta.json").write_text(json.dumps(meta))
        return cls(spark, path, meta)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "VectorIndex":
        meta = json.loads((Path(path) / "meta.json").read_text())
        return cls(spark, path, meta)

    # -- search --------------------------------------------------------
    def topk(
        self,
        queries: DataFrame,
        *,
        k: int = 5,
        nprobe: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        from pyspark.sql import Window as W

        queries = _l2_normalize(queries, vec_col)
        m = len(self.codebook)
        d_sub = len(self.codebook[0][0])
        cb = _pq_literal(self.codebook)
        cents = F.array(
            *[F.array(*[F.lit(x) for x in c]) for c in self.centroids]
        )
        qvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))

        # nprobe nearest coarse centroids per query (query-side, tiny)
        def cdist(c):
            diff = F.zip_with(qvec, c, lambda x, y: x - y)
            return F.aggregate(
                F.zip_with(diff, diff, lambda x, y: x * y), F.lit(0.0), lambda a, p: a + p
            )

        scored_cents = F.transform(
            cents, lambda c, i: F.struct(cdist(c).alias("d"), i.alias("cid"))
        )
        probes_arr = F.slice(F.array_sort(scored_cents), 1, nprobe)

        def qtab_for(j):
            svec = F.slice(qvec, j * d_sub + 1, d_sub)
            return F.transform(
                F.get(cb, j),
                lambda cvec: F.aggregate(
                    F.zip_with(
                        F.zip_with(svec, cvec, lambda x, y: x - y),
                        F.zip_with(svec, cvec, lambda x, y: x - y),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda a, p: a + p,
                ),
            )

        q = queries.select(
            F.col(id_col).alias("q_id"),
            F.explode(F.transform(probes_arr, lambda p: p["cid"])).alias("cluster"),
            F.array(*[qtab_for(j) for j in range(m)]).alias("qtab"),
        )
        codes = self.spark.read.parquet(str(self.path / "codes"))
        adc = F.aggregate(
            F.zip_with(F.col("codes"), F.col("qtab"), lambda c, row: F.get(row, c)),
            F.lit(0.0),
            lambda a, p: a + p,
        )
        scored = (
            codes.join(F.broadcast(q), "cluster")
            .filter(F.col("id") != F.col("q_id"))
            .select("q_id", F.col("id").alias("v_id"), F.round(adc, 6).alias("adc_d2"))
        )
        wr = W.partitionBy("q_id").orderBy("adc_d2", "v_id")
        return (
            scored.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k)
            .select("q_id", "v_id", "adc_d2", F.col("rank").cast("long").alias("rank"))
        )

    # -- incremental maintenance ---------------------------------------
    def append(
        self,
        vectors: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """Encode new vectors against the EXISTING codebook/centroids
        (map-only — both ride as literals) and append them to their
        cluster partitions. This is the steady-state ingestion path:
        the corpus grows without retraining; rebuild only on codebook
        drift. Appends are partition-local, so a batch touches only
        the clusters it lands in."""
        vecs = _l2_normalize(vectors, vec_col)
        cents = F.array(*[F.array(*[F.lit(x) for x in c]) for c in self.centroids])
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

        def cdist(c):
            diff = F.zip_with(v, c, lambda x, y: x - y)
            return F.aggregate(
                F.zip_with(diff, diff, lambda x, y: x * y), F.lit(0.0), lambda a, p: a + p
            )

        scored = F.transform(cents, lambda c, i: F.struct(cdist(c).alias("d"), i.alias("cid")))
        cluster = F.get(F.array_sort(scored), 0)["cid"]
        assigned = vecs.select(F.col(id_col).alias("id"), cluster.alias("cluster"), F.col(vec_col))
        codes = pq_encode(
            assigned.select(F.col("id").alias(id_col), F.col(vec_col)),
            self.codebook,
            id_col=id_col,
            vec_col=vec_col,
        )
        table = assigned.select("id", "cluster").join(codes, "id")
        table.write.mode("append").partitionBy("cluster").parquet(str(self.path / "codes"))
