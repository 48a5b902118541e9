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
is cosine ranking. PQ encodes RESIDUALS (vec - coarse centroid), the
IVF-ADC design of Jégou et al. 2011 — the codebook only resolves the
spread within a coarse cell, which on clustered corpora roughly
triples recall at equal bits vs raw-vector PQ (planted-neighbor
smoke, scripts/scale_smoke_ann.py: 0.18 raw -> 0.59 residual at
m=8/k=32, 0.67 at m=16/k=32). Recall scales with codebook
resolution; near-random vectors are the worst case, structured real
embeddings fare better at equal bits. Older (pre-residual) indexes
load and search unchanged via the meta.json `residual` flag.

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
        # pre-residual indexes (older meta.json) encoded raw vectors
        self.residual = bool(meta.get("residual", False))
        # indexes built before the refinement store can't re-rank
        self.has_rerank_store = bool(meta.get("rerank", False))
        # corpus size at build time (selectivity denominator for the
        # adaptive-nprobe rule); pre-round-7 indexes lack it and fall
        # back to a one-time codes count
        self.n_vectors = meta.get("n_vectors")

    # -- build / load --------------------------------------------------
    @classmethod
    def build(
        cls,
        vectors: DataFrame,
        path: str,
        *,
        k_coarse: int = 8,
        m: int | None = None,
        k_codes: int = 16,
        iters: int = 3,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        sample: int | None = 100_000,
    ) -> "VectorIndex":
        spark = vectors.sparkSession
        vectors = _l2_normalize(vectors, vec_col)
        cents_df = train_kmeans(
            vectors, k=k_coarse, iters=iters, id_col=id_col, vec_col=vec_col,
            sample=sample,
        )
        centroids = [
            list(r[vec_col])
            for r in sorted(cents_df.collect(), key=lambda r: r["centroid_id"])
        ]
        if m is None:
            # Auto sub-quantizer count — the round-9 codebook-resolution
            # decision (scripts/scale_smoke_filtered_ann.py codebook
            # mode, 1M vectors / 50% allow-list, shipped adaptive
            # rerank): m=16 -> 32 over 64 dims lifts filtered recall@10
            # 0.964 -> 0.998 at comparable build cost (403 s vs 455 s)
            # and 1.5x search (46 s vs 31 s / 50 queries); k_codes
            # 32 -> 256 at m=16 reads 0.986. Doubling m is the better
            # lever: per-subspace Lloyd's stays k-small, codes grow
            # only m bytes/vector, and the ADC table stays m x k. So
            # the default is the largest divisor of dim up to 32 with
            # sub-vector width >= 2 (dim 64 -> m=32, width 2).
            dim = len(centroids[0])
            m = max(
                (c for c in range(2, 33) if dim % c == 0 and dim // c >= 2),
                default=1,
            )
        cents_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
        # residual encoding (the IVF-ADC design, Jégou et al. 2011):
        # PQ is trained on and encodes (vec - coarse_centroid), not the
        # raw vector. The codebook then only has to resolve the spread
        # WITHIN a coarse cell, not the whole space — without this,
        # ADC cannot separate neighbors inside one cell and recall
        # collapses on clustered corpora.
        assigned = ivf_assign(
            vectors, cents_df, id_col=id_col, vec_col=vec_col, cid_col="centroid_id"
        )
        residuals = assigned.select(
            F.col("id").alias(id_col),
            "cluster",
            F.zip_with(
                F.transform(F.col("vec"), lambda x: x.cast("double")),
                F.get(cents_lit, F.col("cluster")),
                lambda x, y: x - y,
            ).alias(vec_col),
        ).cache()
        codebook = train_pq(
            residuals, m=m, k=k_codes, iters=iters, id_col=id_col, vec_col=vec_col,
            sample=sample,
        )
        # cluster rides through the encode projection (keep=) — joining
        # the codes back to residuals on id would shuffle 2×N rows to
        # reattach a column the encode row already has
        table = pq_encode(
            residuals, codebook, id_col=id_col, vec_col=vec_col, keep=("cluster",)
        )
        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        # cluster-partitioned layout: a probe reads only its listed
        # partitions (directory pruning = the inverted "lists")
        table.write.mode("overwrite").partitionBy("cluster").parquet(str(p / "codes"))
        # refinement store for exact re-rank (the FAISS refine/IVFPQR
        # role): normalized float32 vectors, same cluster layout. Read
        # only by the top-C re-rank join, never by ADC scoring.
        # Reconstructed from the CACHED residuals (vec = residual +
        # centroid[cluster]) — exact, and it skips a second full-corpus
        # ivf_assign pass (N × k_coarse × dim distance evaluations).
        residuals.select(
            F.col(id_col).alias("id"),
            "cluster",
            F.transform(
                F.zip_with(
                    F.col(vec_col), F.get(cents_lit, F.col("cluster")), lambda r, c: r + c
                ),
                lambda x: x.cast("float"),
            ).alias("vec"),
        ).write.mode("overwrite").partitionBy("cluster").parquet(str(p / "vectors"))
        n_vectors = residuals.count()  # cached: a metadata-cheap pass
        residuals.unpersist()
        meta = {
            "centroids": centroids,
            "codebook": codebook,
            "residual": True,
            "rerank": True,
            "n_vectors": n_vectors,
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
        nprobe: int | None = None,
        rerank: int | None = 100,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        allowed: DataFrame | None = None,
        allowed_id_col: str = "vec_id",
        brute_limit: int = 10_000,
    ) -> DataFrame:
        """IVF-PQ search with exact re-rank.

        ``allowed`` turns this into METADATA-FILTERED search: a
        DataFrame of permitted vector ids (computed upstream from any
        predicate — language, license, dedup survivor set) that is
        semi-joined against the codes table BEFORE ADC scoring. This
        is pre-filtering: every one of the k results satisfies the
        predicate and no result is dropped after ranking — unlike
        post-filtering (search then drop), which under-fills k under
        selective predicates. Recall against the filtered corpus is
        bounded by the probed cells, and a SELECTIVE allow-list is
        exactly where cell ranking stops being informative (the
        nearest allowed vectors may sit in far cells), so the filter
        adapts on two axes:

        * ``n_allowed <= brute_limit`` (and a refinement store
          exists): skip IVF entirely and exact-score the filtered
          refinement store — FULL recall by construction, and cheap
          because cost is O(n_allowed x queries), not corpus-sized.
          ``adc_d2`` equals the exact ``d2`` on this path.
        * otherwise BOTH search knobs scale inversely with
          selectivity: nprobe_eff = min(k_coarse, ceil(nprobe x
          n_total / n_allowed)), and the exact-rerank candidate set
          C_eff = ceil(rerank x max(n_total / n_allowed, 4)) capped
          at 10k (the 4x floor is the round-8 mid-selectivity fix:
          1M/50% recall 0.936 -> 0.964 at C_eff 400) —
          the measured filtered-IVF miss mode is ADC resolution
          inside probed cells, which wider C fixes at flat cost
          (recall@10 0.818 -> 0.996 at 1M/10%), while extra probes
          only add scan breadth (ADC scores allowed rows only).
          Measured curve: SCALE.md §"Filtered ANN".

        Catalyst picks broadcast for a small allow-list and a shuffle
        join for a wide one; the codes table itself still never
        shuffles.

        ``nprobe=None`` autotunes to ceil(sqrt(k_coarse)) (clamped to
        k_coarse) — the √k probe rule keeps the scanned fraction
        ~sqrt(k)/k as the codebook grows, the usual IVF starting point.

        ``rerank=C`` (default 100) takes the top-C ADC candidates per
        query and re-scores them with EXACT L2 against the float
        refinement store (`<path>/vectors`, cluster-partitioned) — the
        FAISS refine stage. ADC error then only has to keep a true
        neighbor inside the top C, not rank it exactly: measured on the
        1M planted-neighbor smoke this lifts recall@10 from 0.67 to
        ~1.0 for one candidate-sized broadcast join (the N-sized codes
        side still never shuffles). ``rerank=None`` (or a pre-refine
        index) returns raw ADC ranking."""
        from pyspark.sql import Window as W

        if nprobe is None:
            import math

            nprobe = min(max(2, math.isqrt(len(self.centroids) - 1) + 1), len(self.centroids))
        if rerank is not None:
            rerank = max(rerank, k)  # C >= k: the refine set must cover the answer
        ids = None
        if allowed is not None:
            ids = allowed.select(F.col(allowed_id_col).alias("id")).distinct()
            n_allowed = ids.count()  # one tiny job; the list is id-only
            if self.has_rerank_store and n_allowed <= brute_limit:
                out = self._brute_filtered(
                    queries, ids, k=k, id_col=id_col, vec_col=vec_col
                )
                if rerank is None:  # keep the raw-ADC path's 4-col schema
                    out = out.select("q_id", "v_id", "adc_d2", "rank")
                return out
            nprobe = self._effective_nprobe(nprobe, n_allowed)
            if rerank is not None and self.has_rerank_store:
                rerank = self._effective_rerank(rerank, n_allowed)
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

        def qtab_for(j, base):
            svec = F.slice(base, j * d_sub + 1, d_sub)
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

        # residual indexes: the ADC table is built per probed cluster
        # from (q - centroid[cluster]), so qtab is computed after the
        # probe explode; raw (legacy) indexes use the query vector and
        # a cluster-independent table. Still query-side-only work:
        # nprobe × m × k tiny aggregates per query.
        q0 = queries.select(
            F.col(id_col).alias("q_id"),
            qvec.alias("qv"),
            F.explode(F.transform(probes_arr, lambda p: p["cid"])).alias("cluster"),
        )
        base = (
            F.zip_with(F.col("qv"), F.get(cents, F.col("cluster")), lambda x, y: x - y)
            if self.residual
            else F.col("qv")
        )
        q = q0.select(
            "q_id",
            "cluster",
            F.array(*[qtab_for(j, base) for j in range(m)]).alias("qtab"),
        )
        codes = self.spark.read.parquet(str(self.path / "codes"))
        if ids is not None:
            codes = codes.join(ids, "id", "left_semi")
        scored = self._adc_scores(codes, q)
        wr = W.partitionBy("q_id").orderBy("adc_d2", "v_id")
        if rerank is None or not self.has_rerank_store:
            return (
                scored.withColumn("rank", F.row_number().over(wr))
                .filter(F.col("rank") <= k)
                .select("q_id", "v_id", "adc_d2", F.col("rank").cast("long").alias("rank"))
            )
        cand = (
            scored.withColumn("_ar", F.row_number().over(wr))
            .filter(F.col("_ar") <= rerank)
            .select("q_id", "v_id", "adc_d2")
        )
        # exact re-rank: candidates (nq × C, tiny) BROADCAST against the
        # refinement store — map-side hash join, the vector table never
        # shuffles; then one window over the candidate-sized result
        refine = self.spark.read.parquet(str(self.path / "vectors")).select(
            F.col("id").alias("v_id"), F.col("vec").alias("r_vec")
        )
        qv = queries.select(
            F.col(id_col).alias("q_id"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("q_vec"),
        )
        diff = F.zip_with(
            F.col("q_vec"), F.col("r_vec"), lambda x, y: x - y.cast("double")
        )
        exact_d2 = F.aggregate(
            F.zip_with(diff, diff, lambda x, y: x * y), F.lit(0.0), lambda a, p: a + p
        )
        rescored = (
            refine.join(F.broadcast(cand), "v_id")
            .join(F.broadcast(qv), "q_id")
            .select("q_id", "v_id", "adc_d2", F.round(exact_d2, 6).alias("d2"))
        )
        we = W.partitionBy("q_id").orderBy("d2", "v_id")
        return (
            rescored.withColumn("rank", F.row_number().over(we))
            .filter(F.col("rank") <= k)
            .select("q_id", "v_id", "adc_d2", "d2", F.col("rank").cast("long").alias("rank"))
        )

    def _effective_nprobe(self, nprobe: int, n_allowed: int) -> int:
        """Inverse-selectivity probe widening for filtered search:
        nprobe / (n_allowed / n_total), clamped to [nprobe, k_coarse].
        Cheap by construction — ADC scores only allowed rows, so wider
        probing adds scan breadth, not distance math."""
        import math

        n_total = self.n_vectors
        if n_total is None:  # pre-round-7 index: count codes once
            n_total = self.spark.read.parquet(str(self.path / "codes")).count()
            self.n_vectors = n_total
        if n_allowed <= 0:
            return len(self.centroids)
        scaled = math.ceil(nprobe * n_total / n_allowed)
        return min(len(self.centroids), max(nprobe, scaled))

    def _effective_rerank(self, rerank: int, n_allowed: int) -> int:
        """Inverse-selectivity widening of the exact-rerank candidate
        set for filtered IVF search. Measured at 1M/10% (SCALE.md):
        the filtered miss mode is ADC resolution inside already-probed
        cells, NOT probe coverage — recall@10 went 0.818 -> 0.966 ->
        0.996 by raising C 100 -> 400 -> 1000 at FLAT cost (the refine
        join is candidate-sized), while widening nprobe 4 -> 40 bought
        nothing. The multiplier is FLOORED at 4x (round 8): the
        mid/high-selectivity regime is where pure inverse scaling
        engages weakest (50% allowed -> only 2x) yet ADC resolution
        against the filtered ground truth still misses — measured at
        1M/50%: C_eff 200 -> 400 lifts recall@10 0.936 -> 0.964
        (0.972 at 800; the curve's knee is ~400). Capped at
        max(rerank, 10k) so the candidate broadcast stays small."""
        import math

        n_total = self.n_vectors or n_allowed
        scaled = math.ceil(rerank * max(n_total / max(n_allowed, 1), 4.0))
        return min(max(rerank, scaled), max(rerank, 10_000))

    def _brute_filtered(
        self, queries: DataFrame, ids: DataFrame, *, k: int, id_col: str, vec_col: str
    ) -> DataFrame:
        """Exact search over the FILTERED refinement store — the
        small-allow-list fallback. Full recall by construction: every
        allowed vector is scored with exact L2 on the stored
        (normalized float32) vectors; no probe can miss. Shape:
        allow-list semi-join prunes the store, queries broadcast onto
        it (BroadcastNestedLoopJoin — never a shuffle of the store),
        one candidate-sized window ranks. Same output schema as the
        re-rank path, with adc_d2 = d2 (there is no ADC stage)."""
        from pyspark.sql import Window as W

        refine = (
            self.spark.read.parquet(str(self.path / "vectors"))
            .join(ids, "id", "left_semi")
            .select(F.col("id").alias("v_id"), F.col("vec").alias("r_vec"))
        )
        qv = _l2_normalize(queries, vec_col).select(
            F.col(id_col).alias("q_id"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("q_vec"),
        )
        diff = F.zip_with(
            F.col("q_vec"), F.col("r_vec"), lambda x, y: x - y.cast("double")
        )
        d2 = F.round(
            F.aggregate(
                F.zip_with(diff, diff, lambda x, y: x * y), F.lit(0.0), lambda a, p: a + p
            ),
            6,
        )
        scored = (
            refine.crossJoin(F.broadcast(qv))
            .filter(F.col("v_id") != F.col("q_id"))
            .select("q_id", "v_id", d2.alias("d2"))
        )
        w = W.partitionBy("q_id").orderBy("d2", "v_id")
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "q_id",
                "v_id",
                F.col("d2").alias("adc_d2"),
                "d2",
                F.col("rank").cast("long").alias("rank"),
            )
        )

    def _adc_scores(self, codes: DataFrame, q: DataFrame) -> DataFrame:
        """ADC scoring of every (probed-cluster code row × query) pair:
        (q_id, v_id, adc_d2). The distance-table side is tiny
        (nq × nprobe rows of m×k doubles) but the scoring side is the
        probe-volume hot loop — with numpy it runs as an Arrow-batched
        kernel over the codes table (the qtab map rides in the task
        closure; sequential-over-j accumulation and a Spark-side
        F.round keep results identical to the expression fold, which
        remains the no-numpy path). The codes side still never
        shuffles either way."""
        adc = F.aggregate(
            F.zip_with(F.col("codes"), F.col("qtab"), lambda c, row: F.get(row, c)),
            F.lit(0.0),
            lambda a, p: a + p,
        )
        try:
            import numpy as np
            import pandas as pd
        except ImportError:  # pragma: no cover - numpy is baked in
            np = None
        if np is None:
            return (
                codes.join(F.broadcast(q), "cluster")
                .filter(F.col("id") != F.col("q_id"))
                .select("q_id", F.col("id").alias("v_id"), F.round(adc, 6).alias("adc_d2"))
            )
        qrows = q.collect()
        qmap: dict[int, list] = {}
        for r in qrows:
            qmap.setdefault(r["cluster"], []).append(
                (r["q_id"], np.asarray([list(row) for row in r["qtab"]], dtype=np.float64))
            )
        probed = sorted(qmap)
        m = len(self.codebook)
        from pyspark.sql.types import DoubleType, StructField, StructType

        out_schema = StructType(
            [
                StructField("q_id", q.schema["q_id"].dataType),
                StructField("v_id", codes.schema["id"].dataType),
                StructField("_adc", DoubleType()),
            ]
        )

        def op(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                for cl in pdf["cluster"].unique():
                    hits = qmap.get(cl)
                    if not hits:
                        continue
                    mask = pdf["cluster"] == cl
                    ids = pdf["id"][mask].to_numpy()
                    CODES = np.stack(pdf["codes"][mask].to_numpy())
                    for q_id, QT in hits:
                        d2 = np.zeros(len(ids))
                        for j in range(m):
                            d2 += QT[j, CODES[:, j]]
                        keep = ids != q_id
                        if not keep.any():
                            continue
                        yield pd.DataFrame(
                            {"q_id": q_id, "v_id": ids[keep], "_adc": d2[keep]}
                        )

        pruned = codes.filter(F.col("cluster").isin(probed))
        return pruned.select("id", "cluster", "codes").mapInPandas(op, out_schema).select(
            "q_id", "v_id", F.round(F.col("_adc"), 6).alias("adc_d2")
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
        enc_vec = (
            F.zip_with(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.get(cents, F.col("cluster")),
                lambda x, y: x - y,
            )
            if self.residual
            else F.col(vec_col)
        )
        table = pq_encode(
            assigned.select(
                F.col("id").alias(id_col), "cluster", enc_vec.alias(vec_col)
            ),
            self.codebook,
            id_col=id_col,
            vec_col=vec_col,
            keep=("cluster",),
        )
        table.write.mode("append").partitionBy("cluster").parquet(str(self.path / "codes"))
        if self.has_rerank_store:
            assigned.select(
                "id",
                "cluster",
                F.transform(F.col(vec_col), lambda x: x.cast("float")).alias("vec"),
            ).write.mode("append").partitionBy("cluster").parquet(
                str(self.path / "vectors")
            )
