#!/usr/bin/env python
"""ANN scale smoke: build the persisted IVF-PQ VectorIndex over N
synthetic clustered vectors (deterministic hash-generated, no RNG
state), then measure batched top-k query throughput and recall@k
against exact brute-force cosine on the same queries.

This measures the similarity-search path at volume the fixture tables
can't provide (sf0.1 has 2k embeddings); results land in SCALE.md.
Run standalone: `python scripts/scale_smoke_ann.py [n_vecs]`.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from tera_spark.session import get_spark  # noqa: E402

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = 64
N_CENTERS = 64   # planted cluster structure
N_QUERIES = 100
K = 10


def main() -> None:
    spark = get_spark("ann_smoke")

    # deterministic three-level corpus, all derived by hashing
    # (replayable, no RNG state): coarse center (1.0-scale, IVF should
    # route on it) + per-block-of-16 offset (0.3-scale, the "topic")
    # + per-vector micro noise (0.02). A vector's true top-k is its 15
    # blockmates, separated from same-center non-mates by ~15× margin
    # — the planted-neighbor regime ANN benchmarks measure recall in.
    def coord(seed_a, seed_b, scale):
        # uniform in [-scale, scale) from a 64-bit hash
        return (
            (F.pmod(F.xxhash64(seed_a, seed_b), F.lit(20001)) - F.lit(10000.0))
            / F.lit(10000.0)
            * F.lit(scale)
        )

    base = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        (F.col("id") / 16).cast("long").alias("block"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            coord(F.pmod(F.col("block"), F.lit(N_CENTERS)), j, 1.0)
            + coord(F.col("block"), j + DIM, 0.3)
            + coord(F.col("vec_id"), j + 2 * DIM, 0.02)
        ).cast("float"),
    )
    vectors = base.select("vec_id", vec.alias("embedding")).repartition(32).cache()
    n = vectors.count()  # materialize corpus outside the timed section

    queries = vectors.filter(F.pmod(F.col("vec_id"), F.lit(N_VECS // N_QUERIES)) == 7).limit(
        N_QUERIES
    ).cache()
    nq = queries.count()

    from tera_spark.operators.similarity import cosine_topk
    from tera_spark.operators.vector_index import VectorIndex

    with tempfile.TemporaryDirectory(prefix="ann_smoke_") as tmp:
        t0 = time.perf_counter()
        idx = VectorIndex.build(
            vectors, f"{tmp}/idx", k_coarse=N_CENTERS, m=16, k_codes=32, iters=3
        )
        build_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        approx = idx.topk(queries, k=K, nprobe=4).cache()
        n_approx = approx.count()
        query_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        exact = cosine_topk(vectors, queries, k=K).cache()
        n_exact = exact.count()
        brute_s = time.perf_counter() - t0

        # metadata-filtered search: allow-list semi-joined at the codes
        # scan; measure the two cardinality regimes (broadcast-sized 1%
        # vs shuffle-sized 50%) and check the predicate holds on every
        # answer
        filtered = {}
        for label, mod in (("50pct", 2), ("1pct", 100)):
            allow = vectors.select("vec_id").filter(
                F.pmod(F.col("vec_id"), F.lit(mod)) == 0
            )
            t0 = time.perf_counter()
            fres = idx.topk(queries, k=K, nprobe=4, allowed=allow).cache()
            n_f = fres.count()
            f_s = time.perf_counter() - t0
            bad = fres.filter(F.pmod(F.col("v_id"), F.lit(mod)) != 0).count()
            assert bad == 0, f"filtered search leaked {bad} disallowed ids"
            filtered[label] = {"rows": n_f, "s": round(f_s, 2)}
            fres.unpersist()

        hits = approx.select("q_id", "v_id").join(
            exact.select("q_id", "v_id"), ["q_id", "v_id"], "inner"
        ).count()
        recall = hits / max(n_exact, 1)

    print(
        json.dumps(
            {
                "n_vecs": n,
                "dim": DIM,
                "n_queries": nq,
                "k": K,
                "build_s": round(build_s, 1),
                "build_vecs_per_s": round(n / build_s),
                "ivfpq_query_s": round(query_s, 2),
                "ivfpq_queries_per_s": round(nq / query_s, 1),
                "brute_force_s": round(brute_s, 2),
                "speedup_vs_brute": round(brute_s / query_s, 1),
                "recall_at_k": round(recall, 3),
                "approx_rows": n_approx,
                "filtered": filtered,
            }
        )
    )


if __name__ == "__main__":
    main()
