#!/usr/bin/env python
"""Per-stage wall-time breakdown of VectorIndex.build at volume —
the diagnostic companion to scale_smoke_ann.py (which times the build
as one block). Replays the exact build pipeline stage by stage so the
expensive stage is identified before optimizing. Run:
`python scripts/profile_ann_build.py [n_vecs]`.
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
N_CENTERS = 64


def main() -> None:
    spark = get_spark("ann_profile")

    def coord(seed_a, seed_b, scale):
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
    vectors.count()

    from tera_spark.operators.similarity import (
        ivf_assign,
        pq_encode,
        train_kmeans,
        train_pq,
    )
    from tera_spark.operators.vector_index import _l2_normalize

    times: dict[str, float] = {}

    def clock(name):
        class _C:
            def __enter__(self):
                self.t = time.perf_counter()

            def __exit__(self, *a):
                times[name] = round(time.perf_counter() - self.t, 2)
                print(f"# {name}: {times[name]}s", flush=True)

        return _C()

    k_coarse, m, k_codes, iters = N_CENTERS, 16, 32, 3
    with tempfile.TemporaryDirectory(prefix="ann_prof_") as tmp:
        p = Path(tmp)
        with clock("l2_normalize+train_kmeans"):
            nvec = _l2_normalize(vectors, "embedding")
            cents_df = train_kmeans(nvec, k=k_coarse, iters=iters)
            cents_rows = cents_df.collect()
        centroids = [
            list(r["embedding"]) for r in sorted(cents_rows, key=lambda r: r["centroid_id"])
        ]
        cents_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
        with clock("ivf_assign+residual_cache"):
            assigned = ivf_assign(nvec, cents_df)
            residuals = assigned.select(
                F.col("id").alias("vec_id"),
                "cluster",
                F.zip_with(
                    F.transform(F.col("vec"), lambda x: x.cast("double")),
                    F.get(cents_lit, F.col("cluster")),
                    lambda x, y: x - y,
                ).alias("embedding"),
            ).cache()
            residuals.count()
        with clock("train_pq"):
            codebook = train_pq(residuals, m=m, k=k_codes, iters=iters)
        with clock("pq_encode+write_codes"):
            table = pq_encode(residuals, codebook, keep=("cluster",))
            table.write.mode("overwrite").partitionBy("cluster").parquet(
                str(p / "codes")
            )
        with clock("write_refine_vectors"):
            residuals.select(
                F.col("vec_id").alias("id"),
                "cluster",
                F.transform(
                    F.zip_with(
                        F.col("embedding"),
                        F.get(cents_lit, F.col("cluster")),
                        lambda r, c: r + c,
                    ),
                    lambda x: x.cast("float"),
                ).alias("vec"),
            ).write.mode("overwrite").partitionBy("cluster").parquet(str(p / "vectors"))
        residuals.unpersist()

    times["total"] = round(sum(times.values()), 2)
    print(json.dumps({"n_vecs": N_VECS, "stages": times}))


if __name__ == "__main__":
    main()
