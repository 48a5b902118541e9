#!/usr/bin/env python
"""Filtered-ANN recall vs selectivity at volume (round-7 task): the
known failure mode of pre-filtered IVF is a SELECTIVE allow-list —
cell ranking stops predicting where the nearest ALLOWED vectors live,
so a fixed nprobe under-recalls. This smoke measures recall@10 on the
planted-neighbor corpus (same generator as scale_smoke_ann.py) across
selectivities {50%, 10%, 1%, 0.1%} in three configurations:

* fixed  — nprobe pinned at 4, adaptation disabled (the r6 behavior);
* adaptive — the r7 rule: brute fallback below brute_limit, else
  nprobe scaled inversely with selectivity;
* the chosen path is reported per point (brute vs widened-IVF).

Ground truth per selectivity is exact cosine top-k over the FILTERED
corpus. Results land in SCALE.md. Run:
`python scripts/scale_smoke_filtered_ann.py [n_vecs]`.

`python scripts/scale_smoke_filtered_ann.py [n_vecs] codebook` runs
the round-9 codebook-resolution study instead: the r8 rerank-floor fix
lifted 1M/50% recall@10 to 0.964 and diagnosed the residual ~0.03 as
ADC codebook resolution — this mode rebuilds the index with a larger
codebook (double sub-quantizers m=16->32, then more codes per
sub-quantizer k=32->256) and measures the 50%-selectivity point with
the SHIPPED adaptive rerank, recording recall/build-cost/search-cost
per config so the ceiling either closes or gets pinned as a measured
cost-benefit decision.
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
MODE = sys.argv[2] if len(sys.argv) > 2 else "selectivity"
DIM = 64
N_CENTERS = 64
N_QUERIES = 50
K = 10
SELECTIVITIES = ((2, "50pct"), (10, "10pct"), (100, "1pct"), (1000, "0.1pct"))

# codebook-resolution study (round 9): baseline = the shipped config;
# m32 halves the sub-vector width each quantizer must resolve; k256
# gives each quantizer 8 bits instead of 5. Same coarse layer.
CODEBOOKS = (
    ("m16_k32_shipped", {"m": 16, "k_codes": 32}),
    ("m32_k32_double_subq", {"m": 32, "k_codes": 32}),
    ("m16_k256_more_bits", {"m": 16, "k_codes": 256}),
)


def main() -> None:
    spark = get_spark("filtered_ann_smoke")

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
    n = vectors.count()
    queries = (
        vectors.filter(F.pmod(F.col("vec_id"), F.lit(N_VECS // N_QUERIES)) == 7)
        .limit(N_QUERIES)
        .cache()
    )
    nq = queries.count()

    from tera_spark.operators.similarity import cosine_topk
    from tera_spark.operators.vector_index import VectorIndex

    if MODE == "codebook":
        out = {"n_vecs": n, "n_queries": nq, "k": K, "mode": "codebook", "configs": {}}
        allow = vectors.select("vec_id").filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
        n_allowed = allow.count()
        out["n_allowed"] = n_allowed
        exact = (
            cosine_topk(vectors.join(allow, "vec_id", "left_semi"), queries, k=K)
            .select("q_id", "v_id")
            .cache()
        )
        n_exact = exact.count()
        with tempfile.TemporaryDirectory(prefix="fann_codebook_") as tmp:
            for label, cfg in CODEBOOKS:
                t0 = time.perf_counter()
                idx = VectorIndex.build(
                    vectors, f"{tmp}/{label}", k_coarse=N_CENTERS, iters=3, **cfg
                )
                build_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                got = (
                    idx.topk(queries, k=K, nprobe=4, rerank=100, allowed=allow)
                    .select("q_id", "v_id")
                    .cache()
                )
                got.count()
                search_s = time.perf_counter() - t0
                hits = got.join(exact, ["q_id", "v_id"], "inner").count()
                got.unpersist()
                out["configs"][label] = {
                    **cfg,
                    "recall_at_10": round(hits / max(n_exact, 1), 3),
                    "build_s": round(build_s, 1),
                    "search_s": round(search_s, 2),
                    "path": f"ivf:C_eff={idx._effective_rerank(100, n_allowed)}",
                }
                print(json.dumps({label: out["configs"][label]}), flush=True)
        print(json.dumps(out))
        return

    out = {"n_vecs": n, "n_queries": nq, "k": K, "points": {}}
    with tempfile.TemporaryDirectory(prefix="fann_smoke_") as tmp:
        t0 = time.perf_counter()
        idx = VectorIndex.build(
            vectors, f"{tmp}/idx", k_coarse=N_CENTERS, m=16, k_codes=32, iters=3
        )
        out["build_s"] = round(time.perf_counter() - t0, 1)

        for mod, label in SELECTIVITIES:
            allow = vectors.select("vec_id").filter(
                F.pmod(F.col("vec_id"), F.lit(mod)) == 0
            )
            n_allowed = allow.count()
            exact = (
                cosine_topk(
                    vectors.join(allow, "vec_id", "left_semi"), queries, k=K
                )
                .select("q_id", "v_id")
                .cache()
            )
            n_exact = exact.count()

            point = {"n_allowed": n_allowed}
            for cfg in ("fixed", "adaptive"):
                if cfg == "fixed":
                    # disable both adaptations to reproduce r6 behavior
                    orig = VectorIndex._effective_nprobe
                    VectorIndex._effective_nprobe = lambda self, np_, na: np_
                    kw = {"brute_limit": 0}
                else:
                    kw = {}
                t0 = time.perf_counter()
                got = (
                    idx.topk(queries, k=K, nprobe=4, rerank=100, allowed=allow, **kw)
                    .select("q_id", "v_id")
                    .cache()
                )
                got.count()
                secs = time.perf_counter() - t0
                hits = got.join(exact, ["q_id", "v_id"], "inner").count()
                if cfg == "fixed":
                    VectorIndex._effective_nprobe = orig
                path = (
                    "brute"
                    if cfg == "adaptive" and n_allowed <= 10_000
                    else f"ivf:nprobe={idx._effective_nprobe(4, n_allowed) if cfg == 'adaptive' else 4}"
                )
                point[cfg] = {
                    "recall_at_10": round(hits / max(n_exact, 1), 3),
                    "s": round(secs, 2),
                    "path": path,
                }
                got.unpersist()
            if label == "50pct":
                # round-8 adjudication: mid-selectivity (>=50%) is the
                # one regime where the r7 adaptive rule engages weakly
                # (C_eff only 2x) and recall read 0.91 — measure wider
                # exact-rerank sets (the knob SCALE.md proved ~free) to
                # decide whether widening ships as the default
                for c_base in (200, 400):
                    t0 = time.perf_counter()
                    got = (
                        idx.topk(
                            queries, k=K, nprobe=4, rerank=c_base, allowed=allow
                        )
                        .select("q_id", "v_id")
                        .cache()
                    )
                    got.count()
                    secs = time.perf_counter() - t0
                    hits = got.join(exact, ["q_id", "v_id"], "inner").count()
                    point[f"adaptive_rerank{c_base}"] = {
                        "recall_at_10": round(hits / max(n_exact, 1), 3),
                        "s": round(secs, 2),
                        "path": f"ivf:C_eff={idx._effective_rerank(c_base, n_allowed)}",
                    }
                    got.unpersist()
            exact.unpersist()
            out["points"][label] = point

    print(json.dumps(out))


if __name__ == "__main__":
    main()
