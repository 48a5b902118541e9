#!/usr/bin/env python
"""Round-5 curation-operator scale smoke: n-gram LM build+score,
count-min heavy hitters on a skewed stream, theta-sketch set algebra,
and classifier GD training — at volumes the fixtures can't provide.
All inputs are deterministic hash-generated (no RNG state). Results
land in SCALE.md. Run: python scripts/scale_smoke_curation.py [scale]
(scale=1 → 500k docs / 20M events).
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

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
N_DOCS = int(500_000 * SCALE)
N_EVENTS = int(20_000_000 * SCALE)
WORDS = 60


def synth_docs(spark):
    """Deterministic corpus: WORDS tokens per doc from a Zipf-ish
    1000-word vocab (quadratic hash concentration → realistic n-gram
    reuse)."""
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(
                F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(1000))
                * F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(1000)),
                F.lit(997),
            ).cast("string"),
        ),
    )
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", tok).alias("text")
    )


def main() -> None:
    spark = get_spark("curation_smoke")
    out = {}

    # --- n-gram LM: build on half, score everything -------------------
    from tera_spark.operators.lm import NgramLM

    docs = synth_docs(spark)
    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        lm = NgramLM.build(docs.filter("doc_id % 2 = 0"), td + "/lm")
        t_build = time.time() - t0
        t0 = time.time()
        scored = lm.score(docs)
        n = scored.count()
        mean_nll = scored.agg(F.avg("avg_nll_micro")).collect()[0][0]
        t_score = time.time() - t0
    out["ngram_lm"] = {
        "docs": N_DOCS,
        "build_s": round(t_build, 1),
        "score_s": round(t_score, 1),
        "score_docs_per_s": int(n / t_score),
        "mean_nll_micro": int(mean_nll),
    }
    print(json.dumps({"ngram_lm": out["ngram_lm"]}))

    # --- count-min heavy hitters on a cubic-skew stream ----------------
    from tera_spark.operators.sketches import cms_heavy_hitters

    h = F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double") / 1_000_000.0
    ev = spark.range(N_EVENTS).select(
        F.floor(F.pow(h, 3.0) * 1000).cast("long").alias("user_id")
    )
    t0 = time.time()
    top = cms_heavy_hitters(ev, key_col="user_id", d=4, w=256, top_k=20).collect()
    t_cms = time.time() - t0
    worst = max((r.cms_count - r.exact_count) / r.exact_count for r in top)
    out["cms"] = {
        "events": N_EVENTS,
        "wall_s": round(t_cms, 1),
        "events_per_s": int(N_EVENTS / t_cms),
        "top1_exact": top[0].exact_count,
        "worst_rel_overcount": round(worst, 4),
    }
    print(json.dumps({"cms": out["cms"]}))

    # --- theta sketches: 30 daily user sets, consecutive-pair algebra --
    from tera_spark.operators.sketches import theta_set_ops, theta_sketch

    evg = spark.range(N_EVENTS).select(
        F.pmod(F.xxhash64("id"), F.lit(30)).cast("int").alias("g"),
        F.pmod(F.xxhash64(F.col("id") * 7), F.lit(2_000_000)).alias("user_id"),
    )
    t0 = time.time()
    sk, th = theta_sketch(evg, key_col="user_id", group_col="g", k=256)
    days = [r.g for r in evg.select("g").distinct().collect()]
    pairs = spark.createDataFrame(
        [(a, a + 1) for a in sorted(days)[:-1]], "ga int, gb int"
    )
    est = theta_set_ops(sk, th, pairs).collect()
    t_theta = time.time() - t0
    out["theta"] = {
        "events": N_EVENTS,
        "groups": len(days),
        "wall_s": round(t_theta, 1),
        "pairs": len(est),
        "sample_union_est": est[0].est_union,
    }
    print(json.dumps({"theta": out["theta"]}))

    # --- classifier: 4 GD passes over 2M feature rows -------------------
    from tera_spark.operators.classifier import train_surface_classifier

    nf = int(2_000_000 * SCALE)
    hh = F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double") / 1000.0
    feats = spark.range(nf).select(
        (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(10)) < 4).cast("double").alias("y"),
        (hh * 2.0).alias("x1"),
        (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(1000)).cast("double") / 1000.0).alias("x2"),
        (hh / 2.0).alias("x3"),
    )
    t0 = time.time()
    w = train_surface_classifier(feats, steps=4, lr=1.0)
    t_clf = time.time() - t0
    out["classifier"] = {
        "rows": nf,
        "steps": 4,
        "wall_s": round(t_clf, 1),
        "rows_per_s_per_step": int(nf * 4 / t_clf),
        "weights": w,
    }
    print(json.dumps({"classifier": out["classifier"]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
