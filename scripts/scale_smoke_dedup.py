#!/usr/bin/env python
"""Dedup-pipeline scale smoke: drive N synthetic documents (deterministic
generator, planted near-duplicates) through the full MinHash → LSH-band →
bucket-join → Jaccard-verify pipeline and report throughput.

This measures the engine's LLM-dedup path at volume the fixture tables
can't provide (sf0.1 has 5k docs); results land in SCALE.md. Run
standalone: `python scripts/scale_smoke_dedup.py [n_docs]`.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from tera_spark.session import get_spark  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
WORDS = 80  # tokens per doc


def main() -> None:
    spark = get_spark("dedup_smoke")
    # deterministic corpus: ~10% of docs are near-duplicates of a base
    # doc (same token stream, one token changed); tokens drawn from a
    # 1000-word vocabulary by hashing (no RNG state, fully replayable)
    base = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 10 == 9).alias("is_dup"),
        # dup docs reuse their predecessor's content seed
        F.when(F.col("id") % 10 == 9, F.col("id") - 1).otherwise(F.col("id")).alias("seed"),
    )
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS - 1)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("seed"), i), F.lit(1000)).cast("string")
        ),
    )
    # near-dup: replace the first token so exact-dedup can't catch it
    docs = base.select(
        "doc_id",
        F.when(
            F.col("is_dup"),
            F.concat_ws(" ", F.concat(F.array(F.lit("changed")), F.slice(tok, 2, WORDS - 1))),
        )
        .otherwise(F.concat_ws(" ", tok))
        .alias("text"),
    )
    docs = docs.repartition(32).cache()
    n = docs.count()  # materialize corpus outside the timed section

    from tera_spark.operators.dedup import verified_near_duplicates

    t0 = time.monotonic()
    pairs = verified_near_duplicates(docs, threshold=0.7)
    n_pairs = pairs.count()
    dt = time.monotonic() - t0

    planted = N_DOCS // 10
    print(
        json.dumps(
            {
                "metric": "dedup_smoke",
                "n_docs": n,
                "planted_near_dups": planted,
                "verified_pairs": n_pairs,
                "recall_lower_bound": round(min(n_pairs / planted, 1.0), 4),
                "wall_s": round(dt, 1),
                "docs_per_s": round(n / dt),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
