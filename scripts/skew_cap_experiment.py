"""Degenerate-corpus experiment for the LSH bucket cap (VERDICT r9 item 7).

A boilerplate bucket with m members emits ~m^2/2 candidate pairs from its
first shared band: one hot template in a 100 TB corpus would dominate the
whole candidate join (guide §2.5 — skew a single enormous key, which AQE
skew-join can split but never shrink). `max_bucket_size` drops buckets
above the cap BEFORE the self-join, trading those boilerplate pairs (their
members collide on template text, not near-duplication) for a bounded join.

This script measures the blowup and the cap's effect on a synthetic corpus:
  - N_UNIQUE documents of unique random text (near-dup pairs seeded among
    them so recall is observable), plus
  - N_BOILER documents sharing one identical template (one degenerate
    bucket per band).

Run: python scripts/skew_cap_experiment.py [N_UNIQUE] [N_BOILER]
Prints candidate-pair counts, seeded-pair recall, and wall seconds for
max_bucket_size in (None, 4096, 512). Results feed SCALE.md and the
default pinned in tera_spark/operators/dedup.py.
"""

from __future__ import annotations

import random
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tera_spark.operators.dedup import minhash_lsh_pairs
from tera_spark.session import get_spark


def make_corpus(spark, n_unique: int, n_boiler: int):
    rng = random.Random(42)
    words = [f"w{i:04d}" for i in range(5000)]
    rows = []
    # unique docs; every 10th is a near-dup of its predecessor (one word
    # changed out of 40 → Jaccard well above 0.5)
    prev = None
    seeded = []
    for i in range(n_unique):
        if prev is not None and i % 10 == 9:
            toks = list(prev)
            toks[rng.randrange(len(toks))] = rng.choice(words)
            seeded.append((i - 1, i))
        else:
            toks = [rng.choice(words) for _ in range(40)]
        rows.append((i, " ".join(toks)))
        prev = toks
    template = " ".join(rng.choice(words) for _ in range(40))
    for j in range(n_boiler):
        rows.append((n_unique + j, template))
    return (
        spark.createDataFrame(rows, "doc_id long, text string").repartition(32),
        seeded,
    )


def main() -> None:
    n_unique = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_boiler = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("skew_cap_experiment")
    docs, seeded = make_corpus(spark, n_unique, n_boiler)
    docs.persist().count()  # corpus built once; A/B times the dedup only
    print(f"corpus: {n_unique} unique (+{len(seeded)} seeded near-dup pairs), "
          f"{n_boiler} boilerplate copies of one template")

    for cap in (None, 4096, 512):
        spark.sparkContext.setJobDescription(f"lsh pairs cap={cap}")
        t0 = time.time()
        pairs = minhash_lsh_pairs(docs, max_bucket_size=cap)
        n_pairs = pairs.count()
        t_pairs = time.time() - t0
        got = {
            (r.id_a, r.id_b)
            for r in pairs.join(
                spark.createDataFrame(seeded, "id_a long, id_b long"),
                ["id_a", "id_b"],
                "left_semi",
            ).collect()
        }
        recall = len(got) / max(1, len(seeded))
        print(
            f"cap={cap!s:>5}: candidate_pairs={n_pairs:>12,} "
            f"wall={t_pairs:6.1f}s seeded_recall={recall:.3f}"
        )
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
