"""Distilled surface-feature document classifier trained INSIDE the
engine by deterministic, unrolled full-batch gradient descent.

The canonical curation move (GPT-3 appendix A; fastText quality
filters): fit a tiny linear classifier that predicts an expensive
label (reference-corpus membership, language, human quality rating)
from cheap surface features, then score the whole corpus with it.
Training here is K full-batch gradient steps where each step is ONE
distributed aggregation over the corpus (the gradient of the logistic
loss), and the weight vector — four numbers — lives on the driver
between steps, exactly the bounded-driver-state pattern the k-means
trainer uses (similarity.py).

Engine-reproducible by construction, so a DuckDB oracle can replay
training bit-for-bit:

- the link is the softsign sigmoid ``0.5 + 0.5·z/(1+|z|)`` — only
  +,-,*,/,abs, all correctly-rounded IEEE ops (libm ``exp`` is NOT
  correctly rounded, so the textbook logistic link could drift by an
  ulp across engines);
- weights are integer micro-units; per-document gradient
  contributions are floor-quantized to integer micro-units BEFORE the
  sum, so the reduction is associative integer math no partitioning
  or row order can perturb;
- the update ``w -= floor(lr·g / n)`` rounds back to integers, so
  no error accumulates across steps.

Scale shape: K passes over the feature relation (persist it once),
each a map-side-partial aggregation down to 4 numbers; scoring is a
map-only projection. No shuffle grows with the corpus.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000.0


def _softsign_sigmoid(z: Column) -> Column:
    """0.5 + 0.5*z/(1+|z|): a [0,1] sigmoid from correctly-rounded ops."""
    return F.lit(0.5) + (F.lit(0.5) * z) / (F.lit(1.0) + F.abs(z))


def _margin(weights: Sequence[int], xcols: Sequence[Column]) -> Column:
    """z = w0 + Σ wj·xj with micro-int weights, left-associated sums
    (the SQL oracle renders the identical parenthesisation)."""
    z = F.lit(float(weights[0])) / F.lit(MICRO)
    for wj, x in zip(weights[1:], xcols):
        z = z + (F.lit(float(wj)) / F.lit(MICRO)) * x
    return z


def train_surface_classifier(
    feats: DataFrame,
    *,
    label_col: str = "y",
    feature_cols: Sequence[str] = ("x1", "x2", "x3"),
    steps: int = 4,
    lr: float = 1.0,
    balanced: bool = True,
) -> list[int]:
    """K unrolled full-batch GD steps; returns micro-int weights
    [bias, w1, ..] — O(steps) tiny driver actions by design.

    ``balanced`` reweights each class to half the total mass
    (cw = n/(2·n_class)), the standard fix for a skewed prior pulling
    the 0-threshold toward the majority class; the weights derive from
    exact integer counts so determinism is preserved."""
    cnt = feats.agg(
        F.count(F.lit(1)).alias("n"), F.sum(label_col).cast("double").alias("np")
    ).collect()[0]
    n, npos = float(cnt.n), float(cnt.np or 0.0)
    if n == 0.0:
        raise ValueError("train_surface_classifier: empty training set")
    if balanced and 0.0 < npos < n:
        cw = F.when(
            F.col(label_col) == 1.0, F.lit(n / (2.0 * npos))
        ).otherwise(F.lit(n / (2.0 * (n - npos))))
    else:
        # single-class corpus: class weights are undefined (division by
        # the absent class' count) — fall back to uniform weighting.
        cw = F.lit(1.0)
    w = [0] * (1 + len(feature_cols))
    xcols = [F.col(c) for c in feature_cols]
    for _ in range(steps):
        resid = (_softsign_sigmoid(_margin(w, xcols)) - F.col(label_col)) * cw
        aggs = [F.sum(F.floor(resid * F.lit(MICRO)).cast("long")).alias("g0")]
        aggs += [
            F.sum(F.floor((resid * x) * F.lit(MICRO)).cast("long")).alias(f"g{j}")
            for j, x in enumerate(xcols, start=1)
        ]
        row = feats.agg(*aggs).collect()[0]
        w = [
            wj - math.floor((lr * float(row[f"g{j}"])) / n)
            for j, wj in enumerate(w)
        ]
    return w


def score_surface_classifier(
    feats: DataFrame,
    weights: Sequence[int],
    *,
    feature_cols: Sequence[str] = ("x1", "x2", "x3"),
) -> DataFrame:
    """Map-only scoring: integer micro-nat margin + thresholded class."""
    z = _margin(weights, [F.col(c) for c in feature_cols])
    margin = F.floor(z * F.lit(MICRO)).cast("long")
    return feats.withColumn("margin_micro", margin).withColumn(
        "pred", (F.col("margin_micro") >= 0).cast("int")
    )
