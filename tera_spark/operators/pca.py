"""Distributed PCA top component by power iteration — embedding-
pipeline diagnostics (dominant direction + explained variance, the
anisotropy axis that ann_embedding_health only measures the magnitude
of).

Engine-reproducible numerics, so a DuckDB oracle replays the WHOLE
computation bit-for-bit:

- second moments are EXACT integer sums of per-element quantized
  values (q = floor(x·1e6); S_i = Σq_i, S_ij = Σ q_i·q_j summed as
  decimal — associative, partitioning-proof);
- the covariance doubles derive from those integers by a pinned
  operation sequence;
- power iteration runs a PINNED left-fold order (ascending index,
  zero init) for every mat-vec and norm, and re-quantizes the vector
  to 1e-6 after each normalize, so no float drift can accumulate
  across iterations. The driver loop is O(dim²·iters) on 64×64 —
  bounded like the k-means centroid fold.

Scale shape: the corpus is touched ONCE by the moment explode
(dim·(dim+1)/2 products per row, collapsed map-side to 2 080 groups);
everything after runs on the driver in microseconds. At 100 TB this
is the textbook one-pass covariance sketch.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000.0
PROD_SCALE = 1_000_000_000_000.0  # (1e6)² — the q_i·q_j scale


def second_moments(
    emb: DataFrame, *, vec_col: str = "embedding", dim: int = 64
) -> tuple[int, list[int], dict[tuple[int, int], int]]:
    """One distributed pass: n, S_i = Σ floor(x_i·1e6), and the upper
    triangle S_ij = Σ q_i·q_j as exact integers (decimal-summed, so no
    overflow at any corpus size)."""
    rows = _moment_rows(emb, vec_col, dim).collect()
    return _split_moments(rows, dim)


def _moment_rows(emb: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """ONE explode carries all three moment kinds per input row —
    (i, j, q_i·q_j) pair products, (i, -1, q_i) first moments, and a
    (-1, -1, 1) count sentinel — so the corpus is genuinely scanned
    once (the SCALE.md one-pass covariance claim, made literal)."""
    q_arr = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(MICRO)).cast("long")
    )
    staged = emb.select(q_arr.alias("q"))
    pair_entries = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(dim - 1)),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (F.get("q", i) * F.get("q", j)).alias("p"),
                ),
            ),
        )
    )
    s1_entries = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.struct(
            i.cast("int").alias("i"),
            F.lit(-1).cast("int").alias("j"),
            F.get("q", i).alias("p"),
        ),
    )
    n_entry = F.array(
        F.struct(
            F.lit(-1).cast("int").alias("i"),
            F.lit(-1).cast("int").alias("j"),
            F.lit(1).cast("long").alias("p"),
        )
    )
    all_entries = F.concat(pair_entries, s1_entries, n_entry)
    return (
        staged.select(F.explode(all_entries).alias("x"))
        .groupBy("x.i", "x.j")
        .agg(F.sum(F.col("x.p").cast("decimal(38,0)")).alias("s"))
    )


def _split_moments(rows, dim: int) -> tuple[int, list[int], dict[tuple[int, int], int]]:
    n = 0
    s1 = [0] * dim
    s2: dict[tuple[int, int], int] = {}
    for r in rows:
        if r.i == -1:
            n = int(r.s)
        elif r.j == -1:
            s1[r.i] = int(r.s)
        else:
            s2[(r.i, r.j)] = int(r.s)
    return n, s1, s2


def covariance_from_moments(
    n: int, s1: list[int], s2: dict[tuple[int, int], int], dim: int = 64
) -> list[list[float]]:
    """C_ij = ((S_ij - (S_i·S_j)/n) / n) / 1e12 with a pinned op
    sequence (the SQL oracle renders the identical parenthesisation)."""
    nd = float(n)
    cov = [[0.0] * dim for _ in range(dim)]
    for i in range(dim):
        for j in range(i, dim):
            c = ((float(s2[(i, j)]) - (float(s1[i]) * float(s1[j])) / nd) / nd) / PROD_SCALE
            cov[i][j] = c
            cov[j][i] = c
    return cov


def _matvec(cov: list[list[float]], v: list[float]) -> list[float]:
    """Ascending-index zero-init left fold — matches list_reduce."""
    out = []
    for row in cov:
        acc = 0.0
        for cij, vj in zip(row, v):
            acc = acc + cij * vj
        out.append(acc)
    return out


def power_iteration(
    cov: list[list[float]], *, iters: int = 8
) -> tuple[list[float], float]:
    """iters pinned power steps from the uniform unit vector (0.125 on
    every coordinate at dim=64 — exactly representable); the vector is
    floor-quantized to 1e-6 after each normalize. Returns (loadings,
    Rayleigh eigenvalue, both 1e-6-quantized)."""
    dim = len(cov)
    v = [0.125] * dim
    for _ in range(iters):
        u = _matvec(cov, v)
        norm2 = 0.0
        for x in u:
            norm2 = norm2 + x * x
        nrm = math.sqrt(norm2)
        if nrm == 0.0:
            # all-zero covariance (e.g. a constant embedding cloud):
            # every direction is an eigenvector with eigenvalue 0 —
            # return the start vector instead of dividing by zero.
            return v, 0.0
        v = [math.floor((x / nrm) * MICRO) / MICRO for x in u]
    w = _matvec(cov, v)
    lam = 0.0
    for vi, wi in zip(v, w):
        lam = lam + vi * wi
    return v, math.floor(lam * MICRO) / MICRO


class MomentTable:
    """Persisted, MERGEABLE second-moment state (the sketch-table
    stance for PCA): ``build`` writes the exact-integer sums as
    parquet, ``extend`` appends a slice's partial sums, and
    ``top_component`` re-aggregates on read — so the covariance of a
    growing corpus is maintained incrementally without ever rescanning
    old data. Counts are exact integers, so extend ≡ rebuild
    bit-for-bit (the same guarantee the NgramLM count tables give)."""

    def __init__(self, spark, path: str, dim: int = 64):
        from pathlib import Path

        self.spark = spark
        self.path = Path(path)
        self.dim = dim

    @classmethod
    def build(
        cls, emb: DataFrame, path: str, *, vec_col: str = "embedding", dim: int = 64
    ) -> "MomentTable":
        import shutil

        t = cls(emb.sparkSession, path, dim)
        shutil.rmtree(t.path / "slices", ignore_errors=True)
        t._write_slice(emb, vec_col)
        return t

    def extend(self, emb: DataFrame, *, vec_col: str = "embedding") -> None:
        """Atomic per slice: staged write + directory rename, so a
        crash mid-extend never publishes a partial moment relation
        (same discipline as NgramLM slices / catalog._staged_append)."""
        self._write_slice(emb, vec_col)

    def _write_slice(self, emb: DataFrame, vec_col: str) -> None:
        import uuid

        tag = uuid.uuid4().hex[:12]
        stage = self.path / f".stage-{tag}"
        _moment_rows(emb, vec_col, self.dim).write.parquet(str(stage / "moments"))
        slices = self.path / "slices"
        slices.mkdir(parents=True, exist_ok=True)
        stage.rename(slices / f"slice-{tag}")

    def moments(self) -> tuple[int, list[int], dict[tuple[int, int], int]]:
        rows = (
            self.spark.read.parquet(str(self.path / "slices" / "*" / "moments"))
            .groupBy("i", "j")
            .agg(F.sum("s").alias("s"))
            .collect()
        )
        return _split_moments(rows, self.dim)

    def top_component(self, *, iters: int = 8) -> tuple[list[float], float]:
        n, s1, s2 = self.moments()
        return power_iteration(covariance_from_moments(n, s1, s2, self.dim), iters=iters)


def pca_top_component(
    emb: DataFrame, *, vec_col: str = "embedding", dim: int = 64, iters: int = 8
) -> DataFrame:
    """(component, loading, eigval) — 64 rows: the dominant principal
    direction of the embedding cloud and its explained variance."""
    spark = emb.sparkSession
    n, s1, s2 = second_moments(emb, vec_col=vec_col, dim=dim)
    cov = covariance_from_moments(n, s1, s2, dim=dim)
    v, lam = power_iteration(cov, iters=iters)
    return spark.createDataFrame(
        [(i, v[i], lam) for i in range(dim)],
        "component int, loading double, eigval double",
    )
