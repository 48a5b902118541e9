"""Graph analytics over pair tables (LSH duplicate graphs, link
graphs). The reference has no graph layer — like connected_components
(operators/dedup.py), these are the steps a training pipeline runs on
top of pair generation: centrality to pick cluster representatives,
rank hub/boilerplate documents, weight crawl frontiers.

Determinism stance: ranks are INTEGER micro-units with floor division
throughout, so every engine computes bit-identical results — no
floating-point summation-order drift, which matters because power
iteration amplifies tiny divergences across rounds. (The DuckDB oracle
unrolls the same integer recurrence.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT = 1_000_000_000_000  # rank fixed-point: 1.0 == 10^12 units


def pagerank(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    iterations: int = 5,
    damping_pct: int = 85,
    symmetric: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a pair table. Returns
    ``(id, rank_units)`` with ranks in 1e-12 fixed-point units.

    The node set is the ids appearing in edges; with ``symmetric=True``
    (duplicate graphs are undirected) every node has out-degree ≥ 1, so
    there is no dangling mass and the recurrence is simply

        r'[v] = (100-d)% * UNIT / N  +  d% * Σ_{u→v} r[u] / deg[u]

    with every division a floor division on integers.

    Plan shape per round: one equi-join (rank onto edge source) + one
    hash aggregation keyed by destination — the same two-shuffle round
    as connected_components, with ``localCheckpoint`` per round keeping
    the plan flat. N and degrees compute once. Fixed iteration count
    (PageRank needs ~log(N) rounds for ranking stability; 5 is plenty
    for shallow dedup graphs).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if symmetric:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.distinct()
    deg = e.groupBy("u").agg(F.count("*").alias("deg"))
    n = deg.count()
    if n == 0:
        return edges.sparkSession.createDataFrame([], "id long, rank_units long")
    base = (100 - damping_pct) * UNIT // 100 // n

    rank = deg.select("u", F.lit(UNIT // n).cast("long").alias("r")).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        contrib = (
            e.join(rank.join(deg, "u"), "u")
            .select(F.col("v"), F.expr("r div deg").alias("c"))
        )
        rank = (
            contrib.groupBy("v")
            .agg(F.sum("c").alias("in_sum"))
            .select(
                F.col("v").alias("u"),
                (F.lit(base) + F.expr(f"({damping_pct} * in_sum) div 100")).cast(
                    "long"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return rank.select(F.col("u").alias("id"), F.col("r").alias("rank_units"))


def triangle_counts(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Per-node triangle participation over an undirected pair table —
    the local clustering signal: near-dup clusters are triangle-dense,
    chains of coincidental LSH collisions are not, so triangle counts
    separate "real" duplicate clusters from bucket noise before the
    expensive verify pass.

    Canonical enumeration: each triangle {a<b<c} found exactly once by
    joining ordered edges (a,b)+(b,c) and closing with (a,c). Two
    equi-joins + one aggregation — no explosion beyond the wedge count;
    at scale the ordered-edge convention halves the join inputs, and
    skewed hub nodes are exactly the AQE skew-join case.
    """
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    ).filter(F.col("u") != F.col("v")).distinct()
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])  # one row per triangle a<b<c
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return per_node
