"""Iterative graph algorithms as DataFrame loops.

The engine's second iterative operator family (after
`dedup.components_min_label`, the connected-components min-label
propagation): PageRank as a driver-side loop over a lazy plan. Spark
has no native fixed-point operator — the idiomatic pattern is to
build iteration k's plan from iteration k-1's DataFrame, with the
loop-invariant relation (the edge list) persisted and pre-partitioned
ONCE on the join key so every iteration's big join reuses the same
partitioning and only the small rank relation moves.

Scale shape per iteration: join(edges ⋈ ranks on src) → groupBy(dst)
sum — two shuffles of |ranks| ≤ |nodes| rows (the edges stay put);
at 100 TB-scale graphs this is exactly GraphX/Pregel's
partition-invariant messaging pattern expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank on a (src, dst) edge DataFrame.

    r_0(v) = 1/N;  r_{k+1}(v) = (1-d)/N + d · Σ_{(u,v)∈E} r_k(u)/deg(u)

    Nodes with no in-edges keep the teleport term; dangling-node mass
    (out-degree 0) is dropped, matching the classic formulation. The
    edge list (with out-degrees attached) is persisted and partitioned
    by `src` once; each iteration shuffles only the rank vector.
    Checkpoint-free: `iterations` is small and fixed, so the lineage
    stays shallow (for 100s of iterations, localCheckpoint per ~20
    rounds bounds plan growth — same pattern as
    dedup.components_min_label).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # also materializes the persist
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    # loop-invariant: edges with out-degree attached, partitioned on the
    # per-iteration join key so the big side never re-shuffles
    ed = e.join(deg, "src").repartition("src").persist()
    ed.count()

    teleport = F.lit((1.0 - damping) / n_nodes)
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(ed["dst"], (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (teleport + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
    return ranks
