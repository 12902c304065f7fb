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

__all__ = ["pagerank", "triangle_counts", "bfs_distances"]


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
    node set and the edge list (with out-degrees attached,
    repartitioned ONCE on the per-iteration join key) are
    `materialize`d so every iteration is two shuffles of the rank
    vector over materialized relations — the lineage does not grow
    with the iteration count and nothing upstream re-executes per
    round (operators/iterate.py). 1/N enters the plan as a broadcast
    1-row aggregate, not a driver-side count, so beyond the two
    materialization jobs the builder performs no driver-side actions.
    """
    from .iterate import iterate, materialize

    # e is executed by TWO separate build-time jobs (nodes, ed) —
    # ReuseExchange does not span jobs, so checkpoint the deduped
    # edges first and let both downstream materializations read blocks
    e = materialize(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    nodes = materialize(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    # loop-invariant: edges with out-degree attached, partitioned on the
    # per-iteration join key so the big side never re-shuffles
    ed = materialize(e.join(deg, "src").repartition("src"))

    ncnt = nodes.agg(F.count("*").cast("double").alias("_n"))
    ranks = nodes.crossJoin(F.broadcast(ncnt)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )

    def step(r, _i=0):
        contribs = (
            ed.join(r, ed["src"] == r["node"])
            .select(ed["dst"], (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        return (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(ncnt))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("_n")
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )

    return iterate(ranks, step, iterations, checkpoint_every=5)


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, n_triangles): per-vertex triangle participation.

    The "compact-forward" relational form: canonicalize to simple
    undirected edges (a < b, self-loops dropped, parallel edges
    deduped), orient every edge low→high, then two joins —
    (a,b)⋈(b,c) builds the open wedges, (a,c)∈E closes them. Each
    triangle a<b<c is found exactly once, then credited to all three
    vertices with one explode.

    Scale shape: wedge volume is Σ_v deg_out(v)² — the low→high
    orientation caps out-degree for the hub vertices that dominate
    skewed graphs (a hub's edges mostly point INTO it from lower
    ids; the production refinement orders by (degree, id) and is a
    drop-in on the same plan). Both joins shuffle on a single key
    column; the closing probe can broadcast when the edge list fits.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    w = e.alias("e1").join(
        e.alias("e2"), F.col("e1.b") == F.col("e2.a")
    ).select(
        F.col("e1.a").alias("wa"), F.col("e1.b").alias("wb"), F.col("e2.b").alias("wc")
    )
    tri = w.join(
        e.alias("e3"),
        (F.col("wa") == F.col("e3.a")) & (F.col("wc") == F.col("e3.b")),
    ).select("wa", "wb", "wc")
    return (
        tri.select(F.explode(F.array("wa", "wb", "wc")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )


def bfs_distances(
    edges: DataFrame,
    source,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Unweighted shortest-path distances from `source` by synchronous
    Bellman-Ford relaxation: max_hops rounds of

        dist_{k+1}(v) = min(dist_k(v), 1 + min_{(u,v)∈E} dist_k(u))

    over the undirected closure of `edges`. Returns (node, dist) for
    nodes reachable within max_hops.

    Scale shape: the frontier relation is |reached nodes| rows; each
    round is one join of the (materialized, loop-invariant) edge list
    against it on the src key plus a min-groupBy on dst — the Pregel
    messaging pattern expressed relationally, same as pagerank()
    above. Rounds are fixed (hop-bounded BFS), so the oracle replays
    the identical trajectory as unrolled CTEs; lineage is truncated
    per round by the iterate() harness.
    """
    from .iterate import iterate, materialize

    und = materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # cast the source to the EDGE id type — a hardcoded bigint would
    # silently null out string/other id graphs and return an empty
    # reachability set
    node_type = und.schema["a"].dataType
    if isinstance(source, DataFrame):
        # lazy frontier (e.g. an agg picking the min node) — keeps the
        # builder collect-free at plan-build time
        state0 = source.select(
            F.col(source.columns[0]).cast(node_type).alias("node"),
            F.lit(0).cast("int").alias("dist"),
        )
    else:
        state0 = und.sparkSession.range(1).select(
            F.lit(source).cast(node_type).alias("node"),
            F.lit(0).cast("int").alias("dist"),
        )

    def step(state: DataFrame, _i: int) -> DataFrame:
        relaxed = (
            state.join(und, state["node"] == und["a"])
            .select(F.col("b").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        return (
            state.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("int").alias("dist"))
        )

    return iterate(state0, step, max_hops)
