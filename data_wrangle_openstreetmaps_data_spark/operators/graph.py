"""Graph operators over the relational tables: the co-purchase
bipartite graph (customer ↔ supplier through orders×lineitem) plus
degree statistics and a fixed-iteration PageRank.

The reference has no graph surface; this is the EXT family that turns
the fact tables into an entity graph the way a training-data pipeline
builds interaction graphs for dedup clustering / influence scoring.
Everything is expressed as joins + aggregates (edges are rows, never
adjacency lists), so the shuffles are key-equality on node ids and the
iteration count is a fixed literal — no driver-side convergence loop
over row-scale data. Rank mass per node is a double, but every
structural quantity (degrees, N) stays integer, and outputs are
rounded portably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Distinct (custkey, suppkey) edges of the co-purchase bipartite
    graph: lineitem ⋈ orders on the order key (fact-fact, co-partitioned
    shuffle join), then a distinct on the edge pair. The distinct's
    partial aggregation collapses duplicates map-side, so the edge
    shuffle carries unique pairs per partition, not raw line items."""
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .distinct()
    )


def degree_histogram(edges: DataFrame, node_col: str) -> DataFrame:
    """Degree distribution of one side of the graph: degree per node
    (count over distinct edges), then the histogram degree → #nodes.
    Two hash aggregates, both with map-side combine; the second one's
    key space is ≤ max-degree values."""
    return (
        edges.groupBy(node_col)
        .agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def pagerank_bipartite(
    edges: DataFrame, iterations: int = 2, damping: float = 0.85
) -> DataFrame:
    """PageRank on the UNDIRECTED bipartite co-purchase graph for a
    fixed number of iterations: r_{t+1}(x) = (1-d)/N + d·Σ_{y~x}
    r_t(y)/deg(y), uniform init 1/N. Undirected bipartite means no
    dangling nodes (every node has ≥1 edge by construction) and each
    iteration is exactly two edge-keyed shuffles (contributions into
    suppliers, contributions into customers); degrees and the node
    count ride broadcasts. A fixed iteration literal keeps the lineage
    bounded — at 100 TB you checkpoint between iterations rather than
    growing one plan, but 2 iterations is a single safe plan.

    Returns (node, rank) with node labeled 'C:<id>' / 'S:<id>'."""
    # the edge frame feeds degree counts, N, and both sides of every
    # iteration — localCheckpoint (same pattern as dedup.dup_clusters)
    # materializes it ONCE and truncates lineage, so the final plan
    # references a checkpoint scan instead of re-expanding the upstream
    # fact join 13×
    edges = edges.localCheckpoint(eager=True)
    deg_c = edges.groupBy("custkey").agg(F.count(F.lit(1)).alias("deg"))
    deg_s = edges.groupBy("suppkey").agg(F.count(F.lit(1)).alias("deg"))
    n = (
        deg_c.agg(F.count(F.lit(1)).alias("nc"))
        .crossJoin(deg_s.agg(F.count(F.lit(1)).alias("ns")))
        .select((F.col("nc") + F.col("ns")).cast("double").alias("n"))
    )
    d = F.lit(damping)
    # rank frames: (custkey, r) and (suppkey, r); init 1/N
    r_c = deg_c.crossJoin(F.broadcast(n)).select(
        "custkey", (F.lit(1.0) / F.col("n")).alias("r")
    )
    r_s = deg_s.crossJoin(F.broadcast(n)).select(
        "suppkey", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(iterations):
        # contributions flow across edges in both directions
        out_c = edges.join(r_c, "custkey").join(
            F.broadcast(deg_c), "custkey"
        )
        new_s = (
            out_c.groupBy("suppkey")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("acc"))
            .crossJoin(F.broadcast(n))
            .select(
                "suppkey",
                ((F.lit(1.0) - d) / F.col("n") + d * F.col("acc")).alias(
                    "r"
                ),
            )
        )
        out_s = edges.join(r_s, "suppkey").join(
            F.broadcast(deg_s), "suppkey"
        )
        new_c = (
            out_s.groupBy("custkey")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("acc"))
            .crossJoin(F.broadcast(n))
            .select(
                "custkey",
                ((F.lit(1.0) - d) / F.col("n") + d * F.col("acc")).alias(
                    "r"
                ),
            )
        )
        r_c, r_s = new_c, new_s
    return r_c.select(
        F.concat(F.lit("C:"), F.col("custkey").cast("string")).alias("node"),
        "r",
    ).unionByName(
        r_s.select(
            F.concat(
                F.lit("S:"), F.col("suppkey").cast("string")
            ).alias("node"),
            "r",
        )
    )
