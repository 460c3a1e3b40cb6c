"""Graph analytics over the co-purchase bipartite graph: degree
distribution and fixed-iteration PageRank.

Registry family module — split from the single-file registry; each
family defines its ``q_*`` callables plus the matching ``ORACLES``
entries, aggregated in ``__init__``."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.functions import text
from data_wrangle_openstreetmaps_data_spark.operators import graph

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403


def q_degree_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — degree distribution of the co-purchase graph's
    customer side (how many distinct suppliers each customer bought
    from, histogrammed). The fact-fact join is co-partitioned on the
    order key; both aggregates combine map-side, and the histogram's
    key space is bounded by the max degree. The interaction-graph
    profile you check before clustering a 100 TB interaction log."""
    edges = graph.copurchase_edges(
        table(spark, sf, "lineitem"), table(spark, sf, "orders")
    )
    return graph.degree_histogram(edges, "custkey").orderBy("degree")


def q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — 2-iteration PageRank (d=0.85) on the undirected
    co-purchase bipartite graph; top-20 nodes by normalized rank
    (rank·N, mean 1). Each iteration is two edge-keyed shuffles with
    degrees/N on broadcasts; the iteration count is a plan literal, so
    there is no driver convergence loop. Ordering is on the ROUNDED
    rank with a node-id tiebreak, so top-20 membership is deterministic
    cross-engine (sum-order ulp drift is ~1e-15 of a rank, 11 orders
    below the 4dp boundary)."""
    # materialize the fact-join edge list once — it feeds the operator
    # (degrees, N, both iteration sides) AND the normalization scalar
    edges = graph.copurchase_edges(
        table(spark, sf, "lineitem"), table(spark, sf, "orders")
    ).localCheckpoint(eager=True)
    ranks = graph.pagerank_bipartite(edges, iterations=2, damping=0.85)
    n = (
        edges.agg(
            (
                F.count_distinct(F.col("custkey"))
                + F.count_distinct(F.col("suppkey"))
            )
            .cast("double")
            .alias("n")
        )
    )
    return (
        ranks.crossJoin(F.broadcast(n))
        .select(
            "node", text.round4(F.col("r") * F.col("n")).alias("rank_n")
        )
        .orderBy(F.desc("rank_n"), "node")
        .limit(20)
    )


_PR_EDGES = """
  edges AS (
    SELECT DISTINCT o_custkey AS c, l_suppkey AS s
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  )
"""

ORACLES: dict[str, str | None] = {
    "q_degree_distribution": f"""
        WITH {_PR_EDGES},
        deg AS (SELECT c, count(*) AS degree FROM edges GROUP BY c)
        SELECT degree, count(*) AS n_nodes
        FROM deg GROUP BY degree ORDER BY degree
    """,
    "q_pagerank": f"""
        WITH {_PR_EDGES},
        dc AS (SELECT c, count(*) AS deg FROM edges GROUP BY c),
        ds AS (SELECT s, count(*) AS deg FROM edges GROUP BY s),
        nn AS (
          SELECT CAST((SELECT count(*) FROM dc)
                      + (SELECT count(*) FROM ds) AS DOUBLE) AS n
        ),
        r0c AS (SELECT c, 1.0 / (SELECT n FROM nn) AS r FROM dc),
        r0s AS (SELECT s, 1.0 / (SELECT n FROM nn) AS r FROM ds),
        r1s AS (
          SELECT e.s AS s,
                 (1.0 - 0.85) / (SELECT n FROM nn)
                 + 0.85 * sum(r.r / d.deg) AS r
          FROM edges e JOIN r0c r ON e.c = r.c JOIN dc d ON e.c = d.c
          GROUP BY e.s
        ),
        r1c AS (
          SELECT e.c AS c,
                 (1.0 - 0.85) / (SELECT n FROM nn)
                 + 0.85 * sum(r.r / d.deg) AS r
          FROM edges e JOIN r0s r ON e.s = r.s JOIN ds d ON e.s = d.s
          GROUP BY e.c
        ),
        r2s AS (
          SELECT e.s AS s,
                 (1.0 - 0.85) / (SELECT n FROM nn)
                 + 0.85 * sum(r.r / d.deg) AS r
          FROM edges e JOIN r1c r ON e.c = r.c JOIN dc d ON e.c = d.c
          GROUP BY e.s
        ),
        r2c AS (
          SELECT e.c AS c,
                 (1.0 - 0.85) / (SELECT n FROM nn)
                 + 0.85 * sum(r.r / d.deg) AS r
          FROM edges e JOIN r1s r ON e.s = r.s JOIN ds d ON e.s = d.s
          GROUP BY e.c
        ),
        u AS (
          SELECT 'C:' || CAST(c AS VARCHAR) AS node, r FROM r2c
          UNION ALL
          SELECT 'S:' || CAST(s AS VARCHAR) AS node, r FROM r2s
        )
        SELECT node,
               floor(r * (SELECT n FROM nn) * 10000 + 0.5) / 10000 AS rank_n
        FROM u
        ORDER BY rank_n DESC, node
        LIMIT 20
    """,
}
