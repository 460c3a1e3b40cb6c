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
    ).transform(_mat)
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


_PR_SCALE = 10**9
_PR_ITERS = 24


def q_pagerank_converged(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — PageRank run to CONVERGENCE (r10 verdict item 7): a
    driver-side loop (graph.pagerank_converged) with an exact-zero
    L1-residual stopping rule and per-iteration localCheckpoint so the
    plan never re-expands prior iterations. The update lives on a 10⁹
    fixed-point integer grid with dyadic damping ¼ (picked for grid
    convergence speed: residual ≈ ¼ᵏ·scale hits exact zero in ~15
    iterations vs ~40 for ½ and ~130 for 0.85) — every iterate is
    exact BIGINT arithmetic, bit-identical across engines regardless of
    summation order, and the integer fixed point is ABSORBING: the
    oracle unrolls a fixed 24 iterations and provably equals the
    early-exited Spark loop (if the grid ever failed to converge, both
    engines would still run the identical 24th iterate — correctness
    never depends on convergence). Convergence itself (n_iters < 24)
    is pinned by tests/test_plans.py, not the oracle. Output: top-20
    nodes by grid rank (integer ordering, no float tiebreaks) with the
    normalized rank·N as round4."""
    edges = graph.copurchase_edges(
        table(spark, sf, "lineitem"), table(spark, sf, "orders")
    )
    ranks = graph.pagerank_converged(
        edges, damping_num=1, damping_den=4,
        scale=_PR_SCALE, max_iters=_PR_ITERS,
    )
    n = edges.agg(
        (
            F.count_distinct(F.col("custkey"))
            + F.count_distinct(F.col("suppkey"))
        ).alias("n")
    )
    return (
        ranks.crossJoin(F.broadcast(n))
        .select(
            "node",
            "rank_u",
            text.round4(
                (F.col("rank_u") * F.col("n")).cast("double")
                / F.lit(_PR_SCALE)
            ).alias("rank_n"),
        )
        .orderBy(F.desc("rank_u"), "node")
        .limit(20)
    )


def _pagerank_converged_sql(iters: int = _PR_ITERS) -> str:
    """Oracle for q_pagerank_converged: the SAME integer-grid recurrence
    unrolled ``iters`` times as a generated CTE chain (the inlined-
    constants device of q_ewma / q_dedup_minhash's permutations). Sums
    of BIGINT are HUGEINT in DuckDB — every iterate CASTs back to
    BIGINT (the documented HUGEINT→pandas-float trap)."""
    s = _PR_SCALE
    # AS MATERIALIZED throughout: DuckDB inlines CTEs by default, and a
    # 2·iters-deep chain with per-level scalar subqueries explodes the
    # optimizer (measured: sf0.001 oracle ran past 580s inlined, <1s
    # materialized)
    ctes = [
        "dc AS MATERIALIZED (SELECT c, count(*) AS deg"
        " FROM edges GROUP BY c)",
        "ds AS MATERIALIZED (SELECT s, count(*) AS deg"
        " FROM edges GROUP BY s)",
        "nn AS MATERIALIZED (SELECT (SELECT count(*) FROM dc)"
        " + (SELECT count(*) FROM ds) AS n)",
        # CAST the scale literal to BIGINT first: a bare 10^9 literal is
        # INT32 in DuckDB and 10^9 * 3 overflows at parse-constant-fold
        f"bb AS MATERIALIZED (SELECT CAST((CAST({s} AS BIGINT) * 3) //"
        " (4 * (SELECT n FROM nn)) AS BIGINT) AS base)",
        f"c0 AS MATERIALIZED (SELECT c,"
        f" CAST({s} // (SELECT n FROM nn) AS BIGINT)"
        " AS r, deg FROM dc)",
        f"s0 AS MATERIALIZED (SELECT s,"
        f" CAST({s} // (SELECT n FROM nn) AS BIGINT)"
        " AS r, deg FROM ds)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT x.s,"
            " CAST((SELECT base FROM bb) + (1 * x.acc) // 4 AS BIGINT)"
            " AS r, d.deg"
            " FROM (SELECT e.s, sum(p.r // p.deg) AS acc"
            f"       FROM edges e JOIN c{k-1} p ON e.c = p.c"
            "       GROUP BY e.s) x"
            " JOIN ds d ON d.s = x.s)"
        )
        ctes.append(
            f"c{k} AS MATERIALIZED (SELECT x.c,"
            " CAST((SELECT base FROM bb) + (1 * x.acc) // 4 AS BIGINT)"
            " AS r, d.deg"
            " FROM (SELECT e.c, sum(p.r // p.deg) AS acc"
            f"       FROM edges e JOIN s{k-1} p ON e.s = p.s"
            "       GROUP BY e.c) x"
            " JOIN dc d ON d.c = x.c)"
        )
    return f"""
        WITH {_PR_EDGES},
        {',' .join(ctes)},
        u AS (
          SELECT 'C:' || CAST(c AS VARCHAR) AS node, r FROM c{iters}
          UNION ALL
          SELECT 'S:' || CAST(s AS VARCHAR) AS node, r FROM s{iters}
        )
        SELECT node, CAST(r AS BIGINT) AS rank_u,
               floor(CAST(r * (SELECT n FROM nn) AS DOUBLE)
                     / {s} * 10000 + 0.5) / 10000 AS rank_n
        FROM u
        ORDER BY rank_u DESC, node
        LIMIT 20
    """


def q_supplier_similarity(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — supplier-supplier Jaccard similarity through shared
    customers (the set-overlap companion to q_cooccurrence_lift's
    probabilistic lift and q_market_basket's cosine): J = |A∩B| /
    (deg_a + deg_b − |A∩B|), support ≥ 5, top-20. Pairs come from a
    customer-keyed self-join over the WHALE-CAPPED edge list
    (graph.cap_degree, cap=64 — above the measured bulk degree, sf0.1
    median 38 / p99 74, so only the tail is capped): a hot customer
    contributes C(64,2) pairs instead of C(deg,2), which is what keeps
    this plan alive on a skewed key at 100 TB (r9 verdict item 2; the
    planted-whale bound is measured in STRESS_r10). The Jaccard is
    DEFINED on the capped graph — supplier degrees too — and the
    oracle replicates the identical md5 band+rank cap rule, so both
    engines see the same graph. Degrees ride a broadcast; the Jaccard
    divides exact integers. Ordering on the ROUNDED score with pair
    tiebreaks."""
    edges = graph.copurchase_edges(
        table(spark, sf, "lineitem"), table(spark, sf, "orders")
    )
    edges = graph.cap_degree(
        edges, "custkey", "suppkey", cap=64
    ).transform(_mat)
    deg = edges.groupBy("suppkey").agg(F.count(F.lit(1)).alias("deg"))
    a = edges.select("custkey", F.col("suppkey").alias("s1"))
    b = edges.select("custkey", F.col("suppkey").alias("s2"))
    pairs = (
        a.join(b, "custkey")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    d1 = deg.select(F.col("suppkey").alias("s1"), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("suppkey").alias("s2"), F.col("deg").alias("deg2"))
    jacc = F.col("n_ab") / (
        F.col("deg1") + F.col("deg2") - F.col("n_ab")
    )
    return (
        pairs.join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .select(
            "s1", "s2", "n_ab", text.round4(jacc).alias("jaccard")
        )
        .orderBy(F.desc("jaccard"), "s1", "s2")
        .limit(20)
    )


def q_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — per-node triangle counts on the part co-purchase
    graph (parts co-bought in ≥2 distinct orders — the support cut
    keeps the projection sparse, unlike the near-complete supplier
    projection). Counting runs the degree-oriented compact-forward
    algorithm (operators/graph.py::triangle_counts): orientation bounds
    every wedge fan-out by O(√|E|) even under hub skew, and all steps
    are key-equality joins — the clustering-coefficient primitive you
    run on a 100 TB interaction graph. Top-20 by count with id
    tiebreak; the oracle closes id-ordered wedges (the triangle SET is
    orientation-invariant)."""
    edges = graph.copurchase_part_edges(
        table(spark, sf, "lineitem"), min_orders=2
    ).transform(_mat)
    return (
        graph.triangle_counts(edges)
        .orderBy(F.desc("n_triangles"), "node")
        .limit(20)
    )


def q_link_prediction(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — Adamic-Adar link prediction on the part co-purchase
    graph: non-adjacent part pairs scored by Σ 1/ln(deg) over common
    neighbors (≥2), top-20 — 'parts likely to be co-bought next', the
    recommendation companion to q_market_basket's observed-pair cosine.
    Candidates come from a neighbor-keyed wedge join whose per-z
    fan-out is BOUNDED by graph.cap_degree (cap=64, far above the
    part-graph bulk degree — sf0.1 max und-degree is 6 — so the cap
    never binds on this data and is pure whale insurance; the score is
    defined on the capped graph, degrees included, and the oracle
    replicates the identical md5 band+rank rule — r9 verdict item 2).
    Existing edges leave via anti-join, degrees ride a broadcast.
    Ordering on the ROUNDED score with pair tiebreaks; the double
    sum's ulp drift sits orders below the 4dp boundary (same argument
    as q_pagerank)."""
    edges = graph.copurchase_part_edges(
        table(spark, sf, "lineitem"), min_orders=2
    ).transform(_mat)
    scored = graph.adamic_adar(edges, min_common=2, cap=64)
    return (
        scored.select(
            "u", "v", "n_common", text.round4(F.col("aa_score")).alias("aa")
        )
        .orderBy(F.desc("aa"), "u", "v")
        .limit(20)
    )


def q_graph_bfs(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — breadth-first reachability levels from a seed node
    (the smallest part key in the edge set) over the part co-purchase
    graph: per-level node count and exact id-sum for levels 0..3. The
    registry plan is the UNROLLED frontier expansion — each hop is one
    edge-keyed join + one anti-join against the visited set, the same
    plan-literal-iterations device as q_pagerank, with per-hop
    ``localCheckpoint`` so the static plan never re-expands earlier
    frontiers. The anti-join IS the min-level guarantee (a node joins
    the first frontier that reaches it), which is exactly the oracle's
    ``WITH RECURSIVE`` + min(level) semantics. Every step is a
    key-equality shuffle on node id; nothing driver-side."""
    edges = graph.copurchase_part_edges(
        table(spark, sf, "lineitem"), min_orders=2
    ).transform(_mat)
    und = (
        edges.select(F.col("s1").alias("z"), F.col("s2").alias("x"))
        .unionAll(
            edges.select(F.col("s2").alias("z"), F.col("s1").alias("x"))
        )
        .transform(_mat)
    )
    seed = edges.agg(F.min("s1").alias("node"))
    frontier = seed.select("node", F.lit(0).alias("level"))
    visited = frontier
    for i in range(1, 4):
        nxt = (
            und.join(
                F.broadcast(frontier.select(F.col("node").alias("z"))),
                "z",
            )
            .select(F.col("x").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(i).alias("level"))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(nxt)
        frontier = nxt
    return (
        visited.groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").cast("long").alias("sum_nodes"),
        )
        .orderBy("level")
    )


def q_shortest_path(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — single-source weighted shortest paths, 3 rounds of
    Bellman-Ford relaxation from the smallest part key, edge length
    1/n_ab (strong co-purchase ties are short). Each unrolled round is
    one edge-keyed join + one min-aggregate — d_{i+1}(v) = min(d_i(v),
    min_u d_i(u)+w(u,v)) — with per-round ``localCheckpoint`` lineage
    cuts (the q_pagerank device). Distances are IEEE doubles but still
    cross-engine exact: every path length is the same left-to-right sum
    of the same 1/n doubles, and min() over an identical value set is
    order-free. Top-20 nearest by (4dp distance, node id)."""
    edges = graph.copurchase_part_edges(
        table(spark, sf, "lineitem"), min_orders=2, keep_weight=True
    ).transform(_mat)
    w = F.lit(1.0) / F.col("n_ab").cast("double")
    und = (
        edges.select(
            F.col("s1").alias("z"), F.col("s2").alias("x"), w.alias("w")
        )
        .unionAll(
            edges.select(
                F.col("s2").alias("z"),
                F.col("s1").alias("x"),
                w.alias("w"),
            )
        )
        .localCheckpoint(eager=True)
    )
    d = edges.agg(F.min("s1").alias("node")).select(
        "node", F.lit(0.0).alias("dist")
    )
    for _ in range(3):
        relax = (
            und.join(
                d.select(F.col("node").alias("z"), "dist"), "z"
            )
            .select(
                F.col("x").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        d = (
            d.unionAll(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return (
        d.select("node", text.round4(F.col("dist")).alias("dist"))
        .orderBy("dist", "node")
        .limit(20)
    )


def q_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — degree assortativity of the part co-purchase graph:
    Pearson correlation of (deg(u), deg(v)) over the DIRECTED edge list
    (both orientations of each undirected edge — Newman's convention),
    from exact bigint sufficient statistics (n·Σxy − Σx·Σy over exact
    integer degree sums — the float-sum-free correlation pattern), so
    the correlation is bit-identical cross-engine before the final
    double division. Degrees ride broadcasts onto the edge list; one
    map-side-combining aggregate produces the 1-row stats. Headroom:
    Σdeg² per edge needs Σ deg_u²·deg_v⁰ < 9.2e18 — at web scale switch
    the stats to decimal(38,0)."""
    edges = graph.copurchase_part_edges(
        table(spark, sf, "lineitem"), min_orders=2
    ).transform(_mat)
    und = edges.select(
        F.col("s1").alias("u"), F.col("s2").alias("v")
    ).unionAll(edges.select(F.col("s2").alias("u"), F.col("s1").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("u").alias("u"), F.col("deg").alias("dx"))
    dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("dy"))
    j = und.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    a = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return a.select(
        F.col("n").alias("n_directed_edges"),
        text.round4(
            F.when((vx > 0) & (vy > 0), num / F.sqrt(vx * vy))
        ).alias("assortativity"),
    )


def q_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — 2-core decomposition by iterative degree pruning
    (3 unrolled rounds): repeatedly drop nodes with degree < 2 and the
    edges touching them, reporting (round, n_nodes, n_edges) — the
    shrinking-core profile that tells you how much of an interaction
    graph is load-bearing vs pendant fuzz before running community/
    triangle algorithms on it. Each round is a degree aggregate + two
    semi-join filters (all key-equality shuffles), ``localCheckpoint``
    per round (the q_pagerank lineage device); stats rows are 1-row
    aggregates unioned into the 4-row output."""
    edges = graph.copurchase_part_edges(
        table(spark, sf, "lineitem"), min_orders=2
    ).transform(_mat)

    def stats(e: DataFrame, r: int) -> DataFrame:
        nn = (
            e.select(F.col("s1").alias("node"))
            .unionAll(e.select(F.col("s2").alias("node")))
            .distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        )
        ne = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        return nn.crossJoin(ne).select(
            F.lit(r).cast("int").alias("round"), "n_nodes", "n_edges"
        )

    out = [stats(edges, 0)]
    cur = edges
    for r in range(1, 4):
        deg = (
            cur.select(F.col("s1").alias("node"))
            .unionAll(cur.select(F.col("s2").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= 2)
            .select("node")
        )
        cur = (
            cur.join(
                deg.select(F.col("node").alias("s1")), "s1", "left_semi"
            )
            .join(
                deg.select(F.col("node").alias("s2")), "s2", "left_semi"
            )
            .localCheckpoint(eager=True)
        )
        out.append(stats(cur, r))
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res.orderBy("round")


def q_clustering_coefficient(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — local clustering coefficient cc(v) = 2·T(v)/(d(v)·
    (d(v)−1)) per node of the co-purchase graph, plus the exact integer
    sufficient statistics (triangles, degree): the
    how-clique-ish-is-my-neighborhood metric that separates organic
    communities from star-shaped hub spam. Triangles come from the
    degree-oriented compact-forward counter (operators/graph.py —
    wedge fan-out bounded O(√|E|) under skew); degrees are one keyed
    count; cc is a single mirrored double ratio per node. Top-20 by
    (cc desc, degree desc, node) over nodes with d ≥ 2."""
    edges = graph.copurchase_part_edges(
        table(spark, sf, "lineitem"), min_orders=2
    ).transform(_mat)
    tri = graph.triangle_counts(edges)
    deg = (
        edges.select(F.col("s1").alias("node"))
        .unionAll(edges.select(F.col("s2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    d = F.col("deg").cast("double")
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "node", "left")
        .withColumn(
            "n_triangles",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long"),
        )
        .select(
            "node",
            "deg",
            "n_triangles",
            text.round4(
                F.lit(2.0)
                * F.col("n_triangles").cast("double")
                / (d * (d - F.lit(1.0)))
            ).alias("cc"),
        )
        .orderBy(F.desc("cc"), F.desc("deg"), "node")
        .limit(20)
    )


def q_modularity(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — Newman modularity of the brand partition on the
    co-purchase part graph: per community c (= p_brand, the natural
    attribute partition), Q_c = e_c/m − (d_c/2m)² where e_c = edges
    with both endpoints in c, d_c = Σ degrees of c's nodes, m = |E|.
    Positive Σ Q_c means brands cluster in the basket graph more than a
    degree-preserving random rewiring predicts — the community-quality
    score every Louvain-style algorithm maximizes, here evaluated for a
    GIVEN labeling (the cheap first question before running detection).
    All sufficient statistics are EXACT bigint counts; the two
    quadratic-form doubles appear once per output row. Plan: edges join
    a broadcast part-brand dim twice; three small key aggregates; m
    rides along as a broadcast scalar."""
    edges = graph.copurchase_part_edges(
        table(spark, sf, "lineitem"), min_orders=2
    )
    brand = F.broadcast(
        table(spark, sf, "part").select(
            F.col("p_partkey").alias("node"), F.col("p_brand").alias("b")
        )
    )
    be = (
        edges.join(brand.withColumnRenamed("b", "b1"), edges.s1 == F.col("node"))
        .drop("node")
        .join(brand.withColumnRenamed("b", "b2"), edges.s2 == F.col("node"))
        .drop("node")
        # four consumers (m, within, deg, nodes) — materialize once or
        # the plan re-executes the basket self-join 4× (CacheManager
        # substitutes the InMemoryRelation at analysis, so the static
        # plan stays compact too — r10 _mat swap, PERF.md)
        .transform(_mat)
    )
    m = be.agg(F.count(F.lit(1)).alias("m"))
    within = (
        be.filter(F.col("b1") == F.col("b2"))
        .groupBy(F.col("b1").alias("brand"))
        .agg(F.count(F.lit(1)).alias("e_within"))
    )
    deg = (
        be.select(F.col("b1").alias("brand"))
        .unionAll(be.select(F.col("b2").alias("brand")))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("d_sum"))
    )
    nodes = (
        be.select(F.col("s1").alias("node"), F.col("b1").alias("brand"))
        .unionAll(
            be.select(F.col("s2").alias("node"), F.col("b2").alias("brand"))
        )
        .distinct()
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    md = F.col("m").cast("double")
    return (
        deg.join(within, "brand", "left")
        .join(nodes, "brand")
        .withColumn("e_within", F.coalesce("e_within", F.lit(0)))
        .crossJoin(F.broadcast(m))
        .select(
            "brand",
            "n_nodes",
            F.col("e_within").cast("long").alias("e_within"),
            F.col("d_sum").cast("long").alias("d_sum"),
            text.round4(
                F.col("e_within").cast("double") / md
                - (
                    F.col("d_sum").cast("double")
                    / (F.lit(2.0) * md)
                )
                * (
                    F.col("d_sum").cast("double")
                    / (F.lit(2.0) * md)
                )
            ).alias("q_contrib"),
        )
        .orderBy("brand")
    )


_PART_EDGES = """
  pe AS MATERIALIZED (
    SELECT a.p AS s1, b.p AS s2
    FROM (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) b
      ON a.o = b.o AND a.p < b.p
    GROUP BY 1, 2
    HAVING count(*) >= 2
  )
"""

_PR_EDGES = """
  edges AS (
    SELECT DISTINCT o_custkey AS c, l_suppkey AS s
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  )
"""

def q_recursive_hierarchy(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — hierarchy walk (org-chart / BOM-explosion shape): each
    customer key climbs its synthetic parent chain k → k div 7 to the
    root, reporting walk depth and the exact path-sum of visited keys.
    The registry callable is the PLAN-LITERAL unrolled loop (4 fixed
    union stages — ceil(log₇ 2400) bounds every start key < 200, same
    device as q_pagerank's literal iterations), so Catalyst sees a
    static DAG with no fixpoint operator; the engine ALSO runs the
    identical traversal as literal ``WITH RECURSIVE`` spark.sql text
    (Spark 4 recursive CTEs — parity pinned in
    tests/test_sql_surface.py), and the DuckDB oracle is the same
    recursive CTE. Start set bounded (< 200) so the fan-out is a
    constant ~200·4 rows regardless of table scale."""
    cust = table(spark, sf, "customer")
    base = cust.filter(F.col("c_custkey") < 200).select(
        F.col("c_custkey").alias("k0"),
        F.col("c_custkey").alias("k"),
        F.lit(0).alias("d"),
    )
    frames = [base]
    cur = base
    for _ in range(4):
        cur = cur.filter(F.col("k") > 0).select(
            "k0", F.expr("k div 7").alias("k"), (F.col("d") + 1).alias("d")
        )
        frames.append(cur)
    walk = frames[0]
    for fdf in frames[1:]:
        walk = walk.unionAll(fdf)
    return (
        walk.groupBy("k0")
        .agg(F.max("d").alias("depth"), F.sum("k").alias("path_sum"))
        .select(F.col("k0").alias("custkey"), "depth", "path_sum")
        .orderBy("custkey")
    )


def q_resource_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — resource-allocation link prediction (Zhou, Lü &
    Zhang 2009): RA(s1,s2) = Σ_c 1/deg(c) over common customer
    neighbors c — the degree-weighted companion to q_link_prediction's
    unweighted Jaccard (hub customers contribute less evidence than
    exclusive ones). Pairs come from the same customer-keyed self-join
    as q_supplier_similarity, over the WHALE-CAPPED edge list
    (graph.cap_degree, cap=64, above the measured bulk degree — sf0.1
    median 38 / p99 74): a hot customer contributes C(64,2) pairs, not
    C(deg,2), the coded form of the 100-TB cap this docstring used to
    only promise (r9 verdict item 2). The RA score is DEFINED on the
    capped graph — 1/deg uses the capped customer degree — and the
    oracle replicates the identical md5 band+rank rule. 1/deg is a
    SINGLE IEEE division floored to an exact 1e-9 grid integer per
    edge — the pair score is then an exact BIGINT sum, so ranking,
    top-20 membership, and the 4dp output are all deterministic
    cross-engine (no float-sum ordering anywhere, unlike Adamic-Adar's
    1/ln(deg) whose libm log can drift an ulp between engines)."""
    edges = graph.copurchase_edges(
        table(spark, sf, "lineitem"), table(spark, sf, "orders")
    )
    edges = graph.cap_degree(
        edges, "custkey", "suppkey", cap=64
    ).transform(_mat)
    cdeg = edges.groupBy("custkey").agg(F.count(F.lit(1)).alias("cdeg"))
    wt = edges.join(F.broadcast(cdeg), "custkey").select(
        "custkey",
        F.col("suppkey").alias("s1"),
        F.floor(F.lit(1_000_000_000.0) / F.col("cdeg") + F.lit(0.5))
        .cast("long")
        .alias("w"),
    )
    b = edges.select("custkey", F.col("suppkey").alias("s2"))
    pairs = (
        wt.join(b, "custkey")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.sum("w").alias("ra9"),
            F.count(F.lit(1)).alias("common"),
        )
    )
    return (
        pairs.select(
            "s1",
            "s2",
            "common",
            text.round4(F.col("ra9").cast("double") / F.lit(1e9)).alias(
                "ra_score"
            ),
            F.col("ra9").alias("ra9"),
        )
        .orderBy(F.desc("ra9"), "s1", "s2")
        .limit(20)
    )


def q_resource_allocation_capped(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — resource-allocation link prediction over WHALE-CAPPED
    edges: graph.cap_degree bounds every customer to its 8
    deterministically-min-hash-chosen suppliers BEFORE the pair
    self-join, so a hot key contributes C(8,2)=28 pairs instead of
    C(deg,2) — the coded form of the cap the uncapped queries'
    docstrings promise at 100 TB (r8 verdict item 4). RA weights use
    the CAPPED degree (the score is defined on the capped graph — a
    documented estimator, not a silent approximation of the exact
    one); accounting columns surface what the cap did: n_capped_keys
    (customers over the cap) and edges_dropped. The oracle replicates
    the identical two-stage band+rank rule in SQL (portable md5 hash),
    so the capped graph is bit-identical cross-engine; recall vs the
    exact top-20 under a planted deg-10⁴ whale is measured in
    STRESS_r09 (scripts/stress.py)."""
    edges = graph.copurchase_edges(
        table(spark, sf, "lineitem"), table(spark, sf, "orders")
    ).transform(_mat)
    capped = graph.cap_degree(
        edges, "custkey", "suppkey", cap=8
    ).transform(_mat)
    deg = edges.groupBy("custkey").agg(F.count(F.lit(1)).alias("deg"))
    acct = (
        deg.agg(
            F.count(F.when(F.col("deg") > 8, 1))
            .cast("long")
            .alias("n_capped_keys"),
            F.sum("deg").cast("long").alias("n_edges"),
        )
        .crossJoin(
            F.broadcast(
                capped.agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
            )
        )
        .select(
            "n_capped_keys",
            (F.col("n_edges") - F.col("n_kept"))
            .cast("long")
            .alias("edges_dropped"),
        )
    )
    cdeg = capped.groupBy("custkey").agg(F.count(F.lit(1)).alias("cdeg"))
    wt = capped.join(F.broadcast(cdeg), "custkey").select(
        "custkey",
        F.col("suppkey").alias("s1"),
        F.floor(F.lit(1_000_000_000.0) / F.col("cdeg") + F.lit(0.5))
        .cast("long")
        .alias("w"),
    )
    b = capped.select("custkey", F.col("suppkey").alias("s2"))
    pairs = (
        wt.join(b, "custkey")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.sum("w").alias("ra9"),
            F.count(F.lit(1)).alias("common"),
        )
    )
    return (
        pairs.select(
            "s1",
            "s2",
            "common",
            text.round4(F.col("ra9").cast("double") / F.lit(1e9)).alias(
                "ra_score"
            ),
            F.col("ra9").alias("ra9"),
        )
        .orderBy(F.desc("ra9"), "s1", "s2")
        .limit(20)
        .crossJoin(F.broadcast(acct))  # 1-row scalar, not a cartesian
    )


def q_recsys_exposure(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — recommendation EXPOSURE audit: build top-3
    "also bought" lists per supplier from the whale-capped co-purchase
    RA scores (q_resource_allocation_capped's graph), then report what
    a recsys fairness review actually asks: catalog COVERAGE (share of
    items that are ever recommended to anyone) and the GINI of
    recommendation exposure over the WHOLE catalog including
    never-recommended items (0 = exposure spread evenly, →1 = a few
    head items absorb every slot). Gini uses the exact rank-sum
    identity over integer exposure counts — the only float ops are the
    two final divisions, mirrored expression-for-expression. The rank
    window runs over the ITEM CATALOG (already aggregate-sized), never
    over the fact table. One row out."""
    from pyspark.sql import Window

    edges = graph.copurchase_edges(
        table(spark, sf, "lineitem"), table(spark, sf, "orders")
    ).transform(_mat)
    capped = graph.cap_degree(
        edges, "custkey", "suppkey", cap=8
    ).transform(_mat)
    cdeg = capped.groupBy("custkey").agg(F.count(F.lit(1)).alias("cdeg"))
    wt = capped.join(F.broadcast(cdeg), "custkey").select(
        "custkey",
        F.col("suppkey").alias("s1"),
        F.floor(F.lit(1_000_000_000.0) / F.col("cdeg") + F.lit(0.5))
        .cast("long")
        .alias("w"),
    )
    pairs = (
        wt.join(capped.select("custkey", F.col("suppkey").alias("s2")),
                "custkey")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.sum("w").alias("ra9"))
    )
    sym = pairs.select(
        F.col("s1").alias("src"), F.col("s2").alias("dst"), "ra9"
    ).unionByName(
        pairs.select(
            F.col("s2").alias("src"), F.col("s1").alias("dst"), "ra9"
        )
    )
    recs = (
        sym.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.desc("ra9"), "dst")
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("dst")
    )
    catalog = capped.select(F.col("suppkey").alias("item")).distinct()
    expo = catalog.join(
        recs.groupBy(F.col("dst").alias("item")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ),
        "item",
        "left",
    ).select("item", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    ranked = expo.withColumn(
        "i", F.row_number().over(Window.orderBy("c", "item"))
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("catalog_n"),
        F.count(F.when(F.col("c") > 0, 1))
        .cast("long")
        .alias("recommended_n"),
        F.sum("c").cast("long").alias("sum_c"),
        F.sum(F.col("i") * F.col("c")).cast("long").alias("sum_ic"),
    )
    return agg.select(
        "catalog_n",
        "recommended_n",
        text.round4(F.col("recommended_n") / F.col("catalog_n")).alias(
            "coverage"
        ),
        text.round4(
            F.lit(2.0) * F.col("sum_ic") / (F.col("catalog_n") * F.col("sum_c"))
            - (F.col("catalog_n") + F.lit(1.0)) / F.col("catalog_n")
        ).alias("gini"),
    )


_CAPPED_EDGES_SQL = """
  deg AS (SELECT c, count(*) AS deg FROM edges GROUP BY c),
  hashed AS (
    SELECT e.c, e.s, d.deg,
           (('0x' || substr(md5(CAST(e.c AS VARCHAR) || '|' ||
                                CAST(e.s AS VARCHAR)), 1, 15))::BIGINT)
             AS hv
    FROM edges e JOIN deg d ON e.c = d.c
  ),
  banded AS (
    -- CASE, not OR: for deg < 4 the band bound 32*2^60/deg overflows
    -- BIGINT, and SQL does not guarantee the OR short-circuits the
    -- dead CAST (measured: DuckDB evaluated it eagerly at sf0.1 in a
    -- larger composed query and errored). Under-cap keys never need
    -- the bound at all.
    SELECT c, s, hv FROM hashed
    WHERE CASE WHEN deg <= 8 THEN TRUE
               ELSE hv < CAST(floor(32.0 * pow(2.0, 60.0) / deg)
                              AS BIGINT) END
  ),
  ranked AS (
    SELECT c, s,
           row_number() OVER (PARTITION BY c ORDER BY hv, s) AS rk
    FROM banded
  ),
  capped AS (SELECT c, s FROM ranked WHERE rk <= 8)
"""


def _cap_cte(
    src: str, key: str, val: str, cap: int, band_factor: int = 4
) -> str:
    """Parameterized SQL replica of graph.cap_degree (the generalized
    form of _CAPPED_EDGES_SQL's hardwired cap=8 instance): emits CTEs
    ``{src}_cdeg`` … ``{src}_capped`` implementing the identical
    two-stage md5 band + exact-rank rule, so a capped Spark query and
    its DuckDB oracle see the bit-identical capped graph. Same CASE
    (not OR) overflow guard: the band bound band_factor·cap·2^60/deg is
    only evaluated for deg > cap, where it always fits BIGINT
    (cap=64 ⇒ max 256·2^60/65 ≈ 4.5e18 < 2^63). pow(2.0, 60.0) is
    exact on every libm (power of two with integer exponent), matching
    Spark's F.pow in cap_degree."""
    bf = band_factor * cap
    return f"""
  {src}_cdeg AS (
    SELECT {key}, count(*) AS deg FROM {src} GROUP BY {key}
  ),
  {src}_hashed AS (
    SELECT e.{key}, e.{val}, d.deg,
           (('0x' || substr(md5(CAST(e.{key} AS VARCHAR) || '|' ||
                                CAST(e.{val} AS VARCHAR)), 1, 15))::BIGINT)
             AS hv
    FROM {src} e JOIN {src}_cdeg d ON e.{key} = d.{key}
  ),
  {src}_banded AS (
    SELECT {key}, {val}, hv FROM {src}_hashed
    WHERE CASE WHEN deg <= {cap} THEN TRUE
               ELSE hv < CAST(floor({bf}.0 * pow(2.0, 60.0) / deg)
                              AS BIGINT) END
  ),
  {src}_ranked AS (
    SELECT {key}, {val},
           row_number() OVER (
             PARTITION BY {key} ORDER BY hv, {val}
           ) AS rk
    FROM {src}_banded
  ),
  {src}_capped AS (
    SELECT {key}, {val} FROM {src}_ranked WHERE rk <= {cap}
  )
"""


RECURSIVE_HIERARCHY_SQL = """
    WITH RECURSIVE walk AS (
      SELECT c_custkey AS k0, c_custkey AS k, 0 AS d
      FROM customer WHERE c_custkey < 200
      UNION ALL
      SELECT k0, k {div} 7 AS k, d + 1 AS d FROM walk WHERE k > 0
    )
    SELECT k0 AS custkey, max(d) AS depth,
           CAST(sum(k) AS BIGINT) AS path_sum
    FROM walk GROUP BY k0 ORDER BY custkey
"""


def q_bfs_frontier(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-GRAPH — k-hop BFS frontier profile over the part-part
    co-purchase graph: from the seed set (part keys ≡ 0 mod 50), the
    number of nodes FIRST reached at each hop ≤ 3 and the cumulative
    reach — the neighborhood-growth curve that sizes any iterative
    graph job (a frontier that stops growing means the component is
    exhausted; one that explodes means hop-k joins won't fit).

    Distributed BFS is the canonical iterative-join shape: each hop is
    ONE key-equality join frontier⋈edges plus an anti-join against the
    visited set; each hop's state is localCheckpoint'ed so hop h+1
    consumes materialized hop h instead of re-expanding the whole
    prefix (the PageRank localCheckpoint discipline, bounded here at 3
    rounds). r14 (verdict item 6): the loop state originally used the
    lazy `_mat` persist — the one _mat site inside an iteration loop —
    and the A/B (scripts/ab_bfs_mat.py, outputs asserted identical)
    measured the three forms at sf0.1: in-loop lazy persist 6.6-7.5 s
    (nested unfilled InMemoryRelations re-expand per hop and branches
    race to fill them), in-loop eager persist 14.7-17.5 s (one
    scheduled job per hop), in-loop localCheckpoint with the
    multi-consumer edge frames kept as columnar `_mat` 2.5-3.3 s —
    exactly the _mat docstring's discipline (lineage CUT is the point
    inside iterative plans). Sparse substrate: the support-≥2 part
    graph (|E| = O(|parts|)), undirected via both edge orientations.
    Oracle: recursive CTE whose UNION-distinct state is (node, hop)
    pairs — bounded by 4·|V|, with min(hop) recovering the BFS layer."""
    edges = graph.copurchase_part_edges(
        table(spark, sf, "lineitem"), min_orders=2
    ).transform(_mat)
    und = edges.select(
        F.col("s1").alias("src"), F.col("s2").alias("dst")
    ).unionByName(
        edges.select(
            F.col("s2").alias("src"), F.col("s1").alias("dst")
        )
    ).transform(_mat)
    seeds = (
        und.select("src").distinct().filter(F.col("src") % 50 == 0)
    )
    visited = seeds.select(
        F.col("src").alias("id"), F.lit(0).alias("hop")
    ).localCheckpoint(eager=True)
    frontier = visited.select("id")
    for h in (1, 2, 3):
        nxt = (
            und.join(frontier, und["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new = nxt.join(visited.select("id"), "id", "left_anti").select(
            "id", F.lit(h).alias("hop")
        ).localCheckpoint(eager=True)
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        frontier = new.select("id")
    from pyspark.sql import Window

    w = Window.orderBy("hop").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    per = visited.groupBy("hop").agg(
        F.count(F.lit(1)).cast("long").alias("frontier_n")
    )
    return (
        per.withColumn(
            "cum_n", F.sum("frontier_n").over(w).cast("long")
        )
        .orderBy("hop")
    )


def q_kanon_generalization(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-PRIVACY — k-anonymity GENERALIZATION LADDER (the step after
    the q_k_anonymity audit: not "are we k-anonymous" but "how much
    generalization buys it"): quasi-identifier hierarchies
    (nation, segment) → (region, segment) → (region) → (), evaluated
    in ONE aggregate via GROUPING SETS (the engine computes all four
    grain levels in a single pass — no 4× re-scan), then per level the
    class count, the smallest class, and whether min ≥ k = 10; the
    chosen level is the least-generalized one meeting k (broadcast
    scalar join, the decorrelated-subquery pattern). Equivalence
    classes at coarser grains only merge, so min class size is
    monotone up the ladder — level 3 (suppress everything) always
    meets k: the ladder terminates by construction."""
    cust = table(spark, sf, "customer")
    nat = table(spark, sf, "nation")
    j = cust.join(
        F.broadcast(
            nat.select(
                F.col("n_nationkey"), F.col("n_regionkey").alias("rkey")
            )
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select(
        F.col("c_nationkey").alias("nkey"), "rkey",
        F.col("c_mktsegment").alias("seg"),
    )
    classes = j.groupingSets(
        [
            [F.col("nkey"), F.col("rkey"), F.col("seg")],
            [F.col("rkey"), F.col("seg")],
            [F.col("rkey")],
            [],
        ],
        F.col("nkey"), F.col("rkey"), F.col("seg"),
    ).agg(
        F.count(F.lit(1)).alias("csize"),
        F.grouping_id("nkey", "rkey", "seg").alias("gid"),
    )
    # gid bits (nkey, rkey, seg): level 0 = (nation,region,segment) ≡
    # gid 0; level 1 = (region,segment) ≡ gid 4 (nkey rolled up);
    # level 2 = (region) ≡ gid 5; level 3 = () ≡ gid 7
    lvl = (
        F.when(F.col("gid") == 0, F.lit(0))
        .when(F.col("gid") == 4, F.lit(1))
        .when(F.col("gid") == 5, F.lit(2))
        .when(F.col("gid") == 7, F.lit(3))
    )
    per = (
        classes.withColumn("level", lvl)
        .filter(F.col("level").isNotNull())
        .groupBy("level")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("csize").cast("long").alias("min_class"),
        )
        .withColumn(
            "meets_k",
            (F.col("min_class") >= 10).cast("long"),
        )
    )
    chosen = per.filter(F.col("meets_k") == 1).agg(
        F.min("level").alias("chosen_level")
    )
    return (
        per.join(F.broadcast(chosen))
        .select(
            "level", "n_classes", "min_class", "meets_k",
            (F.col("level") == F.col("chosen_level"))
            .cast("long")
            .alias("is_chosen"),
        )
        .orderBy("level")
    )


ORACLES: dict[str, str | None] = {
    "q_bfs_frontier": f"""
        WITH RECURSIVE {_PART_EDGES},
        und AS (
          SELECT s1 AS src, s2 AS dst FROM pe
          UNION SELECT s2, s1 FROM pe
        ),
        seeds AS (
          SELECT DISTINCT src AS id FROM und WHERE src % 50 = 0
        ),
        reach(id, hop) AS (
          SELECT id, 0 FROM seeds
          UNION
          SELECT u.dst, r.hop + 1
          FROM und u JOIN reach r ON u.src = r.id WHERE r.hop < 3
        ),
        mh AS (SELECT id, CAST(min(hop) AS INTEGER) AS hop
               FROM reach GROUP BY id)
        SELECT hop, CAST(count(*) AS BIGINT) AS frontier_n,
               CAST(sum(count(*)) OVER (
                 ORDER BY hop ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_n
        FROM mh GROUP BY hop ORDER BY hop
    """,
    "q_kanon_generalization": """
        WITH j AS (
          SELECT c.c_nationkey AS nkey, n.n_regionkey AS rkey,
                 c.c_mktsegment AS seg
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        classes AS (
          SELECT nkey, rkey, seg, count(*) AS csize,
                 GROUPING(nkey) * 4 + GROUPING(rkey) * 2 + GROUPING(seg)
                   AS gid
          FROM j GROUP BY CUBE (nkey, rkey, seg)
        ),
        per AS (
          SELECT CASE gid WHEN 0 THEN 0 WHEN 4 THEN 1
                          WHEN 5 THEN 2 WHEN 7 THEN 3 END AS level,
                 CAST(count(*) AS BIGINT) AS n_classes,
                 CAST(min(csize) AS BIGINT) AS min_class
          FROM classes
          WHERE gid IN (0, 4, 5, 7)
          GROUP BY 1
        ),
        flagged AS (
          SELECT level, n_classes, min_class,
                 CASE WHEN min_class >= 10 THEN CAST(1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS meets_k
          FROM per
        ),
        chosen AS (
          SELECT min(level) AS chosen_level FROM flagged WHERE meets_k = 1
        )
        SELECT f.level, f.n_classes, f.min_class, f.meets_k,
               CASE WHEN f.level = c.chosen_level THEN CAST(1 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS is_chosen
        FROM flagged f, chosen c
        ORDER BY f.level
    """,
    "q_recursive_hierarchy": RECURSIVE_HIERARCHY_SQL.format(div="//"),
    "q_resource_allocation": f"""
        WITH {_PR_EDGES},
        {_cap_cte("edges", "c", "s", 64)},
        cdeg AS (
          SELECT c, count(*) AS cdeg FROM edges_capped GROUP BY c
        ),
        wt AS (
          SELECT e.c, e.s,
                 CAST(floor(1000000000.0 / cdeg + 0.5) AS BIGINT) AS w
          FROM edges_capped e JOIN cdeg ON e.c = cdeg.c
        ),
        pairs AS (
          SELECT a.s AS s1, b.s AS s2,
                 CAST(sum(a.w) AS BIGINT) AS ra9, count(*) AS common
          FROM wt a JOIN edges_capped b ON a.c = b.c AND a.s < b.s
          GROUP BY a.s, b.s
        )
        SELECT s1, s2, common,
               floor(ra9 / 1000000000.0 * 10000 + 0.5) / 10000
                 AS ra_score,
               ra9
        FROM pairs ORDER BY ra9 DESC, s1, s2 LIMIT 20
    """,
    "q_recsys_exposure": f"""
        WITH {_PR_EDGES},
        {_CAPPED_EDGES_SQL},
        cdeg AS (SELECT c, count(*) AS cdeg FROM capped GROUP BY c),
        wt AS (
          SELECT cp.c, cp.s,
                 CAST(floor(1000000000.0 / cdeg + 0.5) AS BIGINT) AS w
          FROM capped cp JOIN cdeg ON cp.c = cdeg.c
        ),
        pairs AS (
          SELECT a.s AS s1, b.s AS s2, CAST(sum(a.w) AS BIGINT) AS ra9
          FROM wt a JOIN capped b ON a.c = b.c AND a.s < b.s
          GROUP BY a.s, b.s
        ),
        sym AS (
          SELECT s1 AS src, s2 AS dst, ra9 FROM pairs
          UNION ALL SELECT s2, s1, ra9 FROM pairs
        ),
        recs AS (
          SELECT dst FROM (
            SELECT dst, row_number() OVER (
              PARTITION BY src ORDER BY ra9 DESC, dst
            ) AS rk FROM sym
          ) WHERE rk <= 3
        ),
        catalog AS (SELECT DISTINCT s AS item FROM capped),
        expo AS (
          SELECT item, coalesce(rc.c, 0) AS c
          FROM catalog LEFT JOIN (
            SELECT dst AS item, CAST(count(*) AS BIGINT) AS c
            FROM recs GROUP BY dst
          ) rc USING (item)
        ),
        rk_exp AS (
          SELECT *, row_number() OVER (ORDER BY c, item) AS i FROM expo
        ),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS catalog_n,
                 CAST(count(*) FILTER (c > 0) AS BIGINT) AS recommended_n,
                 CAST(sum(c) AS BIGINT) AS sum_c,
                 CAST(sum(i * c) AS BIGINT) AS sum_ic
          FROM rk_exp
        )
        SELECT catalog_n, recommended_n,
               floor(recommended_n / catalog_n * 10000 + 0.5) / 10000
                 AS coverage,
               floor((2.0 * sum_ic / (catalog_n * sum_c)
                      - (catalog_n + 1.0) / catalog_n) * 10000 + 0.5)
                 / 10000 AS gini
        FROM agg
    """,
    "q_resource_allocation_capped": f"""
        WITH {_PR_EDGES},
        {_CAPPED_EDGES_SQL},
        cdeg AS (SELECT c, count(*) AS cdeg FROM capped GROUP BY c),
        wt AS (
          SELECT cp.c, cp.s,
                 CAST(floor(1000000000.0 / cdeg + 0.5) AS BIGINT) AS w
          FROM capped cp JOIN cdeg ON cp.c = cdeg.c
        ),
        pairs AS (
          SELECT a.s AS s1, b.s AS s2,
                 CAST(sum(a.w) AS BIGINT) AS ra9, count(*) AS common
          FROM wt a JOIN capped b ON a.c = b.c AND a.s < b.s
          GROUP BY a.s, b.s
        ),
        acct AS (
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg WHERE deg > 8)
                   AS n_capped_keys,
                 (SELECT CAST(count(*) AS BIGINT) FROM edges)
                 - (SELECT CAST(count(*) AS BIGINT) FROM capped)
                   AS edges_dropped
        )
        SELECT s1, s2, common,
               floor(ra9 / 1000000000.0 * 10000 + 0.5) / 10000
                 AS ra_score,
               ra9, n_capped_keys, edges_dropped
        FROM pairs, acct ORDER BY ra9 DESC, s1, s2 LIMIT 20
    """,
    "q_modularity": f"""
        WITH {_PART_EDGES},
        be AS MATERIALIZED (
          SELECT s1, s2, pa.p_brand AS b1, pb.p_brand AS b2
          FROM pe
          JOIN part pa ON s1 = pa.p_partkey
          JOIN part pb ON s2 = pb.p_partkey
        ),
        mm AS (SELECT count(*) AS m FROM be),
        deg AS (
          SELECT brand, count(*) AS d_sum FROM (
            SELECT b1 AS brand FROM be UNION ALL SELECT b2 FROM be
          ) GROUP BY brand
        ),
        win AS (
          SELECT b1 AS brand, count(*) AS e_within
          FROM be WHERE b1 = b2 GROUP BY b1
        ),
        nodes AS (
          SELECT brand, count(*) AS n_nodes FROM (
            SELECT DISTINCT node, brand FROM (
              SELECT s1 AS node, b1 AS brand FROM be
              UNION ALL SELECT s2, b2 FROM be
            )
          ) GROUP BY brand
        )
        SELECT deg.brand AS brand, n_nodes,
               CAST(coalesce(e_within, 0) AS BIGINT) AS e_within,
               CAST(d_sum AS BIGINT) AS d_sum,
               floor((CAST(coalesce(e_within, 0) AS DOUBLE)
                        / CAST(m AS DOUBLE)
                      - (CAST(d_sum AS DOUBLE)
                          / (2.0 * CAST(m AS DOUBLE)))
                        * (CAST(d_sum AS DOUBLE)
                          / (2.0 * CAST(m AS DOUBLE))))
                     * 10000 + 0.5) / 10000 AS q_contrib
        FROM deg
        LEFT JOIN win ON deg.brand = win.brand
        JOIN nodes ON deg.brand = nodes.brand
        CROSS JOIN mm
        ORDER BY deg.brand
    """,
    "q_kcore": f"""
        WITH {_PART_EDGES},
        e0 AS MATERIALIZED (SELECT s1, s2 FROM pe),
        k1 AS (
          SELECT node FROM (
            SELECT s1 AS node FROM e0 UNION ALL SELECT s2 FROM e0
          ) GROUP BY node HAVING count(*) >= 2
        ),
        e1 AS MATERIALIZED (
          SELECT e0.s1, e0.s2 FROM e0
          JOIN k1 a ON e0.s1 = a.node JOIN k1 b ON e0.s2 = b.node
        ),
        k2 AS (
          SELECT node FROM (
            SELECT s1 AS node FROM e1 UNION ALL SELECT s2 FROM e1
          ) GROUP BY node HAVING count(*) >= 2
        ),
        e2 AS MATERIALIZED (
          SELECT e1.s1, e1.s2 FROM e1
          JOIN k2 a ON e1.s1 = a.node JOIN k2 b ON e1.s2 = b.node
        ),
        k3 AS (
          SELECT node FROM (
            SELECT s1 AS node FROM e2 UNION ALL SELECT s2 FROM e2
          ) GROUP BY node HAVING count(*) >= 2
        ),
        e3 AS MATERIALIZED (
          SELECT e2.s1, e2.s2 FROM e2
          JOIN k3 a ON e2.s1 = a.node JOIN k3 b ON e2.s2 = b.node
        )
        SELECT 0 AS round,
               (SELECT count(DISTINCT node) FROM
                 (SELECT s1 AS node FROM e0 UNION ALL SELECT s2 FROM e0))
                 AS n_nodes,
               (SELECT count(*) FROM e0) AS n_edges
        UNION ALL
        SELECT 1,
               (SELECT count(DISTINCT node) FROM
                 (SELECT s1 AS node FROM e1 UNION ALL SELECT s2 FROM e1)),
               (SELECT count(*) FROM e1)
        UNION ALL
        SELECT 2,
               (SELECT count(DISTINCT node) FROM
                 (SELECT s1 AS node FROM e2 UNION ALL SELECT s2 FROM e2)),
               (SELECT count(*) FROM e2)
        UNION ALL
        SELECT 3,
               (SELECT count(DISTINCT node) FROM
                 (SELECT s1 AS node FROM e3 UNION ALL SELECT s2 FROM e3)),
               (SELECT count(*) FROM e3)
        ORDER BY round
    """,
    "q_shortest_path": """
        WITH pe AS (
          SELECT a.p AS s1, b.p AS s2, count(*) AS n_ab
          FROM (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem) a
          JOIN (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem) b
            ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2
          HAVING count(*) >= 2
        ),
        und AS (
          SELECT s1 AS z, s2 AS x, 1.0 / CAST(n_ab AS DOUBLE) AS w
          FROM pe
          UNION ALL
          SELECT s2, s1, 1.0 / CAST(n_ab AS DOUBLE) FROM pe
        ),
        d0 AS (
          SELECT min(s1) AS node, CAST(0.0 AS DOUBLE) AS dist FROM pe
        ),
        r1 AS (
          SELECT u.x AS node, d.dist + u.w AS dist
          FROM d0 d JOIN und u ON u.z = d.node
        ),
        d1 AS (
          SELECT node, min(dist) AS dist
          FROM (SELECT * FROM d0 UNION ALL SELECT * FROM r1)
          GROUP BY node
        ),
        r2 AS (
          SELECT u.x AS node, d.dist + u.w AS dist
          FROM d1 d JOIN und u ON u.z = d.node
        ),
        d2 AS (
          SELECT node, min(dist) AS dist
          FROM (SELECT * FROM d1 UNION ALL SELECT * FROM r2)
          GROUP BY node
        ),
        r3 AS (
          SELECT u.x AS node, d.dist + u.w AS dist
          FROM d2 d JOIN und u ON u.z = d.node
        ),
        d3 AS (
          SELECT node, min(dist) AS dist
          FROM (SELECT * FROM d2 UNION ALL SELECT * FROM r3)
          GROUP BY node
        )
        SELECT node, floor(dist * 10000 + 0.5) / 10000 AS dist
        FROM d3 ORDER BY dist, node LIMIT 20
    """,
    "q_graph_bfs": f"""
        WITH RECURSIVE {_PART_EDGES},
        und AS (
          SELECT s1 AS z, s2 AS x FROM pe
          UNION ALL SELECT s2, s1 FROM pe
        ),
        seed AS (SELECT min(s1) AS node FROM pe),
        walk AS (
          SELECT node, 0 AS level FROM seed
          UNION
          SELECT u.x AS node, w.level + 1 AS level
          FROM walk w JOIN und u ON u.z = w.node
          WHERE w.level < 3
        ),
        d AS (SELECT node, min(level) AS level FROM walk GROUP BY node)
        SELECT level, count(*) AS n_nodes,
               CAST(sum(node) AS BIGINT) AS sum_nodes
        FROM d GROUP BY level ORDER BY level
    """,
    "q_assortativity": f"""
        WITH {_PART_EDGES},
        und AS (
          SELECT s1 AS u, s2 AS v FROM pe
          UNION ALL SELECT s2, s1 FROM pe
        ),
        deg AS (SELECT u, count(*) AS deg FROM und GROUP BY u),
        j AS (
          SELECT du.deg AS dx, dv.deg AS dy
          FROM und
          JOIN deg du ON und.u = du.u
          JOIN deg dv ON und.v = dv.u
        ),
        a AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dx) AS BIGINT) AS sx,
                 CAST(sum(dy) AS BIGINT) AS sy,
                 CAST(sum(dx * dy) AS BIGINT) AS sxy,
                 CAST(sum(dx * dx) AS BIGINT) AS sxx,
                 CAST(sum(dy * dy) AS BIGINT) AS syy
          FROM j
        )
        SELECT n AS n_directed_edges,
               CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                     AND CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN
                 floor(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE))
                       * 10000 + 0.5) / 10000
               END AS assortativity
        FROM a
    """,
    "q_clustering_coefficient": f"""
        WITH {_PART_EDGES},
        tri AS (
          SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
          FROM pe e1
          JOIN pe e2 ON e1.s2 = e2.s1
          JOIN pe e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
        ),
        tcnt AS (
          SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
          FROM (SELECT unnest([a, b, c]) AS node FROM tri)
          GROUP BY node
        ),
        deg AS (
          SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT s1 AS node FROM pe UNION ALL SELECT s2 FROM pe
          ) GROUP BY node
        )
        SELECT deg.node AS node, deg,
               CAST(coalesce(n_triangles, 0) AS BIGINT) AS n_triangles,
               floor(2.0 * CAST(coalesce(n_triangles, 0) AS DOUBLE)
                     / (CAST(deg AS DOUBLE) * (CAST(deg AS DOUBLE) - 1.0))
                     * 10000 + 0.5) / 10000 AS cc
        FROM deg LEFT JOIN tcnt ON deg.node = tcnt.node
        WHERE deg >= 2
        ORDER BY cc DESC, deg DESC, deg.node LIMIT 20
    """,
    "q_triangle_count": f"""
        WITH {_PART_EDGES},
        tri AS (
          SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
          FROM pe e1
          JOIN pe e2 ON e1.s2 = e2.s1
          JOIN pe e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
        ),
        corners AS (
          SELECT unnest([a, b, c]) AS node FROM tri
        )
        SELECT node, count(*) AS n_triangles
        FROM corners GROUP BY node
        ORDER BY n_triangles DESC, node LIMIT 20
    """,
    "q_link_prediction": f"""
        WITH {_PART_EDGES},
        und AS (
          SELECT s1 AS z, s2 AS x FROM pe
          UNION ALL SELECT s2, s1 FROM pe
        ),
        {_cap_cte("und", "z", "x", 64)},
        deg AS (SELECT z, count(*) AS deg FROM und_capped GROUP BY z),
        wedges AS (
          SELECT a.z AS z, a.x AS u, b.x AS v
          FROM und_capped a
          JOIN und_capped b ON a.z = b.z AND a.x < b.x
        ),
        scored AS (
          SELECT u, v, count(*) AS n_common,
                 sum(1.0 / ln(d.deg)) AS aa_raw
          FROM wedges w JOIN deg d ON w.z = d.z
          GROUP BY u, v
          HAVING count(*) >= 2
        )
        SELECT u, v, n_common,
               floor(aa_raw * 10000 + 0.5) / 10000 AS aa
        FROM scored s
        WHERE NOT EXISTS (
          SELECT 1 FROM pe WHERE pe.s1 = s.u AND pe.s2 = s.v
        )
        ORDER BY aa DESC, u, v LIMIT 20
    """,
    "q_supplier_similarity": f"""
        WITH {_PR_EDGES},
        {_cap_cte("edges", "c", "s", 64)},
        deg AS (
          SELECT s, count(*) AS deg FROM edges_capped GROUP BY s
        ),
        pairs AS (
          SELECT a.s AS s1, b.s AS s2, count(*) AS n_ab
          FROM edges_capped a
          JOIN edges_capped b ON a.c = b.c AND a.s < b.s
          GROUP BY a.s, b.s
          HAVING count(*) >= 5
        )
        SELECT s1, s2, n_ab,
               floor(n_ab / (d1.deg + d2.deg - n_ab) * 10000 + 0.5)
                 / 10000 AS jaccard
        FROM pairs
        JOIN deg d1 ON pairs.s1 = d1.s
        JOIN deg d2 ON pairs.s2 = d2.s
        ORDER BY jaccard DESC, s1, s2 LIMIT 20
    """,
    "q_degree_distribution": f"""
        WITH {_PR_EDGES},
        deg AS (SELECT c, count(*) AS degree FROM edges GROUP BY c)
        SELECT degree, count(*) AS n_nodes
        FROM deg GROUP BY degree ORDER BY degree
    """,
    "q_pagerank_converged": _pagerank_converged_sql(),
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
