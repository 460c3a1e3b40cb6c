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


def copurchase_part_edges(
    lineitem: DataFrame, min_orders: int = 2, keep_weight: bool = False
) -> DataFrame:
    """Part-part co-purchase edges: (s1, s2) with s1 < s2 iff the two
    parts appear together in at least ``min_orders`` distinct orders.
    Pairing keys on the ORDER (C(basket, 2) pairs per order — bounded
    by basket size, the same argument as the market-basket query, never
    an item-item cross product), and the ``min_orders`` support cut is
    what keeps the projected graph sparse: unlike the customer↔supplier
    projection (near-complete at any scale), repeated co-purchase is
    rare, so |E| stays O(|parts|) as the fact table grows.
    ``keep_weight`` retains the co-purchase count ``n_ab`` (the edge
    strength the weighted traversals invert into a distance)."""
    e = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = e.select("o", F.col("p").alias("s1"))
    b = e.select("o", F.col("p").alias("s2"))
    out = (
        a.join(b, "o")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_orders)
    )
    return out if keep_weight else out.select("s1", "s2")


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts via the degree-oriented
    (compact-forward) algorithm: orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, build wedges from
    pairs of out-edges of the same source, and close each wedge against
    the oriented edge set. Orientation bounds every node's out-degree
    by O(√|E|) regardless of skew — a celebrity node of degree 10⁶
    contributes wedges only through its (few) higher-ranked neighbors,
    so the wedge self-join never explodes the way a naive id-ordered
    wedge join does on a skewed graph. All three steps are key-equality
    shuffles; degrees ride broadcasts.

    ``edges``: distinct undirected (s1, s2) with s1 < s2.
    Returns (node, n_triangles) for nodes in ≥1 triangle."""
    und = edges.select(
        F.col("s1").alias("u"), F.col("s2").alias("v")
    ).unionByName(edges.select(F.col("s2").alias("u"), F.col("s1").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v"))
    ranked = und.join(F.broadcast(deg), "u").join(F.broadcast(dv), "v")
    # u → v iff (deg_u, u) < (deg_v, v): a strict total order, so each
    # undirected edge survives exactly once
    oriented = ranked.filter(
        F.struct(F.col("deg"), F.col("u"))
        < F.struct(F.col("deg_v"), F.col("v"))
    ).select("u", "v", "deg_v")
    o1 = oriented.select(
        "u", F.col("v").alias("x"), F.col("deg_v").alias("dx")
    )
    o2 = oriented.select(
        "u", F.col("v").alias("y"), F.col("deg_v").alias("dy")
    )
    # wedge (u; x, y) with x ≺ y in rank order — the closing edge, if it
    # exists, is then oriented exactly x → y
    wedges = o1.join(o2, "u").filter(
        F.struct(F.col("dx"), F.col("x")) < F.struct(F.col("dy"), F.col("y"))
    )
    closes = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closes, ["x", "y"]).select("u", "x", "y")
    corners = tri.select(
        F.explode(F.array("u", "x", "y")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def adamic_adar(
    edges: DataFrame, min_common: int = 2, cap: int | None = None
) -> DataFrame:
    """Adamic-Adar link prediction over an undirected graph: for every
    NON-adjacent pair (u, v) with ≥ ``min_common`` common neighbors,
    score = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg(z)) — rare shared neighbors
    weigh more than hubs. Candidate pairs come from a wedge join keyed
    on the shared neighbor z (each z contributes C(deg_z, 2) pairs);
    existing edges leave via a broadcast-able anti-join; degrees ride a
    broadcast. Wedge centers always have deg ≥ 2, so ln(deg) is never 0.

    ``cap`` (r9 verdict item 2): bound every wedge center's fan-out by
    ``cap_degree`` on the undirected adjacency BEFORE the wedge
    self-join, so a hub z contributes C(cap, 2) pairs instead of
    C(deg_z, 2). The score is then DEFINED on the capped graph — the
    degree in 1/ln(deg) is the capped degree, a documented estimator,
    not a silent approximation — and callers must replicate the
    identical cap rule in any cross-engine oracle. Pick cap above the
    bulk degree (whales-only regime, see STRESS_r09): below it the cap
    re-weights every key and becomes a uniform sparsifier.

    Returns (u, v, n_common, aa_score) with u < v, score as a raw
    double (callers round for cross-engine output)."""
    und = edges.select(
        F.col("s1").alias("z"), F.col("s2").alias("x")
    ).unionByName(edges.select(F.col("s2").alias("z"), F.col("s1").alias("x")))
    if cap is not None:
        und = cap_degree(und, "z", "x", cap=cap)
    deg = und.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    a = und.select("z", F.col("x").alias("u"))
    b = und.select("z", F.col("x").alias("v"))
    wedges = a.join(b, "z").filter(F.col("u") < F.col("v"))
    scored = (
        wedges.join(F.broadcast(deg), "z")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.lit(1.0) / F.log(F.col("deg"))).alias("aa_score"),
        )
        .filter(F.col("n_common") >= min_common)
    )
    return scored.join(
        edges,
        (F.col("u") == F.col("s1")) & (F.col("v") == F.col("s2")),
        "left_anti",
    )


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


def pagerank_converged(
    edges: DataFrame,
    damping_num: int = 1,
    damping_den: int = 2,
    scale: int = 10**12,
    max_iters: int = 48,
) -> DataFrame:
    """CONVERGENT PageRank on the undirected bipartite co-purchase graph
    (r10 verdict item 7): a driver-side loop with an L1-residual
    stopping rule and a per-iteration ``localCheckpoint`` (lineage
    truncation — without it each iteration's plan re-expands every prior
    iteration's joins, the lesson already learned for connected
    components).

    The update runs on a FIXED-POINT INTEGER GRID (``scale`` units of
    rank mass), with dyadic damping d = damping_num/damping_den = ½ by
    default:

        r₀(x)    = scale div N
        rₖ₊₁(x)  = (scale·(den−num)) div (den·N)
                   + (num · Σ_{y~x} (rₖ(y) div deg(y))) div den

    Every operation is exact BIGINT arithmetic — sums are associative,
    so the iterate is BIT-IDENTICAL across engines, partitionings, and
    summation orders (the float-sum-free discipline: a float Σ r/deg has
    no defined order cross-engine). The loop early-exits when the L1
    residual Σ|rₖ₊₁−rₖ| is EXACTLY zero; an integer fixed point is
    absorbing, so an oracle that unrolls all ``max_iters`` iterations
    produces the identical vector whether or not Spark exited early —
    and if the floor jitter sustains a ±1-unit cycle instead, both
    engines simply run the same deterministic recurrence to the same
    ``max_iters``-th iterate. Correctness never depends on convergence.
    Dyadic ½ damping converges the grid in ≈ log2(scale) ≈ 40
    iterations (0.85 would need ~130 — the reason for the ½ default).

    Per iteration: two edge-keyed shuffles (contributions into each
    side) with degrees on broadcasts; one bounded driver action (the
    residual scalar). Undirected bipartite ⇒ no dangling nodes.

    Returns (node, rank_u BIGINT, n_iters): the final grid ranks with
    'C:'/'S:' labels and the number of iterations the loop ran."""
    edges = edges.localCheckpoint(eager=True)
    deg_c = edges.groupBy("custkey").agg(F.count(F.lit(1)).alias("deg"))
    deg_s = edges.groupBy("suppkey").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = deg_c.count() + deg_s.count()  # one bounded driver scalar
    num, den = damping_num, damping_den
    r0 = scale // n_nodes
    base = (scale * (den - num)) // (den * n_nodes)
    r_c = deg_c.select(
        "custkey", F.lit(r0).cast("long").alias("r"), "deg"
    ).localCheckpoint(eager=True)
    r_s = deg_s.select(
        "suppkey", F.lit(r0).cast("long").alias("r"), "deg"
    ).localCheckpoint(eager=True)
    iters = 0
    for _ in range(max_iters):
        new_s = (
            edges.join(r_c.withColumnRenamed("r", "rc"), "custkey")
            .select("suppkey", F.expr("rc div deg").alias("contrib"))
            .groupBy("suppkey")
            .agg(F.sum("contrib").alias("acc"))
            .join(F.broadcast(deg_s), "suppkey")
            .select(
                "suppkey",
                (
                    F.lit(base)
                    + F.expr(f"({num} * acc) div {den}")
                ).cast("long").alias("r"),
                "deg",
            )
            .localCheckpoint(eager=True)
        )
        new_c = (
            edges.join(r_s.withColumnRenamed("r", "rs"), "suppkey")
            .select("custkey", F.expr("rs div deg").alias("contrib"))
            .groupBy("custkey")
            .agg(F.sum("contrib").alias("acc"))
            .join(F.broadcast(deg_c), "custkey")
            .select(
                "custkey",
                (
                    F.lit(base)
                    + F.expr(f"({num} * acc) div {den}")
                ).cast("long").alias("r"),
                "deg",
            )
            .localCheckpoint(eager=True)
        )
        iters += 1
        resid = (
            new_c.select(F.col("custkey").alias("k"), F.col("r").alias("rn"))
            .join(
                r_c.select(F.col("custkey").alias("k"), F.col("r").alias("ro")),
                "k",
            )
            .unionByName(
                new_s.select(
                    F.col("suppkey").alias("k"), F.col("r").alias("rn")
                ).join(
                    r_s.select(
                        F.col("suppkey").alias("k"), F.col("r").alias("ro")
                    ),
                    "k",
                )
            )
            .agg(F.sum(F.abs(F.col("rn") - F.col("ro"))).alias("l1"))
            .collect()[0]["l1"]
        )
        r_c, r_s = new_c, new_s
        if resid == 0:
            break
    return (
        r_c.select(
            F.concat(F.lit("C:"), F.col("custkey").cast("string")).alias(
                "node"
            ),
            F.col("r").alias("rank_u"),
        )
        .unionByName(
            r_s.select(
                F.concat(
                    F.lit("S:"), F.col("suppkey").cast("string")
                ).alias("node"),
                F.col("r").alias("rank_u"),
            )
        )
        .withColumn("n_iters", F.lit(iters))
    )


def cap_degree(
    edges: DataFrame,
    key_col: str,
    val_col: str,
    cap: int,
    band_factor: int = 4,
) -> DataFrame:
    """Deterministic whale-key degree cap for common-neighbor joins
    (the cap the r8 verdict asked to move from docstring promise to
    code): keys with degree > ``cap`` keep only the ``cap`` neighbors
    with the smallest portable hash h = int(md5(key|val)[:15], 16) —
    a fixed min-hash-k sample, reproducible in any engine.

    Two-stage so no task ever sorts a whale key's full edge list:

    1. degree count (linear agg), then a BAND pre-filter: edges of
       over-cap keys survive only if h < floor(band_factor·cap·2^60 /
       deg) — expected band_factor·cap survivors per key regardless of
       degree (2^60 = the h value space), under-selection odds
       e^-Ω(cap) by Chernoff. All arithmetic is one IEEE-double
       multiply+divide+floor, bit-identical across engines, and the
       ORACLE replicates the identical two-stage rule, so both engines
       agree even in the astronomically-unlikely under-selection case
       (the rule, not "the cap-th order statistic", is the spec).
    2. exact row_number over the ~band_factor·cap survivors per key,
       keep rank <= cap (ties on h broken by val).

    A deg-10⁴ whale key thus contributes C(cap,2) pairs to a
    downstream self-join instead of C(10⁴,2) — see the STRESS_r09
    whale entry for the measured bound + recall accounting."""
    from pyspark.sql import Window

    deg = edges.groupBy(key_col).agg(F.count(F.lit(1)).alias("_deg"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col(key_col).cast("string"),
                    F.col(val_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    bound = F.floor(
        F.lit(float(band_factor * cap)) * F.pow(F.lit(2.0), F.lit(60.0))
        / F.col("_deg")
    ).cast("long")
    banded = (
        edges.join(deg, key_col)
        .withColumn("_h", h)
        .filter((F.col("_deg") <= cap) | (F.col("_h") < bound))
    )
    w = Window.partitionBy(key_col).orderBy("_h", val_col)
    return (
        banded.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_deg", "_h", "_rk")
    )
