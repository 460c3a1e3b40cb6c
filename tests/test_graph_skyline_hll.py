"""Invariants for the round-7 late additions: PageRank mass
conservation on a hand-built graph, skyline2d vs a brute-force
dominance check (including the blocked path with many blocks), and HLL
register/estimate properties (mergeability by max, no-distinct-needed,
exact small-range behavior)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.operators.graph import (
    copurchase_edges,
    degree_histogram,
    pagerank_bipartite,
)
from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
    hll_estimate,
    hll_registers,
)
from data_wrangle_openstreetmaps_data_spark.operators.topk import skyline2d


def _edges(spark):
    # K2,2 plus a pendant supplier: C1-{S1,S2}, C2-{S1,S2}, C3-{S3}
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 3)]
    return spark.createDataFrame(rows, ["custkey", "suppkey"])


def test_pagerank_conserves_mass_and_is_uniform_on_symmetric_graph(spark):
    ranks = pagerank_bipartite(_edges(spark), iterations=2).collect()
    total = sum(r["r"] for r in ranks)
    assert math.isclose(total, 1.0, rel_tol=1e-9), total
    by_node = {r["node"]: r["r"] for r in ranks}
    # the K2,2 component is vertex-transitive within each side AND the
    # two sides are exchangeable (all degrees 2), so its 4 nodes tie
    k22 = [by_node[n] for n in ("C:1", "C:2", "S:1", "S:2")]
    assert max(k22) - min(k22) < 1e-12, k22
    # the pendant pair exchanges all its mass internally; C3 and S3
    # mirror each other
    assert math.isclose(by_node["C:3"], by_node["S:3"], rel_tol=1e-12)


def test_degree_histogram(spark):
    hist = {
        r["degree"]: r["n_nodes"]
        for r in degree_histogram(_edges(spark), "custkey").collect()
    }
    assert hist == {2: 2, 1: 1}


def test_copurchase_edges_dedups(spark):
    li = spark.createDataFrame(
        [(10, 5), (10, 5), (10, 6), (11, 5)],
        ["l_orderkey", "l_suppkey"],
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1)], ["o_orderkey", "o_custkey"]
    )
    got = sorted(
        (r["custkey"], r["suppkey"])
        for r in copurchase_edges(li, orders).collect()
    )
    assert got == [(1, 5), (1, 6)]


def _brute_skyline(pts):
    out = []
    for x, y in pts:
        dominated = any(
            (x2 >= x and y2 >= y) and (x2 > x or y2 > y) for x2, y2 in pts
        )
        if not dominated:
            out.append((x, y))
    return sorted(set(out))


def test_skyline2d_matches_bruteforce(spark):
    # deterministic pseudo-random distinct points incl. x-ties
    pts = sorted(
        {((i * 37) % 101, (i * 53) % 97) for i in range(400)}
    )
    df = spark.createDataFrame(pts, ["x", "y"])
    for nb in (1, 7):  # single block AND genuinely blocked
        got = sorted(
            (r["x"], r["y"])
            for r in skyline2d(df, "x", "y", n_blocks=nb).collect()
        )
        assert got == _brute_skyline(pts), (nb, got)


def test_skyline2d_keeps_one_representative_per_frontier_point(spark):
    df = spark.createDataFrame(
        [(5, 5), (3, 9), (9, 1)], ["x", "y"]
    )
    got = sorted((r["x"], r["y"]) for r in skyline2d(df, "x", "y").collect())
    assert got == [(3, 9), (5, 5), (9, 1)]


def test_hll_registers_merge_by_max_and_skip_distinct(spark):
    df = spark.createDataFrame(
        [(i % 50,) for i in range(500)], ["k"]
    )
    full = hll_registers(df, "k", p=4)
    # duplicates never change registers
    dedup = hll_registers(df.distinct(), "k", p=4)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, dedup.collect())
    )
    # split + merge-by-max == direct
    a = hll_registers(df.filter(F.col("k") % 2 == 0), "k", p=4)
    b = hll_registers(df.filter(F.col("k") % 2 == 1), "k", p=4)
    merged = (
        a.unionByName(b).groupBy("bucket").agg(F.max("m").alias("m"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_hll_estimate_within_expected_error(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], ["k"])
    est = hll_estimate(hll_registers(df, "k", p=8), p=8).collect()[0]
    # standard error ~1.04/sqrt(256) ≈ 6.5%; allow 4 sigma
    assert abs(est["est"] - n) / n < 0.26, est["est"]


# ---------------------------------------------------------------------------
# Triangle counting + Adamic-Adar (degree-oriented compact-forward)
# ---------------------------------------------------------------------------

from itertools import combinations

from data_wrangle_openstreetmaps_data_spark.operators.graph import (
    adamic_adar,
    triangle_counts,
)


def _und_edges(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], ["s1", "s2"]
    )


def _brute_triangles(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    nodes = sorted({n for e in es for n in e})
    counts: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_counts_matches_bruteforce(spark):
    pairs = [
        (1, 2), (1, 3), (2, 3),          # triangle
        (2, 4), (3, 4),                  # second triangle via (2,3)
        (5, 6), (6, 7), (5, 7), (7, 8),  # third triangle + pendant
    ]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_und_edges(spark, pairs)).collect()
    }
    assert got == _brute_triangles(pairs)


def test_triangle_counts_skewed_hub_star_has_no_spurious_triangles(spark):
    # star around a hub contributes NO triangles; only the one closed
    # wedge (1, 2, 100) counts — the degree orientation must not blow
    # up or double-count through the hub
    pairs = [(100, i) for i in range(1, 21)] + [(1, 2)]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_und_edges(spark, pairs)).collect()
    }
    assert got == {1: 1, 2: 1, 100: 1}


def test_adamic_adar_square(spark):
    import math

    # 4-cycle: the two diagonals are the only predictions, each scored
    # by two degree-2 common neighbors
    pairs = [(1, 2), (2, 3), (3, 4), (1, 4)]
    got = {
        (r["u"], r["v"]): (r["n_common"], r["aa_score"])
        for r in adamic_adar(_und_edges(spark, pairs), min_common=2).collect()
    }
    assert set(got) == {(1, 3), (2, 4)}
    for n_common, score in got.values():
        assert n_common == 2
        assert math.isclose(score, 2.0 / math.log(2.0), rel_tol=1e-12)


def test_adamic_adar_excludes_adjacent_pairs(spark):
    import math

    # adding the (1,3) diagonal makes that pair adjacent → only (2,4)
    # remains, now scored through two degree-3 neighbors
    pairs = [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)]
    got = {
        (r["u"], r["v"]): r["aa_score"]
        for r in adamic_adar(_und_edges(spark, pairs), min_common=2).collect()
    }
    assert set(got) == {(2, 4)}
    assert math.isclose(got[(2, 4)], 2.0 / math.log(3.0), rel_tol=1e-12)
