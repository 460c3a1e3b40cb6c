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
