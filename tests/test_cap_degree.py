"""graph.cap_degree: the deterministic whale-key cap. Properties:
every key ends at degree <= cap, under-cap keys keep ALL their edges,
the choice is deterministic (same edges in -> same edges out), and the
kept set matches a driver-side replay of the identical band+rank rule."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.operators.graph import (
    cap_degree,
    copurchase_edges,
)
from tests.conftest import SF_SMALL

CAP = 8


def _edges(spark):
    return copurchase_edges(
        table(spark, SF_SMALL, "lineitem"), table(spark, SF_SMALL, "orders")
    ).localCheckpoint(eager=True)


def _h(c, s):
    return int(hashlib.md5(f"{c}|{s}".encode()).hexdigest()[:15], 16)


def test_cap_bounds_every_key_and_keeps_small_keys(spark):
    edges = _edges(spark)
    capped = cap_degree(edges, "custkey", "suppkey", cap=CAP)
    deg_before = {
        r["custkey"]: r["n"]
        for r in edges.groupBy("custkey").agg(F.count("*").alias("n")).collect()
    }
    deg_after = {
        r["custkey"]: r["n"]
        for r in capped.groupBy("custkey").agg(F.count("*").alias("n")).collect()
    }
    assert max(deg_after.values()) <= CAP
    for k, d in deg_before.items():
        if d <= CAP:
            assert deg_after.get(k) == d, k
        else:
            assert deg_after.get(k) == CAP, k


def test_cap_matches_python_replay_of_the_rule(spark):
    edges = _edges(spark)
    got = {
        (r["custkey"], r["suppkey"])
        for r in cap_degree(edges, "custkey", "suppkey", cap=CAP).collect()
    }
    by_key: dict[int, list[int]] = {}
    for r in edges.collect():
        by_key.setdefault(r["custkey"], []).append(r["suppkey"])
    want = set()
    for c, ss in by_key.items():
        deg = len(ss)
        cands = []
        for s in ss:
            hv = _h(c, s)
            if deg <= CAP or hv < int(4 * CAP * 2.0**60 / deg):
                cands.append((hv, s))
        for _, s in sorted(cands)[:CAP]:
            want.add((c, s))
    assert got == want


def test_cap_is_deterministic(spark):
    edges = _edges(spark)
    a = sorted(
        (r["custkey"], r["suppkey"])
        for r in cap_degree(
            edges.repartition(13), "custkey", "suppkey", cap=CAP
        ).collect()
    )
    b = sorted(
        (r["custkey"], r["suppkey"])
        for r in cap_degree(
            edges.repartition(3), "custkey", "suppkey", cap=CAP
        ).collect()
    )
    assert a == b
