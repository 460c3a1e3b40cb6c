"""bottom_k (blocked min-k): the two-phase rank must equal the naive
global-sort min-k on every group, including groups smaller than k and
duplicate order values."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.operators.topk import bottom_k


def _naive_bottom_k(rows, key, k):
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    out = set()
    for g, vs in by_g.items():
        for v in sorted(vs)[:k]:
            out.add((g, v))
    return out


def test_bottom_k_matches_naive_grouped(spark):
    rows = [(f"g{i % 3}", (i * 37) % 101) for i in range(300)]
    df = spark.createDataFrame(rows, ["g", "v"]).distinct()
    got = {
        (r["g"], r["v"])
        for r in bottom_k(df, ["g"], "v", 7, n_blocks=4).collect()
    }
    want = _naive_bottom_k(
        {(r["g"], r["v"]) for r in df.collect()}, "g", 7
    )
    assert got == want


def test_bottom_k_global_group_and_small_groups(spark):
    # one global group (KMV set-ops shape) + fewer rows than k
    df = spark.createDataFrame([(v,) for v in (5, 3, 9, 1)], ["v"])
    got = sorted(r["v"] for r in bottom_k(df, [], "v", 10).collect())
    assert got == [1, 3, 5, 9]
    big = spark.createDataFrame([(v,) for v in range(200)], ["v"])
    got = sorted(r["v"] for r in bottom_k(big, [], "v", 16).collect())
    assert got == list(range(16))


def test_bottom_k_duplicate_values_deterministic(spark):
    # duplicates straddling the k boundary: payload tiebreak keeps the
    # selection a deterministic set
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "d")]
    df = spark.createDataFrame(rows, ["v", "tag"])
    got = sorted(
        (r["v"], r["tag"]) for r in bottom_k(df, [], "v", 2).collect()
    )
    assert got == [(1, "a"), (1, "b")]
