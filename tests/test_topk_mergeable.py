"""q_topk_mergeable bound math on a PLANTED corpus (the oracle proves
cross-engine agreement; this pins the GUARANTEE itself on a case with
hand-computable bounds): a whale kept in every shard gets lb = ub =
true count; a sub-threshold user dropped everywhere still has its true
count inside [lb, ub] via the err terms."""

from __future__ import annotations

import os

import pytest

from data_wrangle_openstreetmaps_data_spark.plans import queries as Q

TMP = os.path.join(os.path.dirname(__file__), "..", ".tmp", "topkm")


@pytest.fixture(scope="module")
def planted_dir(spark):
    os.makedirs(TMP, exist_ok=True)
    rows = []
    eid = 0

    def emit(user, n):
        nonlocal eid
        for _ in range(n):
            rows.append((eid, user))
            eid += 1

    # event_id increments round-robin the 8 shards (event_id % 8), so:
    # whale user 1: 160 events → 20 per shard, kept (top-5) everywhere
    emit(1, 160)
    # mid users 2..5: 40 each → 5/shard, filling the per-shard top-5
    # beside the whale (a 5th mid user would tie out everywhere on the
    # user_id tiebreak and never become a candidate — the k boundary)
    for u in range(2, 6):
        emit(u, 40)
    # tail users 10..29: 8 each → ~1/shard, dropped in every shard
    for u in range(10, 30):
        emit(u, 8)
    spark.createDataFrame(rows, ["event_id", "user_id"]).coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(TMP, "events.parquet"))
    return TMP


def test_bounds_and_whale_exactness(spark, planted_dir):
    got = {
        r["user_id"]: r
        for r in Q.REGISTRY["q_topk_mergeable"]
        .spark(spark, planted_dir)
        .collect()
    }
    # every reported row's guarantee holds
    for r in got.values():
        assert r["contained"] == 1, r
        assert r["lb"] <= r["true_cnt"] <= r["ub"], r
    # the whale is kept in all 8 shards: bounds collapse to the truth
    w = got[1]
    assert (w["lb"], w["ub"], w["true_cnt"]) == (160, 160, 160)
    # mid users are kept wherever they appear → lb equals truth too,
    # ub may exceed it only via shards where they were absent/dropped
    for u in range(2, 6):
        assert got[u]["true_cnt"] == 40
        assert got[u]["lb"] <= 40 <= got[u]["ub"]
