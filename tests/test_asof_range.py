"""As-of join and range join edge semantics."""

from __future__ import annotations

from data_wrangle_openstreetmaps_data_spark.operators import join as join_ops


def test_asof_inclusive_and_no_future_match(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 50, "d")],
        ["k", "ts", "payload"],
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 60, 600.0)],
        ["k", "ts", "state"],
    )
    got = {
        r["payload"]: (r["matched_time"], r["matched_state"])
        for r in join_ops.asof_join(left, right, by="k").collect()
    }
    assert got["a"] == (10, 100.0)     # inclusive: rt == lt matches
    assert got["b"] == (15, 150.0)     # latest at-or-before
    assert got["c"] == (None, None)    # nothing before → null (left join)
    assert got["d"] == (None, None)    # right exists only in the future


def test_asof_forward_inclusive_and_no_past_match(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 12, "b"), (1, 20, "c"), (2, 70, "d")],
        ["k", "ts", "payload"],
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 60, 600.0)],
        ["k", "ts", "state"],
    )
    got = {
        r["payload"]: (r["matched_time"], r["matched_state"])
        for r in join_ops.asof_join(
            left, right, by="k", direction="forward"
        ).collect()
    }
    assert got["a"] == (10, 100.0)     # inclusive: rt == lt matches
    assert got["b"] == (15, 150.0)     # earliest at-or-after
    assert got["c"] == (None, None)    # nothing after → null (left join)
    assert got["d"] == (None, None)    # right exists only in the past


def test_asof_invalid_direction_rejected(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, "a")], ["k", "ts", "payload"])
    right = spark.createDataFrame([(1, 10, 1.0)], ["k", "ts", "state"])
    with pytest.raises(ValueError, match="direction"):
        join_ops.asof_join(left, right, by="k", direction="sideways")


def test_asof_rejects_reserved_output_names(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, 0)], ["k", "ts", "matched_time"])
    right = spark.createDataFrame([(1, 10, 1.0)], ["k", "ts", "state"])
    with pytest.raises(ValueError, match="matched_time"):
        join_ops.asof_join(left, right, by="k")
    left2 = spark.createDataFrame([(1, 10, 0.0)], ["k", "ts", "matched_state"])
    with pytest.raises(ValueError, match="matched_state"):
        join_ops.asof_join(left2, right, by="k")


def test_range_join_inverted_interval_is_empty(spark):
    """hi <= lo describes an empty interval; it must match nothing and must
    NOT explode into a descending bucket sequence."""
    left = spark.createDataFrame([(0, 5.0), (1, 500.0)], ["row_id", "value"])
    intervals = spark.createDataFrame(
        [(0, 1000.0, 0.0), (1, 7.0, 7.0), (2, 0.0, 10.0)],
        ["interval_id", "lo", "hi"],
    )
    rows = join_ops.range_join(left, intervals, "value").collect()
    assert {(r["row_id"], r["interval_id"]) for r in rows} == {(0, 2)}


def test_range_join_bucketed_equals_naive(spark):
    left = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 5.0, 9.99, 10.0, 25.0, 99.0])],
        ["row_id", "value"],
    )
    intervals = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 5.0, 30.0), (2, 90.0, 100.0)],
        ["interval_id", "lo", "hi"],
    )
    got = {
        (r["row_id"], r["interval_id"])
        for r in join_ops.range_join(left, intervals, "value").collect()
    }
    naive = {
        (l["row_id"], i["interval_id"])
        for l in left.collect()
        for i in intervals.collect()
        if i["lo"] <= l["value"] < i["hi"]
    }
    assert got == naive
    # boundary semantics: lo inclusive, hi exclusive
    assert (3, 0) not in got and (3, 1) in got


def test_interval_overlap_join_matches_bruteforce(spark):
    # integer-domain intervals, lengths from sub-bucket to multi-bucket
    a = spark.createDataFrame(
        [(i, (i * 37) % 200, (i * 37) % 200 + (i * 13) % 90)
         for i in range(40)],
        ["a_id", "a_lo", "a_hi"],
    )
    b = spark.createDataFrame(
        [(j, (j * 53) % 210, (j * 53) % 210 + (j * 7) % 60)
         for j in range(30)],
        ["b_id", "b_lo", "b_hi"],
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in join_ops.interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket=32
        ).collect()
    }
    naive = {
        (x["a_id"], y["b_id"])
        for x in a.collect()
        for y in b.collect()
        if x["a_lo"] <= y["b_hi"] and y["b_lo"] <= x["a_hi"]
    }
    assert got == naive
    # closed-interval boundary: touching endpoints overlap
    ta = spark.createDataFrame([(1, 0, 10)], ["a_id", "a_lo", "a_hi"])
    tb = spark.createDataFrame([(2, 10, 20)], ["b_id", "b_lo", "b_hi"])
    touch = join_ops.interval_overlap_join(
        ta, tb, "a_lo", "a_hi", "b_lo", "b_hi", bucket=7
    ).collect()
    assert len(touch) == 1
