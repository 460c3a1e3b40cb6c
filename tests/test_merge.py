"""merge_upsert (MERGE INTO semantics) unit tests: matched rows replaced
wholesale — including legitimate NULLs in the change row — unmatched
changes insert, untouched snapshot rows pass through."""

from __future__ import annotations

from data_wrangle_openstreetmaps_data_spark.operators.join import merge_upsert


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_upsert_update_insert_passthrough(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "s", "v"],
    )
    chg = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)],  # update k=2, insert k=4
        ["k", "s", "v"],
    )
    got = _rows(merge_upsert(snap, chg, "k"))
    assert got == [
        (1, "a", 10.0),
        (2, "B", 200.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
    ]


def test_merge_upsert_change_row_null_wins(spark):
    """A change row's NULL must overwrite the snapshot value (wholesale
    row replacement) — the per-column-coalesce anti-pattern would leak
    the old value through."""
    snap = spark.createDataFrame([(1, "old", 1.0)], ["k", "s", "v"])
    chg = spark.createDataFrame(
        [(1, None, 2.0)], schema="k bigint, s string, v double"
    )
    got = _rows(merge_upsert(snap, chg, "k"))
    assert got == [(1, None, 2.0)]


def test_merge_upsert_idempotent_on_same_change(spark):
    snap = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], ["k", "s", "v"])
    chg = spark.createDataFrame([(2, "B", 20.0)], ["k", "s", "v"])
    once = merge_upsert(snap, chg, "k")
    twice = merge_upsert(once, chg, "k")
    assert _rows(once) == _rows(twice)
