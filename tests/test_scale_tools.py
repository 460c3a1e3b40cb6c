"""Scale-tooling tests: salted join equivalence, approximate distinct
accuracy, bucketed join shuffle elimination, XML sample write-back."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.operators import audit, skew
from data_wrangle_openstreetmaps_data_spark.operators.sample import every_nth
from data_wrangle_openstreetmaps_data_spark.plans import bucketing
from data_wrangle_openstreetmaps_data_spark.sources import osm
from tests.conftest import SF_SMALL

TMP = os.path.join(os.path.dirname(__file__), "..", ".tmp")


def test_salted_join_equals_plain_join(spark):
    orders = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    customer = table(spark, SF_SMALL, "customer").select("c_custkey", "c_nationkey")
    plain = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    salted = skew.salted_join(
        orders, customer.withColumnRenamed("c_custkey", "o_custkey"),
        on="o_custkey", salt_buckets=8,
    )
    assert salted.count() == plain.count()
    p = {tuple(r) for r in plain.collect()}
    s = {tuple(r) for r in salted.collect()}
    assert p == s


def test_salted_join_map_column_and_salt_cols(spark):
    """Default salt source skips unhashable map columns; explicit salt_cols
    are validated against the big frame."""
    big = spark.createDataFrame(
        [(1, {"a": "x"}), (1, {"b": "y"}), (2, {"c": "z"})], ["k", "tags"]
    )
    small = spark.createDataFrame([(1, "one"), (2, "two")], ["k", "name"])
    got = skew.salted_join(big, small, on="k", salt_buckets=4)
    assert got.count() == 3  # map column didn't break the salt hash
    got2 = skew.salted_join(big, small, on="k", salt_buckets=4, salt_cols=["k"])
    assert got2.count() == 3
    with pytest.raises(ValueError, match="salt_cols"):
        skew.salted_join(big, small, on="k", salt_cols=["nope"])


def test_salted_join_nested_map_column(spark):
    """Maps at any nesting depth (array<map>, struct<...map...>) are
    excluded from the default salt hash — xxhash64 rejects them at
    analysis time, not just top-level map columns."""
    big = spark.createDataFrame(
        [(1, [{"a": "x"}]), (1, [{"b": "y"}]), (2, [{"c": "z"}])],
        ["k", "tag_list"],
    )
    small = spark.createDataFrame([(1, "one"), (2, "two")], ["k", "name"])
    got = skew.salted_join(big, small, on="k", salt_buckets=4)
    assert got.count() == 3


def test_skewed_group_count_equals_plain(spark):
    events = table(spark, SF_SMALL, "events")
    plain = {
        r["event_type"]: r["cnt"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    salted = {
        r["event_type"]: r["cnt"]
        for r in skew.skewed_group_count(events, "event_type").collect()
    }
    assert plain == salted


def test_approx_distinct_within_rsd(spark):
    events = table(spark, SF_SMALL, "events")
    exact = audit.distinct_count(events, "user_id").first()["cnt"]
    approx = audit.approx_distinct_count(events, "user_id", rsd=0.02).first()["cnt"]
    assert abs(approx - exact) / exact < 0.1


def test_bucketed_join_has_no_shuffle(spark):
    orders = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    lineitem = table(spark, SF_SMALL, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    bucketing.save_bucketed(orders, "b_orders", "o_orderkey", 4)
    bucketing.save_bucketed(lineitem, "b_lineitem", "o_orderkey", 4)
    joined = bucketing.join_bucketed(spark, "b_orders", "b_lineitem", "o_orderkey")
    assert joined.count() > 0
    # co-located buckets: no shuffle exchange in the physical plan
    assert not bucketing.plan_has_shuffle(joined)
    # sanity: the same sort-merge join on unbucketed sources DOES shuffle
    plain = orders.hint("merge").join(lineitem, "o_orderkey")
    plain.count()
    assert bucketing.plan_has_shuffle(plain)


def test_xml_sample_roundtrip(spark):
    orders = table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").cast("string").alias("_id"),
        F.col("o_orderstatus").alias("_status"),
    )
    sampled = every_nth(orders, "_id", 10).coalesce(1)
    out = os.path.join(TMP, "sample_xml")
    osm.write_osm_sample(sampled, out, row_tag="order", root_tag="orders")
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .option("attributePrefix", "_")
        .load(out)
    )
    assert back.count() == sampled.count()


def test_every_nth_string_key_matches_global_window(spark):
    """The blocked rank must equal the naive global-window semantics for
    NON-numeric order keys too (literal boundary comparisons are
    lexicographic): same selected set on a string key with ties absent."""
    from pyspark.sql import Window

    df = table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").cast("string").alias("k"), "o_orderstatus"
    )
    got = sorted(r["k"] for r in every_nth(df, "k", 7).collect())
    w = Window.orderBy("k")
    want = sorted(
        r["k"]
        for r in df.withColumn("_i", F.row_number().over(w) - 1)
        .filter(F.col("_i") % 7 == 0)
        .collect()
    )
    assert got == want and len(got) > 0


def test_hilbert_curve_properties():
    """The generated Hilbert SQL must be agenuine Hilbert curve: a bijection
    from the 2^p × 2^p grid onto [0, 4^p) whose CONSECUTIVE indices are
    unit grid steps — the defining locality property (Z-order fails
    it). Checked exhaustively on the 16×16 grid via DuckDB using the
    exact CTE text the oracle embeds."""
    import duckdb

    from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import (
        _hilbert_ctes_sql,
    )

    con = duckdb.connect()
    sql = f"""
        WITH src AS (
          SELECT a.range AS gx0, b.range AS gy0,
                 a.range AS gx, b.range AS gy
          FROM range(16) a, range(16) b
        ),
        {_hilbert_ctes_sql(4, "src")}
        SELECT gx0, gy0, h FROM hil ORDER BY h
    """
    rows = con.execute(sql).fetchall()
    assert len(rows) == 256
    assert [r[2] for r in rows] == list(range(256))  # bijection onto [0,4^p)
    for (x1, y1, _), (x2, y2, _) in zip(rows, rows[1:]):
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit steps, always
