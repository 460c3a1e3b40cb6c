"""Plan-regression guards: the physical plans we audited in PERF.md must
stay the plans we ship. These tests fail if a future change silently
introduces a shuffle, loses a pushdown, or drops the broadcast."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.plans import queries as Q
from data_wrangle_openstreetmaps_data_spark.sources import json_sink
from tests.conftest import SF_SMALL

TMP = os.path.join(os.path.dirname(__file__), "..", ".tmp")


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_flagship_is_partial_topk_with_pruned_scan(spark):
    df = Q.REGISTRY["q_topk_group_count"].spark(spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "TakeOrderedAndProject" in plan      # no global sort
    assert "partial_count" in plan              # map-side combine
    assert "ReadSchema: struct<event_type:string>" in plan  # column pruning
    assert "PushedFilters: [IsNotNull(event_type)]" in plan


def test_star_join_broadcasts_dimensions(spark):
    df = Q.REGISTRY["q_join_resolve_refs"].spark(spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only hash shuffles are on the GROUP key (n_name) for the final
    # 25-row aggregate — never on a join key (the fact side never shuffles)
    import re

    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert keys and all(k.startswith("n_name") for k in keys), keys


def test_filter_reaches_parquet_scan(spark):
    df = Q.REGISTRY["q_filter_eq"].spark(spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan


def test_reshape_is_narrow(spark):
    # clean+reshape must stay a zero-shuffle map stage
    from tests.test_reshape import RAW_SCHEMA, _raw
    from data_wrangle_openstreetmaps_data_spark.operators.reshape import (
        shape_elements,
    )

    df = spark.createDataFrame(
        [_raw(id="1", type="node", user="u", tags=[])], RAW_SCHEMA
    )
    plan = _executed_plan(shape_elements(df))
    assert "Exchange" not in plan


def test_broadcast_mapping_join_equals_literal_form(spark):
    from data_wrangle_openstreetmaps_data_spark.functions import cleaning
    from data_wrangle_openstreetmaps_data_spark.plans.introspect import (
        plan_summary,
    )
    from data_wrangle_openstreetmaps_data_spark.plans.queries import (
        DIRTY_STREETS,
    )

    df = spark.createDataFrame([(s,) for s in DIRTY_STREETS], ["street"])
    literal = {
        r["street"]: r["out"]
        for r in df.select(
            "street", cleaning.normalize_street_type("street").alias("out")
        ).collect()
    }
    joined_df = cleaning.normalize_street_type_join(df, "street")
    joined = {
        r["street"]: r["street_fixed"] for r in joined_df.collect()
    }
    assert literal == joined
    s = plan_summary(joined_df)
    assert s["broadcast_joins"] >= 1 and s["shuffles"] == 0


def test_plan_summary_flagship(spark):
    from data_wrangle_openstreetmaps_data_spark.plans.introspect import (
        plan_summary,
    )

    df = Q.REGISTRY["q_topk_group_count"].spark(spark, SF_SMALL)
    s = plan_summary(df)
    assert s["parquet_scans"] >= 1
    assert s["nested_loop_joins"] == 0
    assert s["sort_merge_joins"] == 0


def test_tpch_q5_all_broadcast(spark):
    from data_wrangle_openstreetmaps_data_spark.plans.introspect import (
        plan_summary,
    )

    s = plan_summary(Q.REGISTRY["q_tpch_q5"].spark(spark, SF_SMALL))
    assert s["broadcast_joins"] == 5      # every dimension broadcast
    assert s["sort_merge_joins"] == 0
    assert s["nested_loop_joins"] == 0
    assert s["shuffles"] <= 2             # grouped aggregate only (AQE dup)


def test_range_join_is_hash_not_nested_loop(spark):
    from data_wrangle_openstreetmaps_data_spark.plans.introspect import (
        plan_summary,
    )

    s = plan_summary(Q.REGISTRY["q_range_join"].spark(spark, SF_SMALL))
    assert s["nested_loop_joins"] == 0    # bucketed equality join


def test_partitioned_store_prunes(spark):
    docs = table(spark, SF_SMALL, "orders").select(
        "o_orderkey", F.col("o_orderstatus").alias("type")
    )
    store = os.path.join(TMP, "pruning_store")
    json_sink.write_store(docs, store, partition_by="type")
    read = json_sink.read_store(spark, store).filter(F.col("type") == "O")
    plan = _executed_plan(read)
    # partition pruning: only the type=O directory is scanned
    assert "PartitionFilters" in plan
    assert "type=O" in plan or "isnotnull(type" in plan
    n_all = json_sink.read_store(spark, store).count()
    n_o = read.count()
    assert 0 < n_o < n_all
