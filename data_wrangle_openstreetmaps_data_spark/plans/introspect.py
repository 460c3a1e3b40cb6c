"""Plan introspection helpers: summarize an executed physical plan into
countable facts (scans, shuffles, broadcasts, codegen spans) so tests and
tuning sessions can assert on plan SHAPE, not string fragments."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_summary(df: DataFrame, execute: bool = True) -> dict[str, int]:
    """Counts of the plan features that matter for scale review.

    With AQE the final plan is only known after execution; ``execute``
    triggers a count() first. Note AQE plan strings repeat subtrees
    (initial + final) — counts are upper bounds, useful for equality /
    zero assertions.

    ``in_memory_scans`` counts InMemoryTableScan nodes: a persisted
    subtree is substituted by the CacheManager at ANALYSIS time, so a
    high parquet_scans count alongside in_memory_scans > 0 usually
    means the textual plan repeats the CACHED subtree's description
    per consumer — execution reads the cached batches once, it does
    not re-scan parquet (verified for q_dedup_minhash_recall, the
    registry's heaviest static plan: 24 InMemoryTableScans at build
    time; PERF.md round-10)."""
    if execute:
        df.count()
    plan = executed_plan(df)
    return {
        "parquet_scans": plan.count("FileScan parquet"),
        "in_memory_scans": plan.count("InMemoryTableScan"),
        "shuffles": len(re.findall(r"Exchange (hash|range)partitioning", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("NestedLoopJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "windows": plan.count("Window"),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "reused_exchanges": plan.count("ReusedExchange"),
    }
