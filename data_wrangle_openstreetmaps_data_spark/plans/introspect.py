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
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "global_sort_window_funnels": count_global_sort_window_funnels(plan),
    }


_FUNNEL_RE = re.compile(
    # a Window node whose direct child is a Sort fed by a SinglePartition
    # exchange — i.e. a Window.orderBy(...) with NO partitionBy: every row
    # of the window's input funnels through ONE task. Scalar aggregates
    # also use Exchange SinglePartition but have HashAggregate (not
    # Window+Sort) above, so they do not match. Up to two intermediate
    # lines (AQEShuffleRead / InMemoryTableScan wrappers) are tolerated
    # between Sort and Exchange. AQE plan strings repeat subtrees, so the
    # count is an upper bound — use it for zero/nonzero classification.
    r"Window \[[^\n]*\n[^\n]*?\bSort \[[^\n]*\n"
    r"(?:[^\n]*\n){0,2}?[^\n]*Exchange SinglePartition"
)


def single_partition_exchange_input_rows(df: DataFrame) -> list[int]:
    """Execute ``df`` and return the MEASURED row count entering every
    ``Exchange SinglePartition`` in the final adaptive plan — the number
    that turns a funnel-allowlist prose justification ("the window only
    sees per-block totals") into a checked bound.

    Walks the JVM plan tree after ``collect()`` (same QueryExecution, so
    SQL metrics are populated; ``count()`` would execute a DIFFERENT
    plan). Each ShuffleExchangeExec with SinglePartition output reports
    its ``shuffle records written`` metric — the rows that actually
    crossed the funnel, regardless of what operator feeds it. AQE query
    stages and reused exchanges are unwrapped/deduplicated."""
    df.collect()
    out: list[int] = []
    seen: set[int] = set()

    def visit(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            visit(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            visit(node.plan())
            return
        if cls == "ReusedExchangeExec":
            return  # rows already counted at the original exchange
        if (
            cls == "ShuffleExchangeExec"
            and node.outputPartitioning().toString() == "SinglePartition"
            and node.id() not in seen
        ):
            seen.add(node.id())
            metrics = node.metrics()
            written = None
            it = metrics.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() in ("shuffleRecordsWritten", "numOutputRows"):
                    written = kv._2().value()
                    break
            if written is None:
                # fail LOUDLY (ADVICE r12): a silent -1 sentinel reads as
                # a satisfied `got <= bound` in the funnel test — a
                # missing metric must surface as an error, not a pass
                raise RuntimeError(
                    "Exchange SinglePartition without a "
                    "shuffleRecordsWritten/numOutputRows metric "
                    f"(node id {node.id()}) — cannot bound the funnel"
                )
            out.append(int(written))
        kids = node.children()
        for i in range(kids.length()):
            visit(kids.apply(i))
        subs = node.subqueries()
        for i in range(subs.length()):
            visit(subs.apply(i))

    visit(df._jdf.queryExecution().executedPlan())
    return out


def count_global_sort_window_funnels(plan: str) -> int:
    """Count Window-over-global-Sort-over-SinglePartition patterns: the
    plan shape of an unpartitioned ``Window.orderBy``. Zero means every
    window in the plan is either keyed (partitionBy) or the plan never
    funnels rows through one task to sort them. Nonzero is acceptable
    ONLY when the frame under the window is provably bounded (per-block
    totals, top-k survivors, day/month grain) — the registry-wide
    allowlist lives in tests/test_plans.py."""
    return len(_FUNNEL_RE.findall(plan))
