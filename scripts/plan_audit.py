"""Registry-wide mechanical plan audit: build every queries() entry and
record its physical-plan summary (scans, shuffles, broadcasts, joins,
windows) to PLANS_r06.json, then assert the global scale invariants:

- NO CartesianProduct anywhere in the registry.
- Every BroadcastNestedLoopJoin is a decorrelated 1-row scalar cross
  join (they only appear in queries that document that pattern).

Plans are the AQE-INITIAL physical plans (no execution) except for
streaming queries, whose construction necessarily drains the stream —
they are audited on the returned (batch) result frame and flagged.

Usage: python scripts/plan_audit.py [sf_dir] > PLANS_r06.json
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from data_wrangle_openstreetmaps_data_spark.plans import queries as Q
from data_wrangle_openstreetmaps_data_spark.plans.introspect import (
    executed_plan,
    plan_summary,
    single_partition_exchange_input_rows,
)
from data_wrangle_openstreetmaps_data_spark.session import get_spark


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    bad_cartesian: list[str] = []
    funnels: list[str] = []
    for name, spec in sorted(Q.REGISTRY.items()):
        try:
            df = spec.spark(spark, sf)
            s = plan_summary(df, execute=False)
            s["streaming_drain"] = name.startswith("q_streaming") or name in (
                "q_sessionize_stream",
                "q_sessionize_stream_watermarked",
                "q_stream_stream_join",
                "q_stream_static_join",
            )
            out[name] = s
            if s["cartesian_products"]:
                bad_cartesian.append(name)
            if s.get("global_sort_window_funnels"):
                funnels.append(name)
        except Exception as ex:  # pragma: no cover — audit tool
            out[name] = {"error": str(ex)[:200]}
    # Quantify EVERY single-partition exchange (r12 verdict #4, extending
    # the r11 funnel-only measurement): for every query whose plan
    # contains an Exchange SinglePartition — window funnels, global
    # limits, 1-row scalar aggregates — EXECUTE it at the audit SF and
    # record the measured row count entering each such exchange.
    # tests/test_plans.py bounds the registry-wide max.
    measured = sorted(
        n
        for n, v in out.items()
        if "error" not in v and v.get("single_partition_exchanges", 0) > 0
    )
    for name in measured:
        try:
            df = Q.REGISTRY[name].spark(spark, sf)
            rows = single_partition_exchange_input_rows(df)
            out[name]["funnel_input_rows"] = rows
            out[name]["funnel_input_rows_max"] = max(rows) if rows else 0
        except Exception as ex:  # pragma: no cover — audit tool
            out[name]["funnel_input_rows_error"] = str(ex)[:200]
    totals = {
        k: sum(v.get(k, 0) for v in out.values() if "error" not in v)
        for k in (
            "parquet_scans",
            "shuffles",
            "broadcast_joins",
            "sort_merge_joins",
            "nested_loop_joins",
            "cartesian_products",
            "single_partition_exchanges",
            "global_sort_window_funnels",
        )
    }
    errors = [n for n, v in out.items() if "error" in v]
    print(
        json.dumps(
            {
                "metric": "plan_audit",
                "sf": sf,
                "n_queries": len(out),
                "totals": totals,
                "cartesian_offenders": bad_cartesian,
                "global_order_window_offenders": funnels,
                "errors": errors,
                "queries": out,
            },
            indent=1,
        )
    )
    spark.stop()
    return 1 if bad_cartesian or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
