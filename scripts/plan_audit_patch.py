"""Patch a PLANS_r*.json artifact with entries for queries that landed
after a full plan_audit run started: audits ONLY the named queries (same
plan_summary + single-partition-exchange measurement as plan_audit.py),
merges them into the artifact, and recomputes the totals / offender
lists. The full-sweep artifact stays the source of truth; this keeps
"regenerate the whole registry" from being the price of every
late-session query landing.

Usage: python scripts/plan_audit_patch.py PLANS_r13.json [sf_dir] q_a q_b ...
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from data_wrangle_openstreetmaps_data_spark.plans import queries as Q
from data_wrangle_openstreetmaps_data_spark.plans.introspect import (
    plan_summary,
    single_partition_exchange_input_rows,
)
from data_wrangle_openstreetmaps_data_spark.session import get_spark

TOTAL_KEYS = (
    "parquet_scans",
    "shuffles",
    "broadcast_joins",
    "sort_merge_joins",
    "nested_loop_joins",
    "cartesian_products",
    "single_partition_exchanges",
    "global_sort_window_funnels",
)


def main() -> int:
    art = sys.argv[1]
    sf = sys.argv[2]
    names = sys.argv[3:]
    d = json.load(open(art))
    spark = get_spark("plan-audit-patch")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = Q.REGISTRY[name].spark(spark, sf)
        s = plan_summary(df, execute=False)
        s["streaming_drain"] = name.startswith("q_streaming")
        if s.get("single_partition_exchanges", 0) > 0:
            df2 = Q.REGISTRY[name].spark(spark, sf)
            rows = single_partition_exchange_input_rows(df2)
            s["funnel_input_rows"] = rows
            s["funnel_input_rows_max"] = max(rows) if rows else 0
        d["queries"][name] = s
    d["n_queries"] = len(d["queries"])
    d["totals"] = {
        k: sum(v.get(k, 0) for v in d["queries"].values() if "error" not in v)
        for k in TOTAL_KEYS
    }
    d["cartesian_offenders"] = sorted(
        n for n, v in d["queries"].items()
        if "error" not in v and v.get("cartesian_products")
    )
    d["global_order_window_offenders"] = sorted(
        n for n, v in d["queries"].items()
        if "error" not in v and v.get("global_sort_window_funnels")
    )
    d["errors"] = sorted(n for n, v in d["queries"].items() if "error" in v)
    with open(art, "w") as f:
        json.dump(d, f, indent=1)
    print(
        json.dumps(
            {
                "patched": names,
                "n_queries": d["n_queries"],
                "cartesians": d["cartesian_offenders"],
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
