"""Capture .explain("formatted") for named registry queries into
plans/r13/<query>_<tag>.txt — the optimization round's plan evidence.

Usage:
    python scripts/capture_plans.py <tag> q_name [q_name ...]
    python scripts/capture_plans.py <tag> --headline     # all bench headline queries

The formatted explain is captured WITHOUT executing the query (AQE's
final plan differs only in runtime coalescing/skew splits; the static
formatted plan is what shows Exchange count, join strategy,
PushedFilters/ReadSchema and Python-eval nodes). Output goes to
plans/r13/ at the repo root (NOT the package's plans/ module).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_wrangle_openstreetmaps_data_spark.plans import queries as Q
from data_wrangle_openstreetmaps_data_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--headline"]:
        import bench

        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = Q.REGISTRY[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
