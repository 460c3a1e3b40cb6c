"""Second-decade scale rung (round 12): measure the worst r11 ladder
entries at sf1 (×10) AND sf10 (×100, built by make_sfN.py 100 — exact
copies with FK-consistent shifts) and record whether growth stays
sub-linear for a SECOND decade, with output-size accounting so an
output-driven super-linear entry can be distinguished from a plan
failure.

Usage: python scripts/stress_sf10.py [out=STRESS_r12.json]
Expects .tmp/sf1 and .tmp/sf10 to exist (scripts/make_sfN.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_wrangle_openstreetmaps_data_spark.plans import queries as Q
from data_wrangle_openstreetmaps_data_spark.session import get_spark

QUERIES = [
    "q_weighted_median",
    "q_bpe_token_count",
    "q_degree_distribution",
    "q_dedup_minhash",
    "q_dedup_semantic",
]

RUNGS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", ".tmp/sf1"),
    ("sf10", ".tmp/sf10"),
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "STRESS_r12.json"
    spark = get_spark("stress-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name in QUERIES:
        fn = Q.REGISTRY[name].spark
        entry: dict[str, dict] = {}
        for rung, sfdir in RUNGS:
            walls = []
            rows = None
            for _ in range(2):
                t0 = time.perf_counter()
                df = fn(spark, sfdir)
                rows = df.count()
                walls.append(round(time.perf_counter() - t0, 2))
            entry[rung] = {"wall_best": min(walls), "walls": walls,
                           "out_rows": rows}
            print(f"{name} @ {rung}: {min(walls)}s, {rows} rows",
                  flush=True)
        g10 = entry["sf1"]["wall_best"] / max(entry["sf0.1"]["wall_best"], 1e-9)
        g100 = entry["sf10"]["wall_best"] / max(entry["sf1"]["wall_best"], 1e-9)
        entry["growth_x10_first_decade"] = round(g10, 2)
        entry["growth_x10_second_decade"] = round(g100, 2)
        results[name] = entry
    with open(out_path, "w") as f:
        json.dump(
            {
                "metric": "sf10_second_decade_ladder",
                "note": (
                    "wall_best of 2 per rung, one session; sf1/sf10 are "
                    "copy-replicated (exact dup classes inflate "
                    "deliberately — the collapse paths are the thing "
                    "under test). growth_x10_* is wall ratio per 10x "
                    "data; sub-linear means < 10."
                ),
                "queries": results,
            },
            f,
            indent=1,
        )
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
