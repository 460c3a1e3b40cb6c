"""Reference-scale pipeline benchmark.

The reference wrangles a 106 MB OSM XML extract (~507k nodes / ~60k ways,
BASELINE.md) through 6 sequential SAX re-parses + per-dict Mongo inserts +
server-side queries. This script synthesizes a deterministic OSM corpus of
the same scale (sharded into N XML files — the realistic layout for a
distributed scan), runs the engine's full pipeline (audits + clean +
reshape + parquet store + the reference's query set), and prints ONE JSON
line with phase timings.

Usage: python scripts/bench_pipeline.py [n_nodes] [n_ways] [shards]
Fixture is cached under .tmp/pipeline_bench — delete to regenerate.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_wrangle_openstreetmaps_data_spark.plans.pipeline import wrangle_maps
from data_wrangle_openstreetmaps_data_spark.session import get_spark

STREETS = [
    "Jessore road", "Park st", "MG Rd.", "Sarat Bose Avenue",
    "Gariahat Sarani", "24/j, shyamsundar pally", "Dum Dum raod",
    "41, Jawaharlal Nehru Road",
]
CITIES = ["kolkata", "Kolkata", "saltlake", "Salt Lake", "Bamangachi"]
SHOPS = ["supermarket", "convenience", "hairdresser", "bakery", "electronics"]
HIGHWAYS = ["service", "residential", "tertiary", "unclassified", "secondary"]
AMENITIES = ["cafe", "restaurant", "hospital", "school", "college"]


def generate(base: str, n_nodes: int, n_ways: int, shards: int) -> list[str]:
    os.makedirs(base, exist_ok=True)
    marker = os.path.join(base, f"gen_{n_nodes}_{n_ways}_{shards}.done")
    paths = [os.path.join(base, f"part_{i:02d}.osm") for i in range(shards)]
    if os.path.exists(marker):
        return paths
    # clear stale artifacts from a different config (they'd match the glob)
    import glob as globmod

    for old in globmod.glob(os.path.join(base, "part_*.osm")) + globmod.glob(
        os.path.join(base, "gen_*.done")
    ):
        os.remove(old)
    rng = random.Random(42)
    users = [f"user_{i}" for i in range(227)]
    node_per, way_per = n_nodes // shards, n_ways // shards
    next_id = 1
    for p in paths:
        with open(p, "w") as f:
            f.write('<?xml version="1.0" encoding="UTF-8"?>\n<osm>\n')
            for _ in range(node_per):
                nid = next_id
                next_id += 1
                u = rng.choice(users)
                lat, lon = 22.0 + rng.random(), 88.0 + rng.random()
                f.write(
                    f'<node id="{nid}" lat="{lat:.7f}" lon="{lon:.7f}" '
                    f'user="{u}" uid="{users.index(u)}" version="1" '
                    f'changeset="{rng.randrange(1_000_000)}" '
                    f'timestamp="2013-0{rng.randrange(1,9)}-01T00:00:00Z">\n'
                )
                r = rng.random()
                if r < 0.02:
                    f.write(f'  <tag k="shop" v="{rng.choice(SHOPS)}"/>\n')
                elif r < 0.04:
                    f.write(f'  <tag k="amenity" v="{rng.choice(AMENITIES)}"/>\n')
                if r < 0.05:
                    f.write(
                        f'  <tag k="addr:street" v="{rng.choice(STREETS)}"/>\n'
                        f'  <tag k="addr:city" v="{rng.choice(CITIES)}"/>\n'
                        f'  <tag k="addr:postcode" v="7000{rng.randrange(10,99)}"/>\n'
                    )
                f.write("</node>\n")
            for _ in range(way_per):
                wid = next_id
                next_id += 1
                u = rng.choice(users)
                f.write(
                    f'<way id="{wid}" user="{u}" uid="{users.index(u)}" '
                    f'version="1" changeset="{rng.randrange(1_000_000)}" '
                    f'timestamp="2013-05-01T00:00:00Z">\n'
                )
                for _ in range(rng.randrange(3, 9)):
                    f.write(f'  <nd ref="{rng.randrange(1, max(2, nid))}"/>\n')
                if rng.random() < 0.4:
                    f.write(f'  <tag k="highway" v="{rng.choice(HIGHWAYS)}"/>\n')
                f.write("</way>\n")
            f.write("</osm>\n")
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_ways = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    shards = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp", "pipeline_bench",
    )
    paths = generate(base, n_nodes, n_ways, shards)
    total_mb = sum(os.path.getsize(p) for p in paths) / 1e6

    spark = get_spark("bench-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    glob = os.path.join(base, "part_*.osm")
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    res = wrangle_maps(
        spark, glob, out_store=os.path.join(base, "store")
    )
    # audits (the reference's 4 audit passes + post-clean re-audit)
    t = time.perf_counter()
    audit_counts = {k: df.count() for k, df in res.audits.items()}
    timings["audits"] = round(time.perf_counter() - t, 3)
    # reshape already ran for the store write triggered inside wrangle_maps
    timings["reshape_and_store"] = round(
        time.perf_counter() - t0 - timings["audits"], 3
    )
    # the reference's query set over the reshaped docs
    t = time.perf_counter()
    qout = {k: df.collect() for k, df in res.queries.items()}
    timings["queries"] = round(time.perf_counter() - t, 3)
    timings["total"] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "osm_pipeline_wall",
                "value": timings["total"],
                "unit": "sec",
                "phases": timings,
                "input_mb": round(total_mb, 1),
                "n_nodes": n_nodes,
                "n_ways": n_ways,
                "docs": int(
                    sum(r["cnt"] for r in qout["type_counts"])
                ),
                "distinct_users": int(qout["unique_users"][0]["cnt"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
