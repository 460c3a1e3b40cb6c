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
    """Write the sharded synthetic corpus AND a sidecar goldens json with
    the structural invariants the reference publishes for its corpus
    (README.md:128,138: 227 distinct users, the node/way split, top-k shop
    and highway orderings with count-desc/name-asc ties) — tallied during
    generation so ``--check`` can assert them at ANY scale, the way the
    reference's test_reshaped_data pins fixture-scale goldens."""
    os.makedirs(base, exist_ok=True)
    marker = os.path.join(base, f"gen_{n_nodes}_{n_ways}_{shards}.done")
    golden_path = os.path.join(base, "goldens.json")
    paths = [os.path.join(base, f"part_{i:02d}.osm") for i in range(shards)]
    if os.path.exists(marker) and os.path.exists(golden_path):
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
    from collections import Counter

    users_used: set[str] = set()
    shop_counts: Counter = Counter()
    highway_counts: Counter = Counter()
    amenity_counts: Counter = Counter()
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
                users_used.add(u)
                r = rng.random()
                if r < 0.02:
                    shop = rng.choice(SHOPS)
                    shop_counts[shop] += 1
                    f.write(f'  <tag k="shop" v="{shop}"/>\n')
                elif r < 0.04:
                    amenity = rng.choice(AMENITIES)
                    amenity_counts[amenity] += 1
                    f.write(f'  <tag k="amenity" v="{amenity}"/>\n')
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
                users_used.add(u)
                f.write(
                    f'<way id="{wid}" user="{u}" uid="{users.index(u)}" '
                    f'version="1" changeset="{rng.randrange(1_000_000)}" '
                    f'timestamp="2013-05-01T00:00:00Z">\n'
                )
                for _ in range(rng.randrange(3, 9)):
                    f.write(f'  <nd ref="{rng.randrange(1, max(2, nid))}"/>\n')
                if rng.random() < 0.4:
                    hw = rng.choice(HIGHWAYS)
                    highway_counts[hw] += 1
                    f.write(f'  <tag k="highway" v="{hw}"/>\n')
                f.write("</way>\n")
            f.write("</osm>\n")

    def _topk(counter, k=10):
        # the engine's deterministic ordering: count desc, value asc
        return sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    with open(golden_path, "w") as f:
        json.dump(
            {
                "distinct_users": len(users_used),
                "n_nodes": node_per * shards,
                "n_ways": way_per * shards,
                "top_shops": _topk(shop_counts),
                "top_highways": _topk(highway_counts),
                "amenity_counts": dict(amenity_counts),
            },
            f,
        )
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def check_goldens(base: str, res, qout: dict) -> list[str]:
    """Assert the pipeline reproduces the generator's structural goldens —
    the invariant classes the reference publishes for its corpus
    (README.md:128,138: distinct users, node/way split, top-k orderings
    with deterministic ties, per-amenity counts). Returns violations."""
    with open(os.path.join(base, "goldens.json")) as f:
        golden = json.load(f)
    errs: list[str] = []

    def expect(name, got, want):
        if got != want:
            errs.append(f"{name}: got {got!r}, want {want!r}")

    expect(
        "distinct_users",
        int(qout["unique_users"][0]["cnt"]),
        golden["distinct_users"],
    )
    type_counts = {r["type"]: r["cnt"] for r in qout["type_counts"]}
    expect("node_count", type_counts.get("node"), golden["n_nodes"])
    expect("way_count", type_counts.get("way"), golden["n_ways"])
    expect(
        "top_shops",
        [[r["shop"], r["cnt"]] for r in qout["top_shops"]],
        [list(kv) for kv in golden["top_shops"]],
    )
    expect(
        "top_highways",
        [[r["highway"], r["cnt"]] for r in qout["top_highways"]],
        [list(kv) for kv in golden["top_highways"]],
    )
    amenities = {
        r["amenity"]: r["cnt"] for r in qout["amenity_counts"] if r["amenity"]
    }
    expect("amenity_counts", amenities, golden["amenity_counts"])
    return errs


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--check"]
    do_check = "--check" in sys.argv[1:]
    n_nodes = int(args[0]) if len(args) > 0 else 500_000
    n_ways = int(args[1]) if len(args) > 1 else 60_000
    shards = int(args[2]) if len(args) > 2 else 8
    base = os.environ.get("PIPELINE_BENCH_DIR") or os.path.join(
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
    if do_check:
        errs = check_goldens(base, res, qout)
        if errs:
            for e in errs:
                print(f"GOLDEN VIOLATION: {e}", file=sys.stderr)
            spark.stop()
            raise SystemExit(1)
        print("goldens: all invariants hold", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
