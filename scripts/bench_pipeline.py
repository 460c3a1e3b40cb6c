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


def _gen_stream(n_nodes: int, n_ways: int, shards: int):
    """The synthetic corpus as ONE deterministic element stream (rng
    seed 42) shared by the XML and PBF writers — identical logical
    elements, identical goldens, so the two ingest routes must produce
    identical query outputs ("counts identical to XML", r10 verdict
    item 5). Returns (per-shard element dicts, goldens dict)."""
    from collections import Counter

    rng = random.Random(42)
    users = [f"user_{i}" for i in range(227)]
    node_per, way_per = n_nodes // shards, n_ways // shards
    next_id = 1
    users_used: set[str] = set()
    shop_counts: Counter = Counter()
    highway_counts: Counter = Counter()
    amenity_counts: Counter = Counter()
    shards_out = []
    for _s in range(shards):
        nodes, ways = [], []
        for _ in range(node_per):
            nid = next_id
            next_id += 1
            u = rng.choice(users)
            lat, lon = 22.0 + rng.random(), 88.0 + rng.random()
            # draw order mirrors the original inline XML writer (f-string
            # evaluated changeset before the timestamp month), so corpora
            # cached by earlier rounds remain byte-identical
            cs = rng.randrange(1_000_000)
            month = rng.randrange(1, 9)
            users_used.add(u)
            tags = []
            r = rng.random()
            if r < 0.02:
                shop = rng.choice(SHOPS)
                shop_counts[shop] += 1
                tags.append(("shop", shop))
            elif r < 0.04:
                amenity = rng.choice(AMENITIES)
                amenity_counts[amenity] += 1
                tags.append(("amenity", amenity))
            if r < 0.05:
                tags.extend([
                    ("addr:street", rng.choice(STREETS)),
                    ("addr:city", rng.choice(CITIES)),
                    ("addr:postcode", f"7000{rng.randrange(10, 99)}"),
                ])
            nodes.append(dict(
                id=nid, user=u, uid=users.index(u), lat=lat, lon=lon,
                month=month, changeset=cs, tags=tags,
            ))
        max_nid = next_id - 1
        for _ in range(way_per):
            wid = next_id
            next_id += 1
            u = rng.choice(users)
            users_used.add(u)
            cs = rng.randrange(1_000_000)
            refs = [
                rng.randrange(1, max(2, max_nid))
                for _ in range(rng.randrange(3, 9))
            ]
            tags = []
            if rng.random() < 0.4:
                hw = rng.choice(HIGHWAYS)
                highway_counts[hw] += 1
                tags.append(("highway", hw))
            ways.append(dict(
                id=wid, user=u, uid=users.index(u), changeset=cs,
                refs=refs, tags=tags,
            ))
        shards_out.append((nodes, ways))

    def _topk(counter, k=10):
        # the engine's deterministic ordering: count desc, value asc
        return sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    golden = {
        "distinct_users": len(users_used),
        "n_nodes": node_per * shards,
        "n_ways": way_per * shards,
        "top_shops": _topk(shop_counts),
        "top_highways": _topk(highway_counts),
        "amenity_counts": dict(amenity_counts),
    }
    return shards_out, golden


def generate(base: str, n_nodes: int, n_ways: int, shards: int) -> list[str]:
    """Write the sharded synthetic XML corpus AND a sidecar goldens json
    with the structural invariants the reference publishes for its corpus
    (README.md:128,138: 227 distinct users, the node/way split, top-k shop
    and highway orderings with count-desc/name-asc ties) — so ``--check``
    can assert them at ANY scale, the way the reference's
    test_reshaped_data pins fixture-scale goldens."""
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
    shards_out, golden = _gen_stream(n_nodes, n_ways, shards)
    for p, (nodes, ways) in zip(paths, shards_out):
        with open(p, "w") as f:
            f.write('<?xml version="1.0" encoding="UTF-8"?>\n<osm>\n')
            for n in nodes:
                f.write(
                    f'<node id="{n["id"]}" lat="{n["lat"]:.7f}" '
                    f'lon="{n["lon"]:.7f}" '
                    f'user="{n["user"]}" uid="{n["uid"]}" version="1" '
                    f'changeset="{n["changeset"]}" '
                    f'timestamp="2013-0{n["month"]}-01T00:00:00Z">\n'
                )
                for k, v in n["tags"]:
                    f.write(f'  <tag k="{k}" v="{v}"/>\n')
                f.write("</node>\n")
            for w in ways:
                f.write(
                    f'<way id="{w["id"]}" user="{w["user"]}" '
                    f'uid="{w["uid"]}" '
                    f'version="1" changeset="{w["changeset"]}" '
                    f'timestamp="2013-05-01T00:00:00Z">\n'
                )
                for ref in w["refs"]:
                    f.write(f'  <nd ref="{ref}"/>\n')
                for k, v in w["tags"]:
                    f.write(f'  <tag k="{k}" v="{v}"/>\n')
                f.write("</way>\n")
            f.write("</osm>\n")
    with open(golden_path, "w") as f:
        json.dump(golden, f)
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def generate_pbf(
    base: str, n_nodes: int, n_ways: int, shards: int,
    nodes_per_blob: int = 20_000,
) -> str:
    """Write the SAME element stream as ONE .osm.pbf file, chunked into
    many OSMData blobs (nodes_per_blob nodes / half as many ways per
    blob) — the single-planet-file shape only the osmpbf DataSource can
    fan out. Reuses the goldens sidecar written by ``generate``."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    from tests.pbf_encoder import encode_pbf

    os.makedirs(base, exist_ok=True)
    path = os.path.join(base, "corpus.osm.pbf")
    marker = os.path.join(base, f"pbf_{n_nodes}_{n_ways}_{shards}.done")
    if os.path.exists(marker) and os.path.exists(path):
        return path
    import calendar

    shards_out, golden = _gen_stream(n_nodes, n_ways, shards)
    golden_path = os.path.join(base, "goldens.json")
    if not os.path.exists(golden_path):
        with open(golden_path, "w") as f:
            json.dump(golden, f)

    def ts_ms(year, month):
        return calendar.timegm((year, month, 1, 0, 0, 0)) * 1000

    with open(path, "wb") as f:
        for nodes, ways in shards_out:
            for i in range(0, len(nodes), nodes_per_blob):
                chunk = [
                    dict(
                        id=n["id"], lat=n["lat"], lon=n["lon"],
                        user=n["user"], uid=n["uid"], version=1,
                        changeset=n["changeset"],
                        timestamp_ms=ts_ms(2013, n["month"]),
                        tags=dict(n["tags"]),
                    )
                    for n in nodes[i : i + nodes_per_blob]
                ]
                f.write(encode_pbf(chunk, [], []))
            wp = max(1, nodes_per_blob // 2)
            for i in range(0, len(ways), wp):
                chunk = [
                    dict(
                        id=w["id"], refs=w["refs"], user=w["user"],
                        uid=w["uid"], version=1,
                        changeset=w["changeset"],
                        timestamp_ms=ts_ms(2013, 5),
                        tags=dict(w["tags"]),
                    )
                    for w in ways[i : i + wp]
                ]
                f.write(encode_pbf([], chunk, []))
    with open(marker, "w") as f:
        f.write("ok")
    return path


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
    args = [a for a in sys.argv[1:] if a not in ("--check", "--pbf")]
    do_check = "--check" in sys.argv[1:]
    use_pbf = "--pbf" in sys.argv[1:]
    n_nodes = int(args[0]) if len(args) > 0 else 500_000
    n_ways = int(args[1]) if len(args) > 1 else 60_000
    shards = int(args[2]) if len(args) > 2 else 8
    base = os.environ.get("PIPELINE_BENCH_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp", "pipeline_bench",
    )
    if use_pbf:
        pbf_path = generate_pbf(base, n_nodes, n_ways, shards)
        total_mb = os.path.getsize(pbf_path) / 1e6
    else:
        paths = generate(base, n_nodes, n_ways, shards)
        total_mb = sum(os.path.getsize(p) for p in paths) / 1e6

    spark = get_spark("bench-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    glob = (
        pbf_path if use_pbf else os.path.join(base, "part_*.osm")
    )
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    res = wrangle_maps(
        spark, glob,
        out_store=os.path.join(
            base, "store_pbf" if use_pbf else "store"
        ),
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
                "ingest": "osmpbf" if use_pbf else "xml",
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
