"""STRESS (round 11, verdict item 5): the osmpbf DataSource at ≥2 GB /
256 blobs — the single-planet-file shape at a scale where partition
planning being O(#blobs) driver I/O actually matters.

Corpus: 16 DISTINCT blob bodies (100k dense nodes each, one 136-hex-char
incompressible payload tag per node so zlib cannot collapse the file)
tiled ×16 → 256 OSMData blobs ≈ 2.05 GB, 25.6 M node rows. Body tiling
repeats node ids across blob copies — partition planning and fan-out
never read content, and the decode-count check multiplies exactly
(#bodies × reps × nodes_per_body); it is NOT an id-uniqueness corpus.

Measures:
  - index wall: blob-framing walk of the 2 GB file (headers + seeks
    only — must stay milliseconds-scale, independent of payload bytes)
  - planned partitions at blobspertask=1 (= #blobs)
  - full parallel decode wall + exact row count on local[32]
  - 16-blob slice: single-task vs 16-task decode (the fan-out factor
    without paying a 2 GB single-task decode)

Usage: python scripts/stress_pbf_scale.py  # one JSON object to stdout
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_wrangle_openstreetmaps_data_spark.session import get_spark
from data_wrangle_openstreetmaps_data_spark.sources import pbf_datasource
from tests.pbf_encoder import encode_pbf

BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp", "pbf_big",
)
N_BODIES = 16
REPS = 16
NODES_PER_BODY = 100_000


def build() -> tuple[str, str]:
    os.makedirs(BASE, exist_ok=True)
    big = os.path.join(BASE, "big.osm.pbf")
    small = os.path.join(BASE, "slice16.osm.pbf")
    marker = os.path.join(BASE, "gen.done")
    if os.path.exists(marker):
        return big, small
    rng = random.Random(7)
    bodies = []
    for b in range(N_BODIES):
        nodes = [
            dict(
                id=b * NODES_PER_BODY + i + 1,
                lat=22.0 + i * 1e-6, lon=88.0 + i * 1e-6,
                user=f"u{i % 227}", uid=i % 227, version=1,
                changeset=i % 1_000_000, timestamp_ms=1_357_000_000_000,
                tags={"payload": "%0136x" % rng.getrandbits(544)},
            )
            for i in range(NODES_PER_BODY)
        ]
        bodies.append(encode_pbf(nodes, [], []))
        print(f"body {b}: {len(bodies[-1]) / 1e6:.1f} MB", file=sys.stderr)
    with open(big, "wb") as f:
        for _ in range(REPS):
            for body in bodies:
                f.write(body)
    with open(small, "wb") as f:
        for body in bodies:
            f.write(body)
    with open(marker, "w") as f:
        f.write("ok")
    return big, small


def main() -> None:
    big, small = build()
    size_gb = os.path.getsize(big) / 1e9

    t0 = time.perf_counter()
    blobs = pbf_datasource.index_blobs(big)
    index_wall = time.perf_counter() - t0
    n_data = sum(1 for _, _, t in blobs if t == "OSMData")

    spark = get_spark("stress-pbf-scale")
    spark.sparkContext.setLogLevel("ERROR")
    pbf_datasource.register(spark)

    def read(path: str, per_task: int):
        return (
            spark.read.format("osmpbf")
            .option("blobspertask", str(per_task))
            .load(path)
        )

    df = read(big, 1)
    n_parts = df.rdd.getNumPartitions()
    t0 = time.perf_counter()
    total = df.count()
    parallel_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    c16 = read(small, 16).count()  # ONE task decodes all 16 blobs
    single_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    c16p = read(small, 1).count()  # 16 tasks
    par16_wall = time.perf_counter() - t0
    assert c16 == c16p == N_BODIES * NODES_PER_BODY

    out = {
        "file_gb": round(size_gb, 2),
        "n_blobs": n_data,
        "index_wall_s": round(index_wall, 3),
        "planned_partitions": n_parts,
        "rows_decoded": total,
        "rows_expected": N_BODIES * REPS * NODES_PER_BODY,
        "parallel_decode_wall_s": round(parallel_wall, 1),
        "slice16_single_task_s": round(single_wall, 1),
        "slice16_16_tasks_s": round(par16_wall, 1),
        "slice_fanout_speedup": round(single_wall / par16_wall, 1),
        "note": (
            "2GB single file, 256 incompressible blobs; index pass reads "
            "headers+seeks only (wall independent of payload bytes); "
            "bodies tiled x16 so decode counts multiply exactly."
        ),
    }
    assert total == out["rows_expected"], out
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
