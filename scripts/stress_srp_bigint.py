"""STRESS (round 11, verdict item 3): SRP bucket ids past the int32
ceiling. Re-runs the r8 500k-vector recall harness at rows_per_band=40
(> the former r=31 cap): 64-dim hash-synthetic unit-ish vectors with a
planted near-dup (cos ≈ 0.9999) at every vec_id % 997 == 0 → vec_id+1.

Sizing law check: noise candidates ≈ n²/2 · b · 2^-r ≈ 0.9 expected at
n=500k, b=8, r=40 — the candidate set should be almost exactly the
planted pairs, while each planted pair still survives banding with
p = 1-(1-(1-θ/π)^40)^8 ≈ 1-1e-6.

Usage: python scripts/stress_srp_bigint.py   # prints one JSON object
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
    _srp_bucketed_arrow,
    embedding_near_dup_pairs,
)
from data_wrangle_openstreetmaps_data_spark.operators.similarity import (
    _seeded_projections,
)
from data_wrangle_openstreetmaps_data_spark.session import get_spark


def main() -> None:
    spark = get_spark("stress-srp-bigint")
    spark.sparkContext.setLogLevel("ERROR")
    e_dim, e_bands, e_rows = 64, 8, 40
    n_vecs = 500_000
    vgrp = F.when(
        F.col("vec_id") % 997 == 0, F.col("vec_id") + 1
    ).otherwise(F.col("vec_id"))
    comps = [
        F.hash(vgrp, F.lit(j)).cast("double") / F.lit(2147483647.0)
        for j in range(e_dim)
    ]
    c0 = F.when(
        F.col("vec_id") % 997 == 0, comps[0] + F.lit(0.05)
    ).otherwise(comps[0])
    vecs = (
        spark.range(n_vecs)
        .select(F.col("id").alias("vec_id"))
        .select(
            "vec_id",
            F.array(c0, *comps[1:]).cast("array<float>").alias("embedding"),
        )
        .persist()
    )
    n_planted = n_vecs // 997 + (1 if n_vecs % 997 else 0)

    t0 = time.perf_counter()
    pairs = embedding_near_dup_pairs(
        vecs, threshold=0.9, bands=e_bands, rows_per_band=e_rows, dim=e_dim
    ).persist()
    found = pairs.filter(
        (F.col("id_a") % 997 == 0) & (F.col("id_b") == F.col("id_a") + 1)
    ).count()
    total_pairs = pairs.count()
    wall = round(time.perf_counter() - t0, 2)

    planes = _seeded_projections(e_dim, e_bands * e_rows, 42)
    bucketed = _srp_bucketed_arrow(
        vecs, "vec_id", "embedding", planes, e_bands, e_rows
    ).persist()
    cand = (
        bucketed.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) div 2")).alias("cp"))
        .collect()[0]["cp"]
    )
    hi = bucketed.filter(F.col("bucket") >= (1 << 31)).count()
    out = {
        "n_vecs": n_vecs,
        "dim": e_dim,
        "bands": e_bands,
        "rows_per_band": e_rows,
        "planted_pairs": n_planted,
        "recall_found": found,
        "recall": round(found / n_planted, 4),
        "total_pairs": total_pairs,
        "band_candidates": int(cand),
        "expected_noise_candidates": round(
            n_vecs * n_vecs / 2 * e_bands / 2 ** e_rows, 2
        ),
        "bucket_rows_above_int32": hi,
        "wall_s": wall,
        "note": (
            "r=40 > the former int32 ceiling (31); bucket ids BIGINT. "
            "Candidates collapse to ~the planted pairs per the sizing "
            "law candidates ≈ n²b/2^r."
        ),
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
