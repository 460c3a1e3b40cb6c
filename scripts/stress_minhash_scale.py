"""STRESS (round 11, verdict item 2): q_dedup_minhash one rung higher.

The r10 ladder's worst entry was q_dedup_minhash at 4.0× wall for 10×
data. Root cause is the CORPUS shape, not the banding: the ladder data
(scripts/make_sfN.py) copy-replicates documents, so every exact-dup
class of size c contributes C(c,2) candidate pairs — candidates (and
verify work) grow r² per class on a ×r replication even though true
banding noise stays O(n·bands).

The fix (dedup.dedup_minhash_lsh collapse_exact=True, default) collapses
exact-dup classes to min-id representatives BEFORE shingling: banding +
Jaccard verify run over DISTINCT CONTENT (which does not grow under
replication), and the member-level pair set is recovered exactly by
output-sized expansion joins.

This script measures, at sf0.1 and at ×10 copy-replicated sf0.1:
  - docs, distinct-content classes
  - banding candidate volume Σ C(bucket,2) for raw vs collapsed paths
  - wall time + output pairs for raw vs collapsed paths

Usage: python scripts/stress_minhash_scale.py [src_sf_dir] [factor]
Prints one JSON object (append under "minhash_scale_x10" in STRESS_r11).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.operators import dedup
from data_wrangle_openstreetmaps_data_spark.functions.text import normalize_ws
from data_wrangle_openstreetmaps_data_spark.session import get_spark

CFG = dict(n_hashes=16, bands=8, shingle_k=3, threshold=0.5)


def candidate_volume(spark, df) -> int:
    """Σ C(bucket, 2) over band buckets — the pair volume the banding
    self-join would feed to verification."""
    sigs = dedup.minhash_signatures(
        df, "text", "doc_id", CFG["n_hashes"], CFG["shingle_k"]
    )
    banded = dedup.band_rows(sigs, CFG["n_hashes"], CFG["bands"])
    return (
        banded.groupBy("band", "band_sig")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("v"))
        .collect()[0][0]
        or 0
    )


def run(df, collapse: bool) -> tuple[float, int]:
    t0 = time.time()
    n = dedup.dedup_minhash_lsh(
        df, collapse_exact=collapse, **CFG
    ).count()
    return round(time.time() - t0, 2), n


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("stress-minhash-scale")
    spark.sparkContext.setLogLevel("ERROR")

    base = table(spark, src, "documents").select("doc_id", "text")
    big = (
        base.withColumn(
            "_c", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("_c") * 100_000_000)
        .drop("_c")
        .repartition(32)
        .persist()
    )

    out: dict = {"src": src, "factor": factor, "config": CFG}
    for label, df in (("base", base), (f"x{factor}", big)):
        n_docs = df.count()
        n_classes = (
            df.select(normalize_ws("text").alias("nt")).distinct().count()
        )
        reps = (
            df.select(F.col("doc_id"), normalize_ws("text").alias("nt"))
            .groupBy("nt")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id", F.col("nt").alias("text"))
        )
        cand_raw = candidate_volume(spark, df)
        cand_collapsed = candidate_volume(spark, reps)
        wall_c, pairs_c = run(df, collapse=True)
        wall_r, pairs_r = run(df, collapse=False)
        assert pairs_c == pairs_r, (
            f"collapse changed the pair set: {pairs_c} != {pairs_r}"
        )
        out[label] = {
            "docs": n_docs,
            "distinct_content_classes": n_classes,
            "candidates_raw": cand_raw,
            "candidates_collapsed": cand_collapsed,
            "wall_collapsed_s": wall_c,
            "wall_raw_s": wall_r,
            "output_pairs": pairs_c,
        }
    b, x = out["base"], out[f"x{factor}"]
    out["growth"] = {
        "docs": round(x["docs"] / b["docs"], 2),
        "candidates_raw": round(
            x["candidates_raw"] / max(1, b["candidates_raw"]), 2
        ),
        "candidates_collapsed": round(
            x["candidates_collapsed"] / max(1, b["candidates_collapsed"]), 2
        ),
        "wall_collapsed": round(x["wall_collapsed_s"] / b["wall_collapsed_s"], 2),
        "wall_raw": round(x["wall_raw_s"] / b["wall_raw_s"], 2),
        "output_pairs": round(x["output_pairs"] / max(1, b["output_pairs"]), 2),
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
