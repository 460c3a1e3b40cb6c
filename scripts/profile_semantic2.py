"""Fine-grained same-session profile of embedding_near_dup_pairs
internals at sf0.1 (guide §1: measure first, noop sink, labeled jobs).
Replicates the operator's stages so each is timed in isolation; every
stage re-runs from parquet (clearCache between timings) so no stage
free-rides an earlier stage's persist."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_wrangle_openstreetmaps_data_spark import catalog
from data_wrangle_openstreetmaps_data_spark.operators import dedup
from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, n=3, clear=True):
    best = 1e9
    for _ in range(n):
        if clear:
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(label)
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{best:7.2f}s  {label}", flush=True)
    return best


def main():
    spark = get_spark("profile_semantic2")
    spark.sparkContext.setLogLevel("ERROR")
    emb = catalog.table(spark, SF, "embeddings")
    noop(emb)  # warm footer cache

    id_col, vec_col = "vec_id", "embedding"
    n = emb.count()
    r = dedup.auto_rows_per_band(n, 8)
    print(f"n={n} auto r={r}")

    # --- stage 1: classes groupBy on the raw vector key
    def classes_frame():
        return emb.groupBy(F.col(vec_col).alias("_v")).agg(
            F.min(id_col).alias("rep"), F.count(F.lit(1)).alias("csize")
        )

    timed(spark, "classes = groupBy(RAW VECTOR)", lambda: noop(classes_frame()))

    # --- stage 2: members join on the raw vector key (classes persisted
    # first so the join cost is isolated)
    def members_via_raw():
        cl = classes_frame().persist(StorageLevel.MEMORY_AND_DISK)
        noop(cl)
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("members join RAW VECTOR key")
        mem = (
            emb.select(F.col(id_col).alias("m_id"), F.col(vec_col).alias("_v"))
            .join(cl, "_v")
            .select("m_id", "rep")
        )
        noop(mem)
        return time.perf_counter() - t0

    best = min(members_via_raw() for _ in range(3))
    print(f"{best:7.2f}s  members join (raw vector key, classes cached)")

    # --- stage 3: SRP bucketing of reps (the arrow kernel)
    from data_wrangle_openstreetmaps_data_spark.operators.similarity import (
        _seeded_projections,
    )

    planes = _seeded_projections(64, 8 * r, 42)

    def reps():
        cl = classes_frame()
        return cl.select(F.col("rep").alias(id_col), F.col("_v").alias(vec_col))

    def bucketed(src):
        return dedup._srp_bucketed_arrow(src, id_col, vec_col, planes, 8, r)

    timed(spark, "SRP bucketing (reps, arrow)", lambda: noop(bucketed(reps())))

    # --- stage 4: candidate self-join + dedup + verify over emb directly
    # (raw path, no collapse) to bound the verify cost
    def raw_pairs():
        return dedup.embedding_near_dup_pairs(
            emb, threshold=0.4, bands=8, rows_per_band=r, dim=64,
            collapse_exact=False,
        )

    timed(spark, "raw path end-to-end (no collapse)", lambda: noop(raw_pairs()))

    # --- stage 5: full collapse path end-to-end, cold each time
    def full():
        return dedup.embedding_near_dup_pairs(
            emb, threshold=0.4, bands=8, rows_per_band=None, dim=64
        )

    timed(spark, "collapse path end-to-end (cold caches)", lambda: noop(full()))
    timed(
        spark,
        "collapse path end-to-end (warm caches)",
        lambda: noop(full()),
        clear=False,
    )
    spark.stop()


if __name__ == "__main__":
    main()
