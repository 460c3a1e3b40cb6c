"""A/B the exact-dup collapse's grouping/join key at a given SF dir
(guide §1: same-session interleaved A/B, noop sink).

Forms:
  A (current): classes = groupBy(RAW vector); members join on RAW vector
  B: classes = groupBy(xxhash64) + min/max(vector) collision audit;
     members join on the 8-byte hash
  C: classes = groupBy(RAW vector) unchanged; a narrow (hash, rep)
     projection with a count-per-hash collision audit; members join on
     the 8-byte hash

Each timing materializes classes AND members (the persisted frames the
collapse path actually fills), cold (clearCache before each rep).
Outputs are asserted identical across forms (sorted collect).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_wrangle_openstreetmaps_data_spark import catalog
from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_A(emb):
    classes = (
        emb.groupBy(F.col("embedding").alias("_v"))
        .agg(F.min("vec_id").alias("rep"), F.count(F.lit(1)).alias("csize"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    members = (
        emb.select(F.col("vec_id").alias("m_id"), F.col("embedding").alias("_v"))
        .join(classes, "_v")
        .select("m_id", "rep")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return classes, members


def build_B(emb):
    hashed = emb.select(
        F.col("vec_id").alias("m_id"),
        F.col("embedding").alias("_v"),
        F.xxhash64("embedding").alias("_h"),
    )
    classes = (
        hashed.groupBy("_h")
        .agg(
            F.min("m_id").alias("rep"),
            F.count(F.lit(1)).alias("csize"),
            F.min("_v").alias("_v"),
            F.max("_v").alias("_vmax"),
        )
        .select(
            "_h",
            F.when(
                ~(F.col("_v").eqNullSafe(F.col("_vmax"))),
                F.raise_error(F.lit("xxhash64 collision")),
            )
            .otherwise(F.col("rep"))
            .alias("rep"),
            "csize",
            "_v",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    members = (
        hashed.select("m_id", "_h")
        .join(classes.select("_h", "rep"), "_h")
        .select("m_id", "rep")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return classes, members


def build_C(emb):
    classes = (
        emb.groupBy(F.col("embedding").alias("_v"))
        .agg(F.min("vec_id").alias("rep"), F.count(F.lit(1)).alias("csize"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ckeys = (
        classes.groupBy(F.xxhash64("_v").alias("_h"))
        .agg(F.min("rep").alias("rep"), F.count(F.lit(1)).alias("_nc"))
        .select(
            "_h",
            F.when(
                F.col("_nc") > 1, F.raise_error(F.lit("xxhash64 collision"))
            )
            .otherwise(F.col("rep"))
            .alias("rep"),
        )
    )
    members = (
        emb.select(
            F.col("vec_id").alias("m_id"), F.xxhash64("embedding").alias("_h")
        )
        .join(ckeys, "_h")
        .select("m_id", "rep")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return classes, members


def main():
    spark = get_spark("ab_collapse_key")
    spark.sparkContext.setLogLevel("ERROR")
    emb = catalog.table(spark, SF, "embeddings")
    noop(emb)
    builders = {"A_raw": build_A, "B_hashgrp": build_B, "C_hashjoin": build_C}

    # correctness: members sets identical across forms
    outs = {}
    for name, b in builders.items():
        spark.catalog.clearCache()
        cl, mem = b(emb)
        outs[name] = sorted(map(tuple, mem.collect()))
    assert outs["A_raw"] == outs["B_hashgrp"] == outs["C_hashjoin"], {
        k: len(v) for k, v in outs.items()
    }
    print(f"outputs identical across forms: {len(outs['A_raw'])} member rows")

    # plan shape of B's aggregate (SortAggregate risk)
    spark.catalog.clearCache()
    cl, _ = build_B(emb)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        cl.explain()
    mode = [
        ln.strip()
        for ln in buf.getvalue().splitlines()
        if "Aggregate" in ln
    ]
    print("B agg operators:", mode[:4])

    for rep in range(4):
        line = []
        for name, b in builders.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            cl, mem = b(emb)
            noop(cl)
            noop(mem)
            line.append(f"{name}={time.perf_counter() - t0:6.2f}s")
        print("  ".join(line), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
