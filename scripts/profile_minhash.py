"""Same-session stage profile of q_dedup_minhash at sf0.1 (guide §1)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_wrangle_openstreetmaps_data_spark import catalog
from data_wrangle_openstreetmaps_data_spark.functions.text import normalize_ws
from data_wrangle_openstreetmaps_data_spark.operators import dedup
from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
    _shingle_hashes,
    band_rows,
    minhash_signatures,
)
from data_wrangle_openstreetmaps_data_spark.plans import queries as Q
from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run(label, fn, n=3):
    best, times = 1e9, []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        times.append(round(dt, 2))
        best = min(best, dt)
    print(f"{best:7.2f}s best  {times}  {label}", flush=True)
    return best


def main():
    spark = get_spark("profile_minhash")
    spark.sparkContext.setLogLevel("ERROR")
    docs = catalog.table(spark, SF, "documents")
    noop(docs)

    # stage 0: the exact-dup collapse bookkeeping
    norm = docs.select(
        F.col("doc_id").alias("m_id"), normalize_ws("text").alias("_nt")
    )
    def collapse_only():
        classes = norm.groupBy("_nt").agg(
            F.min("m_id").alias("rep"), F.count(F.lit(1)).alias("csize")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        classes.count()
        classes.unpersist()
    run("collapse classes groupBy+persist", collapse_only, n=3)

    # stage 1: shingle hashes (persisted) materialization
    def sh_mat():
        sh = _shingle_hashes(docs, "text", "doc_id", 3)
        sh.count()
        sh.unpersist()
    run("shingle hashes distinct+persist (raw docs)", sh_mat, n=3)

    # stage 2: signatures from a persisted sh
    sh = _shingle_hashes(docs, "text", "doc_id", 3)
    sh.count()
    run(
        "signatures (16 mins over persisted sh)",
        lambda: noop(minhash_signatures(docs, "text", "doc_id", 16, 3, sh=sh)),
        n=3,
    )
    sigs = minhash_signatures(docs, "text", "doc_id", 16, 3, sh=sh).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs.count()

    # stage 3: band self-join candidates
    banded = band_rows(sigs, 16, 8)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    run("band self-join candidates", lambda: noop(cand), n=3)

    # stage 4: verify (common-shingle count + jaccard)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        cand.join(sh.select(F.col("id").alias("id_a"), "s"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("s").alias("s")), on=["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import _jaccard_from_counts
    run("verify jaccard", lambda: noop(_jaccard_from_counts(common, sizes, 0.5)), n=3)
    sigs.unpersist(); sh.unpersist()

    # raw pipeline without collapse, vs full query
    run(
        "dedup_minhash_lsh collapse_exact=False (+sort)",
        lambda: noop(
            dedup.dedup_minhash_lsh(
                docs, n_hashes=16, bands=8, shingle_k=3, threshold=0.5,
                collapse_exact=False,
            )
        ),
        n=3,
    )
    run(
        "q_dedup_minhash full (collapse_exact=True)",
        lambda: noop(Q.REGISTRY["q_dedup_minhash"].spark(spark, SF)),
        n=3,
    )
    spark.stop()


if __name__ == "__main__":
    main()
