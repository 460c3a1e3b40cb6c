"""Same-session stage profile of q_dedup_semantic at sf0.1 (guide §1:
measure first, noop sink, labeled jobs). Prints one line per stage."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark import catalog
from data_wrangle_openstreetmaps_data_spark.functions import text
from data_wrangle_openstreetmaps_data_spark.operators import dedup
from data_wrangle_openstreetmaps_data_spark.plans import queries as Q
from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, spark, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(label)
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{best:7.2f}s  {label}", flush=True)
    return best


def main():
    spark = get_spark("profile_semantic")
    spark.sparkContext.setLogLevel("ERROR")
    table = lambda name: catalog.table(spark, SF, name)  # noqa: E731

    emb = table("embeddings")
    docs = table("documents")
    noop(emb)  # warm footer caches
    noop(docs)

    timed("emb.count (auto-r sizing job)", lambda: emb.count(), spark)
    timed(
        "pairs (SRP + collapse + verify)",
        lambda: noop(
            dedup.embedding_near_dup_pairs(
                emb, threshold=0.4, bands=8, rows_per_band=None, dim=64
            )
        ),
        spark,
    )
    timed(
        "pairs -> dup_clusters",
        lambda: noop(
            dedup.dup_clusters(
                dedup.embedding_near_dup_pairs(
                    emb, threshold=0.4, bands=8, rows_per_band=None, dim=64
                )
            )
        ),
        spark,
    )
    timed(
        "docs quality+tokens projection (ALL docs)",
        lambda: noop(
            docs.select(
                F.col("doc_id").alias("id"),
                F.size(text.tokens(F.col("text"))).alias("n_tokens"),
                text.quality_score(F.col("text")).alias("quality"),
            )
        ),
        spark,
    )
    # how many distinct ids does cc actually cover?
    cc = dedup.dup_clusters(
        dedup.embedding_near_dup_pairs(
            emb, threshold=0.4, bands=8, rows_per_band=None, dim=64
        )
    )
    print("cc rows:", cc.count(), " docs rows:", docs.count(), flush=True)
    timed(
        "q_dedup_semantic full",
        lambda: noop(Q.REGISTRY["q_dedup_semantic"].spark(spark, SF)),
        spark,
    )
    spark.stop()


if __name__ == "__main__":
    main()
