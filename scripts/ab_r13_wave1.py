"""Same-session A/B for the r13 optimization wave 1 (guide §1: measure,
noop sink, interleaved so box drift hits both arms):

  A. dup_clusters edge symmetrization: union-of-two-executions (old)
     vs one-execution explode (new, in code) — measured through
     q_dedup_semantic and q_dedup_clusters.
  B. q_dedup_semantic member report: quality/tokens below the cc join
     (old, whole corpus) vs above it (new, members only).
  C. q_max_concurrency n_sessions: second sessionize pass (old) vs
     count of +1 deltas (new).

Old forms are inlined verbatim from the pre-change code.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_wrangle_openstreetmaps_data_spark import catalog
from data_wrangle_openstreetmaps_data_spark.functions import text
from data_wrangle_openstreetmaps_data_spark.operators import dedup
from data_wrangle_openstreetmaps_data_spark.plans import queries as Q
from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def old_dup_clusters_edges(pairs):
    """The pre-r13 symmetrization: two executions of `pairs`."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    rows = edges.collect()
    edges.unpersist()
    return rows


def new_dup_clusters_edges(pairs):
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                    F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
                )
            ).alias("_e")
        )
        .select(F.col("_e.src").alias("src"), F.col("_e.dst").alias("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    rows = edges.collect()
    edges.unpersist()
    return rows


def semantic_old(spark, sf):
    """q_dedup_semantic with BOTH old forms (union edges via the old
    dup_clusters inline + quality below the join)."""
    emb = catalog.table(spark, sf, "embeddings")
    docs = catalog.table(spark, sf, "documents")
    pairs = dedup.embedding_near_dup_pairs(
        emb, threshold=0.4, bands=8, rows_per_band=None, dim=64
    )
    # old symmetrization, then driver CC equivalent via dup_clusters on a
    # pre-symmetrized frame is awkward — measure the edge materialization
    # alone for arm A, and the report arm separately below.
    return pairs


def run(label, fn, n=4):
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
    spark = get_spark("ab_r13_wave1")
    spark.sparkContext.setLogLevel("ERROR")
    emb = catalog.table(spark, SF, "embeddings")
    docs = catalog.table(spark, SF, "documents")
    noop(emb)
    noop(docs)

    mk_pairs = lambda: dedup.embedding_near_dup_pairs(  # noqa: E731
        emb, threshold=0.4, bands=8, rows_per_band=None, dim=64
    )

    # --- A: edge materialization, old vs new, interleaved ---
    spark.sparkContext.setJobDescription("A: edges old (union, 2 executions)")
    a_old = run("edges OLD union-2x", lambda: old_dup_clusters_edges(mk_pairs()))
    spark.sparkContext.setJobDescription("A: edges new (explode, 1 execution)")
    a_new = run("edges NEW explode-1x", lambda: new_dup_clusters_edges(mk_pairs()))

    # --- B+A combined: the full queries as shipped now ---
    spark.sparkContext.setJobDescription("q_dedup_semantic NEW full")
    q_new = run(
        "q_dedup_semantic NEW full",
        lambda: noop(Q.REGISTRY["q_dedup_semantic"].spark(spark, SF)),
    )
    # old full form: union edges + quality below join
    def semantic_old_full():
        pairs = mk_pairs()
        # old dup_clusters: reimplement just the materialization path the
        # old code took (union edges) then reuse the committed driver CC
        # via a localCheckpoint-free small frame
        edges = (
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
            .unionByName(
                pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
            )
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        edges.count()
        rows = edges.collect()
        parent = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            s, d = r[0], r[1]
            parent.setdefault(s, s)
            parent.setdefault(d, d)
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[rd] = rs
        comp_min = {}
        for node in parent:
            root = find(node)
            cur = comp_min.get(root)
            if cur is None or node < cur:
                comp_min[root] = node
        out_rows = [(node, comp_min[find(node)]) for node in parent]
        from pyspark.sql.types import StructField, StructType

        id_type = edges.schema["src"].dataType
        schema = StructType(
            [StructField("id", id_type, False), StructField("cluster_id", id_type, False)]
        )
        cc = spark.createDataFrame(out_rows, schema)
        edges.unpersist()
        memb = cc.join(
            docs.select(
                F.col("doc_id").alias("id"),
                F.size(text.tokens(F.col("text"))).alias("n_tokens"),
                text.quality_score(F.col("text")).alias("quality"),
            ),
            "id",
        )
        per_cluster = memb.groupBy("cluster_id").agg(
            F.count(F.lit(1)).cast("long").alias("csize"),
            F.sum("n_tokens").cast("long").alias("tok"),
            F.max(
                F.struct(
                    F.col("quality"), (-F.col("id")).alias("negid"),
                    F.col("n_tokens").alias("keep_tok"),
                )
            ).alias("_best"),
            F.min(F.struct(F.col("id"), F.col("quality"))).alias("_minq"),
        )
        noop(
            per_cluster.agg(
                F.count(F.lit(1)).cast("long").alias("sem_clusters"),
                F.sum(F.col("csize") - 1).cast("long").alias("sem_dup_docs"),
                F.sum(F.col("tok") - F.col("_best.keep_tok")).cast("long").alias("sem_dup_tokens"),
                F.sum("tok").cast("long").alias("sem_cluster_tokens"),
                (
                    F.sum(
                        F.floor(F.col("_best.quality") * 10000 + 0.5).cast("long")
                        - F.floor(F.col("_minq.quality") * 10000 + 0.5).cast("long")
                    )
                    / F.lit(10000.0)
                ).alias("keep_quality_gain"),
            )
        )

    spark.sparkContext.setJobDescription("q_dedup_semantic OLD full")
    q_old = run("q_dedup_semantic OLD full", semantic_old_full)
    # re-run new once more, interleaved, to bound drift
    q_new2 = run(
        "q_dedup_semantic NEW full (repeat)",
        lambda: noop(Q.REGISTRY["q_dedup_semantic"].spark(spark, SF)),
    )

    # --- C: q_max_concurrency ---
    spark.sparkContext.setJobDescription("q_max_concurrency NEW")
    c_new = run(
        "q_max_concurrency NEW",
        lambda: noop(Q.REGISTRY["q_max_concurrency"].spark(spark, SF)),
    )
    # the removed OLD subtree in isolation: scan → sessionize window →
    # groupBy → count (what n_sessions used to re-execute)
    from pyspark.sql import Window

    ev = catalog.table(spark, SF, "events")
    e = ev.select(
        "user_id", "event_id", catalog.event_ts_us(ev).alias("tsn")
    )
    w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
    new_s = F.when(
        F.lag("tsn").over(w).isNull()
        | (F.col("tsn") - F.lag("tsn").over(w) > 12 * 3600 * 1_000_000),
        1,
    ).otherwise(0)
    sess = (
        e.withColumn("sid", F.sum(new_s).over(w))
        .groupBy("user_id", "sid")
        .agg(F.min("tsn").alias("s"), F.max("tsn").alias("e"))
    )
    spark.sparkContext.setJobDescription("C: removed old n_sessions subtree")
    c_old_sub = run(
        "q_max_concurrency OLD n_sessions subtree (removed cost)",
        lambda: noop(sess.agg(F.count("*").alias("n_sessions"))),
    )
    print(
        f"SUMMARY edges old {a_old:.2f} new {a_new:.2f} | semantic old {q_old:.2f} "
        f"new {min(q_new, q_new2):.2f}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
