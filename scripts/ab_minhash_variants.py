"""Same-session interleaved A/B of q_dedup_minhash structural variants.

V0: current shipped form (collapse_exact=True).
V1: members projected+persisted once (the collapse path executes the
    scan->normalize->join-classes subtree 3x today: mem_a, mem_b, within).
V2: V1 + no sigs persist (the band self-join's two sides share one
    Exchange via ReusedExchange; sigs has no other consumer).

Each variant's output is collected and compared to V0's to prove
equivalence before any timing is trusted.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_wrangle_openstreetmaps_data_spark import catalog
from data_wrangle_openstreetmaps_data_spark.functions.text import normalize_ws, round4
from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
    _jaccard_from_counts,
    _minhash_pairs_raw,
    _shingle_hashes,
    band_rows,
    minhash_signatures,
)
from data_wrangle_openstreetmaps_data_spark.plans import queries as Q
from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def raw_pairs_nosigpersist(df, text_col, id_col, n_hashes, bands, shingle_k, threshold):
    sh = _shingle_hashes(df, text_col, id_col, shingle_k)
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k, sh=sh)
    banded = band_rows(sigs, n_hashes, bands)
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
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        cand.join(sh.select(F.col("id").alias("id_a"), "s"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("s").alias("s")), on=["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return _jaccard_from_counts(common, sizes, threshold), [sh]


def variant(df, persist_members: bool, persist_sigs: bool,
            n_hashes=16, bands=8, shingle_k=3, threshold=0.5):
    text_col, id_col = "text", "doc_id"
    caches = []
    norm = df.select(
        F.col(id_col).alias("m_id"), normalize_ws(text_col).alias("_nt")
    )
    classes = norm.groupBy("_nt").agg(
        F.min("m_id").alias("rep"), F.count(F.lit(1)).alias("csize")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    caches.append(classes)
    members = norm.join(classes, "_nt").select(
        "m_id", "rep", (F.col("_nt") != "").alias("_nonempty")
    )
    if persist_members:
        members = members.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(members)
    reps = classes.select(F.col("rep").alias(id_col), F.col("_nt").alias(text_col))
    if persist_sigs:
        rep_pairs = _minhash_pairs_raw(
            reps, text_col, id_col, n_hashes, bands, shingle_k, threshold, caches
        )
    else:
        rep_pairs, cs = raw_pairs_nosigpersist(
            reps, text_col, id_col, n_hashes, bands, shingle_k, threshold
        )
        caches.extend(cs)
    mem_a = members.select(F.col("rep").alias("id_a"), F.col("m_id").alias("ma"))
    mem_b = members.select(F.col("rep").alias("id_b"), F.col("m_id").alias("mb"))
    cross = (
        rep_pairs.join(mem_a, "id_a")
        .join(mem_b, "id_b")
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "jaccard",
        )
    )
    w1 = members.filter(F.col("_nonempty")).select("rep", "m_id")
    within = (
        w1.alias("x")
        .join(w1.alias("y"), "rep")
        .filter(F.col("x.m_id") < F.col("y.m_id"))
        .select(
            F.col("x.m_id").alias("id_a"),
            F.col("y.m_id").alias("id_b"),
            round4(F.lit(1.0)).alias("jaccard"),
        )
    )
    out = cross.unionByName(within).orderBy("id_a", "id_b")
    return out, caches


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
    spark = get_spark("ab_minhash")
    spark.sparkContext.setLogLevel("ERROR")
    docs = catalog.table(spark, SF, "documents")
    noop(docs)

    # equivalence first
    base = sorted(
        tuple(r) for r in Q.REGISTRY["q_dedup_minhash"].spark(spark, SF).collect()
    )
    for pm, ps, name in ((True, True, "V1"), (True, False, "V2")):
        out, caches = variant(docs, pm, ps)
        got = sorted(tuple(r) for r in out.collect())
        assert got == base, f"{name} output differs!"
        for c in caches:
            c.unpersist()
    print("equivalence OK: V1, V2 match shipped output", flush=True)

    def time_variant(pm, ps):
        out, caches = variant(docs, pm, ps)
        noop(out)
        for c in caches:
            c.unpersist()

    for rnd in range(2):
        run("V0 shipped", lambda: noop(Q.REGISTRY["q_dedup_minhash"].spark(spark, SF)), n=3)
        run("V1 members-persist", lambda: time_variant(True, True), n=3)
        run("V2 members-persist+no-sigs-persist", lambda: time_variant(True, False), n=3)
    spark.stop()


if __name__ == "__main__":
    main()
