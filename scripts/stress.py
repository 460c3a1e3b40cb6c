"""Scale-stress check: run headline operators at ~10× sf0.1 (≈6M lineitem
rows) by replicating the fact tables with shifted keys, plus a skewed-join
probe (one key owning ~33% of rows) to exercise AQE skew handling.

Prints one JSON line. The thing to look at: wall times should scale
roughly linearly with the 10× data (shuffle-bound ops), and the skewed
join should complete without a straggler dominating.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.operators.topk import (
    topk_group_count,
    topk_per_group,
)
from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("STRESS_FACTOR", "10"))


def replicate(df, key_cols: list[str], factor: int):
    """factor× the data with shifted keys (distinct key spaces per copy)."""
    rep = df.withColumn("_copy", F.explode(F.array(*[F.lit(i) for i in range(factor)])))
    for k in key_cols:
        rep = rep.withColumn(k, F.col(k) + F.col("_copy") * 10_000_000)
    return rep.drop("_copy")


def main() -> None:
    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    li = replicate(
        table(spark, SF_DIR, "lineitem"), ["l_orderkey"], FACTOR
    )
    ev = replicate(table(spark, SF_DIR, "events"), ["event_id"], FACTOR)

    t0 = time.perf_counter()
    n_li = li.count()
    timings["materialize_count"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    topk_group_count(ev, "event_type", 10, "event_type").write.format(
        "noop"
    ).mode("overwrite").save()
    timings["topk_group_count"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(20,6)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .write.format("noop").mode("overwrite").save()
    )
    timings["tpch_q1_core"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    topk_per_group(li, "l_returnflag", "l_linestatus", 2).write.format(
        "noop"
    ).mode("overwrite").save()
    timings["topk_per_group"] = round(time.perf_counter() - t0, 2)

    # skewed join: hot key owns ~1/3 of the fact side
    orders = table(spark, SF_DIR, "orders")
    skewed = li.withColumn(
        "jk",
        F.when(F.col("l_linenumber") % 3 == 0, F.lit(1)).otherwise(
            F.pmod(F.col("l_orderkey"), 15000)
        ),
    )
    dim = orders.select(
        F.pmod(F.col("o_orderkey"), 15000).alias("jk"), "o_orderpriority"
    ).dropDuplicates(["jk"])
    t0 = time.perf_counter()
    n_join = skewed.join(dim.hint("merge"), "jk").count()
    timings["skewed_sort_merge_join"] = round(time.perf_counter() - t0, 2)

    # curation ops at 100× documents (~500k docs) / 100× embeddings
    # (~500k vectors): per-doc aggregations and the Arrow SRP projection
    # must stay linear — these are the text-pipeline hot paths
    from data_wrangle_openstreetmaps_data_spark.operators import (
        curation,
        dedup,
    )
    from data_wrangle_openstreetmaps_data_spark.operators.similarity import (
        _seeded_projections,
    )

    docs = replicate(table(spark, SF_DIR, "documents"), ["doc_id"], 100)
    t0 = time.perf_counter()
    curation.gopher_quality_stats(docs).write.format("noop").mode(
        "overwrite"
    ).save()
    timings["gopher_quality_100x_docs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    dedup.dedup_exact(docs).write.format("noop").mode("overwrite").save()
    timings["dedup_exact_100x_docs"] = round(time.perf_counter() - t0, 2)

    # round-3 curation-wave stages at the same 100× (~500k docs): each
    # must stay roughly linear — they are scan + doc-keyed aggregation
    # shapes with no all-pairs or single-partition stage
    t0 = time.perf_counter()
    curation.pii_scrub(docs).select(
        "doc_id", "n_email", "n_ip", "n_phone", "scrubbed"
    ).write.format("noop").mode("overwrite").save()
    timings["pii_scrub_100x_docs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    from data_wrangle_openstreetmaps_data_spark.functions import text as tx

    curation.quantile_filter(
        docs, quality_col=tx.quality_score("text"),
        min_quantile=0.25, strata_col="lang",
    ).write.format("noop").mode("overwrite").save()
    timings["quantile_filter_100x_docs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    bench_docs = table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % 29 == 0
    )
    curation.decontaminate_overlap(
        docs, bench_docs, k=5, min_shared=1
    ).write.format("noop").mode("overwrite").save()
    timings["decontaminate_100x_train"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    curation.pack_sequences(docs, ctx_len=2048).write.format("noop").mode(
        "overwrite"
    ).save()
    timings["pack_sequences_100x_docs"] = round(time.perf_counter() - t0, 2)

    # round-6 event-time wave at 10× events (~100k): user-keyed window
    # frames and the cohort matrix must stay shuffle-linear
    from data_wrangle_openstreetmaps_data_spark.catalog import event_ts_us

    ev10 = replicate(table(spark, SF_DIR, "events"), ["event_id"], FACTOR)
    ev10 = ev10.withColumn("tsn", event_ts_us(ev10))
    t0 = time.perf_counter()
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id").orderBy("tsn")
        .rangeBetween(-7 * 86400 * 10**6, 0)
    )
    ev10.select(
        "user_id", "event_id",
        F.count(F.lit(1)).over(w).alias("roll_cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).alias("roll_sum"),
    ).write.format("noop").mode("overwrite").save()
    timings["rolling_window_10x_events"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    day = F.date_format(F.timestamp_micros(F.col("tsn")), "yyyy-MM-dd")
    ud = ev10.select("user_id", day.alias("d")).distinct()
    first = ud.groupBy("user_id").agg(F.min("d").alias("cd"))
    (
        ud.join(first, "user_id").groupBy("cd", "d")
        .agg(F.count_distinct(F.col("user_id")).alias("n"))
        .write.format("noop").mode("overwrite").save()
    )
    timings["cohort_retention_10x_events"] = round(time.perf_counter() - t0, 2)

    # round-6 layout/compaction wave: argmax compaction at 10× events and
    # chunk-fingerprint dedup at 100× docs — both must stay one-shuffle
    t0 = time.perf_counter()
    (
        ev10.groupBy("user_id")
        .agg(F.max(F.struct("tsn", "event_id", "event_type")).alias("m"))
        .write.format("noop").mode("overwrite").save()
    )
    timings["latest_per_key_10x_events"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    chunked = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(16)
            )
        ).alias("start"),
    )
    fp = F.substring(
        F.md5(F.array_join(F.slice(F.col("toks"), F.col("start") + 1, 16), " ")),
        1, 16,
    )
    (
        chunked.select(fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .write.format("noop").mode("overwrite").save()
    )
    timings["chunk_dedup_100x_docs"] = round(time.perf_counter() - t0, 2)

    emb = replicate(table(spark, SF_DIR, "embeddings"), ["vec_id"], 100)
    planes = _seeded_projections(64, 32, 42)
    t0 = time.perf_counter()
    (
        dedup._srp_bucketed_arrow(emb, "vec_id", "embedding", planes, 8, 4)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .write.format("noop").mode("overwrite").save()
    )
    timings["srp_bucket_100x_embeddings"] = round(time.perf_counter() - t0, 2)

    # round-6 second wave: TPC-H Q21's per-order aggregate rewrite at 10×
    # lineitem, the blocked KMV min-k and the CMS build at 10× events, and
    # the per-user-distinct co-occurrence self-join — each must stay a
    # keyed-shuffle shape with no funnel
    t0 = time.perf_counter()
    (
        li.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.col("l_linenumber") % 5 == 0).alias("any_flag"))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.count(F.when(F.col("any_flag"), 1)).alias("n_flag"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_flag") == 1))
        .write.format("noop").mode("overwrite").save()
    )
    timings["q21_order_stats_10x_lineitem"] = round(time.perf_counter() - t0, 2)

    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )
    from data_wrangle_openstreetmaps_data_spark.operators.sketch import cms_build
    from data_wrangle_openstreetmaps_data_spark.operators.topk import bottom_k

    t0 = time.perf_counter()
    uh = ev10.select(
        "event_type",
        portable_token_hash(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    (
        bottom_k(uh, ["event_type"], "h", 64)
        .groupBy("event_type").agg(F.max("h").alias("hk"))
        .write.format("noop").mode("overwrite").save()
    )
    timings["kmv_bottomk_10x_events"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cms_build(ev10, "user_id", depth=4, width=64).write.format("noop").mode(
        "overwrite"
    ).save()
    timings["cms_build_10x_events"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ut = ev10.select("event_type", "user_id").distinct()
    (
        ut.select(F.col("event_type").alias("t1"), "user_id")
        .join(ut.select(F.col("event_type").alias("t2"), "user_id"), "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_ab"))
        .write.format("noop").mode("overwrite").save()
    )
    timings["cooccurrence_10x_events"] = round(time.perf_counter() - t0, 2)

    # round-7: salted-vs-unsalted A/B on the SAME skewed fixture (hot key
    # owns ~1/3 of the fact side). Both forms are pinned to shuffle_hash
    # so AQE's sort-merge skew split cannot mask the difference: unsalted
    # sends the hot key to ONE reducer; salted spreads it over 8.
    from data_wrangle_openstreetmaps_data_spark.operators.skew import (
        salted_join,
    )

    t0 = time.perf_counter()
    n_unsalted = skewed.join(dim.hint("shuffle_hash"), "jk").count()
    timings["skewed_join_unsalted_shuffle_hash"] = round(
        time.perf_counter() - t0, 2
    )
    t0 = time.perf_counter()
    n_salted = salted_join(
        skewed, dim.hint("shuffle_hash"), "jk", salt_buckets=8,
        salt_cols=["l_orderkey", "l_linenumber"],
    ).count()
    timings["skewed_join_salted_x8"] = round(time.perf_counter() - t0, 2)
    assert n_salted == n_unsalted, (n_salted, n_unsalted)

    # round-7: the flagship banded minhash join at 100× docs (~500k) with
    # planted near-dups. Candidate generation must stay a key-equality
    # shuffle whose volume is O(n·bands), NOT O(n²): we record the exact
    # candidate-pair count (Σ C(bucket,2) over band buckets) and recall
    # of the planted pairs alongside wall time.
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        band_rows,
        dedup_minhash_lsh,
        minhash_signatures,
    )

    n_docs = 500_000
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    grp = F.when(
        F.col("doc_id") % 997 == 0, F.col("doc_id") + 1
    ).otherwise(F.col("doc_id"))
    toks = [
        F.substring(
            F.md5(F.concat(grp.cast("string"), F.lit(f"-{i}"))), 1, 8
        )
        for i in range(40)
    ]
    text_col = F.concat_ws(" ", *toks)
    text_col = F.when(
        F.col("doc_id") % 997 == 0, F.concat(text_col, F.lit(" tail"))
    ).otherwise(text_col)
    corpus = ids.select("doc_id", text_col.alias("text"))
    n_planted = n_docs // 997 + (1 if n_docs % 997 else 0)

    t0 = time.perf_counter()
    pairs = dedup_minhash_lsh(
        corpus, n_hashes=16, bands=4, shingle_k=5, threshold=0.7
    )
    found = pairs.filter(
        (F.col("id_a") % 997 == 0) & (F.col("id_b") == F.col("id_a") + 1)
    ).count()
    n_pairs = pairs.count()
    timings["minhash_lsh_100x_docs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    sigs = minhash_signatures(corpus, "text", "doc_id", 16, 5)
    cand_pairs = (
        band_rows(sigs, 16, 4)
        .groupBy("band", "band_sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cp"))
        .collect()[0]["cp"]
    )
    timings["minhash_band_histogram_100x_docs"] = round(
        time.perf_counter() - t0, 2
    )

    # round-8: the embedding near-dup tier at 100× vectors (~500k, dim
    # 64) with planted near-dups — the semantic analog of the minhash
    # entry above. Candidate generation is the banded-SRP key-equality
    # join, and the sizing rule IS the scale lesson: random (cos≈0)
    # pairs collide per band with probability 2^-r, so candidates ≈
    # n²/2 · b · 2^-r — r must grow like log2(n²b/budget), not stay at
    # the small-corpus default (r=4 → 31k vectors/bucket; even r=16
    # leaves ~13M structural collisions at n=500k; measured 30.7M with
    # hash-synthetic vectors). r=28 puts the expectation at ~4k pairs
    # while a planted pair at cosine ≈ 0.9999 still survives banding
    # with p = 1-(1-(1-θ/π)^31)^8 ≈ 1-1e-8 — recall must stay exact.
    # (r=31 is the int32 bucket ceiling; measured: r=16 → 30.7M
    # candidates, r=28 → 35k, r=31 → see STRESS_r08.json.)
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        _srp_bucketed_arrow,
        embedding_near_dup_pairs,
    )

    e_dim, e_bands, e_rows = 64, 8, 31
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
    )
    n_vplanted = n_vecs // 997 + (1 if n_vecs % 997 else 0)

    t0 = time.perf_counter()
    vpairs = embedding_near_dup_pairs(
        vecs, threshold=0.9, bands=e_bands, rows_per_band=e_rows,
        dim=e_dim,
    )
    v_found = vpairs.filter(
        (F.col("id_a") % 997 == 0) & (F.col("id_b") == F.col("id_a") + 1)
    ).count()
    n_vpairs = vpairs.count()
    timings["embedding_neardup_100x_vecs"] = round(
        time.perf_counter() - t0, 2
    )

    t0 = time.perf_counter()
    vplanes = _seeded_projections(e_dim, e_bands * e_rows, 42)
    v_cand = (
        _srp_bucketed_arrow(
            vecs, "vec_id", "embedding", vplanes, e_bands, e_rows
        )
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cp"))
        .collect()[0]["cp"]
    )
    timings["embedding_bucket_histogram_100x_vecs"] = round(
        time.perf_counter() - t0, 2
    )

    # Arrow partial-Gram covariance kernel at 500k vectors: each batch
    # ships one 9x9 int64 matrix, so the reduce is O(partitions), not
    # O(rows). Exactness invariant: int64 grid sums are associative, so
    # two different partitionings MUST produce bit-identical cells —
    # that equality is the whole point of the grid-integer design.
    from data_wrangle_openstreetmaps_data_spark.operators.similarity import (
        gram_partial,
    )

    t0 = time.perf_counter()
    g1 = {
        (r["i"], r["j"]): r["s"]
        for r in gram_partial(vecs.repartition(64), dims=8).collect()
    }
    timings["gram_covariance_500k_vecs"] = round(
        time.perf_counter() - t0, 2
    )
    g2 = {
        (r["i"], r["j"]): r["s"]
        for r in gram_partial(vecs.repartition(7), dims=8).collect()
    }
    gram_exact = g1 == g2 and g1[(8, 8)] == n_vecs

    # round-9: whale-key degree cap (graph.cap_degree) under a PLANTED
    # deg-10⁴ whale customer: the uncapped common-neighbor self-join
    # pays C(10⁴,2) ≈ 5·10⁷ pairs for that one key; the capped graph
    # pays C(32,2) = 496. The cap (32) sits ABOVE the planted normal
    # degree (10) — the whales-only regime: every normal key keeps all
    # its edges, so only the whale's contribution is approximated.
    # (A first run with cap=8 < normal degree measured recall 3/20 —
    # capping below the bulk degree re-weights EVERY key and is a
    # different estimator, the regime q_resource_allocation_capped
    # documents; the whale guard wants cap > normal-degree ceiling.)
    # Recall accounting: overlap of the capped RA top-20 with the exact
    # top-20 (the whale's 1/deg weight is tiny, so the exact ranking is
    # dominated by normal keys and the capped estimator should recover
    # it up to ties at the boundary).
    from data_wrangle_openstreetmaps_data_spark.operators.graph import (
        cap_degree,
    )

    n_cust, whale_deg = 50_000, 10_000
    base = (
        spark.range(n_cust)
        .select(F.col("id").alias("c"))
        .withColumn(
            "j", F.explode(F.array(*[F.lit(i) for i in range(10)]))
        )
        .select(
            "c",
            (F.pmod(F.hash(F.col("c"), F.col("j")), F.lit(10_000)))
            .cast("long")
            .alias("s"),
        )
    )
    whale = (
        spark.range(whale_deg)
        .select(
            F.lit(n_cust).cast("long").alias("c"),
            F.col("id").alias("s"),
        )
    )
    wedges = base.unionByName(whale).distinct().localCheckpoint(eager=True)

    def ra_top20(e):
        cd = e.groupBy("c").agg(F.count(F.lit(1)).alias("cd"))
        wtd = e.join(cd, "c").select(
            "c",
            F.col("s").alias("s1"),
            F.floor(F.lit(1e9) / F.col("cd") + F.lit(0.5))
            .cast("long")
            .alias("w"),
        )
        p = (
            wtd.join(e.select("c", F.col("s").alias("s2")), "c")
            .filter(F.col("s1") < F.col("s2"))
            .groupBy("s1", "s2")
            .agg(F.sum("w").alias("ra9"))
        )
        return p

    t0 = time.perf_counter()
    exact_pairs = ra_top20(wedges).localCheckpoint(eager=True)
    n_exact_pairs = exact_pairs.count()
    exact_top = [
        (r["s1"], r["s2"])
        for r in exact_pairs.orderBy(F.desc("ra9"), "s1", "s2")
        .limit(20)
        .collect()
    ]
    t_exact = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    wcapped = cap_degree(wedges, "c", "s", cap=32).localCheckpoint(
        eager=True
    )
    capped_pairs = ra_top20(wcapped).localCheckpoint(eager=True)
    n_capped_pairs = capped_pairs.count()
    capped_top = [
        (r["s1"], r["s2"])
        for r in capped_pairs.orderBy(F.desc("ra9"), "s1", "s2")
        .limit(20)
        .collect()
    ]
    t_capped = round(time.perf_counter() - t0, 2)
    timings["whale_exact_ra"] = t_exact
    timings["whale_capped_ra"] = t_capped
    whale_recall = len(set(exact_top) & set(capped_top))

    # round-9: sharded exact k-NN graph build — 10⁴ sources against the
    # full 500k corpus with the corpus as a DATAFRAME (the r8 verdict's
    # named driver-OOM liability removed). n_shards=16 bounds each
    # cogroup cell at ~31k corpus vectors + 2.5k sources; driver never
    # holds vectors. Correctness probe: three sources' edges must equal
    # the relational exact top-k (cosine_topk), which scans the corpus
    # with a narrow projection.
    from data_wrangle_openstreetmaps_data_spark.operators.similarity import (
        cosine_topk,
        knn_graph_sharded,
    )

    n_src, knn_k = 10_000, 8
    srcs = vecs.filter(F.col("vec_id") < n_src)
    t0 = time.perf_counter()
    kg = knn_graph_sharded(
        srcs, vecs, k=knn_k, n_shards=16, n_src_blocks=4
    ).localCheckpoint(eager=True)
    n_edges = kg.count()
    timings["knn_graph_10k_x_500k"] = round(time.perf_counter() - t0, 2)
    knn_probe_ok = True
    for probe in (0, 4999, 9973):
        pvec = [
            float(x)
            for x in vecs.filter(F.col("vec_id") == probe)
            .select("embedding")
            .first()[0]
        ]
        exact = [
            (r["vec_id"], r["sim"])
            for r in cosine_topk(
                vecs.filter(F.col("vec_id") != probe), pvec, k=knn_k
            ).collect()
        ]
        got = [
            (r["dst"], round(r["sim"], 4))
            for r in kg.filter(F.col("src") == probe)
            .orderBy(F.desc("sim"), "dst")
            .collect()
        ]
        if got != exact:
            knn_probe_ok = False

    print(
        json.dumps(
            {
                "metric": "stress_wall",
                "unit": "sec",
                "factor": FACTOR,
                "lineitem_rows": n_li,
                "skewed_join_rows": n_join,
                "minhash_100x": {
                    "docs": n_docs,
                    "planted_pairs": n_planted,
                    "planted_found": found,
                    "verified_pairs": n_pairs,
                    "candidate_pairs": int(cand_pairs),
                    "candidate_ratio": round(cand_pairs / n_docs, 4),
                },
                "embedding_100x": {
                    "vectors": n_vecs,
                    "planted_pairs": n_vplanted,
                    "planted_found": v_found,
                    "verified_pairs": n_vpairs,
                    "candidate_pairs": int(v_cand),
                    "candidate_ratio": round(v_cand / n_vecs, 4),
                },
                "gram_500k": {
                    "vectors": n_vecs,
                    "cells": len(g1),
                    "partitioning_invariant": gram_exact,
                },
                "whale_cap": {
                    "customers": n_cust,
                    "whale_degree": whale_deg,
                    "uncapped_pairs": n_exact_pairs,
                    "capped_pairs": n_capped_pairs,
                    "cap": 32,
                    "whale_pair_bound": 496,
                    "recall_top20": whale_recall,
                },
                "knn_graph_500k": {
                    "sources": n_src,
                    "corpus": n_vecs,
                    "edges": n_edges,
                    "edges_expected": n_src * knn_k,
                    "probes_match_exact_topk": knn_probe_ok,
                    "driver_collects_vectors": 0,
                },
                "timings": timings,
                "value": round(sum(timings.values()), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
