"""Focused pins for the round-13 optimization-round internals changes
(OPTIMIZATION_r13.md): each rewrite is schedule/structure-only, so these
tests assert the NEW form's output equals the OLD form inlined verbatim
on planted data — the same equivalence the round's A/B scripts asserted
before timing, kept green forever here."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_wrangle_openstreetmaps_data_spark.operators import dedup, similarity
from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import _mat


def _pairs(spark):
    # two components: {1,2,3} (path) and {7,8}; jaccard payload unused
    rows = [(1, 2, 0.9), (2, 3, 0.8), (7, 8, 0.7)]
    return spark.createDataFrame(rows, ["id_a", "id_b", "jaccard"])


def test_dup_clusters_explode_edges_match_union_form(spark):
    """The r13 one-execution explode symmetrization must yield exactly
    the distinct union of both orientations (the pre-r13 form)."""
    pairs = _pairs(spark)
    new_edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                    F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .distinct()
    )
    old_edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
    )
    assert sorted(map(tuple, new_edges.collect())) == sorted(
        map(tuple, old_edges.collect())
    )
    # and the clusters built on them are the component minima
    cc = {r["id"]: r["cluster_id"] for r in dedup.dup_clusters(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_bm25_single_tokenize_pass_matches_reference(spark):
    """bm25_search's one persisted tokenize pass (r13) must score
    identically to the textbook multi-pass formulation."""
    import math

    rows = [
        (0, "spark shuffles data across the cluster"),
        (1, "spark caches data in memory"),
        (2, "ducks swim in the pond"),
        (3, "data pipelines move data between spark jobs"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: r["score"]
        for r in similarity.bm25_search(docs, ["spark", "data"], k=4).collect()
    }
    # reference: plain python BM25 over the same whitespace tokens
    toks = {i: t.lower().split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75
    exp = {}
    for i, tk in toks.items():
        s = 0.0
        for term in ("spark", "data"):
            tf = tk.count(term)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if s > 0:
            exp[i] = int(s * 10000 + 0.5) / 10000  # round4 floor trick
    for i, score in exp.items():
        assert abs(got[i] - score) < 5e-4, (i, got.get(i), score)


def test_mat_is_lazy_persist(spark):
    """_mat (r13) must set the storage level WITHOUT scheduling an eager
    count job — laziness is observable as is_cached=True while the
    underlying RDD has no materialized partitions yet."""
    df = _mat(spark.range(1000).select((F.col("id") * 2).alias("v")))
    assert df.storageLevel == StorageLevel.MEMORY_AND_DISK
    # values unaffected by the persist
    assert df.agg(F.sum("v")).collect()[0][0] == 999000
    df.unpersist()


def test_minhash_collapse_members_persist_output_unchanged(spark):
    """The persisted members projection (r13) must not change the pair
    set on a corpus with exact + near dups (expansion exactness)."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near dup
        (3, "totally different words live in this document here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in dedup.dedup_minhash_lsh(
            docs, n_hashes=16, bands=8, shingle_k=3, threshold=0.5
        ).collect()
    )
    # raw member-level path is the ground truth for the expansion
    raw = sorted(
        (r["id_a"], r["id_b"])
        for r in dedup.dedup_minhash_lsh(
            docs, n_hashes=16, bands=8, shingle_k=3, threshold=0.5,
            collapse_exact=False,
        ).collect()
    )
    assert got == raw
    assert (0, 1) in got  # the exact-dup pair survives the collapse
