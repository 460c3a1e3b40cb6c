"""Similarity search: brute-force exactness + LSH recall on real
embeddings (sf0.001) and structural properties of the bucketed paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.operators import similarity
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF_SMALL, "embeddings").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return list(emb.filter(F.col("vec_id") == 0).first()["embedding"])


def test_cosine_topk_self_is_top(emb, qvec):
    got = similarity.cosine_topk(emb, qvec, k=5).collect()
    assert got[0]["vec_id"] == 0
    assert got[0]["sim"] == pytest.approx(1.0, abs=1e-3)
    sims = [r["sim"] for r in got]
    assert sims == sorted(sims, reverse=True)


def test_lsh_bucket_contains_query_and_subsets_bruteforce(emb, qvec):
    brute = {r["vec_id"]: r["sim"] for r in similarity.cosine_topk(emb, qvec, k=50).collect()}
    approx = similarity.lsh_bucket_topk(emb, qvec, k=10).collect()
    ids = [r["vec_id"] for r in approx]
    assert 0 in ids  # the query's own vector is in its own bucket
    # sims reported by the approx path equal the exact sims
    for r in approx:
        if r["vec_id"] in brute:
            assert r["sim"] == pytest.approx(brute[r["vec_id"]], abs=1e-9)


def test_arrow_cosine_matches_expression_fold(emb, qvec):
    expr = similarity.cosine_topk(emb, qvec, k=20).collect()
    arrow = similarity.cosine_topk_arrow(emb, qvec, k=20).collect()
    e = {r["vec_id"]: r["sim"] for r in expr}
    a = {r["vec_id"]: r["sim"] for r in arrow}
    # same candidates modulo rounding-boundary ties; sims agree to 4dp ± ulp
    common = set(e) & set(a)
    assert len(common) >= 18
    for vid in common:
        assert a[vid] == pytest.approx(e[vid], abs=2e-4)


def test_ivf_topk_recall(emb, qvec):
    brute = [r["vec_id"] for r in similarity.cosine_topk(emb, qvec, k=10).collect()]
    ivf = similarity.ivf_topk(emb, qvec, k=10, n_lists=8, nprobe=3).collect()
    ids = [r["vec_id"] for r in ivf]
    assert 0 in ids  # query's own vector found
    # decent recall of the exact top-10 with 3/8 lists probed
    assert len(set(ids) & set(brute)) >= 5
    sims = [r["sim"] for r in ivf]
    assert sims == sorted(sims, reverse=True)


def test_ivf_probe_all_lists_equals_exact(emb, qvec):
    """The contract behind q_embedding_topk_ivf's oracle: probing ALL
    lists yields exactly the brute-force top-k (independent of the KMeans
    clustering), while still running the full IVF machinery."""
    brute = [(r["vec_id"], r["sim"])
             for r in similarity.cosine_topk(emb, qvec, k=10).collect()]
    ivf = [(r["vec_id"], r["sim"])
           for r in similarity.ivf_topk(
               emb, qvec, k=10, n_lists=8, nprobe=8
           ).collect()]
    assert ivf == brute


def test_ann_index_query_many(spark, emb, qvec):
    idx = similarity.AnnIndex(emb)
    try:
        r1 = idx.query(qvec, k=5).collect()
        assert r1[0]["vec_id"] == 0
        # a second, different query reuses the same persisted bucketing
        q2 = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
        r2 = idx.query(q2, k=5).collect()
        assert r2[0]["vec_id"] == 7
        # multiprobe widens the candidate set monotonically
        single = {r["vec_id"] for r in idx.query(qvec, k=50, probes=1).collect()}
        multi = {r["vec_id"] for r in idx.query(qvec, k=50, probes=2).collect()}
        assert len(multi) >= len(single)
    finally:
        idx.unpersist()


def test_knn_join_respects_k_and_excludes_self(spark, emb):
    sub = emb.limit(60)
    got = similarity.knn_join(sub, sub, k=3).collect()
    assert all(r["lid"] != r["rid"] for r in got)
    from collections import Counter
    per_left = Counter(r["lid"] for r in got)
    assert all(c <= 3 for c in per_left.values())
    assert all(1 <= r["rn"] <= 3 for r in got)


def test_ivf_probe_pruning_cuts_candidates(emb, qvec):
    """nprobe < n_lists must actually PRUNE: the probed candidate set is
    a strict subset of the corpus (this is what partition pruning on a
    _list-partitioned store would skip on disk), while recall of the
    exact top-10 stays useful."""
    assigned, model = similarity.ivf_index(emb, n_lists=8)
    probe = similarity.ivf_probe_lists(model.clusterCenters(), qvec, 3)
    assert len(probe) == 3 and len(set(probe)) == 3
    n_all = assigned.count()
    n_cand = assigned.filter(F.col("_list").isin(*probe)).count()
    assert 0 < n_cand < n_all
    brute = [r["vec_id"]
             for r in similarity.cosine_topk(emb, qvec, k=10).collect()]
    ivf = [r["vec_id"]
           for r in similarity.ivf_topk(
               emb, qvec, k=10, n_lists=8, nprobe=3
           ).collect()]
    assert len(set(ivf) & set(brute)) >= 5


def test_ann_index_store_roundtrip_and_prune(spark, emb, qvec, tmp_path):
    """Disk-backed AnnIndex: write_store partitions by bucket; from_store
    answers the same multiprobe queries from a PARTITION-PRUNED scan (the
    at-rest 100 TB shape — probe buckets' directories only)."""
    mem = similarity.AnnIndex(emb, n_planes=4, persist=False)
    store = str(tmp_path / "ann_store")
    mem.write_store(store)
    disk = similarity.AnnIndex.from_store(spark, store)
    for probes in (1, 2):
        got = [(r["vec_id"], r["sim"])
               for r in disk.query(qvec, k=10, probes=probes).collect()]
        want = [(r["vec_id"], r["sim"])
                for r in mem.query(qvec, k=10, probes=probes).collect()]
        assert got == want and len(got) > 0
    # the query plan prunes partitions: bucket filter in PartitionFilters
    plan = disk.query(qvec, k=10, probes=2)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_bucket" in plan
    # and fewer files are scanned than the store holds buckets
    import os
    n_buckets = len([d for d in os.listdir(store) if d.startswith("_bucket=")])
    assert n_buckets > 5  # 4 planes → up to 16 buckets; corpus fills most


def test_ivf_planted_clusters_nprobe1_full_recall(spark):
    """Planted-cluster recall target: 4 well-separated clusters; querying
    a cluster member with nprobe=1 must (a) probe only that cluster's
    list — candidates = 1/4 of the corpus — and (b) still return EXACTLY
    the brute-force top-10 (recall 1.0), because every true neighbour
    lives in the probed list. Deterministic: no RNG, index-derived
    perturbations."""
    dim, per, k_clusters = 16, 50, 4
    rows = []
    for c in range(k_clusters):
        for i in range(per):
            v = [0.0] * dim
            v[c * 4] = 10.0  # cluster axis: orthogonal one-hots
            v[c * 4 + 1 + (i % 3)] = 0.2 + 0.01 * (i % 7)  # tiny spread
            rows.append((c * per + i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qvec = rows[7][1]

    brute = [r["vec_id"]
             for r in similarity.cosine_topk(emb, qvec, k=10).collect()]
    assert all(v < per for v in brute)  # sanity: true top-10 ⊂ cluster 0

    assigned, model = similarity.ivf_index(emb, n_lists=k_clusters, seed=42)
    probe = similarity.ivf_probe_lists(model.clusterCenters(), qvec, 1)
    n_cand = assigned.filter(F.col("_list").isin(*probe)).count()
    assert n_cand == per  # pruned to exactly the planted cluster

    ivf = [r["vec_id"]
           for r in similarity.ivf_topk(
               emb, qvec, k=10, n_lists=k_clusters, nprobe=1, seed=42
           ).collect()]
    assert ivf == brute  # recall 1.0 at 4x pruning


def test_nearest_centroid_confusion_counts(spark):
    """Planted 2-label corpus with one deliberate defector: vectors sit on
    orthogonal label axes except vec 99, which points at the OTHER
    label's axis — the confusion counts must put exactly that one vector
    off-diagonal, and the diagonal must carry everything else."""
    rows = []
    for i in range(40):
        v = [0.0] * 8
        v[0 if i < 20 else 4] = 1.0 + 0.001 * (i % 5)
        rows.append((i, v, 0 if i < 20 else 1))
    defector = [0.0] * 8
    defector[4] = 1.0  # labelled 0, embedded with label 1's cluster
    rows.append((99, defector, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        (r["label"], r["assigned"]): r["cnt"]
        for r in similarity.nearest_centroid(emb).collect()
    }
    assert got[(0, 0)] == 20
    assert got[(1, 1)] == 20
    assert got[(0, 1)] == 1  # the defector, and nothing else
    assert (1, 0) not in got


def test_kmeans_iteration_pulls_defector_into_right_cluster(spark):
    """Same planted corpus as the confusion test: after one Lloyd
    iteration the defector (labelled 0, embedded on label 1's axis) is
    counted in cluster 1's recomputed centroid — cluster sizes 20/21 —
    and each centroid stays dominated by its own axis."""
    rows = []
    for i in range(40):
        v = [0.0] * 8
        v[0 if i < 20 else 4] = 1.0 + 0.001 * (i % 5)
        rows.append((i, v, 0 if i < 20 else 1))
    defector = [0.0] * 8
    defector[4] = 1.0
    rows.append((99, defector, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = similarity.kmeans_iteration(emb).collect()
    sizes = {r["assigned"]: r["n"] for r in out}
    assert sizes == {0: 20, 1: 21}
    cent = {(r["assigned"], r["pos"]): r["centroid"] for r in out}
    assert cent[(0, 0)] > 0.9 and cent[(0, 4)] == 0.0
    assert cent[(1, 4)] > 0.9 and cent[(1, 0)] == 0.0


def test_gram_partial_matches_numpy_exactly(spark):
    """gram_partial's int64 partial Grams must equal a single-process
    numpy computation on the same 1e-4 grid — across multiple Arrow
    batches/partitions (sums are exact integers, so equality is exact,
    not approximate)."""
    import numpy as np

    rng_vals = [
        [((i * 31 + j * 17) % 200 - 100) / 73.0 for j in range(8)]
        for i in range(257)
    ]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng_vals)],
        "vec_id long, embedding array<double>",
    ).repartition(5)
    got = {
        (r["i"], r["j"]): r["s"]
        for r in similarity.gram_partial(emb, dims=8).collect()
    }
    m = np.asarray(rng_vals, dtype=np.float64)
    vi = np.floor(m * 10000.0 + 0.5).astype(np.int64)
    aug = np.hstack([vi, np.ones((vi.shape[0], 1), dtype=np.int64)])
    g = aug.T @ aug
    for i in range(9):
        for j in range(i, 9):
            assert got[(i, j)] == g[i, j], (i, j)
    assert got[(8, 8)] == 257  # the count cell


def test_centroid_margin_planted_boundary_vector(spark):
    """The defector corpus again: vectors firmly on one axis get a
    large margin; a vector exactly between the two centroids gets a
    margin of ~0 (it is the boundary case the audit exists to flag)."""
    rows = []
    for i in range(40):
        v = [0.0] * 8
        v[0 if i < 20 else 4] = 1.0
        rows.append((i, v, 0 if i < 20 else 1))
    straddler = [0.0] * 8
    straddler[0] = 1.0
    straddler[4] = 1.0  # equidistant from both centroids
    rows.append((99, straddler, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        r["vid"]: r["m4"]
        for r in similarity.centroid_margin(emb).collect()
    }
    assert got[0] > 5000  # firmly clustered: margin >> 0
    # boundary vector: an order of magnitude tighter than the firm ones
    # (not exactly 0 — the straddler pulls its own cluster's centroid)
    assert got[99] < got[0] / 10
