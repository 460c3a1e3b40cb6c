"""Dedup operators on corpora with planted duplicates — this is the
correctness pin for the approximate (rows-only-checked) operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the yard outside"
)
OTHER = (
    "completely different content about spark query engines and columnar "
    "execution with vectorized readers shuffling partitioned data frames"
)


def _corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),          # exact dup of 0
        (2, "  " + BASE.upper() + "  "),  # normalized dup of 0
        (3, NEAR),          # near dup of 0 (one token differs)
        (4, OTHER),
        (5, "tiny doc"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact(spark):
    got = dedup.dedup_exact(_corpus(spark)).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in got}
    assert by_keep[0] == 3  # docs 0,1,2 collapse (case/whitespace normalize)
    assert by_keep[3] == 1
    assert by_keep[4] == 1
    assert by_keep[5] == 1


def test_minhash_finds_planted_near_dups(spark):
    pairs = dedup.dedup_minhash_lsh(
        _corpus(spark), n_hashes=16, bands=4, shingle_k=3, threshold=0.5
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # exact dups must be found with jaccard 1.0; near-dup 0-3 should appear
    assert (0, 1) in found
    assert (0, 2) in found
    assert (0, 3) in found
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert jac[(0, 1)] == 1.0
    assert 0.5 <= jac[(0, 3)] < 1.0
    # unrelated docs never pair
    assert not any(4 in p or 5 in p for p in found)


def test_ngram_jaccard_exact_similarity(spark):
    pairs = dedup.ngram_jaccard_pairs(
        _corpus(spark), shingle_k=3, threshold=0.5
    ).collect()
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert jac[(0, 1)] == 1.0
    assert jac[(0, 2)] == 1.0
    assert 0.5 <= jac[(0, 3)] < 1.0
    assert not any(4 in p or 5 in p for p in jac)


def test_simhash_near_identical_signatures(spark):
    sigs = {r["id"]: r["simhash"] for r in dedup.simhash(_corpus(spark)).collect()}
    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert hamming(sigs[0], sigs[1]) == 0      # identical text
    assert hamming(sigs[0], sigs[3]) <= 12     # near dup → close signature
    assert hamming(sigs[0], sigs[4]) > 12      # unrelated → far


def test_simhash_xxhash_variant(spark):
    # the engine-internal fast path (64-bit xxhash) keeps the same
    # near-dup structure as the portable md5 default
    sigs = {
        r["id"]: r["simhash"]
        for r in dedup.simhash(
            _corpus(spark), bits=64, token_hash="xxhash"
        ).collect()
    }
    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert hamming(sigs[0], sigs[1]) == 0
    assert hamming(sigs[0], sigs[3]) < hamming(sigs[0], sigs[4])
    import pytest
    with pytest.raises(ValueError, match="60 bits"):
        dedup.simhash(_corpus(spark), bits=64, token_hash="md5")


def test_simhash_candidate_pairs(spark):
    pairs = dedup.dedup_simhash(_corpus(spark)).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got[(0, 1)] == 0
    assert (0, 3) in got and got[(0, 3)] <= 12


def test_dup_clusters_connected_components(spark):
    # component {1,2,3,7} via chain 1-2, 2-3, 3-7; component {5,6}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (5, 6)], ["id_a", "id_b"]
    )
    got = {r["id"]: r["cluster_id"] for r in dedup.dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 6: 5}


def test_dedup_keep_representatives(spark):
    corpus = _corpus(spark)
    pairs = dedup.ngram_jaccard_pairs(corpus, shingle_k=3, threshold=0.5)
    kept = dedup.dedup_keep_representatives(corpus, pairs)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # docs 1,2,3 cluster with 0 (rep) and are dropped; 4,5 unaffected
    assert ids == [0, 4, 5]


def test_max_df_cut_bounds_hot_shingle_candidates(spark):
    """Planted stop-shingle: every doc shares one boilerplate prefix, so the
    uncut inverted-index join degenerates toward all-pairs. The max_df cut
    must (1) keep candidates O(n), (2) still find genuinely-similar pairs
    through their non-hot shingles, (3) report EXACT jaccard (full sets)."""
    n = 60
    boiler = "standard legal disclaimer header"
    rows = [
        (i, f"{boiler} unique content token{i} alpha{i} beta{i} gamma{i}")
        for i in range(n)
    ]
    # plant one true near-dup pair (docs n, n+1) sharing unique content
    rows.append((n, f"{boiler} shared payload words here one two three"))
    rows.append((n + 1, f"{boiler} shared payload words here one two four"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # without the cut, at threshold 0 every doc pairs with every other
    # through the boilerplate shingles: ~n²/2 pairs
    uncut = dedup.ngram_jaccard_pairs(df, shingle_k=3, threshold=0.0).count()
    assert uncut > n * 10

    cut = dedup.ngram_jaccard_pairs(
        df, shingle_k=3, threshold=0.0, max_df=0.2
    )
    rows_cut = cut.collect()
    # candidate blow-up suppressed: output stays O(n), not O(n²)
    assert len(rows_cut) < n
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows_cut}
    # the planted pair survives via its cold shingles…
    assert (n, n + 1) in jac
    # …and its jaccard is the EXACT full-set value, not the cut-set value
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, shingle_k=3, threshold=0.0
        ).collect()
    }
    assert jac[(n, n + 1)] == exact[(n, n + 1)]


def test_prefix_filter_join_equals_full_index(spark):
    """PPJoin prefix filtering is LOSSLESS: its output must equal the full
    inverted-index join exactly — on the planted corpus and on real
    testdata documents."""
    from data_wrangle_openstreetmaps_data_spark.catalog import table
    from tests.conftest import SF_SMALL

    for corpus in (_corpus(spark), table(spark, SF_SMALL, "documents")):
        full = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in dedup.ngram_jaccard_pairs(
                corpus, shingle_k=3, threshold=0.5
            ).collect()
        }
        pref = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in dedup.prefix_filter_jaccard_pairs(
                corpus, shingle_k=3, threshold=0.5
            ).collect()
        }
        assert pref == full and len(full) > 0


def test_prefix_filter_prunes_boilerplate(spark):
    """On a corpus where every doc shares boilerplate, the rarest-first
    prefixes exclude the hot shingles, so candidates stay near-linear
    while the result is still exact (no max_df-style recall trade)."""
    n = 60
    boiler = "standard legal disclaimer header"
    rows = [
        (i, f"{boiler} unique content token{i} alpha{i} beta{i} gamma{i}")
        for i in range(n)
    ]
    rows.append((n, f"{boiler} shared payload words here one two three"))
    rows.append((n + 1, f"{boiler} shared payload words here one two four"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.prefix_filter_jaccard_pairs(
            df, shingle_k=3, threshold=0.5
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, shingle_k=3, threshold=0.5
        ).collect()
    }
    assert got == exact
    assert (n, n + 1) in got


def test_lsh_recall_is_total(spark):
    """The contract behind q_dedup_minhash's oracle: with 16 hashes in 8
    two-row bands at threshold 0.5, LSH banding catches EVERY true pair on
    the test corpus, so (after exact-Jaccard verification) the LSH output
    EQUALS the exact trigram-Jaccard pair set."""
    from data_wrangle_openstreetmaps_data_spark.catalog import table
    from tests.conftest import SF_SMALL

    docs = table(spark, SF_SMALL, "documents")
    exact = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            docs, shingle_k=3, threshold=0.5
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.dedup_minhash_lsh(
            docs, n_hashes=16, bands=8, shingle_k=3, threshold=0.5
        ).collect()
    }
    assert len(exact) > 0
    assert lsh == exact


def test_minhash_lsh_prunes_pairs(spark):
    # structural: candidate generation must not be O(n^2) — a corpus of
    # distinct docs yields (near-)zero candidates, not all pairs
    rows = [(i, f"unique document number {i} with token {i*7} and {i*13}")
            for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.dedup_minhash_lsh(df, threshold=0.3).count()
    assert pairs < 50  # far fewer than 50*49/2


def _planted_embeddings(spark, n_base=80, n_dups=15, dim=64):
    """Deterministic corpus: n_base random unit-ish vectors plus n_dups
    near-duplicates of the first n_dups bases (tiny perturbation, so each
    planted pair has cosine >= 0.99)."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base[:n_dups] + 0.02 * rng.standard_normal((n_dups, dim))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [
        (n_base + i, [float(x) for x in v]) for i, v in enumerate(dup)
    ]
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    return spark.createDataFrame(rows, schema)


def test_embedding_lsh_planted_near_dups_all_surface(spark):
    """The recall contract behind q_dedup_embedding: every planted
    near-duplicate pair (cosine >= 0.99; banding survival p > 1 - 1e-9 at
    bands=8/rows_per_band=4) must surface. Deterministic end to end:
    seeded corpus, md5-seeded hyperplanes."""
    df = _planted_embeddings(spark)
    pairs = dedup.embedding_near_dup_pairs(
        df, threshold=0.9, bands=8, rows_per_band=4
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(15):
        assert (i, 80 + i) in got, f"planted pair ({i}, {80 + i}) missed"


def test_embedding_lsh_subset_of_exact(spark):
    """Precision is 1.0 by construction (candidates are exact-cosine
    verified), so the LSH pair set is a subset of the exact all-pairs join
    at the same threshold — with identical round4 cos_sim values — and on
    the fixture corpus every high-cosine (>= 0.9) exact pair survives
    banding."""
    from data_wrangle_openstreetmaps_data_spark.catalog import table
    from tests.conftest import SF_SMALL

    emb = table(spark, SF_SMALL, "embeddings")
    lsh = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in dedup.embedding_near_dup_pairs(
            emb, threshold=0.4, bands=8, rows_per_band=4
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in dedup.exact_cosine_pairs(emb, threshold=0.4).collect()
    }
    assert len(lsh) > 0
    assert lsh <= exact
    high = {t for t in exact if t[2] >= 0.9}
    assert high <= lsh


def test_srp_arrow_matches_native(spark):
    """The Arrow matmul bucketer and the native sequential-fold bucketer
    assign identical (band, bucket) to every vector — the summation-order
    difference never crosses a sign boundary on real (continuous)
    embeddings — so both paths produce the same near-dup pair set."""
    from data_wrangle_openstreetmaps_data_spark.catalog import table
    from data_wrangle_openstreetmaps_data_spark.operators.similarity import (
        _seeded_projections,
    )
    from tests.conftest import SF_SMALL

    emb = table(spark, SF_SMALL, "embeddings")
    planes = _seeded_projections(64, 32, 42)
    native = {
        (r["id"], r["band"], r["bucket"])
        for r in dedup._srp_bucketed_native(
            emb, "vec_id", "embedding", planes, 8, 4
        ).collect()
    }
    arrow = {
        (r["id"], r["band"], r["bucket"])
        for r in dedup._srp_bucketed_arrow(
            emb, "vec_id", "embedding", planes, 8, 4
        ).collect()
    }
    assert len(native) == 500 * 8
    assert arrow == native


def test_dedup_incremental_planted(spark):
    """Batch-vs-corpus merge: duplicates of corpus docs are dropped,
    within-batch duplicates collapse to the min id, novel docs survive."""
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "existing corpus document two")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, "THE  QUICK   brown fox"),   # dup of corpus 1 (normalized)
            (11, "a genuinely new document"),
            (12, "a genuinely  NEW document"), # within-batch dup of 11
            (13, "another novel text"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"] for r in dedup.dedup_incremental(new, corpus).collect()}
    assert got == {11, 13}


def test_minhash_lsh_join_cross_side_only(spark):
    """Cross-corpus near-dup join: finds the planted batch↔corpus near-dup,
    orients it (left, right), and suppresses within-side pairs."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different corpus text about spark plans"),
            (3, "completely different corpus text about spark planning"),  # near-dup of 2 (within-side)
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight"),  # near-dup of 1
            (11, "entirely novel content with no relatives anywhere"),
        ],
        ["doc_id", "text"],
    )
    got = {(r["left_id"], r["right_id"])
           for r in dedup.minhash_lsh_join(
               new, corpus, n_hashes=16, bands=8, shingle_k=3, threshold=0.5
           ).collect()}
    assert (10, 1) in got
    assert all(left in (10, 11) and right in (1, 2, 3) for left, right in got)


def test_embedding_near_dup_join_cross_side(spark):
    """Cross-corpus embedding join: a planted batch vector nearly equal
    to a corpus vector surfaces oriented (batch, corpus); within-side
    near-dups are suppressed."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((4, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(3)], schema
    )
    near = base[0] + 0.02 * rng.standard_normal(64)
    new = spark.createDataFrame(
        [(10, [float(x) for x in near]),
         (11, [float(x) for x in base[3]])],
        schema,
    )
    got = {(r["left_id"], r["right_id"])
           for r in dedup.embedding_near_dup_join(
               new, corpus, threshold=0.9).collect()}
    assert got == {(10, 0)}


def test_exact_cosine_pairs_size_guard(spark):
    """The quadratic recall baseline refuses oversized inputs (strict,
    default) and hash-samples deterministically with strict=False —
    nothing can accidentally launch a 100 TB cross join."""
    import pytest as _pytest

    big = spark.range(0, 5000).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"), F.lit(1.0)
        ).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="max_rows"):
        dedup.exact_cosine_pairs(big, max_rows=1000)
    sampled = dedup.exact_cosine_pairs(
        big, threshold=0.99, max_rows=1000, strict=False
    )
    # the sampled baseline still runs, on a deterministically-reduced set
    n1 = sampled.count()
    n2 = dedup.exact_cosine_pairs(
        big, threshold=0.99, max_rows=1000, strict=False
    ).count()
    assert n1 == n2 > 0


def test_containment_pairs_directed(spark):
    """Containment is asymmetric: a short doc inside a long one scores
    C(short→long) = 1 while C(long→short) = |short|/|long| — only the
    passing direction is emitted."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        containment_pairs,
    )

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d e f"), (3, "x y z w")],
        ["doc_id", "text"],
    )
    # doc1 shingles {abc, bcd} ⊂ doc2 shingles {abc, bcd, cde, def}
    got = {
        (r["src"], r["dst"]): r["containment"]
        for r in containment_pairs(df, threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}
    # at a lower threshold the reverse direction appears with C = 0.5
    got_lo = {
        (r["src"], r["dst"]): r["containment"]
        for r in containment_pairs(df, threshold=0.4).collect()
    }
    assert got_lo == {(1, 2): 1.0, (2, 1): 0.5}


def test_srp_bigint_buckets_above_int32_ceiling(spark):
    """Round 11: bucket ids are BIGINT — rows_per_band may exceed 31
    (the former int32 ceiling). At r=40 the arrow and native bucketers
    must still agree bit-for-bit, and the packed buckets must actually
    use the high bits (>= 2^31), proving the ceiling is gone."""
    from data_wrangle_openstreetmaps_data_spark.catalog import table
    from data_wrangle_openstreetmaps_data_spark.operators.similarity import (
        _seeded_projections,
    )
    from tests.conftest import SF_SMALL

    emb = table(spark, SF_SMALL, "embeddings").limit(100)
    planes = _seeded_projections(64, 2 * 40, 42)
    native = {
        (r["id"], r["band"], r["bucket"])
        for r in dedup._srp_bucketed_native(
            emb, "vec_id", "embedding", planes, 2, 40
        ).collect()
    }
    arrow = {
        (r["id"], r["band"], r["bucket"])
        for r in dedup._srp_bucketed_arrow(
            emb, "vec_id", "embedding", planes, 2, 40
        ).collect()
    }
    assert arrow == native
    assert max(b for _, _, b in arrow) >= (1 << 31), (
        "no bucket used the high bits — r>31 not exercised"
    )
    import pytest

    with pytest.raises(ValueError):
        dedup.embedding_near_dup_pairs(emb, rows_per_band=64)
