"""Deduplication: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding near-dup.

Registry family module — split from the single-file registry; each
family defines its ``q_*`` callables plus the matching ``ORACLES``
entries, aggregated in ``__init__``."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.functions import text
from data_wrangle_openstreetmaps_data_spark.operators import (
    dedup,
    sample,
    similarity,
)

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403


# Shared-subtree materialization for the exact pair joins goes through
# _shared._mat (persist(MEMORY_AND_DISK) + eager count). The r9 verdict
# flagged q_containment_join / q_ngram_jaccard ~1.45x slower and
# suspected the eager localCheckpoint — the r10 quiet-box A/B confirmed
# it (PERF.md): persist beats localCheckpoint 2.2-2.8x here
# (containment 3.15->1.11s, ngram 1.91->0.88s, sf0.1 best-of-3).


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D1 — exact dedup: hash groupBy on normalized text."""
    return dedup.dedup_exact(table(spark, sf, "documents"))


def q_dup_rate_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — the dedup REPORT a data-curation team actually reads:
    per ingest source, how many rows are exact duplicates (normalized
    text, same key as q_dedup_exact), the duplicate rate, and how many
    of the dup rows have their cluster's keeper (min doc_id) in a
    DIFFERENT source — cross-source contamination, the number that
    tells you whether a feed is re-crawling another feed. Two keyed
    aggregates (norm-text clusters, then source rollup); rates are
    single divisions over exact counts."""
    d = table(spark, sf, "documents").select(
        "doc_id", "source", text.normalize_ws(F.col("text")).alias("k")
    )
    clus = d.groupBy("k").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    keep_src = d.select(
        F.col("doc_id").alias("keep_id"), F.col("source").alias("keep_source")
    )
    j = (
        d.join(clus, "k")
        .join(keep_src, "keep_id")
    )
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.when(F.col("doc_id") != F.col("keep_id"), 1))
            .cast("long")
            .alias("n_dup_rows"),
            F.count(
                F.when(
                    (F.col("doc_id") != F.col("keep_id"))
                    & (F.col("keep_source") != F.col("source")),
                    1,
                )
            )
            .cast("long")
            .alias("n_cross_source"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_rows",
            text.round4(
                F.col("n_dup_rows").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
            "n_cross_source",
        )
        .orderBy("source")
    )


def q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 — exact n-gram Jaccard similarity join, CLUSTER-COLLAPSED
    scale-safe form (the r8 verdict's item 3): collapse exact-dup
    clusters FIRST (linear hash-agg on normalized text), run the
    inverted-index pair join over cluster REPRESENTATIVES only, and
    recover the full-corpus accounting exactly via multiplicities —
    identical normalized text ⇒ identical shingle set, so every member
    pair of clusters (A, B) has jaccard(a, b) = jaccard(repA, repB) and

        total_pairs = Σ C(csize, 2)            (intra: jaccard = 1.0)
                    + Σ csizeA·csizeB          (cross rep pairs ≥ t)

    EQUALS the full O(n²)-output enumeration — which is exactly how the
    ORACLE computes total_pairs (full pair enumeration in DuckDB), so
    the collapse math is cross-engine-proven, not assumed. On the copy-
    replicated sf1 ladder the enumeration grew 979× (41× wall at 10×);
    the collapsed form's pair join is quadratic only in DISTINCT
    content, so it scales ~linearly (clusters grow, rep count doesn't).

    Output: top-100 REPRESENTATIVE pairs by (jaccard desc, id_a, id_b)
    with member_pairs = csizeA·csizeB, plus dup_cluster_pairs (intra)
    and total_pairs scalars. The unbounded exact tier remains available
    as q_similarity_join / q_similarity_join_prefix.

    Tier choice, measured (round 8): at t=0.2 the PPJoin prefix covers
    ~80% of each doc's shingles — the plain inverted index is the right
    engine at low thresholds; the prefix tier wins at high ones."""
    docs = table(spark, sf, "documents")
    clusters = (
        docs.groupBy(text.normalize_ws("text").alias("norm_text"))
        .agg(
            F.min("doc_id").alias("rep_id"),
            F.count(F.lit(1)).alias("csize"),
        )
        .transform(_mat)  # 3 consumers: reps, sizes, intra
    )
    reps = clusters.select(
        F.col("rep_id").alias("doc_id"), F.col("norm_text").alias("text")
    )
    rp = dedup.ngram_jaccard_pairs(reps, shingle_k=3, threshold=0.2)
    sz_a = clusters.select(
        F.col("rep_id").alias("id_a"), F.col("csize").alias("csize_a")
    )
    sz_b = clusters.select(
        F.col("rep_id").alias("id_b"), F.col("csize").alias("csize_b")
    )
    jp = (
        rp.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            (F.col("csize_a") * F.col("csize_b"))
            .cast("long")
            .alias("member_pairs"),
        )
        .transform(_mat)  # 2 consumers: top-k + cross sum
    )
    intra = clusters.agg(
        F.coalesce(
            F.sum(F.col("csize") * (F.col("csize") - 1) / F.lit(2)), F.lit(0)
        )
        .cast("long")
        .alias("dup_cluster_pairs")
    )
    cross = jp.agg(
        F.coalesce(F.sum("member_pairs"), F.lit(0)).cast("long").alias("cross")
    )
    totals = (
        intra.crossJoin(F.broadcast(cross))  # two 1-row scalars
        .select(
            "dup_cluster_pairs",
            (F.col("dup_cluster_pairs") + F.col("cross"))
            .cast("long")
            .alias("total_pairs"),
        )
    )
    return (
        jp.orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(100)
        .crossJoin(F.broadcast(totals))  # 1-row scalar, not a cartesian
    )


def q_similarity_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 (SURVEY §2.7 name) — near-dup similarity join over document
    texts: exact n-gram Jaccard via the inverted-index join. At t=0.2
    the plain index is the measured-fastest exact tier (see
    q_ngram_jaccard's tier-choice note); the lossless prefix-filter
    variant of the SAME output is q_similarity_join_prefix."""
    return dedup.ngram_jaccard_pairs(
        table(spark, sf, "documents"), shingle_k=3, threshold=0.2
    )


def q_similarity_join_maxdf(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 — ngram-Jaccard join with the stop-shingle document-frequency
    cut (max_df=0.1): shingles present in >10% of docs are dropped from
    candidate generation (bounding the inverted-index self-join on skewed
    corpora), while verification recounts commons from full shingle sets so
    emitted jaccard stays exact. Oracle replicates the cut relationally."""
    return dedup.ngram_jaccard_pairs(
        table(spark, sf, "documents"), shingle_k=3, threshold=0.2, max_df=0.1
    )


def q_similarity_join_prefix(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 — exact Jaccard join with PPJoin prefix filtering: lossless
    candidate pruning (rarest-first prefixes must intersect for any pair
    at >= threshold), so the output EQUALS the full inverted-index join
    and shares its oracle. The scale-preferred exact tier: ~(1-t)² the
    candidates, stop-shingles naturally excluded from prefixes."""
    return dedup.prefix_filter_jaccard_pairs(
        table(spark, sf, "documents"), shingle_k=3, threshold=0.5
    )


def q_containment_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 — DIRECTED set-containment join at C >= 0.8: the
    asymmetric near-dup tier (a short document quoted inside a long one
    scores containment ≈ 1 where Jaccard is tiny). Ordered pairs, both
    directions scored from one unordered inverted-index candidate pass.

    CLUSTER-COLLAPSED like q_ngram_jaccard (r8 verdict item 3): the
    containment join runs over exact-dup cluster REPRESENTATIVES only;
    identical normalized text ⇒ identical shingle set ⇒ every directed
    member pair scores containment(repSrc → repDst), and intra-cluster
    pairs score 1.0 both ways, so

        total_pairs = Σ csize·(csize−1)        (directed intra)
                    + Σ csize_src·csize_dst    (directed cross ≥ t)

    EQUALS the full directed enumeration — and the ORACLE computes
    total_pairs from the full enumeration, cross-engine-proving the
    collapse. Output: top-100 representative (src, dst) pairs by
    (containment desc, src, dst) with member_pairs, plus
    dup_cluster_pairs / total_pairs scalars; scales with distinct
    content, not copy count."""
    docs = table(spark, sf, "documents")
    clusters = (
        docs.groupBy(text.normalize_ws("text").alias("norm_text"))
        .agg(
            F.min("doc_id").alias("rep_id"),
            F.count(F.lit(1)).alias("csize"),
        )
        .transform(_mat)  # 3 consumers: reps, sizes, intra
    )
    reps = clusters.select(
        F.col("rep_id").alias("doc_id"), F.col("norm_text").alias("text")
    )
    rp = dedup.containment_pairs(reps, shingle_k=3, threshold=0.8)
    sz_s = clusters.select(
        F.col("rep_id").alias("src"), F.col("csize").alias("csize_s")
    )
    sz_d = clusters.select(
        F.col("rep_id").alias("dst"), F.col("csize").alias("csize_d")
    )
    jp = (
        rp.join(sz_s, "src")
        .join(sz_d, "dst")
        .select(
            "src",
            "dst",
            "containment",
            (F.col("csize_s") * F.col("csize_d"))
            .cast("long")
            .alias("member_pairs"),
        )
        .transform(_mat)  # 2 consumers: top-k + cross sum
    )
    intra = clusters.agg(
        F.coalesce(F.sum(F.col("csize") * (F.col("csize") - 1)), F.lit(0))
        .cast("long")
        .alias("dup_cluster_pairs")
    )
    cross = jp.agg(
        F.coalesce(F.sum("member_pairs"), F.lit(0)).cast("long").alias("cross")
    )
    totals = intra.crossJoin(F.broadcast(cross)).select(
        "dup_cluster_pairs",
        (F.col("dup_cluster_pairs") + F.col("cross"))
        .cast("long")
        .alias("total_pairs"),
    )
    return (
        jp.orderBy(F.desc("containment"), "src", "dst")
        .limit(100)
        .crossJoin(F.broadcast(totals))  # 1-row scalar, not a cartesian
    )


def q_dedup_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — the threshold-TUNING curve every dedup rollout reads
    before picking its cut: from ONE exact trigram-Jaccard pass (the
    inverted-index join at its 0.2 floor), the count of qualifying
    pairs at or above each candidate threshold 0.2..0.9 — a reversed
    cumulative over 0.05-wide similarity bands, so the curve costs one
    extra ≤14-row rollup, not eight joins. Band ids floor the ALREADY
    4-dp-rounded jaccard, so banding is exact cross-engine. Reading
    the curve: the knee is the threshold; the 979×-at-10× output
    explosion documented on q_ngram_jaccard is visible here as the
    low-threshold tail."""
    from pyspark.sql import Window

    # cluster-collapsed (same trick as q_ngram_jaccard, r9): band counts
    # are Σ member_pairs per rep-pair band + the intra-cluster mass at
    # band 1.0 — exact vs the full enumeration, which is what the oracle
    # still runs, so the collapse is cross-engine-proven here too.
    docs = table(spark, sf, "documents")
    clusters = (
        docs.groupBy(text.normalize_ws("text").alias("norm_text"))
        .agg(
            F.min("doc_id").alias("rep_id"),
            F.count(F.lit(1)).alias("csize"),
        )
        .transform(_mat)
    )
    reps = clusters.select(
        F.col("rep_id").alias("doc_id"), F.col("norm_text").alias("text")
    )
    rp = dedup.ngram_jaccard_pairs(reps, shingle_k=3, threshold=0.2)
    sz_a = clusters.select(
        F.col("rep_id").alias("id_a"), F.col("csize").alias("csize_a")
    )
    sz_b = clusters.select(
        F.col("rep_id").alias("id_b"), F.col("csize").alias("csize_b")
    )
    band = (F.floor(F.col("jaccard") * 20) / 20).alias("band")
    cross_per = (
        rp.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .groupBy(band)
        .agg(
            F.sum(F.col("csize_a") * F.col("csize_b"))
            .cast("long")
            .alias("n_pairs")
        )
    )
    intra_per = clusters.agg(
        F.coalesce(
            F.sum(F.col("csize") * (F.col("csize") - 1) / F.lit(2)), F.lit(0)
        )
        .cast("long")
        .alias("n_pairs")
    ).select(F.lit(1.0).alias("band"), "n_pairs")
    per = (
        cross_per.unionByName(intra_per.filter(F.col("n_pairs") > 0))
        .groupBy("band")
        .agg(F.sum("n_pairs").cast("long").alias("n_pairs"))
    )
    w = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.withColumn(
            "n_at_or_above", F.sum("n_pairs").over(w).cast("long")
        )
        .orderBy("band")
    )


def q_minhash_accuracy(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 — sketch-accuracy EVALUATION: for every true near-dup
    pair (exact trigram Jaccard >= 0.2), the MinHash estimate
    (matching signature positions / 16) next to the exact value and
    the absolute error — the calibration read you take before trusting
    a banding config on a new corpus. Uses the PORTABLE md5 shingle
    hash (not xxhash64) so the 16 permutation minima are value-oracled
    in SQL with the (a_j, b_j) constants inlined from the same
    md5-seeded parameter derivation."""
    from data_wrangle_openstreetmaps_data_spark.functions.text import (
        shingle_table,
    )
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        _MINHASH_P,
        _minhash_params,
        portable_token_hash,
    )

    docs = table(spark, sf, "documents")
    sh = (
        shingle_table(docs, "text", "doc_id", 3)
        .select(
            "id", F.pmod(portable_token_hash(F.col("shingle")), F.lit(_MINHASH_P)).alias("h")
        )
        .distinct()
    )
    mins = [
        F.min((F.col("h") * a + b) % _MINHASH_P).alias(f"m{j}")
        for j, (a, b) in enumerate(_minhash_params(16))
    ]
    sig = sh.groupBy("id").agg(*mins).select(
        "id", F.array(*[F.col(f"m{j}") for j in range(16)]).alias("sig")
    )
    pairs = dedup.ngram_jaccard_pairs(
        docs, shingle_k=3, threshold=0.2
    )
    j = (
        pairs.join(sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sa")), "id_a")
        .join(sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sb")), "id_b")
    )
    matches = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = text.round4(matches / F.lit(16.0))
    return j.select(
        "id_a",
        "id_b",
        "jaccard",
        est.alias("mh_est"),
        text.round4(F.abs(est - F.col("jaccard"))).alias("abs_err"),
    )


def q_chunk_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — duplicate detection at sub-document granularity:
    non-overlapping 16-token windows fingerprinted and counted across the
    corpus (the relational form of suffix-window dedup à la RefinedWeb /
    deduplicating-training-data). Top-20 most-repeated chunks with their
    occurrence and distinct-document counts; one explode + one hash
    aggregate, fingerprints (not text) ride the shuffle."""
    d = table(spark, sf, "documents").select(
        "doc_id", text.tokens("text").alias("toks")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(_DEDUP_CHUNK)
    )
    d = d.select("doc_id", "toks", F.explode(starts).alias("start"))
    chunk_fp = F.substring(
        F.md5(
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, F.lit(_DEDUP_CHUNK)),
                " ",
            )
        ),
        1,
        16,
    )
    return (
        d.select("doc_id", chunk_fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("cnt") > 1)
        .orderBy(F.desc("cnt"), "fp")
        .limit(20)
    )


def q_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 — MinHash+LSH near-dup pairs, oracle-checked: with 8
    two-row bands the banding recall is 1.0 on this corpus (asserted by
    tests/test_dedup.py), and the output contract is exact-Jaccard-verified
    pairs — so the result EQUALS the exact trigram-Jaccard pair set at the
    same threshold and the relational oracle applies."""
    return dedup.dedup_minhash_lsh(
        table(spark, sf, "documents"),
        n_hashes=16, bands=8, shingle_k=3, threshold=0.5,
    )


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — end-to-end dedup: minhash near-dup pairs (recall-1.0 LSH
    config, see q_dedup_minhash) → connected components (iterative
    min-label propagation) → (id, cluster_id); oracle = recursive-CTE
    transitive closure over the exact-Jaccard pair set."""
    pairs = dedup.dedup_minhash_lsh(
        table(spark, sf, "documents"),
        n_hashes=16, bands=8, shingle_k=3, threshold=0.5,
    )
    return dedup.dup_clusters(pairs).orderBy("id")


def q_dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — QUALITY-AWARE representative selection: per near-dup
    cluster keep the argmax-quality member (tie → smaller doc_id), not
    the min-id — what a curation team actually ships (near-dups are
    rewrites of unequal quality; min-id keeps whichever crawled first).
    Pipeline, CLUSTER-COLLAPSED (the same scale move as
    q_ngram_jaccard): exact-dup CLASSES (identical normalized text ⇒
    identical shingles ⇒ identical minhash signature and jaccard — but
    NOT necessarily identical quality, since quality_score reads raw
    text) are collapsed first with per-class aggregates
    (rep = min id, size, argmax-quality member via a struct max,
    quality at the class min id); the recall-1.0 minhash pairs and the
    connected components then run over REPRESENTATIVES only, and the
    member-level answer is recovered exactly: component argmax = max of
    class argmaxes (tie → min member id, preserved by the (quality,
    −id) struct order), component min_id = min rep, csize = Σ class
    sizes. Multi-member classes whose rep has no near-dup neighbor are
    components all by themselves (their members pair at jaccard 1.0
    member-level) and are unioned back in. The ORACLE stays at MEMBER
    level (recursive-CTE closure over the exact-Jaccard pair set + a
    member row_number window), so the collapse is cross-engine-proven
    every run. The report compares against the min-id policy:
    quality_gain = keep_quality − quality(min_id) ≥ 0. Measured: the
    member-level form ran 7.3× at 10× data on the copy-replicated
    ladder (pairs are output-driven); this form's pair join grows only
    with DISTINCT content."""
    docs = table(spark, sf, "documents")
    classes = (
        docs.select(
            "doc_id",
            text.normalize_ws("text").alias("norm_text"),
            text.quality_score(F.col("text")).alias("quality"),
        )
        .groupBy("norm_text")
        .agg(
            F.min("doc_id").alias("rep_id"),
            F.count(F.lit(1)).cast("long").alias("csize_c"),
            F.max(
                F.struct(F.col("quality"), (-F.col("doc_id")).alias("negid"))
            ).alias("_best"),
            F.min(
                F.struct(F.col("doc_id"), F.col("quality"))
            ).alias("_repq"),
        )
        .select(
            "norm_text",
            "rep_id",
            "csize_c",
            F.col("_best.quality").alias("qmax"),
            (-F.col("_best.negid")).alias("qmax_id"),
            F.col("_repq.quality").alias("rep_quality"),
        )
        .transform(_mat)  # consumers: reps, attach, singletons
    )
    reps = classes.select(
        F.col("rep_id").alias("doc_id"), F.col("norm_text").alias("text")
    )
    pairs = dedup.dedup_minhash_lsh(
        reps, n_hashes=16, bands=8, shingle_k=3, threshold=0.5
    )
    comp = dedup.dup_clusters(pairs)  # (id=rep_id, cluster_id) — paired reps
    memb = classes.join(
        comp.select(F.col("id").alias("rep_id"), "cluster_id"),
        "rep_id",
        "left",
    ).select(
        # unpaired classes are their own component iff csize_c >= 2
        F.coalesce(F.col("cluster_id"), F.col("rep_id")).alias("cid"),
        F.col("cluster_id").isNotNull().alias("paired"),
        "rep_id", "csize_c", "qmax", "qmax_id", "rep_quality",
    ).filter(F.col("paired") | (F.col("csize_c") >= 2))
    agg = memb.groupBy("cid").agg(
        F.sum("csize_c").cast("long").alias("csize"),
        F.min("rep_id").alias("min_id"),
        F.max(
            F.struct(F.col("qmax"), (-F.col("qmax_id")).alias("negid"))
        ).alias("_keep"),
        F.min(
            F.struct(F.col("rep_id"), F.col("rep_quality"))
        ).alias("_minq"),
    )
    return agg.select(
        F.col("cid").alias("cluster_id"),
        "csize",
        (-F.col("_keep.negid")).alias("keep_id"),
        F.col("_keep.qmax").alias("keep_quality"),
        "min_id",
        text.round4(
            F.col("_keep.qmax") - F.col("_minq.rep_quality")
        ).alias("quality_gain"),
    ).orderBy("cluster_id")


def q_dedup_semantic(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — DOCUMENT-LEVEL SEMANTIC DEDUP (r10 verdict item 9), the
    embedding-space tier joining the exact/near/span levers of
    q_dedup_impact: SRP-bucketed cosine pairs (the q_dedup_embedding
    config — banded key-equality candidates, exact-cosine verify,
    never all-pairs) → pointer-jumping connected components
    (dedup.dup_clusters, O(log diameter)) → keep-best representative
    per semantic cluster (argmax quality_score over the paired
    documents, tie → min doc_id — embeddings and documents share the
    id space 1:1). One-row report in TOKEN units: cluster count,
    droppable docs (non-keepers), droppable tokens, the token total
    resident in semantic clusters, and the quality gain of keep-best
    over keep-min-id. Oracle: the inlined-plane SRP pair SQL +
    recursive-CTE closure + the same argmax — the whole approximate
    pipeline replicated end to end."""
    emb = table(spark, sf, "embeddings")
    docs = table(spark, sf, "documents")
    # rows_per_band=None (r12 verdict item 1): r derived from the corpus
    # count (2^r ≈ n·b → noise candidates ≈ n/2 at EVERY scale) instead
    # of a fixed 4 that went quadratic once n outgrew it (sf10 second
    # decade: 3.9× wall, constant 1-row output). Exact-dup classes —
    # the TRUE near-dup mass on replicated ladder data — keep recall
    # 1.0 via collapse_exact regardless of r.
    pairs = dedup.embedding_near_dup_pairs(
        emb, threshold=0.4, bands=8, rows_per_band=None, dim=64
    )
    cc = dedup.dup_clusters(pairs)
    # Join on the raw text FIRST, derive quality/tokens ABOVE the join:
    # cc covers only the clustered documents (34 of 5000 at sf0.1 —
    # near-dup components are sparse by construction at every scale),
    # so tokenizing + quality-scoring the whole corpus below the join
    # wastes ~99% of the regex work. Values are identical: the same
    # expressions over the same surviving rows (r13, guide §2.3
    # "project/filter before the expensive compute").
    memb = cc.join(
        docs.select(F.col("doc_id").alias("id"), "text"), "id"
    ).select(
        "cluster_id",
        "id",
        F.size(text.tokens(F.col("text"))).alias("n_tokens"),
        text.quality_score(F.col("text")).alias("quality"),
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
    return per_cluster.agg(
        F.count(F.lit(1)).cast("long").alias("sem_clusters"),
        F.sum(F.col("csize") - 1).cast("long").alias("sem_dup_docs"),
        F.sum(F.col("tok") - F.col("_best.keep_tok"))
        .cast("long")
        .alias("sem_dup_tokens"),
        F.sum("tok").cast("long").alias("sem_cluster_tokens"),
        # quality gain summed on the 1e-4 integer grid (quality is
        # already round4, so floor(q*1e4+0.5) recovers the grid exactly;
        # a float sum would have no defined order cross-engine)
        (
            F.sum(
                F.floor(F.col("_best.quality") * 10000 + 0.5).cast("long")
                - F.floor(F.col("_minq.quality") * 10000 + 0.5).cast(
                    "long"
                )
            )
            / F.lit(10000.0)
        ).alias("keep_quality_gain"),
    )


def q_dedup_impact(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — the DEDUP IMPACT REPORT, one row: what each dedup level
    would save on this corpus, in the unit a data lead budgets in —
    tokens. (1) exact dup docs (non-keepers of identical normalized
    text; ZERO on this corpus — reported, not assumed), (2) near-dup
    non-representatives (recall-1.0 minhash pairs → connected
    components, drop everyone but the min-id member), (3) span-level
    duplicated tokens (q_repeated_spans' interval-union coverage,
    summed over ALL docs — what Lee-et-al span trimming removes even
    where doc-level dedup keeps both docs). Each level composes its
    already-oracled pipeline; percentages are round4 divisions of
    exact integer token sums. Levels (2) and (3) overlap by design —
    the report shows the levers separately, the pipeline applies them
    in order."""
    k = 8
    docs = table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        text.normalize_ws("text").alias("norm"),
        text.tokens(F.col("text")).alias("toks"),
    ).withColumn("n_tokens", F.size("toks")).transform(_mat)
    totals = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
    )
    exact_drop = (
        toks.groupBy("norm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").alias("tok"),
            F.min(F.struct("doc_id", "n_tokens")).alias("_keep"),
        )
        .agg(
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
            .cast("long")
            .alias("exact_dup_docs"),
            F.coalesce(
                F.sum(F.col("tok") - F.col("_keep.n_tokens")), F.lit(0)
            )
            .cast("long")
            .alias("exact_dup_tokens"),
        )
    )
    pairs = dedup.dedup_minhash_lsh(
        docs, n_hashes=16, bands=8, shingle_k=3, threshold=0.5
    )
    near_drop = (
        dedup.dup_clusters(pairs)
        .filter(F.col("id") != F.col("cluster_id"))
        .join(toks.select(F.col("doc_id").alias("id"), "n_tokens"), "id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("near_dup_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("long")
            .alias("near_dup_tokens"),
        )
    )
    wins = (
        toks.filter(F.col("n_tokens") >= k)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.col("n_tokens") - (k - 1))
            ).alias("start"),
            "toks",
        )
        .select(
            "doc_id",
            "start",
            F.md5(
                F.array_join(F.slice(F.col("toks"), F.col("start"), k), " ")
            ).alias("h"),
        )
        .transform(_mat)
    )
    dup = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= 2)
    )
    dwins = wins.join(dup.select("h"), "h")
    from pyspark.sql import Window

    iv = dwins.select("doc_id", "start", (F.col("start") + (k - 1)).alias("e"))
    w_prev = (
        Window.partitionBy("doc_id").orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id").orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    span_tok = (
        iv.withColumn(
            "ni",
            F.when(
                F.col("start")
                > F.coalesce(F.max("e").over(w_prev), F.lit(-1)),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("ni").over(w_run))
        .groupBy("doc_id", "island")
        .agg((F.max("e") - F.min("start") + 1).alias("ilen"))
        .agg(
            F.coalesce(F.sum("ilen"), F.lit(0))
            .cast("long")
            .alias("span_dup_tokens")
        )
    )
    return (
        totals.crossJoin(F.broadcast(exact_drop))  # 1-row scalars
        .crossJoin(F.broadcast(near_drop))
        .crossJoin(F.broadcast(span_tok))
        .select(
            "n_docs",
            "tokens_total",
            "exact_dup_docs",
            "exact_dup_tokens",
            "near_dup_docs",
            "near_dup_tokens",
            "span_dup_tokens",
            text.round4(
                F.col("near_dup_tokens") / F.col("tokens_total")
            ).alias("pct_near"),
            text.round4(
                F.col("span_dup_tokens") / F.col("tokens_total")
            ).alias("pct_span"),
        )
    )


def _scurve_sql(r: int, b: int) -> str:
    """p(candidate) = 1 − (1 − j^r)^b as an explicit multiplication
    chain — NO pow(): IEEE basic ops are exactly specified, so the
    same text evaluates bit-identically in Spark and DuckDB; libm pow
    is not."""

    def mulchain(base: str, n: int) -> str:
        e = base
        for _ in range(n - 1):
            e = f"({e} * {base})"
        return e

    s = mulchain("j", r)
    return f"(1.0 - {mulchain(f'(1.0 - {s})', b)})"


def q_lsh_design_table(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — the LSH BANDING DESIGN TABLE behind every minhash config
    in this repo: for each way to band 16 hashes (bands b × rows r,
    b·r = 16) and each jaccard j on a /20 grid, the candidate
    probability p = 1 − (1 − j^r)^b. This is the S-curve a dedup
    designer reads to pick (b, r) for a target threshold — e.g. the
    repo's (8 bands × 2 rows) config holds p ≈ 0.93 at j = 0.5 and
    ≈ 0.998 at 0.7, which is WHY the recall-1.0 contract at t = 0.5
    holds on real corpora. Both engines evaluate the SAME generated
    multiplication chain (no pow(), no transcendentals — IEEE basic
    ops are exactly specified so the doubles match bit-for-bit before
    the final round4). Pure computation: one 100-row grid, no table
    scan, no shuffle beyond the tiny cross of two generated ranges."""
    rows = []
    for b, r in ((1, 16), (2, 8), (4, 4), (8, 2), (16, 1)):
        rows.append((b, r, _scurve_sql(r, b)))
    grid = spark.range(1, 21).select(
        (F.col("id") / F.lit(20.0)).alias("j")
    )
    out = None
    for b, r, expr in rows:
        part = grid.select(
            F.lit(b).alias("bands"),
            F.lit(r).alias("rows_per_band"),
            text.round4(F.col("j")).alias("jaccard"),
            text.round4(F.expr(expr)).alias("p_candidate"),
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("bands", "jaccard")


def q_dedup_minhash_recall(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 — approximation quality as a regression-guarded NUMBER:
    recall and precision of the MinHash-LSH tier against the exact
    trigram-Jaccard pair set at the same threshold. With the recall-1.0
    banding config both are exactly 1.0 on this corpus — the oracle derives
    the same from the exact pair set, so any future LSH regression (missed
    or spurious pairs) fails this row."""
    docs = table(spark, sf, "documents")
    exact = dedup.ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.5)
    lsh = dedup.dedup_minhash_lsh(
        docs, n_hashes=16, bands=8, shingle_k=3, threshold=0.5
    )
    keys = ["id_a", "id_b"]
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    n_hit = (
        lsh.select(*keys)
        .join(exact.select(*keys), keys)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        n_hit.crossJoin(n_exact)  # three 1-row scalar frames
        .crossJoin(n_lsh)
        .select(
            text.round4(F.col("n_hit") / F.col("n_exact")).alias("recall"),
            text.round4(F.col("n_hit") / F.col("n_lsh")).alias("precision"),
        )
    )


def q_dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 (fifth tier) — embedding-cosine near-dup over the embeddings
    table: banded sign-random-projection LSH candidates (key-equality join
    on (band, bucket), O(n·bands) input) + exact cosine verify at
    threshold 0.4. Deterministic md5-seeded hyperplanes; the oracle
    replicates the bucketing plane-by-plane, so this checks the actual
    approximate algorithm, not a weaker rows-only contract."""
    return dedup.embedding_near_dup_pairs(
        table(spark, sf, "embeddings"),
        threshold=0.4,
        bands=8,
        rows_per_band=4,
    )


def q_dedup_embedding_recall(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 — approximation quality of the embedding LSH tier as a
    regression-guarded number: (recall, precision) vs the exact all-pairs
    cosine join at the same threshold. Precision is 1.0 by construction
    (candidates are exact-verified); recall is the banding survival rate,
    which the oracle recomputes exactly. The exact baseline is quadratic —
    a fixture/sample-scale diagnostic, not a production operator."""
    emb = table(spark, sf, "embeddings")
    exact = dedup.exact_cosine_pairs(emb, threshold=0.4)
    lsh = dedup.embedding_near_dup_pairs(
        emb, threshold=0.4, bands=8, rows_per_band=4
    )
    keys = ["id_a", "id_b"]
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    n_hit = (
        lsh.select(*keys)
        .join(exact.select(*keys), keys)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        n_hit.crossJoin(n_exact)  # three 1-row scalar frames
        .crossJoin(n_lsh)
        .select(
            text.round4(F.col("n_hit") / F.col("n_exact")).alias("recall"),
            text.round4(F.col("n_hit") / F.col("n_lsh")).alias("precision"),
        )
    )


def q_streaming_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — exact first-occurrence dedup keyed by content
    fingerprint (applyInPandasWithState). The availableNow drain over the
    single staged file is one micro-batch, so first-occurrence ≡ global
    min id per fingerprint — which is exactly the oracle's GROUP BY."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se
    from data_wrangle_openstreetmaps_data_spark.streaming.dedup_stream import (
        dedup_stream,
    )

    name = f"streamdedup_{uuid.uuid4().hex[:8]}"
    stream = se.stage_documents_stream(spark, sf, "docdedup")
    se.run_to_memory(dedup_stream(stream), name)
    return spark.table(name)


def q_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D1 — incremental corpus merge: the 20% of documents with
    doc_id % 10 >= 8 play the incoming batch, the other 80% the existing
    corpus; emit the batch docs that are genuinely new (within-batch
    min-id dedup, then anti-join on the corpus fingerprint set)."""
    docs = table(spark, sf, "documents")
    new = docs.filter(F.col("doc_id") % 10 >= 8)
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    return dedup.dedup_incremental(new, corpus)


def q_dedup_minhash_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 — cross-corpus near-dup join (batch doc_id%10>=8 vs corpus):
    banded MinHash candidates + exact-Jaccard verify, cross-side pairs
    only, oriented (left_id, right_id). With the recall-1.0 banding
    config the output EQUALS the exact cross-side trigram-Jaccard pair
    set, so the relational oracle applies (same contract as
    q_dedup_minhash)."""
    docs = table(spark, sf, "documents")
    new = docs.filter(F.col("doc_id") % 10 >= 8)
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    return dedup.minhash_lsh_join(
        new, corpus, n_hashes=16, bands=8, shingle_k=3, threshold=0.5
    )


def q_dedup_representatives(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — the dedup pipeline's FINAL action: drop every document
    whose near-dup cluster representative (min id in its component) is a
    different document; emit surviving ids. Composes the recall-1.0
    minhash pair set with connected components, so the oracle is the
    recursive-CTE closure's keep-set."""
    docs = table(spark, sf, "documents")
    pairs = dedup.dedup_minhash_lsh(
        docs, n_hashes=16, bands=8, shingle_k=3, threshold=0.5
    )
    return dedup.dedup_keep_representatives(docs, pairs).select(
        "doc_id"
    ).orderBy("doc_id")


def q_dedup_embedding_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 — cross-corpus embedding near-dup join (vectors with
    vec_id%10>=8 as the incoming batch vs the rest as corpus): banded
    SRP candidates + exact-cosine verify, cross-side pairs oriented
    (left_id, right_id). Plane-inlined oracle replicates the bucketing
    and the split."""
    emb = table(spark, sf, "embeddings")
    new = emb.filter(F.col("vec_id") % 10 >= 8)
    corpus = emb.filter(F.col("vec_id") % 10 < 8)
    return dedup.embedding_near_dup_join(
        new, corpus, threshold=0.4, bands=8, rows_per_band=4
    )


def q_streaming_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — MinHash-LSH near-dup pairs as documents arrive
    (applyInPandasWithState keyed by band bucket, exact-Jaccard verify
    against the bucket's history). Single-batch availableNow drain ⇒
    emissions = the batch LSH pair set = the exact trigram-Jaccard pair
    set at the recall-1.0 config, so the relational oracle applies.
    Bands agreeing on a pair each emit it — deduped batch-side here."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se
    from data_wrangle_openstreetmaps_data_spark.streaming.minhash_stream import (
        minhash_pairs_stream,
    )

    name = f"streamminhash_{uuid.uuid4().hex[:8]}"
    stream = se.stage_documents_stream(spark, sf, "minhashstream")
    se.run_to_memory(
        minhash_pairs_stream(
            stream, n_hashes=16, bands=8, shingle_k=3, threshold=0.5
        ),
        name,
    )
    return spark.table(name).dropDuplicates(["id_a", "id_b"])


def q_dedup_clusters_exact(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — connected components over the DETERMINISTIC ngram-jaccard
    pairs, so the iterative label propagation is cross-checked against a
    recursive-CTE transitive closure in the oracle."""
    pairs = dedup.ngram_jaccard_pairs(
        table(spark, sf, "documents"), shingle_k=3, threshold=0.2
    )
    return dedup.dup_clusters(pairs).orderBy("id")


def q_entity_resolution(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — ENTITY RESOLUTION over a dirtied registry: blocking →
    in-block edit-distance match → transitive closure → one-row merge
    report. The classic record-linkage pipeline (Fellegi-Sunter shape,
    deterministic scoring) on the customer names, with typo variants
    PLANTED like DIRTY_CITIES (the corpus has no natural typos): every
    custkey ≡ 0 (mod 7) gains a copy with character 10 substituted,
    every custkey ≡ 0 (mod 3) one with character 11 substituted — both
    SUBSTITUTIONS, so name length and the last-4-char blocking key are
    provably unaffected, and a custkey ≡ 0 (mod 21) yields a 3-record
    cluster whose variant-variant distance is exactly 2.

    Scale shape: candidates come from a key-equality self-join on the
    block (never all-pairs — the Soundex-blocking discipline);
    levenshtein runs only inside blocks; the closure is
    dedup.dup_clusters pointer jumping, cross-checked by the oracle's
    recursive CTE. Matched = levenshtein ≤ 2; singleton count is
    recovered arithmetically (entities − paired nodes)."""
    cust = table(spark, sf, "customer").select(
        F.col("c_custkey").cast("long").alias("ent_id"),
        F.lower(F.col("c_name")).alias("name"),
    )
    v7 = cust.filter(F.col("ent_id") % 7 == 0).select(
        # variant ids live ABOVE the make_sfN replication ceiling: copy i
        # shifts keys by i*1e8, so any factor >= 11 reaches 1e9+ — a 1e9
        # offset would collide with replicated real keys on ladder data
        # (ADVICE r12). 1e12 clears factor 10,000.
        (F.col("ent_id") + F.lit(10**12)).alias("ent_id"),
        F.concat(
            F.substring("name", 1, 9),
            F.lit("x"),
            F.expr("substring(name, 11)"),
        ).alias("name"),
    )
    v3 = cust.filter(F.col("ent_id") % 3 == 0).select(
        (F.col("ent_id") + F.lit(2 * 10**12)).alias("ent_id"),
        F.concat(
            F.substring("name", 1, 10),
            F.lit("z"),
            F.expr("substring(name, 12)"),
        ).alias("name"),
    )
    ents = cust.unionByName(v7).unionByName(v3)
    blocked = ents.withColumn(
        "blk", F.expr("substring(name, length(name) - 3)")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.ent_id") < F.col("b.ent_id")),
    ).select(
        F.col("a.ent_id").alias("id_a"),
        F.col("b.ent_id").alias("id_b"),
        F.levenshtein(F.col("a.name"), F.col("b.name")).alias("lev"),
    )
    matched = cand.filter(F.col("lev") <= 2).select("id_a", "id_b")
    cc = dedup.dup_clusters(matched)
    cstats = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("csize")
    )
    n_ents = ents.agg(F.count(F.lit(1)).alias("n_entities"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidate_pairs"))
    n_match = matched.agg(F.count(F.lit(1)).alias("n_matched_pairs"))
    agg = cstats.agg(
        F.count(F.lit(1)).alias("n_multi_clusters"),
        F.sum("csize").cast("long").alias("n_paired_entities"),
        F.max("csize").cast("long").alias("max_cluster_size"),
    )
    return (
        n_ents.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_match))
        .crossJoin(F.broadcast(agg))
        .select(
            "n_entities",
            "n_candidate_pairs",
            "n_matched_pairs",
            "n_multi_clusters",
            (
                F.col("n_entities")
                - F.col("n_paired_entities")
                + F.col("n_multi_clusters")
            ).alias("n_resolved"),
            (F.col("n_paired_entities") - F.col("n_multi_clusters")).alias(
                "n_merged_away"
            ),
            "max_cluster_size",
        )
    )


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D2 — SimHash chunk-join candidates (hamming<=24 shown),
    oracle-checked: the portable md5-60-bit token hash makes the whole
    signature pipeline — votes, sign assembly, chunk-equality candidates,
    hamming distances — reproducible by the DuckDB oracle."""
    return (
        dedup.dedup_simhash(table(spark, sf, "documents"))
        .filter(F.col("hamming") <= 24)
        .orderBy("id_a", "id_b")
    )


def q_repeated_spans(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-D — SPAN-level exact substring dedup, the complement of the
    doc-level tiers (cf. Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better": repeated ≥k-token substrings are
    trimmed even when the surrounding docs differ). Relational form:
    every k=8-token window (md5 span fingerprint), windows whose span
    occurs ≥2 times anywhere in the corpus are "duplicated", and the
    per-doc report gives duplicated-window counts plus COVERAGE — the
    fraction of the doc's token positions lying under at least one
    duplicated window (positional interval union via distinct
    (doc, pos)), i.e. what span-dedup would trim. Corpus scalars
    (distinct duplicated spans, total duplicated windows) ride along.

    Scale shape: the window explode is linear in total tokens; span
    discovery is ONE hash shuffle (groupBy fingerprint — a GROUP BY,
    not a join, which is why this scales out where suffix-array
    pipelines serialize); the positional re-explode runs only over
    duplicated windows (≪ all windows on a healthy corpus); the
    scalars broadcast. Top-50 docs by coverage, fully deterministic
    (coverage, covered, doc_id)."""
    k = 8
    toked = (
        table(spark, sf, "documents")
        .select("doc_id", text.tokens(F.col("text")).alias("toks"))
        .withColumn("n_tokens", F.size("toks"))
        .filter(F.col("n_tokens") >= k)
    )
    wins = toked.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.sequence(F.lit(1), F.col("n_tokens") - (k - 1))
        ).alias("start"),
        F.col("toks"),
    ).select(
        "doc_id",
        "n_tokens",
        "start",
        F.md5(
            F.array_join(F.slice(F.col("toks"), F.col("start"), k), " ")
        ).alias("h"),
    ).transform(_mat)  # 2 consumers: span agg + join back
    dup = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= 2)
        .transform(_mat)  # 2 consumers: join back + scalars
    )
    dwins = wins.join(dup.select("h"), "h").localCheckpoint(
        eager=True
    )  # 2 consumers: coverage + per-doc counts
    # coverage via INTERVAL UNION (the q_interval_union merge pattern):
    # |dup_windows| rows through a doc-keyed window, instead of the
    # k×|dup_windows| positional explode — on a dup-heavy corpus the
    # positional form re-explodes to k×|tokens| rows, this one never
    # exceeds the window count. The ORACLE deliberately keeps the
    # brute-force positional distinct-count, so the merge math is
    # cross-engine-proven every run.
    from pyspark.sql import Window

    iv = dwins.select(
        "doc_id", "start", (F.col("start") + (k - 1)).alias("end")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = iv.withColumn(
        "new_island",
        F.when(
            F.col("start") > F.coalesce(F.max("end").over(w_prev), F.lit(-1)),
            1,
        ).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w_run))
    covered = (
        islands.groupBy("doc_id", "island")
        .agg((F.max("end") - F.min("start") + 1).alias("ilen"))
        .groupBy("doc_id")
        .agg(F.sum("ilen").cast("long").alias("covered_tokens"))
    )
    perdoc = dwins.groupBy("doc_id", "n_tokens").agg(
        F.count(F.lit(1)).cast("long").alias("dup_windows"),
        F.countDistinct("h").cast("long").alias("dup_spans"),
    )
    scal = dup.agg(
        F.count(F.lit(1)).cast("long").alias("corpus_dup_spans"),
        F.coalesce(F.sum("occ"), F.lit(0))
        .cast("long")
        .alias("corpus_dup_windows"),
    )
    return (
        perdoc.join(covered, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "dup_windows",
            "dup_spans",
            "covered_tokens",
            text.round4(
                F.col("covered_tokens") / F.col("n_tokens")
            ).alias("coverage"),
        )
        .orderBy(F.desc("coverage"), F.desc("covered_tokens"), "doc_id")
        .limit(50)
        .crossJoin(F.broadcast(scal))  # 1-row scalar, not a cartesian
    )


# ONE SQL text executed literally by BOTH engines (the geohash / Hilbert
# discipline): the count-derived SRP sizing law as a design table.
_SRP_SIZING_SQL = """
    SELECT n,
           CAST(LEAST(63, GREATEST(4, LENGTH(BIN(CAST(n AS BIGINT) * 8))))
                AS BIGINT) AS r,
           floor(((CAST(n AS DOUBLE) * 8) / POWER(2.0,
             LEAST(63, GREATEST(4, LENGTH(BIN(CAST(n AS BIGINT) * 8))))))
             * 10000 + 0.5) / 10000 AS noise_per_vec
    FROM (VALUES (1000), (10000), (100000), (1000000), (10000000),
                 (100000000), (1000000000), (10000000000),
                 (100000000000), (1000000000000)) t(n)
    ORDER BY n
"""


def q_srp_sizing_table(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the round-13 dynamic SRP sizing law as a DESIGN TABLE (the
    q_lsh_design_table companion for the embedding tier): for corpus
    sizes 10^3..10^12, the count-derived rows_per_band r =
    clamp(bitlen(n·b), 4, 63) that embedding_near_dup_pairs
    (rows_per_band=None) and its oracle both compute, and the expected
    NOISE candidates per vector n·b/2^r it buys — ≈1 at every scale,
    the number that keeps the verify stage linear where a fixed r goes
    quadratic once n outgrows it. Same literal SQL text on both
    engines (SQL-parity shape; the r formula string is the oracle's
    own); tests pin the formula against dedup.auto_rows_per_band."""
    return spark.sql(_SRP_SIZING_SQL)


ORACLES: dict[str, str | None] = {
    "q_srp_sizing_table": _SRP_SIZING_SQL,
    "q_repeated_spans": f"""
        WITH toked AS (
          SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
        ),
        sized AS (
          SELECT doc_id, toks, len(toks) AS n_tokens FROM toked
          WHERE len(toks) >= 8
        ),
        wins AS (
          SELECT doc_id, n_tokens, i AS start,
                 md5(array_to_string(toks[i:i+7], ' ')) AS h
          FROM sized, unnest(range(1, n_tokens - 6)) AS t(i)
        ),
        dup AS (
          SELECT h, count(*) AS occ FROM wins GROUP BY h
          HAVING count(*) >= 2
        ),
        dwins AS (SELECT w.* FROM wins w JOIN dup USING (h)),
        covered AS (
          SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT)
                   AS covered_tokens
          FROM (SELECT doc_id, unnest(range(start, start + 8)) AS pos
                FROM dwins)
          GROUP BY doc_id
        ),
        perdoc AS (
          SELECT doc_id, n_tokens,
                 CAST(count(*) AS BIGINT) AS dup_windows,
                 CAST(count(DISTINCT h) AS BIGINT) AS dup_spans
          FROM dwins GROUP BY doc_id, n_tokens
        ),
        scal AS (
          SELECT CAST(count(*) AS BIGINT) AS corpus_dup_spans,
                 CAST(coalesce(sum(occ), 0) AS BIGINT)
                   AS corpus_dup_windows
          FROM dup
        )
        SELECT p.doc_id, CAST(p.n_tokens AS BIGINT) AS n_tokens,
               dup_windows, dup_spans, covered_tokens,
               floor(covered_tokens / p.n_tokens * 10000 + 0.5) / 10000
                 AS coverage,
               corpus_dup_spans, corpus_dup_windows
        FROM perdoc p JOIN covered USING (doc_id), scal
        ORDER BY coverage DESC, covered_tokens DESC, doc_id
        LIMIT 50
    """,
    "q_dedup_exact": f"""
        SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY {_NORM_TEXT_SQL}
    """,
    "q_dup_rate_by_source": f"""
        WITH d AS (
          SELECT doc_id, source, {_NORM_TEXT_SQL} AS k FROM documents
        ),
        clus AS (
          SELECT k, min(doc_id) AS keep_id FROM d GROUP BY k
        ),
        j AS (
          SELECT d.doc_id, d.source, clus.keep_id, ks.source AS keep_source
          FROM d
          JOIN clus ON d.k = clus.k
          JOIN d ks ON ks.doc_id = clus.keep_id
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(CASE WHEN doc_id <> keep_id THEN 1 END)
                    AS BIGINT) AS n_dup_rows,
               floor(CAST(count(CASE WHEN doc_id <> keep_id THEN 1 END)
                          AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) * 10000 + 0.5) / 10000
                 AS dup_rate,
               CAST(count(CASE WHEN doc_id <> keep_id
                               AND keep_source <> source THEN 1 END)
                    AS BIGINT) AS n_cross_source
        FROM j GROUP BY source ORDER BY source
    """,
    "q_minhash_accuracy": rf"""
    WITH toked AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ),
    shingled AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3 THEN
               list_distinct(list_transform(range(1, len(toks) - 1),
                 i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END AS sh
      FROM toked
    ),
    exploded AS (SELECT doc_id, unnest(sh) AS s FROM shingled),
    hs AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h
      FROM exploded
    ),
    sig AS (
      SELECT doc_id,
             {', '.join(
                 f"min((h * {a} + {b}) % 2147483647) AS m{j}"
                 for j, (a, b) in enumerate(dedup._minhash_params(16))
             )}
      FROM hs GROUP BY doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM exploded a JOIN exploded b
        ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jpairs AS (
      SELECT id_a, id_b,
             floor(common / (sa.n + sb.n - common) * 10000 + 0.5) / 10000
               AS jaccard
      FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE floor(common / (sa.n + sb.n - common) * 10000 + 0.5) / 10000
            >= 0.2
    ),
    m AS (
      SELECT id_a, id_b, jaccard,
             ({' + '.join(
                 f"CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END"
                 for j in range(16)
             )}) AS matches
      FROM jpairs
      JOIN sig a ON a.doc_id = id_a
      JOIN sig b ON b.doc_id = id_b
    )
    SELECT id_a, id_b, jaccard,
           floor(matches / 16.0 * 10000 + 0.5) / 10000 AS mh_est,
           floor(abs(floor(matches / 16.0 * 10000 + 0.5) / 10000 - jaccard)
                 * 10000 + 0.5) / 10000 AS abs_err
    FROM m
""",
    "q_containment_join": rf"""
    WITH clus AS (
      SELECT {_NORM_TEXT_SQL} AS norm_text,
             min(doc_id) AS rep_id, count(*) AS csize
      FROM documents GROUP BY 1
    ),
    reps AS (SELECT rep_id AS doc_id, norm_text AS text FROM clus),
    toked AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM reps
    ),
    shingled AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3 THEN
               list_distinct(list_transform(range(1, len(toks) - 1),
                 i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END AS sh
      FROM toked
    ),
    exploded AS (SELECT doc_id, unnest(sh) AS s FROM shingled),
    sizes AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM exploded a JOIN exploded b
        ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    j AS (
      SELECT id_a, id_b, common, sa.n AS na, sb.n AS nb
      FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    ),
    oriented AS (
      SELECT id_a AS src, id_b AS dst,
             floor(common / CAST(na AS DOUBLE) * 10000 + 0.5) / 10000
               AS containment
      FROM j
      UNION ALL
      SELECT id_b, id_a,
             floor(common / CAST(nb AS DOUBLE) * 10000 + 0.5) / 10000
      FROM j
    ),
    qual AS (
      SELECT src, dst, containment FROM oriented WHERE containment >= 0.8
    ),
    jp AS (
      SELECT src, dst, containment,
             CAST(cs.csize * cd.csize AS BIGINT) AS member_pairs
      FROM qual
      JOIN clus cs ON cs.rep_id = src
      JOIN clus cd ON cd.rep_id = dst
    ),
    -- FULL directed enumeration over every document: total_pairs comes
    -- from here, cross-engine-proving the Spark side's cluster-collapse
    -- arithmetic (intra + Σ csize_src·csize_dst) against ground truth
    ftoked AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ),
    fshingled AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3 THEN
               list_distinct(list_transform(range(1, len(toks) - 1),
                 i -> array_to_string(toks[i:i+2], ' ')))
             ELSE [array_to_string(toks, ' ')] END AS sh
      FROM ftoked
    ),
    fexploded AS (SELECT doc_id, unnest(sh) AS s FROM fshingled),
    fsizes AS (SELECT doc_id, count(*) AS n FROM fexploded GROUP BY doc_id),
    fpairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM fexploded a JOIN fexploded b
        ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    fj AS (
      SELECT id_a, id_b, common, sa.n AS na, sb.n AS nb
      FROM fpairs
      JOIN fsizes sa ON sa.doc_id = id_a
      JOIN fsizes sb ON sb.doc_id = id_b
    ),
    foriented AS (
      SELECT floor(common / CAST(na AS DOUBLE) * 10000 + 0.5) / 10000
               AS containment
      FROM fj
      UNION ALL
      SELECT floor(common / CAST(nb AS DOUBLE) * 10000 + 0.5) / 10000
      FROM fj
    )
    SELECT src, dst, containment, member_pairs,
           (SELECT CAST(coalesce(sum(csize * (csize - 1)), 0) AS BIGINT)
            FROM clus) AS dup_cluster_pairs,
           (SELECT CAST(count(*) AS BIGINT) FROM foriented
            WHERE containment >= 0.8) AS total_pairs
    FROM jp ORDER BY containment DESC, src, dst LIMIT 100
""",
    "q_ngram_jaccard": rf"""
    WITH clus AS (
      SELECT {_NORM_TEXT_SQL} AS norm_text,
             min(doc_id) AS rep_id, count(*) AS csize
      FROM documents GROUP BY 1
    ),
    reps AS (SELECT rep_id AS doc_id, norm_text AS text FROM clus),
    p AS ({_ngram_jaccard_sql(0.2, source="reps")}),
    jp AS (
      SELECT id_a, id_b, jaccard,
             CAST(ca.csize * cb.csize AS BIGINT) AS member_pairs
      FROM p
      JOIN clus ca ON ca.rep_id = id_a
      JOIN clus cb ON cb.rep_id = id_b
    ),
    -- FULL enumeration: total_pairs from ground truth, proving the
    -- Spark side's ΣC(csize,2) + Σ csizeA·csizeB collapse arithmetic
    fullp AS ({_NGRAM_JACCARD_SQL})
    SELECT id_a, id_b, jaccard, member_pairs,
           (SELECT CAST(coalesce(sum((csize * (csize - 1)) // 2), 0)
                   AS BIGINT) FROM clus) AS dup_cluster_pairs,
           (SELECT CAST(count(*) AS BIGINT) FROM fullp) AS total_pairs
    FROM jp ORDER BY jaccard DESC, id_a, id_b LIMIT 100
""",
    "q_dedup_threshold_sweep": f"""
        WITH pairs AS ({_NGRAM_JACCARD_SQL}),
        per AS (
          SELECT floor(jaccard * 20) / 20 AS band,
                 CAST(count(*) AS BIGINT) AS n_pairs
          FROM pairs GROUP BY band
        )
        SELECT band, n_pairs,
               CAST(sum(n_pairs) OVER (ORDER BY band DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_at_or_above
        FROM per ORDER BY band
    """,
    "q_similarity_join": _NGRAM_JACCARD_SQL,
    "q_similarity_join_maxdf": _ngram_jaccard_maxdf_sql(0.2, 0.1),
    # prefix filtering is lossless → same result as the full index join
    "q_similarity_join_prefix": _ngram_jaccard_sql(0.5),
    "q_chunk_dedup": f"""
        WITH toked AS (
          SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
        ),
        st AS (
          SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks), 1), 16)) AS start
          FROM toked
        ),
        fps AS (
          SELECT doc_id,
                 substr(md5(array_to_string(toks[start + 1 : start + 16], ' ')),
                        1, 16) AS fp
          FROM st
        )
        SELECT fp, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
        FROM fps GROUP BY fp HAVING count(*) > 1
        ORDER BY cnt DESC, fp LIMIT 20
    """,
    # LSH tier re-contracted to deterministic oracle-checkable outputs:
    # with 16 hashes / 8 bands the banding recall is 1.0 on this corpus
    # (pinned by tests/test_dedup.py::test_lsh_recall_is_total), and the
    # emitted pairs are exact-Jaccard-verified — so LSH output == the exact
    # trigram-Jaccard pair set at the same threshold.
    "q_dedup_minhash": _ngram_jaccard_sql(0.5),
    "q_dedup_clusters": _closure_clusters_sql(_ngram_jaccard_sql(0.5)),
    "q_dedup_semantic": f"""
        WITH comp AS (
          {_closure_clusters_sql(_embedding_pairs_auto_sql(0.4, bands=8))}
        ),
        q AS ({_quality_doc_sql("documents")}),
        memb AS (
          SELECT c.id, c.cluster_id, q.quality,
                 CAST(q.n_tokens AS BIGINT) AS n_tokens
          FROM comp c JOIN q ON q.doc_id = c.id
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY cluster_id ORDER BY quality DESC, id
          ) AS rk FROM memb
        ),
        per AS (
          SELECT m.cluster_id,
                 CAST(count(*) AS BIGINT) AS csize,
                 CAST(sum(m.n_tokens) AS BIGINT) AS tok,
                 CAST(min(m.id) AS BIGINT) AS min_id
          FROM memb m GROUP BY m.cluster_id
        ),
        best AS (
          SELECT cluster_id, n_tokens AS keep_tok, quality AS keep_q
          FROM ranked WHERE rk = 1
        ),
        minq AS (
          SELECT p.cluster_id, m.quality AS min_q
          FROM per p JOIN memb m
            ON m.cluster_id = p.cluster_id AND m.id = p.min_id
        )
        SELECT CAST(count(*) AS BIGINT) AS sem_clusters,
               CAST(sum(csize - 1) AS BIGINT) AS sem_dup_docs,
               CAST(sum(tok - keep_tok) AS BIGINT) AS sem_dup_tokens,
               CAST(sum(tok) AS BIGINT) AS sem_cluster_tokens,
               CAST(sum(CAST(floor(keep_q * 10000 + 0.5) AS BIGINT)
                        - CAST(floor(min_q * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) / 10000.0 AS keep_quality_gain
        FROM per JOIN best USING (cluster_id) JOIN minq USING (cluster_id)
    """,
    "q_dedup_impact": f"""
        WITH comp AS ({_closure_clusters_sql(_ngram_jaccard_sql(0.5))}),
        tk AS (
          SELECT doc_id, {_NORM_TEXT_SQL} AS norm,
                 {_TOKENS_SQL} AS toks
          FROM documents
        ),
        sized AS (SELECT doc_id, norm, toks, len(toks) AS n_tokens FROM tk),
        totals AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS tokens_total
          FROM sized
        ),
        exact_drop AS (
          SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT)
                   AS exact_dup_docs,
                 CAST(coalesce(sum(tok - keep_tok), 0) AS BIGINT)
                   AS exact_dup_tokens
          FROM (
            SELECT norm, count(*) AS n, sum(n_tokens) AS tok,
                   min_by(n_tokens, doc_id) AS keep_tok
            FROM sized GROUP BY norm
          )
        ),
        near_drop AS (
          SELECT CAST(count(*) AS BIGINT) AS near_dup_docs,
                 CAST(coalesce(sum(s.n_tokens), 0) AS BIGINT)
                   AS near_dup_tokens
          FROM comp JOIN sized s ON s.doc_id = comp.id
          WHERE comp.id <> comp.cluster_id
        ),
        wins AS (
          SELECT doc_id, i AS start,
                 md5(array_to_string(toks[i:i+7], ' ')) AS h
          FROM sized, unnest(range(1, n_tokens - 6)) AS t(i)
          WHERE n_tokens >= 8
        ),
        dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
        dw AS (SELECT w.doc_id, w.start FROM wins w JOIN dup USING (h)),
        span_tok AS (
          SELECT CAST(coalesce(count(*), 0) AS BIGINT)
                   AS span_dup_tokens
          FROM (
            SELECT DISTINCT doc_id, pos FROM (
              SELECT doc_id, unnest(range(start, start + 8)) AS pos
              FROM dw)
          )
        )
        SELECT n_docs, tokens_total, exact_dup_docs, exact_dup_tokens,
               near_dup_docs, near_dup_tokens, span_dup_tokens,
               floor(near_dup_tokens / tokens_total * 10000 + 0.5) / 10000
                 AS pct_near,
               floor(span_dup_tokens / tokens_total * 10000 + 0.5) / 10000
                 AS pct_span
        FROM totals, exact_drop, near_drop, span_tok
    """,
    "q_lsh_design_table": f"""
        WITH grid AS (
          SELECT CAST(k AS DOUBLE) / 20.0 AS j
          FROM unnest(range(1, 21)) AS t(k)
        ),
        cfg AS (
          SELECT * FROM (VALUES (1, 16), (2, 8), (4, 4), (8, 2),
                                (16, 1)) AS v(bands, rows_per_band)
        )
        SELECT bands, rows_per_band,
               floor(j * 10000 + 0.5) / 10000 AS jaccard,
               floor((CASE
                 WHEN bands = 1 THEN {_scurve_sql(16, 1)}
                 WHEN bands = 2 THEN {_scurve_sql(8, 2)}
                 WHEN bands = 4 THEN {_scurve_sql(4, 4)}
                 WHEN bands = 8 THEN {_scurve_sql(2, 8)}
                 ELSE {_scurve_sql(1, 16)} END) * 10000 + 0.5) / 10000
                 AS p_candidate
        FROM grid, cfg
        ORDER BY bands, jaccard
    """,
    "q_dedup_keep_best": f"""
        WITH clusters AS ({_closure_clusters_sql(_ngram_jaccard_sql(0.5))}),
        q AS ({_quality_doc_sql("documents")}),
        memb AS (
          SELECT c.id, c.cluster_id, q.quality
          FROM clusters c JOIN q ON q.doc_id = c.id
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY cluster_id ORDER BY quality DESC, id
          ) AS rk FROM memb
        ),
        agg AS (
          SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize,
                 min(id) AS min_id
          FROM memb GROUP BY cluster_id
        ),
        best AS (
          SELECT cluster_id, id AS keep_id, quality AS keep_quality
          FROM ranked WHERE rk = 1
        ),
        minq AS (
          SELECT a.cluster_id, m.quality AS min_quality
          FROM agg a JOIN memb m
            ON m.cluster_id = a.cluster_id AND m.id = a.min_id
        )
        SELECT b.cluster_id, csize, keep_id, keep_quality, a.min_id,
               floor((keep_quality - min_quality) * 10000 + 0.5) / 10000
                 AS quality_gain
        FROM best b JOIN agg a USING (cluster_id)
        JOIN minq USING (cluster_id)
        ORDER BY b.cluster_id
    """,
    # LSH == exact pair set on this corpus (the recall-1.0 contract), so
    # recall and precision both equal exactly 1.0 — derived from the data
    # (NULL if the corpus had no true pairs, which would also be a failure)
    "q_dedup_minhash_recall": f"""
        WITH pairs AS ({_ngram_jaccard_sql(0.5)})
        SELECT CASE WHEN count(*) > 0 THEN 1.0 ELSE NULL END AS recall,
               CASE WHEN count(*) > 0 THEN 1.0 ELSE NULL END AS precision
        FROM pairs
    """,
    # embedding LSH tier: planes inlined as double literals, band/bucket
    # sign assembly + candidate join + exact-cosine verify replicated in
    # DuckDB — checks the actual approximate algorithm, not rows-only
    "q_dedup_embedding": _embedding_pairs_sql(0.4, bands=8, rows_per_band=4),
    "q_dedup_embedding_recall": _embedding_recall_sql(
        0.4, bands=8, rows_per_band=4
    ),
    # single staged file + availableNow ⇒ one micro-batch ⇒ streaming
    # first-occurrence = global min id per fingerprint
    "q_streaming_dedup": f"""
        SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
               substr(md5({_NORM_TEXT_SQL}), 1, 16) AS fp
        FROM documents GROUP BY fp
    """,
    "q_dedup_incremental": f"""
        WITH fps AS (
          SELECT doc_id, substr(md5({_NORM_TEXT_SQL}), 1, 16) AS fp
          FROM documents
        ),
        reps AS (
          SELECT fp, min(doc_id) AS doc_id FROM fps
          WHERE doc_id % 10 >= 8 GROUP BY fp
        ),
        seen AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 < 8)
        SELECT r.doc_id, r.fp FROM reps r
        LEFT JOIN seen s ON r.fp = s.fp
        WHERE s.fp IS NULL
    """,
    # cross-side exact trigram-Jaccard pairs (recall-1.0 LSH contract,
    # same as q_dedup_minhash), oriented batch→corpus
    "q_dedup_minhash_join": rf"""
        WITH toked AS (
          SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
        ),
        shingled AS (
          SELECT doc_id,
                 CASE WHEN len(toks) >= 3 THEN
                   list_distinct(list_transform(range(1, len(toks) - 1),
                     i -> array_to_string(toks[i:i+2], ' ')))
                 ELSE [array_to_string(toks, ' ')] END AS sh
          FROM toked
        ),
        exploded AS (SELECT doc_id, unnest(sh) AS s FROM shingled),
        sizes AS (SELECT doc_id, count(*) AS n FROM exploded GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS common
          FROM exploded a JOIN exploded b ON a.s = b.s
          WHERE a.doc_id % 10 >= 8 AND b.doc_id % 10 < 8
          GROUP BY 1, 2
        )
        SELECT left_id, right_id,
               floor(common / (sa.n + sb.n - common) * 10000 + 0.5) / 10000 AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.doc_id = left_id
        JOIN sizes sb ON sb.doc_id = right_id
        WHERE floor(common / (sa.n + sb.n - common) * 10000 + 0.5) / 10000 >= 0.5
    """,
    # survivors of cluster dedup: everything except non-representative
    # members of the exact-pair-set closure (recall-1.0 LSH contract)
    "q_dedup_representatives": f"""
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (
          SELECT id FROM ({_closure_clusters_sql(_ngram_jaccard_sql(0.5))})
          WHERE id <> cluster_id
        )
    """,
    "q_dedup_embedding_join": _embedding_join_sql(
        0.4, bands=8, rows_per_band=4
    ),
    # streaming form: same recall-1.0 contract as q_dedup_minhash (see
    # the query docstring for the single-batch drain argument)
    "q_streaming_minhash": _ngram_jaccard_sql(0.5),
    "q_dedup_clusters_exact": _closure_clusters_sql(_NGRAM_JACCARD_SQL),
    # portable md5-60-bit token hash → the SimHash signature, candidate
    # join, and hamming distances are fully reproducible in DuckDB
    "q_dedup_simhash": _simhash_pairs_sql(24),
    "q_entity_resolution": """
        WITH ents AS MATERIALIZED (
          SELECT CAST(c_custkey AS BIGINT) AS ent_id,
                 lower(c_name) AS name
          FROM customer
          UNION ALL
          SELECT CAST(c_custkey AS BIGINT) + 1000000000000,
                 substr(lower(c_name), 1, 9) || 'x'
                   || substr(lower(c_name), 11)
          FROM customer WHERE c_custkey % 7 = 0
          UNION ALL
          SELECT CAST(c_custkey AS BIGINT) + 2000000000000,
                 substr(lower(c_name), 1, 10) || 'z'
                   || substr(lower(c_name), 12)
          FROM customer WHERE c_custkey % 3 = 0
        ),
        blocked AS MATERIALIZED (
          SELECT ent_id, name, substr(name, length(name) - 3) AS blk
          FROM ents
        ),
        cand AS MATERIALIZED (
          SELECT a.ent_id AS id_a, b.ent_id AS id_b,
                 levenshtein(a.name, b.name) AS lev
          FROM blocked a
          JOIN blocked b ON a.blk = b.blk AND a.ent_id < b.ent_id
        ),
        comp AS MATERIALIZED (
          WITH RECURSIVE pairs AS (
            SELECT id_a, id_b FROM cand WHERE lev <= 2
          ),
          edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs
          ),
          nodes AS (SELECT DISTINCT src AS id FROM edges),
          reach(id, label) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
          )
          SELECT id, min(label) AS cluster_id FROM reach GROUP BY id
        ),
        cstats AS MATERIALIZED (
          SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
          FROM comp GROUP BY cluster_id
        ),
        report AS (
          SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM ents) AS n_entities,
            (SELECT CAST(count(*) AS BIGINT) FROM cand)
              AS n_candidate_pairs,
            (SELECT CAST(count(*) AS BIGINT) FROM cand WHERE lev <= 2)
              AS n_matched_pairs,
            (SELECT CAST(count(*) AS BIGINT) FROM cstats)
              AS n_multi_clusters,
            (SELECT CAST(coalesce(sum(csize), 0) AS BIGINT) FROM cstats)
              AS n_paired,
            (SELECT CAST(coalesce(max(csize), 0) AS BIGINT) FROM cstats)
              AS max_cluster_size
        )
        SELECT n_entities, n_candidate_pairs, n_matched_pairs,
               n_multi_clusters,
               n_entities - n_paired + n_multi_clusters AS n_resolved,
               n_paired - n_multi_clusters AS n_merged_away,
               max_cluster_size
        FROM report
    """,
}
