"""Training-data curation: gopher quality, PII, decontamination, sampling, packing.

Registry family module — split from the single-file registry; each
family defines its ``q_*`` callables plus the matching ``ORACLES``
entries, aggregated in ``__init__``."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.functions import text
from data_wrangle_openstreetmaps_data_spark.operators import (
    audit,
    curation,
    dedup,
    sample,
)

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403



def q_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-Q — Gopher/MassiveText-style per-document quality signals
    (token count, mean word length, symbol-word / stopword fractions,
    top-token share, duplicate-token fraction) as two chained hash
    aggregations keyed by doc id. Oracle replicates tokenization,
    the symbol regex, and both aggregation levels."""
    return curation.gopher_quality_stats(table(spark, sf, "documents"))


def q_repetition_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-Q — duplicate-bigram fraction and top-bigram share per
    document (the Gopher repetition filter's n-gram signal), built on the
    codegen shingle table. Short docs contribute their whole token string
    as one shingle (shingle_table contract, mirrored in the oracle)."""
    return curation.repeated_ngram_stats(table(spark, sf, "documents"), k=2)


def q_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-P — PII redaction (emails, IPv4s, phone numbers) with per-kind
    match counts. The corpus is synthetic word soup with no PII, so a
    deterministic planted suffix (every 3rd doc gets an email + phone +
    IP derived from its id) makes the check non-vacuous: both engines
    must find and redact exactly the planted strings, in the same
    email→IP→phone order. RE2-safe patterns = identical semantics in
    Java regex and DuckDB."""
    docs = table(spark, sf, "documents")
    planted = docs.withColumn(
        "t",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-867-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" at 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.col("text")),
    )
    return curation.pii_scrub(planted, text_col="t", out_col="scrubbed").select(
        "doc_id",
        "n_email",
        "n_ip",
        "n_phone",
        F.md5("scrubbed").alias("scrub_hash"),
    )


def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-P — benchmark decontamination: 5-gram overlap between the
    training split and a held-out "benchmark" split (doc_id % 29 == 0
    stands in for an eval set), emitting (train_id, bench_id, n_shared
    distinct shingles). Inverted-index join on hashed shingles with the
    bench side broadcast — the contamination check shape that survives a
    100 TB train corpus."""
    docs = table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 29 == 0)
    train = docs.filter(F.col("doc_id") % 29 != 0)
    return curation.decontaminate_overlap(train, bench, k=5, min_shared=1)


def q_decontaminate_policy(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-P — decontamination POLICY COMPARISON in one row: how many
    train docs the exact 5-gram-overlap rule removes (q_decontaminate's
    policy — any shared 5-gram with any benchmark doc) vs the fuzzy
    near-dup rule (minhash cross-corpus join at trigram-Jaccard ≥ 0.5 —
    the 100 TB path when the benchmark is too large to broadcast its
    shingles), plus their overlap and union. The exact rule is strictly
    more aggressive on THIS corpus iff n_both = n_fuzzy_removed — the
    report shows it rather than assumes it. Both legs are
    scale-honest: the k-gram leg is the broadcast inverted-index join,
    the fuzzy leg is the banded LSH (never all-pairs); the counts are
    four hash aggregates over their outputs. With the recall-1.0
    banding config the fuzzy leg EQUALS the exact cross-split
    trigram-Jaccard pair set, so the relational oracle applies (same
    contract as q_dedup_minhash_join)."""
    docs = table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 29 == 0)
    train = docs.filter(F.col("doc_id") % 29 != 0)
    ex = (
        curation.decontaminate_overlap(train, bench, k=5, min_shared=1)
        .select(F.col("train_id").alias("id"))
        .distinct()
        .transform(_mat)  # 2 consumers: count + overlap join
    )
    fz = (
        dedup.minhash_lsh_join(
            train, bench, n_hashes=16, bands=8, shingle_k=3, threshold=0.5
        )
        .select(F.col("left_id").alias("id"))
        .distinct()
        .transform(_mat)  # 2 consumers: count + overlap join
    )
    n_train = train.agg(
        F.count(F.lit(1)).cast("long").alias("n_train")
    )
    n_ex = ex.agg(F.count(F.lit(1)).cast("long").alias("n_exact_removed"))
    n_fz = fz.agg(F.count(F.lit(1)).cast("long").alias("n_fuzzy_removed"))
    n_both = ex.join(fz, "id").agg(
        F.count(F.lit(1)).cast("long").alias("n_both")
    )
    return (
        n_train.crossJoin(F.broadcast(n_ex))  # 1-row scalars throughout
        .crossJoin(F.broadcast(n_fz))
        .crossJoin(F.broadcast(n_both))
        .select(
            "n_train",
            "n_exact_removed",
            "n_fuzzy_removed",
            "n_both",
            (
                F.col("n_exact_removed")
                + F.col("n_fuzzy_removed")
                - F.col("n_both")
            )
            .cast("long")
            .alias("n_either"),
        )
    )


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-S — deterministic per-language Bernoulli sampling (en 50%,
    fr 25%, zh 10%, rest kept): keep iff portable md5 hash of the id
    lands under the stratum's rate. No shuffle — a filter riding the
    scan; the oracle replicates the hash arithmetic literally."""
    sampled = curation.stratified_sample(
        table(spark, sf, "documents"),
        rates={"en": 0.5, "fr": 0.25, "zh": 0.1},
        strata_col="lang",
    )
    return sampled.select("doc_id", "lang")


def q_domain_mix(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-S — temperature-scaled domain-mixture weights (w_s ∝
    tokens_s^0.7, normalized): the per-source sampling distribution used
    to mix pretraining sources. One agg to per-source token totals plus a
    scalar normalization."""
    docs = table(spark, sf, "documents")
    with_tok = docs.select("source", text.token_count("text").alias("n_tok"))
    return curation.mixture_weights(
        with_tok, source_col="source", weight_col="n_tok", alpha=0.7
    )


def q_seq_packing(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-S — concat-and-chunk sequence packing at ctx_len=512: global
    token-stream offsets per document (prefix sum over id order), the
    pack window holding the doc's first token, and whether it crosses a
    window boundary. The prefix sum is a range-partitioned sort +
    running sum — the standard scalable global-window shape."""
    return curation.pack_sequences(table(spark, sf, "documents"), ctx_len=512)


def q_sample_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-S — exact-n stratified sample (20 docs per language) by
    portable-hash ranking inside each stratum: fixed-size, reproducible
    across engines and cluster sizes, replicated literally in the
    oracle's window."""
    return sample.sample_per_group(
        table(spark, sf, "documents").select("doc_id", "lang"),
        n=20, strata_col="lang", id_col="doc_id",
    )


def q_token_budget_select(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-S — data selection under a token budget: quality-ranked
    greedy prefix whose cumulative token count fits 5000 tokens. Ranking
    uses the ROUNDED quality score (deterministic cross-engine ordering)
    with id tiebreak; the oracle re-derives the same running sum."""
    docs = table(spark, sf, "documents")
    return curation.token_budget_select(
        docs, budget=5000, quality_col=text.quality_score("text")
    )


def q_quantile_filter(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-Q — per-language quality-quantile cut: drop each language's
    bottom quartile by percent_rank over (quality, id). Quota-style
    filtering a global threshold cannot express when strata have
    different score distributions."""
    return curation.quantile_filter(
        table(spark, sf, "documents"),
        quality_col=text.quality_score("text"),
        min_quantile=0.25,
        strata_col="lang",
    )


def q_curation_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the incremental curation ORCHESTRATION (datapipe.ingest_batch)
    run for real over two batches with on-disk parquet state: batch 1
    (doc_id%10<8) seeds the corpus state, batch 2 (doc_id%10>=8) is then
    exact-deduped against the state fingerprints AND near-dup-dropped
    against the state docs (recall-1.0 MinHash join). The oracle states
    the composed one-shot semantics of the same two steps."""
    import os
    import shutil
    import uuid

    from data_wrangle_openstreetmaps_data_spark.plans.datapipe import (
        ingest_batch,
    )

    docs = table(spark, sf, "documents").select("doc_id", "text")
    state = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        ".tmp", f"incr_{uuid.uuid4().hex[:8]}",
    )
    a1 = ingest_batch(spark, docs.filter(F.col("doc_id") % 10 < 8), state)
    a2 = ingest_batch(spark, docs.filter(F.col("doc_id") % 10 >= 8), state)
    # accepted frames are localCheckpointed — the state files can go
    shutil.rmtree(state, ignore_errors=True)
    return (
        a1.select(F.lit(1).alias("batch_no"), "doc_id", "fp")
        .unionByName(a2.select(F.lit(2).alias("batch_no"), "doc_id", "fp"))
        .orderBy("batch_no", "doc_id")
    )


def q_curation_pipeline_v2(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the round-3 data-release pipeline END TO END (benchmark
    split-off → PII scrub → repetition cut → per-language quality
    quantile → exact dedup → k-gram decontamination → id/lang/quality/
    fingerprint), value-checked against ONE composed DuckDB statement —
    the whole pipeline's semantics, not just its stages."""
    from data_wrangle_openstreetmaps_data_spark.plans.datapipe import curate_v2

    res = curate_v2(
        table(spark, sf, "documents"), collect_stats=False
    )
    return res.curated


def q_curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the full training-data curation pipeline (lang filter →
    quality gate → exact dedup → near-dup clustering → fingerprint),
    oracle-checked end-to-end: every stage is deterministic and the
    minhash banding (16 hashes / 8 bands) has recall 1.0 on this corpus,
    so the whole pipeline is replicated as one composed DuckDB query."""
    from data_wrangle_openstreetmaps_data_spark.plans.datapipe import curate

    res = curate(
        table(spark, sf, "documents"),
        near_dup_threshold=0.5,
        collect_stats=False,  # the gate discards stats — skip 6 count() jobs
    )
    return res.curated.select("doc_id", "pred", "quality", "fp").orderBy(
        "doc_id"
    )


def q_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — quality-weighted (importance) sampling: each document kept
    with probability equal to its quality score, decided by the portable
    md5 id-hash against an integer threshold — deterministic across runs,
    engines and cluster sizes, reproducible for ablations. Pure filter on
    the scan, zero shuffle — the only acceptable cost for a 100 TB
    downsampling pass."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    docs = table(spark, sf, "documents")
    q = text.quality_score("text")  # round4-ed → integer threshold exact
    thr = F.floor(q * 10000 + F.lit(0.5))
    bucket = F.pmod(
        portable_token_hash(F.col("doc_id").cast("string")), F.lit(10000)
    )
    return docs.filter(bucket < thr).select("doc_id", "lang", q.alias("quality"))


def q_split_leakage_safe(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — LEAKAGE-SAFE train/val/test split: hashing each DOCUMENT
    into a split (q_dataset_split's rule) lets exact/near duplicates
    straddle train and test — silent eval contamination. The fix is
    GROUP-consistent assignment: hash the dup-cluster representative
    (min doc id per normalized text; swap in the near-dup component id
    for fuzzy leakage) so every member of a cluster lands in the same
    split. Output: per split, member counts under both policies, plus
    the proof columns — clusters whose members span ≥2 splits under the
    naive doc-hash (> 0 on this corpus) and under the cluster hash
    (0 by construction, COMPUTED not assumed). The cluster map is the
    NEAR-dup component id (recall-1.0 minhash pairs → connected
    components — this corpus has zero EXACT duplicates, so an
    exact-text grouping would be vacuous); docs in no pair are their
    own singleton cluster. Oracle: recursive-CTE closure over the
    exact-Jaccard pair set + the identical md5 split rule."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    def split_of(key):
        b = F.pmod(portable_token_hash(key.cast("string")), F.lit(10))
        return (
            F.when(b <= 7, F.lit("train"))
            .when(b == 8, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    docs = table(spark, sf, "documents")
    pairs = dedup.dedup_minhash_lsh(
        docs, n_hashes=16, bands=8, shingle_k=3, threshold=0.5
    )
    comp = dedup.dup_clusters(pairs)
    memb = docs.select("doc_id").join(
        comp.select(F.col("id").alias("doc_id"), "cluster_id"),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster"),
    ).select(
        "doc_id",
        "cluster",
        split_of(F.col("cluster")).alias("safe_split"),
        split_of(F.col("doc_id")).alias("naive_split"),
    ).transform(_mat)  # 3 consumers: 2 counts + spanning
    safe = memb.groupBy(F.col("safe_split").alias("split")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_safe")
    )
    naive = memb.groupBy(F.col("naive_split").alias("split")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_naive")
    )
    span = memb.groupBy("cluster").agg(
        F.countDistinct("naive_split").alias("ns"),
        F.countDistinct("safe_split").alias("ss"),
    ).agg(
        F.count(F.when(F.col("ns") > 1, 1))
        .cast("long")
        .alias("clusters_spanning_naive"),
        F.count(F.when(F.col("ss") > 1, 1))
        .cast("long")
        .alias("clusters_spanning_safe"),
    )
    return (
        safe.join(naive, "split")
        .crossJoin(F.broadcast(span))  # 1-row scalar
        .orderBy("split")
    )


def q_dataset_split(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — deterministic train/val/test split: each document lands in a
    split by its portable 60-bit md5 id-hash mod 10 (8/1/1) — stable
    across runs, engines, and cluster sizes (no rand(), no global order),
    the canonical release-split op. Output: per-(split, lang) counts and
    mean doc length — the split-balance audit."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    docs = table(spark, sf, "documents")
    bucket = F.pmod(
        portable_token_hash(F.col("doc_id").cast("string")), F.lit(10)
    )
    split = (
        F.when(bucket <= 7, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            text.round4(F.avg("n_chars")).alias("avg_chars"),
        )
    )


def q_negative_sampling(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-S — deterministic negative sampling for recommender /
    contrastive training: 3 pseudo-random candidate suppliers per
    customer from the portable md5 hash (reproducible across engines,
    runs, and cluster sizes — no rand()), anti-joined against the
    observed co-purchase edges so only true negatives survive. The
    anti-join keys on (cust, supp) — candidates shuffle by key, the
    edge side reuses the fact-fact join; nothing driver-side. Output is
    the per-slot candidate/negative audit (a left join + match flag in
    ONE pass, same shape as q_bloom_prune_join's account)."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )
    ns = table(spark, sf, "supplier").agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    cand = (
        table(spark, sf, "customer")
        .select("c_custkey")
        .crossJoin(F.broadcast(ns))
        .select(
            "c_custkey",
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("j"),
            "n_supp",
        )
        .select(
            "c_custkey",
            "j",
            F.pmod(
                portable_token_hash(
                    F.concat(
                        F.col("c_custkey").cast("string"),
                        F.lit("#"),
                        F.col("j").cast("string"),
                    )
                ),
                F.col("n_supp"),
            ).alias("suppkey"),
        )
    )
    # LEFT SEMI against the RAW (non-distinct) edge pairs (r14): a semi
    # match flag is duplicate-insensitive, so copurchase_edges'
    # closing .distinct() — one full exchange + hash aggregate over the
    # edge set, the query's largest intermediate — is dropped. Counting
    # candidates and matches separately is provably the old left-join
    # null-count over distinct edges (a candidate either has >=1 edge
    # or none); outputs asserted identical before landing, locally
    # bench-neutral (~2s either way — the fact-fact join dominates at
    # sf0.1), one fewer exchange of the edge set at scale.
    edges = (
        table(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .join(
            table(spark, sf, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
    )
    matched = (
        cand.join(
            edges,
            (F.col("c_custkey") == F.col("custkey"))
            & (cand["suppkey"] == edges["suppkey"]),
            "left_semi",
        )
        .groupBy("j")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    n_cands = cand.groupBy("j").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    return (
        n_cands.join(matched, "j", "left")
        .select(
            "j",
            "n_candidates",
            (
                F.col("n_candidates")
                - F.coalesce(F.col("n_matched"), F.lit(0))
            ).alias("n_negatives"),
        )
        .orderBy("j")
    )


def q_dataset_card(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-Q — the dataset datasheet one-rower: corpus size, total
    tokens, exact-dedup distinct texts and the implied duplicate rate,
    language count, and the dominant language with its share — the
    summary block a dataset card / datasheet publishes. Two single-pass
    aggregates (corpus profile + per-lang counts) and a deterministic
    argmax over the |langs|-row frame, all stitched with broadcast
    1-row scalars: at 100 TB this is two scans, no wide shuffle."""
    docs = table(spark, sf, "documents")
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count("text")).alias("total_tokens"),
        F.countDistinct(text.normalize_ws("text")).alias("distinct_texts"),
        F.countDistinct("lang").alias("n_langs"),
    )
    langs = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    top_lang = (
        langs.orderBy(F.desc("cnt"), "lang")
        .limit(1)
        .select(F.col("lang").alias("top_lang"), F.col("cnt").alias("top_cnt"))
    )
    return base.crossJoin(F.broadcast(top_lang)).select(
        "n_docs",
        "total_tokens",
        "distinct_texts",
        text.round4(
            F.lit(1.0) - F.col("distinct_texts") / F.col("n_docs")
        ).alias("dup_rate"),
        "n_langs",
        "top_lang",
        text.round4(F.col("top_cnt") / F.col("n_docs")).alias(
            "top_lang_share"
        ),
    )


def q_js_divergence(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-Q — per-source corpus drift as the Jensen–Shannon divergence
    (nats) between each source's language distribution P and the global
    corpus distribution Q: JS = ½·KL(P‖M) + ½·KL(Q‖M) with M = (P+Q)/2.
    The mixture-monitoring metric for a training-data pipeline — which
    ingest feed's language mix is drifting from the corpus. JS needs no
    smoothing: a zero cell (source lacks a language) contributes only
    through the Q‖M term, where M > 0 whenever Q > 0, and 0·ln 0 = 0 is
    the explicit CASE arm. Support grid = sources × global langs from two
    tiny broadcast aggregates (left-join fills absent cells with 0), all
    probabilities are exact bigint-count ratios widened to double once,
    and the ≤|langs|-term per-source sum lands inside the shared 4-dp
    floor. Two pushed-down (source, lang) scans; one shuffle each —
    |sources|·|langs| stays tiny no matter the corpus row count."""
    d = table(spark, sf, "documents")
    per = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    gl = d.groupBy("lang").agg(F.count(F.lit(1)).alias("gcnt"))
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    srcn = d.groupBy("source").agg(F.count(F.lit(1)).alias("sn"))
    grid = (
        srcn.crossJoin(F.broadcast(gl))
        .join(per, ["source", "lang"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("cnt").cast("double") / F.col("sn").cast("double")
    q = F.col("gcnt").cast("double") / F.col("n").cast("double")
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(F.col("cnt") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + q * F.log(q / m)
    ) / F.lit(2.0)
    return (
        grid.groupBy("source")
        .agg(
            F.max("sn").alias("n_docs"),
            text.round4(F.sum(term)).alias("js_nats"),
        )
        .orderBy("source")
    )


_URL_SCHEMES = ["http", "HTTP", "Http"]
_URL_HOSTS = [
    "Example.com",
    "example.COM",
    "www.example.com",
    "WWW.Example.COM",
]
_URL_QUERIES = [
    "?utm_source=news&b=2&a=1",
    "?a=1&b=2",
    "?b=2&a=1&utm_medium=email",
    "",
]


def _canon_url(url: F.Column) -> F.Column:
    """Canonicalize a URL with pure JVM string expressions (no UDF):
    lowercase scheme+host, strip the scheme's DEFAULT port only (:80
    for http, :443 for https — 'https://h:80/x' is a distinct
    non-default-port URL and must survive; r10 advice), leading www.,
    trailing slash, utm_* params; sort the rest. Whole-stage-codegen
    friendly — the 100 TB crawl-dedup normalizer is exactly this
    shape."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    rest = F.regexp_replace(url, r"^[A-Za-z]+://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]+)", 1)
    path_q = F.substr(rest, F.length(hostport) + F.lit(1))
    deported = (
        F.when(
            scheme == "http",
            F.regexp_replace(F.lower(hostport), r":80$", ""),
        )
        .when(
            scheme == "https",
            F.regexp_replace(F.lower(hostport), r":443$", ""),
        )
        .otherwise(F.lower(hostport))
    )
    host = F.regexp_replace(deported, r"^www\.", "")
    path = F.regexp_replace(
        F.regexp_extract(path_q, r"^([^?]*)", 1), r"/+$", ""
    )
    qs = F.when(
        path_q.contains("?"), F.regexp_extract(path_q, r"\?(.*)$", 1)
    ).otherwise("")
    params = F.array_join(
        F.sort_array(
            F.filter(
                F.split(qs, "&"),
                lambda x: (~x.startswith("utm_")) & (x != ""),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(""),
    )


def q_url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-S — URL canonicalization + duplicate grouping, the crawl
    ingestion step before any content dedup: scheme/host case, default
    :80 port, leading www., trailing slashes, utm_* tracking params,
    and query-param ORDER are all identity-irrelevant, so the dirty
    corpus (deterministic per-doc variants: 3 scheme casings × 4 host
    forms × optional port / trailing slash × 4 query shapes) collapses
    100 raw spellings per page down to one canonical key. Everything is
    JVM string expressions + one hash agg on the canonical key — no
    UDF, no shuffle beyond the group-count, linear at any scale.
    Output: top 20 canonical URLs by dup_count (url tiebreak) +
    accounting scalars n_urls / n_raw_distinct / n_canonical /
    dup_frac (round4)."""
    d = F.col("doc_id")
    url = F.concat(
        _pick(d, _URL_SCHEMES),
        F.lit("://"),
        _pick(d, _URL_HOSTS),
        F.when(d % 3 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p/"),
        (d % 50).cast("string"),
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        _pick(d, _URL_QUERIES),
    )
    raw = table(spark, sf, "documents").select(
        "doc_id", url.alias("url")
    )
    canon = _mat(  # 2 consumers: group counts + raw/canonical scalars
        raw.select("url", _canon_url(F.col("url")).alias("curl"))
    )
    groups = canon.groupBy("curl").agg(F.count("*").alias("dup_count"))
    scal = canon.agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("url").alias("n_raw_distinct"),
        F.countDistinct("curl").alias("n_canonical"),
    ).select(
        "*",
        text.round4(
            F.lit(1) - F.col("n_canonical") / F.col("n_urls")
        ).alias("dup_frac"),
    )
    return (
        groups.orderBy(F.desc("dup_count"), "curl")
        .limit(20)
        .withColumnRenamed("curl", "canonical_url")
        .crossJoin(F.broadcast(scal))  # 1-row scalar
    )


def q_stratified_quota_sample(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — EXACT deterministic stratified sampling (training-mixture
    construction): k=100 customers per market segment, membership
    defined by the portable 60-bit md5 rank of the key — the SAME rows
    on any cluster, any partitioning, any engine (vs rand()-based
    sampleBy, which is neither reproducible cross-engine nor exact per
    stratum). Selection is min-k per stratum via topk.bottom_k — the
    blocked two-phase rank, no per-stratum single-partition sort — so
    the sample of a 100 TB stratum never funnels its rows through one
    task. Per-stratum report pins the exact SET cross-engine: count,
    key-sum checksum, min/max sampled rank.

    q_sample_alias_bias is the cautionary twin (systematic stride
    sampling aliases with periodic signals); hash-rank sampling has no
    stride to alias."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )
    from data_wrangle_openstreetmaps_data_spark.operators.topk import (
        bottom_k,
    )

    cust = table(spark, sf, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_custkey").cast("long").alias("key"),
        portable_token_hash(F.col("c_custkey").cast("string")).alias(
            "hrank"
        ),
    )
    sampled = bottom_k(cust, ["segment"], "hrank", k=100)
    totals = cust.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    rep = sampled.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("key").cast("long").alias("key_checksum"),
        F.min("hrank").alias("min_rank"),
        F.max("hrank").alias("max_rank"),
    )
    return (
        totals.join(rep, "segment")
        .select(
            "segment", "n_total", "n_sampled", "key_checksum",
            "min_rank", "max_rank",
        )
        .orderBy("segment")
    )


def q_mergeable_sample(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — MERGEABILITY PROOF for the deterministic hash-rank sample
    (the property that makes q_stratified_quota_sample work on a
    sharded 100 TB corpus): per-source bottom-k(200) document samples
    by portable md5 rank, UNION-merged and re-ranked, must equal the
    bottom-k built directly over the whole corpus — min-k is
    associative/idempotent exactly like KMV registers, so per-shard /
    per-day / per-tenant samples roll up WITHOUT re-scanning raw data.
    The equality ships as computed columns (same shape as the keyset ≡
    OFFSET proof): identical counts, identical key-sum checksums, and
    n_diff = |direct Δ merged| = 0, all engine-checked."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )
    from data_wrangle_openstreetmaps_data_spark.operators.topk import (
        bottom_k,
    )

    docs = table(spark, sf, "documents").select(
        "source",
        F.col("doc_id").cast("long").alias("key"),
        portable_token_hash(F.col("doc_id").cast("string")).alias(
            "hrank"
        ),
    )
    k = 200
    per_shard = bottom_k(docs, ["source"], "hrank", k=k)
    merged = bottom_k(
        per_shard.select("key", "hrank"), [], "hrank", k=k
    )
    direct = bottom_k(docs.select("key", "hrank"), [], "hrank", k=k)
    m = merged.agg(
        F.count(F.lit(1)).alias("n_merged"),
        F.sum("key").cast("long").alias("merged_checksum"),
    )
    d = direct.agg(
        F.count(F.lit(1)).alias("n_direct"),
        F.sum("key").cast("long").alias("direct_checksum"),
    )
    diff = (
        direct.select("key")
        .join(merged.select("key"), "key", "full")
        .filter(
            direct["key"].isNull() | merged["key"].isNull()
        )
        .agg(F.count(F.lit(1)).alias("n_diff"))
    )
    shards = docs.agg(
        F.countDistinct("source").alias("n_shards")
    )
    return (
        shards.crossJoin(F.broadcast(d))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(diff))
        .select(
            "n_shards", "n_direct", "n_merged",
            "direct_checksum", "merged_checksum", "n_diff",
        )
    )


ORACLES: dict[str, str | None] = {
    "q_mergeable_sample": """
        WITH d AS (
          SELECT source, CAST(doc_id AS BIGINT) AS key,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   AS hrank
          FROM documents
        ),
        per_shard AS (
          SELECT source, key, hrank FROM (
            SELECT *, row_number() OVER (
                     PARTITION BY source ORDER BY hrank, source, key
                   ) AS rn
            FROM d
          ) WHERE rn <= 200
        ),
        merged AS (
          SELECT key FROM (
            SELECT key, row_number() OVER (ORDER BY hrank, key) AS rn
            FROM per_shard
          ) WHERE rn <= 200
        ),
        direct AS (
          SELECT key FROM (
            SELECT key, row_number() OVER (ORDER BY hrank, key) AS rn
            FROM d
          ) WHERE rn <= 200
        )
        SELECT
          (SELECT CAST(count(DISTINCT source) AS BIGINT) FROM d)
            AS n_shards,
          (SELECT CAST(count(*) AS BIGINT) FROM direct) AS n_direct,
          (SELECT CAST(count(*) AS BIGINT) FROM merged) AS n_merged,
          (SELECT CAST(sum(key) AS BIGINT) FROM direct)
            AS direct_checksum,
          (SELECT CAST(sum(key) AS BIGINT) FROM merged)
            AS merged_checksum,
          (SELECT CAST(count(*) AS BIGINT)
           FROM direct FULL JOIN merged USING (key)
           WHERE direct.key IS NULL OR merged.key IS NULL) AS n_diff
    """,
    "q_stratified_quota_sample": """
        WITH c AS (
          SELECT c_mktsegment AS segment,
                 CAST(c_custkey AS BIGINT) AS key,
                 ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
                   AS hrank
          FROM customer
        ),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY segment ORDER BY hrank, segment, key
                 ) AS rn
          FROM c
        ),
        rep AS (
          SELECT segment,
                 CAST(count(*) AS BIGINT) AS n_sampled,
                 CAST(sum(key) AS BIGINT) AS key_checksum,
                 min(hrank) AS min_rank,
                 max(hrank) AS max_rank
          FROM ranked WHERE rn <= 100 GROUP BY segment
        ),
        tot AS (
          SELECT segment, CAST(count(*) AS BIGINT) AS n_total
          FROM c GROUP BY segment
        )
        SELECT segment, n_total, n_sampled, key_checksum,
               min_rank, max_rank
        FROM tot JOIN rep USING (segment)
        ORDER BY segment
    """,
    "q_url_canonicalize": f"""
        WITH raw AS (
          SELECT doc_id,
                 {_sql_pick("doc_id", _URL_SCHEMES)} || '://' ||
                 {_sql_pick("doc_id", _URL_HOSTS)} ||
                 CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END ||
                 '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
                 CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
                 {_sql_pick("doc_id", _URL_QUERIES)} AS url
          FROM documents
        ),
        p1 AS (
          SELECT url,
                 lower(regexp_extract(url, '^([A-Za-z]+)://', 1))
                   AS scheme,
                 regexp_replace(url, '^[A-Za-z]+://', '') AS rest
          FROM raw
        ),
        p2 AS (
          SELECT *,
                 regexp_extract(rest, '^([^/?]+)', 1) AS hostport,
                 substr(rest,
                        length(regexp_extract(rest, '^([^/?]+)', 1)) + 1)
                   AS path_q
          FROM p1
        ),
        p3 AS (
          SELECT *,
                 regexp_replace(
                   CASE WHEN scheme = 'http'
                          THEN regexp_replace(lower(hostport), ':80$', '')
                        WHEN scheme = 'https'
                          THEN regexp_replace(lower(hostport), ':443$', '')
                        ELSE lower(hostport) END,
                   '^www\\.', '') AS host,
                 regexp_replace(regexp_extract(path_q, '^([^?]*)', 1),
                                '/+$', '') AS path,
                 CASE WHEN path_q LIKE '%?%'
                      THEN regexp_extract(path_q, '\\?(.*)$', 1)
                      ELSE '' END AS qs
          FROM p2
        ),
        p4 AS (
          -- coalesce: DuckDB array_to_string over an EMPTY list is NULL
          SELECT *, coalesce(array_to_string(list_sort(list_filter(
                        string_split(qs, '&'),
                        x -> NOT starts_with(x, 'utm_') AND x <> '')),
                        '&'), '') AS params
          FROM p3
        ),
        canon AS (
          SELECT url,
                 scheme || '://' || host || path ||
                 CASE WHEN params = '' THEN ''
                      ELSE '?' || params END AS curl
          FROM p4
        ),
        scal AS (
          SELECT count(*) AS n_urls,
                 CAST(count(DISTINCT url) AS BIGINT) AS n_raw_distinct,
                 CAST(count(DISTINCT curl) AS BIGINT) AS n_canonical,
                 floor((1 - CAST(count(DISTINCT curl) AS DOUBLE)
                        / count(*)) * 10000 + 0.5) / 10000 AS dup_frac
          FROM canon
        )
        SELECT g.curl AS canonical_url, g.dup_count,
               s.n_urls, s.n_raw_distinct, s.n_canonical, s.dup_frac
        FROM (SELECT curl, count(*) AS dup_count FROM canon GROUP BY 1
              ORDER BY dup_count DESC, curl LIMIT 20) g, scal s
        ORDER BY g.dup_count DESC, canonical_url
    """,
    "q_js_divergence": """
        WITH per AS (
          SELECT source, lang, count(*) AS cnt
          FROM documents GROUP BY source, lang
        ),
        gl AS (SELECT lang, count(*) AS gcnt FROM documents GROUP BY lang),
        srcn AS (SELECT source, count(*) AS sn FROM documents GROUP BY source),
        tot AS (SELECT count(*) AS n FROM documents),
        grid AS (
          SELECT s.source, s.sn, g.lang, g.gcnt, coalesce(p.cnt, 0) AS cnt
          FROM srcn s CROSS JOIN gl g
          LEFT JOIN per p ON p.source = s.source AND p.lang = g.lang
        ),
        terms AS (
          SELECT source, sn,
                 (CASE WHEN cnt > 0
                       THEN (CAST(cnt AS DOUBLE) / CAST(sn AS DOUBLE))
                            * ln((CAST(cnt AS DOUBLE) / CAST(sn AS DOUBLE))
                                 / ((CAST(cnt AS DOUBLE) / CAST(sn AS DOUBLE)
                                     + CAST(gcnt AS DOUBLE)
                                       / CAST(n AS DOUBLE)) / 2.0))
                       ELSE 0.0 END
                  + (CAST(gcnt AS DOUBLE) / CAST(n AS DOUBLE))
                    * ln((CAST(gcnt AS DOUBLE) / CAST(n AS DOUBLE))
                         / ((CAST(cnt AS DOUBLE) / CAST(sn AS DOUBLE)
                             + CAST(gcnt AS DOUBLE)
                               / CAST(n AS DOUBLE)) / 2.0))
                 ) / 2.0 AS term
          FROM grid, tot
        )
        SELECT source, max(sn) AS n_docs,
               floor(sum(term) * 10000 + 0.5) / 10000 AS js_nats
        FROM terms GROUP BY source ORDER BY source
    """,
    "q_dataset_card": f"""
        WITH base AS (
          SELECT count(*) AS n_docs,
                 CAST(sum(len({_TOKENS_SQL})) AS BIGINT) AS total_tokens,
                 count(DISTINCT {_NORM_TEXT_SQL}) AS distinct_texts,
                 count(DISTINCT lang) AS n_langs
          FROM documents
        ),
        tl AS (
          SELECT lang AS top_lang, count(*) AS top_cnt FROM documents
          GROUP BY lang ORDER BY top_cnt DESC, lang LIMIT 1
        )
        SELECT n_docs, total_tokens, distinct_texts,
               floor((1.0 - distinct_texts / CAST(n_docs AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS dup_rate,
               n_langs, top_lang,
               floor(top_cnt / CAST(n_docs AS DOUBLE) * 10000 + 0.5)
                 / 10000 AS top_lang_share
        FROM base, tl
    """,
    "q_negative_sampling": """
        WITH ns AS (SELECT count(*) AS n FROM supplier),
        cand AS (
          SELECT c_custkey, j,
                 ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#'
                                     || CAST(j AS VARCHAR)), 1, 15))::BIGINT
                   % (SELECT n FROM ns) AS suppkey
          FROM customer, (SELECT unnest([0, 1, 2]) AS j)
        ),
        edges AS (
          SELECT DISTINCT o_custkey AS custkey, l_suppkey AS suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )
        SELECT j, count(*) AS n_candidates,
               count(CASE WHEN e.custkey IS NULL THEN 1 END) AS n_negatives
        FROM cand LEFT JOIN edges e
          ON cand.c_custkey = e.custkey AND cand.suppkey = e.suppkey
        GROUP BY j ORDER BY j
    """,
    # curation battery: every approximate/heuristic step replicated
    # literally (tokenization, regexes, hash arithmetic, window frames)
    "q_gopher_quality": _gopher_quality_sql(),
    "q_repetition_ngrams": _repetition_ngrams_sql(2),
    "q_pii_scrub": _pii_scrub_sql(),
    "q_decontaminate": _decontaminate_sql(5, 1, 29),
    "q_decontaminate_policy": f"""
        WITH exact_pairs AS ({_decontaminate_sql(5, 1, 29)}),
        ex AS (SELECT DISTINCT train_id AS id FROM exact_pairs),
        jac AS ({_ngram_jaccard_sql(0.5)}),
        fz AS (
          SELECT DISTINCT
                 CASE WHEN id_a % 29 <> 0 THEN id_a ELSE id_b END AS id
          FROM jac
          WHERE (id_a % 29 = 0) <> (id_b % 29 = 0)
        ),
        tr AS (
          SELECT CAST(count(*) AS BIGINT) AS n_train FROM documents
          WHERE doc_id % 29 <> 0
        ),
        ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact_removed FROM ex),
        nf AS (SELECT CAST(count(*) AS BIGINT) AS n_fuzzy_removed FROM fz),
        nb AS (
          SELECT CAST(count(*) AS BIGINT) AS n_both
          FROM ex JOIN fz USING (id)
        )
        SELECT n_train, n_exact_removed, n_fuzzy_removed, n_both,
               CAST(n_exact_removed + n_fuzzy_removed - n_both AS BIGINT)
                 AS n_either
        FROM tr, ne, nf, nb
    """,
    "q_stratified_sample": _STRATIFIED_SAMPLE_SQL,
    "q_domain_mix": _DOMAIN_MIX_SQL,
    "q_seq_packing": _SEQ_PACKING_SQL,
    "q_sample_per_group": _SAMPLE_PER_GROUP_SQL,
    "q_token_budget_select": _token_budget_sql(5000),
    "q_quantile_filter": _quantile_filter_sql(0.25),
    # composed one-shot semantics of two sequential ingest_batch calls:
    # batch1 = exact min-id reps; batch2 = min-id reps whose fp is unseen
    # AND with no trigram-Jaccard >= 0.5 match against a batch1-accepted
    # doc (the recall-1.0 MinHash-join contract, as q_dedup_minhash_join)
    "q_curation_incremental": rf"""
        WITH fps AS (
          SELECT doc_id, substr(md5({_NORM_TEXT_SQL}), 1, 16) AS fp
          FROM documents
        ),
        b1_acc AS (
          SELECT fp, min(doc_id) AS doc_id FROM fps
          WHERE doc_id % 10 < 8 GROUP BY fp
        ),
        b2_reps AS (
          SELECT fp, min(doc_id) AS doc_id FROM fps
          WHERE doc_id % 10 >= 8 GROUP BY fp
        ),
        b2_novel AS (
          SELECT r.doc_id, r.fp FROM b2_reps r
          LEFT JOIN b1_acc s ON r.fp = s.fp WHERE s.fp IS NULL
        ),
        toked AS (
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
        cand AS (
          SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                 count(*) AS common
          FROM exploded a JOIN exploded b ON a.s = b.s
          WHERE a.doc_id IN (SELECT doc_id FROM b2_novel)
            AND b.doc_id IN (SELECT doc_id FROM b1_acc)
          GROUP BY 1, 2
        ),
        contaminated AS (
          SELECT DISTINCT left_id FROM cand
          JOIN sizes sa ON sa.doc_id = left_id
          JOIN sizes sb ON sb.doc_id = right_id
          WHERE floor(common / (sa.n + sb.n - common) * 10000 + 0.5) / 10000
                >= 0.5
        )
        SELECT 1 AS batch_no, doc_id, fp FROM b1_acc
        UNION ALL
        SELECT 2 AS batch_no, doc_id, fp FROM b2_novel
        WHERE doc_id NOT IN (SELECT left_id FROM contaminated)
        ORDER BY batch_no, doc_id
    """,
    "q_curation_pipeline_v2": _curation_v2_sql(0.65, 0.25, 5, 29),
    "q_curation_pipeline": _CURATION_SQL,
    "q_weighted_sample": rf"""
        WITH base AS (
          SELECT doc_id, lang, text, {_TOKENS_SQL} AS toks,
                 CASE WHEN length(text) > 0 THEN
                   length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                     / length(text)
                 ELSE 0.0 END AS punct_ratio
          FROM documents
        ),
        stats AS (
          SELECT doc_id, lang, len(toks) AS n_tokens, punct_ratio,
                 CASE WHEN len(toks) > 0 THEN
                   len(list_filter(toks, t -> t IN ({', '.join(f"'{w}'" for w in text.STOPWORDS_EN)})))
                     / len(toks)
                 ELSE 0.0 END AS stop_ratio
          FROM base
        ),
        scored AS (
          SELECT doc_id, lang,
                 floor((least(n_tokens / 50.0, 1.0) * 0.4
                       + (1.0 - least(punct_ratio * 5, 1.0)) * 0.3
                       + least(stop_ratio * 4, 1.0) * 0.3)
                       * 10000 + 0.5) / 10000 AS quality
          FROM stats
        )
        SELECT doc_id, lang, quality FROM scored
        WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 10000) < floor(quality * 10000 + 0.5)
    """,
    "q_split_leakage_safe": f"""
        WITH comp AS ({_closure_clusters_sql(_ngram_jaccard_sql(0.5))}),
        d AS (
          SELECT doc_id,
                 coalesce((SELECT cluster_id FROM comp
                           WHERE comp.id = documents.doc_id), doc_id)
                   AS cluster
          FROM documents
        ),
        memb AS (
          SELECT d.doc_id, d.cluster,
                 CASE WHEN (('0x' || substr(md5(CAST(d.cluster AS VARCHAR)),
                             1, 15))::BIGINT) % 10 <= 7 THEN 'train'
                      WHEN (('0x' || substr(md5(CAST(d.cluster AS VARCHAR)),
                             1, 15))::BIGINT) % 10 = 8 THEN 'val'
                      ELSE 'test' END AS safe_split,
                 CASE WHEN (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                             1, 15))::BIGINT) % 10 <= 7 THEN 'train'
                      WHEN (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                             1, 15))::BIGINT) % 10 = 8 THEN 'val'
                      ELSE 'test' END AS naive_split
          FROM d
        ),
        safe AS (
          SELECT safe_split AS split, CAST(count(*) AS BIGINT)
                   AS n_docs_safe
          FROM memb GROUP BY 1
        ),
        naive AS (
          SELECT naive_split AS split, CAST(count(*) AS BIGINT)
                   AS n_docs_naive
          FROM memb GROUP BY 1
        ),
        span AS (
          SELECT CAST(count(*) FILTER (ns > 1) AS BIGINT)
                   AS clusters_spanning_naive,
                 CAST(count(*) FILTER (ss > 1) AS BIGINT)
                   AS clusters_spanning_safe
          FROM (SELECT cluster,
                       count(DISTINCT naive_split) AS ns,
                       count(DISTINCT safe_split) AS ss
                FROM memb GROUP BY cluster)
        )
        SELECT s.split, n_docs_safe, n_docs_naive,
               clusters_spanning_naive, clusters_spanning_safe
        FROM safe s JOIN naive n ON s.split = n.split, span
        ORDER BY s.split
    """,
    "q_dataset_split": """
        WITH b AS (
          SELECT lang, n_chars,
                 (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  ::BIGINT % 10) AS bucket
          FROM documents
        )
        SELECT CASE WHEN bucket <= 7 THEN 'train'
                    WHEN bucket = 8 THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               count(*) AS n_docs,
               floor(avg(n_chars) * 10000 + 0.5) / 10000 AS avg_chars
        FROM b GROUP BY 1, 2
    """,
}
