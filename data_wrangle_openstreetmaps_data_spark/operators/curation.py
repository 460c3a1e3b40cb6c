"""Corpus-curation operators for LLM training-data pipelines (EXT).

The reference repo stops at audit/clean/reshape; a 100 TB pretraining
pipeline additionally needs the standard curation battery — repetition
and quality heuristics (Gopher/C4-style), PII redaction, benchmark
decontamination, stratified source sampling, mixture weighting, and
sequence packing. Everything here is relational (explode → aggregate →
join), shuffles only on document/stratum keys, and is replicated in
DuckDB oracle SQL (plans/queries/ package) — no rows-only contracts.

Scale posture per operator is documented on each function; the common
theme: per-document metrics are ONE explode + ONE (or two chained)
hash aggregations keyed by doc id, so partial aggregation keeps the
shuffle linear in distinct keys, never in token volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.functions.text import (
    round4,
    shingle_table,
    tokens,
)

# ---------------------------------------------------------------------------
# Gopher/C4-style quality heuristics
# ---------------------------------------------------------------------------

_STOPWORDS_EN = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "with",
)

# a token is "symbolic" if it contains any character that is not a latin
# letter or digit (RE2- and Java-regex-identical character class)
_SYMBOL_RE = "[^a-z0-9]"


def gopher_quality_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher-style quality signals (Rae et al. 2021, §A1.1
    MassiveText filters, adapted to single-line corpora):

    - ``n_tokens``          whitespace token count
    - ``mean_word_len``     average token length (round4)
    - ``symbol_word_frac``  fraction of tokens containing non-alphanumerics
    - ``stopword_frac``     fraction of tokens in a small English stop list
    - ``top_token_share``   most frequent token's share of all tokens
    - ``dup_token_frac``    1 - distinct/total tokens (repetition signal)

    Two chained aggregations, both keyed by document: (id, token) counts,
    then per-id weighted rollup — partial aggregation map-side-combines
    each, so the shuffle carries distinct (id, token) pairs, not token
    occurrences. Empty documents survive (explode_outer) with zeroed
    metrics rather than disappearing."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(text_col)).alias("tok"),
    )
    per_tok = tok.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    # guard the null-token row of empty docs out of every numerator AND
    # the totals: an empty doc has n = 0 and all fractions null→0
    is_tok = F.col("tok").isNotNull()
    n = F.sum(F.when(is_tok, F.col("cnt")).otherwise(0))
    agg = per_tok.groupBy("id").agg(
        n.alias("n_tokens"),
        F.sum(F.when(is_tok, F.length("tok") * F.col("cnt")).otherwise(0)).alias("_len_sum"),
        F.sum(
            F.when(is_tok & F.col("tok").rlike(_SYMBOL_RE), F.col("cnt")).otherwise(0)
        ).alias("_sym"),
        F.sum(
            F.when(F.col("tok").isin(*_STOPWORDS_EN), F.col("cnt")).otherwise(0)
        ).alias("_stop"),
        F.max(F.when(is_tok, F.col("cnt")).otherwise(0)).alias("_top"),
        F.count(F.when(is_tok, 1)).alias("_distinct"),
    )
    nz = F.col("n_tokens") > 0
    return agg.select(
        F.col("id").alias(id_col),
        "n_tokens",
        round4(F.when(nz, F.col("_len_sum") / F.col("n_tokens")).otherwise(0.0)).alias("mean_word_len"),
        round4(F.when(nz, F.col("_sym") / F.col("n_tokens")).otherwise(0.0)).alias("symbol_word_frac"),
        round4(F.when(nz, F.col("_stop") / F.col("n_tokens")).otherwise(0.0)).alias("stopword_frac"),
        round4(F.when(nz, F.col("_top") / F.col("n_tokens")).otherwise(0.0)).alias("top_token_share"),
        round4(F.when(nz, 1 - F.col("_distinct") / F.col("n_tokens")).otherwise(0.0)).alias("dup_token_frac"),
    )


def repeated_ngram_stats(
    df: DataFrame, k: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document duplicate-k-gram fractions (the Gopher "fraction of
    characters in duplicate n-grams" signal, computed over token k-grams):

    - ``n_ngrams``        total k-gram occurrences
    - ``dup_ngram_frac``  1 - distinct/total (share of repeated occurrences)
    - ``top_ngram_share`` most frequent k-gram's share

    Built on ``shingle_table`` (posexplode + window lead — codegen, one
    tokenize per doc); same two-level aggregation shape as
    ``gopher_quality_stats``. Documents shorter than k tokens contribute
    their whole token string as one shingle (shingle_table contract), so
    every document appears in the output."""
    sh = shingle_table(df, text_col=text_col, id_col=id_col, k=k)
    per = sh.groupBy("id", "shingle").agg(F.count(F.lit(1)).alias("cnt"))
    agg = per.groupBy("id").agg(
        F.sum("cnt").alias("n_ngrams"),
        F.count(F.lit(1)).alias("_distinct"),
        F.max("cnt").alias("_top"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        "n_ngrams",
        round4(1 - F.col("_distinct") / F.col("n_ngrams")).alias("dup_ngram_frac"),
        round4(F.col("_top") / F.col("n_ngrams")).alias("top_ngram_share"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Deliberately RE2-safe (no lookaround, no backrefs) so the exact same
# pattern strings run in Java regex (Spark) and RE2 (DuckDB oracle).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Redact emails, IPv4 addresses, and NNN-NNN-NNNN phone numbers,
    appending per-kind match counts (``n_email``/``n_ip``/``n_phone``)
    and the redacted text as ``out_col``.

    Application order matters and is part of the contract: email first
    (their dotted domains must not be half-eaten by the IP rule), then IP,
    then phone (whose dotted form is a sub-pattern of IPs). Each kind's
    count is taken on the text AS THAT STAGE SEES IT (post prior
    redactions), so ``n_*`` always equals the number of ``<TAG>``s the
    stage actually inserted — a phone-shaped substring consumed by the
    email pass is counted as email, not double-counted as phone. Pure
    regexp_count/regexp_replace column expressions — codegen, no UDF, no
    shuffle; at 100 TB this is a free rider on any existing scan."""
    out = df
    cur = F.col(text_col)
    for name, pat, tag in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, tag)
    return out.withColumn(out_col, cur)


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate_overlap(
    train: DataFrame,
    bench: DataFrame,
    k: int = 5,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train↔benchmark k-gram overlap (the n-gram decontamination check
    used for pretraining corpora vs eval sets): (train_id, bench_id,
    n_shared) for every pair sharing >= ``min_shared`` DISTINCT k-gram
    shingles.

    Inverted-index join on xxhash64(shingle) longs — identical scale shape
    to the exact Jaccard join (dedup.py): candidate volume is keyed by
    shared shingles, never |train|×|bench|. The benchmark side is tiny by
    nature (eval sets), so Catalyst broadcasts it; at 100 TB the train
    side streams through one shuffle-free broadcast join + one
    (train_id, bench_id) count aggregation."""
    t = (
        shingle_table(train, text_col=text_col, id_col=id_col, k=k)
        .select(F.col("id").alias("train_id"), F.xxhash64("shingle").alias("h"))
        .dropDuplicates(["train_id", "h"])
    )
    b = (
        shingle_table(bench, text_col=text_col, id_col=id_col, k=k)
        .select(F.col("id").alias("bench_id"), F.xxhash64("shingle").alias("h"))
        .dropDuplicates(["bench_id", "h"])
    )
    return (
        t.join(F.broadcast(b), "h")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Stratified sampling / mixture weights
# ---------------------------------------------------------------------------

def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    ``portable_hash(id) % buckets < rate[stratum] * buckets``.

    Hash-based (not rand()): reproducible across runs/retries/engines —
    the DuckDB oracle replicates the md5-derived hash literally. No
    shuffle at all: sampling is a filter riding the scan, which is the
    only acceptable cost for a 100 TB down-sampling pass."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    if "_bucket" in df.columns:
        raise ValueError("input already has a _bucket column")
    df = df.withColumn(
        "_bucket",
        F.pmod(
            portable_token_hash(F.col(id_col).cast("string")), F.lit(buckets)
        ),
    )
    rate = F.lit(default_rate)
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(r)).otherwise(rate)
    return df.filter(F.col("_bucket") < rate * buckets).drop("_bucket")


def mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    weight_col: str = "n_tokens",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled mixture weights per source (the multinomial
    sampling weights used to mix pretraining domains): weight_s ∝
    (tokens_s)^alpha, normalized to sum 1. alpha=1 is proportional,
    alpha→0 is uniform — 0.7 is the common de-facto default.

    One aggregation to per-source totals (tiny) + a scalar normalization
    via a window over the single-row-per-source frame — no data-sized
    shuffle."""
    per = df.groupBy(source_col).agg(F.sum(weight_col).alias("total_tokens"))
    w = F.pow(F.col("total_tokens").cast("double"), F.lit(alpha))
    win = Window.partitionBy()
    return per.select(
        source_col,
        "total_tokens",
        round4(w / F.sum(w).over(win)).alias("mix_weight"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    caches: list | None = None,
) -> DataFrame:
    """Corpus-unigram-LM score per document — the relational stand-in for
    perplexity filtering (CCNet-style: documents whose tokens are
    collectively improbable under a background LM are boilerplate/noise
    candidates): avg log10 P(token) over the doc's token occurrences,
    with P from the corpus's own unigram counts.

    Two aggregations + one join, all keyed by token or doc id: (token →
    corpus count) is vocabulary-sized (broadcastable — at 100 TB you'd
    persist the vocab of a reference corpus once and broadcast it, with
    an OOV floor), then each token occurrence looks up its probability
    and a per-doc avg folds it back. Empty docs survive with NULL score
    (no tokens to judge ≠ score 0).

    The exploded token table feeds BOTH the vocab aggregation and the
    scoring join; Spark does not reuse identical non-exchange subtrees,
    so it is persisted (same reason dedup persists its shingle table —
    pass ``caches`` to receive it for unpersisting)."""
    from pyspark.storagelevel import StorageLevel

    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(text_col)).alias("tok"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if caches is not None:
        caches.append(tok)
    vocab = (
        tok.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    total = vocab.agg(F.sum("tf").alias("n")).select(
        F.col("n").cast("double").alias("_total")
    )
    scored = (
        tok.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(total))  # one scalar row
        .select(
            "id",
            F.when(
                F.col("tok").isNotNull(),
                F.log10(F.col("tf") / F.col("_total")),
            ).alias("logp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("logp").alias("n_tokens"),
        round4(F.avg("logp")).alias("avg_logp"),
    ).select(F.col("id").alias(id_col), "n_tokens", "avg_logp")


def bigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    lam: float = 0.5, caches: list | None = None,
) -> DataFrame:
    """Interpolated bigram-LM score per document — the CCNet-style
    quality signal real curation pipelines gate on, upgrading
    ``unigram_logprob``'s stand-in: for each bigram position i ≥ 1,

        logp_i = log10( λ·P(w_i | w_{i-1}) + (1−λ)·P(w_i) )

    with P(w|v) = c(v,w) / c(v,·) from exact corpus bigram counts and
    P(w) = tf(w)/N from unigram counts; the doc score is the average
    over its bigram positions (docs with < 2 tokens survive with NULL
    score and n_bigrams = 0). λ = 0.5 — an exact binary double, so the
    interpolation arithmetic is reproducible cross-engine.

    Shape: two vocabulary-sized count aggregations (unigram + bigram)
    joined back to the bigram-occurrence table. Counts are broadcast
    here (they are vocabulary-sized, not corpus-sized); at 100 TB with
    an open vocabulary the same plan runs as shuffle hash joins keyed on
    (v, w) — flip the broadcast() hints, nothing else changes. The
    tokenized frame feeds both explodes (unigram counting + bigram
    building), so it is persisted; pass ``caches`` to unpersist."""
    from pyspark.storagelevel import StorageLevel

    d = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("toks")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if caches is not None:
        caches.append(d)
    vocab = (
        d.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    total = vocab.agg(
        F.sum("tf").cast("double").alias("_total")
    )
    n_bi = F.greatest(F.size("toks") - 1, F.lit(0))
    bg = d.select(
        "id",
        F.explode_outer(
            F.zip_with(
                F.slice(F.col("toks"), 1, n_bi),
                F.slice(F.col("toks"), 2, n_bi),
                lambda v, w: F.struct(v.alias("v"), w.alias("w")),
            )
        ).alias("bg"),
    ).select("id", F.col("bg.v").alias("v"), F.col("bg.w").alias("w"))
    bic = (
        bg.filter(F.col("v").isNotNull())
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("c_vw"))
    )
    leftc = bic.groupBy("v").agg(F.sum("c_vw").alias("c_v"))
    scored = (
        bg.join(F.broadcast(bic), ["v", "w"], "left")
        .join(F.broadcast(leftc), "v", "left")
        .join(F.broadcast(vocab), "w", "left")
        .crossJoin(F.broadcast(total))  # one scalar row
        .select(
            "id",
            F.when(
                F.col("v").isNotNull(),
                F.log10(
                    F.lit(lam) * (F.col("c_vw") / F.col("c_v"))
                    + F.lit(1.0 - lam) * (F.col("tf") / F.col("_total"))
                ),
            ).alias("logp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("logp").alias("n_bigrams"),
        round4(F.avg("logp")).alias("avg_logp"),
    ).select(F.col("id").alias(id_col), "n_bigrams", "avg_logp")


def _blocked_prefix_sum(
    df: DataFrame, block_col: str, order_cols: list, val_col: str,
    out_col: str,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``val_col`` over a global ordering, the
    scalable two-phase way: ``block_col`` must be a monotone function of
    the global order (contiguous order ranges per block). Phase 1 is a
    per-block running sum (shuffle keyed by block, parallel); phase 2
    cumulates only the per-block TOTALS — a window over #blocks rows,
    not #rows — and broadcasts the block offsets back. A naive
    ``Window.orderBy`` with no partition funnels every row through one
    task (Exchange SinglePartition — see every_nth's scale note); this
    keeps the row-scale work partitioned."""
    w_in = (
        Window.partitionBy(block_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = df.withColumn(
        "_within", F.coalesce(F.sum(val_col).over(w_in), F.lit(0))
    )
    totals = df.groupBy(block_col).agg(F.sum(val_col).alias("_bt"))
    w_blk = (
        Window.orderBy(block_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        block_col,
        F.coalesce(F.sum("_bt").over(w_blk), F.lit(0)).alias("_boff"),
    )
    return (
        within.join(F.broadcast(offsets), block_col)
        .withColumn(out_col, F.col("_within") + F.col("_boff"))
        .drop("_within", "_boff")
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    quality_col,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data selection under a token budget: rank documents by quality
    (descending, ties broken by id) and keep the maximal prefix whose
    cumulative token count fits within ``budget`` (whole documents only —
    the first doc that would overflow is dropped, as are all below it).

    Output: (id, quality, n_tokens, cum_tokens) for the kept set.
    The running sum uses the two-phase blocked prefix sum
    (``_blocked_prefix_sum``): quality is 4-dp rounded, so
    ``floor(-quality·10⁴)`` is a monotone block key over the descending
    quality order — per-block cumsums stay partitioned and only the
    ≤10⁴ block totals pass through a single-task window.
    ``quality_col`` is any numeric Column expression (e.g.
    ``text.quality_score``), evaluated once."""
    scored = df.select(
        F.col(id_col),
        quality_col.alias("quality"),
        F.size(tokens(text_col)).alias("n_tokens"),
    ).withColumn("_blk", F.floor(F.col("quality") * -10000))
    pref = _blocked_prefix_sum(
        scored, "_blk",
        [F.col("quality").desc(), F.col(id_col).asc()],
        "n_tokens", "_before",
    )
    return (
        pref.withColumn("cum_tokens", F.col("_before") + F.col("n_tokens"))
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, "quality", "n_tokens", "cum_tokens")
    )


def quantile_filter(
    df: DataFrame,
    quality_col,
    min_quantile: float = 0.25,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum quality-quantile cut: keep documents whose quality
    sits at or above the stratum's ``min_quantile`` (e.g. drop each
    language's bottom quartile — quota-style filtering that cannot be
    done with one global threshold when strata have different score
    distributions).

    Implemented with ``percent_rank`` over (stratum → quality asc, id):
    fully relational, one shuffle keyed by the stratum, identical
    semantics in the DuckDB oracle. Output: (id, stratum, quality,
    q_rank)."""
    w = Window.partitionBy(strata_col).orderBy(
        F.col("quality").asc(), F.col(id_col).asc()
    )
    scored = df.select(
        F.col(id_col), F.col(strata_col), quality_col.alias("quality")
    )
    return (
        scored.withColumn("q_rank", round4(F.percent_rank().over(w)))
        .filter(F.col("q_rank") >= min_quantile)
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

def pack_sequences(
    df: DataFrame,
    ctx_len: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the standard pretraining
    tokenizer feed): documents are laid out in ``id_col`` order into one
    token stream sliced into fixed ``ctx_len`` windows. Per document:

    - ``n_tokens``        token count
    - ``start_offset``    position of the doc's first token in the stream
    - ``pack_id``         window index containing the first token
    - ``spans_boundary``  whether the doc crosses a window edge

    The running offset is the two-phase blocked prefix sum
    (``_blocked_prefix_sum``) with ``floor(id / 100k)`` as the monotone
    block key: per-block cumsums shuffle by block and run parallel;
    only the per-block totals cross a single-task window. (A bare
    ``Window.orderBy`` would funnel every row through one task.)"""
    n_tok = F.size(tokens(text_col))
    out = df.select(F.col(id_col), n_tok.alias("n_tokens")).withColumn(
        "_blk", F.floor(F.col(id_col) / 100_000)
    )
    out = _blocked_prefix_sum(
        out, "_blk", [F.col(id_col).asc()], "n_tokens", "start_offset"
    )
    return out.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / ctx_len).alias("pack_id"),
        (
            (F.col("n_tokens") > 0)
            & (
                F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / ctx_len)
                > F.floor(F.col("start_offset") / ctx_len)
            )
        ).alias("spans_boundary"),
    )
