"""Text analysis: tokens, BM25, language-ID, quality, chunking, vocab.

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
    similarity,
)

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403



def q_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T1 — word count, top-20 with tiebreak."""
    df = table(spark, sf, "documents")
    return (
        df.select(F.explode(text.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("tok"))
        .limit(20)
    )


def q_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — BPE-ish token counting: words / number runs / single
    punctuation as separate tokens (regexp_extract_all), top-20."""
    df = table(spark, sf, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(text.BPE_ISH_RE), 0)
    return (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("tok"))
        .limit(20)
    )


def q_text_search(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — tf-idf keyword search: top-10 documents for a fixed query."""
    return similarity.tfidf_search(
        table(spark, sf, "documents"), SEARCH_TERMS, k=10
    )


def q_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — BM25 keyword search: top-10 documents for the fixed query,
    doc-length-normalized (k1=1.2, b=0.75)."""
    return similarity.bm25_search(
        table(spark, sf, "documents"), SEARCH_TERMS, k=10
    )


def q_doc_chunking(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — split each document into overlapping fixed-size token
    windows (size 32, stride 24): the context-window preparation step of a
    training pipeline. One generate per doc (no join, no shuffle until a
    downstream consumer groups); each chunk carries its token count and a
    16-hex md5 fingerprint so chunk-level dedup can run without re-reading
    text."""
    d = table(spark, sf, "documents").select(
        "doc_id", text.tokens("text").alias("toks")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(_CHUNK_STRIDE)
    )
    d = d.select(
        "doc_id",
        "toks",
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, F.lit(_CHUNK_SIZE))
    return d.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_toks"),
        F.substring(F.md5(F.array_join(chunk, " ")), 1, 16).alias("fp"),
    )


def q_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — rare-bigram inverted index: per-doc-distinct bigrams with
    document frequency ≤ 5, each with its sorted postings list — the
    decontamination / memorization-probe building block (rare n-grams are
    the ones worth tracking exactly). At scale this is the
    build-the-postings-table job: explode, hash-aggregate by term, the
    df≤5 cut bounds the postings arrays that survive."""
    d = table(spark, sf, "documents").select(
        "doc_id", text.tokens("text").alias("toks")
    )
    heads = F.expr("slice(toks, 1, greatest(size(toks)-1, 0))")
    tails = F.expr("slice(toks, 2, greatest(size(toks)-1, 0))")
    bigrams = F.array_distinct(
        F.zip_with(heads, tails, lambda a, b: F.concat(a, F.lit(" "), b))
    )
    e = d.select("doc_id", F.explode(bigrams).alias("bigram"))
    return (
        e.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_set("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") <= 5)
        .orderBy("bigram")
    )


def q_soundex_blocking(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — phonetic blocking for record linkage: city spellings
    grouped by their Soundex code (functions/text.py::soundex_code, the
    engine-portable simplified variant), reporting per block the row
    count, distinct-spelling count, and the sorted spelling set —
    'kolkata'/'Kolkata' and 'saltlake'/'Salt Lake' collapse into one
    block each, the cheap candidate-generation tier that precedes the
    Levenshtein verify (q_fuzzy_street_match) exactly like LSH bands
    precede exact Jaccard. One code-keyed aggregate; the code is pure
    per-row string arithmetic, so blocking scales as a map + one
    shuffle on the block key."""
    cust = table(spark, sf, "customer")
    d = cust.select(
        _pick(F.col("c_custkey"), DIRTY_CITIES).alias("city")
    )
    return (
        d.withColumn("sdx", text.soundex_code(F.col("city")))
        .groupBy("sdx")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("city").alias("n_spellings"),
            F.array_join(
                F.array_sort(F.collect_set("city")), "|"
            ).alias("spellings"),
        )
        .orderBy("sdx")
    )


def q_log_odds_terms(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — distinctive terms per language via log-odds with an
    informed Dirichlet prior (Monroe et al.'s "Fightin' Words", the
    corpus-comparison statistic that fixes both raw-count hub bias and
    TF-IDF's rare-term bias): per (lang, token),
    δ = ln((y+α)/(n_l+A−y−α)) − ln((y'+α)/(N−n_l+A−y'−α)) with the
    rest-of-corpus counts y' = g−y, prior α = g/100 ∝ corpus frequency,
    z = δ/√(1/(y+α) + 1/(y'+α)); top-3 per language by z. Every input
    to the doubles is an EXACT integer count scaled by literal 0.01, so
    both engines hit ln/sqrt with identical doubles. Two token-keyed
    aggregates + a broadcast of the per-lang totals; the top-k window
    partitions by the bounded lang dimension."""
    from pyspark.sql import Window

    d = table(spark, sf, "documents").select(
        "lang", F.explode(text.tokens("text")).alias("token")
    )
    ylw = d.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("y")
    )
    gw = ylw.groupBy("token").agg(F.sum("y").cast("long").alias("g"))
    nl = ylw.groupBy("lang").agg(F.sum("y").cast("long").alias("n_l"))
    nn = nl.agg(F.sum("n_l").cast("long").alias("nn"))
    j = (
        ylw.join(gw, "token")
        .join(F.broadcast(nl), "lang")
        .crossJoin(F.broadcast(nn))
    )
    a = F.col("g").cast("double") * F.lit(0.01)
    aa = F.col("nn").cast("double") * F.lit(0.01)
    y = F.col("y").cast("double")
    yr = (F.col("g") - F.col("y")).cast("double")
    n_l = F.col("n_l").cast("double")
    nrest = (F.col("nn") - F.col("n_l")).cast("double")
    delta = F.log((y + a) / (n_l + aa - y - a)) - F.log(
        (yr + a) / (nrest + aa - yr - a)
    )
    z = delta / F.sqrt(
        F.lit(1.0) / (y + a) + F.lit(1.0) / (yr + a)
    )
    scored = j.select(
        "lang", "token", "y", "g", text.round4(z).alias("z")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("z"), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("lang", "token", "y", "g", "z")
        .orderBy("lang", F.desc("z"), "token")
    )


def q_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — deterministic document fingerprint (md5 of normalized text)."""
    df = table(spark, sf, "documents")
    return df.select("doc_id", text.fingerprint("text").alias("fp"))


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — stopword-hit language ID heuristic (relational scale form:
    tokens exploded once, codegen conditional counts)."""
    df = table(spark, sf, "documents")
    preds = text.lang_id_table(df).withColumnRenamed("id", "doc_id")
    return df.select("doc_id", "lang").join(preds, "doc_id")


def q_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — heuristic document quality scoring."""
    df = table(spark, sf, "documents")
    return df.select(
        "doc_id",
        text.token_count("text").cast("long").alias("n_tokens"),
        text.round4(text.punct_ratio("text")).alias("punct_r"),
        text.round4(text.stopword_ratio("text")).alias("stop_r"),
        text.quality_score("text").alias("quality"),
    )


def q_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-Q — corpus-unigram-LM score per doc (the perplexity-filter
    stand-in): avg log10 P(token) with P from the corpus's own unigram
    counts. Vocabulary-sized broadcast lookup + one doc-keyed avg."""
    return curation.unigram_logprob(table(spark, sf, "documents"))


def q_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — tokenizer-vocabulary coverage curve: what fraction of
    all token OCCURRENCES the top-k vocabulary covers, at k ∈ {5, 10,
    20, 50} — the truncation diagnostic you read before fixing a vocab
    size (the OOV rate is 1 − coverage). Exact bigint cumulative sums
    over the rank-ordered vocab (the window runs on the top-50 rows
    only); the corpus total rides a broadcast scalar."""
    from pyspark.sql import Window

    ks = [5, 10, 20, 50]
    docs = table(spark, sf, "documents")
    tf = (
        docs.select(F.explode(text.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    total = tf.agg(F.sum("tf").alias("total_tokens"))
    top = tf.orderBy(F.desc("tf"), "tok").limit(max(ks))
    w = Window.orderBy(F.desc("tf"), "tok")
    ranked = top.select(
        "tf",
        F.row_number().over(w).alias("k"),
    ).withColumn(
        "cum_tokens",
        F.sum("tf").over(
            Window.orderBy("k").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return (
        ranked.filter(F.col("k").isin(ks))
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            "cum_tokens",
            "total_tokens",
            text.round4(
                F.col("cum_tokens") / F.col("total_tokens")
            ).alias("coverage"),
        )
        .orderBy("k")
    )


def q_retrieval_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — retrieval EVALUATION over the BM25 ranking: precision@10
    and recall@10 of the fixed-query top-10 against a deterministic
    relevance set (documents containing ALL query terms — the
    conjunctive-match labeling an offline eval harness would plant).
    Everything is exact counts: |top10 ∩ rel| via one broadcast
    semi-join, the corpus relevant count as a broadcast scalar; the two
    ratios are single divisions. This is the eval loop you close after
    changing any ranking component — metric drift is the regression
    signal."""
    import functools

    docs = table(spark, sf, "documents")
    top = similarity.bm25_search(docs, SEARCH_TERMS, k=10).select("id")
    toks = text.tokens("text")
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.array_contains(toks, t) for t in SEARCH_TERMS],
    )
    rel = docs.filter(cond).select(F.col("doc_id").alias("id"))
    n_rel = rel.agg(F.count(F.lit(1)).alias("n_rel"))
    hits = top.join(rel, "id", "left_semi").agg(
        F.count(F.lit(1)).alias("hits")
    )
    return hits.crossJoin(F.broadcast(n_rel)).select(
        "n_rel",
        "hits",
        text.round4(F.col("hits") / F.lit(10.0)).alias("precision_at_10"),
        text.round4(F.col("hits") / F.col("n_rel")).alias("recall_at_10"),
    )


def q_phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — POSITIONAL phrase search, the index shape BM25's
    bag-of-words cannot express: find documents containing the exact
    bigram phrase 'spark query' by posexploding tokens into a
    positional index and closing adjacency with a (doc, pos+1)
    equality self-join — exactly how a search engine's positional
    postings verify phrases, and at 100 TB still two key-equality
    shuffles (term-filtered BEFORE the join, so the index slice is
    only the phrase's terms). Returns per-doc occurrence counts plus
    the first match position, deterministic tiebreaks."""
    docs = table(spark, sf, "documents")
    toked = docs.select(
        F.col("doc_id").alias("id"),
        F.posexplode(text.tokens("text")).alias("pos", "tok"),
    )
    t1 = toked.filter(F.col("tok") == "spark").select(
        "id", F.col("pos").alias("p1")
    )
    t2 = toked.filter(F.col("tok") == "query").select(
        "id", F.col("pos").alias("p2")
    )
    hits = t1.join(
        t2,
        (t1.id == t2.id) & (t2.p2 == t1.p1 + 1),
    ).select(t1.id.alias("id"), "p1")
    return (
        hits.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("p1").cast("int").alias("first_pos"),
        )
        .orderBy(F.desc("n_occurrences"), "id")
        .limit(20)
    )


def q_spell_suggest(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — SymSpell-style spell suggestion via the DELETION
    NEIGHBORHOOD: every vocabulary term generates its ≤|t| single-
    deletion variants, and two terms are edit-distance-≤2 candidates
    when a deletion of one equals a deletion of the other (or the term
    itself) — candidate generation is a key-equality JOIN on variant
    strings, never an all-pairs Levenshtein (the trick that makes
    spell-check feasible on a 100 TB corpus vocabulary: O(Σ|t|)
    variants, bucket join). Candidates verify with one exact
    levenshtein() call; suggestions rank by corpus frequency. The
    synthetic vocabulary has no natural typos, so the harness PLANTS
    them (the DIRTY_CITIES device): each of the 10 most frequent
    length-≥5 terms loses one md5-chosen character, and the output
    shows the suggester recovering the original (recovered flag).
    Deterministic tiebreaks everywhere."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    docs = table(spark, sf, "documents")
    tf = (
        docs.select(F.explode(text.tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .filter(F.length("t") >= 3)
    )

    def dels(col):
        return F.array_union(
            F.array(col),
            F.transform(
                F.sequence(F.lit(1), F.length(col)),
                lambda i: F.concat(
                    col.substr(F.lit(1), i - F.lit(1)),
                    col.substr(i + F.lit(1), F.length(col)),
                ),
            ),
        )

    v = tf.select(
        "t", "tf", F.explode(dels(F.col("t"))).alias("var")
    ).distinct()
    top = (
        tf.filter(F.length("t") >= 5)
        .orderBy(F.desc("tf"), "t")
        .limit(10)
        .select(F.col("t").alias("orig"))
    )
    p = F.pmod(portable_token_hash(F.col("orig")), F.length("orig")) + 1
    typos = top.select(
        "orig",
        F.concat(
            F.col("orig").substr(F.lit(1), p - F.lit(1)),
            F.col("orig").substr(p + F.lit(1), F.length("orig")),
        ).alias("typo"),
    )
    tv = typos.select(
        "orig", "typo", F.explode(dels(F.col("typo"))).alias("var")
    ).distinct()
    cand = (
        tv.join(
            v.select(
                F.col("t").alias("sugg"),
                F.col("tf").alias("sugg_tf"),
                "var",
            ),
            "var",
        )
        .filter(F.col("sugg") != F.col("typo"))
        .select("orig", "typo", "sugg", "sugg_tf")
        .distinct()
        .filter(F.levenshtein("typo", "sugg") <= 2)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("typo").orderBy(
        F.desc("sugg_tf"), F.col("sugg")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "typo",
            "sugg",
            "sugg_tf",
            (F.col("sugg") == F.col("orig")).alias("recovered"),
        )
        .orderBy("typo")
    )


def q_ndcg(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — graded ranking quality of the BM25 top-10: MRR, DCG@10,
    ideal DCG, and nDCG@10 against the same conjunctive-match relevance
    labels as q_retrieval_metrics. Every discount term 1/log2(rank+1)
    is floored onto the 1e-9 grid BEFORE summation (the zipf-fit
    discipline: bigint sums are order-independent, so the 10-term DCG
    can never flake on cross-engine float addition order; ln(2) is a
    hardcoded double literal so both engines evaluate the identical
    expression). Ideal DCG sums the same grid terms over ranks
    1..min(10, n_rel) from a 10-row range. One ranking pass + two tiny
    aggregates; n_rel rides as a broadcast scalar."""
    import functools

    from pyspark.sql import Window

    LN2 = 0.6931471805599453
    docs = table(spark, sf, "documents")
    top = similarity.bm25_search(docs, SEARCH_TERMS, k=10)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("score"), F.col("id"))
        ),
    )
    toks = text.tokens("text")
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.array_contains(toks, t) for t in SEARCH_TERMS],
    )
    rel = docs.filter(cond).select(
        F.col("doc_id").alias("id"), F.lit(1).alias("isrel")
    )
    n_rel = rel.agg(F.count(F.lit(1)).alias("n_rel"))

    def d9(rank):
        return F.floor(
            F.lit(1.0e9)
            * F.lit(LN2)
            / F.log((rank + F.lit(1)).cast("double"))
            + F.lit(0.5)
        ).cast("long")

    got = (
        ranked.join(rel, "id", "left")
        .withColumn("isrel", F.coalesce("isrel", F.lit(0)))
        .agg(
            F.sum("isrel").cast("long").alias("hits"),
            F.min(
                F.when(F.col("isrel") == 1, F.col("rank"))
            ).alias("first_rel"),
            F.sum(
                F.when(F.col("isrel") == 1, d9(F.col("rank"))).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("dcg9"),
        )
    )
    ideal = (
        spark.range(1, 11)
        .select(F.col("id").alias("r"))
        .crossJoin(F.broadcast(n_rel))
        .filter(F.col("r") <= F.col("n_rel"))
        .agg(F.sum(d9(F.col("r"))).cast("long").alias("idcg9"))
    )
    return (
        got.crossJoin(F.broadcast(ideal))
        .crossJoin(F.broadcast(n_rel))
        .select(
            "n_rel",
            "hits",
            text.round4(
                F.when(
                    F.col("first_rel").isNotNull(),
                    F.lit(1.0) / F.col("first_rel").cast("double"),
                ).otherwise(F.lit(0.0))
            ).alias("mrr"),
            text.round4(
                F.col("dcg9").cast("double") / F.lit(1.0e9)
            ).alias("dcg_at_10"),
            text.round4(
                F.col("idcg9").cast("double") / F.lit(1.0e9)
            ).alias("idcg_at_10"),
            text.round4(
                F.col("dcg9").cast("double")
                / F.col("idcg9").cast("double")
            ).alias("ndcg_at_10"),
        )
    )


def q_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-Q — Zipf's-law fit of the corpus frequency spectrum: OLS of
    ln(tf) on ln(rank) over the top-200 vocabulary (a natural corpus
    should fit slope ≈ −1; synthetic/templated corpora like this one
    show a flat slope — exactly what the diagnostic detects). The
    top-200 selection is a distributed TakeOrdered, the window runs on
    those 200 rows only. Float-sum order never arises: each log is
    floored to an exact 1e-9 grid integer, the sufficient statistics
    are DECIMAL(38,0)/HUGEINT-exact sums of those integers, and the
    grid scale cancels in the slope ratio — the only float steps are
    the per-row log and the final division, identical cross-engine."""
    from pyspark.sql import Window

    docs = table(spark, sf, "documents")
    tf = (
        docs.select(F.explode(text.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    top = tf.orderBy(F.desc("tf"), "tok").limit(200)
    w = Window.orderBy(F.desc("tf"), "tok")
    ranked = top.withColumn("rank", F.row_number().over(w))
    g = F.lit(1_000_000_000.0)
    scaled = ranked.select(
        F.floor(F.log(F.col("rank").cast("double")) * g + F.lit(0.5))
        .cast("decimal(19,0)")
        .alias("x9"),
        F.floor(F.log(F.col("tf").cast("double")) * g + F.lit(0.5))
        .cast("decimal(19,0)")
        .alias("y9"),
    )
    s = scaled.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("x9").alias("sx"),
        F.sum("y9").alias("sy"),
        F.sum(F.col("x9") * F.col("y9")).alias("sxy"),
        F.sum(F.col("x9") * F.col("x9")).alias("sxx"),
    )
    num_s = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    num_i = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        text.round4(num_s.cast("double") / den.cast("double")).alias(
            "zipf_slope"
        ),
        # intercept carries one leftover 1e-9 grid scale (num_i has one
        # more x9/y9 factor than den) — divide it back out
        text.round4(
            num_i.cast("double") / den.cast("double") / F.lit(1e9)
        ).alias("zipf_intercept"),
    )


def q_feature_hashing(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-Q — hashing-trick featurization (Weinberger et al., ICML
    2009): bag-of-words folded into 32 signed buckets, bucket = the
    portable md5 token hash mod 32, sign = one higher hash bit (the
    unbiased ±1 variant). Output is the SPARSE long form (doc_id,
    bucket, weight ≠ 0) — the fixed-width featurizer that needs no
    vocabulary build, no model artifact, and no driver state: exactly
    one explode + one (doc, bucket)-keyed count aggregate at any corpus
    size. Weights are count differences (2·n_plus − n_total), never
    sum(CASE) — exact BIGINTs cross-engine."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    docs = table(spark, sf, "documents")
    tok = docs.select(
        "doc_id", F.explode(text.tokens("text")).alias("tok")
    )
    h = portable_token_hash(F.col("tok"))
    tagged = tok.select(
        "doc_id",
        F.pmod(h, F.lit(32)).alias("bucket"),
        (F.pmod(F.shiftright(h, 5), F.lit(2)) == 0).alias("pos"),
    )
    return (
        tagged.groupBy("doc_id", "bucket")
        .agg(
            (
                F.lit(2) * F.count(F.when(F.col("pos"), F.lit(1)))
                - F.count(F.lit(1))
            ).alias("weight")
        )
        .filter(F.col("weight") != 0)
    )


def q_bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-Q — interpolated bigram-LM score per doc (the CCNet-style
    perplexity-filter signal): avg log10(0.5·P(w|v) + 0.5·P(w)) over
    bigram positions, probabilities from exact corpus counts. Docs with
    < 2 tokens get NULL score, n_bigrams = 0."""
    return curation.bigram_logprob(table(spark, sf, "documents"))


def q_hybrid_search_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — hybrid retrieval: BM25 keyword top-20 fused with embedding
    cosine top-20 by reciprocal-rank fusion, RRF(d) = Σ 1/(60 + rank_d)
    over the rankers that returned d (the id spaces align: vec_id is the
    embedding of doc_id). Rank-based fusion needs no score calibration
    between lexical and vector spaces — the production default for
    first-stage hybrid search. Both rank windows cover only the 20-row
    candidate frames (bounded, not corpus-scale); candidate generation
    is the existing BM25 probe and brute-force/ANN cosine path."""
    from pyspark.sql import Window

    docs = table(spark, sf, "documents")
    emb = table(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    bm = similarity.bm25_search(docs, SEARCH_TERMS, k=20)
    cos = similarity.cosine_topk(emb, list(qvec), k=20)
    r_bm = bm.select(
        F.col("id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.col("id")))
        .alias("r_bm"),
    )
    r_cos = cos.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("sim"), F.col("vec_id")))
        .alias("r_cos"),
    )
    rrf = F.coalesce(1.0 / (60 + F.col("r_bm")), F.lit(0.0)) + F.coalesce(
        1.0 / (60 + F.col("r_cos")), F.lit(0.0)
    )
    return (
        r_bm.join(r_cos, "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_bm",
            "r_cos",
            text.round4(rrf).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(10)
    )


def q_vocab_df(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — corpus vocabulary with document frequency: the tokenizer-
    vocab / stop-list build step of a training pipeline. Two-level
    aggregate (per-(token, doc) counts first, map-side combined) so
    term frequency and document frequency come out of ONE pass with no
    multi-distinct Expand; top-50 terms by df with deterministic
    tiebreak."""
    d = table(spark, sf, "documents").select(
        "doc_id", F.explode(text.tokens("text")).alias("tok")
    )
    per_doc = d.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_doc.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("cnt").alias("tf"),
        )
        .orderBy(F.desc("df"), F.desc("tf"), "tok")
        .limit(50)
    )


def q_token_dist_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — per-language document-length distribution (p25/p50/p75/p95
    of n_chars + count): the corpus-balance audit a data-mix decision
    reads. One grouped aggregate; percentiles interpolate identically in
    both engines and are 4-dp-floored."""
    docs = table(spark, sf, "documents")
    pct = lambda q: text.round4(  # noqa: E731
        F.percentile(F.col("n_chars"), F.lit(q))
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        pct(0.25).alias("p25"),
        pct(0.50).alias("p50"),
        pct(0.75).alias("p75"),
        pct(0.95).alias("p95"),
    )


def q_bpe_merge_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the first step of tokenizer (BPE) training at corpus scale:
    count ADJACENT token pairs and rank the top-20 merge candidates.
    Pairs are built array-side with zip_with over two shifted slices —
    the pair construction never shuffles; only the (pair → count)
    aggregate does, with map-side partials. Deterministic tiebreak on
    the pair string. At 100 TB this is the per-iteration inner loop of
    distributed BPE training (re-run after each merge)."""
    docs = table(spark, sf, "documents")
    toks = text.tokens("text")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(20)
    )


def q_collocations_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — collocation mining by pointwise mutual information:
    PMI(a,b) = ln(p(ab) / (p(a)·p(b))) over adjacent token pairs,
    support ≥ 5, top-20. Pairs come from the same array-side zip_with
    as q_bpe_merge_candidates; unigram totals are a 1-row broadcast.
    ln() agrees across engines at the 4dp floor (already exercised by
    the unigram-LM query)."""
    docs = table(spark, sf, "documents")
    toks = text.tokens("text")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pair_col = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    pairs = (
        docs.select(F.explode(pair_col).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = docs.agg(
        F.sum(F.size(toks)).alias("n_tok"),
        F.sum(F.greatest(F.size(toks) - 1, F.lit(0))).alias("n_pair"),
    )
    sp = F.split("pair", " ")
    p = pairs.select("pair", "n_ab", sp[0].alias("a"), sp[1].alias("b"))
    pmi = F.log(
        (F.col("n_ab") / F.col("n_pair"))
        / ((F.col("na") / F.col("n_tok")) * (F.col("nb") / F.col("n_tok")))
    )
    return (
        p.join(F.broadcast(uni.select(F.col("tok").alias("a"),
                                      F.col("n").alias("na"))), "a")
        .join(F.broadcast(uni.select(F.col("tok").alias("b"),
                                     F.col("n").alias("nb"))), "b")
        .crossJoin(F.broadcast(totals))
        .select("pair", "n_ab", text.round4(pmi).alias("pmi"))
        .orderBy(F.desc("pmi"), F.desc("n_ab"), "pair")
        .limit(20)
    )


def q_readability(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — readability scoring per language: Flesch reading ease
    (sentence count clamped to ≥1 — the synthetic corpus has no
    sentence punctuation, documented degenerate) plus the two
    punctuation-free metrics that carry the signal here: syllables per
    word (vowel-group proxy) and the polysyllabic-word share (≥3 vowel
    groups, the SMOG ingredient). All counts are integers aggregated
    with map-side combine; ratios divide exact integer sums, so only
    the per-doc Flesch average is float-order sensitive (rounded). One
    scan, one small aggregate; the per-word syllable count is an
    array-side transform, no explode."""
    d = table(spark, sf, "documents")
    words = F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0)
    per_doc = d.select(
        "lang",
        F.size(words).alias("w"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[aeiouy]+"), 0)
        ).alias("syl"),
        F.greatest(
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)
            ),
            F.lit(1),
        ).alias("s"),
        F.size(
            F.filter(
                words,
                lambda _w: F.size(
                    F.regexp_extract_all(_w, F.lit("[aeiouy]+"), 0)
                )
                >= 3,
            )
        ).alias("poly"),
    ).filter(F.col("w") > 0)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("w").cast("double") / F.col("s"))
        - F.lit(84.6) * (F.col("syl").cast("double") / F.col("w"))
    )
    return (
        per_doc.select("lang", "w", "syl", "poly", flesch.alias("f"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            text.round4(
                F.sum("syl").cast("double") / F.sum("w")
            ).alias("syll_per_word"),
            text.round4(
                F.sum("poly").cast("double") / F.sum("w")
            ).alias("pct_polysyllabic"),
            text.round4(F.avg("f")).alias("avg_flesch"),
        )
        .orderBy("lang")
    )


def q_lang_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — model-eval confusion matrix for the language-ID
    heuristic against the corpus's labeled lang column: counts and
    corpus share per (true, predicted) cell — the quality gate you run
    before trusting a classifier to route a 100 TB corpus. One join on
    doc id (both sides partial-aggregate first at scale), a
    |langs|²-bounded aggregate, a broadcast total; shares divide exact
    integer counts."""
    df = table(spark, sf, "documents")
    preds = text.lang_id_table(df).withColumnRenamed("id", "doc_id")
    j = df.select("doc_id", "lang").join(preds, "doc_id")
    total = j.agg(F.count(F.lit(1)).alias("n"))
    return (
        j.groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "pred",
            "cnt",
            text.round4(F.col("cnt") / F.col("n")).alias("share"),
        )
        .orderBy("lang", "pred")
    )


def q_tfidf_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — TF-IDF keyword extraction per language: top-5 terms by
    tf·ln(N/df), the per-slice characteristic-vocabulary step between
    raw vocab build (q_vocab_df) and full BM25 retrieval. ONE explode
    pass feeds both the per-language tf and the corpus df (two-level
    aggregates, no multi-distinct Expand); N rides a broadcast scalar,
    and the ranking window runs over the aggregated |vocab|×|langs|
    frame — never over token rows. Ordering is on the ROUNDED score
    with a term tiebreak, so top-5 membership is cross-engine
    deterministic."""
    from pyspark.sql import Window

    toked = table(spark, sf, "documents").select(
        "doc_id", "lang", F.explode(text.tokens("text")).alias("tok")
    )
    tf = toked.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        toked.select("tok", "doc_id")
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = table(spark, sf, "documents").agg(
        F.count(F.lit(1)).alias("n")
    )
    scored = (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "tok",
            "tf",
            "df",
            text.round4(
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
        .orderBy("lang", F.desc("tfidf"), "tok")
    )


# record-linkage fixture: synthetic person names derived from customer
# keys (the testdata's "Customer#000000421" strings share one global
# prefix, so real blocking keys need real name spread), plus a planted
# one-character-deletion typo in the surname for every 7th entity
_ER_GIVEN = [
    "amara", "bishal", "chitra", "debjit", "esha", "farhan", "gita",
    "hari", "indira", "joydeep", "kavya", "lakshmi", "manish", "nandini",
    "omprakash", "priya", "qadir", "rahul", "sunita", "tapan", "uma",
    "vikram", "wasim", "xavier", "yamini", "zubin", "arjun", "bela",
    "chandan", "devika", "eshan", "falguni", "gopal", "hema", "ishaan",
    "jaya", "kunal", "leela", "mohan", "nisha",
]
_ER_SURNAME = [
    "banerjee", "chatterjee", "mukherjee", "bhattacharya", "ghosh",
    "bose", "dutta", "sengupta", "chakraborty", "majumdar", "sarkar",
    "mitra", "dasgupta", "roychoudhury", "ganguly", "bhowmik", "pal",
    "saha", "mondal", "biswas", "karmakar", "debnath", "nandy", "sinha",
    "lahiri", "chowdhury", "tagore", "mallick", "basak", "adhikari",
    "bhadra", "kundu", "samanta", "halder", "naskar", "poddar",
    "raychaudhuri", "sanyal", "talukdar", "goswami",
]


def q_record_linkage(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — record linkage / entity resolution with multi-pass
    blocking: person-like records derived from customers (given name ×
    surname from two 40-word pools → real duplicate entities by
    construction) plus a planted one-character surname deletion for
    every 7th entity. Candidates come from TWO blocking passes —
    exact-given-name (robust to surname typos) unioned with
    exact-surname (robust to given-name typos) — and only candidates
    are verified with Levenshtein ≤ 1 on the full name. Block sizes are
    n/|pool| per key (never an all-pairs product; at 100 TB you salt or
    cap whale blocks exactly like the similarity joins), and the verify
    cost is |candidates|, not n². Matched pairs ordered by id. NB the
    OUTPUT is pair-quadratic in per-entity multiplicity: the fixed
    40×40 name space saturates as customers grow (87k true-dup pairs at
    sf0.1), which is the demo fixture's property, not the algorithm's —
    a real corpus's entity space grows with the data, and the cluster
    representative form (dedup.dup_clusters over these pairs) is the
    bounded-output variant."""
    c = table(spark, sf, "customer")
    base = c.select(
        F.col("c_custkey").alias("ck"),
        (F.col("c_custkey") * 2).alias("rec_id"),
        _pick(F.col("c_custkey"), _ER_GIVEN).alias("gname"),
        _pick(F.expr("c_custkey div 40"), _ER_SURNAME).alias("sname"),
    )
    typo = (
        base.filter(F.col("ck") % 7 == 0)
        .withColumn(
            "p",
            (F.lit(2) + F.col("ck") % (F.length("sname") - 1)).cast("int"),
        )
        .select(
            (F.col("ck") * 2 + 1).alias("rec_id"),
            "gname",
            F.expr(
                "concat(substring(sname, 1, p - 1),"
                " substring(sname, p + 1, 100))"
            ).alias("sname"),
        )
    )
    rec = (
        base.select("rec_id", "gname", "sname")
        .unionByName(typo)
        .withColumn(
            "fname", F.concat_ws(" ", F.col("gname"), F.col("sname"))
        )
    )

    def _pass(key: str) -> DataFrame:
        a = rec.select(
            key, F.col("rec_id").alias("rec_a"), F.col("fname").alias("fa")
        )
        b = rec.select(
            key, F.col("rec_id").alias("rec_b"), F.col("fname").alias("fb")
        )
        return (
            a.join(b, key)
            .filter(F.col("rec_a") < F.col("rec_b"))
            .select("rec_a", "rec_b", "fa", "fb")
        )

    cand = _pass("gname").unionByName(_pass("sname")).distinct()
    return (
        cand.withColumn("dist", F.levenshtein("fa", "fb"))
        .filter(F.col("dist") <= 1)
        .select("rec_a", "rec_b", "dist")
        .orderBy("rec_a", "rec_b")
    )


def q_mutual_information(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — mutual information between the documents' language and
    source columns, with the marginal entropies: the feature-selection
    / redundancy-detection primitive of a training-data profiler (an
    MI near min(H) means one column is a function of the other — drop
    it; near 0 means independent strata — safe to stratify on both).
    MI = Σ p(x,y)·ln(n·c_xy / (c_x·c_y)) in nats. All counts are exact
    bigints from three map-combined aggregates (joint + two broadcast
    marginals + one broadcast grand total); the per-cell log terms are
    doubles summed over only |langs|×|sources| cells, so the 4-dp floor
    absorbs summation-order ulp. Scale shape: one shuffle for the joint
    histogram; everything downstream is cell-cardinality-sized."""
    d = table(spark, sf, "documents")
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    joint = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("cxy")
    )
    mlang = d.groupBy("lang").agg(F.count(F.lit(1)).alias("cx"))
    msrc = d.groupBy("source").agg(F.count(F.lit(1)).alias("cy"))
    j = (
        joint.join(F.broadcast(mlang), "lang")
        .join(F.broadcast(msrc), "source")
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("n").cast("double")
    term = (F.col("cxy").cast("double") / nd) * F.log(
        F.col("cxy").cast("double")
        * nd
        / (F.col("cx").cast("double") * F.col("cy").cast("double"))
    )
    hx = (F.col("cx").cast("double") / nd) * F.log(
        F.col("cx").cast("double") / nd
    )
    hy = (F.col("cy").cast("double") / nd) * F.log(
        F.col("cy").cast("double") / nd
    )
    mi = j.agg(F.min("n").alias("n_docs"), F.sum(term).alias("mi_raw"))
    ent_x = mlang.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).alias("n_langs"),
        (-F.sum(hx)).alias("h_lang_raw"),
    )
    ent_y = msrc.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).alias("n_sources"),
        (-F.sum(hy)).alias("h_source_raw"),
    )
    return (
        mi.crossJoin(F.broadcast(ent_x))
        .crossJoin(F.broadcast(ent_y))
        .select(
            "n_docs",
            "n_langs",
            "n_sources",
            text.round4(F.col("mi_raw")).alias("mi_nats"),
            text.round4(F.col("h_lang_raw")).alias("h_lang"),
            text.round4(F.col("h_source_raw")).alias("h_source"),
        )
    )


def q_auc(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — ROC AUC (+ Gini) of token count as a classifier score for
    lang='en': the classification-eval counterpart of the ranking metrics
    in q_retrieval_metrics. AUC is computed rank-wise on the score
    HISTOGRAM — the same integer doubled-midrank device as
    q_mann_whitney (AUC ≡ U/(P·N)): for a score bucket with `pos`
    positives, `neg` tied negatives and `nb` negatives strictly below,
    the doubled numerator Σ pos·(2·nb + neg) is an exact bigint (ties
    counted half, the trapezoidal ROC rule), and only the final
    division by 2·P·N touches doubles, expression-mirrored. One shuffle
    to the histogram; the cumulative window runs over the score SUPPORT
    (distinct token counts), not the corpus rows — bigint holds to
    ~3e9 docs/class, shard the histogram beyond."""
    from pyspark.sql import Window

    d = table(spark, sf, "documents")
    h = (
        d.select(
            text.token_count(F.col("text")).alias("s"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        )
        .groupBy("s")
        .agg(
            F.count(F.when(F.col("y") == 1, 1)).alias("pos"),
            F.count(F.when(F.col("y") == 0, 1)).alias("neg"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    h = h.withColumn(
        "nb", F.coalesce(F.sum("neg").over(w), F.lit(0)).cast("long")
    )
    agg = h.agg(
        F.sum("pos").cast("long").alias("p"),
        F.sum("neg").cast("long").alias("n"),
        F.sum(
            F.col("pos") * (F.lit(2) * F.col("nb") + F.col("neg"))
        ).cast("long").alias("num2"),
    )
    auc = F.col("num2").cast("double") / (
        F.lit(2.0) * F.col("p").cast("double") * F.col("n").cast("double")
    )
    return agg.select(
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
        F.col("num2").alias("auc_num_doubled"),
        text.round4(auc).alias("auc"),
        text.round4(F.lit(2.0) * auc - F.lit(1.0)).alias("gini"),
    )


def q_heaps_law(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-Q — Heaps'-law fit of type-token scaling: OLS of ln(types)
    on ln(tokens) across documents (V = K·N^β; natural prose fits
    β ≈ 0.4-0.6, templated/synthetic corpora skew high — the companion
    diagnostic to q_zipf_fit's frequency-spectrum slope, and the
    vocabulary-sizing estimate you run before building a tokenizer on
    a 100 TB corpus). One explode + one doc-keyed aggregate (count +
    count_distinct both combine partially map-side), then the same
    float-sum-free sufficient-statistics trick as q_zipf_fit: each log
    is floored to an exact 1e-9 grid integer, sums are decimal/HUGEINT
    exact, and the grid scale cancels in the slope — the only float
    steps are the per-row log and two final divisions, identical
    cross-engine."""
    docs = table(spark, sf, "documents")
    per = (
        docs.select("doc_id", F.explode(text.tokens("text")).alias("tok"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.count_distinct("tok").alias("n_types"),
        )
        .filter(F.col("n_tok") >= 2)
    )
    g = F.lit(1_000_000_000.0)
    scaled = per.select(
        F.floor(F.log(F.col("n_tok").cast("double")) * g + F.lit(0.5))
        .cast("decimal(19,0)")
        .alias("x9"),
        F.floor(F.log(F.col("n_types").cast("double")) * g + F.lit(0.5))
        .cast("decimal(19,0)")
        .alias("y9"),
    )
    s = scaled.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.sum("x9").alias("sx"),
        F.sum("y9").alias("sy"),
        F.sum(F.col("x9") * F.col("y9")).alias("sxy"),
        F.sum(F.col("x9") * F.col("x9")).alias("sxx"),
    )
    num_s = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    num_i = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        F.col("n").cast("long").alias("n_docs"),
        text.round4(num_s.cast("double") / den.cast("double")).alias(
            "heaps_beta"
        ),
        # intercept = ln K, with one leftover 1e-9 grid factor to
        # divide back out (same shape as q_zipf_fit's intercept)
        text.round4(
            num_i.cast("double") / den.cast("double") / F.lit(1e9)
        ).alias("heaps_ln_k"),
    )


_ER_GIVEN_SQL = _sql_pick("c_custkey", _ER_GIVEN)
_ER_SURNAME_SQL = _sql_pick("(c_custkey // 40)", _ER_SURNAME)


def q_tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-T — TOKENIZER FERTILITY by language: chars/token, bytes/token
    and tokens/doc per language bucket — the number that prices a
    tokenizer for a multilingual training mix (fertility spread across
    languages = context-window and cost skew). One scan, one hash
    aggregate over the ground-truth lang column; whitespace tokens via
    the shared _TOKENS discipline, chars = length(), bytes =
    octet_length() (both engines agree on both; the corpus makes them
    equal only when it IS ascii — the ratio pair is the point)."""
    df = table(spark, sf, "documents")
    agg = df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(text.token_count("text").cast("long")).alias("n_tokens"),
        F.sum(F.length("text").cast("long")).alias("n_chars"),
        F.sum(F.octet_length("text").cast("long")).alias("n_bytes"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_bytes",
        text.round4(F.col("n_chars") / F.col("n_tokens")).alias(
            "chars_per_token"
        ),
        text.round4(F.col("n_bytes") / F.col("n_tokens")).alias(
            "bytes_per_token"
        ),
        text.round4(F.col("n_tokens") / F.col("n_docs")).alias(
            "tokens_per_doc"
        ),
    ).orderBy("lang")


def q_udtf_chunker(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — RAG-style sliding-window CHUNKING via a Spark-4 Python
    UDTF (user-defined TABLE function) in a LATERAL join: per document,
    emit overlapping chunks of width 50 tokens at stride 30 — the new
    engine surface this query exists to exercise (arrow-evaluated,
    one-to-many, the shape a row-returning pandas_udf cannot express).
    The UDTF receives only the TOKEN COUNT (an int), never the text, so
    the Python-path payload per row is a few bytes; per-source report:
    chunked docs, chunk count, chunk-token sum (overlap included),
    input tokens, and the overlap blowup ratio a vector-store capacity
    plan needs.

    Oracle: the chunk loop has a closed form — every non-final chunk is
    exactly `width` tokens (the loop only continues while n - s >
    width), so k = 1 if n <= 50 else (n - 21) div 30 + 1 and the
    chunk-token sum is n + 20·(k - 1) — the SQL oracle checks the UDTF
    against that algebra, a genuinely independent derivation."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: long, start_tok: long, n_tok: long")
    class _Chunker:
        def eval(self, n, width: int, stride: int):
            if n is None or n <= 0:
                return
            i, s = 0, 0
            while s < n:
                yield i, s, min(width, n - s)
                if s + width >= n:
                    break
                s += stride
                i += 1

    spark.udtf.register("doc_chunker", _Chunker)
    docs = table(spark, sf, "documents")
    docs.select(
        "doc_id", "source", text.token_count("text").alias("n")
    ).createOrReplaceTempView("_chunk_docs")
    ch = spark.sql(
        """
        SELECT d.source, d.n, c.chunk_idx, c.n_tok
        FROM _chunk_docs d, LATERAL doc_chunker(d.n, 50, 30) c
        """
    )
    agg = ch.groupBy("source").agg(
        F.count(F.when(F.col("chunk_idx") == 0, F.lit(1)))
        .cast("long")
        .alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("n_tok").cast("long").alias("chunk_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("chunk_idx") == 0, F.col("n"))), F.lit(0)
        )
        .cast("long")
        .alias("input_tokens"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_chunks",
        "chunk_tokens",
        "input_tokens",
        F.when(
            F.col("input_tokens") > 0,
            text.round4(F.col("chunk_tokens") / F.col("input_tokens")),
        ).alias("overlap_ratio"),
    ).orderBy("source")


ORACLES: dict[str, str | None] = {
    "q_udtf_chunker": rf"""
        WITH d AS (
          SELECT source, CAST(len({_TOKENS_SQL}) AS BIGINT) AS n
          FROM documents
        ),
        k AS (
          SELECT source, n,
                 CASE WHEN n <= 0 THEN 0
                      WHEN n <= 50 THEN 1
                      ELSE (n - 21) // 30 + 1 END AS k
          FROM d
        )
        SELECT source,
               CAST(count(CASE WHEN k > 0 THEN 1 END) AS BIGINT) AS n_docs,
               CAST(sum(k) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN k > 0 THEN n + 20 * (k - 1)
                             ELSE 0 END) AS BIGINT) AS chunk_tokens,
               CAST(sum(CASE WHEN k > 0 THEN n ELSE 0 END) AS BIGINT)
                 AS input_tokens,
               CASE WHEN sum(CASE WHEN k > 0 THEN n ELSE 0 END) > 0 THEN
                 floor((CAST(sum(CASE WHEN k > 0 THEN n + 20 * (k - 1)
                                      ELSE 0 END) AS DOUBLE)
                        / sum(CASE WHEN k > 0 THEN n ELSE 0 END))
                       * 10000 + 0.5) / 10000
               END AS overlap_ratio
        FROM k GROUP BY source ORDER BY source
    """,
    "q_tokenizer_fertility": rf"""
        WITH d AS (
          SELECT lang,
                 CAST(len({_TOKENS_SQL}) AS BIGINT) AS toks,
                 CAST(length(text) AS BIGINT) AS chars,
                 CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS bytes
          FROM documents
        ),
        agg AS (
          SELECT lang,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(toks) AS BIGINT) AS n_tokens,
                 CAST(sum(chars) AS BIGINT) AS n_chars,
                 CAST(sum(bytes) AS BIGINT) AS n_bytes
          FROM d GROUP BY lang
        )
        SELECT lang, n_docs, n_tokens, n_chars, n_bytes,
               floor(CAST(n_chars AS DOUBLE) / n_tokens * 10000 + 0.5)
                 / 10000 AS chars_per_token,
               floor(CAST(n_bytes AS DOUBLE) / n_tokens * 10000 + 0.5)
                 / 10000 AS bytes_per_token,
               floor(CAST(n_tokens AS DOUBLE) / n_docs * 10000 + 0.5)
                 / 10000 AS tokens_per_doc
        FROM agg ORDER BY lang
    """,
    "q_heaps_law": f"""
        WITH tok AS (
          SELECT doc_id, unnest(toks) AS tok
          FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
        ),
        per AS (
          SELECT doc_id, count(*) AS n_tok,
                 count(DISTINCT tok) AS n_types
          FROM tok GROUP BY doc_id HAVING count(*) >= 2
        ),
        scaled AS (
          SELECT CAST(floor(ln(CAST(n_tok AS DOUBLE)) * 1000000000.0
                            + 0.5) AS HUGEINT) AS x9,
                 CAST(floor(ln(CAST(n_types AS DOUBLE)) * 1000000000.0
                            + 0.5) AS HUGEINT) AS y9
          FROM per
        ),
        s AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(x9) AS sx, sum(y9) AS sy,
                 sum(x9 * y9) AS sxy, sum(x9 * x9) AS sxx
          FROM scaled
        )
        SELECT CAST(n AS BIGINT) AS n_docs,
               floor(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS heaps_beta,
               floor(CAST(sy * sxx - sx * sxy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) / 1e9
                     * 10000 + 0.5) / 10000 AS heaps_ln_k
        FROM s
    """,
    "q_auc": f"""
        WITH h AS (
          SELECT len({_TOKENS_SQL}) AS s,
                 count(CASE WHEN lang = 'en' THEN 1 END) AS pos,
                 count(CASE WHEN lang <> 'en' THEN 1 END) AS neg
          FROM documents GROUP BY 1
        ),
        c AS (
          SELECT s, pos, neg,
                 coalesce(sum(neg) OVER (
                   ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS nb
          FROM h
        ),
        a AS (
          SELECT CAST(sum(pos) AS BIGINT) AS p,
                 CAST(sum(neg) AS BIGINT) AS n,
                 CAST(sum(pos * (2 * nb + neg)) AS BIGINT) AS num2
          FROM c
        )
        SELECT p AS n_pos, n AS n_neg, num2 AS auc_num_doubled,
               floor(CAST(num2 AS DOUBLE)
                     / (2.0 * CAST(p AS DOUBLE) * CAST(n AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS auc,
               floor((2.0 * (CAST(num2 AS DOUBLE)
                             / (2.0 * CAST(p AS DOUBLE)
                                * CAST(n AS DOUBLE))) - 1.0)
                     * 10000 + 0.5) / 10000 AS gini
        FROM a
    """,
    "q_mutual_information": """
        WITH t AS (SELECT count(*) AS n FROM documents),
        joint AS (
          SELECT lang, source, count(*) AS cxy
          FROM documents GROUP BY lang, source
        ),
        mlang AS (SELECT lang, count(*) AS cx FROM documents GROUP BY lang),
        msrc AS (
          SELECT source, count(*) AS cy FROM documents GROUP BY source
        ),
        mi AS (
          SELECT min(n) AS n_docs,
                 sum((CAST(cxy AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln(CAST(cxy AS DOUBLE) * CAST(n AS DOUBLE)
                          / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))))
                   AS mi_raw
          FROM joint JOIN mlang USING (lang) JOIN msrc USING (source), t
        ),
        ex AS (
          SELECT count(*) AS n_langs,
                 -sum((CAST(cx AS DOUBLE) / CAST(n AS DOUBLE))
                      * ln(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE)))
                   AS h_lang_raw
          FROM mlang, t
        ),
        ey AS (
          SELECT count(*) AS n_sources,
                 -sum((CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))
                      * ln(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE)))
                   AS h_source_raw
          FROM msrc, t
        )
        SELECT CAST(n_docs AS BIGINT) AS n_docs,
               n_langs, n_sources,
               floor(mi_raw * 10000 + 0.5) / 10000 AS mi_nats,
               floor(h_lang_raw * 10000 + 0.5) / 10000 AS h_lang,
               floor(h_source_raw * 10000 + 0.5) / 10000 AS h_source
        FROM mi, ex, ey
    """,
    "q_record_linkage": f"""
        WITH base AS (
          SELECT c_custkey AS ck, c_custkey * 2 AS rec_id,
                 {_ER_GIVEN_SQL} AS gname,
                 {_ER_SURNAME_SQL} AS sname
          FROM customer
        ),
        typo AS (
          SELECT ck * 2 + 1 AS rec_id, gname,
                 substr(sname, 1,
                        CAST(2 + ck % (length(sname) - 1) AS INT) - 1)
                 || substr(sname,
                           CAST(2 + ck % (length(sname) - 1) AS INT) + 1,
                           100) AS sname
          FROM base WHERE ck % 7 = 0
        ),
        rec AS (
          SELECT rec_id, gname, sname, gname || ' ' || sname AS fname
          FROM (
            SELECT rec_id, gname, sname FROM base
            UNION ALL SELECT rec_id, gname, sname FROM typo
          )
        ),
        pa AS (
          SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
                 a.fname AS fa, b.fname AS fb
          FROM rec a JOIN rec b
            ON a.gname = b.gname AND a.rec_id < b.rec_id
        ),
        pb AS (
          SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
                 a.fname AS fa, b.fname AS fb
          FROM rec a JOIN rec b
            ON a.sname = b.sname AND a.rec_id < b.rec_id
        ),
        cand AS (
          SELECT DISTINCT * FROM
          (SELECT * FROM pa UNION ALL SELECT * FROM pb)
        )
        SELECT rec_a, rec_b, levenshtein(fa, fb) AS dist
        FROM cand
        WHERE levenshtein(fa, fb) <= 1
        ORDER BY rec_a, rec_b
    """,
    "q_tfidf_keywords": f"""
        WITH toked AS (
          SELECT doc_id, lang, unnest({_TOKENS_SQL}) AS tok
          FROM documents
        ),
        tf AS (
          SELECT lang, tok, count(*) AS tf FROM toked GROUP BY lang, tok
        ),
        dfx AS (
          SELECT tok, count(DISTINCT doc_id) AS df FROM toked GROUP BY tok
        ),
        nn AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT lang, tok, tf, df,
                 floor(tf * ln(CAST((SELECT n FROM nn) AS DOUBLE) / df)
                       * 10000 + 0.5) / 10000 AS tfidf
          FROM tf JOIN dfx USING (tok)
        ),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY tfidf DESC, tok
          ) AS rn
          FROM scored
        )
        SELECT lang, tok, tf, df, tfidf FROM r WHERE rn <= 5
        ORDER BY lang, tfidf DESC, tok
    """,
    "q_lang_confusion": f"""
        WITH toked AS (
          SELECT doc_id, lang, {_TOKENS_SQL} AS toks FROM documents
        ),
        scored AS (
          SELECT doc_id, lang,
                 {', '.join(f"{_LANG_SCORE_SQL[la]} AS s_{la}" for la in _LANG_ORDER)}
          FROM toked
        ),
        maxed AS (SELECT *, {_LANG_MAX_SQL} AS m FROM scored),
        p AS (SELECT lang, {_LANG_PRED_SQL} AS pred FROM maxed),
        t AS (SELECT count(*) AS n FROM p)
        SELECT lang, pred, count(*) AS cnt,
               floor(count(*) / (SELECT n FROM t) * 10000 + 0.5) / 10000
                 AS share
        FROM p GROUP BY lang, pred ORDER BY lang, pred
    """,
    "q_readability": """
        WITH per_doc AS (
          SELECT lang,
                 len(regexp_extract_all(text, '[a-z]+')) AS w,
                 len(regexp_extract_all(text, '[aeiouy]+')) AS syl,
                 greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
                 len(list_filter(regexp_extract_all(text, '[a-z]+'),
                     _w -> len(regexp_extract_all(_w, '[aeiouy]+')) >= 3))
                   AS poly
          FROM documents
        ),
        scored AS (
          SELECT *,
                 206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                         - 84.6 * (CAST(syl AS DOUBLE) / w) AS f
          FROM per_doc WHERE w > 0
        )
        SELECT lang,
               count(*) AS n_docs,
               floor(CAST(sum(syl) AS DOUBLE) / sum(w) * 10000 + 0.5)
                 / 10000 AS syll_per_word,
               floor(CAST(sum(poly) AS DOUBLE) / sum(w) * 10000 + 0.5)
                 / 10000 AS pct_polysyllabic,
               floor(avg(f) * 10000 + 0.5) / 10000 AS avg_flesch
        FROM scored GROUP BY lang ORDER BY lang
    """,
    "q_collocations_pmi": f"""
        WITH d AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
        t AS (
          SELECT doc_id, unnest(toks) AS tok,
                 unnest(range(len(toks))) AS i
          FROM d
        ),
        pairs AS (
          SELECT a.tok || ' ' || b.tok AS pair, a.tok AS ta, b.tok AS tb,
                 count(*) AS n_ab
          FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1
          GROUP BY 1, 2, 3 HAVING count(*) >= 5
        ),
        uni AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
        tot AS (
          SELECT CAST(sum(len(toks)) AS BIGINT) AS n_tok,
                 CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS n_pair
          FROM d
        )
        SELECT pair, n_ab,
               floor(ln(
                 (CAST(n_ab AS DOUBLE) / n_pair)
                 / ((CAST(ua.n AS DOUBLE) / n_tok)
                    * (CAST(ub.n AS DOUBLE) / n_tok))
               ) * 10000 + 0.5) / 10000 AS pmi
        FROM pairs
        JOIN uni ua ON ua.tok = ta
        JOIN uni ub ON ub.tok = tb, tot
        ORDER BY pmi DESC, n_ab DESC, pair LIMIT 20
    """,
    # adjacent-pair counts: DuckDB zips unnest(toks) with its index,
    # self-joins on i+1 within the doc, then ranks
    "q_bpe_merge_candidates": f"""
        WITH d AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
        t AS (
          SELECT doc_id, unnest(toks) AS tok,
                 unnest(range(len(toks))) AS i
          FROM d
        )
        SELECT a.tok || ' ' || b.tok AS pair, count(*) AS cnt
        FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        GROUP BY pair
        ORDER BY cnt DESC, pair LIMIT 20
    """,
    "q_token_count": rf"""
        SELECT tok, count(*) AS cnt FROM (
          SELECT unnest({_TOKENS_SQL}) AS tok FROM documents
        ) GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20
    """,
    "q_bpe_token_count": rf"""
        SELECT tok, count(*) AS cnt FROM (
          SELECT unnest(regexp_extract_all(lower(text),
            {_sql_regex(text.BPE_ISH_RE)})) AS tok
          FROM documents
        ) GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20
    """,
    "q_text_search": f"""
        WITH toks AS (
          SELECT doc_id AS id, unnest({_TOKENS_SQL}) AS tok FROM documents
        ),
        hits AS (
          SELECT id, tok FROM toks
          WHERE tok IN ({', '.join(f"'{t}'" for t in SEARCH_TERMS)})
        ),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        dft AS (SELECT tok, count(DISTINCT id) AS df FROM hits GROUP BY tok),
        tf AS (SELECT id, tok, count(*) AS tf FROM hits GROUP BY id, tok),
        scored AS (
          SELECT id,
                 floor(sum(tf * ln(n_docs / df)) * 10000 + 0.5) / 10000 AS score
          FROM tf JOIN dft USING (tok), n
          GROUP BY id
        )
        SELECT id, score FROM scored ORDER BY score DESC, id LIMIT 10
    """,
    "q_bm25_search": f"""
        WITH toked AS (
          SELECT doc_id AS id, {_TOKENS_SQL} AS toks FROM documents
        ),
        dl AS (SELECT id, len(toks) AS dl FROM toked),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 avg(len(toks)) AS avgdl
          FROM toked
        ),
        hits AS (
          SELECT id, unnest(toks) AS tok FROM toked
        ),
        fhits AS (
          SELECT id, tok FROM hits
          WHERE tok IN ({', '.join(f"'{t}'" for t in SEARCH_TERMS)})
        ),
        dft AS (SELECT tok, count(DISTINCT id) AS df FROM fhits GROUP BY tok),
        tf AS (SELECT id, tok, count(*) AS tf FROM fhits GROUP BY id, tok),
        scored AS (
          SELECT id,
                 floor(sum(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                   * (tf * (1.2 + 1))
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                 ) * 10000 + 0.5) / 10000 AS score
          FROM tf JOIN dft USING (tok) JOIN dl USING (id), stats
          GROUP BY id
        )
        SELECT id, score FROM scored ORDER BY score DESC, id LIMIT 10
    """,
    "q_doc_chunking": f"""
        WITH toked AS (
          SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
        ),
        st AS (
          SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks), 1), 24)) AS start
          FROM toked
        )
        SELECT doc_id,
               CAST(start // 24 AS INT) AS chunk_idx,
               len(toks[start + 1 : start + 32]) AS n_toks,
               substr(md5(array_to_string(toks[start + 1 : start + 32], ' ')),
                      1, 16) AS fp
        FROM st
    """,
    "q_soundex_blocking": f"""
        WITH base AS (
          SELECT {_CITY_SQL} AS city FROM customer
        ),
        s1 AS (
          SELECT city,
                 upper(regexp_replace(city, '[^A-Za-z]', '', 'g')) AS u
          FROM base
        ),
        s2 AS (
          SELECT city, u,
                 regexp_replace(
                   translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                             '01230120022455012623010202'),
                   '(\\d)\\1+', '\\1', 'g') AS collapsed
          FROM s1
        ),
        s3 AS (
          SELECT city,
                 CASE WHEN length(u) > 0 THEN
                   substr(u, 1, 1)
                   || rpad(substr(translate(substr(collapsed, 2),
                                            '0', ''), 1, 3), 3, '0')
                 END AS sdx
          FROM s2
        )
        SELECT sdx, count(*) AS n_rows,
               CAST(count(DISTINCT city) AS BIGINT) AS n_spellings,
               array_to_string(list_sort(list(DISTINCT city)), '|')
                 AS spellings
        FROM s3 GROUP BY sdx ORDER BY sdx
    """,
    "q_log_odds_terms": f"""
        WITH toked AS (
          SELECT lang, unnest({_TOKENS_SQL}) AS token FROM documents
        ),
        ylw AS (
          SELECT lang, token, count(*) AS y
          FROM toked GROUP BY lang, token
        ),
        gw AS (
          SELECT token, CAST(sum(y) AS BIGINT) AS g
          FROM ylw GROUP BY token
        ),
        nl AS (
          SELECT lang, CAST(sum(y) AS BIGINT) AS n_l
          FROM ylw GROUP BY lang
        ),
        nt AS (SELECT CAST(sum(n_l) AS BIGINT) AS nn FROM nl),
        s AS (
          SELECT lang, token, y, g,
                 (ln((CAST(y AS DOUBLE) + CAST(g AS DOUBLE) * 0.01)
                     / (CAST(n_l AS DOUBLE) + CAST(nn AS DOUBLE) * 0.01
                        - CAST(y AS DOUBLE) - CAST(g AS DOUBLE) * 0.01))
                  - ln((CAST(g - y AS DOUBLE) + CAST(g AS DOUBLE) * 0.01)
                     / (CAST(nn - n_l AS DOUBLE)
                        + CAST(nn AS DOUBLE) * 0.01
                        - CAST(g - y AS DOUBLE)
                        - CAST(g AS DOUBLE) * 0.01)))
                 / sqrt(1.0 / (CAST(y AS DOUBLE)
                               + CAST(g AS DOUBLE) * 0.01)
                        + 1.0 / (CAST(g - y AS DOUBLE)
                                 + CAST(g AS DOUBLE) * 0.01)) AS zraw
          FROM ylw JOIN gw USING (token) JOIN nl USING (lang), nt
        ),
        r AS (
          SELECT lang, token, y, g,
                 floor(zraw * 10000 + 0.5) / 10000 AS z,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY floor(zraw * 10000 + 0.5) / 10000 DESC, token
                 ) AS rn
          FROM s
        )
        SELECT lang, token, y, g, z FROM r WHERE rn <= 3
        ORDER BY lang, z DESC, token
    """,
    "q_inverted_index": f"""
        WITH toked AS (
          SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
        ),
        bg AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i + 1])) AS bgs
          FROM toked
        ),
        e AS (SELECT doc_id, unnest(bgs) AS bigram FROM bg)
        SELECT bigram, count(*) AS df,
               array_to_string(list_sort(list(doc_id)), ',') AS postings
        FROM e GROUP BY bigram HAVING count(*) <= 5
        ORDER BY bigram
    """,
    "q_doc_fingerprint": f"""
        SELECT doc_id, substr(md5({_NORM_TEXT_SQL}), 1, 16) AS fp FROM documents
    """,
    "q_lang_id": f"""
        WITH toked AS (
          SELECT doc_id, lang, {_TOKENS_SQL} AS toks FROM documents
        ),
        scored AS (
          SELECT doc_id, lang,
                 {', '.join(f"{_LANG_SCORE_SQL[la]} AS s_{la}" for la in _LANG_ORDER)}
          FROM toked
        ),
        maxed AS (SELECT *, {_LANG_MAX_SQL} AS m FROM scored)
        SELECT doc_id, lang, {_LANG_PRED_SQL} AS pred FROM maxed
    """,
    "q_quality_score": rf"""
        WITH base AS (
          SELECT doc_id, text, {_TOKENS_SQL} AS toks,
                 CASE WHEN length(text) > 0 THEN
                   length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                     / length(text)
                 ELSE 0.0 END AS punct_ratio
          FROM documents
        ),
        stats AS (
          SELECT doc_id, len(toks) AS n_tokens, punct_ratio,
                 CASE WHEN len(toks) > 0 THEN
                   len(list_filter(toks, t -> t IN ({', '.join(f"'{w}'" for w in text.STOPWORDS_EN)})))
                     / len(toks)
                 ELSE 0.0 END AS stop_ratio
          FROM base
        )
        SELECT doc_id, n_tokens,
               floor(punct_ratio * 10000 + 0.5) / 10000 AS punct_r,
               floor(stop_ratio * 10000 + 0.5) / 10000 AS stop_r,
               floor((least(n_tokens / 50.0, 1.0) * 0.4
                     + (1.0 - least(punct_ratio * 5, 1.0)) * 0.3
                     + least(stop_ratio * 4, 1.0) * 0.3) * 10000 + 0.5) / 10000 AS quality
        FROM stats
    """,
    "q_unigram_logprob": f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(CASE WHEN toks IS NULL OR len(toks) = 0 THEN [NULL] ELSE toks END) AS tok
          FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
        ),
        vocab AS (
          SELECT tok, count(*) AS tf FROM tok WHERE tok IS NOT NULL GROUP BY tok
        ),
        total AS (SELECT CAST(sum(tf) AS DOUBLE) AS n FROM vocab),
        scored AS (
          SELECT doc_id,
                 CASE WHEN tok IS NOT NULL THEN log10(tf / n) END AS logp
          FROM tok LEFT JOIN vocab USING (tok) CROSS JOIN total
        )
        SELECT doc_id, CAST(count(logp) AS BIGINT) AS n_tokens,
               floor(avg(logp) * 10000 + 0.5) / 10000 AS avg_logp
        FROM scored GROUP BY doc_id
    """,
    "q_vocab_coverage": f"""
        WITH tok AS (
          SELECT unnest(toks) AS tok
          FROM (SELECT {_TOKENS_SQL} AS toks FROM documents)
        ),
        tf AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
        total AS (SELECT CAST(sum(tf) AS BIGINT) AS total_tokens FROM tf),
        top AS (SELECT tok, tf FROM tf ORDER BY tf DESC, tok LIMIT 50),
        ranked AS (
          SELECT tf,
                 CAST(row_number() OVER w AS INT) AS k,
                 CAST(sum(tf) OVER (
                   ORDER BY tf DESC, tok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum_tokens
          FROM top
          WINDOW w AS (ORDER BY tf DESC, tok)
        )
        SELECT k, cum_tokens, total_tokens,
               floor(cum_tokens / CAST(total_tokens AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS coverage
        FROM ranked, total
        WHERE k IN (5, 10, 20, 50)
        ORDER BY k
    """,
    "q_retrieval_metrics": f"""
        WITH toked AS (
          SELECT doc_id AS id, {_TOKENS_SQL} AS toks FROM documents
        ),
        dl AS (SELECT id, len(toks) AS dl FROM toked),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 avg(len(toks)) AS avgdl
          FROM toked
        ),
        fhits AS (
          SELECT id, tok FROM (SELECT id, unnest(toks) AS tok FROM toked)
          WHERE tok IN ({', '.join(f"'{t}'" for t in SEARCH_TERMS)})
        ),
        dft AS (SELECT tok, count(DISTINCT id) AS df FROM fhits GROUP BY tok),
        tf AS (SELECT id, tok, count(*) AS tf FROM fhits GROUP BY id, tok),
        scored AS (
          SELECT id,
                 floor(sum(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                   * (tf * (1.2 + 1))
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                 ) * 10000 + 0.5) / 10000 AS score
          FROM tf JOIN dft USING (tok) JOIN dl USING (id), stats
          GROUP BY id
        ),
        top AS (SELECT id FROM scored ORDER BY score DESC, id LIMIT 10),
        rel AS (
          SELECT id FROM toked
          WHERE {' AND '.join(f"list_contains(toks, '{t}')" for t in SEARCH_TERMS)}
        ),
        m AS (
          SELECT (SELECT count(*) FROM rel) AS n_rel,
                 (SELECT count(*) FROM top WHERE id IN (SELECT id FROM rel))
                   AS hits
        )
        SELECT n_rel, hits,
               floor(hits / 10.0 * 10000 + 0.5) / 10000 AS precision_at_10,
               floor(hits / CAST(n_rel AS DOUBLE) * 10000 + 0.5) / 10000
                 AS recall_at_10
        FROM m
    """,
    "q_phrase_search": f"""
        WITH toked AS (
          SELECT doc_id AS id, unnest(toks) AS tok,
                 generate_subscripts(toks, 1) - 1 AS pos
          FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
        ),
        t1 AS (SELECT id, pos AS p1 FROM toked WHERE tok = 'spark'),
        t2 AS (SELECT id, pos AS p2 FROM toked WHERE tok = 'query')
        SELECT t1.id AS id, count(*) AS n_occurrences,
               CAST(min(p1) AS INT) AS first_pos
        FROM t1 JOIN t2 ON t1.id = t2.id AND t2.p2 = t1.p1 + 1
        GROUP BY t1.id
        ORDER BY n_occurrences DESC, id LIMIT 20
    """,
    "q_spell_suggest": f"""
        WITH tf AS (
          SELECT t, CAST(count(*) AS BIGINT) AS tf FROM (
            SELECT unnest({_TOKENS_SQL}) AS t FROM documents
          ) GROUP BY t HAVING length(t) >= 3
        ),
        v AS (
          SELECT DISTINCT t, tf, var FROM (
            SELECT t, tf,
                   unnest(list_append(
                     list_transform(range(1, length(t) + 1),
                       i -> substr(t, 1, i - 1) || substr(t, i + 1)),
                     t)) AS var
            FROM tf
          )
        ),
        top AS (
          SELECT t AS orig FROM tf
          WHERE length(t) >= 5 ORDER BY tf DESC, t LIMIT 10
        ),
        typos AS (
          SELECT orig,
                 substr(orig, 1, p - 1) || substr(orig, p + 1) AS typo
          FROM (
            SELECT orig,
                   CAST(((('0x' || substr(md5(orig), 1, 15))::BIGINT
                          % length(orig)) + length(orig))
                        % length(orig) + 1 AS INT) AS p
            FROM top
          )
        ),
        tv AS (
          SELECT DISTINCT orig, typo, var FROM (
            SELECT orig, typo,
                   unnest(list_append(
                     list_transform(range(1, length(typo) + 1),
                       i -> substr(typo, 1, i - 1) || substr(typo, i + 1)),
                     typo)) AS var
            FROM typos
          )
        ),
        cand AS (
          SELECT DISTINCT orig, typo, s.t AS sugg, s.tf AS sugg_tf
          FROM tv JOIN v s ON s.var = tv.var AND s.t <> tv.typo
        ),
        ok AS (
          SELECT *, row_number() OVER (
                   PARTITION BY typo ORDER BY sugg_tf DESC, sugg
                 ) AS rn
          FROM cand WHERE levenshtein(typo, sugg) <= 2
        )
        SELECT typo, sugg, sugg_tf, sugg = orig AS recovered
        FROM ok WHERE rn = 1 ORDER BY typo
    """,
    "q_ndcg": f"""
        WITH toked AS (
          SELECT doc_id AS id, {{tokens}} AS toks FROM documents
        ),
        dl AS (SELECT id, len(toks) AS dl FROM toked),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 avg(len(toks)) AS avgdl
          FROM toked
        ),
        fhits AS (
          SELECT id, tok FROM (SELECT id, unnest(toks) AS tok FROM toked)
          WHERE tok IN ({{terms}})
        ),
        dft AS (SELECT tok, count(DISTINCT id) AS df FROM fhits GROUP BY tok),
        tf AS (SELECT id, tok, count(*) AS tf FROM fhits GROUP BY id, tok),
        scored AS (
          SELECT id,
                 floor(sum(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                   * (tf * (1.2 + 1))
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                 ) * 10000 + 0.5) / 10000 AS score
          FROM tf JOIN dft USING (tok) JOIN dl USING (id), stats
          GROUP BY id
        ),
        top AS (
          SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank
          FROM scored ORDER BY score DESC, id LIMIT 10
        ),
        rel AS (
          SELECT id FROM toked
          WHERE {{conj}}
        ),
        nr AS (SELECT CAST(count(*) AS BIGINT) AS n_rel FROM rel),
        got AS (
          SELECT
            CAST(count(CASE WHEN rel.id IS NOT NULL THEN 1 END)
                 AS BIGINT) AS hits,
            min(CASE WHEN rel.id IS NOT NULL THEN rank END) AS first_rel,
            CAST(coalesce(sum(CASE WHEN rel.id IS NOT NULL THEN
              CAST(floor(1.0e9 * 0.6931471805599453
                         / ln(CAST(rank + 1 AS DOUBLE)) + 0.5) AS BIGINT)
              ELSE 0 END), 0) AS BIGINT) AS dcg9
          FROM top LEFT JOIN rel ON top.id = rel.id
        ),
        ideal AS (
          SELECT CAST(sum(
            CAST(floor(1.0e9 * 0.6931471805599453
                       / ln(CAST(r + 1 AS DOUBLE)) + 0.5) AS BIGINT))
            AS BIGINT) AS idcg9
          FROM (SELECT unnest(range(1, 11)) AS r), nr
          WHERE r <= n_rel
        )
        SELECT n_rel, hits,
               floor(CASE WHEN first_rel IS NOT NULL
                          THEN 1.0 / CAST(first_rel AS DOUBLE)
                          ELSE 0.0 END * 10000 + 0.5) / 10000 AS mrr,
               floor(CAST(dcg9 AS DOUBLE) / 1.0e9 * 10000 + 0.5) / 10000
                 AS dcg_at_10,
               floor(CAST(idcg9 AS DOUBLE) / 1.0e9 * 10000 + 0.5) / 10000
                 AS idcg_at_10,
               floor(CAST(dcg9 AS DOUBLE) / CAST(idcg9 AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS ndcg_at_10
        FROM got, ideal, nr
    """.format(
        tokens=_TOKENS_SQL,
        terms=", ".join(f"'{t}'" for t in SEARCH_TERMS),
        conj=" AND ".join(
            f"list_contains(toks, '{t}')" for t in SEARCH_TERMS
        ),
    ),
    "q_zipf_fit": f"""
        WITH tok AS (
          SELECT unnest(toks) AS tok
          FROM (SELECT {_TOKENS_SQL} AS toks FROM documents)
        ),
        tf AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
        top AS (SELECT tok, tf FROM tf ORDER BY tf DESC, tok LIMIT 200),
        ranked AS (
          SELECT tf, row_number() OVER (ORDER BY tf DESC, tok) AS rank
          FROM top
        ),
        scaled AS (
          SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000000.0 + 0.5)
                      AS HUGEINT) AS x9,
                 CAST(floor(ln(CAST(tf AS DOUBLE)) * 1000000000.0 + 0.5)
                      AS HUGEINT) AS y9
          FROM ranked
        ),
        s AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(x9) AS sx, sum(y9) AS sy,
                 sum(x9 * y9) AS sxy, sum(x9 * x9) AS sxx
          FROM scaled
        )
        SELECT CAST(n AS BIGINT) AS n_terms,
               floor(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS zipf_slope,
               floor(CAST(sy * sxx - sx * sxy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) / 1e9
                     * 10000 + 0.5) / 10000 AS zipf_intercept
        FROM s
    """,
    "q_feature_hashing": f"""
        WITH tok AS (
          SELECT doc_id, unnest(toks) AS tok
          FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
        ),
        tagged AS (
          SELECT doc_id,
                 h % 32 AS bucket,
                 ((h >> 5) % 2) = 0 AS pos
          FROM (
            SELECT doc_id,
                   ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
            FROM tok
          )
        )
        SELECT doc_id, bucket,
               2 * count(CASE WHEN pos THEN 1 END) - count(*) AS weight
        FROM tagged GROUP BY doc_id, bucket
        HAVING 2 * count(CASE WHEN pos THEN 1 END) - count(*) <> 0
    """,
    "q_bigram_logprob": f"""
        WITH toked AS (
          SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
        ),
        vocab AS (
          SELECT w, count(*) AS tf
          FROM (SELECT unnest(toks) AS w FROM toked) GROUP BY 1
        ),
        total AS (SELECT CAST(sum(tf) AS DOUBLE) AS n FROM vocab),
        bg AS (
          SELECT doc_id, (b).v AS v, (b).w AS w
          FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks) < 2
                          THEN [struct_pack(v := CAST(NULL AS VARCHAR),
                                            w := CAST(NULL AS VARCHAR))]
                          ELSE list_transform(range(1, len(toks)),
                            i -> struct_pack(v := toks[i], w := toks[i+1]))
                          END) AS b
            FROM toked
          )
        ),
        bic AS (
          SELECT v, w, count(*) AS c_vw FROM bg
          WHERE v IS NOT NULL GROUP BY 1, 2
        ),
        leftc AS (SELECT v, sum(c_vw) AS c_v FROM bic GROUP BY 1),
        scored AS (
          SELECT doc_id,
                 CASE WHEN bg.v IS NOT NULL THEN
                   log10(0.5 * (c_vw / c_v) + 0.5 * (tf / n))
                 END AS logp
          FROM bg
          LEFT JOIN bic USING (v, w)
          LEFT JOIN leftc USING (v)
          LEFT JOIN vocab USING (w)
          CROSS JOIN total
        )
        SELECT doc_id, CAST(count(logp) AS BIGINT) AS n_bigrams,
               floor(avg(logp) * 10000 + 0.5) / 10000 AS avg_logp
        FROM scored GROUP BY doc_id
    """,
    "q_hybrid_search_rrf": f"""
        WITH toked AS (
          SELECT doc_id AS id, {{TOKENS}} AS toks FROM documents
        ),
        dl AS (SELECT id, len(toks) AS dl FROM toked),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(toks)) AS avgdl
          FROM toked
        ),
        fhits AS (
          SELECT id, unnest(toks) AS tok FROM toked
        ),
        fh AS (
          SELECT id, tok FROM fhits
          WHERE tok IN ({{TERMS}})
        ),
        dft AS (SELECT tok, count(DISTINCT id) AS df FROM fh GROUP BY tok),
        tf AS (SELECT id, tok, count(*) AS tf FROM fh GROUP BY id, tok),
        scored AS (
          SELECT id,
                 floor(sum(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                   * (tf * (1.2 + 1))
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                 ) * 10000 + 0.5) / 10000 AS score
          FROM tf JOIN dft USING (tok) JOIN dl USING (id), stats
          GROUP BY id
        ),
        bm AS (
          SELECT id AS doc_id,
                 row_number() OVER (ORDER BY score DESC, id) AS r_bm
          FROM scored ORDER BY score DESC, id LIMIT 20
        ),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        sims AS (
          SELECT vec_id,
                 floor(
                   list_sum(list_transform(range(1, len(embedding) + 1),
                     i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(qv,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                   * 10000 + 0.5) / 10000 AS sim
          FROM embeddings, q
        ),
        cosr AS (
          SELECT vec_id AS doc_id,
                 row_number() OVER (ORDER BY sim DESC, vec_id) AS r_cos
          FROM sims ORDER BY sim DESC, vec_id LIMIT 20
        )
        SELECT coalesce(bm.doc_id, cosr.doc_id) AS doc_id, r_bm, r_cos,
               floor((coalesce(1.0 / (60 + r_bm), 0.0)
                      + coalesce(1.0 / (60 + r_cos), 0.0))
                     * 10000 + 0.5) / 10000 AS rrf
        FROM bm FULL OUTER JOIN cosr ON bm.doc_id = cosr.doc_id
        ORDER BY rrf DESC, doc_id LIMIT 10
    """.replace("{TOKENS}", _TOKENS_SQL).replace(
        "{TERMS}", ", ".join(f"'{t}'" for t in SEARCH_TERMS)
    ),
    "q_vocab_df": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
        ),
        per_doc AS (
          SELECT tok, doc_id, count(*) AS cnt FROM toks GROUP BY tok, doc_id
        )
        SELECT tok, count(*) AS df, CAST(sum(cnt) AS BIGINT) AS tf
        FROM per_doc GROUP BY tok
        ORDER BY df DESC, tf DESC, tok LIMIT 50
    """,
    "q_token_dist_by_lang": """
        SELECT lang, count(*) AS n_docs,
               floor(quantile_cont(n_chars, 0.25) * 10000 + 0.5) / 10000 AS p25,
               floor(quantile_cont(n_chars, 0.50) * 10000 + 0.5) / 10000 AS p50,
               floor(quantile_cont(n_chars, 0.75) * 10000 + 0.5) / 10000 AS p75,
               floor(quantile_cont(n_chars, 0.95) * 10000 + 0.5) / 10000 AS p95
        FROM documents GROUP BY lang
    """,
}
