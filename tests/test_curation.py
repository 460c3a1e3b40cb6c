"""Unit tests for the corpus-curation operators (operators/curation.py)
with hand-computed planted expectations; cross-engine value equality is
separately enforced by the DuckDB oracles (test_queries_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_gopher_quality_hand_computed(spark):
    df = _docs(spark, [
        (1, "the cat the cat x-ray"),   # 5 toks, top 'the'×2, 1 symbol word
        (2, ""),                         # empty doc must survive with zeros
    ])
    got = {r["doc_id"]: r.asDict() for r in curation.gopher_quality_stats(df).collect()}
    g1 = got[1]
    assert g1["n_tokens"] == 5
    # lengths: the(3) cat(3) the(3) cat(3) x-ray(5) → 17/5 = 3.4
    assert g1["mean_word_len"] == 3.4
    assert g1["symbol_word_frac"] == 0.2          # x-ray only
    assert g1["stopword_frac"] == 0.4             # 'the' twice
    assert g1["top_token_share"] == 0.4           # the×2 / 5
    assert g1["dup_token_frac"] == 0.4            # 3 distinct of 5
    g2 = got[2]
    assert g2["n_tokens"] == 0
    assert g2["mean_word_len"] == 0.0 and g2["dup_token_frac"] == 0.0


def test_repeated_ngram_stats_hand_computed(spark):
    # bigrams of 'a b a b a': (a b)(b a)(a b)(b a) → 4 occ, 2 distinct
    df = _docs(spark, [(1, "a b a b a"), (2, "x")])
    got = {r["doc_id"]: r.asDict() for r in curation.repeated_ngram_stats(df, k=2).collect()}
    assert got[1]["n_ngrams"] == 4
    assert got[1]["dup_ngram_frac"] == 0.5
    assert got[1]["top_ngram_share"] == 0.5
    # short doc: whole token string as one shingle
    assert got[2]["n_ngrams"] == 1 and got[2]["dup_ngram_frac"] == 0.0


def test_pii_scrub_planted_and_order(spark):
    df = _docs(spark, [
        (1, "mail a.b+c@sub.example.org now"),
        (2, "server 192.168.1.250 and call 555-123-4567"),
        (3, "clean text with no pii at all"),
        (4, "x@y.io 10.0.0.1 111-222-3333"),
    ])
    got = {r["doc_id"]: r.asDict()
           for r in curation.pii_scrub(df, text_col="text").collect()}
    assert got[1]["n_email"] == 1 and got[1]["scrubbed"] == "mail <EMAIL> now"
    assert got[2]["n_ip"] == 1 and got[2]["n_phone"] == 1
    assert got[2]["scrubbed"] == "server <IP> and call <PHONE>"
    assert got[3]["n_email"] == got[3]["n_ip"] == got[3]["n_phone"] == 0
    assert got[3]["scrubbed"] == got[3]["text"]
    assert got[4]["scrubbed"] == "<EMAIL> <IP> <PHONE>"
    # the phone rule must NOT eat IP octets (dotted 4-group is IP's)
    assert got[2]["n_phone"] == 1


def test_pii_scrub_staged_counts_on_overlap(spark):
    """Counts are taken per stage on the already-redacted text, so a
    phone-shaped substring consumed by the email pass is counted as
    email, not double-counted: n_* always equals inserted <TAG>s."""
    df = _docs(spark, [(1, "call 555-123-4567@mail.com now")])
    got = curation.pii_scrub(df, text_col="text").collect()[0].asDict()
    assert got["n_email"] == 1
    assert got["n_phone"] == 0          # consumed by the email pass
    assert got["scrubbed"] == "call <EMAIL> now"
    assert got["scrubbed"].count("<PHONE>") == got["n_phone"]


def test_decontaminate_overlap_planted(spark):
    train = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta"),   # shares 5-grams w/ bench 100
        (2, "one two three four five six seven"),
        (3, "totally unrelated words in this document"),
    ])
    bench = _docs(spark, [
        (100, "alpha beta gamma delta epsilon"),       # one 5-gram, shared
        (101, "nothing matches here at all friend"),
    ])
    got = {(r["train_id"], r["bench_id"]): r["n_shared"]
           for r in curation.decontaminate_overlap(train, bench, k=5).collect()}
    assert got == {(1, 100): 1}


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "t", "en" if i % 2 == 0 else "fr") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    kept = curation.stratified_sample(
        df, rates={"en": 0.0, "fr": 1.0}, strata_col="lang"
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {i for i in range(400) if i % 2 == 1}  # en dropped, fr kept
    half = curation.stratified_sample(df, rates={"en": 0.5, "fr": 0.5})
    n1 = half.count()
    assert 100 < n1 < 300  # ~200 expected; deterministic hash, loose bound
    assert half.count() == n1  # re-execution identical (no rand())


def test_mixture_weights_hand_computed(spark):
    df = spark.createDataFrame(
        [("a", 16), ("a", 16), ("b", 32)], ["source", "n_tok"]
    )
    got = {r["source"]: r.asDict()
           for r in curation.mixture_weights(df, weight_col="n_tok", alpha=0.5).collect()}
    # totals 32 both → equal weights 0.5
    assert got["a"]["total_tokens"] == 32 and got["b"]["total_tokens"] == 32
    assert got["a"]["mix_weight"] == 0.5 and got["b"]["mix_weight"] == 0.5
    # alpha→1 recovers proportional weights
    prop = {r["source"]: r["mix_weight"]
            for r in curation.mixture_weights(df, weight_col="n_tok", alpha=1.0).collect()}
    assert prop["a"] == 0.5 and prop["b"] == 0.5
    skew = spark.createDataFrame([("a", 10), ("b", 1000)], ["source", "n_tok"])
    w = {r["source"]: r["mix_weight"]
         for r in curation.mixture_weights(skew, weight_col="n_tok", alpha=0.0).collect()}
    assert w["a"] == 0.5 and w["b"] == 0.5  # alpha=0 is uniform


def test_pack_sequences_hand_computed(spark):
    df = _docs(spark, [
        (1, "a b c"),        # 3 toks, offset 0, pack 0
        (2, "d e f g"),      # offset 3, spans 4-token boundary? ctx=4: 3..6 → packs 0..1
        (3, ""),             # 0 toks, offset 7, pack 1, no span
        (4, "h"),            # offset 7, pack 1
    ])
    got = {r["doc_id"]: r.asDict()
           for r in curation.pack_sequences(df, ctx_len=4).collect()}
    assert got[1] == {"doc_id": 1, "n_tokens": 3, "start_offset": 0,
                      "pack_id": 0, "spans_boundary": False}
    assert got[2] == {"doc_id": 2, "n_tokens": 4, "start_offset": 3,
                      "pack_id": 0, "spans_boundary": True}
    assert got[3]["n_tokens"] == 0 and got[3]["spans_boundary"] is False
    assert got[4] == {"doc_id": 4, "n_tokens": 1, "start_offset": 7,
                      "pack_id": 1, "spans_boundary": False}


def test_sample_per_group_exact_n_and_deterministic(spark):
    from data_wrangle_openstreetmaps_data_spark.operators import sample

    rows = [(i, "t", "en" if i < 300 else "fr") for i in range(350)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = sample.sample_per_group(df, n=10, strata_col="lang", id_col="doc_id")
    by_lang = {r["lang"] for r in got.collect()}
    counts = {r["lang"]: r["cnt"] for r in
              got.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert by_lang == {"en", "fr"}
    assert counts == {"en": 10, "fr": 10}  # exact n, even from 300 and 50
    again = {tuple(r) for r in sample.sample_per_group(
        df, n=10, strata_col="lang", id_col="doc_id").collect()}
    assert again == {tuple(r) for r in got.collect()}  # hash-stable
    # a stratum smaller than n yields all its rows
    tiny = spark.createDataFrame([(1, "t", "de")], ["doc_id", "text", "lang"])
    assert sample.sample_per_group(tiny, n=10, strata_col="lang",
                                   id_col="doc_id").count() == 1


def test_token_budget_select_greedy_prefix(spark):
    # quality ~ token count here (len_score dominates): doc 1 has 50+
    # tokens (quality caps), docs descend; budget cuts mid-list
    rows = [
        (1, " ".join(["the"] * 60)),   # 60 toks, top quality
        (2, " ".join(["the"] * 50)),   # 50 toks
        (3, " ".join(["the"] * 40)),   # 40 toks
        (4, "a b"),                    # low quality
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from data_wrangle_openstreetmaps_data_spark.functions import text as T

    got = {r["doc_id"]: r.asDict() for r in curation.token_budget_select(
        df, budget=115, quality_col=T.quality_score("text")).collect()}
    # 1 and 2 tie on quality (both cap len_score) → id ties break: 1 then 2
    # cumsum: 60, 110; doc 3 would hit 150 > 115 → cut
    assert set(got) == {1, 2}
    assert got[1]["cum_tokens"] == 60 and got[2]["cum_tokens"] == 110


def test_quantile_filter_drops_bottom_quartile_per_stratum(spark):
    from data_wrangle_openstreetmaps_data_spark.functions import text as T

    # 4 docs per lang with strictly increasing quality (token count)
    rows = []
    for lang_i, lang in enumerate(("en", "fr")):
        for j in range(4):
            rows.append((lang_i * 10 + j, " ".join(["the"] * (5 + 10 * j)), lang))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = curation.quantile_filter(
        df, quality_col=T.quality_score("text"), min_quantile=0.25,
        strata_col="lang",
    )
    kept = {r["doc_id"] for r in got.collect()}
    # percent_rank of 4 rows = 0, 1/3, 2/3, 1 → the rank-0 (lowest) doc
    # of EACH stratum is dropped
    assert kept == {1, 2, 3, 11, 12, 13}


def test_label_centroids_and_similarity_hand_computed(spark):
    from pyspark.sql.types import (
        ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
    )

    from data_wrangle_openstreetmaps_data_spark.operators import similarity

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ])
    df = spark.createDataFrame([
        (1, [1.0, 0.0], 0), (2, [3.0, 0.0], 0),   # centroid (2, 0)
        (3, [0.0, 2.0], 1),                        # centroid (0, 2)
        (4, [2.0, 2.0], 2),                        # centroid (2, 2)
    ], schema)
    cent = {(r["label"], r["pos"]): r["centroid"]
            for r in similarity.label_centroids(df).collect()}
    assert cent == {(0, 0): 2.0, (0, 1): 0.0, (1, 0): 0.0, (1, 1): 2.0,
                    (2, 0): 2.0, (2, 1): 2.0}
    sim = {(r["label_a"], r["label_b"]): r["cos_sim"]
           for r in similarity.centroid_similarity(df).collect()}
    assert sim[(0, 1)] == 0.0          # orthogonal
    assert sim[(0, 2)] == 0.7071       # 45°
    assert sim[(1, 2)] == 0.7071


def test_unigram_logprob_hand_computed(spark):
    # corpus: 'a a a b' → P(a)=3/4, P(b)=1/4
    df = _docs(spark, [(1, "a a"), (2, "a b"), (3, "")])
    import math
    got = {r["doc_id"]: r.asDict()
           for r in curation.unigram_logprob(df).collect()}
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000
    assert got[1]["n_tokens"] == 2
    assert got[1]["avg_logp"] == r4(math.log10(0.75))
    assert got[2]["avg_logp"] == r4((math.log10(0.75) + math.log10(0.25)) / 2)
    assert got[3]["n_tokens"] == 0 and got[3]["avg_logp"] is None


def test_bigram_logprob_hand_computed(spark):
    # corpus: doc1 'a b a', doc2 'a b', doc3 'c'
    # unigrams: a×3, b×2, c×1, N=6; bigrams: (a,b)×2, (b,a)×1
    # P(b|a) = 2/2 = 1, P(a|b) = 1/1 = 1
    df = _docs(spark, [(1, "a b a"), (2, "a b"), (3, "c")])
    import math
    got = {r["doc_id"]: r.asDict()
           for r in curation.bigram_logprob(df).collect()}
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000
    lp_ab = math.log10(0.5 * 1.0 + 0.5 * (2 / 6))   # next tok b
    lp_ba = math.log10(0.5 * 1.0 + 0.5 * (3 / 6))   # next tok a
    assert got[1]["n_bigrams"] == 2
    assert got[1]["avg_logp"] == r4((lp_ab + lp_ba) / 2)
    assert got[2]["n_bigrams"] == 1
    assert got[2]["avg_logp"] == r4(lp_ab)
    # single-token doc: no bigram positions, NULL score
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_logp"] is None


def test_bigram_logprob_interpolation_mix(spark):
    """The score mixes BOTH terms: a deterministic continuation
    (P(x|b) = 1) is still dragged down by the rare-unigram term
    (1−λ)·P(x) — distinguishing interpolation from a pure bigram LM,
    which would give log10(1) = 0 here."""
    df = _docs(spark, [(1, "a b"), (2, "b x"), (3, "a b")])
    import math
    got = {r["doc_id"]: r.asDict()
           for r in curation.bigram_logprob(df).collect()}
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000
    # unigrams: a×2, b×3, x×1 → N=6; bigrams: (a,b)×2, (b,x)×1
    # doc2 'b x': P(x|b) = 1/1, P(x) = 1/6
    assert got[2]["avg_logp"] == r4(math.log10(0.5 + 0.5 / 6))


def test_quantize_stats_hand_computed(spark):
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    from data_wrangle_openstreetmaps_data_spark.operators import similarity

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    df = spark.createDataFrame(
        [(1, [127.0, -127.0, 0.0]),   # exactly representable → err 0
         (2, [1.0, 0.005]),           # 0.005/1*127 = 0.635 → q=1 → recon 1/127
         (3, [0.0, 0.0])],            # zero vector → scale 0, err 0
        schema,
    )
    got = {r["vec_id"]: r.asDict()
           for r in similarity.quantize_stats(df, bits=8).collect()}
    assert got[1]["scale"] == 127.0 and got[1]["max_abs_err"] == 0.0
    assert got[2]["scale"] == 1.0
    # err for 0.005: |0.005 - 1/127| = 0.002874...; round4 → 0.0029
    assert got[2]["max_abs_err"] == 0.0029
    assert got[3]["scale"] == 0.0 and got[3]["max_abs_err"] == 0.0


def test_curate_v2_stats_monotone_and_schema(spark):
    from data_wrangle_openstreetmaps_data_spark.catalog import table
    from data_wrangle_openstreetmaps_data_spark.plans.datapipe import curate_v2
    from tests.conftest import SF_SMALL

    res = curate_v2(table(spark, SF_SMALL, "documents"))
    s = res.stats
    # each stage can only shrink the corpus
    assert (s["input"] >= s["train_split"] >= s["after_repetition_cut"]
            >= s["after_quality_quantile"] >= s["after_exact_dedup"]
            >= s["after_decontamination"] == s["curated"])
    assert s["curated"] > 0
    assert res.curated.columns == ["doc_id", "lang", "quality", "fp"]
    # benchmark docs never leak into the release
    ids = [r["doc_id"] for r in res.curated.collect()]
    assert all(i % 29 != 0 for i in ids)
    for c in res.caches or []:
        c.unpersist()
