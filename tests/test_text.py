"""Text-analysis function tests: tokenization, shingling equivalence
(array form vs relational scale form), fingerprint, lang-id, quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.functions import text


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([("  The QUICK   brown\tfox ",)], ["t"])
    row = df.select(
        text.tokens("t").alias("toks"),
        text.token_count("t").alias("n"),
    ).first()
    assert row["toks"] == ["the", "quick", "brown", "fox"]
    assert row["n"] == 4


def test_shingles_array_vs_table_equivalence(spark):
    rows = [
        (1, "a b c d e"),
        (2, "x y"),          # shorter than k
        (3, "p p p p"),      # repeated tokens
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    arr = {
        r["doc_id"]: sorted(r["sh"])
        for r in df.select(
            "doc_id", text.shingles("text", 3).alias("sh")
        ).collect()
    }
    tab = (
        text.shingle_table(df, k=3)
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("shingle")).alias("sh"))
        .collect()
    )
    tab = {r["id"]: list(r["sh"]) for r in tab}
    assert arr == tab
    assert arr[1] == ["a b c", "b c d", "c d e"]
    assert arr[2] == ["x y"]
    assert arr[3] == ["p p p", "p p p"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("  hello world ",), ("different",)], ["t"]
    )
    fps = [r["fp"] for r in df.select(text.fingerprint("t").alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]
    assert len(fps[0]) == 16


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of a house",),
            ("el perro de la casa y que mas",),
            ("le chat et les oiseaux des bois",),
            ("der hund und die katze ist gross",),
            ("zzz qqq www",),
        ],
        ["t"],
    )
    got = [r["p"] for r in df.select(text.lang_id("t").alias("p")).collect()]
    assert got == ["en", "es", "fr", "de", "und"]


def test_lang_id_table_matches_expression_form(spark):
    rows = [
        (1, "the cat and the dog of a house"),
        (2, "el perro de la casa y que mas"),
        (3, "zzz qqq www"),
        (4, ""),
        (5, "the el le der"),  # 1 hit each → tie → first lang code (de)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    expr = {
        r["doc_id"]: r["p"]
        for r in df.select("doc_id", text.lang_id("text").alias("p")).collect()
    }
    rel = {
        r["id"]: r["pred"] for r in text.lang_id_table(df).collect()
    }
    assert expr == rel
    assert rel[5] == "de"


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the quick brown fox is a good dog and it runs to the park " * 5,),
         ("!!! ??? ### $$$",),
         ("",)],
        ["t"],
    )
    got = [r["q"] for r in df.select(text.quality_score("t").alias("q")).collect()]
    assert 0.0 <= min(got) and max(got) <= 1.0
    assert got[0] > got[1]  # prose beats punctuation soup


def test_round4_half_up(spark):
    df = spark.createDataFrame([(0.83125,), (0.12344999,), (-0.5,)], ["x"])
    got = [r["r"] for r in df.select(text.round4("x").alias("r")).collect()]
    assert got[0] == 0.8312 or got[0] == 0.8313  # depends on double repr; deterministic
    assert got[1] == 0.1234


def test_bm25_ranks_term_density_and_length(spark):
    from data_wrangle_openstreetmaps_data_spark.operators import similarity

    rows = [
        (1, "spark spark spark filler filler filler"),
        (2, "spark filler filler filler filler filler"),
        # same tf as doc 2 but much longer -> length-normalized below it
        (3, "spark " + " ".join(["filler"] * 40)),
        (4, "nothing relevant here at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = similarity.bm25_search(df, ["spark"], k=10).collect()
    ids = [r["id"] for r in out]
    assert ids == [1, 2, 3]  # doc 4 scores 0 and is absent
    scores = {r["id"]: r["score"] for r in out}
    assert scores[1] > scores[2] > scores[3] > 0


def test_chunk_windows_cover_and_overlap(spark):
    n = 80  # 80 tokens -> starts 0,24,48,72 -> sizes 32,32,32,8
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(n)))], ["doc_id", "text"]
    )
    d = df.select("doc_id", text.tokens("text").alias("toks"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(24)
    )
    got = sorted(
        r["start"]
        for r in d.select(F.explode(starts).alias("start")).collect()
    )
    assert got == [0, 24, 48, 72]
    # tail window is the 8-token remainder, full windows carry 32 tokens
    sizes = sorted(
        r["n"]
        for r in d.select(
            F.explode(starts).alias("start"), F.col("toks")
        )
        .select(
            F.size(
                F.slice(F.col("toks"), F.col("start") + 1, F.lit(32))
            ).alias("n")
        )
        .collect()
    )
    assert sizes == [8, 32, 32, 32]


def test_inverted_index_rare_bigrams(spark):
    # build a tiny corpus inline via the same expressions the query uses
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta delta"),
        (3, "alpha beta delta"),  # "alpha beta" df=3, "beta delta" df=2
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    d = df.select("doc_id", text.tokens("text").alias("toks"))
    heads = F.expr("slice(toks, 1, greatest(size(toks)-1, 0))")
    tails = F.expr("slice(toks, 2, greatest(size(toks)-1, 0))")
    bigrams = F.array_distinct(
        F.zip_with(heads, tails, lambda a, b: F.concat(a, F.lit(" "), b))
    )
    e = d.select("doc_id", F.explode(bigrams).alias("bigram"))
    inv = {
        r["bigram"]: (r["df"], r["postings"])
        for r in e.groupBy("bigram")
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
        .collect()
    }
    assert inv["alpha beta"] == (3, "1,2,3")
    assert inv["beta delta"] == (2, "2,3")
    assert inv["beta gamma"] == (1, "1")
