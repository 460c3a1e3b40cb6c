"""End-to-end curation pipeline: every stage drops what it should."""

from __future__ import annotations

import os

from data_wrangle_openstreetmaps_data_spark.plans.datapipe import curate

TMP = os.path.join(os.path.dirname(__file__), "..", ".tmp", "curated")

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to the park "
    "while the birds sing in the garden and the cat watches from a chair"
)
NEAR = GOOD.replace("garden", "yard")
SPANISH = "el perro de la casa y que mas cosas de la vida y el sol"
JUNK = "$$$ ### !!! ???"
# passes the language filter (has stopwords) but drowns in punctuation →
# exercises the quality gate as a DROPPING stage
LOW_QUALITY = "the #### $$$$ %%%% of @@@@ ???? !!!! ^^^^ &&&& **** ((((("


def test_curate_stages(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),              # exact dup → dropped
        (3, "  " + GOOD.upper()),  # normalized dup → dropped
        (4, NEAR),              # near dup of 1 → dropped by clustering
        (5, SPANISH),           # wrong language → dropped
        (6, JUNK),              # no stopwords → 'und' → dropped at lang
        (7, "the small house of the old man is near the lake and the hills "
            "where a good dog barks at the moon and the stars at night"),
        (8, LOW_QUALITY),       # English but low quality → quality gate
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    res = curate(docs, near_dup_threshold=0.5, out_store=TMP)
    ids = sorted(r["doc_id"] for r in res.curated.collect())
    assert ids == [1, 7]
    s = res.stats
    assert s["input"] == 8
    # spanish AND junk out here: no recognizable stopwords → pred 'und'
    assert s["after_lang_filter"] == 6
    assert s["after_quality"] == 5            # LOW_QUALITY dropped HERE
    assert s["after_exact_dedup"] == 3        # 2,3 out
    assert s["after_near_dedup"] == 2         # 4 out
    assert s["curated"] == 2
    # store written and readable
    back = spark.read.parquet(TMP)
    assert back.count() == 2
    cols = set(back.columns)
    assert {"doc_id", "text", "pred", "quality", "fp"} <= cols


def test_curate_tolerates_conflicting_input_columns(spark):
    # caller frames may already carry pred/quality columns — curate must
    # not crash (AMBIGUOUS_REFERENCE) or silently mix them in
    docs = spark.createDataFrame(
        [(1, GOOD, "xx", -1.0), (2, SPANISH, "yy", -2.0)],
        ["doc_id", "text", "pred", "quality"],
    )
    res = curate(docs, near_dup_threshold=0.9)
    rows = res.curated.collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["pred"] == "en"        # recomputed, not the stale 'xx'
    assert rows[0]["quality"] > 0.0


def test_ingest_batch_sequential_state(spark, tmp_path):
    """The incremental orchestration over THREE batches: parquet state
    accumulates accepted docs; each later batch is exact-deduped against
    state fingerprints and near-dup-dropped against state docs — dups of
    docs accepted TWO batches earlier are still caught."""
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_spark.plans.datapipe import (
        ingest_batch,
    )

    state = str(tmp_path / "incr_state")
    d1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d3 = "one two three four five six seven eight nine ten"
    d13 = "red orange yellow green blue indigo violet pink brown black"
    b1 = [
        (1, d1),
        (2, "  " + d1.upper()),  # normalized exact dup of 1 → min-id keeps 1
        (3, d3),
    ]
    b2 = [
        (11, d1),                          # exact dup of state doc 1
        (12, d3.replace("ten", "eleven")), # near dup of state doc 3
        (13, d13),                         # novel
    ]
    b3 = [
        (21, d13.replace("black", "white")),  # near dup of batch-2 accept
        (22, "sun moon stars clouds rain snow wind fog hail sleet"),
        (23, "sun moon stars clouds rain snow wind fog hail sleet"),  # in-batch exact dup
    ]
    accepted = []
    for rows in (b1, b2, b3):
        batch = spark.createDataFrame(rows, ["doc_id", "text"])
        got = sorted(
            r["doc_id"] for r in ingest_batch(spark, batch, state).collect()
        )
        accepted.append(got)
    assert accepted == [[1, 3], [13], [22]]
    # state holds exactly the accepted docs, with text + fingerprint
    st = spark.read.parquet(os.path.join(state, "docs"))
    assert sorted(r["doc_id"] for r in st.collect()) == [1, 3, 13, 22]
    assert set(st.columns) == {"doc_id", "text", "fp"}
    assert st.filter(F.length("fp") != 16).count() == 0
