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


def test_curate_stages(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),              # exact dup → dropped
        (3, "  " + GOOD.upper()),  # normalized dup → dropped
        (4, NEAR),              # near dup of 1 → dropped by clustering
        (5, SPANISH),           # wrong language → dropped
        (6, JUNK),              # low quality → dropped
        (7, "the small house of the old man is near the lake and the hills "
            "where a good dog barks at the moon and the stars at night"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    res = curate(docs, near_dup_threshold=0.5, out_store=TMP)
    ids = sorted(r["doc_id"] for r in res.curated.collect())
    assert ids == [1, 7]
    s = res.stats
    assert s["input"] == 7
    # spanish AND junk out here: no recognizable stopwords → pred 'und'
    assert s["after_lang_filter"] == 5
    assert s["after_quality"] == 5
    assert s["after_exact_dedup"] == 3        # 2,3 out
    assert s["after_near_dedup"] == 2         # 4 out
    assert s["curated"] == 2
    # store written and readable
    back = spark.read.parquet(TMP)
    assert back.count() == 2
    cols = set(back.columns)
    assert {"doc_id", "text", "pred", "quality", "fp"} <= cols
