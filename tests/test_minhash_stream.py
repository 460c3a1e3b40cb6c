"""Streaming MinHash-LSH near-dup detection: cross-micro-batch state,
hot-bucket saturation cap, TTL config, and the unit-level bucket step.

The interesting case the registry query's availableNow single-batch
drain does NOT cover is state carried ACROSS micro-batches — a document
arriving in batch 3 must still pair with its near-dup from batch 1.
Three staged files + maxFilesPerTrigger=1 force exactly that.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.operators import dedup
from data_wrangle_openstreetmaps_data_spark.streaming import events as se
from data_wrangle_openstreetmaps_data_spark.streaming.minhash_stream import (
    SATURATED,
    _bucket_step,
    minhash_pairs_stream,
)

TMP = os.path.join(os.path.dirname(__file__), "..", ".tmp", "minhash_stream")

# near-dup docs planted so pairs CROSS batch boundaries: 1≈101 (b1,b2),
# 2≈102 (b1,b3), 101≈201 (b2,b3); 3/103/202 unrelated singletons
B1 = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "pack my box with five dozen liquor jugs right now"),
    (3, "completely unrelated text about database engines and queries"),
]
B2 = [
    (101, "the quick brown fox jumps over the lazy dog tonite"),
    (103, "another singleton document mentioning spark structured streaming"),
]
B3 = [
    (102, "pack my box with five dozen liquor jugs right away"),
    (201, "the quick brown fox jumps over the lazy cat tonite"),
    (202, "yet another loner row talking about parquet file layouts"),
]

DOC_SCHEMA = "doc_id long, text string"


def _stage_batches(spark, subdir: str, batches) -> str:
    """One parquet file per batch with strictly increasing mtimes, so the
    file source (oldest-first) replays them in order as separate
    micro-batches under maxFilesPerTrigger=1."""
    d = os.path.join(TMP, subdir)
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        out = os.path.join(d, f"batch{i}")
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(out)
        # parquet dirs land within the same mtime tick otherwise
        t = time.time() + i * 2
        for root, _, files in os.walk(out):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    return os.path.join(d, "batch*")


def _stream(spark, glob: str):
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )


def _pairs_of(spark, name: str) -> set:
    return {
        (r["id_a"], r["id_b"])
        for r in spark.table(name).filter(F.col("id_b") != SATURATED).collect()
    }


def test_cross_batch_pairs_match_batch_jaccard(spark):
    """3 micro-batches; the emitted pair union must equal the exact
    trigram-Jaccard pair set over the WHOLE corpus (recall-1.0 banding
    config: 16 hashes / 8 bands) — i.e. cross-batch state works."""
    glob = _stage_batches(spark, "cross", [B1, B2, B3])
    se.run_to_memory(
        minhash_pairs_stream(
            _stream(spark, glob), n_hashes=16, bands=8, shingle_k=3,
            threshold=0.5,
        ),
        "mh_cross",
    )
    got = _pairs_of(spark, "mh_cross")

    all_docs = spark.createDataFrame(B1 + B2 + B3, ["doc_id", "text"])
    want = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            all_docs, shingle_k=3, threshold=0.5
        ).collect()
    }
    assert got == want
    # and the planted pairs genuinely span batches
    batch_of = {d: b for b, rows in enumerate([B1, B2, B3]) for d, _ in rows}
    assert any(batch_of[a] != batch_of[b] for a, b in want)
    assert (1, 101) in want and (2, 102) in want


def test_hot_bucket_cap_bounds_state_and_emits_markers(spark):
    """Planted boilerplate: 8 near-identical docs concentrated in the
    same band buckets. With max_bucket=3 only the first 3 members are
    stored/verified; every later arrival is skipped with a saturation
    marker — the O(members²) hot-bucket degeneration is capped."""
    # IDENTICAL text ⇒ identical band signatures in every band, so bucket
    # membership (and hence the cap behavior) is fully deterministic
    boiler = [
        (i, "subscribe to our newsletter for daily updates and offers")
        for i in range(1, 9)
    ]
    glob = _stage_batches(
        spark, "skew", [boiler[:3], boiler[3:6], boiler[6:]]
    )
    se.run_to_memory(
        minhash_pairs_stream(
            _stream(spark, glob), n_hashes=16, bands=8, shingle_k=3,
            threshold=0.5, max_bucket=3,
        ),
        "mh_skew",
    )
    out = spark.table("mh_skew").collect()
    real = {(r["id_a"], r["id_b"]) for r in out if r["id_b"] != SATURATED}
    marked = {r["id_a"] for r in out if r["id_b"] == SATURATED}
    # verified pairs only among the first 3 stored members of each bucket
    assert real == {(1, 2), (1, 3), (2, 3)}
    # every doc past the cap hit at least one saturated bucket
    assert marked == {4, 5, 6, 7, 8}
    # marker rows carry no fake similarity
    assert all(
        r["jaccard"] is None for r in out if r["id_b"] == SATURATED
    )


def test_ttl_evicts_cold_buckets(spark):
    """TTL posture, observed for real: with a millisecond TTL and a
    processing-time trigger, a bucket idle for one micro-batch expires —
    its member history is evicted, so a later near-dup arrival finds
    nothing to pair with. Within-batch pairs still emit.

    (availableNow drains are incompatible with ProcessingTimeTimeout —
    the cleanup trigger outlives the data — hence the real trigger plus
    a sentinel-pair poll here; see the module docstring.)"""
    b0 = [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i k")]
    b_idle = [(100, "m n o p q r s t u v")]
    b2 = [
        (301, "a b c d e f g h i l"),  # near-dup of 1/2 — state expired
        (302, "aa bb cc dd ee ff gg hh"),  # sentinel within-batch pair:
        (303, "aa bb cc dd ee ff gg hh"),  # signals batch 3 processed
    ]
    glob = _stage_batches(spark, "ttl", [b0, b_idle, b2])
    q = (
        minhash_pairs_stream(
            _stream(spark, glob), n_hashes=16, bands=8, shingle_k=3,
            threshold=0.5, ttl_minutes=0.0001,
        )
        .writeStream.format("memory")
        .queryName("mh_ttl")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        pairs = set()
        while time.time() < deadline:
            pairs = _pairs_of(spark, "mh_ttl")
            if (302, 303) in pairs:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert (1, 2) in pairs  # within-batch pair emitted before expiry
    assert (302, 303) in pairs  # batch 3 was fully processed...
    # ...yet 301 pairs with nothing: buckets of 1/2 expired while idle
    assert not any(301 in p for p in pairs)


def test_bucket_step_cap_is_o1_for_saturated_arrivals():
    ids = [1, 2, 3]
    sets = [{10, 11}, {10, 12}, {10, 13}]
    before = (list(ids), [set(s) for s in sets])
    out = _bucket_step(ids, sets, [(9, {10, 11})], 0.1, max_bucket=3)
    assert out == [(9, SATURATED, None)]
    # saturated arrival left state untouched
    assert (ids, sets) == before


def test_bucket_step_verifies_below_cap():
    ids, sets = [], []
    out = _bucket_step(
        ids, sets, [(1, {10, 11, 12}), (2, {10, 11, 13})], 0.4, max_bucket=3
    )
    assert out == [(1, 2, 0.5)]
    assert ids == [1, 2]
    out2 = _bucket_step(ids, sets, [(3, {10, 11, 12})], 0.4, max_bucket=3)
    # third member still fits and pairs with both
    assert (1, 3, 1.0) in out2 and (2, 3, 0.5) in out2


def test_max_bucket_validation(spark):
    with pytest.raises(ValueError, match="max_bucket"):
        minhash_pairs_stream(
            spark.createDataFrame([], DOC_SCHEMA), max_bucket=0
        )
