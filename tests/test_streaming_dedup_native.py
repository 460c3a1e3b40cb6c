"""Native dropDuplicatesWithinWatermark semantics (Spark 3.5+ API used
by q_streaming_dedup_native): within-batch and cross-batch duplicates
inside the watermark are dropped; state is EVICTED once the watermark
passes a key's expiry, after which the key is legitimately re-emitted —
the bounded-state contract that distinguishes this API from plain
streaming dropDuplicates (whose state grows forever)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.streaming import events as se

TMP = os.path.join(os.path.dirname(__file__), "..", ".tmp", "ddwm_native")

HOUR_US = 3600 * 10**6
DAY_US = 24 * HOUR_US


@pytest.fixture(scope="module")
def batches_dir(spark):
    # three files → three availableNow micro-batches
    # (maxFilesPerTrigger=1, file order = write order):
    #   b1: k=1 @ 0, k=2 @ 0 and @ +1min (within-batch dup)
    #   b2: k=1 @ +30min (cross-batch dup, inside the 1h watermark),
    #       k=3 @ +10d (advances the watermark far past k=1's expiry)
    #   b3: k=1 @ +10d — state evicted after b2, so it re-emits
    os.makedirs(TMP, exist_ok=True)
    rows = {
        "b1": [(1, 0), (2, 0), (2, 60 * 10**6)],
        "b2": [(1, 30 * 60 * 10**6), (3, 10 * DAY_US)],
        # watermark only ADVANCES at a batch boundary and eviction runs
        # as part of the batch's state cleanup, so the re-emit needs a
        # batch strictly after the one whose input moved the watermark
        "b3": [(4, 10 * DAY_US + 60 * 10**6)],
        "b4": [(1, 10 * DAY_US + 2 * 60 * 10**6)],
    }
    for name, data in rows.items():
        spark.createDataFrame(data, ["k", "t_us"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(TMP, name))
    return TMP


def test_dedup_within_watermark_and_eviction(spark, batches_dir):
    stream = (
        spark.readStream.schema("k long, t_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(batches_dir, "b*"))
    )
    assert stream.isStreaming
    deduped = (
        stream.withColumn("t", F.timestamp_micros(F.col("t_us")))
        .withWatermark("t", "1 hour")
        .dropDuplicatesWithinWatermark(["k"])
        .select("k")
    )
    se.run_to_memory(deduped, "ddwm_native_out")
    kept = sorted(r["k"] for r in spark.table("ddwm_native_out").collect())
    # k=1 emitted twice (original + post-eviction re-emit), k=2/3/4
    # once each; the within-batch and within-watermark dups dropped
    assert kept == [1, 1, 2, 3, 4]
