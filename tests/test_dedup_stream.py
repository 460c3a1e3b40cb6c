"""Streaming exact dedup: first occurrence per fingerprint across
micro-batches, matching the batch dedup result."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.streaming import events as se
from data_wrangle_openstreetmaps_data_spark.streaming.dedup_stream import (
    dedup_stream,
)

TMP = os.path.join(os.path.dirname(__file__), "..", ".tmp", "dedup_stream")


@pytest.fixture(scope="module")
def corpus_dir(spark):
    # two files → two micro-batches (maxFilesPerTrigger=1): cross-batch
    # duplicates exercise the state path
    os.makedirs(TMP, exist_ok=True)
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "ALPHA beta GAMMA")],
        ["doc_id", "text"],
    )
    b2 = spark.createDataFrame(
        [(4, "alpha beta gamma"), (5, "zeta eta"), (6, "delta  epsilon")],
        ["doc_id", "text"],
    )
    b1.coalesce(1).write.mode("overwrite").parquet(os.path.join(TMP, "batch1"))
    b2.coalesce(1).write.mode("overwrite").parquet(os.path.join(TMP, "batch2"))
    return TMP


def test_streaming_dedup_first_occurrence(spark, corpus_dir):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(corpus_dir, "batch*"))
    )
    assert stream.isStreaming
    se.run_to_memory(dedup_stream(stream), "dedup_out", output_mode="append")
    kept = sorted(r["doc_id"] for r in spark.table("dedup_out").collect())
    # 1≡3≡4 (normalized dup), 2≡6 (whitespace dup), 5 unique
    assert kept == [1, 2, 5]
