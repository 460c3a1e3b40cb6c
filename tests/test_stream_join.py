"""Stream-stream join vs batch equivalent; one-pass profiler."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.operators.quality import profile
from data_wrangle_openstreetmaps_data_spark.streaming import events as se
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir():
    d = os.path.join(os.path.dirname(__file__), "..", ".tmp", "ssj_stream")
    os.makedirs(d, exist_ok=True)
    shutil.copy(f"{SF_SMALL}/events.parquet", os.path.join(d, "part-0.parquet"))
    return d


def test_stream_stream_join_matches_batch(spark, events_dir):
    stream = se.read_events_stream(spark, events_dir)
    joined = se.stream_stream_join(stream, stream)
    se.run_to_memory(joined, "ssj_out", output_mode="append")
    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.table("ssj_out").collect()
    }

    ev = se.with_event_time(table(spark, SF_SMALL, "events"))
    l = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("l_event_id"),
        F.col("event_time").alias("l_time"),
    )
    r = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("r_event_id"),
        F.col("event_time").alias("r_time"),
    )
    batch = {
        (row["l_event_id"], row["r_event_id"])
        for row in l.join(
            r,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_time") <= F.col("l_time"))
            & (F.col("r_time") >= F.col("l_time") - F.expr("interval 7 days")),
        ).collect()
    }
    assert len(got) > 0
    assert got == batch


def test_profile_one_pass(spark):
    df = table(spark, SF_SMALL, "events")
    prof = {r["metric"]: r["value"] for r in profile(df, ["user_id", "event_type"]).collect()}
    assert prof["user_id:nulls"] == "0"
    assert int(prof["user_id:distinct"]) >= 10
    assert prof["event_type:min"] == "click"
    assert prof["event_type:max"] == "view"


def test_stream_stream_join_across_three_batches(spark):
    """The watermarked inner join over 3 time-ordered micro-batches: a
    purchase arriving in batch 3 must still match a signup buffered in
    batch 1's join state (the corpus spans ~a month; the 30-day watermark
    never passes a needed row), so the streamed result equals the batch
    join exactly — cross-batch state, not the single-drain shortcut."""
    from tests.conftest import stage_time_split_events

    glob = stage_time_split_events(spark, SF_SMALL, "ssj_stream_3b", n=3)

    def _stream():
        return (
            spark.readStream.schema(se.EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(glob)
        )

    joined = se.stream_stream_join(_stream(), _stream())
    se.run_to_memory(joined, "ssj_3b", output_mode="append")
    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.table("ssj_3b").collect()
    }

    ev = se.with_event_time(table(spark, SF_SMALL, "events"))
    l = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("l_event_id"),
        F.col("event_time").alias("l_time"),
    )
    r = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("r_event_id"),
        F.col("event_time").alias("r_time"),
    )
    batch = {
        (row["l_event_id"], row["r_event_id"])
        for row in l.join(
            r,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_time") <= F.col("l_time"))
            & (F.col("r_time") >= F.col("l_time") - F.expr("interval 7 days")),
        ).collect()
    }
    assert len(got) > 0
    assert got == batch
    # at least one match spans batches: left and right in different files
    import os

    d = os.path.join(os.path.dirname(__file__), "..", ".tmp", "ssj_stream_3b")
    batch_of = {}
    for i in range(3):
        pq = spark.read.parquet(os.path.join(d, f"batch{i}"))
        for row in pq.select("event_id").collect():
            batch_of[row["event_id"]] = i
    assert any(batch_of[a] != batch_of[b] for a, b in got), (
        "no join result crossed a micro-batch boundary"
    )
