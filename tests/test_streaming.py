"""Structured Streaming: file-source events stream, watermarked windowed
counts, results must match the equivalent batch aggregation."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.streaming import events as se
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir():
    # file stream sources need a DIRECTORY; stage the read-only testdata file
    d = os.path.join(os.path.dirname(__file__), "..", ".tmp", "events_stream")
    os.makedirs(d, exist_ok=True)
    shutil.copy(f"{SF_SMALL}/events.parquet", os.path.join(d, "part-0.parquet"))
    return d


def test_windowed_counts_match_batch(spark, events_dir):
    stream = se.read_events_stream(spark, events_dir)
    assert stream.isStreaming
    q = se.run_to_memory(
        se.windowed_type_counts(stream, window="1 day", watermark="1 day"),
        "win_counts",
    )
    got = spark.table("win_counts")
    batch = (
        se.with_event_time(table(spark, SF_SMALL, "events"))
        .groupBy(F.window("event_time", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("ws"),
            F.col("window.end").alias("we"),
            "event_type",
            "cnt",
        )
    )
    s = {(r["ws"], r["event_type"]): r["cnt"] for r in got.collect()}
    b = {(r["ws"], r["event_type"]): r["cnt"] for r in batch.collect()}
    # append mode emits a window only once the watermark passes its end —
    # the final in-flight windows are (correctly) withheld when the stream
    # drains, so the streamed result is the batch result minus the tail.
    assert len(s) > 0
    assert set(s) <= set(b)
    for k, v in s.items():
        assert b[k] == v
    max_emitted = max(ws for ws, _ in s)
    missing = {ws for ws, _ in set(b) - set(s)}
    assert all(ws > max_emitted for ws in missing)


def test_streaming_topk_via_store(spark, events_dir, tmp_path_factory):
    base = os.path.join(os.path.dirname(__file__), "..", ".tmp", "topk_store")
    store, ckpt = os.path.join(base, "store"), os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    stream = se.read_events_stream(spark, events_dir)
    se.counts_to_store(
        se.windowed_type_counts(stream, "1 day", "1 day"), store, ckpt
    )
    top = se.topk_over_store(spark, store, k=3).collect()
    assert 1 <= len(top) <= 3
    totals = [r["total"] for r in top]
    assert totals == sorted(totals, reverse=True)
    # totals agree with a batch aggregate over the same closed windows
    closed = spark.read.parquet(store)
    batch_total = closed.groupBy("event_type").sum("cnt").count()
    assert batch_total >= len(top)


def test_streaming_user_counts_complete_mode(spark, events_dir):
    stream = se.read_events_stream(spark, events_dir)
    se.run_to_memory(
        se.streaming_user_counts(stream), "user_counts", output_mode="complete"
    )
    got = spark.table("user_counts")
    batch = table(spark, SF_SMALL, "events").groupBy("user_id").count()
    assert got.count() == batch.count()


def test_hopping_counts_subset_of_batch_and_overlap(spark, events_dir):
    """Hopping (2d/1d) streamed counts: every emitted window matches the
    batch hopping aggregate, each event lands in two windows, and emitted
    windows are exactly those closed by the final watermark."""
    stream = se.read_events_stream(spark, events_dir)
    q = se.run_to_memory(
        se.windowed_type_counts(
            stream, window="2 days", watermark="1 day", slide="1 day"
        ),
        "hop_counts",
    )
    got = spark.table("hop_counts")
    batch = (
        se.with_event_time(table(spark, SF_SMALL, "events"))
        .groupBy(F.window("event_time", "2 days", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("ws"),
            F.col("window.end").alias("we"),
            "event_type",
            "cnt",
        )
    )
    s = {(r["ws"], r["event_type"]): r["cnt"] for r in got.collect()}
    b = {(r["ws"], r["event_type"]): r["cnt"] for r in batch.collect()}
    assert len(s) > 0
    assert set(s) <= set(b)
    for k, v in s.items():
        assert b[k] == v
    # hopping fan-out: batch window assignments sum to 2x the event count
    n_events = table(spark, SF_SMALL, "events").count()
    assert sum(b.values()) == 2 * n_events


def test_streaming_ewma_state_carries_across_batches(spark, tmp_path):
    """Three time-range-split files drained one per micro-batch: the
    per-user EWMA state must carry across batches and the final value
    must equal the batch recurrence bit for bit (alpha=0.5 => exact
    binary weights)."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_wrangle_openstreetmaps_data_spark.streaming.ewma import (
        ewma_stream,
    )

    base_us = 1_700_000_000_000_000
    rows = [
        (uid, base_us + i * 60_000_000, uid * 100 + i, float((uid * 7 + i * 3) % 50))
        for uid in (1, 2, 3)
        for i in range(9)
    ]
    d = tmp_path / "ewma_batches"
    d.mkdir()
    # file k holds time range k (i in [3k, 3k+3)); ascending names AND
    # mtimes so the file source processes them in time order
    for k in range(3):
        part = [r for r in rows if (r[1] - base_us) // 60_000_000 // 3 == k]
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in part], pa.int64()),
                "ts": pa.array([r[1] for r in part], pa.timestamp("us")),
                "event_id": pa.array([r[2] for r in part], pa.int64()),
                "value": pa.array([r[3] for r in part], pa.float64()),
            }
        )
        p = str(d / f"part-{k}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + k, 1_700_000_000 + k))
        _time.sleep(0.05)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    name = "ewma_multibatch"
    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    se.run_to_memory(ewma_stream(stream), name, output_mode="update")
    out = spark.table(name).collect()
    # update mode appends one row per (user, batch) to the memory sink;
    # the live estimate is the row with the highest n
    final = {}
    for r in out:
        if r["user_id"] not in final or r["n"] > final[r["user_id"]]["n"]:
            final[r["user_id"]] = r
    assert len(out) == 9  # 3 users x 3 batches -> state carried each batch
    for uid in (1, 2, 3):
        vals = [v for u, _, _, v in sorted(rows) if u == uid]
        e = 0.0
        for v in vals:
            e = 0.5 * v + 0.5 * e
        assert final[uid]["n"] == 9
        assert final[uid]["ewma"] == e, (uid, final[uid]["ewma"], e)
