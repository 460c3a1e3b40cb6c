"""Stateful streaming sessionization vs its batch backfill equivalent."""

from __future__ import annotations

import os
import shutil

import pytest

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.streaming import events as se
from data_wrangle_openstreetmaps_data_spark.streaming import sessionize as sz
from tests.conftest import SF_SMALL

GAP_US = 12 * 3600 * 10**6  # 12h in µs: the sf0.001 events span ~a month


@pytest.fixture(scope="module")
def events_dir():
    d = os.path.join(os.path.dirname(__file__), "..", ".tmp", "sess_stream")
    os.makedirs(d, exist_ok=True)
    shutil.copy(f"{SF_SMALL}/events.parquet", os.path.join(d, "part-0.parquet"))
    return d


def test_streaming_sessions_match_batch_closed_sessions(spark, events_dir):
    stream = se.read_events_stream(spark, events_dir)
    sz_stream = sz.sessionize_stream(stream, GAP_US)
    se.run_to_memory(sz_stream, "sessions", output_mode="append")
    streamed = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.table("sessions").collect()
    }

    batch_all = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in sz.sessionize_batch(
            table(spark, SF_SMALL, "events"), GAP_US
        ).collect()
    }
    # the stream emits exactly the CLOSED sessions: every user's final
    # (still-open) session stays in state — so streamed ⊂ batch and the
    # difference is exactly one session per user (the last one)
    assert len(streamed) > 0
    assert set(streamed) <= set(batch_all)
    for k, v in streamed.items():
        assert batch_all[k] == v
    open_per_user = {}
    for (uid, start) in set(batch_all) - set(streamed):
        open_per_user.setdefault(uid, []).append(start)
    users = {uid for uid, _ in batch_all}
    assert set(open_per_user) == users
    for uid, starts in open_per_user.items():
        assert len(starts) == 1
        # and it is that user's LAST session
        last_start = max(s for (u, s) in batch_all if u == uid)
        assert starts[0] == last_start


@pytest.mark.slow
def test_stream_matches_batch_at_sf01(spark):
    """Batch↔stream sessionization parity at sf0.1 (the bench scale —
    ~20× the sf0.001 equivalence test): every streamed closed session must
    equal its batch twin, and the difference must be exactly each user's
    final (still-open) session."""
    from tests.conftest import SF_MID

    sf_big = SF_MID.replace("0.01", "0.1")
    d = os.path.join(os.path.dirname(__file__), "..", ".tmp", "sess_stream_01")
    os.makedirs(d, exist_ok=True)
    shutil.copy(f"{sf_big}/events.parquet", os.path.join(d, "part-0.parquet"))
    stream = se.read_events_stream(spark, d)
    sz_stream = sz.sessionize_stream(stream, GAP_US)
    se.run_to_memory(sz_stream, "sessions_01", output_mode="append")
    streamed = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.table("sessions_01").collect()
    }
    batch_all = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in sz.sessionize_batch(
            table(spark, sf_big, "events"), GAP_US
        ).collect()
    }
    assert len(streamed) > 0
    assert set(streamed) <= set(batch_all)
    for k, v in streamed.items():
        assert batch_all[k] == v
    only_batch = set(batch_all) - set(streamed)
    users = {uid for uid, _ in batch_all}
    # exactly one missing session per user, and it is that user's last
    assert {uid for uid, _ in only_batch} == users
    assert len(only_batch) == len(users)
    last_start = {}
    for uid, start in batch_all:
        last_start[uid] = max(last_start.get(uid, start), start)
    assert only_batch == {(u, s) for u, s in last_start.items()}


def test_cross_batch_late_event_does_not_regress_session():
    """A late event from a later micro-batch (ts < state.last) must not pull
    the session's last-seen time backwards: an on-time follow-up within gap
    of the true last must stay in the same session."""
    gap = 100
    # batch 1: events at 0, 50, 120, 200 → one open session [0..200]
    closed, state = sz._advance_sessions(
        "u", None, None, 0, [0, 50, 120, 200], gap
    )
    assert closed == [] and state == (0, 200, 4)
    # batch 2: late event at 150 (within session), then on-time 290.
    # 290 - 200 = 90 < gap → same session. With the old `last = ts` bug,
    # last would regress to 150 and 290 would wrongly open a new session.
    closed, state = sz._advance_sessions("u", *state, [150, 290], gap)
    assert closed == []
    assert state == (0, 290, 6)


def test_batch_sessions_properties(spark):
    df = sz.sessionize_batch(table(spark, SF_SMALL, "events"), GAP_US)
    rows = df.collect()
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)
    # sessions of one user never overlap
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"])
        )
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2


def test_streaming_sessions_across_three_batches(spark):
    """Cross-batch keyed state for real: the events table split into 3
    time-ordered micro-batches. Sessions that START in an earlier batch
    and END in a later one must still come out exactly equal to the batch
    backfill — the single-file drain never exercises this."""
    from tests.conftest import stage_time_split_events

    glob = stage_time_split_events(spark, SF_SMALL, "sess_stream_3b", n=3)
    stream = (
        spark.readStream.schema(se.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    se.run_to_memory(
        sz.sessionize_stream(stream, GAP_US), "sessions_3b",
        output_mode="append",
    )
    streamed = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.table("sessions_3b").collect()
    }
    batch_all = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in sz.sessionize_batch(
            table(spark, SF_SMALL, "events"), GAP_US
        ).collect()
    }
    assert len(streamed) > 0
    assert set(streamed) <= set(batch_all)
    for k, v in streamed.items():
        assert batch_all[k] == v
    # difference is exactly each user's final (still-open) session
    only_batch = set(batch_all) - set(streamed)
    users = {uid for uid, _ in batch_all}
    assert {uid for uid, _ in only_batch} == users
    assert len(only_batch) == len(users)
    # and at least one CLOSED session genuinely spans a batch boundary —
    # i.e. its span crosses a split point, so its state crossed batches
    import os

    d = os.path.join(os.path.dirname(__file__), "..", ".tmp", "sess_stream_3b")
    maxes = []
    for i in range(2):  # upper ts of batches 0 and 1
        pq = spark.read.parquet(os.path.join(d, f"batch{i}"))
        maxes.append(pq.agg({"ts": "max"}).first()[0])
    spanning = [
        (uid, s) for (uid, s), (e, _) in streamed.items()
        if any(s <= m < e for m in maxes)
    ]
    assert spanning, "no closed session crossed a micro-batch boundary"


def test_watermarked_timeout_closes_idle_session(spark):
    """EventTimeTimeout for real: user 1's session must be emitted purely
    by the watermark passing end+gap (no later user-1 event exists), while
    user 2's session — still inside the watermark — stays in state."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(os.path.dirname(__file__), "..", ".tmp", "wm_timeout")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    H = 3600 * 10**6
    T0 = 1_700_000_000_000_000

    def write(path, rows, mt):
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mt, mt))

    base = time.time()
    write(f"{d}/b0.parquet", [(1, T0), (1, T0 + 600 * 10**6)], base)
    write(f"{d}/b1.parquet", [(2, T0 + 48 * H)], base + 2)
    stream = (
        spark.readStream.schema("user_id long, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/b*.parquet")
    )
    se.run_to_memory(
        sz.sessionize_stream_watermarked(stream, H, H), "wm_timeout_out"
    )
    rows = sorted(map(tuple, spark.table("wm_timeout_out").collect()))
    assert rows == [(1, T0, T0 + 600 * 10**6, 2)]


def test_watermarked_stream_equals_batch_plus_timeout_rule(spark, events_dir):
    """availableNow drain contract of the watermarked sessionizer: emitted
    = every advance-closed session (all but each user's final) PLUS the
    finals whose ms-floored close point (end+gap) lies below the final
    watermark (ms-floored max event time minus the delay)."""
    WM_US = 3600 * 10**6
    stream = se.read_events_stream(spark, events_dir)
    se.run_to_memory(
        sz.sessionize_stream_watermarked(stream, GAP_US, WM_US), "wm_drain"
    )
    streamed = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.table("wm_drain").collect()
    }
    ev = table(spark, SF_SMALL, "events")
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_spark.catalog import event_ts_us

    max_us = ev.select(F.max(event_ts_us(ev))).first()[0]
    wm_ms = max_us // 1000 - WM_US // 1000
    batch_all = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in sz.sessionize_batch(ev, GAP_US).collect()
    }
    last_start = {}
    for (u, s) in batch_all:
        last_start[u] = max(last_start.get(u, s), s)
    want = {
        k: v
        for k, v in batch_all.items()
        if k[1] < last_start[k[0]]  # closed by advance
        or (v[0] + GAP_US) // 1000 < wm_ms  # closed by timeout
    }
    assert len(streamed) > 0
    assert streamed == want
    # and the timeout rule genuinely added sessions beyond the advance set
    advance_only = {k for k in batch_all if k[1] < last_start[k[0]]}
    assert set(streamed) > advance_only


def test_native_session_window_boundaries(spark, tmp_path):
    """Pins the two boundary behaviors q_sessionize_stream_native's
    oracle encodes: (1) a session whose µs close point (last+gap)
    EQUALS the final watermark is emitted (non-strict <=); (2) a close
    point 700 µs ABOVE the watermark is withheld (the close point is
    NOT ms-floored before comparison; the watermark is)."""
    from pyspark.sql import functions as F

    gap_us = 43_200_000_000
    delay_us = 3_600_000_000
    t0 = 1_000_000_000_000

    def drain(rows, name):
        d = str(tmp_path / name)
        spark.createDataFrame(rows, ["user_id", "ts"]).write.parquet(d)
        stream = spark.readStream.schema(
            spark.read.parquet(d).schema
        ).parquet(d)
        agg = (
            stream.withColumn("event_time", F.timestamp_micros("ts"))
            .withWatermark("event_time", "1 hour")
            .groupBy(
                "user_id",
                F.session_window("event_time", "12 hours").alias("w"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["user_id"] for r in spark.table(name).collect()}

    # close == wm exactly → emitted
    got = drain([(1, t0), (2, t0 + gap_us + delay_us)], "bdry_eq")
    assert 1 in got
    # close == wm + 700µs (sub-ms) → withheld
    got = drain(
        [(1, t0), (1, t0 + 700), (2, t0 + gap_us + delay_us)], "bdry_gt"
    )
    assert 1 not in got
