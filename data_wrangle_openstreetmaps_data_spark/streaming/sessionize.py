"""Custom stateful streaming operator: user sessionization.

A session = consecutive events of one user with gaps < `gap_us`. Spark has
no built-in session operator with arbitrary per-group state, so this is
the ``applyInPandasWithState`` path — per-key state (open session) kept
by the engine, Arrow-batched user code deciding when to close.

Scale properties:
- state is O(active users), one small tuple each; closed sessions leave
  state immediately.
- the stream shuffles once on user_id (the groupBy key) — same key the
  downstream per-user analytics need.
- a batch (non-streaming) equivalent is provided for backfill: the same
  sessions computed with window lag + cumulative sum, one shuffle.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, session_start bigint, session_end bigint, n_events bigint"
)
STATE_SCHEMA = "start bigint, last bigint, n bigint"


def _advance_sessions(user_id, start, last, n, ts_sorted, gap):
    """Fold sorted timestamps into the open session (start, last, n),
    returning (closed_sessions, new_state).

    Events are sorted within a micro-batch only; across batches we assume
    roughly-ordered arrival (no watermark). A late event with ts <= last
    must NOT regress last — max() keeps the session's last-seen monotone
    so an on-time follow-up can't incorrectly split the session."""
    closed = []
    for ts in ts_sorted:
        if start is None:
            start, last, n = ts, ts, 1
        elif ts - last > gap:
            closed.append((user_id, start, last, n))
            start, last, n = ts, ts, 1
        else:
            last = max(last, ts)
            n += 1
    return closed, (start, last, n)


def sessionize_stream(
    events: DataFrame, gap_us: int = 30 * 60 * 10**6
) -> DataFrame:
    """Streaming sessionization over (user_id, ts). Emits a row per CLOSED
    session; the open session per user stays in state.

    Units: ``ts`` is epoch-µs long — a timestamp-typed ts is normalized
    here; a bigint ts is trusted to already BE µs (the
    ``read_events_stream`` normalized-stream contract). ``gap_us`` is in
    the same µs unit."""
    from data_wrangle_openstreetmaps_data_spark.catalog import event_ts_us

    if dict(events.dtypes)["ts"] != "bigint":
        events = events.withColumn("ts", event_ts_us(events))

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(pdf["ts"].tolist())
        closed, new_state = _advance_sessions(
            user_id, start, last, n, sorted(ts_all), gap_us
        )
        state.update(new_state)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_stream_watermarked(
    events: DataFrame,
    gap_us: int = 30 * 60 * 10**6,
    watermark_us: int = 3600 * 10**6,
) -> DataFrame:
    """Sessionization with EVENT-TIME TIMEOUT: sessions close two ways —
    a same-user event beyond the gap (like :func:`sessionize_stream`),
    or the event-time watermark passing ``session_end + gap`` (idle users'
    sessions close WITHOUT needing another event). This is the production
    contract: state is bounded by genuinely-open sessions, not by
    users-seen-ever, and the final session of a churned user still gets
    emitted once the watermark passes it.

    Same µs ts contract as the other sessionizers. The timeout timestamp
    is ``session_end + gap`` (ms granularity — the engine API); a session
    already beyond the watermark on arrival closes immediately (the
    engine rejects timeout timestamps at-or-before the watermark)."""
    from data_wrangle_openstreetmaps_data_spark.catalog import event_ts_us

    if dict(events.dtypes)["ts"] != "bigint":
        events = events.withColumn("ts", event_ts_us(events))
    ev = events.select(
        "user_id", "ts", F.timestamp_micros(F.col("ts")).alias("event_time")
    ).withWatermark("event_time", f"{watermark_us // 10**6} seconds")

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = ["user_id", "session_start", "session_end", "n_events"]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start, last, n)], columns=cols)
            return
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(pdf["ts"].tolist())
        closed, (start, last, n) = _advance_sessions(
            user_id, start, last, n, sorted(ts_all), gap_us
        )
        timeout_ms = (last + gap_us) // 1000
        wm_ms = state.getCurrentWatermarkMs()
        if timeout_ms <= wm_ms:
            # watermark already passed this session's close point
            closed.append((user_id, start, last, n))
            state.remove()
        else:
            state.update((start, last, n))
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame, gap_us: int = 30 * 60 * 10**6
) -> DataFrame:
    """Backfill equivalent: lag + cumulative-sum session ids, one shuffle
    on user_id. Produces ALL sessions (including each user's last).
    Same µs unit contract as :func:`sessionize_stream`."""
    from data_wrangle_openstreetmaps_data_spark.catalog import event_ts_us

    if dict(events.dtypes)["ts"] != "bigint":
        events = events.withColumn("ts", event_ts_us(events))
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = events.select("user_id", "ts").withColumn(
        "new_sess",
        (F.col("ts") - F.lag("ts").over(w) > gap_us).cast("int"),
    )
    sessioned = flagged.withColumn(
        "sess_id", F.coalesce(F.sum("new_sess").over(w), F.lit(0))
    )
    return (
        sessioned.groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("sess_id")
    )
