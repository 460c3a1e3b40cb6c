"""Structured Streaming: windows, joins, stateful sessionize, CDC, KMV, top-k.

Registry family module — split from the single-file registry; each
family defines its ``q_*`` callables plus the matching ``ORACLES``
entries, aggregated in ``__init__``."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.functions import text

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403
from data_wrangle_openstreetmaps_data_spark.plans.queries.storage import q_cdc_merge



def q_stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — watermarked stream-stream inner join (purchase ↔ same
    user's signups within the prior 7 days). The availableNow drain over
    one staged file is a single micro-batch with both sides complete, so
    the emitted matches are exactly the batch join at the same time
    predicate — watermarks only bound state, never results, for inner
    joins. Times emitted as epoch-µs longs (normalized stream ts ≡
    the oracle's epoch_us)."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    name = f"ssjoin_{uuid.uuid4().hex[:8]}"
    left = se.stage_events_stream(spark, sf, "ssj_l")
    right = se.stage_events_stream(spark, sf, "ssj_r")
    joined = se.stream_stream_join(left, right).select(
        "user_id",
        "l_event_id",
        "r_event_id",
        F.unix_micros("l_time").alias("l_us"),
        F.unix_micros("r_time").alias("r_us"),
    )
    se.run_to_memory(joined, name)
    return spark.table(name)


def q_sessionize_stream(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — custom stateful streaming sessionization
    (applyInPandasWithState): emits closed sessions. The availableNow drain
    is deterministic — output = every session except each user's last
    (still open in state) — so the oracle is the batch session SQL minus
    the per-user max-start session. Batch equivalence additionally pinned
    by tests/test_sessionize.py."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se
    from data_wrangle_openstreetmaps_data_spark.streaming.sessionize import (
        sessionize_stream,
    )

    name = f"sessions_{uuid.uuid4().hex[:8]}"
    # stage_events_stream already normalizes ts to epoch-µs long — same µs
    # precision the DuckDB oracle's epoch_us surfaces
    stream = se.stage_events_stream(spark, sf, "sess")
    se.run_to_memory(sessionize_stream(stream, _SESSION_GAP_US), name)
    return spark.table(name)


def q_stream_static_join(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — STATELESS stream-static enrichment join: the events
    stream joined to the static nation dimension (broadcast; no state
    store, no watermark — each micro-batch joins independently), the
    fact-stream × dimension-snapshot shape. Deterministic: inner join,
    emission independent of batching."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    name = f"ssj_static_{uuid.uuid4().hex[:8]}"
    stream = se.stage_events_stream(spark, sf, "ss_static")
    dim = table(spark, sf, "nation").select(
        F.col("n_nationkey").cast("long").alias("nk"), "n_name"
    )
    joined = se.stream_static_join(
        stream, dim, F.col("user_id") % 25, F.col("nk")
    ).select("event_id", "user_id", "n_name")
    se.run_to_memory(joined, name)
    return spark.table(name)


def q_streaming_user_activity(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — complete-mode running per-user aggregate (count, last
    event µs, max value): the live-dashboard shape. The availableNow
    drain's final complete-mode emission equals the batch GROUP BY."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    name = f"uact_{uuid.uuid4().hex[:8]}"
    stream = se.stage_events_stream(spark, sf, "uact")
    se.run_to_memory(
        se.user_activity_summary(stream), name, output_mode="complete"
    )
    return spark.table(name)


def q_sessionize_stream_watermarked(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — sessionization with EVENT-TIME TIMEOUT
    (applyInPandasWithState + watermark): sessions close on a same-user
    advance OR when the watermark passes end+gap, so idle/churned users'
    sessions are emitted without another event and state is bounded by
    genuinely-open sessions. availableNow drain determinism: emitted =
    every advance-closed session plus finals whose ms-floored close point
    (end+gap) is strictly below the final watermark (ms-floored max event
    time minus the delay) — the exact engine arithmetic, replicated in
    the oracle and pinned by tests/test_sessionize.py."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se
    from data_wrangle_openstreetmaps_data_spark.streaming.sessionize import (
        sessionize_stream_watermarked,
    )

    name = f"wmsessions_{uuid.uuid4().hex[:8]}"
    stream = se.stage_events_stream(spark, sf, "wmsess")
    se.run_to_memory(
        sessionize_stream_watermarked(stream, _SESSION_GAP_US, _WM_US), name
    )
    return spark.table(name)


def q_sessionize_stream_native(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — sessionization via Spark's NATIVE session_window in a
    watermarked streaming aggregation (the built-in path next to the
    applyInPandasWithState form of q_sessionize_stream_watermarked):
    12h gap, 1h watermark delay, availableNow drain in append mode.
    Append emits exactly the sessions whose close point (last event +
    gap) is at or below the final watermark (ms-floored max event time
    minus the delay) — the cutoff the oracle replicates; sessions still
    open against the watermark are withheld, which is the correct
    streaming answer, not a drain artifact. Output contract matches
    q_sessionize (session_end = last event, epoch-µs)."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    name = f"natsess_{uuid.uuid4().hex[:8]}"
    stream = se.stage_events_stream(spark, sf, "natsess")
    agg = (
        se.with_event_time(stream)
        .withWatermark("event_time", "1 hour")
        .groupBy(
            "user_id",
            F.session_window("event_time", "12 hours").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start"),
            (F.unix_micros(F.col("w.end")) - F.lit(_SESSION_GAP_US)).alias(
                "session_end"
            ),
            "n_events",
        )
    )
    se.run_to_memory(agg, name)
    return spark.table(name)


def q_streaming_windowed_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — watermarked event-time windowed counts over a file-source
    stream of the events table, drained with availableNow — which is
    deterministic: append mode emits exactly the windows closed by the
    final watermark (window end <= max event time - 1 day), so the oracle
    is a plain GROUP BY day with the same watermark cutoff."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    name = f"wincounts_{uuid.uuid4().hex[:8]}"
    se.run_to_memory(
        se.windowed_type_counts(
            se.stage_events_stream(spark, sf, "stream"), "1 day", "1 day"
        ),
        name,
    )
    return spark.table(name).select(
        F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("ws"),
        F.date_format("we", "yyyy-MM-dd HH:mm:ss").alias("we"),
        "event_type",
        "cnt",
    )


def q_streaming_hopping_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — hopping (2-day window / 1-day slide) event-time counts
    per event_type over the events stream, watermark 1 day, availableNow
    drain. Append mode emits exactly the hopping windows whose END the
    final watermark passed, so the oracle assigns each event its two
    epoch-aligned windows and applies the same cutoff — the sliding-window
    streaming contract, state bounded by watermark."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    name = f"hopcounts_{uuid.uuid4().hex[:8]}"
    se.run_to_memory(
        se.windowed_type_counts(
            se.stage_events_stream(spark, sf, "stream"),
            "2 days",
            "1 day",
            slide="1 day",
        ),
        name,
    )
    return spark.table(name).select(
        F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("ws"),
        F.date_format("we", "yyyy-MM-dd HH:mm:ss").alias("we"),
        "event_type",
        "cnt",
    )


def q_streaming_cms(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — count-min sketch MAINTENANCE under Structured
    Streaming: the exact same ``operators/sketch.py::cms_build`` plan
    runs over the event stream in complete mode, because a CMS *is* a
    running (row, bucket) count and micro-batch partials merge by
    summation. The final drain equals the batch-built sketch bit for
    bit — which is precisely what the oracle (the batch CMS in SQL)
    checks. State is bounded at depth·width rows regardless of stream
    length."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
        cms_build,
    )
    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    name = f"cms_{uuid.uuid4().hex[:8]}"
    stream = se.stage_events_stream(spark, sf, "cms")
    se.run_to_memory(
        cms_build(stream, "user_id", depth=4, width=64),
        name,
        output_mode="complete",
    )
    return spark.table(name)


def q_streaming_bitmap(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — per-user activity bitmaps maintained UNDER the
    stream: ``bit_or`` is idempotent AND mergeable, so the 28-bit
    (day-of-week × six-hour-slot) pattern of q_activity_bitmap is a
    perfect complete-mode streaming aggregate (micro-batch partials OR
    together; re-delivery cannot corrupt a bitmap the way a count
    inflates — the idempotence argument, one better than
    q_streaming_cms's summable counts). Drain → the same ≤128-row
    pattern rollup; the batch oracle IS the equivalence check. State:
    one long per user."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    name = f"bmp_{uuid.uuid4().hex[:8]}"
    stream = se.stage_events_stream(spark, sf, "bmp")
    b = F.expr(
        "shiftleft(1L, CAST(((ts div 86400000000) % 7) * 4"
        " + ((ts div 3600000000) % 24) div 6 AS INT))"
    )
    per_user = (
        stream.withColumn("bit", b)
        .groupBy("user_id")
        .agg(F.bit_or("bit").alias("pattern"))
    )
    se.run_to_memory(per_user, name, output_mode="complete")
    return (
        spark.table(name)
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "pattern",
            F.bit_count("pattern").alias("n_slots"),
            "n_users",
        )
        .orderBy(F.desc("n_users"), "pattern")
        .limit(20)
    )


def q_streaming_quantile(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — quantiles OVER A STREAM via a mergeable histogram:
    a 50-bin equi-width value histogram is a running (bin) count, so
    micro-batch partials merge by summation (the q_streaming_cms
    argument) and the complete-mode drain equals the batch histogram
    exactly; p50/p90/p99 are then read from the drained ≤50-row table
    as the first bin whose cumulative count reaches ⌈q·n⌉ — the answer
    is certified within one bin width, the bound the oracle replays in
    SQL. Streaming state is 50 rows regardless of stream length."""
    import uuid

    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    name = f"qtl_{uuid.uuid4().hex[:8]}"
    stream = se.stage_events_stream(spark, sf, "qtl")
    hist = stream.groupBy(
        F.least(
            F.floor(F.col("value") / F.lit(10.0)).cast("int"), F.lit(49)
        ).alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    se.run_to_memory(hist, name, output_mode="complete")
    h = spark.table(name)
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = h.agg(F.sum("cnt").cast("long").alias("n"))
    c = h.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
        F.broadcast(tot)
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("q")
    )
    hit = (
        qs.join(
            c,
            F.col("cum") >= F.ceil(F.col("q") * F.col("n")).cast("long"),
        )
        .groupBy("q")
        .agg(
            F.min("bin").cast("int").alias("bin"),
            F.max("n").alias("n"),
        )
    )
    return hit.select(
        "q",
        "bin",
        (F.col("bin") * 10).cast("long").alias("lo_value"),
        ((F.col("bin") + 1) * 10).cast("long").alias("hi_value"),
        "n",
    ).orderBy("q")


def q_streaming_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — CDC apply through foreachBatch: the q_cdc_merge change
    set arrives as a 2-micro-batch stream and each batch full-outer-merges
    (operators/join.py::merge_upsert) into a VERSIONED parquet state table
    (streaming/cdc_apply.py — write-new-then-swap, so readers always see a
    complete snapshot). Change keys are unique across the drain, so the
    final state is independent of how the stream was batched and equals
    the one-shot batch MERGE — exactly what the (q_cdc_merge) oracle
    checks."""
    import os
    import shutil

    from data_wrangle_openstreetmaps_data_spark.streaming.cdc_apply import (
        apply_cdc_stream,
    )

    snap = table(spark, sf, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
    )
    upd = snap.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("X").alias("status"),
        text.round4(F.col("totalprice") * 1.1).alias("totalprice"),
    )
    ins = snap.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "status",
        "totalprice",
    )
    changes = upd.unionByName(ins)

    work = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "..", ".tmp",
        f"cdcapply_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(work, ignore_errors=True)
    stage = os.path.join(work, "changes")
    changes.repartition(2).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    final_dir = apply_cdc_stream(spark, stream, snap, "o_orderkey", work)
    return spark.read.parquet(final_dir).select(
        "o_orderkey", "status", text.round4(F.col("totalprice")).alias("tp")
    )


def q_streaming_kmv(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — per-type KMV distinct estimates as KEYED STATE
    (streaming/kmv_stream.py): bounded k-long min-hash state per event
    type instead of the linear state an exact streaming COUNT(DISTINCT)
    would need. min-k merge is exact, so the drain's final emission
    equals the batch sketch — the oracle recomputes the estimate from
    scratch in DuckDB and matches it to 4dp."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se
    from data_wrangle_openstreetmaps_data_spark.streaming.kmv_stream import (
        kmv_stream,
    )

    name = f"kmv_{uuid.uuid4().hex[:8]}"
    stream = se.stage_events_stream(spark, sf, "kmv")
    se.run_to_memory(kmv_stream(stream), name, output_mode="update")
    return spark.table(name)


def q_streaming_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — the streaming-top-k pattern (A9's flagship shape made
    incremental): a global ORDER BY + LIMIT cannot be maintained in
    append mode, so the SUPPORTED decomposition is watermarked windowed
    counts streaming into a durable parquet store (each window lands
    once closed) + a trivial batch rollup ranking over the store. The
    oracle applies the same final-watermark cutoff and rollup."""
    import os
    import shutil

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    work = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "..", ".tmp",
        f"streamtopk_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(work, ignore_errors=True)
    wc = se.windowed_type_counts(
        se.stage_events_stream(spark, sf, "stopk"), "1 day", "1 day"
    )
    se.counts_to_store(
        wc, os.path.join(work, "store"), os.path.join(work, "ckpt")
    )
    return se.topk_over_store(spark, os.path.join(work, "store"), k=5)


def q_streaming_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — per-user EWMA recurrence under applyInPandasWithState
    (streaming/ewma.py): two numbers of state per user, O(1) per event.
    α=0.5 makes every weight an exact binary fraction and power-of-two
    scaling commutes with IEEE rounding, so the streamed recurrence
    equals the oracle's closed-form weighted sum bit for bit — the
    ESTIMATE is value-oracled, not rows-only. Update-mode drain emits
    the live (n, ewma) per user; the registry result is the final row
    per user (single-batch staging ⇒ exactly one)."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se
    from data_wrangle_openstreetmaps_data_spark.streaming.ewma import (
        ewma_stream,
    )

    name = f"ewma_{uuid.uuid4().hex[:8]}"
    se.run_to_memory(
        ewma_stream(se.stage_events_stream(spark, sf, "ewma")),
        name,
        output_mode="update",
    )
    t = spark.table(name)
    return t.select(
        "user_id", "n", text.round4(F.col("ewma")).alias("ewma")
    )


def q_streaming_dedup_native(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming — NATIVE watermark-evicted exact dedup
    (dropDuplicatesWithinWatermark, the Spark 3.5+ API whose state
    store evicts keys once the watermark passes them — bounded state
    for unbounded streams, unlike plain dropDuplicates). Dedup key: the
    planted pair key event_id div 2 (every key covers ≤2 events). The
    engine keeps an ARBITRARY first row per key within a micro-batch,
    so the projected output is the KEY ONLY — a deterministic set equal
    to batch DISTINCT — while the arbitrary-survivor semantics and
    cross-batch within-watermark drop are pinned in
    tests/test_streaming_dedup_native.py.

    DATA-DEPENDENCE of the oracle equivalence (r10 advice): the batch
    DISTINCT oracle holds only while no key's two events straddle a
    watermark-eviction boundary across micro-batches. The planted pairs
    (event_id div 2) are consecutive event ids, temporally adjacent in
    every testdata vintage so far (max intra-pair gap ≪ 1 hour); if a
    future vintage spreads pair members beyond the 1-hour watermark, the
    evicted key re-emits and this oracle flakes — widen the watermark
    past the corpus's max intra-pair gap, don't weaken the oracle."""
    import uuid

    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    name = f"ddwm_{uuid.uuid4().hex[:8]}"
    stream = se.stage_events_stream(spark, sf, "ddwm")
    deduped = (
        stream.withColumn("t", F.timestamp_micros(F.col("ts")))
        .withColumn("k", F.expr("event_id div 2"))
        .withWatermark("t", "1 hour")
        .dropDuplicatesWithinWatermark(["k"])
        .select("k")
    )
    se.run_to_memory(deduped, name)
    return spark.table(name)


ORACLES: dict[str, str | None] = {
    "q_streaming_dedup_native": """
        SELECT DISTINCT event_id // 2 AS k FROM events ORDER BY k
    """,
    # closed form of the recurrence e_i = 0.5*x_i + 0.5*e_{i-1} over the
    # user's time-ordered values: weight for 1-based position i is
    # 0.5^(n-i+1); list_sum folds left-to-right like the recurrence
    "q_streaming_ewma": """
        WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS tsn
                   FROM events),
        l AS (
          SELECT user_id,
                 list(value ORDER BY tsn, event_id) AS vals
          FROM e GROUP BY user_id
        )
        SELECT user_id, len(vals) AS n,
               floor(list_sum(list_transform(vals,
                 (x, i) -> x * 0.5 * pow(0.5, len(vals) - i)))
                 * 10000 + 0.5) / 10000 AS ewma
        FROM l
    """,
    # inner stream-stream join: single-batch availableNow drain emits
    # exactly the batch join (watermarks bound state, not inner-join
    # results); µs precision on both sides (normalized ts ≡ epoch_us)
    "q_stream_stream_join": """
        WITH e AS (SELECT *, epoch_us(ts) AS us FROM events)
        SELECT l.user_id, l.event_id AS l_event_id, r.event_id AS r_event_id,
               l.us AS l_us, r.us AS r_us
        FROM e l JOIN e r ON l.user_id = r.user_id
        WHERE l.event_type = 'purchase' AND r.event_type = 'signup'
          AND r.us <= l.us AND r.us >= l.us - CAST(604800000000 AS BIGINT)
    """,
    # the stream emits exactly the CLOSED sessions: every session except
    # each user's last (which stays open in state at end of input)
    "q_sessionize_stream": f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS tsn FROM events),
        flagged AS (
          SELECT user_id, tsn,
                 CASE WHEN tsn - lag(tsn) OVER (
                        PARTITION BY user_id ORDER BY tsn
                      ) > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS new_sess
          FROM e
        ),
        sess AS (
          SELECT user_id, tsn,
                 sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY tsn
                   ROWS UNBOUNDED PRECEDING
                 ) AS sess_id
          FROM flagged
        ),
        s AS (
          SELECT user_id, min(tsn) AS session_start, max(tsn) AS session_end,
                 count(*) AS n_events
          FROM sess GROUP BY user_id, sess_id
        )
        SELECT user_id, session_start, session_end, n_events FROM (
          SELECT *, max(session_start) OVER (PARTITION BY user_id) AS last_start
          FROM s
        ) WHERE session_start < last_start
    """,
    # stateless inner join: emission independent of micro-batching
    "q_stream_static_join": """
        SELECT e.event_id, e.user_id, n.n_name
        FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    """,
    # complete-mode final emission ≡ batch GROUP BY over the whole corpus
    "q_streaming_user_activity": """
        SELECT user_id, count(*) AS n_events,
               max(epoch_us(ts)) AS last_ts,
               max(value) AS max_value
        FROM events GROUP BY user_id
    """,
    # advance-closed sessions PLUS finals past the final watermark:
    # (end+gap) ms-floored strictly below (max event time ms-floored −
    # delay) — the engine's millisecond timeout arithmetic, exactly
    "q_sessionize_stream_watermarked": f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS tsn FROM events),
        flagged AS (
          SELECT user_id, tsn,
                 CASE WHEN tsn - lag(tsn) OVER (
                        PARTITION BY user_id ORDER BY tsn
                      ) > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS new_sess
          FROM e
        ),
        sess AS (
          SELECT user_id, tsn,
                 sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY tsn
                   ROWS UNBOUNDED PRECEDING
                 ) AS sess_id
          FROM flagged
        ),
        s AS (
          SELECT user_id, min(tsn) AS session_start, max(tsn) AS session_end,
                 count(*) AS n_events
          FROM sess GROUP BY user_id, sess_id
        ),
        m AS (SELECT max(tsn) // 1000 - {_WM_US // 1000} AS wm_ms FROM e)
        SELECT user_id, session_start, session_end, n_events FROM (
          SELECT s.*, m.wm_ms,
                 max(session_start) OVER (PARTITION BY user_id) AS last_start
          FROM s, m
        ) WHERE session_start < last_start
           OR (session_end + {_SESSION_GAP_US}) // 1000 < wm_ms
    """,
    # availableNow drain is deterministic: emitted windows are exactly the
    # ones closed by the final watermark (we <= max(ts) - 1 day)
    # native session_window append emission, engine-exact: a session is
    # emitted iff its µs-precise close point (last event + gap) is <=
    # the final watermark, which is the MS-FLOORED max event time minus
    # the delay (left side NOT floored; both boundary behaviors pinned
    # by tests/test_sessionize.py::test_native_session_window_boundaries).
    # Islands use the >= boundary (session windows are end-exclusive:
    # an event exactly at last+gap starts a NEW session).
    "q_sessionize_stream_native": f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS tsn FROM events),
        flagged AS (
          SELECT user_id, tsn,
                 CASE WHEN tsn - lag(tsn) OVER (
                        PARTITION BY user_id ORDER BY tsn
                      ) >= {_SESSION_GAP_US} THEN 1 ELSE 0 END AS new_sess
          FROM e
        ),
        sess AS (
          SELECT user_id, tsn,
                 sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY tsn
                   ROWS UNBOUNDED PRECEDING
                 ) AS sess_id
          FROM flagged
        ),
        s AS (
          SELECT user_id, min(tsn) AS session_start,
                 max(tsn) AS session_end, count(*) AS n_events
          FROM sess GROUP BY user_id, sess_id
        ),
        m AS (SELECT max(tsn) AS mx FROM e)
        SELECT user_id, session_start, session_end, n_events
        FROM s, m
        WHERE session_end + {_SESSION_GAP_US}
              <= (mx // 1000 - {_WM_US // 1000}) * 1000
    """,
    "q_streaming_windowed_counts": """
        WITH m AS (SELECT max(ts) - INTERVAL 1 DAY AS wm FROM events)
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS ws,
               strftime(date_trunc('day', ts) + INTERVAL 1 DAY,
                        '%Y-%m-%d %H:%M:%S') AS we,
               event_type, count(*) AS cnt
        FROM events, m
        WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= wm
        GROUP BY 1, 2, 3
    """,
    "q_streaming_hopping_counts": """
        WITH m AS (SELECT max(ts) - INTERVAL 1 DAY AS wm FROM events),
        ev AS (
          SELECT date_trunc('day', ts) AS d1, event_type FROM events
        ),
        assign AS (
          SELECT event_type,
                 unnest([d1, d1 - INTERVAL 1 DAY]) AS ws
          FROM ev
        )
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws,
               strftime(ws + INTERVAL 2 DAY, '%Y-%m-%d %H:%M:%S') AS we,
               event_type, count(*) AS cnt
        FROM assign, m
        WHERE ws + INTERVAL 2 DAY <= wm
        GROUP BY 1, 2, 3
    """,
    "q_streaming_bitmap": """
        WITH per_user AS (
          SELECT user_id,
                 bit_or(1::BIGINT <<
                   CAST(((epoch_us(ts) // 86400000000) % 7) * 4
                        + ((epoch_us(ts) // 3600000000) % 24) // 6
                        AS INT)) AS pattern
          FROM events GROUP BY user_id
        )
        SELECT pattern,
               CAST(bit_count(pattern) AS INT) AS n_slots,
               count(*) AS n_users
        FROM per_user GROUP BY pattern
        ORDER BY n_users DESC, pattern LIMIT 20
    """,
    "q_streaming_quantile": """
        WITH h AS (
          SELECT least(CAST(floor(value / 10.0) AS INT), 49) AS bin,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY bin
        ),
        c AS (
          SELECT bin, cnt,
                 sum(cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
                 (SELECT CAST(sum(cnt) AS BIGINT) FROM h) AS n
          FROM h
        ),
        qs AS (
          SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q
        )
        SELECT q, CAST(min(bin) AS INT) AS bin,
               CAST(min(bin) * 10 AS BIGINT) AS lo_value,
               CAST((min(bin) + 1) * 10 AS BIGINT) AS hi_value,
               CAST(max(n) AS BIGINT) AS n
        FROM qs JOIN c ON cum >= CAST(ceil(q * n) AS BIGINT)
        GROUP BY q ORDER BY q
    """,
    "q_streaming_cms": """
        WITH rows AS (SELECT unnest(generate_series(0, 3)) AS i)
        SELECT i AS cms_row,
               ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 64 AS bucket,
               count(*) AS cnt
        FROM events, rows
        GROUP BY 1, 2
    """,
    "q_streaming_cdc_apply": """
        WITH snap AS (
          SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS totalprice
          FROM orders
        ),
        upd AS (
          SELECT o_orderkey, 'X' AS status,
                 floor(totalprice * 1.1 * 10000 + 0.5) / 10000 AS totalprice
          FROM snap WHERE o_orderkey % 7 = 0
        ),
        ins AS (
          SELECT o_orderkey + 10000000 AS o_orderkey, status, totalprice
          FROM snap WHERE o_orderkey % 97 = 0
        ),
        chg AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        SELECT coalesce(c.o_orderkey, s.o_orderkey) AS o_orderkey,
               CASE WHEN c.o_orderkey IS NOT NULL THEN c.status
                    ELSE s.status END AS status,
               floor(CASE WHEN c.o_orderkey IS NOT NULL THEN c.totalprice
                          ELSE s.totalprice END * 10000 + 0.5) / 10000 AS tp
        FROM snap s FULL OUTER JOIN chg c ON s.o_orderkey = c.o_orderkey
    """,
    "q_streaming_kmv": """
        WITH u AS (
          SELECT DISTINCT event_type,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM events
        ),
        r AS (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM u
        )
        SELECT event_type, count(*) AS kc,
               floor((CASE WHEN count(*) >= 64
                      THEN 63.0 / (max(h) / 1152921504606846976.0)
                      ELSE CAST(count(*) AS DOUBLE) END)
                     * 10000 + 0.5) / 10000 AS kmv_est
        FROM r WHERE rn <= 64
        GROUP BY event_type
    """,
    "q_streaming_topk": """
        WITH m AS (SELECT max(ts) - INTERVAL 1 DAY AS wm FROM events),
        w AS (
          SELECT date_trunc('day', ts) AS ws, event_type, count(*) AS cnt
          FROM events, m
          WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= wm
          GROUP BY 1, 2
        )
        SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total
        FROM w GROUP BY event_type
        ORDER BY total DESC, event_type LIMIT 5
    """,
}
