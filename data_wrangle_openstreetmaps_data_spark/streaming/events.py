"""Streaming operators over the events table.

Design points for a real cluster:
- file source with ``maxFilesPerTrigger`` for bounded micro-batches;
  at 100 TB you'd swap the source line for Kafka — the transformations
  are source-agnostic.
- watermarks bound state: the windowed counts drop state for windows
  older than the watermark, so state size is O(windows in flight), not
  O(stream length).
- the top-k query is NOT expressible incrementally with limits inside
  streaming; the supported pattern is windowed counts to a durable sink +
  batch top-k over the sink — ``counts_to_store`` + ``topk_over_store``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical NORMALIZED stream shape: ts is epoch-µs long. Raw testdata may
# store ts as TIMESTAMP(NANOS) (→ nanos-long) or TIMESTAMP_NTZ micros;
# ``read_events_stream`` infers the physical schema from the parquet footer
# and normalizes to this shape, so downstream stateful operators (gap
# constants, watermarks) are unit-safe by construction.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch-µs long (normalized)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path_glob: str,
                       max_files: int = 1) -> DataFrame:
    """File-source stream over events parquet files, ts normalized to
    epoch-µs long regardless of the files' physical timestamp encoding.

    File streams need a schema upfront; inferring it from a batch read of
    the same path (footer only — no data scan) keeps the stream adaptive
    to the testdata's timestamp vintage instead of hard-coding one."""
    from data_wrangle_openstreetmaps_data_spark.catalog import event_ts_us

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(path_glob).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path_glob)
    )
    return stream.withColumn("ts", event_ts_us(stream))


def with_event_time(df: DataFrame) -> DataFrame:
    """Attach a timestamp-typed ``event_time`` column (for windows and
    watermarks). Contract: ``ts`` is either NORMALIZED epoch-µs long (the
    ``read_events_stream`` shape — NOT raw nanos) or a timestamp column
    (a raw ``catalog.table`` read of the current testdata vintage)."""
    dt = dict(df.dtypes)["ts"]
    if dt == "bigint":
        return df.withColumn("event_time", F.timestamp_micros(F.col("ts")))
    return df.withColumn(
        "event_time", F.col("ts").cast("timestamp")
    )


def windowed_type_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Event-time windowed count per event_type with a watermark —
    the streaming analog of A1's group-count audit. Pass ``slide`` for
    hopping (overlapping) windows: each event then contributes to
    window/slide assignments, emitted by the same append-mode
    closed-window contract as the tumbling form."""
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", window, slide or window),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("ws"),
            F.col("window.end").alias("we"),
            "event_type",
            "cnt",
        )
    )


def streaming_user_counts(stream: DataFrame) -> DataFrame:
    """Running contribution count per user (A3 analog, complete mode)."""
    return stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    left_type: str = "purchase",
    right_type: str = "signup",
    within: str = "interval 7 days",
    watermark: str = "30 days",
) -> DataFrame:
    """Stream-stream inner join: each left event joined to the same user's
    right events that happened at-or-before it within `within`.

    Both sides carry watermarks so the join state is bounded: a right-side
    row can be dropped once the left watermark passes its time + interval
    (this is the state-cleanup contract that makes stream-stream joins
    viable over unbounded streams)."""
    l = (
        with_event_time(left.filter(F.col("event_type") == left_type))
        .withWatermark("event_time", watermark)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("l_event_id"),
            F.col("event_time").alias("l_time"),
        )
    )
    r = (
        with_event_time(right.filter(F.col("event_type") == right_type))
        .withWatermark("event_time", watermark)
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("event_id").alias("r_event_id"),
            F.col("event_time").alias("r_time"),
        )
    )
    return l.join(
        r,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_time") <= F.col("l_time"))
        & (F.col("r_time") >= F.col("l_time") - F.expr(within)),
    ).select("user_id", "l_event_id", "r_event_id", "l_time", "r_time")


def stream_static_join(stream: DataFrame, dim: DataFrame,
                       stream_key, dim_key) -> DataFrame:
    """Stream-static inner join: STATELESS — each micro-batch joins
    against the (broadcastable) static dimension with no watermark and no
    state store, the standard enrichment shape (stream of facts × slowly-
    changing dimension snapshot). At 100 TB the static side is a
    broadcast or a bucketed table; either way no streaming state grows."""
    return stream.join(F.broadcast(dim), stream_key == dim_key)


def user_activity_summary(stream: DataFrame) -> DataFrame:
    """Complete-mode running aggregate per user: event count, last event
    time (µs), max value — the live-dashboard shape. Unbounded keyed
    state is O(users); complete mode re-emits the full table per batch
    (use the windowed/append operators when the key space is unbounded)."""
    return stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_ts"),
        F.max("value").alias("max_value"),
    )


def counts_to_store(windowed: DataFrame, store_path: str,
                    checkpoint_path: str):
    """Stream the watermarked windowed counts into a parquet store
    (append mode: each window row lands once its watermark closes it).
    Drains available input then stops (availableNow)."""
    q = (
        windowed.writeStream.format("parquet")
        .option("path", store_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def topk_over_store(spark: SparkSession, store_path: str,
                    k: int = 10) -> DataFrame:
    """The batch half of the streaming top-k pattern: rank event types by
    total count over every closed window in the store."""
    store = spark.read.parquet(store_path)
    return (
        store.groupBy("event_type")
        .agg(F.sum("cnt").alias("total"))
        .orderBy(F.desc("total"), F.col("event_type"))
        .limit(k)
    )


def _stage_dir(sf_dir: str, table_name: str, prefix: str) -> str:
    """Copy one read-only sf parquet into a .tmp DIRECTORY (file stream
    sources require one) and return the directory path. Refreshes if the
    source changed (mtime/size), not only if missing."""
    import os
    import shutil

    stage = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "..", ".tmp", f"{prefix}_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    os.makedirs(stage, exist_ok=True)
    src = os.path.join(sf_dir, f"{table_name}.parquet")
    dst = os.path.join(stage, f"{table_name}.parquet")
    if (
        not os.path.exists(dst)
        or os.path.getmtime(dst) < os.path.getmtime(src)
        or os.path.getsize(dst) != os.path.getsize(src)
    ):
        shutil.copy(src, dst)
    return stage


def stage_events_stream(spark: SparkSession, sf_dir: str, prefix: str):
    """Events stream over a staged copy — shared by the streaming
    queries() entries."""
    return read_events_stream(spark, _stage_dir(sf_dir, "events", prefix))


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stage_documents_stream(spark: SparkSession, sf_dir: str, prefix: str):
    """Documents stream over a staged copy: ONE staged file +
    maxFilesPerTrigger=1 ⇒ the availableNow drain is a single
    micro-batch, which makes per-key first-occurrence semantics
    deterministic (= global min id per key)."""
    stage = _stage_dir(sf_dir, "documents", prefix)
    # infer from the footer (like read_events_stream) so a physical-type
    # change in the testdata can't silently break the declared schema
    return (
        spark.readStream.schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )


def run_to_memory(
    query_df: DataFrame, name: str, output_mode: str = "append"
):
    """Drain all available input into an in-memory table (test harness):
    availableNow processes everything then stops — deterministic."""
    q = (
        query_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
