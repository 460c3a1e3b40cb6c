"""Count-min sketch invariants: estimates never undercount, and two
partial sketches merged by summation equal the sketch of the union —
the property that lets per-day/per-partition sketches roll up without
touching raw data."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
    cms_build,
    cms_estimate,
)


def _events(spark, n=400, users=37):
    rows = [(i, i % users) for i in range(n)]
    # plant one heavy hitter
    rows += [(n + i, 7) for i in range(60)]
    return spark.createDataFrame(rows, ["event_id", "user_id"])


def test_cms_never_undercounts(spark):
    df = _events(spark)
    cms = cms_build(df, "user_id", depth=4, width=16)
    est = cms_estimate(df, cms, "user_id", depth=4, width=16)
    exact = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    joined = exact.join(est, "user_id").collect()
    assert len(joined) == 37
    assert all(r["cms_est"] >= r["exact"] for r in joined), joined


def test_cms_merges_by_summation(spark):
    df = _events(spark)
    a = df.filter(F.col("event_id") % 2 == 0)
    b = df.filter(F.col("event_id") % 2 == 1)
    merged = (
        cms_build(a, "user_id", depth=4, width=16)
        .unionByName(cms_build(b, "user_id", depth=4, width=16))
        .groupBy("cms_row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(df, "user_id", depth=4, width=16)
    m = {(r["cms_row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    w = {(r["cms_row"], r["bucket"]): r["cnt"] for r in whole.collect()}
    assert m == w


def test_streaming_cms_multibatch_equals_batch(spark, tmp_path_factory):
    """cms_build over a 3-micro-batch stream (complete mode) must equal
    cms_build over the same data in batch — streaming sketch maintenance
    is just the running (row,bucket) count."""
    import os

    from data_wrangle_openstreetmaps_data_spark.catalog import table
    from data_wrangle_openstreetmaps_data_spark.streaming import events as se
    from tests.conftest import SF_SMALL

    d = str(tmp_path_factory.mktemp("cms_stream"))
    ev = table(spark, SF_SMALL, "events")
    # three files → three micro-batches under maxFilesPerTrigger=1
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"b{i}"))
    files = [
        os.path.join(d, f"b{i}", f)
        for i in range(3)
        for f in os.listdir(os.path.join(d, f"b{i}"))
        if f.endswith(".parquet")
    ]
    stage = os.path.join(d, "stage")
    os.makedirs(stage)
    for i, f in enumerate(files):
        os.rename(f, os.path.join(stage, f"part-{i}.parquet"))

    stream = se.read_events_stream(spark, stage)
    assert stream.isStreaming
    se.run_to_memory(
        cms_build(stream, "user_id", depth=4, width=16),
        "cms_stream_t",
        output_mode="complete",
    )
    got = {
        (r["cms_row"], r["bucket"]): r["cnt"]
        for r in spark.table("cms_stream_t").collect()
    }
    want = {
        (r["cms_row"], r["bucket"]): r["cnt"]
        for r in cms_build(ev, "user_id", depth=4, width=16).collect()
    }
    assert got == want and len(got) > 0
