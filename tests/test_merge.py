"""merge_upsert (MERGE INTO semantics) unit tests: matched rows replaced
wholesale — including legitimate NULLs in the change row — unmatched
changes insert, untouched snapshot rows pass through."""

from __future__ import annotations

from data_wrangle_openstreetmaps_data_spark.operators.join import merge_upsert


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_upsert_update_insert_passthrough(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "s", "v"],
    )
    chg = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)],  # update k=2, insert k=4
        ["k", "s", "v"],
    )
    got = _rows(merge_upsert(snap, chg, "k"))
    assert got == [
        (1, "a", 10.0),
        (2, "B", 200.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
    ]


def test_merge_upsert_change_row_null_wins(spark):
    """A change row's NULL must overwrite the snapshot value (wholesale
    row replacement) — the per-column-coalesce anti-pattern would leak
    the old value through."""
    snap = spark.createDataFrame([(1, "old", 1.0)], ["k", "s", "v"])
    chg = spark.createDataFrame(
        [(1, None, 2.0)], schema="k bigint, s string, v double"
    )
    got = _rows(merge_upsert(snap, chg, "k"))
    assert got == [(1, None, 2.0)]


def test_merge_upsert_idempotent_on_same_change(spark):
    snap = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], ["k", "s", "v"])
    chg = spark.createDataFrame([(2, "B", 20.0)], ["k", "s", "v"])
    once = merge_upsert(snap, chg, "k")
    twice = merge_upsert(once, chg, "k")
    assert _rows(once) == _rows(twice)


def test_streaming_cdc_apply_versions_and_equivalence(spark, tmp_path):
    """apply_cdc_stream over a 3-file change stream must write one state
    version per non-empty micro-batch and end at exactly the batch
    merge_upsert result."""
    import os

    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_spark.operators.join import (
        merge_upsert,
    )
    from data_wrangle_openstreetmaps_data_spark.streaming.cdc_apply import (
        apply_cdc_stream,
    )

    base = spark.createDataFrame(
        [(k, "old", float(k)) for k in range(40)], ["k", "status", "v"]
    )
    changes = spark.createDataFrame(
        [(k, "new", k * 2.0) for k in range(0, 40, 3)]
        + [(100 + k, "ins", -1.0) for k in range(3)],
        ["k", "status", "v"],
    )
    work = str(tmp_path / "cdc")
    stage = os.path.join(work, "changes")
    changes.repartition(3).write.mode("overwrite").parquet(stage)
    n_files = len(
        [f for f in os.listdir(stage) if f.endswith(".parquet")]
    )
    assert n_files == 3
    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    final_dir = apply_cdc_stream(spark, stream, base, "k", work)
    # one version per non-empty micro-batch (3 files, roundrobin split →
    # all non-empty) plus v0
    versions = sorted(
        d for d in os.listdir(work) if d.startswith("v")
    )
    assert len(versions) >= 3, versions
    got = {
        (r["k"], r["status"], r["v"])
        for r in spark.read.parquet(final_dir).collect()
    }
    want = {
        (r["k"], r["status"], r["v"])
        for r in merge_upsert(base, changes, "k").collect()
    }
    assert got == want


def test_streaming_cdc_apply_retention_bounded(spark, tmp_path):
    """A many-batch drain must keep at most keep_last_n+1 version dirs
    on disk (retention prunes behind the current version) and still end
    at exactly the batch merge_upsert result."""
    import os

    from data_wrangle_openstreetmaps_data_spark.operators.join import (
        merge_upsert,
    )
    from data_wrangle_openstreetmaps_data_spark.streaming.cdc_apply import (
        apply_cdc_stream,
    )

    base = spark.createDataFrame(
        [(k, "old", float(k)) for k in range(64)], ["k", "status", "v"]
    )
    changes = spark.createDataFrame(
        [(k, "new", k * 2.0) for k in range(0, 64, 2)],
        ["k", "status", "v"],
    )
    work = str(tmp_path / "cdc_many")
    stage = os.path.join(work, "changes")
    changes.repartition(8).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    final_dir = apply_cdc_stream(
        spark, stream, base, "k", work, keep_last_n=2
    )
    versions = sorted(
        d
        for d in os.listdir(work)
        if d.startswith("v") and d[1:].isdigit()
    )
    assert len(versions) <= 3, versions  # current + keep_last_n
    assert os.path.basename(final_dir) in versions
    got = {
        (r["k"], r["status"], r["v"])
        for r in spark.read.parquet(final_dir).collect()
    }
    want = {
        (r["k"], r["status"], r["v"])
        for r in merge_upsert(base, changes, "k").collect()
    }
    assert got == want


def test_streaming_cdc_apply_workdir_reuse_resets(spark, tmp_path):
    """Re-running a drain with the SAME work_dir must not resume the old
    checkpoint against the freshly reset v0 (which silently skips every
    already-seen batch): the second run's final state must equal the
    batch merge again, not the untouched initial state."""
    import os

    from data_wrangle_openstreetmaps_data_spark.operators.join import (
        merge_upsert,
    )
    from data_wrangle_openstreetmaps_data_spark.streaming.cdc_apply import (
        apply_cdc_stream,
    )

    base = spark.createDataFrame(
        [(k, "old", float(k)) for k in range(20)], ["k", "status", "v"]
    )
    changes = spark.createDataFrame(
        [(k, "new", k * 10.0) for k in range(0, 20, 4)],
        ["k", "status", "v"],
    )
    work = str(tmp_path / "cdc_reuse")
    stage = os.path.join(work, "changes")
    changes.repartition(2).write.mode("overwrite").parquet(stage)

    def run():
        stream = (
            spark.readStream.schema(changes.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        return apply_cdc_stream(spark, stream, base, "k", work)

    want = {
        (r["k"], r["status"], r["v"])
        for r in merge_upsert(base, changes, "k").collect()
    }
    for _ in range(2):  # second run reuses work_dir
        final_dir = run()
        got = {
            (r["k"], r["status"], r["v"])
            for r in spark.read.parquet(final_dir).collect()
        }
        assert got == want
