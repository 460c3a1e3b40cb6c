"""Exactly-once streaming CDC (r8 verdict item 7b): kill the
foreachBatch drain mid-stream in BOTH crash windows — (1) after the
state parquet is written but before the manifest commit-swap, and
(2) after the commit-swap but before the checkpoint records the batch
— restart over the same work_dir, and prove the versioned-parquet
state converges to exactly the one-shot batch merge_upsert answer with
every micro-batch applied exactly once (version chain length == number
of non-empty micro-batches, no double-apply, no skipped batch)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.utils import StreamingQueryException

from data_wrangle_openstreetmaps_data_spark.operators.join import merge_upsert
from data_wrangle_openstreetmaps_data_spark.streaming.cdc_apply import (
    apply_cdc_stream_resumable,
)

N_FILES = 4


def _setup(spark, tmp_path):
    base = spark.createDataFrame(
        [(k, "old", float(k)) for k in range(60)], ["k", "status", "v"]
    )
    changes = spark.createDataFrame(
        [(k, "new", k * 2.0) for k in range(0, 60, 3)]
        + [(200 + k, "ins", -1.0) for k in range(8)],
        ["k", "status", "v"],
    )
    work = str(tmp_path / "cdc")
    stage = os.path.join(str(tmp_path), "changes")
    changes.repartition(N_FILES).write.mode("overwrite").parquet(stage)
    n = len([f for f in os.listdir(stage) if f.endswith(".parquet")])
    assert n == N_FILES
    want = {
        (r["k"], r["status"], r["v"])
        for r in merge_upsert(base, changes, "k").collect()
    }
    return base, changes, work, stage, want


def _stream(spark, changes, stage):
    return (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )


def _manifest(work):
    with open(os.path.join(work, "MANIFEST.json")) as fh:
        return json.load(fh)


def _state(spark, final_dir):
    return {
        (r["k"], r["status"], r["v"])
        for r in spark.read.parquet(final_dir).collect()
    }


def test_crash_between_state_write_and_commit_then_resume(spark, tmp_path):
    """Worst-case window: v{n+1} parquet is on disk but uncommitted when
    the drain dies. The restart must re-merge the replayed epoch from
    the committed v{n} (overwriting the orphan), and the final state
    must equal the batch answer with version == non-empty batches."""
    base, changes, work, stage, want = _setup(spark, tmp_path)

    with pytest.raises(StreamingQueryException, match="injected crash"):
        apply_cdc_stream_resumable(
            spark,
            _stream(spark, changes, stage),
            base,
            "k",
            work,
            keep_last_n=N_FILES + 1,
            crash_after_state_write_epoch=2,
        )
    m = _manifest(work)
    assert m == {"version": 2, "epoch_id": 1}  # epochs 0,1 committed
    # the orphan uncommitted version IS on disk — the crash was real
    assert os.path.isdir(os.path.join(work, "v3"))

    final_dir = apply_cdc_stream_resumable(
        spark,
        _stream(spark, changes, stage),
        base,
        "k",
        work,
        keep_last_n=N_FILES + 1,
    )
    m = _manifest(work)
    # exactly one committed version per non-empty micro-batch: the
    # replayed epoch applied once, none skipped, none doubled
    assert m["version"] == N_FILES
    assert final_dir.endswith(f"v{N_FILES}")
    assert _state(spark, final_dir) == want


def test_crash_between_commit_and_checkpoint_then_resume(spark, tmp_path):
    """Other window: the manifest swap landed but the checkpoint never
    recorded the batch, so the restart REPLAYS an already-committed
    epoch. The epoch-id guard must skip it — a double-apply would grow
    the version chain past one-per-batch."""
    base, changes, work, stage, want = _setup(spark, tmp_path)

    with pytest.raises(StreamingQueryException, match="injected crash"):
        apply_cdc_stream_resumable(
            spark,
            _stream(spark, changes, stage),
            base,
            "k",
            work,
            keep_last_n=N_FILES + 1,
            crash_after_commit_epoch=1,
        )
    assert _manifest(work) == {"version": 2, "epoch_id": 1}

    final_dir = apply_cdc_stream_resumable(
        spark,
        _stream(spark, changes, stage),
        base,
        "k",
        work,
        keep_last_n=N_FILES + 1,
    )
    # replayed epoch 1 was skipped (already committed): version count is
    # still exactly one per non-empty micro-batch
    assert _manifest(work)["version"] == N_FILES
    assert _state(spark, final_dir) == want


def test_orphaned_manifest_without_checkpoint_refuses(spark, tmp_path):
    """A manifest with committed epochs whose paired checkpoint is gone
    must refuse to run: a fresh checkpoint restarts epoch ids at 0 and
    the dedup guard would silently skip real batches."""
    import shutil

    base, changes, work, stage, want = _setup(spark, tmp_path)
    final_dir = apply_cdc_stream_resumable(
        spark, _stream(spark, changes, stage), base, "k", work
    )
    assert _state(spark, final_dir) == want
    shutil.rmtree(os.path.join(work, "_checkpoint"))
    with pytest.raises(ValueError, match="paired checkpoint"):
        apply_cdc_stream_resumable(
            spark, _stream(spark, changes, stage), base, "k", work
        )


def test_uninterrupted_resumable_drain_matches_batch(spark, tmp_path):
    """No-crash control: the resumable protocol on a clean drain is
    byte-equivalent to the batch merge and commits one version per
    micro-batch."""
    base, changes, work, stage, want = _setup(spark, tmp_path)
    final_dir = apply_cdc_stream_resumable(
        spark, _stream(spark, changes, stage), base, "k", work
    )
    assert _manifest(work)["version"] == N_FILES
    assert _state(spark, final_dir) == want
    # retention held: at most keep_last_n+1 version dirs remain
    vdirs = [d for d in os.listdir(work) if d.startswith("v")]
    assert len(vdirs) <= 3
