"""Streaming CDC apply: ``foreachBatch`` + ``merge_upsert`` maintaining a
VERSIONED parquet state table from a change stream — the production shape
for a mutable table without a lakehouse format. Each micro-batch
full-outer-merges into the current state version and writes a complete
next-version directory (write-new-then-swap, a poor-man's transaction
log), so readers always see a consistent snapshot and a crashed batch
leaves the current version untouched.

At 100 TB the state table would be partitioned and the merge pruned to
changed partitions; the per-batch shape (one keyed full-outer join,
change rows win wholesale) is `operators/join.py::merge_upsert` —
identical semantics to the batch MERGE, which is what the oracle checks.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from data_wrangle_openstreetmaps_data_spark.operators.join import merge_upsert


def apply_cdc_stream(
    spark: SparkSession,
    change_stream: DataFrame,
    initial_state: DataFrame,
    key: str,
    work_dir: str,
    keep_last_n: int = 2,
) -> str:
    """Drain `change_stream` (availableNow) applying each micro-batch to
    the versioned state under `work_dir`; returns the FINAL version
    directory. Change keys must be unique across the drain for the final
    state to be batch-split-independent (CDC compaction upstream — e.g.
    q_latest_per_key — guarantees that).

    The drain and the state version always start together: (re)writing
    v0 resets the state, so any checkpoint or version directories left
    under `work_dir` by a previous drain are cleared on entry — an
    inherited checkpoint would resume past already-seen offsets against
    the fresh state and silently skip batches. Superseded versions are
    pruned after each swap, keeping `keep_last_n` behind the current
    one (bounded disk over an unbounded drain; the current version is
    never a prune target)."""
    # reset: stale checkpoint + stale v-dirs from a prior drain
    shutil.rmtree(os.path.join(work_dir, "_checkpoint"), ignore_errors=True)
    if os.path.isdir(work_dir):
        for d in os.listdir(work_dir):
            if re.fullmatch(r"v\d+", d):
                shutil.rmtree(os.path.join(work_dir, d), ignore_errors=True)
    v0 = os.path.join(work_dir, "v0")
    initial_state.write.mode("overwrite").parquet(v0)
    current = {"v": 0}

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        cur = os.path.join(work_dir, f"v{current['v']}")
        merged = merge_upsert(sess.read.parquet(cur), batch_df, key)
        nxt = os.path.join(work_dir, f"v{current['v'] + 1}")
        merged.write.mode("overwrite").parquet(nxt)
        current["v"] += 1
        # retention: drop versions older than current − keep_last_n
        for m in range(0, current["v"] - keep_last_n):
            shutil.rmtree(
                os.path.join(work_dir, f"v{m}"), ignore_errors=True
            )

    q = (
        change_stream.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation", os.path.join(work_dir, "_checkpoint")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return os.path.join(work_dir, f"v{current['v']}")
