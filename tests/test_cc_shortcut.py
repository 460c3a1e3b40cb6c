"""dup_clusters pointer jumping (round 9): a planted 3000-node PATH
component converges in O(log diameter) rounds with shortcut=True and
provably does NOT converge in 20 rounds with plain propagation — the
chain-shaped-component stall the shortcut removes at scale. Labels are
identical on ordinary (shallow) graphs either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.operators import dedup
from tests.conftest import SF_SMALL

N_PATH = 3000


def _path_pairs(spark):
    return (
        spark.range(N_PATH - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )


def test_path_converges_with_shortcut(spark):
    got = {
        (r["id"], r["cluster_id"])
        for r in dedup.dup_clusters(
            _path_pairs(spark), max_iters=20, shortcut=True,
            driver_cc_max=0,
        ).collect()
    }
    assert got == {(i, 0) for i in range(N_PATH)}


def test_path_stalls_without_shortcut(spark):
    """Plain min-label propagation moves the min ONE hop per round: 20
    rounds cannot label a 3000-node path, and strict mode must say so
    loudly instead of returning partial labels."""
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dup_clusters(
            _path_pairs(spark), max_iters=20, shortcut=False,
            driver_cc_max=0,
        ).collect()


def test_shortcut_identical_labels_on_real_pairs(spark):
    """On the real minhash pair set (shallow components) both modes
    produce byte-identical labels — shortcutting changes round count,
    never the answer."""
    pairs = dedup.dedup_minhash_lsh(
        table(spark, SF_SMALL, "documents"),
        n_hashes=16, bands=8, shingle_k=3, threshold=0.5,
    ).localCheckpoint(eager=True)
    a = sorted(
        (r["id"], r["cluster_id"])
        for r in dedup.dup_clusters(pairs, shortcut=True, driver_cc_max=0).collect()
    )
    b = sorted(
        (r["id"], r["cluster_id"])
        for r in dedup.dup_clusters(pairs, shortcut=False, driver_cc_max=0).collect()
    )
    assert a == b and len(a) > 0
