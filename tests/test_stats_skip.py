"""Min/max-stats data skipping (sources/stats_skip.py): the manifest
prunes non-overlapping blocks, the pruned read matches a full filter
bit for bit, and the block IN-list lands in PartitionFilters (the scan
never lists pruned directories). Plus the record-linkage fixture
invariant: every planted typo pair is recovered at distance 1."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.sources import stats_skip

from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_pruned_read_matches_full_filter_and_skips_blocks(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], ["k", "val"]
    )
    path = str(tmp_path / "clustered")
    stats_skip.write_clustered(df, path, "val", 100.0)
    man = stats_skip.manifest(spark, path, "val")
    assert man.count() == 10
    rows, scanned, total = stats_skip.read_pruned(
        spark, path, man, "val", 250.0, 400.0
    )
    # blocks 2 and 3 overlap [250, 400); the other 8 never enter the scan
    assert (scanned, total) == (2, 10)
    got = sorted(r["k"] for r in rows.collect())
    assert got == list(range(250, 400))
    # the block list is a partition filter → directory-level pruning
    plan = _executed_plan(rows)
    assert "PartitionFilters" in plan and "blk" in plan


def test_manifest_stats_are_physical(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 95.0), (3, 150.0)], ["k", "val"]
    )
    path = str(tmp_path / "c2")
    stats_skip.write_clustered(df, path, "val", 100.0)
    man = {
        r["blk"]: (r["mn"], r["mx"], r["n_rows"])
        for r in stats_skip.manifest(spark, path, "val").collect()
    }
    assert man == {0: (5.0, 95.0, 2), 1: (150.0, 150.0, 1)}
    # a range entirely inside a gap of the stats prunes EVERY block
    # (block 1's mn=150 beats its nominal [100, 200) lower bound)
    _, scanned, total = stats_skip.read_pruned(
        spark, path, stats_skip.manifest(spark, path, "val"),
        "val", 100.0, 150.0,
    )
    assert (scanned, total) == (0, 2)


def test_record_linkage_recovers_planted_typos(spark):
    from data_wrangle_openstreetmaps_data_spark.plans import queries as Q

    got = {
        (r["rec_a"], r["rec_b"]): r["dist"]
        for r in Q.q_record_linkage(spark, SF_SMALL).collect()
    }
    n_cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").count()
    planted = [ck for ck in range(n_cust) if ck % 7 == 0]
    assert planted, "fixture assumption: some planted typos exist"
    for ck in planted:
        # the original ↔ its typo'd variant must match at distance 1
        assert got.get((2 * ck, 2 * ck + 1)) == 1, ck
