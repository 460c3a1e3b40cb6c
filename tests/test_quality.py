"""Data-quality gate operator: violations actually get counted."""

from __future__ import annotations

from data_wrangle_openstreetmaps_data_spark.operators import quality


def test_quality_report_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, -5.0, None),   # range violation + null
            (2, 3.0, "b"),     # duplicate key
            (None, 200.0, "c"),  # null key + range violation
        ],
        ["k", "v", "s"],
    )
    report = quality.quality_report(
        df, non_null=["k", "s"], ranges={"v": (0.0, 100.0)}, unique="k"
    ).first()
    assert report["null_k"] == 1
    assert report["null_s"] == 1
    assert report["oob_v"] == 2
    assert report["n_rows"] == 4
    assert report["dup_keys_k"] == 1  # key 2 occurs twice


def test_referential_violations(spark):
    child = spark.createDataFrame([(1,), (2,), (99,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    orphans = quality.referential_violations(child, parent, "fk", "pk").collect()
    assert [r["fk"] for r in orphans] == [99]
