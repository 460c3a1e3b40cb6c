"""Min/max-stats data skipping: a cluster-partitioned parquet layout
plus a per-block stats manifest, and a read path that prunes blocks by
manifest overlap before the scan — the Delta/Iceberg file-skipping
pattern expressed with plain parquet + a stats table.

Parquet footers already carry per-file min/max, but Spark's scan only
uses them per-row-group AFTER opening each file; a manifest lets the
reader drop whole files (at 100 TB: whole S3 prefixes) from the file
listing itself. The manifest is |blocks| rows — the collect in
``read_pruned`` is a bounded file-count-scale driver action, exactly
like Delta's driver-side file pruning, never row-scale data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame, path: str, cluster_col: str, width: float
) -> None:
    """Write ``df`` range-clustered on ``cluster_col`` into fixed-width
    block partitions (block = floor(value / width) — a pure function of
    the row, so the layout is deterministic and two writers agree;
    never ``repartitionByRange``'s sampled boundaries)."""
    blk = F.floor(F.col(cluster_col) / F.lit(width)).cast("long")
    df.withColumn("blk", blk).write.mode("overwrite").partitionBy(
        "blk"
    ).parquet(path)


def manifest(spark: SparkSession, path: str, cluster_col: str) -> DataFrame:
    """Per-block stats manifest of a clustered store: (blk, mn, mx,
    n_rows) computed from the PHYSICAL files, so the stats describe
    what a reader would actually scan. One pruned-column scan + one
    tiny aggregate; at write time you'd fold this into the commit."""
    d = spark.read.parquet(path)
    return d.groupBy("blk").agg(
        F.min(cluster_col).alias("mn"),
        F.max(cluster_col).alias("mx"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def read_pruned(
    spark: SparkSession,
    path: str,
    man: DataFrame,
    cluster_col: str,
    lo: float,
    hi: float,
) -> tuple[DataFrame, int, int]:
    """Range query [lo, hi) answered through the manifest: blocks whose
    [mn, mx] misses the range never enter the scan's file listing (the
    ``blk`` IN-list is a partition filter → directory-level pruning),
    and the exact predicate re-applies on the survivors. Returns
    (rows, blocks_scanned, blocks_total)."""
    stats = [
        (r["blk"], r["mx"] >= lo and r["mn"] < hi)
        for r in man.select("blk", "mn", "mx").collect()
    ]
    keep = [b for b, hit in stats if hit]
    rows = (
        spark.read.parquet(path)
        .filter(F.col("blk").isin(keep))
        .filter((F.col(cluster_col) >= lo) & (F.col(cluster_col) < hi))
    )
    return rows, len(keep), len(stats)
