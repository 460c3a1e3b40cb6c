"""Top-k operators.

A9 (the reference flagship): Mongo pipeline
``$match → $group($sum:1) → $sort(count desc) → $limit k``
(openstreet_kolkata.py:629-652). Catalyst plans orderBy+limit as
``TakeOrderedAndProject`` — a per-partition partial top-k with a driver-side
merge of k·P candidates, never a full global sort. That is exactly the
plan shape you want at 100 TB: the shuffle carries only the grouped counts,
and the sort carries only k rows per partition.

EXT-K1: top-k *per group* via window ``row_number`` — the reference has no
window surface (SURVEY.md §2.6); this is the north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_group_count(
    df: DataFrame,
    group_col: str,
    k: int = 10,
    require_col: str | None = None,
) -> DataFrame:
    """filter($exists) → groupBy(count) → sort desc → limit k.

    The explicit ``group_col`` ascending tiebreak makes top-k membership
    deterministic under count ties (SURVEY.md §7)."""
    out = df
    if require_col is not None:
        out = out.filter(F.col(require_col).isNotNull())
    return (
        out.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col(group_col))
        .limit(k)
    )


def topk_per_group(
    df: DataFrame, part_col: str, value_col: str, k: int = 3
) -> DataFrame:
    """EXT-K1 — top-k values per group by frequency.

    One shuffle for the count, one for the window partition; at scale the
    window partitions by the (low-cardinality) group key so skew on a hot
    group is the thing to watch — AQE skew handling applies to the first
    shuffle, and k rows per group leave the window."""
    counted = df.groupBy(part_col, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(part_col).orderBy(F.desc("cnt"), F.col(value_col))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(part_col, value_col, "cnt", "rn")
    )
