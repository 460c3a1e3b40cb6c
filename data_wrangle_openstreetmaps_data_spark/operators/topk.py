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


def bottom_k(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    n_blocks: int = 64,
) -> DataFrame:
    """Smallest-k rows per group by ``order_col``, without a per-group
    single-partition sort: phase 1 ranks inside ``n_blocks`` hash blocks
    (each (group, block) window holds ~1/n_blocks of the group), phase 2
    re-ranks the surviving ≤ n_blocks·k candidates per group. Any global
    bottom-k row is bottom-k within its block, so the candidate union is
    a superset and the final rank is exact. Ties on ``order_col`` break
    on the remaining columns, so membership is deterministic.

    The KMV sketch primitive — and the scale-safe form of "min-k per
    key" generally (the same blocked-rank idea as the de-funneled
    ``every_nth`` sampler)."""
    tiebreak = [c for c in df.columns if c != order_col]
    block = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_blocks))
    w1 = Window.partitionBy(*(group_cols + ["__blk"])).orderBy(
        F.col(order_col), *[F.col(c) for c in tiebreak]
    )
    cand = (
        df.withColumn("__blk", block)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__blk", "__rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(
        F.col(order_col), *[F.col(c) for c in tiebreak]
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_blocks: int | None = None,
) -> DataFrame:
    """2-D Pareto frontier (skyline) maximizing both columns: keep the
    points no other point weakly dominates (x' ≥ x, y' ≥ y, one strict).
    Callers should pass DISTINCT points (one representative per (x, y))
    — under ties this keeps exactly one row per frontier point.

    The classic sequential algorithm (sort by x desc, keep rows whose y
    exceeds the running max) is a global-ORDER-BY window — a
    single-partition funnel at row scale. This is the blocked two-phase
    form (same pattern as ``bottom_k`` / ``every_nth``): driver-sampled
    LITERAL x-boundaries split rows into x-monotone blocks (equal x
    never splits, so cross-block always means strictly-greater x), each
    block computes its prefix max in parallel, and the cross-block
    running max is a broadcast window over #blocks rows. The only
    global window runs over block maxima, never over rows."""
    from data_wrangle_openstreetmaps_data_spark.operators.sample import (
        _range_block_bounds,
    )

    spark = df.sparkSession
    nb = n_blocks or int(spark.conf.get("spark.sql.shuffle.partitions"))
    bounds = _range_block_bounds(df, x_col, nb)
    x, y = F.col(x_col), F.col(y_col)
    blk = F.lit(0)
    for b in bounds:
        blk = blk + (x > F.lit(b)).cast("int")
    blocked = df.withColumn("_blk", blk)
    totals = blocked.groupBy("_blk").agg(F.max(y).alias("_bmax"))
    w_blk = Window.orderBy(F.desc("_blk")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cross = totals.select(
        "_blk", F.max("_bmax").over(w_blk).alias("_cross")
    )
    w_in = Window.partitionBy("_blk").orderBy(
        F.desc(x_col), F.desc(y_col)
    ).rowsBetween(Window.unboundedPreceding, -1)
    prefixed = blocked.join(F.broadcast(cross), "_blk").withColumn(
        "_p", F.greatest(F.max(y).over(w_in), F.col("_cross"))
    )
    return prefixed.filter(
        F.col("_p").isNull() | (y > F.col("_p"))
    ).drop("_blk", "_cross", "_p")
