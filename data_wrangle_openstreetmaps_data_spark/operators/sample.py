"""Sampling operators.

S3 — the reference writes every 10th top-level element to a sample file
(sample_elements, openstreet_kolkata.py:67-77). The deterministic analog
numbers rows by a stable key and keeps i % n == 0 (0-indexed like the
reference's ``enumerate``).

Scale note: the exact "every nth in total order" semantics are computed
WITHOUT a global-ORDER-BY window (a single-partition funnel): ``every_nth``
range-partitions on the order key, ranks within each block in parallel,
and adds broadcast cumulative block offsets — the same two-phase
blocked-prefix pattern as curation._blocked_prefix_sum. For sampling where
exact systematic spacing isn't required, ``probabilistic_sample`` (per-row
hash, no shuffle at all) is the cheaper path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _range_block_bounds(df: DataFrame, order_col: str, n_blocks: int) -> list:
    """Sampled block boundaries for ``order_col`` — what RangePartitioner
    does, but surfaced as plan LITERALS. spark_partition_id over
    ``repartitionByRange`` is NOT usable for blocked ranks: the range
    boundaries are re-sampled per evaluation (seed = rdd.id), so two
    consumers of the same frame can see different block ids. Literal
    boundaries make the block a pure function of the row — consistent
    across subtrees, AQE re-plans, and retries. Boundary skew only
    affects load balance, never correctness. Two bounded driver actions
    (a count and a ~200·n_blocks-value sample), like the documented
    scalar corpus sizes elsewhere."""
    total = df.count()
    if total == 0:
        return []
    frac = min(1.0, (n_blocks * 200) / total)
    vals = sorted(
        r[0]
        for r in df.select(order_col).sample(fraction=frac, seed=13).collect()
        if r[0] is not None
    )
    if not vals:
        return []
    step = max(1, len(vals) // n_blocks)
    return sorted(set(vals[step::step]))[: n_blocks - 1]


def every_nth(
    df: DataFrame, order_col: str, n: int = 10, blocks: int | None = None
) -> DataFrame:
    """Deterministic systematic sample: rows 0, n, 2n, … in order_col order.

    Two-phase blocked rank instead of a global-ORDER-BY window: rows are
    assigned an order-monotone block (count of sampled literal boundaries
    below the key — equal keys never split), ranked per block in parallel,
    and the global 0-indexed rank = per-block ``row_number`` + broadcast
    cumulative counts of earlier blocks. The only global window runs over
    #blocks rows (per-block totals), not #rows."""
    spark = df.sparkSession
    n_blocks = blocks or int(spark.conf.get("spark.sql.shuffle.partitions"))
    bounds = _range_block_bounds(df, order_col, n_blocks)
    c = F.col(order_col)
    blk = F.lit(0)
    for b in bounds:
        blk = blk + (c > F.lit(b)).cast("int")
    blocked = df.withColumn("_blk", F.when(c.isNull(), 0).otherwise(blk))
    w_in = Window.partitionBy("_blk").orderBy(order_col)
    within = blocked.withColumn("_i", F.row_number().over(w_in) - 1)
    totals = blocked.groupBy("_blk").agg(F.count(F.lit(1)).alias("_bt"))
    w_blk = Window.orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_blk", F.coalesce(F.sum("_bt").over(w_blk), F.lit(0)).alias("_off")
    )
    return (
        within.join(F.broadcast(offsets), "_blk")
        .filter((F.col("_i") + F.col("_off")) % n == 0)
        .drop("_blk", "_i", "_off")
    )


def probabilistic_sample(df: DataFrame, key_col: str, n: int = 10) -> DataFrame:
    """Scale path: keep rows whose stable key hashes into 1/n of the space.
    No shuffle, no global ordering, identical results on any cluster size."""
    return df.filter(F.pmod(F.xxhash64(F.col(key_col)), F.lit(n)) == 0)


def sample_per_group(
    df: DataFrame,
    n: int,
    strata_col: str,
    id_col: str,
) -> DataFrame:
    """Exact-n deterministic sample per stratum: rank rows inside each
    stratum by the portable md5 hash of their id (tie-broken by id) and
    keep the first n — a fixed-size stratified sample that is
    reproducible across runs, engines, and cluster sizes (no rand(), no
    reservoir state).

    One shuffle keyed by the stratum; the per-stratum sort is the cost.
    At 100 TB with huge strata, swap the full window sort for the
    two-phase top-n pattern (per-partition top-n, then merge — see
    operators/topk.py): the semantics stay identical because the ranking
    key is a pure function of the row."""
    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    if "_rk" in df.columns:
        raise ValueError("input already has a _rk column")
    h = portable_token_hash(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )
