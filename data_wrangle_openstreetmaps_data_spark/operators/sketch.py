"""Sketch operators beyond KMV (which is `topk.bottom_k` + an estimate
expression): a count-min sketch built and probed relationally.

A CMS is just a (depth × width) counter table, and counter tables are
what a groupBy produces — so the build is one explode(d) + one hash
aggregate whose output is d·w rows, mergeable across batches by
summation (the property that matters at 100 TB: per-partition /
per-day sketches union and re-aggregate without touching raw data).
Hashes are the portable 60-bit md5 family, so estimates are
bit-reproducible in any engine — the oracle checks the ESTIMATES, not
just the shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
    portable_token_hash,
)


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build a count-min sketch over `item_col` occurrences: one
    Generate (×depth) + one hash aggregate → (row, bucket, cnt) with
    ≤ depth·width rows. Partial aggregation combines map-side, so the
    shuffle carries at most depth·width rows per input partition
    regardless of data volume. Two sketches merge by unionAll + re-sum
    on (row, bucket)."""
    item = F.col(item_col)
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("cms_row")
    return (
        df.select(item.alias("_item"), rows)
        .select(
            "cms_row",
            F.pmod(
                portable_token_hash(
                    F.concat(
                        F.col("cms_row").cast("string"),
                        F.lit(":"),
                        F.col("_item").cast("string"),
                    )
                ),
                F.lit(width),
            ).alias("bucket"),
        )
        .groupBy("cms_row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    items: DataFrame,
    cms: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-estimate each distinct item in `items`: explode the item
    into its depth probe coordinates, join the (broadcast) sketch, and
    take min(cnt) over the depth rows — the CMS upper-bound estimate.
    Missing (row,bucket) pairs mean a zero counter, coalesced in."""
    item = F.col(item_col)
    probes = (
        items.select(item.alias("_item"))
        .distinct()
        .select(
            "_item",
            F.explode(
                F.array(*[F.lit(i) for i in range(depth)])
            ).alias("cms_row"),
        )
        .select(
            "_item",
            "cms_row",
            F.pmod(
                portable_token_hash(
                    F.concat(
                        F.col("cms_row").cast("string"),
                        F.lit(":"),
                        F.col("_item").cast("string"),
                    )
                ),
                F.lit(width),
            ).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(cms), ["cms_row", "bucket"], "left")
        .groupBy(F.col("_item").alias(item_col))
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def bloom_bits(
    build: DataFrame,
    key_col: str,
    m: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Bloom filter BUILD as a relational sketch: the distinct set-bit
    positions (single column ``bit``) for the build side's keys, using
    k portable md5-derived hash functions over an m-bit universe. The
    result is ≤ m rows regardless of build size — broadcastable by
    construction, the manual form of Spark's runtime bloom filter
    (``spark.sql.optimizer.runtime.bloomFilter``), with a deterministic
    portable hash so an external engine builds the identical filter."""
    c = F.col(key_col).cast("string")
    return (
        build.select(
            F.explode(
                F.array(
                    *[
                        (
                            portable_token_hash(
                                F.concat(c, F.lit(f"#{j}"))
                            )
                            % m
                        ).alias("b")
                        for j in range(k)
                    ]
                )
            ).alias("bit")
        )
        .distinct()
    )


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bits: DataFrame,
    m: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Prune `probe` to rows whose key passes the bloom filter: all k
    hash bits present in `bits`. Membership is k successive broadcast
    LEFT SEMI joins against the ≤m-row bit set (one per hash function)
    — semi joins preserve probe row multiplicity (a groupBy-count gate
    would silently merge duplicate probe rows) and each is a build-once
    hash lookup; pruned-out rows never reach the expensive join this
    filter guards. False positives are possible by design (the guarded
    join re-checks); false negatives are not."""
    c = F.col(key_col).cast("string")
    small = F.broadcast(bits.withColumnRenamed("bit", "_b"))
    out = probe
    for j in range(k):
        bit_j = portable_token_hash(F.concat(c, F.lit(f"#{j}"))) % m
        out = out.join(small, bit_j == F.col("_b"), "left_semi")
    return out
