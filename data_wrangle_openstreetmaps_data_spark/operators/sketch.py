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


def hll_registers(
    df: DataFrame, item_col: str, p: int = 8
) -> DataFrame:
    """HyperLogLog register table over ``item_col``: (bucket, m) with
    at most ``2**p`` rows. bucket = the hash's low ``p`` bits; m = the
    register value max(rho) where rho = #leading zeros of the remaining
    (60-p)-bit field + 1 (rho = 61-p for a zero field).

    Everything stays integer: rho is derived from ``length(bin(v))``
    (the bit length of the field), never floating log2, so the sketch —
    and therefore the estimate — is bit-reproducible in any engine with
    md5 + a binary-string function. max() is idempotent, so the build
    needs NO distinct pass (unlike KMV), and registers from per-day /
    per-partition builds merge by max(m) on bucket without touching raw
    data — one groupBy with map-side combine, shuffle ≤ 2**p rows per
    input partition."""
    w = 60 - p  # bits left after the bucket index
    h = portable_token_hash(F.col(item_col).cast("string"))
    v = F.shiftright(h, p)
    rho = F.when(v == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(v))
    )
    return (
        df.select(
            F.pmod(h, F.lit(1 << p)).alias("bucket"), rho.alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_registers_by(
    df: DataFrame, group_col: str, item_col: str, p: int = 8
) -> DataFrame:
    """Per-group HLL register tables: (grp, bucket, m), at most ``2**p``
    rows per group. Same integer-only rho derivation as
    :func:`hll_registers`; the point of the grouped form is MERGE —
    ``max(m)`` over groups on bucket reproduces the registers a direct
    build over the union would produce (max is associative/idempotent),
    which is what lets 100 TB of per-partition/per-day sketches roll up
    without touching raw data."""
    w = 60 - p
    h = portable_token_hash(F.col(item_col).cast("string"))
    v = F.shiftright(h, p)
    rho = F.when(v == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(v))
    )
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.pmod(h, F.lit(1 << p)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_estimate_by(registers: DataFrame, p: int = 8) -> DataFrame:
    """Fold per-group HLL register tables (grp, bucket, m) into one
    estimate row per group — identical exact-bigint harmonic fold and
    linear-counting dispatch as :func:`hll_estimate`."""
    m_regs = 1 << p
    scale = 61 - p
    folded = registers.groupBy("grp").agg(
        (
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {scale} - m)"))
            + (F.lit(m_regs) - F.count(F.lit(1)))
            * F.lit(1 << scale).cast("long")
        ).alias("s"),
        (F.lit(m_regs) - F.count(F.lit(1))).alias("n_zero_regs"),
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m_regs)))
    raw = (
        alpha
        * F.lit(float(m_regs) * float(m_regs))
        * F.lit(float(1 << scale))
        / F.col("s").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m_regs)) & (F.col("n_zero_regs") > 0),
        F.lit(float(m_regs))
        * F.log(F.lit(float(m_regs)) / F.col("n_zero_regs").cast("double")),
    ).otherwise(raw)
    return folded.select("grp", est.alias("est"), "n_zero_regs")


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Fold an HLL register table into the cardinality estimate
    (columns: est double, n_zero_regs long). The harmonic-mean term
    sum(2^-m) is accumulated as an EXACT integer — sum of
    ``2^(SCALE-m)`` bigints (SCALE = 61-p = the max register value), so
    no float summation order can perturb it; the only floating steps
    are one literal-constant alpha expression and one division, both
    IEEE-identical cross-engine. Empty registers contribute m=0
    (2^SCALE each) and drive the linear-counting small-range correction
    E = m_regs * ln(m_regs / V) when E <= 2.5*m_regs and V > 0
    (Flajolet et al. 2007)."""
    m_regs = 1 << p
    scale = 61 - p  # register values m ∈ [1, scale]
    folded = registers.agg(
        (
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {scale} - m)"))
            + (F.lit(m_regs) - F.count(F.lit(1)))
            * F.lit(1 << scale).cast("long")
        ).alias("s"),
        (F.lit(m_regs) - F.count(F.lit(1))).alias("n_zero_regs"),
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m_regs)))
    raw = (
        alpha
        * F.lit(float(m_regs) * float(m_regs))
        * F.lit(float(1 << scale))
        / F.col("s").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m_regs)) & (F.col("n_zero_regs") > 0),
        F.lit(float(m_regs))
        * F.log(F.lit(float(m_regs)) / F.col("n_zero_regs").cast("double")),
    ).otherwise(raw)
    return folded.select(est.alias("est"), "n_zero_regs")
