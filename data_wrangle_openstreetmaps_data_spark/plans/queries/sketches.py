"""Deterministic sketches: KMV distinct/set-ops/merge, count-min, co-occurrence.

Registry family module — split from the single-file registry; each
family defines its ``q_*`` callables plus the matching ``ORACLES``
entries, aggregated in ``__init__``."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark import catalog
from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.functions import text
from data_wrangle_openstreetmaps_data_spark.operators import (
    dedup,
    topk,
)

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403



def q_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — KMV (k-minimum-values) distinct sketch per event type, next
    to the exact count. Unlike HLL, KMV built on the portable 60-bit md5
    hash is bit-reproducible in any engine, so the ESTIMATE itself is
    oracle-checked. The min-k selection is the blocked two-phase rank
    (operators/topk.py::bottom_k) — no per-group single-partition sort —
    and groups with fewer than k members fall back to the exact count
    (the estimator is undefined there)."""
    from data_wrangle_openstreetmaps_data_spark.operators.topk import bottom_k

    ev = table(spark, sf, "events")
    ut = ev.select("event_type", "user_id").distinct()
    # dedup the HASHES too (not just the users): a 60-bit collision
    # between two users must contribute one min-k candidate, matching
    # the oracle's SELECT DISTINCT and the kmv_merge/stream variants
    h = ut.select(
        "event_type", _kmv_hash(F.col("user_id")).alias("h")
    ).distinct()
    kth = (
        bottom_k(h, ["event_type"], "h", _KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("hk"))
    )
    exact = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    est = F.when(
        F.col("exact_distinct") >= _KMV_K,
        F.lit(float(_KMV_K - 1)) / (F.col("hk") / F.lit(_KMV_NORM)),
    ).otherwise(F.col("exact_distinct").cast("double"))
    return (
        exact.join(F.broadcast(kth), "event_type")
        .select(
            "event_type", "exact_distinct", text.round4(est).alias("kmv_est")
        )
    )


def q_kmv_setops(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — KMV set-operation estimates between two daily user sets:
    union size from the union sketch's kth hash, Jaccard from the
    membership flags riding the min-k rows, intersection by
    inclusion-exclusion — all deterministic (portable hash, blocked
    min-k) and therefore value-oracled, alongside the exact answers.
    One aggregate builds per-user membership, so each user contributes
    ONE row to the sketch regardless of event count."""
    from data_wrangle_openstreetmaps_data_spark.operators.topk import bottom_k

    ev = table(spark, sf, "events")
    day = F.to_date(catalog.event_ts(ev))
    d1, d2 = "2024-01-05", "2024-01-06"
    members = (
        ev.select("user_id", day.alias("day"))
        .filter(F.col("day").isin(d1, d2))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("day") == d1, 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("day") == d2, 1).otherwise(0)).alias("in_b"),
        )
        .select(_kmv_hash(F.col("user_id")).alias("h"), "in_a", "in_b")
    )
    mink = bottom_k(members, [], "h", _KMV_K)
    sketch = mink.agg(
        F.max("h").alias("hk"),
        F.count(F.lit(1)).alias("kc"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("k_both"),
    )
    exact = members.agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("exact_inter"),
    )
    union_est = F.when(
        F.col("exact_union") >= _KMV_K,
        F.lit(float(_KMV_K - 1)) / (F.col("hk") / F.lit(_KMV_NORM)),
    ).otherwise(F.col("exact_union").cast("double"))
    jacc_est = F.col("k_both").cast("double") / F.col("kc")
    return sketch.crossJoin(F.broadcast(exact)).select(
        text.round4(union_est).alias("union_est"),
        text.round4(jacc_est).alias("jaccard_est"),
        text.round4(jacc_est * union_est).alias("inter_est"),
        "exact_union",
        "exact_inter",
        text.round4(
            F.col("exact_inter").cast("double") / F.col("exact_union")
        ).alias("exact_jaccard"),
    )


def q_cooccurrence_lift(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — market-basket co-occurrence with lift over event types per
    user: P(a,b)/(P(a)P(b)). The per-user distinct collapse bounds the
    self-join at |users|·|types| rows co-partitioned on the user key
    (one shuffle, reused by both sides); type marginals and the user
    count ride broadcasts. Counts stay integers inside doubles (< 2^53)
    so the lift ratio is exact cross-engine."""
    ev = table(spark, sf, "events")
    ut = ev.select("event_type", "user_id").distinct()
    n_users = ut.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    nt = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("nt"))
    a = ut.select(F.col("event_type").alias("t1"), "user_id")
    b = ut.select(F.col("event_type").alias("t2"), "user_id")
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = nt.select(F.col("event_type").alias("t1"), F.col("nt").alias("na"))
    nb = nt.select(F.col("event_type").alias("t2"), F.col("nt").alias("nb"))
    lift = (
        F.col("n_ab").cast("double")
        * F.col("n_users")
        / (F.col("na") * F.col("nb"))
    )
    return (
        pairs.join(F.broadcast(na), "t1")
        .join(F.broadcast(nb), "t2")
        .crossJoin(F.broadcast(n_users))
        .select("t1", "t2", "n_ab", text.round4(lift).alias("lift"))
    )


def q_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — count-min-sketch point estimates for the heaviest users,
    next to exact counts (est ≥ exact by construction; width 64 forces
    visible collisions, which is the point of the demo). The sketch is
    one Generate(×4)+aggregate whose shuffle carries ≤ depth·width rows
    per partition, mergeable across batches by summation; probes join
    the broadcast 256-row sketch. Portable md5 bucket hashes make the
    ESTIMATES cross-engine-reproducible, so the oracle checks them."""
    from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    ev = table(spark, sf, "events")
    cms = cms_build(ev, "user_id", depth=4, width=64)
    est = cms_estimate(ev, cms, "user_id", depth=4, width=64)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return (
        exact.join(est, "user_id")
        .select("user_id", "exact_cnt", "cms_est")
        .orderBy(F.desc("exact_cnt"), "user_id")
        .limit(10)
    )


def q_kmv_merge(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — KMV sketch MERGEABILITY, the property that matters at
    100 TB: per-day min-k sketches union into a monthly estimate without
    touching raw data, and min-k-of-min-ks equals the direct global
    min-k EXACTLY (any global survivor is a survivor within its day).
    The query emits the merged and direct estimates side by side — the
    oracle computes the direct path once and asserts both columns equal
    it — plus the exact distinct count."""
    from data_wrangle_openstreetmaps_data_spark.operators.topk import bottom_k

    ev = table(spark, sf, "events")
    day = F.to_date(catalog.event_ts(ev))
    uh = (
        ev.select(day.alias("day"), "user_id")
        .distinct()
        .select("day", _kmv_hash(F.col("user_id")).alias("h"))
    )
    daily = bottom_k(uh, ["day"], "h", _KMV_K)
    merged = bottom_k(daily.select("h").distinct(), [], "h", _KMV_K).agg(
        F.max("h").alias("m_hk"), F.count(F.lit(1)).alias("m_kc")
    )
    direct = bottom_k(uh.select("h").distinct(), [], "h", _KMV_K).agg(
        F.max("h").alias("d_hk"), F.count(F.lit(1)).alias("d_kc")
    )
    exact = ev.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )

    def _est(hk, kc):
        return F.when(
            kc >= _KMV_K,
            F.lit(float(_KMV_K - 1)) / (hk / F.lit(_KMV_NORM)),
        ).otherwise(kc.cast("double"))

    return (
        merged.crossJoin(F.broadcast(direct))
        .crossJoin(F.broadcast(exact))
        .select(
            text.round4(_est(F.col("m_hk"), F.col("m_kc"))).alias(
                "merged_est"
            ),
            text.round4(_est(F.col("d_hk"), F.col("d_kc"))).alias(
                "direct_est"
            ),
            "exact_distinct",
        )
    )


def q_bloom_prune_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — bloom-filter join pruning, the manual form of Spark's
    runtime bloom filter: the selective build side (high-balance
    customers) compiles to a ≤1024-row bit-position sketch
    (operators/sketch.py::bloom_bits), broadcast to prune orders via k
    semi-joins BEFORE the real join runs. Output accounts for the
    filter's exactness contract: bloom_pass ≥ true_match (false
    positives possible, false negatives impossible — the oracle builds
    the identical filter from the same portable 60-bit md5 hash, so
    even the false-positive COUNT matches exactly)."""
    from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
        bloom_bits,
        bloom_prune,
    )

    cust = (
        table(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    orders = table(spark, sf, "orders")
    bits = bloom_bits(cust, "c_custkey", m=1024, k=3)
    pruned = bloom_prune(orders, "o_custkey", bits, m=1024, k=3)
    # ONE pass over the pruned frame: bloom_pass and true_match come
    # from the same scan (no-false-negatives guarantees every true
    # match survives pruning, so counting matches post-prune equals
    # counting them on the full table — which is what the oracle does)
    flagged = pruned.join(
        F.broadcast(cust.withColumn("_m", F.lit(1))),
        pruned["o_custkey"] == cust["c_custkey"],
        "left",
    )
    counts = flagged.agg(
        F.count(F.lit(1)).alias("bloom_pass"),
        F.count("_m").alias("true_match"),
    )
    res = bits.agg(F.count(F.lit(1)).alias("bits_set")).crossJoin(
        F.broadcast(counts)
    )
    return res.select(
        "bits_set",
        "bloom_pass",
        "true_match",
        (F.col("bloom_pass") - F.col("true_match")).alias(
            "false_positives"
        ),
    )


def q_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — HyperLogLog distinct-count estimate (p=8, 256 registers)
    over event users, next to the exact count. The register build needs
    NO distinct pass (max is idempotent) — one groupBy(bucket) with
    map-side combine whose shuffle carries ≤256 rows per partition, and
    registers merge across days/partitions by max. rho comes from the
    hash field's BIT LENGTH (length(bin(v))), never floating log2, and
    the harmonic sum folds as an exact bigint, so the estimate — down to
    the linear-counting small-range branch — is bit-reproducible in any
    engine with md5 + bin (the HLL companion to the value-oracled
    KMV/CMS family). At 150 distinct users the small-range correction
    fires at this SF; larger SFs exercise the raw branch — both sides
    dispatch on the same condition."""
    from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    ev = table(spark, sf, "events")
    # The exact count needs the distinct-user set anyway, and the
    # register build is duplicate-insensitive (max of a per-user rho),
    # so build BOTH from one persisted distinct pass: one events scan
    # instead of two (r13; the no-distinct property of hll_registers
    # still holds for sketch-only callers — this query pays the
    # distinct regardless, for the exact side). Lazy persist, no eager
    # count: both consumers live in the ONE final action, which fills
    # the cache on first touch — an eager count() job measured as pure
    # overhead here.
    from pyspark.storagelevel import StorageLevel

    du = ev.select("user_id").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    est = hll_estimate(hll_registers(du, "user_id", p=8), p=8)
    exact = du.agg(F.count(F.lit(1)).alias("exact_distinct"))
    rel = (F.col("est") - F.col("exact_distinct")) / F.col(
        "exact_distinct"
    )
    return est.crossJoin(F.broadcast(exact)).select(
        text.round4(F.col("est")).alias("hll_est"),
        "n_zero_regs",
        "exact_distinct",
        text.round4(rel).alias("rel_err"),
    )


def q_bloom_fpr_eval(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — bloom-filter CALIBRATION: the measured false-positive rate
    of the q_bloom_prune_join filter against the occupancy prediction
    (bits_set/m)^k — the check that tells you whether m and k are sized
    for the build side before you trust the filter at 100 TB (a filter
    past ~50% fill stops pruning). Every number is an exact count over
    the identical portable-md5 filter, so even the FPR comparison is
    value-oracled; only the final two ratios are doubles."""
    from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
        bloom_bits,
        bloom_prune,
    )

    cust = (
        table(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    orders = table(spark, sf, "orders")
    bits = bloom_bits(cust, "c_custkey", m=1024, k=3)
    pruned = bloom_prune(orders, "o_custkey", bits, m=1024, k=3)
    flagged = pruned.join(
        F.broadcast(cust.withColumn("_m", F.lit(1))),
        pruned["o_custkey"] == cust["c_custkey"],
        "left",
    )
    counts = flagged.agg(
        F.count(F.lit(1)).alias("bloom_pass"),
        F.count("_m").alias("true_match"),
    )
    total = orders.agg(F.count(F.lit(1)).alias("n_probes"))
    res = (
        bits.agg(F.count(F.lit(1)).alias("bits_set"))
        .crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(total))
    )
    fp = F.col("bloom_pass") - F.col("true_match")
    nonmatch = F.col("n_probes") - F.col("true_match")
    fill = F.col("bits_set") / F.lit(1024.0)
    return res.select(
        "bits_set",
        text.round4(fill).alias("fill"),
        "n_probes",
        fp.alias("false_positives"),
        text.round4(fp / nonmatch).alias("measured_fpr"),
        text.round4(fill * fill * fill).alias("occupancy_fpr"),
    )


def q_hll_merge(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the HLL property that matters at 100 TB: MERGEABILITY.
    Per-event-type register tables (grp, bucket, max-rho) are folded to
    per-type estimates AND max-merged across types into one register
    table whose estimate equals a direct build over all rows (max is
    associative/idempotent — no raw-data re-scan to roll sketches up
    across days/partitions/tenants). Output: one row per type plus the
    '__all__' merged row, each next to its exact distinct. The register
    frame feeds both the per-type fold and the merge, so it is
    localCheckpointed (|types|·256 rows)."""
    from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
        hll_estimate,
        hll_estimate_by,
        hll_registers_by,
    )

    ev = table(spark, sf, "events")
    regs = hll_registers_by(ev, "event_type", "user_id", p=8)
    regs = regs.transform(_mat)  # two consumers, tiny frame
    per = hll_estimate_by(regs, p=8)
    merged = hll_estimate(
        regs.groupBy("bucket").agg(F.max("m").alias("m")), p=8
    ).select(F.lit("__all__").alias("grp"), "est", "n_zero_regs")
    exact_per = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    exact_all = ev.agg(
        F.countDistinct("user_id").alias("exact_distinct")
    ).select(F.lit("__all__").alias("grp"), "exact_distinct")
    exact = exact_per.unionByName(exact_all)
    rel = (F.col("est") - F.col("exact_distinct")) / F.col("exact_distinct")
    return (
        per.unionByName(merged)
        .join(exact, "grp")
        .select(
            "grp",
            text.round4(F.col("est")).alias("hll_est"),
            "n_zero_regs",
            "exact_distinct",
            text.round4(rel).alias("rel_err"),
        )
        .orderBy("grp")
    )


# per-group + merged HLL folds share this SQL skeleton (p=8 constants
# as in q_hll_distinct's oracle: 53-bit field, alpha·m²·2^53 literal)
_HLL_MERGE_SQL = """
    WITH h AS (
      SELECT event_type AS grp,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
    ),
    reg AS (
      SELECT grp, h % 256 AS bucket,
             max(CASE WHEN (h >> 8) = 0 THEN 53
                      ELSE 53 - length(bin(h >> 8)) END) AS m
      FROM h GROUP BY grp, bucket
    ),
    mreg AS (
      SELECT bucket, max(m) AS m FROM reg GROUP BY bucket
    ),
    folded AS (
      SELECT grp,
             (sum(1::BIGINT << (53 - m))
              + (256 - count(*)) * (1::BIGINT << 53))::BIGINT AS s,
             256 - count(*) AS n_zero_regs
      FROM reg GROUP BY grp
      UNION ALL
      SELECT '__all__',
             (sum(1::BIGINT << (53 - m))
              + (256 - count(*)) * (1::BIGINT << 53))::BIGINT,
             256 - count(*)
      FROM mreg
    ),
    est AS (
      SELECT grp,
             CASE
               WHEN 4.2399330249068963e+20 / CAST(s AS DOUBLE) <= 640.0
                    AND n_zero_regs > 0
               THEN 256.0 * ln(256.0 / CAST(n_zero_regs AS DOUBLE))
               ELSE 4.2399330249068963e+20 / CAST(s AS DOUBLE)
             END AS e,
             n_zero_regs
      FROM folded
    ),
    x AS (
      SELECT event_type AS grp, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
      UNION ALL
      SELECT '__all__', count(DISTINCT user_id) FROM events
    )
    SELECT grp,
           floor(e * 10000 + 0.5) / 10000 AS hll_est,
           n_zero_regs,
           exact_distinct,
           floor((e - exact_distinct) / exact_distinct * 10000 + 0.5)
             / 10000 AS rel_err
    FROM est JOIN x USING (grp)
    ORDER BY grp
"""


def q_hll_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — trailing-7-day distinct users per day from DAILY HLL
    register tables (p=8), the time-windowed form of q_hll_merge's
    mergeability story: at 100 TB you persist one 256-row register
    table per day and answer ANY trailing window by max-merging 7 of
    them — never re-scanning raw events. The merge is a bounded window
    (max over a 7-day RANGE frame per bucket, partitioned by bucket —
    |days|·256 grid rows, grows with the calendar, not the data rate),
    then the q_hll_distinct exact-bigint harmonic fold per day. The
    exact trailing distinct (7-way fan-out + dedup, the dau_wau
    pattern) rides along for the rel_err column."""
    from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
        hll_estimate_by,
        hll_registers_by,
    )

    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    base = ev.select(
        F.expr("tsn div 86400000000").alias("day"), "user_id"
    )
    regs = hll_registers_by(base, "day", "user_id", p=8).select(
        F.col("grp").alias("day"), "bucket", "m"
    )
    days = base.select("day").distinct()
    grid = days.crossJoin(
        spark.range(256).select(F.col("id").cast("int").alias("bucket"))
    )
    from pyspark.sql import Window

    w7 = (
        Window.partitionBy("bucket").orderBy("day").rangeBetween(-6, 0)
    )
    slid = (
        grid.join(regs, ["day", "bucket"], "left")
        .withColumn("msl", F.max("m").over(w7))
        .filter(F.col("msl").isNotNull())
        .select(F.col("day").alias("grp"), F.col("msl").alias("m"))
    )
    est = hll_estimate_by(slid, p=8).select(
        F.col("grp").alias("day"), "est", "n_zero_regs"
    )
    exact = (
        base.distinct()
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
            "day",
            "user_id",
        )
        .select((F.col("day") + F.col("off")).alias("day"), "user_id")
        .join(days, "day")  # anchor only at days that exist
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    rel = (F.col("est") - F.col("exact_distinct")) / F.col(
        "exact_distinct"
    )
    return (
        est.join(exact, "day")
        .select(
            "day",
            text.round4(F.col("est")).alias("hll_est"),
            "n_zero_regs",
            "exact_distinct",
            text.round4(rel).alias("rel_err"),
        )
        .orderBy("day")
    )


def q_quantile_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-SK — mergeable stride-sample quantile sketch with a VERIFIED
    rank-error bound: rows hash into 8 blocks (portable md5 — never
    ``spark_partition_id`` over range partitioning, the round-2
    nondeterminism lesson), each block keeps every 64th order statistic
    (rn % 64 == 1), the merged candidate set answers p50/p90/p99, and a
    second exact pass counts the TRUE rank of each estimate so the
    output certifies |true_rank − target_rank| ≤ stride·blocks. This is
    the classic distributed-quantile shape (GK/KLL's ancestor): the
    data-sized work is one block-partitioned window + one conditional
    count; only the n/64 candidates ever meet a global sort, and stride
    scales with n to keep that bounded. Values are exact cents so rank
    arithmetic is pure integers cross-engine."""
    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    STRIDE, BLOCKS = 64, 8
    o = table(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(20,6)") * 100)
        .cast("long")
        .alias("cents"),
    )
    o = o.withColumn(
        "blk",
        F.pmod(
            portable_token_hash(F.col("o_orderkey").cast("string")),
            F.lit(BLOCKS),
        ),
    )
    rn = F.row_number().over(
        Window.partitionBy("blk").orderBy("cents", "o_orderkey")
    )
    cand = o.withColumn("rn", rn).where(
        F.pmod(F.col("rn"), F.lit(STRIDE)) == 1
    )
    rc = F.row_number().over(Window.orderBy("cents", "o_orderkey"))
    cand = cand.select("cents", "o_orderkey").withColumn("rc", rc)
    nc = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    nr = o.agg(F.count(F.lit(1)).alias("n_rows"))
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias(
            "q"
        )
    )
    est = (
        qs.crossJoin(F.broadcast(nc))
        .join(
            cand,
            F.col("rc")
            == F.ceil(F.col("q") * F.col("n_cand")).cast("int"),
        )
        .select("q", F.col("cents").alias("est_cents"))
    )
    ranks = (
        o.crossJoin(F.broadcast(est))
        .groupBy("q", "est_cents")
        .agg(
            F.count(F.when(F.col("cents") <= F.col("est_cents"), 1))
            .cast("long")
            .alias("true_rank")
        )
    )
    return (
        ranks.crossJoin(F.broadcast(nr))
        .select(
            "q",
            "est_cents",
            "true_rank",
            F.ceil(F.col("q") * F.col("n_rows"))
            .cast("long")
            .alias("target_rank"),
            (
                F.abs(
                    F.col("true_rank")
                    - F.ceil(F.col("q") * F.col("n_rows"))
                )
                <= F.lit(STRIDE * BLOCKS)
            ).alias("within_bound"),
        )
        .orderBy("q")
    )


def q_quantile_sketch_grouped(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-SK — the GROUP BY form of q_quantile_sketch, the shape that
    proves the stride sample is MERGEABLE per key (a t-digest/KLL
    stand-in for 'p50 latency per service' dashboards at 100 TB): rows
    hash into 8 blocks WITHIN each order-priority, each (group, block)
    keeps every 64th order statistic, the merged per-group candidates
    answer the group median, and an exact second pass certifies
    |true_rank − target| ≤ stride·blocks PER GROUP. All windows
    partition on (group, blk) — group cardinality only ever widens the
    key space, never a single sort. Exact cents; integer ranks."""
    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    STRIDE, BLOCKS = 64, 8
    o = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(20,6)") * 100)
        .cast("long")
        .alias("cents"),
    )
    # o has THREE consumers (candidate windows, exact per-group counts,
    # certification rank pass) and each re-ran the scan + decimal cast
    # + per-row md5 block hash; cand's two-window pipeline has TWO
    # consumers (n_cand + the median pick). Lazy persists (r13): one
    # md5 pass and one window pass instead of three/two.
    from pyspark.storagelevel import StorageLevel

    o = o.withColumn(
        "blk",
        F.pmod(
            portable_token_hash(F.col("o_orderkey").cast("string")),
            F.lit(BLOCKS),
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    rn = F.row_number().over(
        Window.partitionBy("grp", "blk").orderBy("cents", "o_orderkey")
    )
    cand = o.withColumn("rn", rn).where(
        F.pmod(F.col("rn"), F.lit(STRIDE)) == 1
    )
    rc = F.row_number().over(
        Window.partitionBy("grp").orderBy("cents", "o_orderkey")
    )
    cand = (
        cand.select("grp", "cents", "o_orderkey")
        .withColumn("rc", rc)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nc = cand.groupBy("grp").agg(F.count(F.lit(1)).alias("n_cand"))
    nr = o.groupBy("grp").agg(F.count(F.lit(1)).alias("n_rows"))
    est = (
        cand.join(F.broadcast(nc), "grp")
        .filter(
            F.col("rc")
            == F.ceil(F.lit(0.5) * F.col("n_cand")).cast("int")
        )
        .select("grp", F.col("cents").alias("est_cents"))
    )
    ranks = (
        o.join(F.broadcast(est), "grp")
        .groupBy("grp", "est_cents")
        .agg(
            F.count(F.when(F.col("cents") <= F.col("est_cents"), 1))
            .cast("long")
            .alias("true_rank")
        )
    )
    return (
        ranks.join(F.broadcast(nr), "grp")
        .select(
            "grp",
            "n_rows",
            "est_cents",
            "true_rank",
            F.ceil(F.lit(0.5) * F.col("n_rows"))
            .cast("long")
            .alias("target_rank"),
            (
                F.abs(
                    F.col("true_rank")
                    - F.ceil(F.lit(0.5) * F.col("n_rows"))
                )
                <= F.lit(STRIDE * BLOCKS)
            ).alias("within_bound"),
        )
        .orderBy("grp")
    )


def q_sample_extrapolation(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-SK — approximate query processing with a SELF-CERTIFYING
    answer: a 1/16 deterministic hash sample of orders (portable md5 —
    repeatable across engines and runs, unlike TABLESAMPLE) scales up
    to estimated row count and revenue with a 95% binomial CI
    (half = 1.96·√(n_s·(1−p))/p), and the output carries the exact
    truth next to the estimate plus the within-CI verdict — the
    sampling-error contract an AQP layer must surface, here oracled so
    the arithmetic itself is verified. The sample is a pushed-down
    filter (scan-time, no shuffle); truth is one exact aggregate."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    P = 16
    o = table(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(20,6)") * 100)
        .cast("long")
        .alias("cents"),
    )
    h = F.pmod(
        portable_token_hash(F.col("o_orderkey").cast("string")),
        F.lit(P),
    )
    s = o.filter(h == 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.sum("cents").cast("long").alias("s_cents"),
    )
    t = o.agg(
        F.count(F.lit(1)).cast("long").alias("true_count"),
        F.sum("cents").cast("long").alias("true_cents"),
    )
    ns = F.col("n_sample").cast("double")
    half = F.lit(1.96) * F.sqrt(
        ns * F.lit(1.0 - 1.0 / P)
    ) * F.lit(float(P))
    est = ns * F.lit(float(P))
    return s.crossJoin(F.broadcast(t)).select(
        "n_sample",
        (F.col("n_sample") * P).cast("long").alias("est_count"),
        F.floor(est - half).cast("long").alias("ci_lo"),
        F.ceil(est + half).cast("long").alias("ci_hi"),
        "true_count",
        (
            (F.col("true_count") >= F.floor(est - half))
            & (F.col("true_count") <= F.ceil(est + half))
        ).alias("count_within_ci"),
        (F.col("s_cents") * P).cast("long").alias("est_cents"),
        "true_cents",
        text.round4(
            (F.col("s_cents") * P).cast("double")
            / F.col("true_cents").cast("double")
        ).alias("revenue_ratio"),
    )


def q_bloom_size_planner(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-SK — Bloom-filter sizing table (the planner consulted before
    q_bloom_prune_join builds anything): per ingest source, the exact
    distinct-document count n drives the closed forms
    m = ⌈−n·ln(p)/ln(2)²⌉ bits and k = ⌊m/n·ln2 + ½⌋ hashes at target
    fpr p = 0.01. Counts are exact; the ln constants fold identically
    on both engines; one rounding per output column. One distinct-count
    aggregate; |sources| output rows."""
    d = table(spark, sf, "documents")
    per = d.groupBy("source").agg(
        F.count_distinct("doc_id").cast("long").alias("n_keys")
    )
    nd = F.col("n_keys").cast("double")
    LN2SQ = 0.4804530139182014  # ln(2)^2, exact double literal
    LNP = -4.605170185988091  # ln(0.01)
    m = F.ceil(nd * F.lit(-LNP) / F.lit(LN2SQ)).cast("long")
    k = F.floor(
        m.cast("double") / nd * F.lit(0.6931471805599453) + F.lit(0.5)
    ).cast("int")
    return per.select(
        "source",
        "n_keys",
        m.alias("m_bits"),
        k.alias("k_hashes"),
        text.round4(m.cast("double") / nd).alias("bits_per_key"),
    ).orderBy("source")


def q_topk_mergeable(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — mergeable top-k heavy-hitter summary with DETERMINISTIC
    error bounds (the Misra-Gries/SpaceSaving merge law applied to
    exact shard tops): events are split into 8 shards (event_id % 8);
    each shard ships ONLY its exact top-5 users by event count plus
    err_s = the largest DROPPED count (0 if nothing dropped) — k rows
    + one scalar per shard is the whole mergeable-summary state, the
    contract that lets 1000 executors each summarize locally and merge
    at the driver-sized tail. Merged candidate bounds: lb = Σ kept
    counts, ub = lb + Σ err_s over shards where the candidate was NOT
    kept (a dropped or absent item's shard count is ≤ err_s by the
    top-k rank rule). The guarantee lb ≤ true ≤ ub is PROVED per row
    against the exact global recount (`contained` must be 1 — the
    recount is the audit, not the production path). Output: top 10
    candidates by ub (user tiebreak)."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    per = ev.groupBy(
        (F.col("event_id") % 8).alias("shard"), "user_id"
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), "user_id")
    ranked = _mat(  # 2 consumers: kept rows + per-shard err scalars
        per.withColumn("rk", F.row_number().over(w))
    )
    kept = ranked.filter(F.col("rk") <= 5)
    shard_err = ranked.groupBy("shard").agg(
        F.coalesce(
            F.max(F.when(F.col("rk") > 5, F.col("cnt"))), F.lit(0)
        ).alias("err")
    )
    err_all = shard_err.agg(F.sum("err").alias("err_all"))
    cand = (
        kept.join(shard_err, "shard")
        .groupBy("user_id")
        .agg(
            F.sum("cnt").alias("lb"),
            F.sum("err").alias("kept_err"),
        )
        .crossJoin(F.broadcast(err_all))  # 1-row scalar
        .select(
            "user_id",
            "lb",
            (F.col("lb") + F.col("err_all") - F.col("kept_err")).alias(
                "ub"
            ),
        )
    )
    true_cnt = ev.groupBy("user_id").agg(F.count("*").alias("true_cnt"))
    return (
        true_cnt.join(F.broadcast(cand), "user_id")
        .select(
            "user_id",
            "lb",
            "ub",
            "true_cnt",
            F.when(
                (F.col("lb") <= F.col("true_cnt"))
                & (F.col("true_cnt") <= F.col("ub")),
                1,
            )
            .otherwise(0)
            .alias("contained"),
        )
        .orderBy(F.desc("ub"), "user_id")
        .limit(10)
    )


ORACLES: dict[str, str | None] = {
    "q_topk_mergeable": """
        WITH per AS (
          SELECT event_id % 8 AS shard, user_id, count(*) AS cnt
          FROM events GROUP BY 1, 2
        ),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY shard ORDER BY cnt DESC, user_id) AS rk
          FROM per
        ),
        shard_err AS (
          SELECT shard,
                 CAST(coalesce(max(CASE WHEN rk > 5 THEN cnt END), 0)
                      AS BIGINT) AS err
          FROM ranked GROUP BY 1
        ),
        cand AS (
          SELECT k.user_id,
                 CAST(sum(k.cnt) AS BIGINT) AS lb,
                 CAST(sum(k.cnt) AS BIGINT)
                   + (SELECT CAST(sum(err) AS BIGINT) FROM shard_err)
                   - CAST(sum(e.err) AS BIGINT) AS ub
          FROM ranked k JOIN shard_err e ON e.shard = k.shard
          WHERE k.rk <= 5
          GROUP BY 1
        )
        SELECT t.user_id, c.lb, c.ub, t.true_cnt,
               CAST(CASE WHEN c.lb <= t.true_cnt
                          AND t.true_cnt <= c.ub
                    THEN 1 ELSE 0 END AS INTEGER) AS contained
        FROM (SELECT user_id, count(*) AS true_cnt
              FROM events GROUP BY 1) t
        JOIN cand c USING (user_id)
        ORDER BY c.ub DESC, t.user_id
        LIMIT 10
    """,
    "q_bloom_size_planner": """
        WITH per AS (
          SELECT source,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS n_keys
          FROM documents GROUP BY source
        ),
        m AS (
          SELECT source, n_keys,
                 CAST(ceil(CAST(n_keys AS DOUBLE) * 4.605170185988091
                           / 0.4804530139182014) AS BIGINT) AS m_bits
          FROM per
        )
        SELECT source, n_keys, m_bits,
               CAST(floor(CAST(m_bits AS DOUBLE)
                          / CAST(n_keys AS DOUBLE)
                          * 0.6931471805599453 + 0.5) AS INT) AS k_hashes,
               floor(CAST(m_bits AS DOUBLE) / CAST(n_keys AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS bits_per_key
        FROM m ORDER BY source
    """,
    "q_sample_extrapolation": """
        WITH o AS (
          SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 100
                      AS BIGINT) AS cents,
                 ((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                   1, 15))::BIGINT % 16) + 16) % 16 AS h
          FROM orders
        ),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n_sample,
                 CAST(sum(cents) AS BIGINT) AS s_cents
          FROM o WHERE h = 0
        ),
        t AS (
          SELECT CAST(count(*) AS BIGINT) AS true_count,
                 CAST(sum(cents) AS BIGINT) AS true_cents
          FROM o
        )
        SELECT n_sample,
               CAST(n_sample * 16 AS BIGINT) AS est_count,
               CAST(floor(CAST(n_sample AS DOUBLE) * 16.0
                          - 1.96 * sqrt(CAST(n_sample AS DOUBLE)
                                        * 0.9375) * 16.0) AS BIGINT)
                 AS ci_lo,
               CAST(ceil(CAST(n_sample AS DOUBLE) * 16.0
                         + 1.96 * sqrt(CAST(n_sample AS DOUBLE)
                                       * 0.9375) * 16.0) AS BIGINT)
                 AS ci_hi,
               true_count,
               true_count >= CAST(floor(CAST(n_sample AS DOUBLE) * 16.0
                          - 1.96 * sqrt(CAST(n_sample AS DOUBLE)
                                        * 0.9375) * 16.0) AS BIGINT)
               AND true_count <= CAST(ceil(CAST(n_sample AS DOUBLE) * 16.0
                         + 1.96 * sqrt(CAST(n_sample AS DOUBLE)
                                       * 0.9375) * 16.0) AS BIGINT)
                 AS count_within_ci,
               CAST(s_cents * 16 AS BIGINT) AS est_cents,
               true_cents,
               floor(CAST(s_cents * 16 AS DOUBLE)
                     / CAST(true_cents AS DOUBLE) * 10000 + 0.5) / 10000
                 AS revenue_ratio
        FROM s, t
    """,
    "q_quantile_sketch_grouped": """
        WITH o AS (
          SELECT o_orderpriority AS grp, o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 100
                      AS BIGINT) AS cents,
                 ((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                   1, 15))::BIGINT % 8) + 8) % 8 AS blk
          FROM orders
        ),
        w AS (
          SELECT grp, cents, o_orderkey,
                 row_number() OVER (
                   PARTITION BY grp, blk ORDER BY cents, o_orderkey
                 ) AS rn
          FROM o
        ),
        cand AS (
          SELECT grp, cents, o_orderkey,
                 row_number() OVER (
                   PARTITION BY grp ORDER BY cents, o_orderkey
                 ) AS rc
          FROM w WHERE rn % 64 = 1
        ),
        nc AS (SELECT grp, count(*) AS n_cand FROM cand GROUP BY grp),
        nr AS (SELECT grp, count(*) AS n_rows FROM o GROUP BY grp),
        est AS (
          SELECT cand.grp, cents AS est_cents
          FROM cand JOIN nc ON cand.grp = nc.grp
          WHERE rc = CAST(ceil(0.5 * n_cand) AS INT)
        ),
        ranks AS (
          SELECT o.grp, est_cents,
                 count(CASE WHEN o.cents <= est_cents THEN 1 END)
                   AS true_rank
          FROM o JOIN est ON o.grp = est.grp
          GROUP BY o.grp, est_cents
        )
        SELECT ranks.grp AS grp, CAST(n_rows AS BIGINT) AS n_rows,
               est_cents,
               CAST(true_rank AS BIGINT) AS true_rank,
               CAST(ceil(0.5 * n_rows) AS BIGINT) AS target_rank,
               abs(true_rank - CAST(ceil(0.5 * n_rows) AS BIGINT))
                 <= 512 AS within_bound
        FROM ranks JOIN nr ON ranks.grp = nr.grp
        ORDER BY grp
    """,
    "q_quantile_sketch": """
        WITH o AS (
          SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 100
                      AS BIGINT) AS cents,
                 ((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                   1, 15))::BIGINT % 8) + 8) % 8 AS blk
          FROM orders
        ),
        w AS (
          SELECT cents, o_orderkey,
                 row_number() OVER (
                   PARTITION BY blk ORDER BY cents, o_orderkey
                 ) AS rn
          FROM o
        ),
        cand AS (
          SELECT cents, o_orderkey,
                 row_number() OVER (ORDER BY cents, o_orderkey) AS rc
          FROM w WHERE rn % 64 = 1
        ),
        nc AS (SELECT count(*) AS n_cand FROM cand),
        nr AS (SELECT count(*) AS n_rows FROM o),
        qs AS (
          SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q
        ),
        est AS (
          SELECT q, cents AS est_cents
          FROM qs CROSS JOIN nc
          JOIN cand ON rc = CAST(ceil(q * n_cand) AS INT)
        ),
        ranks AS (
          SELECT q, est_cents,
                 count(CASE WHEN o.cents <= est_cents THEN 1 END)
                   AS true_rank
          FROM o, est GROUP BY q, est_cents
        )
        SELECT q, est_cents, CAST(true_rank AS BIGINT) AS true_rank,
               CAST(ceil(q * n_rows) AS BIGINT) AS target_rank,
               abs(true_rank - CAST(ceil(q * n_rows) AS BIGINT))
                 <= 512 AS within_bound
        FROM ranks, nr
        ORDER BY q
    """,
    "q_bloom_fpr_eval": """
        WITH build AS (
          SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 9000
        ),
        bits AS (
          SELECT DISTINCT
            ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#' || j),
                            1, 15))::BIGINT % 1024 AS bit
          FROM build, range(3) t(j)
        ),
        pruned AS (
          SELECT o_custkey FROM orders
          WHERE ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '#0'),
                                1, 15))::BIGINT % 1024
                  IN (SELECT bit FROM bits)
            AND ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '#1'),
                                1, 15))::BIGINT % 1024
                  IN (SELECT bit FROM bits)
            AND ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '#2'),
                                1, 15))::BIGINT % 1024
                  IN (SELECT bit FROM bits)
        ),
        c AS (
          SELECT (SELECT count(*) FROM bits) AS bits_set,
                 (SELECT count(*) FROM pruned) AS bloom_pass,
                 (SELECT count(*) FROM orders
                  WHERE o_custkey IN (SELECT c_custkey FROM build))
                   AS true_match,
                 (SELECT count(*) FROM orders) AS n_probes
        )
        SELECT bits_set,
               floor(bits_set / 1024.0 * 10000 + 0.5) / 10000 AS fill,
               n_probes,
               bloom_pass - true_match AS false_positives,
               floor((bloom_pass - true_match)
                     / CAST(n_probes - true_match AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS measured_fpr,
               floor((bits_set / 1024.0) * (bits_set / 1024.0)
                     * (bits_set / 1024.0) * 10000 + 0.5) / 10000
                 AS occupancy_fpr
        FROM c
    """,
    "q_hll_merge": _HLL_MERGE_SQL,
    "q_hll_sliding": """
        WITH ev AS (
          SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events
        ),
        h AS (
          SELECT day,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM ev
        ),
        reg AS (
          SELECT day, h % 256 AS bucket,
                 max(CASE WHEN (h >> 8) = 0 THEN 53
                          ELSE 53 - length(bin(h >> 8)) END) AS m
          FROM h GROUP BY day, bucket
        ),
        days AS (SELECT DISTINCT day FROM ev),
        grid AS (
          SELECT d.day, b.bucket
          FROM days d CROSS JOIN (SELECT unnest(range(256)) AS bucket) b
        ),
        slid AS (
          SELECT g.day, g.bucket,
                 max(r.m) OVER (
                   PARTITION BY g.bucket ORDER BY g.day
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
                 ) AS msl
          FROM grid g
          LEFT JOIN reg r ON r.day = g.day AND r.bucket = g.bucket
        ),
        folded AS (
          SELECT day,
                 (sum(1::BIGINT << (53 - msl))
                  + (256 - count(msl)) * (1::BIGINT << 53))::BIGINT AS s,
                 256 - count(msl) AS n_zero_regs
          FROM slid WHERE TRUE GROUP BY day
        ),
        est AS (
          SELECT day,
                 CASE
                   WHEN 4.2399330249068963e+20 / CAST(s AS DOUBLE) <= 640.0
                        AND n_zero_regs > 0
                   THEN 256.0 * ln(256.0 / CAST(n_zero_regs AS DOUBLE))
                   ELSE 4.2399330249068963e+20 / CAST(s AS DOUBLE)
                 END AS e,
                 n_zero_regs
          FROM folded
        ),
        x AS (
          SELECT d.day, count(DISTINCT e.user_id) AS exact_distinct
          FROM days d JOIN ev e ON e.day BETWEEN d.day - 6 AND d.day
          GROUP BY d.day
        )
        SELECT day,
               floor(e * 10000 + 0.5) / 10000 AS hll_est,
               n_zero_regs,
               CAST(exact_distinct AS BIGINT) AS exact_distinct,
               floor((e - exact_distinct) / exact_distinct * 10000 + 0.5)
                 / 10000 AS rel_err
        FROM est JOIN x USING (day)
        ORDER BY day
    """,
    # identical HLL construction in SQL: same portable 60-bit md5 hash,
    # bucket = low 8 bits, rho from bin() bit length, exact-integer
    # harmonic fold; 4.2399…e+20 is alpha_256·256²·2^53 folded to one
    # double so neither engine re-derives it
    "q_hll_distinct": """
        WITH h AS (
          SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM events
        ),
        reg AS (
          SELECT h % 256 AS bucket,
                 max(CASE WHEN (h >> 8) = 0 THEN 53
                          ELSE 53 - length(bin(h >> 8)) END) AS m
          FROM h GROUP BY bucket
        ),
        folded AS (
          SELECT (sum(1::BIGINT << (53 - m))
                  + (256 - count(*)) * (1::BIGINT << 53))::BIGINT AS s,
                 256 - count(*) AS n_zero_regs
          FROM reg
        ),
        est AS (
          SELECT CASE
                   WHEN 4.2399330249068963e+20 / CAST(s AS DOUBLE) <= 640.0
                        AND n_zero_regs > 0
                   THEN 256.0 * ln(256.0 / CAST(n_zero_regs AS DOUBLE))
                   ELSE 4.2399330249068963e+20 / CAST(s AS DOUBLE)
                 END AS e,
                 n_zero_regs
          FROM folded
        ),
        x AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events)
        SELECT floor(e * 10000 + 0.5) / 10000 AS hll_est,
               n_zero_regs,
               exact_distinct,
               floor((e - exact_distinct) / exact_distinct * 10000 + 0.5)
                 / 10000 AS rel_err
        FROM est, x
    """,
    # identical bloom construction in SQL: same 60-bit md5 hash, same
    # '#j' probe salts, same 1024-bit universe — bit-for-bit filter
    "q_bloom_prune_join": """
        WITH build AS (
          SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 9000
        ),
        bits AS (
          SELECT DISTINCT
            ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '#' || j),
                            1, 15))::BIGINT % 1024 AS bit
          FROM build, range(3) t(j)
        ),
        pruned AS (
          SELECT o_orderkey FROM orders
          WHERE ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '#0'),
                                1, 15))::BIGINT % 1024
                  IN (SELECT bit FROM bits)
            AND ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '#1'),
                                1, 15))::BIGINT % 1024
                  IN (SELECT bit FROM bits)
            AND ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '#2'),
                                1, 15))::BIGINT % 1024
                  IN (SELECT bit FROM bits)
        )
        SELECT (SELECT count(*) FROM bits) AS bits_set,
               (SELECT count(*) FROM pruned) AS bloom_pass,
               (SELECT count(*) FROM orders
                WHERE o_custkey IN (SELECT c_custkey FROM build))
                 AS true_match,
               (SELECT count(*) FROM pruned)
                 - (SELECT count(*) FROM orders
                    WHERE o_custkey IN (SELECT c_custkey FROM build))
                 AS false_positives
    """,
    "q_kmv_distinct": """
        WITH u AS (
          SELECT DISTINCT event_type,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM events
        ),
        r AS (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM u
        ),
        kth AS (
          SELECT event_type, max(h) AS hk FROM r WHERE rn <= 64
          GROUP BY event_type
        ),
        ex AS (
          SELECT event_type, count(*) AS exact_distinct FROM u
          GROUP BY event_type
        )
        SELECT ex.event_type, exact_distinct,
               floor((CASE WHEN exact_distinct >= 64
                      THEN 63.0 / (hk / 1152921504606846976.0)
                      ELSE CAST(exact_distinct AS DOUBLE) END)
                     * 10000 + 0.5) / 10000 AS kmv_est
        FROM ex JOIN kth USING (event_type)
    """,
    "q_kmv_setops": """
        WITH m AS (
          SELECT user_id,
                 max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-05' THEN 1 ELSE 0 END) AS in_a,
                 max(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-06' THEN 1 ELSE 0 END) AS in_b
          FROM events
          -- NB: DuckDB 1.0.0 mis-evaluates date IN-lists (returns 0
          -- rows); spelled as OR on purpose
          WHERE CAST(ts AS DATE) = DATE '2024-01-05'
             OR CAST(ts AS DATE) = DATE '2024-01-06'
          GROUP BY user_id
        ),
        h AS (
          SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h,
                 in_a, in_b
          FROM m
        ),
        r AS (SELECT *, row_number() OVER (ORDER BY h) AS rn FROM h),
        s AS (
          SELECT max(h) AS hk, count(*) AS kc,
                 CAST(sum(in_a * in_b) AS BIGINT) AS k_both
          FROM r WHERE rn <= 64
        ),
        e AS (
          SELECT count(*) AS exact_union,
                 CAST(sum(in_a * in_b) AS BIGINT) AS exact_inter
          FROM h
        )
        SELECT
          floor((CASE WHEN exact_union >= 64
                 THEN 63.0 / (hk / 1152921504606846976.0)
                 ELSE CAST(exact_union AS DOUBLE) END) * 10000 + 0.5) / 10000
            AS union_est,
          floor(CAST(k_both AS DOUBLE) / kc * 10000 + 0.5) / 10000
            AS jaccard_est,
          floor(CAST(k_both AS DOUBLE) / kc
                * (CASE WHEN exact_union >= 64
                   THEN 63.0 / (hk / 1152921504606846976.0)
                   ELSE CAST(exact_union AS DOUBLE) END)
                * 10000 + 0.5) / 10000 AS inter_est,
          exact_union, exact_inter,
          floor(CAST(exact_inter AS DOUBLE) / exact_union * 10000 + 0.5) / 10000
            AS exact_jaccard
        FROM s, e
    """,
    "q_cooccurrence_lift": """
        WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
        n AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
        nt AS (SELECT event_type, count(*) AS nt FROM ut GROUP BY event_type),
        p AS (
          SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_ab
          FROM ut a
          JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY t1, t2
        )
        SELECT t1, t2, n_ab,
               floor(CAST(n_ab AS DOUBLE) * n_users / (na.nt * nb.nt)
                     * 10000 + 0.5) / 10000 AS lift
        FROM p
        JOIN nt na ON p.t1 = na.event_type
        JOIN nt nb ON p.t2 = nb.event_type, n
    """,
    "q_cms_heavy_hitters": """
        WITH rows AS (SELECT unnest(generate_series(0, 3)) AS i),
        cms AS (
          SELECT i AS cms_row,
                 ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                  CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 64 AS bucket,
                 count(*) AS cnt
          FROM events, rows
          GROUP BY 1, 2
        ),
        probes AS (
          SELECT DISTINCT user_id, i AS cms_row,
                 ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                  CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 64 AS bucket
          FROM events, rows
        ),
        est AS (
          SELECT user_id, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS cms_est
          FROM probes LEFT JOIN cms USING (cms_row, bucket)
          GROUP BY user_id
        ),
        ex AS (SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY user_id)
        SELECT ex.user_id, exact_cnt, cms_est
        FROM ex JOIN est USING (user_id)
        ORDER BY exact_cnt DESC, user_id LIMIT 10
    """,
    "q_kmv_merge": """
        WITH u AS (
          SELECT DISTINCT
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM events
        ),
        r AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM u),
        s AS (SELECT max(h) AS hk, count(*) AS kc FROM r WHERE rn <= 64),
        e AS (SELECT count(*) AS exact_distinct FROM u)
        SELECT
          floor((CASE WHEN kc >= 64
                 THEN 63.0 / (hk / 1152921504606846976.0)
                 ELSE CAST(kc AS DOUBLE) END) * 10000 + 0.5) / 10000
            AS merged_est,
          floor((CASE WHEN kc >= 64
                 THEN 63.0 / (hk / 1152921504606846976.0)
                 ELSE CAST(kc AS DOUBLE) END) * 10000 + 0.5) / 10000
            AS direct_est,
          exact_distinct
        FROM s, e
    """,
}
