"""Store maintenance and mutation: MERGE/CDC, SCD2, Z-order, compaction-adjacent.

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
    audit,
    dedup,
    join as join_ops,
)

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403



def q_latest_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — CDC compaction / keep-latest-per-key as an ARGMAX AGGREGATE:
    one partial+final max(struct(ts, event_id, …)) per user instead of a
    row_number window. The aggregate form map-side-combines (each input
    partition contributes one candidate row per key before the shuffle),
    so the shuffle carries |keys| rows, not |events| — the right plan for
    compacting a 100 TB changelog. Tiebreak: struct ordering on
    (tsn, event_id) is total, so the result is deterministic."""
    df = table(spark, sf, "events")
    df = df.withColumn("tsn", catalog.event_ts_us(df))
    m = F.max(F.struct("tsn", "event_id", "event_type")).alias("m")
    return (
        df.groupBy("user_id")
        .agg(m)
        .select(
            "user_id",
            F.col("m.tsn").alias("tsn"),
            F.col("m.event_id").alias("event_id"),
            F.col("m.event_type").alias("event_type"),
        )
    )


def q_zorder_layout(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Z-order (Morton curve) layout key over the 2-D grid, the
    multi-dimensional clustering key used for data layout (Delta/Iceberg
    Z-ORDER): interleave 7 bits of each grid axis, bucket by z-range, and
    report per-bucket counts plus the gx/gy spans — small spans on BOTH
    axes is exactly the locality a 1-D sort key cannot give. Pure integer
    codegen arithmetic, no UDF, no shuffle beyond the bucket aggregate."""
    df = table(spark, sf, "events").select(
        F.floor(F.col("value") / 5).cast("long").alias("gx"),
        (F.col("user_id") % 100).alias("gy"),
    )
    z = F.expr(_z_interleave("gx", "gy", 7, "div"))
    return (
        df.select("gx", "gy", z.alias("z"))
        .groupBy(F.expr("z div 64").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.max("gx") - F.min("gx")).alias("gx_span"),
            (F.max("gy") - F.min("gy")).alias("gy_span"),
        )
    )


def q_hilbert_layout(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Hilbert-curve layout key over the SAME 2-D grid as
    q_zorder_layout: the space-filling curve with strictly better
    locality than Morton order (every curve step is a unit grid step —
    no Z-shaped jumps), which is why modern lakehouse layouts offer
    HILBERT clustering next to ZORDER. The xy→d transform is the
    classic 7-level bit algorithm unrolled into seven chained
    projections (linear expression tree, all CASE/AND/arithmetic —
    no dialect XOR), generated from the same per-stage text the DuckDB
    oracle chains as CTEs, so both engines run literally identical
    arithmetic. Output mirrors q_zorder_layout (per-bucket counts +
    gx/gy spans) so the two layouts' locality is directly comparable."""
    df = table(spark, sf, "events").select(
        F.floor(F.col("value") / 5).cast("int").alias("gx0"),
        (F.col("user_id") % 100).cast("int").alias("gy0"),
    )
    cur = df.select(
        "gx0", "gy0",
        F.col("gx0").alias("x"), F.col("gy0").alias("y"),
        F.lit(0).alias("d"),
    )
    bits = 7
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        e = _hilbert_stage_sql(s, "x", "y", "d")
        cur = cur.select(
            "gx0", "gy0",
            F.expr(e["x"]).alias("x"),
            F.expr(e["y"]).alias("y"),
            F.expr(e["d"]).alias("d"),
        )
    return (
        cur.groupBy(F.expr("d div 64").alias("hbucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.max("gx0") - F.min("gx0")).alias("gx_span"),
            (F.max("gy0") - F.min("gy0")).alias("gy_span"),
        )
    )


def q_layout_pruning(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the layout decision AS A NUMBER: simulate writing the same
    rows under four layouts (natural event_id order, 1-D sort on gx,
    Z-order, Hilbert — the latter two over the exact q_zorder_layout /
    q_hilbert_layout grid arithmetic), split each ordering into 64
    equal files, compute per-file min-max on BOTH grid axes, and count
    how many files a 2-D range predicate (gx∈[4,7] ∧ gy∈[20,35]) must
    read under standard min-max pruning. One row per layout:
    (n_files, files_read, rows_matched, read_ratio) — the report a
    table-layout decision actually needs, showing 1-D sort prunes one
    axis only while the space-filling curves bound both.

    Scale note: the file assignment needs a TOTAL order, so each layout
    runs one global row_number over a 4-column frame (two ints + two
    curve keys per row) — this query is a pre-write layout AUDIT on a
    sample or a partition; the production path computes the same report
    from the real file manifest (per-file min-max stats) with no window
    at all."""
    ev = table(spark, sf, "events").select(
        "event_id",
        F.floor(F.col("value") / 5).cast("int").alias("gx"),
        (F.col("user_id") % 100).cast("int").alias("gy"),
    )
    cur = ev.select(
        "event_id", "gx", "gy",
        F.col("gx").alias("x"), F.col("gy").alias("y"),
        F.lit(0).alias("d"),
    )
    for i in range(7):
        s = 1 << (7 - 1 - i)
        e = _hilbert_stage_sql(s, "x", "y", "d")
        cur = cur.select(
            "event_id", "gx", "gy",
            F.expr(e["x"]).alias("x"),
            F.expr(e["y"]).alias("y"),
            F.expr(e["d"]).alias("d"),
        )
    keyed = cur.select(
        "event_id", "gx", "gy",
        F.expr(_z_interleave("gx", "gy", 7, "div")).alias("z"),
        F.col("d").alias("hd"),
    ).transform(_mat)  # 4 ordering consumers
    ncnt = keyed.agg(F.count(F.lit(1)).alias("n"))
    matched = keyed.filter(
        F.col("gx").between(4, 7) & F.col("gy").between(20, 35)
    ).agg(F.count(F.lit(1)).cast("long").alias("rows_matched"))

    from pyspark.sql import Window

    def layout(name: str, order_cols: list) -> DataFrame:
        w = Window.orderBy(*order_cols)
        files = (
            keyed.withColumn("rn", F.row_number().over(w))
            .crossJoin(F.broadcast(ncnt))
            .select(
                ((F.col("rn") - 1) * 64).cast("long").alias("p"),
                "n", "gx", "gy",
            )
            .select(F.expr("p div n").alias("fid"), "gx", "gy")
            .groupBy("fid")
            .agg(
                F.min("gx").alias("mn_gx"), F.max("gx").alias("mx_gx"),
                F.min("gy").alias("mn_gy"), F.max("gy").alias("mx_gy"),
            )
        )
        return files.agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.count(
                F.when(
                    (F.col("mx_gx") >= 4) & (F.col("mn_gx") <= 7)
                    & (F.col("mx_gy") >= 20) & (F.col("mn_gy") <= 35),
                    1,
                )
            ).cast("long").alias("files_read"),
        ).select(F.lit(name).alias("layout"), "n_files", "files_read")

    out = (
        layout("1_natural", [F.col("event_id")])
        .unionByName(layout("2_sort_gx", [F.col("gx"), F.col("gy"),
                                          F.col("event_id")]))
        .unionByName(layout("3_zorder", [F.col("z"), F.col("event_id")]))
        .unionByName(layout("4_hilbert", [F.col("hd"), F.col("event_id")]))
    )
    return (
        out.crossJoin(F.broadcast(matched))  # 1-row scalar
        .select(
            "layout", "n_files", "files_read", "rows_matched",
            text.round4(
                F.col("files_read") / F.col("n_files")
            ).alias("read_ratio"),
        )
        .orderBy("layout")
    )


def q_cdc_merge(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — MERGE INTO / CDC-apply: upsert a deterministic change batch
    (status+price update for keys ≡0 mod 7, key-shifted inserts for keys
    ≡0 mod 97) into the orders snapshot via
    :func:`operators.join.merge_upsert` — one full-outer join on the key,
    change rows win wholesale on match. The delta is ~15% of the snapshot;
    at scale the snapshot side is the only large shuffle."""
    snap = table(spark, sf, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
    )
    upd = snap.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("X").alias("status"),
        text.round4(F.col("totalprice") * 1.1).alias("totalprice"),
    )
    ins = snap.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "status",
        "totalprice",
    )
    merged = join_ops.merge_upsert(
        snap, upd.unionByName(ins), "o_orderkey"
    )
    return merged.select(
        "o_orderkey", "status", text.round4(F.col("totalprice")).alias("tp")
    )


def q_state_merge(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — incremental-view maintenance: per-type counts and decimal
    sums kept as MERGEABLE partial states. The 'standing' state (events
    with id ≢0 mod 3) and the 'arriving' batch (the rest) are aggregated
    independently, then combined by summing the partials — count and
    decimal-sum are associative, so merged state ≡ full recompute, which
    is exactly what the plain GROUP BY oracle checks."""
    df = table(spark, sf, "events").select("event_id", "event_type", "value")

    def agg(d: DataFrame) -> DataFrame:
        return d.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("vsum"),
        )

    state = agg(df.filter(F.col("event_id") % 3 != 0))
    batch = agg(df.filter(F.col("event_id") % 3 == 0))
    return (
        state.unionByName(batch)
        .groupBy("event_type")
        .agg(
            F.sum("cnt").alias("cnt"),
            text.round4(F.sum("vsum").cast("double")).alias("val_sum"),
        )
    )


def q_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — table reconciliation / snapshot diff: classify every key as
    unchanged / updated / added / removed between the orders snapshot and
    a deterministically mutated successor (the q_cdc_merge output shape).
    One full-outer join on the key with row-presence markers; the value
    comparison is null-safe (<=>). Output is the per-status×class count
    matrix — the data-reconciliation audit you run after replaying a
    changelog at scale."""
    snap = table(spark, sf, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("tp"),
    )
    # successor: mod-7 keys get a new status/price, mod-13 keys deleted,
    # mod-97 keys re-inserted under shifted ids (same derivation family
    # as q_cdc_merge so the two queries cross-check)
    upd = snap.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("X").alias("status"),
        text.round4(F.col("tp") * 1.1).alias("tp"),
    )
    keep = snap.filter(
        (F.col("o_orderkey") % 7 != 0) & (F.col("o_orderkey") % 13 != 0)
    )
    ins = snap.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "status",
        "tp",
    )
    succ = keep.unionByName(upd.filter(F.col("o_orderkey") % 13 != 0)).unionByName(ins)
    a = snap.select(
        F.col("o_orderkey").alias("k"),
        F.col("status").alias("s_a"),
        F.col("tp").alias("tp_a"),
        F.lit(True).alias("in_a"),
    )
    b = succ.select(
        F.col("o_orderkey").alias("kb"),
        F.col("status").alias("s_b"),
        F.col("tp").alias("tp_b"),
        F.lit(True).alias("in_b"),
    )
    j = a.join(b, F.col("k") == F.col("kb"), "full_outer")
    cls = (
        F.when(F.col("in_a").isNull(), F.lit("added"))
        .when(F.col("in_b").isNull(), F.lit("removed"))
        .when(
            F.col("s_a").eqNullSafe(F.col("s_b"))
            & F.col("tp_a").eqNullSafe(F.col("tp_b")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("updated"))
    )
    return (
        j.select(cls.alias("cls"), F.coalesce("s_b", "s_a").alias("status"))
        .groupBy("cls", "status")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — hot-key-safe salted join: the fact side salts on
    pmod(xxhash64(event_id), 8) and the per-user dimension explodes ×8,
    so one pathological user spreads over 8 reducers instead of one (the
    manual form of AQE's skew-join split, shown for when you need
    deterministic control, e.g. a skewed key you know in advance). Runs
    through operators/skew.py::salted_join; the shuffle_hash hint pins
    the shuffle join — a broadcast would hide the pattern — and results
    are identical to the unsalted join, which is exactly what the oracle
    checks. Decimal sums keep the re-partitioned summation order
    irrelevant."""
    from data_wrangle_openstreetmaps_data_spark.operators.skew import (
        salted_join,
    )

    ev = table(spark, sf, "events")
    dim = (
        ev.select("user_id")
        .distinct()
        .select("user_id", (F.col("user_id") % 7).alias("seg"))
    )
    fact = ev.select("user_id", "value", "event_id")
    return (
        salted_join(
            fact,
            dim.hint("shuffle_hash"),
            "user_id",
            salt_buckets=8,
            salt_cols=["event_id"],
        )
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _dec_sum(F.col("value")).alias("sum_value"),
        )
    )


def q_scd2_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — SCD Type-2 dimension build from a changelog: each user's
    event-type runs become validity intervals [valid_from, valid_to)
    with NULL marking the current row — the gaps-and-islands change-flag
    running sum, then one aggregate per island and a lead() over the
    |islands| frame for the closing timestamps. Both windows and the
    aggregate are user-keyed (no global sort); the second pass touches
    one row per island, not per event."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    tsn = catalog.event_ts_us(ev)
    e = ev.select(
        "user_id", "event_id", "event_type", tsn.alias("tsn")
    )
    w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(
        prev.isNull() | (prev != F.col("event_type")), 1
    ).otherwise(0)
    islands = e.withColumn("chg", chg).withColumn(
        "island",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    s = islands.groupBy("user_id", "island").agg(
        F.min("event_type").alias("event_type"),
        F.min("tsn").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return s.select(
        "user_id",
        "island",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


def q_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — bucketed co-located join (plans/bucketing.py): both sides
    hash-bucketed and sorted on the order key at WRITE time, so the join
    itself is a zero-shuffle streaming merge of co-located buckets — the
    storage-level answer to 'minimize shuffles' when a fact table is
    joined on the same key repeatedly. The only exchange in the plan is
    the final 5-row priority aggregate (pinned by a plan guard); results
    equal the plain join, which is what the oracle checks."""
    from data_wrangle_openstreetmaps_data_spark.plans.bucketing import (
        join_bucketed,
        save_bucketed,
    )

    li = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    save_bucketed(li, "bkt_q_lineitem", "l_orderkey", 8)
    save_bucketed(orders, "bkt_q_orders", "l_orderkey", 8)
    return (
        join_bucketed(spark, "bkt_q_lineitem", "bkt_q_orders", "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_price"),
        )
    )


def q_range_checksum_diff(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Merkle-style cheap table diff: to compare two 100 TB
    snapshots you never join them row-by-row; each side reduces to
    |buckets| (bucket → xor-of-row-hashes, count) fingerprints — one
    scan + one tiny aggregate per side, bit_xor is order-independent so
    partitioning cannot wiggle it — and only buckets whose fingerprints
    disagree are re-read at row level. Here snapshot B injects
    deterministic updates (keys ≡0 mod 251: price +11.0) and deletes
    (≡0 mod 509); the query returns exactly the buckets holding those
    changes. Row hashes use the portable 60-bit md5 (exact-cents floor
    for the double column), so DuckDB computes identical checksums."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    o = table(spark, sf, "orders")

    def fingerprint(df: DataFrame, s: str) -> DataFrame:
        cents = F.floor(F.col("o_totalprice") * 100).cast("long")
        row = F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            cents.cast("string"),
        )
        return (
            df.select(
                (F.col("o_orderkey") % 64).alias("bucket"),
                portable_token_hash(row).alias("h"),
            )
            .groupBy("bucket")
            .agg(
                F.bit_xor("h").alias(f"x_{s}"),
                F.count(F.lit(1)).alias(f"n_{s}"),
            )
        )

    b_src = o.filter(F.col("o_orderkey") % 509 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 251 == 0, F.col("o_totalprice") + 11.0
        ).otherwise(F.col("o_totalprice")),
    )
    j = fingerprint(o, "a").join(
        fingerprint(b_src, "b"), "bucket", "full_outer"
    )
    differs = (
        ~F.coalesce(F.col("x_a"), F.lit(-1)).eqNullSafe(
            F.coalesce(F.col("x_b"), F.lit(-1))
        )
    ) | (
        F.coalesce(F.col("n_a"), F.lit(-1))
        != F.coalesce(F.col("n_b"), F.lit(-1))
    )
    return (
        j.filter(differs)
        .select("bucket", "n_a", "n_b")
        .orderBy("bucket")
    )


def q_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — columnar-format interop: write orders to ORC partitioned
    by priority (the other first-class Hadoop columnar format next to
    the parquet the store sinks use), read it back through the
    partition-pruned path (the priority filter prunes to one
    directory — PartitionFilters in the scan, like the parquet DPP
    guard), and aggregate. ORC preserves doubles bit-exactly, so the
    oracle aggregates the original parquet directly — the roundtrip is
    the thing under test."""
    import os
    import shutil

    work = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "..", ".tmp",
        f"orc_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(work, ignore_errors=True)
    src = table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )
    src.write.mode("overwrite").partitionBy("o_orderpriority").orc(work)
    back = spark.read.orc(work).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderstatus")
    )


def q_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — schema-evolution read: two parquet generations of the same
    table (v1 without, v2 WITH a later-added column) are read together
    under mergeSchema — the lakehouse reality where old files never get
    rewritten. The merged frame must expose the union schema with NULLs
    for the missing column in old files; the audit aggregates per
    generation (rows, null-count of the new column, decimal-exact
    price sum). Oracle reproduces the generational split from the raw
    table. At 100 TB, schema merge is footer-only — no data rewrite."""
    import os
    import shutil

    work = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "..", ".tmp",
        f"schevo_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(work, ignore_errors=True)
    o = table(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).drop("o_orderpriority")
    v2 = o.filter(F.col("o_orderkey") % 2 != 0)
    v1.write.mode("overwrite").parquet(os.path.join(work, "gen=1"))
    v2.write.mode("overwrite").parquet(os.path.join(work, "gen=2"))
    merged = spark.read.option("mergeSchema", True).parquet(
        os.path.join(work, "gen=1"), os.path.join(work, "gen=2")
    )
    return (
        merged.groupBy(
            (F.col("o_orderkey") % 2 == 0).alias("old_generation")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(
                F.when(F.col("o_orderpriority").isNull(), F.lit(1))
            ).alias("n_null_priority"),
            text.round4(
                F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
                .cast("double")
            ).alias("price_sum"),
        )
        .orderBy("old_generation")
    )


def q_null_imputation(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — median imputation: values deterministically masked
    (event_id ≡ 0 mod 11 → NULL, the synthetic missingness) are filled
    with their event_type's median computed from the SURVIVING values —
    the standard numeric-feature repair step. One per-type aggregate
    row broadcast back over the scan (never a window over the fact
    table); the audit reports, per type, how many were imputed and the
    decimal-exact value sums before/after so the fill is fully
    checkable."""
    ev = table(spark, sf, "events")
    masked = ev.select(
        "event_type",
        F.when(F.col("event_id") % 11 != 0, F.col("value")).alias("v"),
    )
    med = masked.filter(F.col("v").isNotNull()).groupBy(
        "event_type"
    ).agg(F.expr("percentile(v, 0.5)").alias("med"))
    j = masked.join(F.broadcast(med), "event_type")
    filled = j.select(
        "event_type",
        "v",
        F.coalesce(F.col("v"), F.col("med")).alias("vf"),
        F.col("med"),
    )
    return (
        filled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("v").isNull(), F.lit(1))).alias(
                "n_imputed"
            ),
            text.round4(F.max("med")).alias("median_used"),
            text.round4(
                F.sum(F.col("v").cast("decimal(20,6)")).cast("double")
            ).alias("sum_before"),
            text.round4(
                F.sum(F.col("vf").cast("decimal(20,6)")).cast("double")
            ).alias("sum_after"),
        )
        .orderBy("event_type")
    )


def q_partitioned_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — hive-partitioned write + partition-pruned read: events
    written partitionBy(event_type), then ONE partition directory is
    read back through the partition column filter — the layout whose
    pruning means a 100 TB table scans only the partitions a query
    names (the PartitionFilters plan guard lives in tests/test_plans).
    The audit re-aggregates the pruned read; the oracle filters the
    raw table — equality proves the round trip lost nothing and the
    partition column survives the directory encoding."""
    import os
    import shutil

    work = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "..", ".tmp",
        f"part_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(work, ignore_errors=True)
    ev = table(spark, sf, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    ev.write.mode("overwrite").partitionBy("event_type").parquet(work)
    back = spark.read.parquet(work).filter(
        F.col("event_type") == "purchase"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        text.round4(
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
        ).alias("val_sum"),
    )


def q_sort_clustering(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — layout clustering factor: how well each candidate sort
    key clusters the fact table, measured as the number of RUNS of
    equal values in a reference scan order (ts, event_id) — runs ≈
    distinct values means perfectly clustered (sort key worth its
    write cost), runs ≈ rows means the key is shuffled noise. One
    window lag per candidate over the same ordering; the min/max/avg
    run lengths fall out of the run count arithmetically. This is the
    measurement behind choosing a Z-order/Hilbert/sort layout."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    e = ev.select(
        "event_type",
        (F.col("user_id") % 10).alias("cohort"),
        catalog.event_ts_us(ev).alias("tsn"),
        "event_id",
    )
    w = Window.orderBy("tsn", "event_id")

    def runs(col: str) -> DataFrame:
        changed = F.when(
            F.lag(col).over(w).isNull()
            | (F.col(col) != F.lag(col).over(w)),
            F.lit(1),
        ).otherwise(F.lit(0))
        return e.select(changed.alias("chg")).agg(
            F.lit(col).alias("sort_key"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("chg").alias("n_runs"),
            text.round4(
                F.count(F.lit(1)) / F.sum("chg")
            ).alias("avg_run_len"),
        )

    # NB: the global-order window runs at the DIAGNOSTIC tier — you
    # measure clustering on a sample/partition at 100 TB, not the table
    return runs("event_type").unionByName(runs("cohort")).orderBy(
        "sort_key"
    )


def q_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — CSV interchange round-trip: write lineitem's numeric core
    to headered CSV, read it back under an EXPLICIT schema (never
    inference — at 100 TB an inference pass is a full extra scan and a
    type lottery), and aggregate. Java's shortest-round-trip double
    formatting guarantees the text→double→text cycle is bit-exact, so
    the oracle aggregates the original parquet; decimal-cast sums keep
    the comparison order-independent."""
    import os
    import shutil

    work = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "..", ".tmp",
        f"csv_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(work, ignore_errors=True)
    src = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    src.write.mode("overwrite").option("header", True).csv(work)
    back = (
        spark.read.schema(
            "l_orderkey long, l_quantity double, "
            "l_extendedprice double, l_returnflag string"
        )
        .option("header", True)
        .csv(work)
    )
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(20,6)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(20,6)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


def q_minmax_pruning(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — min/max-stats data skipping (the Delta/Iceberg file-skip
    pattern over plain parquet): orders are written range-clustered on
    o_totalprice into fixed-width block partitions, a per-block stats
    manifest is computed from the physical files, and a price-range
    query is answered by pruning non-overlapping blocks from the file
    listing BEFORE the scan (directory-level PartitionFilters), then
    re-applying the exact predicate. Returns the query answer together
    with blocks_scanned/blocks_total — the skip ratio is part of the
    contract, and the oracle recomputes it from the same block stats.
    The manifest collect is a |blocks|-row driver action (file-count
    scale, like Delta's pruning), never row-scale."""
    import os
    import shutil

    from data_wrangle_openstreetmaps_data_spark.sources import stats_skip

    work = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "..", ".tmp",
        f"minmax_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(work, ignore_errors=True)
    src = table(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    stats_skip.write_clustered(src, work, "o_totalprice", 50_000.0)
    man = stats_skip.manifest(spark, work, "o_totalprice")
    rows, scanned, total_blocks = stats_skip.read_pruned(
        spark, work, man, "o_totalprice", 150_000.0, 200_000.0
    )
    ans = rows.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
        .cast("double")
        .alias("total"),
    )
    return ans.select(
        "n_orders",
        "total",
        F.lit(scanned).cast("long").alias("blocks_scanned"),
        F.lit(total_blocks).cast("long").alias("blocks_total"),
    )


def q_compaction_plan(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — small-file compaction planning: daily event partitions are
    the 'files' (size = row count), packed time-ordered into target
    bins of 2000 rows by exclusive-prefix-sum bucketing — bin =
    floor(running_size_before / target), the deterministic relational
    form of greedy bin packing (keeps time locality, never splits a
    file). The window runs over the MANIFEST (one row per day /
    file-group — thousands of rows at 100 TB, not data rows), which is
    why a global-order window is acceptable here and nowhere else;
    a billion-file manifest would swap in the blocked two-phase prefix
    sum (operators/curation.py::_blocked_prefix_sum). Output: per-bin
    file count, total size, and the covered day range."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    files = ev.groupBy(
        F.to_date(catalog.event_ts(ev)).alias("day")
    ).agg(F.count(F.lit(1)).alias("size"))
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum("size").over(w), F.lit(0))
    binned = files.withColumn(
        "bin", F.floor(pre / F.lit(2000)).cast("long")
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size").alias("total_size"),
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("first_day"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_day"),
        )
        .orderBy("bin")
    )


def q_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — semi-structured round trip inside the engine: each order
    row is serialized to a JSON document (to_json over a struct — the
    event-payload shape), then fields are pulled back out with BOTH
    extraction APIs — get_json_object JSONPath strings and a typed
    from_json schema — and re-aggregated. The oracle asserts round-trip
    IDENTITY against the raw columns (decimal-exact sums), so a codec
    that mangles types, loses precision on doubles, or mis-handles
    nesting cannot hash-match. JSON stays executor-side: serialize,
    extract, and aggregate all fuse into one scan projection."""
    o = table(spark, sf, "orders")
    j = o.select(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("s"),
                F.col("o_totalprice").alias("p"),
                F.struct(F.col("o_orderpriority").alias("pr")).alias(
                    "nest"
                ),
            )
        ).alias("doc")
    )
    parsed = j.select(
        F.get_json_object("doc", "$.s").alias("status"),
        F.get_json_object("doc", "$.nest.pr").alias("priority"),
        F.from_json(
            "doc", "k BIGINT, s STRING, p DOUBLE, nest STRUCT<pr: STRING>"
        ).alias("t"),
    )
    return (
        parsed.groupBy("status", "priority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("t.k")).alias("key_sum"),
            text.round4(
                F.sum(F.col("t.p").cast("decimal(20,6)")).cast("double")
            ).alias("price_sum"),
        )
        .orderBy("status", "priority")
    )


def q_variant_extract(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the OPEN VARIANT type (Spark 4): JSON documents parsed
    into the binary variant encoding once (parse_json), then fields
    extracted with typed JSONPath (try_variant_get) — the
    shredding-friendly semi-structured path that replaces
    string-re-parsing per extraction. The oracle asserts round-trip
    identity against the raw columns, so a variant codec that mangles
    a type or loses a nested field cannot hash-match. Distinct from
    q_json_roundtrip (string get_json_object / from_json): this is the
    columnar-binary path a 100 TB semi-structured table would store."""
    o = table(spark, sf, "orders")
    j = o.select(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderpriority").alias("pr"),
                F.struct(F.col("o_totalprice").alias("p")).alias("nest"),
            )
        ).alias("doc")
    )
    v = j.select(F.parse_json("doc").alias("v"))
    parsed = v.select(
        F.try_variant_get("v", "$.pr", "string").alias("priority"),
        F.try_variant_get("v", "$.k", "bigint").alias("k"),
        F.try_variant_get("v", "$.nest.p", "double").alias("p"),
    )
    return (
        parsed.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
            text.round4(
                F.sum(F.col("p").cast("decimal(20,6)")).cast("double")
            ).alias("price_sum"),
        )
        .orderBy("priority")
    )


def q_column_stats_drift(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — schema/statistics drift audit between two table versions:
    per-column profile (row count, min/max, decimal-exact sum, mean) of
    the orders snapshot vs its deterministically mutated successor (the
    SAME derivation as q_snapshot_diff, so the row-level and
    column-level audits cross-check), emitted long-form with deltas.
    This is the cheap first-line check before a row-level diff at
    100 TB: two single-pass profile aggregates (each one partial-
    aggregable scan, 1-row output) against a key-shuffled full-outer
    join — you run THIS hourly and the row diff only when it drifts.
    Sums ride DECIMAL(20,6) so no float-sum order exists; means divide
    the exact sum once."""
    snap = table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("tp")
    )
    upd = snap.filter(F.col("k") % 7 == 0).select(
        "k", text.round4(F.col("tp") * 1.1).alias("tp")
    )
    keep = snap.filter((F.col("k") % 7 != 0) & (F.col("k") % 13 != 0))
    ins = snap.filter(F.col("k") % 97 == 0).select(
        (F.col("k") + 10_000_000).alias("k"), "tp"
    )
    succ = keep.unionByName(upd.filter(F.col("k") % 13 != 0)).unionByName(
        ins
    )

    def prof(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("double").alias(f"{tag}_n"),
            F.min("tp").alias(f"{tag}_tpmin"),
            F.max("tp").alias(f"{tag}_tpmax"),
            F.sum(F.col("tp").cast("decimal(20,6)"))
            .cast("double")
            .alias(f"{tag}_tpsum"),
            F.min("k").cast("double").alias(f"{tag}_kmin"),
            F.max("k").cast("double").alias(f"{tag}_kmax"),
        )

    c = prof(snap, "a").crossJoin(F.broadcast(prof(succ, "b")))
    c = c.withColumn("a_tpmean", F.col("a_tpsum") / F.col("a_n"))
    c = c.withColumn("b_tpmean", F.col("b_tpsum") / F.col("b_n"))
    long = c.select(
        F.expr(
            """stack(6,
              'n_rows',  a_n,      b_n,
              'tp_max',  a_tpmax,  b_tpmax,
              'tp_mean', a_tpmean, b_tpmean,
              'tp_min',  a_tpmin,  b_tpmin,
              'key_max', a_kmax,   b_kmax,
              'key_min', a_kmin,   b_kmin) AS (stat, a_val, b_val)"""
        )
    )
    return long.select(
        "stat",
        text.round4(F.col("a_val")).alias("a_val"),
        text.round4(F.col("b_val")).alias("b_val"),
        text.round4(F.col("b_val") - F.col("a_val")).alias("delta"),
    ).orderBy("stat")


def q_dict_encoding(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-S — dictionary-encoding planner, the categorical companion
    to q_delta_encoding's gap audit: for each candidate string column,
    compare raw layout bits (8·Σ len) against dictionary layout bits
    (8·Σ distinct len + n·code_width) with code_width the exact BIT
    LENGTH of n_distinct−1 via length(bin(·)) — integer bit math
    throughout, so the ratio divides exact bigints. Per column the plan
    is a value-keyed count aggregate (map-side combine collapses to
    |dict| rows) + a |dict|-row rollup; columns union as independent
    branches. The decision table a columnar writer consults before
    choosing PLAIN vs DICT at 100 TB."""
    orders = table(spark, sf, "orders")

    def audit(col: str) -> DataFrame:
        d = orders.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return d.agg(
            F.lit(col).alias("column"),
            F.sum("cnt").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            (F.lit(8) * F.sum(F.length("v") * F.col("cnt")))
            .cast("long")
            .alias("raw_bits"),
            (
                F.lit(8) * F.sum(F.length("v"))
                + F.sum("cnt")
                * F.length(F.bin(F.count(F.lit(1)) - F.lit(1)))
            )
            .cast("long")
            .alias("dict_bits"),
        )

    u = audit("o_orderstatus").unionAll(audit("o_orderpriority"))
    return u.select(
        "column",
        "n",
        "n_distinct",
        "raw_bits",
        "dict_bits",
        text.round4(
            F.col("dict_bits").cast("double")
            / F.col("raw_bits").cast("double")
        ).alias("ratio"),
    ).orderBy("column")


def q_rle_encoding(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-S — run-length-encoding planner, the third leg of the layout
    audits (q_dict_encoding chooses PLAIN vs DICT, q_delta_encoding
    audits posting gaps): for each candidate column under the layout
    'sorted by o_orderkey within 8192-key blocks', count the value runs
    and compare raw bits (8·Σ len) against RLE bits (Σ over runs of
    8·len(run value) + 16 length bits), computed as a conditional sum
    over run-START rows only (lag ≠ current marks a start). The block
    id is KEY-derived (o_orderkey div 8192) — never a global-order
    window (single-partition sort) and never spark_partition_id (the
    round-2 nondeterminism trap) — so the window shuffles on blk and
    scales embarrassingly; runs that straddle block borders count once
    per block, the same per-page reset a real columnar writer does.
    One window + one aggregate per column; two columns union."""
    from pyspark.sql import Window

    orders = table(spark, sf, "orders")

    def audit(col: str) -> DataFrame:
        d = orders.select(
            F.expr("o_orderkey div 8192").alias("blk"),
            F.col("o_orderkey").alias("k"),
            F.col(col).alias("v"),
        )
        w = Window.partitionBy("blk").orderBy("k")
        lagv = F.lag("v").over(w)
        start = lagv.isNull() | (lagv != F.col("v"))
        return d.withColumn("st", start).agg(
            F.lit(col).alias("column"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_distinct("blk").cast("long").alias("n_blocks"),
            F.count(F.when(F.col("st"), 1)).cast("long").alias("n_runs"),
            (F.lit(8) * F.sum(F.length("v")))
            .cast("long")
            .alias("raw_bits"),
            F.sum(
                F.when(F.col("st"), F.lit(8) * F.length("v") + F.lit(16))
            )
            .cast("long")
            .alias("rle_bits"),
        )

    u = audit("o_orderstatus").unionAll(audit("o_orderpriority"))
    return u.select(
        "column",
        "n",
        "n_blocks",
        "n_runs",
        "raw_bits",
        "rle_bits",
        text.round4(
            F.col("rle_bits").cast("double")
            / F.col("raw_bits").cast("double")
        ).alias("ratio"),
    ).orderBy("column")


def _rle_audit_sql(col: str) -> str:
    return f"""
        SELECT '{col}' AS "column",
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks,
               CAST(count(CASE WHEN st THEN 1 END) AS BIGINT) AS n_runs,
               CAST(8 * sum(length(v)) AS BIGINT) AS raw_bits,
               CAST(sum(CASE WHEN st THEN 8 * length(v) + 16 END)
                    AS BIGINT) AS rle_bits
        FROM (
          SELECT blk,
                 lag(v) OVER (PARTITION BY blk ORDER BY k) IS DISTINCT
                   FROM v AS st, v
          FROM (SELECT o_orderkey // 8192 AS blk, o_orderkey AS k,
                       {col} AS v FROM orders)
        )
    """


def q_delta_encoding(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-S — posting-list delta (gap) encoding audit, the storage-side
    companion to q_inverted_index: per token, sort the distinct doc-id
    postings, take successive gaps (the first posting codes its absolute
    id), and cost each value at its exact BIT LENGTH via length(bin(v))
    — integer bit math, never floating log2 (the HLL rho lesson) — vs
    the 64-bit/posting raw encoding. Reports the 20 highest-df tokens
    with their compression ratio: the measurement that justifies
    gap+varint layouts for inverted indexes at corpus scale. One explode
    + two token-keyed ops; the lag window partitions by token."""
    from pyspark.sql import Window

    d = table(spark, sf, "documents").select(
        "doc_id", F.explode(text.tokens("text")).alias("token")
    )
    p = d.groupBy("token", "doc_id").agg(F.lit(1).alias("one"))
    g = p.withColumn(
        "gap",
        F.coalesce(
            F.col("doc_id")
            - F.lag("doc_id").over(
                Window.partitionBy("token").orderBy("doc_id")
            ),
            F.col("doc_id"),
        ),
    )
    return (
        g.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(F.bin("gap"))).cast("long").alias(
                "delta_bits"
            ),
        )
        .select(
            "token",
            "n_docs",
            "delta_bits",
            text.round4(
                F.col("delta_bits").cast("double")
                / (F.lit(64.0) * F.col("n_docs").cast("double"))
            ).alias("ratio"),
        )
        .orderBy(F.desc("n_docs"), "token")
        .limit(20)
    )


def _dict_audit_sql(col: str) -> str:
    return f"""
        SELECT '{col}' AS "column",
               CAST(sum(cnt) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(8 * sum(length(v) * cnt) AS BIGINT) AS raw_bits,
               CAST(8 * sum(length(v))
                    + sum(cnt) * length(bin(count(*) - 1))
                    AS BIGINT) AS dict_bits
        FROM (SELECT {col} AS v, count(*) AS cnt
              FROM orders GROUP BY {col})
    """


def _layout_pruning_sql() -> str:
    """Oracle for q_layout_pruning: same grid, same per-stage Hilbert
    text, same z-interleave, same 64-file split and min-max overlap
    test, per layout."""
    stages = [
        "k0 AS (SELECT event_id, gx, gy, gx AS x, gy AS y, 0 AS d"
        " FROM grid)"
    ]
    for i in range(7):
        s = 1 << (7 - 1 - i)
        e = _hilbert_stage_sql(s, "x", "y", "d")
        stages.append(
            f"k{i + 1} AS (SELECT event_id, gx, gy, {e['x']} AS x, "
            f"{e['y']} AS y, {e['d']} AS d FROM k{i})"
        )
    hil = ",\n".join(stages)

    def block(name: str, order: str) -> str:
        return f"""
        f_{name} AS (
          SELECT ((rn - 1) * 64) // n AS fid, gx, gy FROM (
            SELECT gx, gy,
                   row_number() OVER (ORDER BY {order}) AS rn,
                   (SELECT count(*) FROM keyed) AS n
            FROM keyed)
        ),
        s_{name} AS (
          SELECT CAST(count(*) AS BIGINT) AS n_files,
                 CAST(count(*) FILTER (mx_gx >= 4 AND mn_gx <= 7
                      AND mx_gy >= 20 AND mn_gy <= 35) AS BIGINT)
                   AS files_read
          FROM (SELECT fid, min(gx) AS mn_gx, max(gx) AS mx_gx,
                       min(gy) AS mn_gy, max(gy) AS mx_gy
                FROM f_{name} GROUP BY fid)
        )"""

    return f"""
        WITH grid AS (
          SELECT event_id,
                 CAST(floor(value / 5) AS INT) AS gx,
                 CAST(user_id % 100 AS INT) AS gy
          FROM events
        ),
        {hil},
        keyed AS (
          SELECT event_id, gx, gy,
                 {_z_interleave('gx', 'gy', 7, '//')} AS z,
                 d AS hd
          FROM k7
        ),
        matched AS (
          SELECT CAST(count(*) AS BIGINT) AS rows_matched FROM keyed
          WHERE gx BETWEEN 4 AND 7 AND gy BETWEEN 20 AND 35
        ),
        {block('natural', 'event_id')},
        {block('sortgx', 'gx, gy, event_id')},
        {block('zorder', 'z, event_id')},
        {block('hilbert', 'hd, event_id')},
        lay AS (
          SELECT '1_natural' AS layout, * FROM s_natural
          UNION ALL SELECT '2_sort_gx', * FROM s_sortgx
          UNION ALL SELECT '3_zorder', * FROM s_zorder
          UNION ALL SELECT '4_hilbert', * FROM s_hilbert
        )
        SELECT layout, n_files, files_read, rows_matched,
               floor(files_read / n_files * 10000 + 0.5) / 10000
                 AS read_ratio
        FROM lay, matched
        ORDER BY layout
    """


def q_incremental_agg_refresh(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — incremental materialized-view maintenance (the
    don't-recompute-100-TB pattern; reference analogue: the one-shot
    recompute ETL in openstreet_kolkata.py:657-683 has no refresh
    story). A per-customer order-count/revenue aggregate is
    maintained as stored base state (orders strictly before the
    2001-02-01 refresh watermark) merged with the new delta batch
    (orders at/after it): refresh cost is agg(delta) + an outer merge
    on the TOUCHED keys only — in production the base fact table is
    never rescanned. Here both paths run so the query PROVES the
    merge law cross-engine: a full recompute joined on touched groups
    yields a zero `mismatches` scalar (audit-only, not the production
    path). Money is cent-exact (decimal sum → bigint) so merged sums
    are associative integers, never float re-orderings. Output: top
    20 touched groups by merged cents (custkey tiebreak) + accounting
    scalars groups_touched / groups_total / mismatches."""
    o = table(spark, sf, "orders")
    split = _ts("2001-02-01")
    cents = F.col("o_totalprice").cast("decimal(20,6)") * 100
    base = (
        o.filter(F.col("o_orderdate") < split)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("cnt_base"),
            F.sum(cents).cast("long").alias("cents_base"),
        )
    )
    delta = (
        o.filter(F.col("o_orderdate") >= split)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("cnt_delta"),
            F.sum(cents).cast("long").alias("cents_delta"),
        )
    )
    merged = _mat(  # 3 consumers: top-20, touched scalar, mismatch audit
        delta.join(base, "o_custkey", "left").select(
            F.col("o_custkey").alias("custkey"),
            F.coalesce("cnt_base", F.lit(0)).alias("cnt_base"),
            F.col("cnt_delta"),
            (F.coalesce("cnt_base", F.lit(0)) + F.col("cnt_delta")).alias(
                "cnt_new"
            ),
            F.coalesce("cents_base", F.lit(0)).alias("cents_base"),
            F.col("cents_delta"),
            (
                F.coalesce("cents_base", F.lit(0)) + F.col("cents_delta")
            ).alias("cents_new"),
        )
    )
    recompute = _mat(  # audit-only full recount; 2 consumers
        o.groupBy("o_custkey").agg(
            F.count("*").alias("cnt_all"),
            F.sum(cents).cast("long").alias("cents_all"),
        )
    )
    touched = merged.agg(F.count("*").alias("groups_touched"))
    total = recompute.agg(F.count("*").alias("groups_total"))
    mism = (
        merged.join(
            recompute, merged["custkey"] == recompute["o_custkey"]
        ).agg(
            F.count(
                F.when(
                    (F.col("cnt_new") != F.col("cnt_all"))
                    | (F.col("cents_new") != F.col("cents_all")),
                    1,
                )
            ).alias("mismatches")
        )
    )
    return (
        merged.orderBy(F.desc("cents_new"), "custkey")
        .limit(20)
        .crossJoin(F.broadcast(touched))  # three 1-row scalars
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(mism))
    )


def q_deletion_vectors(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — merge-on-read deletion vectors vs copy-on-write rewrite:
    the lakehouse delete-cost decision as one audited row. lineitem is
    bucketed into 64 simulated files (l_orderkey % 64 — the id is a
    label; the audit is ONE hash agg per file then one 64-row fold, the
    same plan at any scale); the delete predicate (returnflag 'R',
    discount ≥ 0.06) marks rows. Per file: CoW rewrites every row of a
    touched file; MoR writes only |deleted| DV entries but keeps
    scanning dead rows until compaction. A 30%-dead threshold policy
    (integer cross-multiply, no float ratio) picks per-file between DV
    and rewrite. Output: exact integer file/row totals, both
    pure-strategy write costs, the hybrid policy's write cost and
    residual dead-read rows, and round4 ratios."""
    li = table(spark, sf, "lineitem")
    dead = (F.col("l_returnflag") == "R") & (F.col("l_discount") >= 0.06)
    per_file = li.groupBy((F.col("l_orderkey") % 64).alias("file_id")).agg(
        F.count("*").alias("rows"),
        F.count(F.when(dead, 1)).alias("dels"),
    )
    rewrite = F.col("dels") * 10 >= F.col("rows") * 3  # dead ≥ 30%
    out = per_file.agg(
        F.count("*").alias("files_total"),
        F.count(F.when(F.col("dels") > 0, 1)).alias("files_touched"),
        F.sum("rows").alias("rows_total"),
        F.sum("dels").alias("rows_deleted"),
        F.coalesce(
            F.sum(F.when(F.col("dels") > 0, F.col("rows"))), F.lit(0)
        ).alias("cow_write_rows"),
        F.sum("dels").alias("mor_write_entries"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("dels") > 0) & rewrite, F.col("rows")
                ).otherwise(F.when(F.col("dels") > 0, F.col("dels")))
            ),
            F.lit(0),
        ).alias("hybrid_write_units"),
        F.coalesce(
            F.sum(F.when((F.col("dels") > 0) & ~rewrite, F.col("dels"))),
            F.lit(0),
        ).alias("hybrid_dead_resident"),
    )
    return out.select(
        "*",
        text.round4(
            F.col("cow_write_rows") / F.col("mor_write_entries")
        ).alias("write_amp_cow"),
        text.round4(F.col("rows_deleted") / F.col("rows_total")).alias(
            "dead_read_pct"
        ),
    )


def q_bitmap_index_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — bitmap-index predicate algebra: two single-column bitmap
    indexes over lineitem (A: returnflag 'R', B: discount ≥ 0.06) are
    built as packed 32-bit words keyed by rowid div 32 (rowid =
    orderkey·8 + linenumber — unique by schema; 32-bit positions
    because a set bit 63 overflows DuckDB's left shift, and the word
    width is a layout constant anyway). AND/OR selectivities then come
    from pure word-wise bitwise algebra + bit_count — the index
    answers the combined predicate WITHOUT rescanning the table, the
    reason bitmap indexes exist. The same one-pass agg carries direct
    per-word predicate counts, so `bitmaps_match` PROVES all four
    bitmap-derived cardinalities against the direct scan cross-engine.
    One hash agg + one 1-row fold; word count is rows/32 at any
    scale."""
    li = table(spark, sf, "lineitem")
    rid = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    a = F.col("l_returnflag") == "R"
    b = F.col("l_discount") >= 0.06
    # F.shiftleft takes a PYTHON-int bit count; a per-row count needs expr
    bit = F.expr(
        "shiftleft(cast(1 as bigint),"
        " cast((l_orderkey * 8 + l_linenumber) % 32 as int))"
    )
    words = li.select(
        rid.alias("rid"),
        a.alias("a"),
        b.alias("b"),
        bit.alias("bit"),
    ).groupBy(F.expr("rid div 32").alias("word")).agg(
        F.coalesce(
            F.bit_or(F.when(F.col("a"), F.col("bit"))), F.lit(0)
        ).alias("wa"),
        F.coalesce(
            F.bit_or(F.when(F.col("b"), F.col("bit"))), F.lit(0)
        ).alias("wb"),
        F.count(F.when(F.col("a"), 1)).alias("ca"),
        F.count(F.when(F.col("b"), 1)).alias("cb"),
        F.count(F.when(F.col("a") & F.col("b"), 1)).alias("cand"),
        F.count(F.when(F.col("a") | F.col("b"), 1)).alias("cor"),
    )
    out = words.agg(
        F.count("*").alias("n_words"),
        F.sum(F.bit_count("wa")).alias("n_a"),
        F.sum(F.bit_count("wb")).alias("n_b"),
        F.sum(
            F.bit_count(F.col("wa").bitwiseAND(F.col("wb")))
        ).alias("n_and"),
        F.sum(F.bit_count(F.col("wa").bitwiseOR(F.col("wb")))).alias(
            "n_or"
        ),
        F.sum("ca").alias("n_a_direct"),
        F.sum("cb").alias("n_b_direct"),
        F.sum("cand").alias("n_and_direct"),
        F.sum("cor").alias("n_or_direct"),
    )
    return out.select(
        "*",
        F.when(
            (F.col("n_a") == F.col("n_a_direct"))
            & (F.col("n_b") == F.col("n_b_direct"))
            & (F.col("n_and") == F.col("n_and_direct"))
            & (F.col("n_or") == F.col("n_or_direct")),
            1,
        )
        .otherwise(0)
        .alias("bitmaps_match"),
    )


def q_bitemporal_asof(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — bitemporal as-of reconstruction (valid time × transaction
    time), the restatement-audit shape SCD2 alone can't answer: facts
    carry VALID time (o_orderdate); a correction stream (every 11th
    order restated at transaction-epoch 1 with +10% price, computed as
    exact integer cents + cents div 10) carries TRANSACTION time. "What
    did we believe at tx T about month M?" = per-key argmax over
    versions with tx ≤ T (ONE max(struct) aggregate computes both
    knowledge states — no per-T rescan), rolled up by valid month.
    Output per month: revenue as first believed (asof tx 0), as
    currently known (asof tx 1), the restatement delta (≠ 0 exactly in
    months containing a corrected order), and the restated-order
    count. Versions table + argmax is the real bitemporal mechanism —
    at 100 TB the correction stream is a MERGE source, never a base
    rewrite."""
    o = table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(20,6)") * 100).cast(
        "long"
    )
    month = F.date_format("o_orderdate", "yyyy-MM")
    v0 = o.select(
        "o_orderkey",
        month.alias("month"),
        cents.alias("cents"),
        F.lit(0).alias("tx"),
    )
    v1 = (
        o.filter(F.col("o_orderkey") % 11 == 0)
        .select(
            "o_orderkey",
            month.alias("month"),
            cents.alias("c0"),
            F.lit(1).alias("tx"),
        )
        .select(
            "o_orderkey",
            "month",
            (F.col("c0") + F.expr("c0 div 10")).alias("cents"),
            "tx",
        )
    )
    vers = v0.unionByName(v1)
    per_key = vers.groupBy("o_orderkey", "month").agg(
        F.max(F.when(F.col("tx") <= 0, F.struct("tx", "cents")))[
            "cents"
        ].alias("c_asof0"),
        F.max(F.struct("tx", "cents"))["cents"].alias("c_asof1"),
        F.max("tx").alias("maxtx"),
    )
    return (
        per_key.groupBy("month")
        .agg(
            F.sum("c_asof0").alias("cents_asof0"),
            F.sum("c_asof1").alias("cents_asof1"),
            F.count(F.when(F.col("maxtx") == 1, 1)).alias("n_restated"),
        )
        .select(
            "month",
            "cents_asof0",
            "cents_asof1",
            (F.col("cents_asof1") - F.col("cents_asof0")).alias(
                "restatement_cents"
            ),
            "n_restated",
        )
        .orderBy("month")
    )


def q_late_arriving_dim(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — late-arriving-dimension handling (the warehouse pattern
    SCD2 needs at load time): facts whose dimension member has no
    version valid at the fact's event date land in the UNKNOWN member
    instead of being dropped or mis-joined to a later version. The
    synthesized dim history: every customer's segment v1 becomes valid
    1995-07-01 for custkey%7=0 (so earlier 1995 orders for them are
    EARLY facts → UNKNOWN) and epoch-start otherwise; custkey%5=0
    additionally restates to the NEXT segment from 1998-01-01 (SCD2
    version 2). Resolution is one broadcast of the |customers|·≤2
    version table + an argmax over versions with valid_from ≤
    orderdate — no interval blow-up, no window over facts. Output: per
    resolved segment (incl. UNKNOWN), order count and cent-exact
    revenue; UNKNOWN ≠ 0 is the point."""
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    c = table(spark, sf, "customer")
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.when(
            F.col("c_custkey") % 7 == 0, _ts("1995-07-01")
        ).otherwise(_ts("1990-01-01")).alias("valid_from"),
    )
    nxt = F.element_at(
        F.array(*[F.lit(s) for s in segs]),
        (
            (
                F.array_position(
                    F.array(*[F.lit(s) for s in segs]),
                    F.col("c_mktsegment"),
                )
                % 5
            )
            + 1
        ).cast("int"),
    )
    v2 = (
        c.filter(F.col("c_custkey") % 5 == 0)
        .select(
            "c_custkey",
            nxt.alias("segment"),
            _ts("1998-01-01").alias("valid_from"),
        )
    )
    dim = v1.unionByName(v2)
    o = table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(20,6)") * 100).cast(
        "long"
    )
    joined = (
        o.select("o_orderkey", "o_custkey", "o_orderdate", cents.alias("cents"))
        .join(
            F.broadcast(dim),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("valid_from") <= F.col("o_orderdate")),
            "left",
        )
        .groupBy("o_orderkey")
        .agg(
            F.max(F.struct("valid_from", "segment"))["segment"].alias(
                "seg"
            ),
            F.max("cents").alias("cents"),
        )
    )
    return (
        joined.groupBy(
            F.coalesce("seg", F.lit("UNKNOWN")).alias("segment")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("cents"),
        )
        .orderBy("segment")
    )


def q_ttl_retention_audit(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — TTL retention/vacuum planning over month partitions: with
    a retention cut mid-month (1999-08-15 — two years before the
    corpus max, pinned as a literal so the audit is deterministic),
    fully-expired month partitions DROP for free (metadata delete)
    while the one straddling partition needs a REWRITE that carries
    its live rows — the cost asymmetry every TTL policy at 100 TB is
    designed around (align cuts to partition boundaries and the
    rewrite term vanishes). One month-grain hash agg + a 1-row fold;
    `rewrite_amp` = live rows rewritten per expired row reclaimed in
    the straddling partition."""
    o = table(spark, sf, "orders")
    cut = _ts("1999-08-15")
    per = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count("*").alias("rows"),
        F.count(F.when(F.col("o_orderdate") < cut, 1)).alias("expired"),
    )
    return _ttl_fold(per)


def _ttl_fold(per: DataFrame) -> DataFrame:
    """The TTL classification fold over (month, rows, expired) rows —
    module-level so tests/test_property.py can drive it with generated
    partition shapes (straddle invariants)."""
    return per.agg(
        F.count("*").alias("partitions_total"),
        F.count(F.when(F.col("expired") == F.col("rows"), 1)).alias(
            "partitions_droppable"
        ),
        F.count(
            F.when(
                (F.col("expired") > 0)
                & (F.col("expired") < F.col("rows")),
                1,
            )
        ).alias("partitions_partial"),
        F.sum("rows").alias("rows_total"),
        F.sum("expired").alias("rows_expired"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("expired") > 0)
                    & (F.col("expired") < F.col("rows")),
                    F.col("rows") - F.col("expired"),
                )
            ),
            F.lit(0),
        ).alias("partial_live_rows"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("expired") > 0)
                    & (F.col("expired") < F.col("rows")),
                    F.col("expired"),
                )
            ),
            F.lit(0),
        ).alias("partial_expired_rows"),
    ).select(
        "*",
        # NULL (not an ANSI divide-by-zero) when nothing straddles —
        # an edge the hypothesis fold property surfaced
        text.round4(
            F.when(
                F.col("partial_expired_rows") > 0,
                F.col("partial_live_rows")
                / F.col("partial_expired_rows"),
            )
        ).alias("rewrite_amp"),
    )


def q_gdpr_erasure_plan(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — right-to-be-forgotten impact plan across tables: for the
    erasure cohort (key % 97 = 0 — user_id in events, custkey in
    orders), each table reports rows to delete, month partitions
    touched vs total, and the rewrite amplification (total rows
    resident in touched partitions per deleted row — what a
    copy-on-write erasure actually costs; the DV/MoR alternative is
    q_deletion_vectors' subject). Per table: one month-grain
    conditional agg + a 1-row fold; the union is |tables| rows. The
    scattering is the point: subject keys touch nearly every
    partition of a time-partitioned table — the reason erasure at
    100 TB wants deletion vectors or subject-keyed layout."""
    ev = table(spark, sf, "events")
    per_e = (
        ev.select(
            F.date_format(catalog.event_ts(ev), "yyyy-MM").alias(
                "month"
            ),
            (F.col("user_id") % 97 == 0).alias("hit"),
        )
        .groupBy("month")
        .agg(
            F.count("*").alias("rows"),
            F.count(F.when(F.col("hit"), 1)).alias("dels"),
        )
    )
    o = table(spark, sf, "orders")
    per_o = (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            (F.col("o_custkey") % 97 == 0).alias("hit"),
        )
        .groupBy("month")
        .agg(
            F.count("*").alias("rows"),
            F.count(F.when(F.col("hit"), 1)).alias("dels"),
        )
    )

    return (
        _erasure_fold(per_e, "events")
        .unionByName(_erasure_fold(per_o, "orders"))
        .orderBy("table_name")
    )


def _erasure_fold(per: DataFrame, name: str) -> DataFrame:
    """The erasure-impact fold over (month, rows, dels) rows —
    module-level so tests/test_property.py can drive it with generated
    partition shapes."""
    return per.agg(
        F.lit(name).alias("table_name"),
        F.sum("dels").alias("rows_to_delete"),
        F.count(F.when(F.col("dels") > 0, 1)).alias(
            "partitions_touched"
        ),
        F.count("*").alias("partitions_total"),
        F.coalesce(
            F.sum(F.when(F.col("dels") > 0, F.col("rows"))),
            F.lit(0),
        ).alias("resident_rows"),
    ).select(
        "*",
        # NULL (not an ANSI divide-by-zero) for an empty erasure cohort
        text.round4(
            F.when(
                F.col("rows_to_delete") > 0,
                F.col("resident_rows") / F.col("rows_to_delete"),
            )
        ).alias("rewrite_amp"),
    )


def q_backfill_plan(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — backfill range planning, the orchestration step after a
    partial pipeline failure: failed day partitions (planted
    deterministically: epoch-day % 13 = 0 — a scattered ~7.7% failure
    set) are coalesced into CONTIGUOUS [start, end] ranges via
    gaps-and-islands over the day index (the failure cadence is every
    13th day, so an island breaks where the step between successive
    failed days exceeds that cadence — i.e. a scheduled day with no
    failed rows interrupts the run), because schedulers re-run
    ranges, not single days. Per range: day span and rows; plus
    scalars n_ranges / failed_days / failed_rows. The islands window
    runs over |failed days| rows, never the facts. Day index is exact
    integer division of the epoch-µs (orders dates are midnight
    timestamps)."""
    from pyspark.sql import Window

    o = table(spark, sf, "orders")
    day = F.expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
    )
    failed = (
        o.select(
            day.alias("d"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        )
        .groupBy("d", "day")
        .agg(F.count("*").alias("rows"))
        .filter(F.col("d") % 13 == 0)
    )
    from data_wrangle_openstreetmaps_data_spark.operators.reshape import (
        gaps_and_islands,
    )

    isl = gaps_and_islands(failed, "d", max_step=13)
    ranges = _mat(  # 2 consumers: plan rows + scalars
        isl.groupBy("grp").agg(
            F.min("day").alias("range_start"),
            F.max("day").alias("range_end"),
            F.count("*").alias("days_in_range"),
            F.sum("rows").alias("rows_to_reprocess"),
        )
    )
    scal = ranges.agg(
        F.count("*").alias("n_ranges"),
        F.sum("days_in_range").alias("failed_days"),
        F.sum("rows_to_reprocess").alias("failed_rows"),
    )
    return (
        ranges.drop("grp")
        .crossJoin(F.broadcast(scal))  # 1-row scalar
        .orderBy("range_start")
    )


ORACLES: dict[str, str | None] = {
    "q_backfill_plan": """
        WITH failed AS (
          SELECT epoch_us(o_orderdate) // 86400000000 AS d,
                 strftime(o_orderdate, '%Y-%m-%d') AS day,
                 count(*) AS rows
          FROM orders
          GROUP BY 1, 2
          HAVING (epoch_us(o_orderdate) // 86400000000) % 13 = 0
        ),
        isl AS (
          SELECT *,
                 CASE WHEN lag(d) OVER (ORDER BY d) IS NULL
                        OR d - lag(d) OVER (ORDER BY d) > 13
                      THEN 1 ELSE 0 END AS brk
          FROM failed
        ),
        g AS (
          SELECT *, sum(brk) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS grp
          FROM isl
        ),
        ranges AS (
          SELECT grp, min(day) AS range_start, max(day) AS range_end,
                 count(*) AS days_in_range,
                 CAST(sum(rows) AS BIGINT) AS rows_to_reprocess
          FROM g GROUP BY grp
        ),
        scal AS (
          SELECT count(*) AS n_ranges,
                 CAST(sum(days_in_range) AS BIGINT) AS failed_days,
                 CAST(sum(rows_to_reprocess) AS BIGINT) AS failed_rows
          FROM ranges
        )
        SELECT r.range_start, r.range_end, r.days_in_range,
               r.rows_to_reprocess,
               s.n_ranges, s.failed_days, s.failed_rows
        FROM ranges r, scal s
        ORDER BY r.range_start
    """,
    "q_gdpr_erasure_plan": """
        WITH pe AS (
          SELECT strftime(ts, '%Y-%m') AS month, count(*) AS rows,
                 CAST(count(CASE WHEN user_id % 97 = 0 THEN 1 END)
                      AS BIGINT) AS dels
          FROM events GROUP BY 1
        ),
        po AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 count(*) AS rows,
                 CAST(count(CASE WHEN o_custkey % 97 = 0 THEN 1 END)
                      AS BIGINT) AS dels
          FROM orders GROUP BY 1
        ),
        u AS (
          SELECT 'events' AS table_name,
                 CAST(sum(dels) AS BIGINT) AS rows_to_delete,
                 CAST(count(CASE WHEN dels > 0 THEN 1 END) AS BIGINT)
                   AS partitions_touched,
                 count(*) AS partitions_total,
                 CAST(coalesce(sum(CASE WHEN dels > 0 THEN rows END),
                               0) AS BIGINT) AS resident_rows
          FROM pe
          UNION ALL
          SELECT 'orders',
                 CAST(sum(dels) AS BIGINT),
                 CAST(count(CASE WHEN dels > 0 THEN 1 END) AS BIGINT),
                 count(*),
                 CAST(coalesce(sum(CASE WHEN dels > 0 THEN rows END),
                               0) AS BIGINT)
          FROM po
        )
        SELECT *,
               floor(CAST(resident_rows AS DOUBLE) / rows_to_delete
                     * 10000 + 0.5) / 10000 AS rewrite_amp
        FROM u ORDER BY table_name
    """,
    "q_ttl_retention_audit": """
        WITH per AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 count(*) AS rows,
                 CAST(count(CASE WHEN o_orderdate
                                      < TIMESTAMP '1999-08-15'
                            THEN 1 END) AS BIGINT) AS expired
          FROM orders GROUP BY 1
        )
        SELECT count(*) AS partitions_total,
               CAST(count(CASE WHEN expired = rows THEN 1 END)
                    AS BIGINT) AS partitions_droppable,
               CAST(count(CASE WHEN expired > 0 AND expired < rows
                          THEN 1 END) AS BIGINT) AS partitions_partial,
               CAST(sum(rows) AS BIGINT) AS rows_total,
               CAST(sum(expired) AS BIGINT) AS rows_expired,
               CAST(coalesce(sum(CASE WHEN expired > 0
                                       AND expired < rows
                                 THEN rows - expired END), 0)
                    AS BIGINT) AS partial_live_rows,
               CAST(coalesce(sum(CASE WHEN expired > 0
                                       AND expired < rows
                                 THEN expired END), 0)
                    AS BIGINT) AS partial_expired_rows,
               floor(CAST(coalesce(sum(CASE WHEN expired > 0
                                             AND expired < rows
                                       THEN rows - expired END), 0)
                          AS DOUBLE)
                     / coalesce(sum(CASE WHEN expired > 0
                                          AND expired < rows
                                    THEN expired END), 0)
                     * 10000 + 0.5) / 10000 AS rewrite_amp
        FROM per
    """,
    "q_late_arriving_dim": """
        WITH segs(s, i) AS (
          VALUES ('AUTOMOBILE', 1), ('BUILDING', 2), ('FURNITURE', 3),
                 ('HOUSEHOLD', 4), ('MACHINERY', 5)
        ),
        v1 AS (
          SELECT c_custkey, c_mktsegment AS segment,
                 CASE WHEN c_custkey % 7 = 0
                      THEN TIMESTAMP '1995-07-01'
                      ELSE TIMESTAMP '1990-01-01' END AS valid_from
          FROM customer
        ),
        v2 AS (
          SELECT c.c_custkey,
                 (SELECT s2.s FROM segs s1, segs s2
                   WHERE s1.s = c.c_mktsegment
                     AND s2.i = (s1.i % 5) + 1) AS segment,
                 TIMESTAMP '1998-01-01' AS valid_from
          FROM customer c WHERE c.c_custkey % 5 = 0
        ),
        dim AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
        joined AS (
          SELECT o.o_orderkey,
                 arg_max(d.segment, d.valid_from) AS seg,
                 max(CAST(CAST(o.o_totalprice AS DECIMAL(20,6)) * 100
                          AS BIGINT)) AS cents
          FROM orders o
          LEFT JOIN dim d ON d.c_custkey = o.o_custkey
                         AND d.valid_from <= o.o_orderdate
          GROUP BY o.o_orderkey
        )
        SELECT coalesce(seg, 'UNKNOWN') AS segment,
               count(*) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM joined GROUP BY 1 ORDER BY segment
    """,
    "q_bitemporal_asof": """
        WITH c AS (
          SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS month,
                 CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 100
                      AS BIGINT) AS cents
          FROM orders
        ),
        vers AS (
          SELECT o_orderkey, month, cents, 0 AS tx FROM c
          UNION ALL
          SELECT o_orderkey, month, cents + cents // 10, 1 FROM c
          WHERE o_orderkey % 11 = 0
        ),
        per_key AS (
          SELECT o_orderkey, month,
                 max(CASE WHEN tx <= 0 THEN cents END) AS c_asof0,
                 arg_max(cents, tx) AS c_asof1,
                 max(tx) AS maxtx
          FROM vers GROUP BY 1, 2
        )
        SELECT month,
               CAST(sum(c_asof0) AS BIGINT) AS cents_asof0,
               CAST(sum(c_asof1) AS BIGINT) AS cents_asof1,
               CAST(sum(c_asof1) - sum(c_asof0) AS BIGINT)
                 AS restatement_cents,
               CAST(count(CASE WHEN maxtx = 1 THEN 1 END) AS BIGINT)
                 AS n_restated
        FROM per_key GROUP BY month
        ORDER BY month
    """,
    "q_bitmap_index_intersect": """
        WITH base AS (
          SELECT l_orderkey * 8 + l_linenumber AS rid,
                 l_returnflag = 'R' AS a,
                 l_discount >= 0.06 AS b,
                 1::BIGINT << CAST((l_orderkey * 8 + l_linenumber) % 32
                                   AS INT) AS bit
          FROM lineitem
        ),
        words AS (
          SELECT rid // 32 AS word,
                 coalesce(bit_or(CASE WHEN a THEN bit END), 0) AS wa,
                 coalesce(bit_or(CASE WHEN b THEN bit END), 0) AS wb,
                 count(CASE WHEN a THEN 1 END) AS ca,
                 count(CASE WHEN b THEN 1 END) AS cb,
                 count(CASE WHEN a AND b THEN 1 END) AS cand,
                 count(CASE WHEN a OR b THEN 1 END) AS cor
          FROM base GROUP BY 1
        ),
        tot AS (
          SELECT count(*) AS n_words,
                 CAST(sum(bit_count(wa)) AS BIGINT) AS n_a,
                 CAST(sum(bit_count(wb)) AS BIGINT) AS n_b,
                 CAST(sum(bit_count(wa & wb)) AS BIGINT) AS n_and,
                 CAST(sum(bit_count(wa | wb)) AS BIGINT) AS n_or,
                 CAST(sum(ca) AS BIGINT) AS n_a_direct,
                 CAST(sum(cb) AS BIGINT) AS n_b_direct,
                 CAST(sum(cand) AS BIGINT) AS n_and_direct,
                 CAST(sum(cor) AS BIGINT) AS n_or_direct
          FROM words
        )
        SELECT *,
               CAST(CASE WHEN n_a = n_a_direct AND n_b = n_b_direct
                          AND n_and = n_and_direct
                          AND n_or = n_or_direct
                    THEN 1 ELSE 0 END AS INTEGER) AS bitmaps_match
        FROM tot
    """,
    "q_incremental_agg_refresh": """
        WITH base AS (
          SELECT o_custkey, count(*) AS cnt_base,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6)) * 100)
                      AS BIGINT) AS cents_base
          FROM orders WHERE o_orderdate < TIMESTAMP '2001-02-01'
          GROUP BY 1
        ),
        delta AS (
          SELECT o_custkey, count(*) AS cnt_delta,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6)) * 100)
                      AS BIGINT) AS cents_delta
          FROM orders WHERE o_orderdate >= TIMESTAMP '2001-02-01'
          GROUP BY 1
        ),
        merged AS (
          SELECT d.o_custkey AS custkey,
                 coalesce(b.cnt_base, 0) AS cnt_base,
                 d.cnt_delta,
                 coalesce(b.cnt_base, 0) + d.cnt_delta AS cnt_new,
                 coalesce(b.cents_base, 0) AS cents_base,
                 d.cents_delta,
                 coalesce(b.cents_base, 0) + d.cents_delta AS cents_new
          FROM delta d LEFT JOIN base b ON b.o_custkey = d.o_custkey
        ),
        allq AS (
          SELECT o_custkey, count(*) AS cnt_all,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6)) * 100)
                      AS BIGINT) AS cents_all
          FROM orders GROUP BY 1
        ),
        scal AS (
          SELECT (SELECT count(*) FROM merged) AS groups_touched,
                 (SELECT count(*) FROM allq) AS groups_total,
                 (SELECT count(*) FROM merged m
                   JOIN allq f ON f.o_custkey = m.custkey
                   WHERE m.cnt_new <> f.cnt_all
                      OR m.cents_new <> f.cents_all) AS mismatches
        )
        SELECT m.custkey, m.cnt_base, m.cnt_delta, m.cnt_new,
               m.cents_base, m.cents_delta, m.cents_new,
               s.groups_touched, s.groups_total, s.mismatches
        FROM (SELECT * FROM merged
              ORDER BY cents_new DESC, custkey LIMIT 20) m, scal s
        ORDER BY m.cents_new DESC, m.custkey
    """,
    "q_deletion_vectors": """
        WITH per_file AS (
          SELECT l_orderkey % 64 AS file_id, count(*) AS rows,
                 CAST(count(CASE WHEN l_returnflag = 'R'
                                  AND l_discount >= 0.06
                            THEN 1 END) AS BIGINT) AS dels
          FROM lineitem GROUP BY 1
        ),
        tot AS (
          SELECT count(*) AS files_total,
                 CAST(count(CASE WHEN dels > 0 THEN 1 END) AS BIGINT)
                   AS files_touched,
                 CAST(sum(rows) AS BIGINT) AS rows_total,
                 CAST(sum(dels) AS BIGINT) AS rows_deleted,
                 CAST(coalesce(sum(CASE WHEN dels > 0 THEN rows END), 0)
                      AS BIGINT) AS cow_write_rows,
                 CAST(sum(dels) AS BIGINT) AS mor_write_entries,
                 CAST(coalesce(sum(CASE
                        WHEN dels > 0 AND dels * 10 >= rows * 3 THEN rows
                        WHEN dels > 0 THEN dels END), 0) AS BIGINT)
                   AS hybrid_write_units,
                 CAST(coalesce(sum(CASE
                        WHEN dels > 0 AND dels * 10 < rows * 3
                        THEN dels END), 0) AS BIGINT)
                   AS hybrid_dead_resident
          FROM per_file
        )
        SELECT *,
               floor(CAST(cow_write_rows AS DOUBLE) / mor_write_entries
                     * 10000 + 0.5) / 10000 AS write_amp_cow,
               floor(CAST(rows_deleted AS DOUBLE) / rows_total
                     * 10000 + 0.5) / 10000 AS dead_read_pct
        FROM tot
    """,
    "q_rle_encoding": f"""
        WITH u AS (
          {_rle_audit_sql("o_orderstatus")}
          UNION ALL
          {_rle_audit_sql("o_orderpriority")}
        )
        SELECT "column", n, n_blocks, n_runs, raw_bits, rle_bits,
               floor(CAST(rle_bits AS DOUBLE) / CAST(raw_bits AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS ratio
        FROM u ORDER BY "column"
    """,
    "q_dict_encoding": f"""
        WITH u AS (
          {_dict_audit_sql("o_orderstatus")}
          UNION ALL
          {_dict_audit_sql("o_orderpriority")}
        )
        SELECT "column", n, n_distinct, raw_bits, dict_bits,
               floor(CAST(dict_bits AS DOUBLE) / CAST(raw_bits AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS ratio
        FROM u ORDER BY "column"
    """,
    "q_delta_encoding": f"""
        WITH toked AS (
          SELECT doc_id, {{tokens}} AS toks FROM documents
        ),
        p AS (
          SELECT DISTINCT unnest(toks) AS token, doc_id FROM toked
        ),
        g AS (
          SELECT token,
                 coalesce(doc_id - lag(doc_id) OVER (
                   PARTITION BY token ORDER BY doc_id
                 ), doc_id) AS gap
          FROM p
        ),
        a AS (
          SELECT token, count(*) AS n_docs,
                 CAST(sum(length(bin(gap))) AS BIGINT) AS delta_bits
          FROM g GROUP BY token
        )
        SELECT token, n_docs, delta_bits,
               floor(CAST(delta_bits AS DOUBLE)
                     / (64.0 * CAST(n_docs AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS ratio
        FROM a
        ORDER BY n_docs DESC, token LIMIT 20
    """.format(tokens=_TOKENS_SQL),
    "q_hilbert_layout": f"""
        WITH src AS (
          SELECT CAST(floor(value / 5) AS INT) AS gx0,
                 CAST(user_id % 100 AS INT) AS gy0,
                 CAST(floor(value / 5) AS INT) AS gx,
                 CAST(user_id % 100 AS INT) AS gy
          FROM events
        ),
        {_hilbert_ctes_sql(7, "src")}
        SELECT CAST(h // 64 AS BIGINT) AS hbucket, count(*) AS cnt,
               max(gx0) - min(gx0) AS gx_span,
               max(gy0) - min(gy0) AS gy_span
        FROM hil GROUP BY 1
    """,
    "q_partitioned_roundtrip": """
        SELECT event_type, count(*) AS n_rows,
               count(DISTINCT user_id) AS n_users,
               floor(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS val_sum
        FROM events WHERE event_type = 'purchase'
        GROUP BY event_type
    """,
    "q_sort_clustering": """
        WITH e AS (
          SELECT event_type, user_id % 10 AS cohort,
                 epoch_us(ts) AS tsn, event_id
          FROM events
        ),
        r1 AS (
          SELECT CASE WHEN lag(event_type) OVER w IS NULL
                      OR event_type <> lag(event_type) OVER w
                      THEN 1 ELSE 0 END AS chg
          FROM e WINDOW w AS (ORDER BY tsn, event_id)
        ),
        r2 AS (
          SELECT CASE WHEN lag(cohort) OVER w IS NULL
                      OR cohort <> lag(cohort) OVER w
                      THEN 1 ELSE 0 END AS chg
          FROM e WINDOW w AS (ORDER BY tsn, event_id)
        ),
        u AS (
          SELECT 'event_type' AS sort_key, count(*) AS n_rows,
                 CAST(sum(chg) AS BIGINT) AS n_runs,
                 floor(count(*) / CAST(sum(chg) AS DOUBLE)
                       * 10000 + 0.5) / 10000 AS avg_run_len
          FROM r1
          UNION ALL
          SELECT 'cohort', count(*), CAST(sum(chg) AS BIGINT),
                 floor(count(*) / CAST(sum(chg) AS DOUBLE)
                       * 10000 + 0.5) / 10000
          FROM r2
        )
        SELECT sort_key, n_rows, n_runs, avg_run_len
        FROM u ORDER BY sort_key
    """,
    # generational split reproduced from the raw table: old-gen files
    # lack the priority column entirely, so its nulls = old-gen rows
    "q_schema_evolution": """
        SELECT (o_orderkey % 2 = 0) AS old_generation,
               count(*) AS n_rows,
               count(CASE WHEN o_orderkey % 2 = 0 THEN 1 END)
                 AS n_null_priority,
               floor(CAST(sum(CAST(o_totalprice AS DECIMAL(20,6)))
                          AS DOUBLE) * 10000 + 0.5) / 10000 AS price_sum
        FROM orders GROUP BY 1 ORDER BY 1
    """,
    "q_null_imputation": """
        WITH m AS (
          SELECT event_type,
                 CASE WHEN event_id % 11 != 0 THEN value END AS v
          FROM events
        ),
        med AS (
          SELECT event_type, quantile_cont(v, 0.5) AS med
          FROM m WHERE v IS NOT NULL GROUP BY 1
        )
        SELECT event_type, count(*) AS n_rows,
               count(CASE WHEN v IS NULL THEN 1 END) AS n_imputed,
               floor(max(med) * 10000 + 0.5) / 10000 AS median_used,
               floor(CAST(sum(CAST(v AS DECIMAL(20,6))) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS sum_before,
               floor(CAST(sum(CAST(coalesce(v, med) AS DECIMAL(20,6)))
                          AS DOUBLE) * 10000 + 0.5) / 10000 AS sum_after
        FROM m JOIN med USING (event_type)
        GROUP BY event_type ORDER BY event_type
    """,
    # variant round-trip identity (see q_json_roundtrip's twin comment)
    "q_variant_extract": """
        SELECT o_orderpriority AS priority,
               count(*) AS n,
               CAST(min(o_orderkey) AS BIGINT) AS min_key,
               CAST(max(o_orderkey) AS BIGINT) AS max_key,
               floor(CAST(sum(CAST(o_totalprice AS DECIMAL(20,6)))
                          AS DOUBLE) * 10000 + 0.5) / 10000 AS price_sum
        FROM orders GROUP BY priority ORDER BY priority
    """,
    "q_compaction_plan": """
        WITH files AS (
          SELECT CAST(ts AS DATE) AS day, count(*) AS size
          FROM events GROUP BY 1
        ),
        binned AS (
          SELECT day, size,
                 CAST(floor(coalesce(sum(size) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) / 2000) AS BIGINT) AS bin
          FROM files
        )
        SELECT bin, count(*) AS n_files,
               CAST(sum(size) AS BIGINT) AS total_size,
               strftime(min(day), '%Y-%m-%d') AS first_day,
               strftime(max(day), '%Y-%m-%d') AS last_day
        FROM binned GROUP BY bin ORDER BY bin
    """,
    # round-trip identity: the JSON serialize/extract pipeline must
    # reproduce the raw columns exactly, so the oracle aggregates the
    # originals directly
    "q_json_roundtrip": """
        SELECT o_orderstatus AS status,
               o_orderpriority AS priority,
               count(*) AS n,
               CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
               floor(CAST(sum(CAST(o_totalprice AS DECIMAL(20,6)))
                          AS DOUBLE) * 10000 + 0.5) / 10000 AS price_sum
        FROM orders
        GROUP BY status, priority ORDER BY status, priority
    """,
    "q_column_stats_drift": """
        WITH snap AS (
          SELECT o_orderkey AS k, o_totalprice AS tp FROM orders
        ),
        upd AS (
          SELECT k, floor(tp * 1.1 * 10000 + 0.5) / 10000 AS tp
          FROM snap WHERE k % 7 = 0
        ),
        keep AS (SELECT * FROM snap WHERE k % 7 != 0 AND k % 13 != 0),
        ins AS (
          SELECT k + 10000000 AS k, tp FROM snap WHERE k % 97 = 0
        ),
        succ AS (
          SELECT * FROM keep
          UNION ALL SELECT * FROM upd WHERE k % 13 != 0
          UNION ALL SELECT * FROM ins
        ),
        a AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 min(tp) AS tpmin, max(tp) AS tpmax,
                 CAST(sum(CAST(tp AS DECIMAL(20,6))) AS DOUBLE) AS tpsum,
                 CAST(min(k) AS DOUBLE) AS kmin,
                 CAST(max(k) AS DOUBLE) AS kmax
          FROM snap
        ),
        b AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 min(tp) AS tpmin, max(tp) AS tpmax,
                 CAST(sum(CAST(tp AS DECIMAL(20,6))) AS DOUBLE) AS tpsum,
                 CAST(min(k) AS DOUBLE) AS kmin,
                 CAST(max(k) AS DOUBLE) AS kmax
          FROM succ
        ),
        long AS (
          SELECT 'n_rows' AS stat, a.n AS a_val, b.n AS b_val FROM a, b
          UNION ALL SELECT 'tp_max', a.tpmax, b.tpmax FROM a, b
          UNION ALL SELECT 'tp_mean', a.tpsum / a.n, b.tpsum / b.n FROM a, b
          UNION ALL SELECT 'tp_min', a.tpmin, b.tpmin FROM a, b
          UNION ALL SELECT 'key_max', a.kmax, b.kmax FROM a, b
          UNION ALL SELECT 'key_min', a.kmin, b.kmin FROM a, b
        )
        SELECT stat,
               floor(a_val * 10000 + 0.5) / 10000 AS a_val,
               floor(b_val * 10000 + 0.5) / 10000 AS b_val,
               floor((b_val - a_val) * 10000 + 0.5) / 10000 AS delta
        FROM long ORDER BY stat
    """,
    "q_minmax_pruning": """
        WITH blocks AS (
          SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS blk,
                 min(o_totalprice) AS mn, max(o_totalprice) AS mx
          FROM orders GROUP BY 1
        ),
        pruned AS (
          SELECT count(CASE WHEN mx >= 150000 AND mn < 200000
                            THEN 1 END) AS blocks_scanned,
                 count(*) AS blocks_total
          FROM blocks
        ),
        ans AS (
          SELECT count(*) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
                   AS total
          FROM orders
          WHERE o_totalprice >= 150000 AND o_totalprice < 200000
        )
        SELECT n_orders, total, blocks_scanned, blocks_total
        FROM ans, pruned
    """,
    "q_csv_roundtrip": """
        SELECT l_returnflag,
               count(*) AS n_lines,
               CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
                 AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)
                 AS sum_price
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q_orc_roundtrip": """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
                 AS total
        FROM orders
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    # identical checksum construction: same row repr, same portable
    # hash, same xor fold — buckets disagree exactly where B changed
    "q_range_checksum_diff": """
        WITH a_rows AS (
          SELECT o_orderkey % 64 AS bucket,
                 ('0x' || substr(md5(
                    CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus
                    || '|' || o_orderpriority || '|'
                    || CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR)
                 ), 1, 15))::BIGINT AS h
          FROM orders
        ),
        b_src AS (
          SELECT o_orderkey, o_orderstatus, o_orderpriority,
                 CASE WHEN o_orderkey % 251 = 0
                      THEN o_totalprice + 11.0
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 509 <> 0
        ),
        b_rows AS (
          SELECT o_orderkey % 64 AS bucket,
                 ('0x' || substr(md5(
                    CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus
                    || '|' || o_orderpriority || '|'
                    || CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR)
                 ), 1, 15))::BIGINT AS h
          FROM b_src
        ),
        aa AS (SELECT bucket, bit_xor(h) AS x_a, count(*) AS n_a
               FROM a_rows GROUP BY bucket),
        bb AS (SELECT bucket, bit_xor(h) AS x_b, count(*) AS n_b
               FROM b_rows GROUP BY bucket)
        SELECT coalesce(aa.bucket, bb.bucket) AS bucket, n_a, n_b
        FROM aa FULL OUTER JOIN bb ON aa.bucket = bb.bucket
        WHERE coalesce(x_a, -1) <> coalesce(x_b, -1)
           OR coalesce(n_a, -1) <> coalesce(n_b, -1)
        ORDER BY bucket
    """,
    "q_latest_per_key": """
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS tsn, event_id, event_type
          FROM events
        ),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY tsn DESC, event_id DESC
          ) AS rn
          FROM e
        )
        SELECT user_id, tsn, event_id, event_type FROM r WHERE rn = 1
    """,
    "q_layout_pruning": _layout_pruning_sql(),
    "q_zorder_layout": f"""
        WITH g AS (
          SELECT CAST(floor(value / 5) AS BIGINT) AS gx,
                 user_id % 100 AS gy
          FROM events
        ),
        z AS (
          SELECT gx, gy, {_z_interleave('gx', 'gy', 7, '//')} AS z FROM g
        )
        SELECT z // 64 AS zbucket, count(*) AS cnt,
               max(gx) - min(gx) AS gx_span,
               max(gy) - min(gy) AS gy_span
        FROM z GROUP BY zbucket
    """,
    "q_cdc_merge": """
        WITH snap AS (
          SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS totalprice
          FROM orders
        ),
        upd AS (
          SELECT o_orderkey, 'X' AS status,
                 floor(totalprice * 1.1 * 10000 + 0.5) / 10000 AS totalprice
          FROM snap WHERE o_orderkey % 7 = 0
        ),
        ins AS (
          SELECT o_orderkey + 10000000 AS o_orderkey, status, totalprice
          FROM snap WHERE o_orderkey % 97 = 0
        ),
        chg AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        SELECT coalesce(c.o_orderkey, s.o_orderkey) AS o_orderkey,
               CASE WHEN c.o_orderkey IS NOT NULL THEN c.status
                    ELSE s.status END AS status,
               floor(CASE WHEN c.o_orderkey IS NOT NULL THEN c.totalprice
                          ELSE s.totalprice END * 10000 + 0.5) / 10000 AS tp
        FROM snap s FULL OUTER JOIN chg c ON s.o_orderkey = c.o_orderkey
    """,
    "q_state_merge": """
        SELECT event_type, count(*) AS cnt,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS val_sum
        FROM events GROUP BY event_type
    """,
    "q_snapshot_diff": """
        WITH snap AS (
          SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS tp
          FROM orders
        ),
        upd AS (
          SELECT k, 'X' AS s, floor(tp * 1.1 * 10000 + 0.5) / 10000 AS tp
          FROM snap WHERE k % 7 = 0
        ),
        keep AS (SELECT * FROM snap WHERE k % 7 != 0 AND k % 13 != 0),
        ins AS (
          SELECT k + 10000000 AS k, s, tp FROM snap WHERE k % 97 = 0
        ),
        succ AS (
          SELECT * FROM keep
          UNION ALL SELECT * FROM upd WHERE k % 13 != 0
          UNION ALL SELECT * FROM ins
        ),
        j AS (
          SELECT snap.k AS ka, snap.s AS s_a, snap.tp AS tp_a,
                 succ.k AS kb, succ.s AS s_b, succ.tp AS tp_b
          FROM snap FULL OUTER JOIN succ ON snap.k = succ.k
        ),
        c AS (
          SELECT CASE
                   WHEN ka IS NULL THEN 'added'
                   WHEN kb IS NULL THEN 'removed'
                   WHEN s_a IS NOT DISTINCT FROM s_b
                    AND tp_a IS NOT DISTINCT FROM tp_b THEN 'unchanged'
                   ELSE 'updated'
                 END AS cls,
                 coalesce(s_b, s_a) AS status
          FROM j
        )
        SELECT cls, status, count(*) AS cnt FROM c GROUP BY cls, status
    """,
    "q_salted_join": """
        SELECT user_id % 7 AS seg, count(*) AS cnt,
               CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY seg
    """,
    "q_scd2_intervals": """
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS tsn
          FROM events
        ),
        f AS (
          SELECT *, CASE WHEN lag(event_type) OVER w
                          IS DISTINCT FROM event_type
                     THEN 1 ELSE 0 END AS chg
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
        ),
        g AS (
          SELECT *, CAST(sum(chg) OVER (
                   PARTITION BY user_id ORDER BY tsn, event_id
                   ROWS UNBOUNDED PRECEDING
                 ) AS BIGINT) AS island
          FROM f
        ),
        s AS (
          SELECT user_id, island, min(event_type) AS event_type,
                 min(tsn) AS valid_from, count(*) AS n_events
          FROM g GROUP BY user_id, island
        )
        SELECT user_id, island, event_type, valid_from,
               lead(valid_from) OVER (
                 PARTITION BY user_id ORDER BY valid_from
               ) AS valid_to,
               n_events
        FROM s
    """,
    "q_bucketed_join": """
        SELECT o_orderpriority, count(*) AS n_lines,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)
                 AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
}
