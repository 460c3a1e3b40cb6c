"""General relational surface: joins, windows, subqueries, set ops, stats.

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
    topk,
)

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403



def q_null_semantics(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — null-handling family: nullif, coalesce, null-safe equality."""
    df = table(spark, sf, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        df.select(
            "o_orderkey",
            F.coalesce(status_or_null, F.lit("PENDING")).alias("status2"),
            status_or_null.eqNullSafe(F.lit("O")).alias("is_open_nullsafe"),
            status_or_null.isNull().alias("was_pending"),
        )
    )


def q_sort_multi(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — multi-key global sort + limit (TakeOrderedAndProject)."""
    df = table(spark, sf, "orders")
    return (
        df.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.asc("o_orderstatus"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(50)
    )


def q_string_functions(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — string-function family with engine-identical semantics."""
    df = table(spark, sf, "customer")
    name = F.col("c_name")
    return df.select(
        "c_custkey",
        F.upper(name).alias("up"),
        F.substring(name, 10, 5).alias("mid"),
        F.length(name).alias("len"),
        F.regexp_replace(name, "0", "_").alias("subbed"),
        F.reverse(name).alias("rev"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.concat_ws("-", F.lit("C"), F.col("c_mktsegment")).alias("tagged"),
    )


def q_array_functions(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — array-function family over a derived token array."""
    df = table(spark, sf, "orders")
    arr = F.split("o_orderpriority", "-")
    return df.select(
        "o_orderkey",
        F.size(arr).alias("n"),
        F.array_contains(arr, "URGENT").alias("has_urgent"),
        F.element_at(arr, -1).alias("last_el"),
        F.array_join(F.array_sort(arr), "|").alias("sorted_join"),
        F.array_join(F.array_sort(F.array_distinct(F.concat(arr, arr))), "|").alias("dedup_join"),
    )


def q_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — scalar-subquery pattern: orders above the global average
    price. Spark-side: the single-row aggregate is broadcast-cross-joined
    (what Catalyst decorrelates a scalar subquery into)."""
    orders = table(spark, sf, "orders")
    avg_row = orders.agg(
        text.round4(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price")
    )
    return (
        orders.crossJoin(F.broadcast(avg_row))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.max("avg_price").alias("avg_price"),
        )
    )


def q_correlated_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — correlated-subquery pattern: each customer's most expensive
    order. Decorrelated form: per-key aggregate joined back on (key, max)."""
    orders = table(spark, sf, "orders")
    maxes = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max("o_totalprice").alias("max_price")
    )
    return (
        orders.join(
            maxes,
            (orders["o_custkey"] == maxes["ck"])
            & (orders["o_totalprice"] == maxes["max_price"]),
        )
        .groupBy("o_custkey")
        .agg(
            F.min("o_orderkey").alias("orderkey"),  # dedup exact-tie orders
            F.max("max_price").alias("max_price"),
        )
    )


def q_window_functions(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — window-function family: lag, rank, running sum per user over
    event time (deterministic via event_id tiebreak)."""
    from pyspark.sql import Window

    df = table(spark, sf, "events")
    df = df.withColumn("tsn", catalog.event_ts_us(df))
    w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.select(
        "event_id",
        "user_id",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.rank().over(w).alias("rnk"),
        text.round4(F.sum(F.col("value").cast("decimal(18,2)")).over(wsum).cast("double")).alias("run_sum"),
    )


def q_rolling_window(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — time-RANGE window frame: per-user rolling 7-day event count
    and value sum at each event. The frame is a range over epoch-µs (not
    N rows), so peers at the same timestamp are all included and the
    output is tie-order independent — the rolling-feature shape of a
    user-activity pipeline. One shuffle on user_id."""
    from pyspark.sql import Window

    df = table(spark, sf, "events")
    df = df.withColumn("tsn", catalog.event_ts_us(df))
    week_us = 7 * 86400 * 10**6
    w = (
        Window.partitionBy("user_id")
        .orderBy("tsn")
        .rangeBetween(-week_us, 0)
    )
    return df.select(
        "user_id",
        "event_id",
        "tsn",
        F.count(F.lit(1)).over(w).alias("roll_cnt"),
        text.round4(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
        ).alias("roll_sum"),
    )


def q_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — left semi join: customers having at least one order."""
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    return (
        cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"], "left_semi"
        )
        .select("c_custkey", "c_mktsegment")
    )


def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — left anti join: customers with no pending ('P') order."""
    cust = table(spark, sf, "customer")
    pending = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        cust.join(
            pending, cust["c_custkey"] == pending["o_custkey"], "left_anti"
        )
        .select("c_custkey", "c_mktsegment")
    )


def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — as-of join: each purchase matched to the user's latest signup
    at-or-before it (union + forward-fill window; one shuffle)."""
    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id"), F.col("tsn").alias("ts")
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", F.col("tsn").alias("ts"))
        .agg(F.max("value").alias("state"))
    )
    out = join_ops.asof_join(
        purchases, signups, by="user_id", left_time="ts", right_time="ts",
        value_cols=("state",),
    )
    return out.select(
        "user_id", "event_id", "ts", "matched_time", "matched_state"
    )


def q_asof_join_forward(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — FORWARD as-of join: each click matched to the user's next
    purchase at-or-after it (time-to-next-purchase), the mirror of
    q_asof_join's backward match. Same union + fill window composition,
    scanned time-DESCENDING with right rows first at equal timestamps
    so the equal-time match stays inclusive; still ONE shuffle on the
    by-key and one row of window state — the 100 TB plan is unchanged
    by direction. Also emits the wait in µs (exact integers)."""
    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id"), F.col("tsn").alias("ts")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("tsn").alias("ts"))
        .agg(F.max("value").alias("state"))
    )
    out = join_ops.asof_join(
        clicks, purchases, by="user_id", left_time="ts", right_time="ts",
        value_cols=("state",), direction="forward",
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        "matched_time",
        "matched_state",
        (F.col("matched_time") - F.col("ts")).alias("wait_us"),
    )


def q_point_in_time_features(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — feature-store POINT-IN-TIME join: attach training features
    to a label spine (purchase events) with leakage-strict semantics —
    every feature uses only data STRICTLY BEFORE the label instant
    (same-microsecond events excluded: in the union sort the spine row
    takes side 0 < feature side 1, so the backward fill cannot see a
    same-t feature), plus a freshness SLA (last-click feature counts as
    fresh only within 72 h). Two features in ONE keyed union sort — the
    100 TB PIT plan, no range join:

    - ``last_click_v`` / ``click_age_us``: latest click value before t
      (clicks pre-aggregated per (user, µs) so the argmax is unique),
      via last_value(ignorenulls) over (t, side) ROWS;
    - ``clicks_24h``: count of clicks in [t−24h, t), via a RANGE window
      (−24h, −1 µs) summing the pre-aggregated per-instant counts.

    Oracle: correlated scalar subqueries per spine row — the obviously-
    correct form, cross-checking the single-pass window plan."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    spine = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.col("tsn").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("double").alias("cv"),
        F.lit(None).cast("long").alias("c_cnt"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "tsn")
        .agg(
            F.max("value").alias("cv"),
            F.count(F.lit(1)).alias("c_cnt"),
        )
        .select(
            "user_id",
            F.lit(None).cast(dict(ev.dtypes)["event_id"]).alias("event_id"),
            F.col("tsn").alias("t"),
            F.lit(1).alias("side"),
            "cv",
            "c_cnt",
        )
    )
    u = spine.unionByName(clicks)
    w_last = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rng = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-86_400_000_000, -1)
    )
    u = (
        u.withColumn("last_cv", F.last("cv", ignorenulls=True).over(w_last))
        .withColumn(
            "last_ct",
            F.last(
                F.when(F.col("side") == 1, F.col("t")), ignorenulls=True
            ).over(w_last),
        )
        .withColumn(
            "clicks_24h",
            F.coalesce(
                F.sum(F.when(F.col("side") == 1, F.col("c_cnt"))).over(
                    w_rng
                ),
                F.lit(0),
            ).cast("long"),
        )
    )
    age = F.col("t") - F.col("last_ct")
    return (
        u.filter(F.col("side") == 0)
        .select(
            "user_id",
            "event_id",
            "clicks_24h",
            text.round4(F.col("last_cv")).alias("last_click_v"),
            age.cast("long").alias("click_age_us"),
            F.when(F.col("last_ct").isNotNull() & (age <= 259_200_000_000), 1)
            .otherwise(0)
            .cast("int")
            .alias("fresh"),
        )
        .orderBy("user_id", "event_id")
    )


def q_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — NEAREST as-of join, completing the direction family
    (backward q_asof_join, forward q_asof_join_forward): each click
    matched to the user's temporally CLOSEST purchase, either side,
    backward winning exact-distance ties. One union + ONE keyed sort
    feeds BOTH fills (last_value ignorenulls backward, first_value
    ignorenulls forward) — still one shuffle and O(1) window state per
    partition, proof the 100 TB as-of plan extends to the nearest
    variant without a range join. Equal timestamps stay inclusive
    (right rows sort before left). Deltas are exact µs integers."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "event_id",
        F.col("tsn").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("rts"),
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.lit(None).cast("long").alias("event_id"),
            F.col("tsn").alias("t"),
            F.lit(0).alias("side"),
            F.col("tsn").alias("rts"),
        )
        .distinct()
    )
    u = clicks.unionAll(purch)
    back = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = u.withColumn(
        "prev_t", F.last("rts", ignorenulls=True).over(back)
    ).withColumn("next_t", F.first("rts", ignorenulls=True).over(fwd))
    db = F.col("t") - F.col("prev_t")
    df_ = F.col("next_t") - F.col("t")
    nearest = (
        F.when(F.col("prev_t").isNull(), F.col("next_t"))
        .when(F.col("next_t").isNull(), F.col("prev_t"))
        .when(db <= df_, F.col("prev_t"))
        .otherwise(F.col("next_t"))
    )
    direction = (
        F.when(nearest.isNull(), F.lit(None).cast("string"))
        .when(nearest == F.col("prev_t"), "backward")
        .otherwise("forward")
    )
    return (
        u.filter(F.col("side") == 1)
        .select(
            "user_id",
            "event_id",
            F.col("t").alias("ts"),
            nearest.alias("matched_time"),
            direction.alias("direction"),
            F.abs(nearest - F.col("t")).alias("delta_us"),
        )
    )


def q_inventory_balance(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — clamped-at-zero running inventory per part (stock can't go
    negative): the Lindley recursion W_t = max(0, W_{t−1} + x_t), which
    LOOKS inherently sequential/stateful, solved fully relationally via
    the reflection identity W_t = P_t − min(0, min_{j≤t} P_j) — one
    prefix-sum window plus one running-min window over the same
    part-keyed order, no recursion, no UDF, no state. Movements are
    exact bigints (+qty on returns 'R', −qty otherwise; quantities are
    integer-valued), order is made total with (shipdate, orderkey,
    linenumber). Reports the 20 busiest parts: final balance (max_by
    on row number), peak balance, clamp count (rows where the running
    min reaches a NEW strict minimum below zero ⇔ the stock actually
    floored). Scales by the part-keyed shuffle; windows never leave
    the partition."""
    from pyspark.sql import Window

    li = table(spark, sf, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.col("l_returnflag") == "R",
            F.col("l_quantity").cast("long"),
        )
        .otherwise(-F.col("l_quantity").cast("long"))
        .alias("mv"),
    )
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    wc = (
        Window.partitionBy("l_partkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wp = (
        Window.partitionBy("l_partkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = (
        li.withColumn("pfx", F.sum("mv").over(wc))
        .withColumn("rmin", F.min("pfx").over(wc))
        .withColumn("rmin_prev", F.min("pfx").over(wp))
        .withColumn("rn", F.row_number().over(Window.partitionBy("l_partkey").orderBy(*order)))
    )
    w = F.col("pfx") - F.least(F.lit(0), F.col("rmin"))
    clamp = F.when(
        (F.col("pfx") < 0)
        & (
            F.col("rmin_prev").isNull()
            | (F.col("pfx") < F.col("rmin_prev"))
        ),
        1,
    ).otherwise(0)
    out = (
        r.withColumn("w", w)
        .withColumn("clamp", clamp)
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_mov"),
            F.max_by("w", "rn").alias("final_balance"),
            F.max("w").alias("peak_balance"),
            F.sum("clamp").cast("long").alias("n_clamps"),
        )
        .orderBy(F.desc("n_mov"), "l_partkey")
        .limit(20)
    )
    return out.select(
        F.col("l_partkey").alias("partkey"),
        "n_mov",
        "final_balance",
        "peak_balance",
        "n_clamps",
    )


def q_dp_counts(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — differentially-private count release (ε=1 Laplace
    mechanism), the third leg of the privacy battery next to
    q_k_anonymity / q_l_diversity: per-event-type counts plus Laplace
    noise drawn by inverse-CDF — noise = −b·sign(u−½)·ln(1−2|u−½|),
    b = 1/ε — from the portable 60-bit md5 uniform, so the "random"
    draw is a pure function of the group key and both engines release
    the identical noised value. (A seeded release is how you make a DP
    pipeline auditable/replayable; the privacy budget accounting is
    unchanged.) One map-side-combining aggregate; noise is O(#groups)
    arithmetic."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    ev = table(spark, sf, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    u = portable_token_hash(
        F.concat(F.lit("dp:"), F.col("event_type"))
    ) / F.lit(float(1 << 60))
    half = u - F.lit(0.5)
    noise = (
        -F.lit(1.0)
        * F.signum(half)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(half))
    )
    return c.select(
        "event_type",
        "n",
        text.round4(F.col("n") + noise).alias("n_dp"),
    ).orderBy("event_type")


def q_grouped_ols(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — grouped OLS slopes with a pooled row (the Simpson's-paradox
    screen): slope of extended price on quantity per return-flag AND
    pooled over all rows, via ``rollup`` so both granularities come out
    of ONE aggregate pass. Sufficient statistics are EXACT — Σx, Σx²
    bigint, Σy, Σxy decimal (quantity is integer-valued; price casts to
    decimal(20,6)) — and only THEN cast to double, so the slope
    (Σxy − ΣxΣy/n)/(Σx² − (Σx)²/n) is the same IEEE expression over the
    same four doubles on both engines (the Zipf-fit exact-stats lesson;
    the n·Σxy cross-multiplied form is avoided deliberately — it
    overflows decimal(38) at scale). Map-side combine does the heavy
    lifting; the rollup adds one extra partial per partition, not a
    second scan."""
    li = table(spark, sf, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.col("l_extendedprice").cast("decimal(20,6)").alias("y"),
    )
    a = li.rollup("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    num = F.col("sxy").cast("double") - sxd * F.col("sy").cast(
        "double"
    ) / nd
    den = F.col("sxx").cast("double") - sxd * sxd / nd
    return a.select(
        F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("grp"),
        "n",
        text.round4(
            F.when(den > 0, num / den)
        ).alias("slope"),
    ).orderBy("grp")


def q_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — range join via domain bucketing (equality join on buckets +
    residual filter; never a nested-loop cross product)."""
    events = table(spark, sf, "events")
    intervals = (
        table(spark, sf, "nation")
        .select(
            F.col("n_nationkey").alias("interval_id"),
            (F.col("n_nationkey") * 4.0).alias("lo"),
            (F.col("n_nationkey") * 4.0 + 10.0).alias("hi"),
        )
    )
    joined = join_ops.range_join(
        events.select("event_id", "value"), intervals, "value"
    )
    return joined.groupBy("interval_id").agg(F.count(F.lit(1)).alias("cnt"))


def q_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — unpivot/melt: wide per-status counts back to long form."""
    df = table(spark, sf, "lineitem")
    wide = (
        df.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .select(
            "l_returnflag",
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
        )
    )
    return wide.unpivot(
        ["l_returnflag"], ["o_cnt", "f_cnt"], "status", "cnt"
    )


def q_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-K1 — top-2 values per group via window row_number."""
    return topk.topk_per_group(
        table(spark, sf, "lineitem"), "l_returnflag", "l_linestatus", k=2
    )


def q_profile(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — one-pass column profiler over documents (nulls, distinct,
    min/max per column, long format). exact=True swaps the HLL sketch
    for count(DISTINCT) so the output is cross-engine-checkable; the
    default approx path is the 100 TB shape (same plan minus Expand)."""
    from data_wrangle_openstreetmaps_data_spark.operators import quality

    return quality.profile(
        table(spark, sf, "documents"),
        cols=["doc_id", "lang", "source", "n_chars"],
        exact=True,
    )


def q_find_one(spark: SparkSession, sf: str) -> DataFrame:
    """S6 — find_one() analog, made deterministic with an explicit order
    (openstreet_kolkata.py:593)."""
    df = table(spark, sf, "orders")
    return (
        df.select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
        .limit(1)
    )


def q_pivot_counts(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — pivot: linestatus columns per returnflag row."""
    df = table(spark, sf, "lineitem")
    return (
        df.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .select(
            "l_returnflag",
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
        )
    )


def q_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — exact interpolated percentiles of order value per status."""
    df = table(spark, sf, "orders")
    return df.groupBy("o_orderstatus").agg(
        *[
            text.round4(F.expr(f"percentile(o_totalprice, {q})")).alias(f"p{int(q*100)}")
            for q in (0.5, 0.9, 0.99)
        ]
    )


def q_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — weighted median per group (the operator plain
    percentile() can't express): per part brand, the line-item price
    at which HALF the total QUANTITY sits below — lower weighted
    median = first value whose running weight reaches ceil(W/2).

    Histogram form (the q_ks_test discipline): weights collapse onto
    DISTINCT (brand, cents) points with one hash aggregate BEFORE any
    window, so the brand-partitioned cumulative sum runs over the
    value histogram, not the row stream — with 25 brands, the r11 row
    form sorted n/25 raw rows per task (the worst ladder entry, 3.9×
    per 10× data); the histogram's size is bounded by distinct price
    points. Cum weight at a price point equals the row-form running
    weight at that point's LAST row, so the crossing price (and the
    whole result) is provably identical. The crossing row itself is
    then min(cents) per brand — a plain aggregate, no second window.
    All weights and prices are exact integers, unambiguous
    cross-engine."""
    from pyspark.sql import Window

    li = table(spark, sf, "lineitem").join(
        F.broadcast(
            table(spark, sf, "part").select("p_partkey", "p_brand")
        ),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    # cents via the FLOOR trick (r14, the q_tpch_q1 discipline):
    # floor(x·100 + 0.5) is value-identical to the decimal(20,6) cast
    # on 2-dp-grid money (x·100 lands within ~1e-9 of the grid integer,
    # never near a .5 tie) and stays primitive in codegen instead of
    # allocating two BigDecimals per lineitem row; oracle re-verified
    # at 3 SFs after the swap.
    d = li.select(
        F.col("p_brand").alias("brand"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    h = d.groupBy("brand", "cents").agg(F.sum("w").alias("w"))
    # Per-brand total as an UNBOUNDED window over the SAME brand
    # partitioning as the running sum (r12 verdict item 7): a separate
    # groupBy("brand") pass re-executed the whole scan→broadcast-join→
    # histogram subtree (Spark does not reuse identical non-exchange
    # subtrees) — two file scans for one histogram. Both windows share
    # one sorted exchange; values are provably identical.
    wcum = (
        Window.partitionBy("brand")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("brand")
    c = h.select(
        "brand",
        "cents",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wall).cast("long").alias("wtot"),
    )
    return (
        c.filter(F.col("cw") * 2 >= F.col("wtot"))
        .groupBy("brand", "wtot")
        .agg(F.min("cents").alias("wmedian_cents"))
        .orderBy("brand")
    )


def q_stats_moments(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — avg/stddev/min/max + correlation, rounded portably."""
    df = table(spark, sf, "lineitem")
    return df.agg(
        text.round4(F.avg("l_quantity")).alias("avg_qty"),
        text.round4(F.stddev_samp("l_quantity")).alias("sd_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        text.round4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qp"),
    )


def q_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — fixed-width binning histogram of event values."""
    df = table(spark, sf, "events")
    bin_ = F.floor(F.col("value") / 10).cast("long")
    return df.groupBy(bin_.alias("bin")).agg(F.count(F.lit(1)).alias("cnt"))


def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — multi-granularity aggregate via GROUPING SETS: per
    event_type, per user-cohort (user_id mod 10), and the grand total in
    ONE pass over the fact table (Expand + single hash aggregate), instead
    of three scans unioned."""
    df = table(spark, sf, "events").select(
        "event_type",
        (F.col("user_id") % 10).alias("cohort"),
        "value",
    )
    return (
        df.groupingSets(
            [["event_type"], ["cohort"], []], "event_type", "cohort"
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            text.round4(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            ).alias("val_sum"),
        )
    )


def q_grouping_sets_ranked(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — GROUPING SETS composed with a window: the multi-granularity
    aggregate (per type / per cohort / grand total in one Expand pass)
    is then ranked WITHIN each grouping level by count. grouping_id()
    disambiguates levels (standard bit convention — first grouping
    column is the most significant bit — matching DuckDB's
    GROUPING(a, b)); the rank partition is the level, so the window
    state is bounded by the largest level's cardinality (|types| or
    |cohorts|), never the fact table. Tiebreaks are deterministic: the
    non-constant key column within each level is unique."""
    from pyspark.sql import Window

    df = table(spark, sf, "events").select(
        "event_type",
        (F.col("user_id") % 10).alias("cohort"),
        "value",
    )
    g = (
        df.groupingSets(
            [["event_type"], ["cohort"], []], "event_type", "cohort"
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            text.round4(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            ).alias("val_sum"),
            F.grouping_id().cast("int").alias("lvl"),
        )
    )
    w = Window.partitionBy("lvl").orderBy(
        F.desc("cnt"), "event_type", "cohort"
    )
    return g.select(
        "event_type", "cohort", "lvl", "cnt", "val_sum",
        F.rank().over(w).alias("rnk"),
    )


def q_equidepth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — equi-depth (decile) histogram of event values: the 9 decile
    boundaries come from ONE percentile aggregate row broadcast back over
    the scan, and each value's bucket is how many boundaries it exceeds —
    no global sort, no ntile window funnel. Boundaries and values are
    4-dp-rounded on both engines before comparison so bucket assignment
    is deterministic cross-engine."""
    df = table(spark, sf, "events").select("value")
    qs = ", ".join(str(i / 10) for i in range(1, 10))
    bnds = df.agg(
        F.transform(
            F.expr(f"percentile(value, array({qs}))"),
            lambda b: F.floor(b * 10000 + F.lit(0.5)) / 10000,
        ).alias("bnds")
    )
    v = F.floor(F.col("value") * 10000 + F.lit(0.5)) / 10000
    return (
        df.crossJoin(F.broadcast(bnds))
        .select(
            v.alias("v"),
            F.size(F.filter(F.col("bnds"), lambda b: v > b)).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


def q_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — semi-structured JSON column processing: extract props.k and
    aggregate per event type (get_json_object / JSON path)."""
    df = table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        df.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("k").isNotNull(), 1)).alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — privacy governance audit: k-anonymity over the customer
    quasi-identifier tuple (market segment, nation, account-balance
    band). A released dataset is k-anonymous iff every QI group holds
    ≥ k rows; this returns the VIOLATING groups (count < 5) with their
    sizes plus each group's share of the table — the rows a release
    pipeline must suppress or generalize. One group-count over the QI
    projection (map-side combine; |groups| bounded by the QI domain),
    then a broadcast total — no second scan."""
    c = table(spark, sf, "customer")
    qi = c.select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    groups = qi.groupBy("c_mktsegment", "c_nationkey", "bal_band").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = c.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        groups.filter(F.col("cnt") < 5)
        .crossJoin(F.broadcast(total))
        .select(
            "c_mktsegment",
            "c_nationkey",
            "bal_band",
            "cnt",
            text.round4(
                F.col("cnt") / F.col("n_total")
            ).alias("share"),
        )
        .orderBy("c_mktsegment", "c_nationkey", "bal_band")
    )


def q_keyset_pagination(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — keyset (seek) pagination, page 3 of orders by
    (totalprice DESC, orderkey): the boundary row of page 2 becomes a
    PUSHED-DOWN predicate `(price, key) after boundary` + LIMIT 20 —
    the pagination that stays O(page) at 100 TB, where OFFSET must
    sort-and-skip everything before it. The boundary is a 1-row driver
    lookup (like the ANN query vectors); prices compare as exact cents.
    The oracle runs the OFFSET form — the hash match IS the
    keyset ≡ offset equivalence proof."""
    o = table(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(20,6)") * 100)
        .cast("long")
        .alias("cents"),
    )
    boundary = (
        o.orderBy(F.desc("cents"), "o_orderkey")
        .limit(40)
        .orderBy("cents", F.desc("o_orderkey"))
        .first()
    )
    p0, k0 = boundary["cents"], boundary["o_orderkey"]
    return (
        o.filter(
            (F.col("cents") < F.lit(p0))
            | (
                (F.col("cents") == F.lit(p0))
                & (F.col("o_orderkey") > F.lit(k0))
            )
        )
        .orderBy(F.desc("cents"), "o_orderkey")
        .limit(20)
    )


def q_target_encoding(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — smoothed target encoding (the ML feature-engineering op):
    each customer nation encoded as (Σ target + m·global_mean)/(n + m)
    with prior weight m=10 — the shrinkage that keeps rare categories
    from memorizing noise. Target = order totalprice in exact cents;
    the global mean enters as an exact cents ratio, so the encode is
    (cents_k·N + 10·cents_tot·n_k/N ...) — evaluated as doubles from
    exact bigints in ONE mirrored expression. One (nation) aggregate +
    a broadcast global; 25 output rows, the encoding table a feature
    store would publish."""
    o = table(spark, sf, "orders").join(
        table(spark, sf, "customer").select("c_custkey", "c_nationkey"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    per = o.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum(F.col("o_totalprice").cast("decimal(20,6)")) * 100)
        .cast("long")
        .alias("cents"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("cents").cast("long").alias("ct"),
    )
    gmean = F.col("ct").cast("double") / F.col("nt").cast("double")
    enc = (
        F.col("cents").cast("double") + F.lit(10.0) * gmean
    ) / (F.col("n").cast("double") + F.lit(10.0))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "n",
            text.round4(
                F.col("cents").cast("double")
                / F.col("n").cast("double")
                / F.lit(100.0)
            ).alias("raw_mean"),
            text.round4(enc / F.lit(100.0)).alias("encoded"),
        )
        .orderBy("c_nationkey")
    )


def q_woe_iv(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — weight of evidence / information value per market segment
    against the binary outcome 'order went F(ailed)' — the
    credit-scoring feature screen: WoE_k = ln(p_event,k / p_nonevent,k)
    and the IV term (p_e − p_n)·WoE per category (terms emitted PER ROW
    like q_psi_drift, so no cross-engine float sum exists; Σ terms > 0.1
    reads 'predictive'). Counts are exact; the two ratios and the ln
    are one mirrored expression. One (segment, outcome) aggregate
    (map-side combined) + a broadcast 1-row total."""
    o = table(spark, sf, "orders").join(
        F.broadcast(
            table(spark, sf, "customer").select(
                "c_custkey", "c_mktsegment"
            )
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    per = o.groupBy("c_mktsegment").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1))
        .cast("long")
        .alias("ev"),
        F.count(F.when(F.col("o_orderstatus") != "F", 1))
        .cast("long")
        .alias("ne"),
    )
    tot = per.agg(
        F.sum("ev").cast("long").alias("evt"),
        F.sum("ne").cast("long").alias("net"),
    )
    pe = F.col("ev").cast("double") / F.col("evt").cast("double")
    pn = F.col("ne").cast("double") / F.col("net").cast("double")
    woe = F.log(pe / pn)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            "ev",
            "ne",
            text.round4(woe).alias("woe"),
            text.round4((pe - pn) * woe).alias("iv_term"),
        )
        .orderBy("c_mktsegment")
    )


def q_join_cardinality(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — join-cardinality estimation WITHOUT running the join (the
    optimizer-statistics question): for the orders⋈orders self-join on
    order date, the exact output size is Σ_k n(k)² from one per-key
    count aggregate, compared against the uniform-assumption estimate
    N²/d that a naive cost model uses — their ratio IS the key-skew
    factor that decides broadcast vs salted strategies. At 100 TB this
    is why you maintain per-key histograms: the |keys|-row aggregate
    costs one shuffle, the mis-planned join it prevents costs hours.
    All counts exact bigint (Σn² in decimal(38,0)/HUGEINT); two double
    divisions at the end."""
    o = table(spark, sf, "orders").select(
        F.to_date("o_orderdate").alias("d")
    )
    per = o.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    n19 = F.col("n").cast("decimal(19,0)")
    agg = per.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(n19 * n19).cast("decimal(38,0)").alias("actual_pairs"),
        F.max("n").cast("long").alias("max_key"),
    )
    nr = F.col("n_rows").cast("double")
    uniform = nr * nr / F.col("n_keys").cast("double")
    return agg.select(
        "n_rows",
        "n_keys",
        F.col("actual_pairs").cast("long").alias("actual_pairs"),
        F.floor(uniform).cast("long").alias("uniform_estimate"),
        text.round4(
            F.col("actual_pairs").cast("double") / uniform
        ).alias("skew_factor"),
        "max_key",
    )


def q_join_skew_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — pre-join key-skew diagnostics for the lineitem join key:
    distinct keys, max key frequency, the top-5 keys' share of all
    rows, and the p99/median frequency ratio — the numbers that decide
    between a plain shuffle join, AQE skew splitting, and salting
    BEFORE you pay for the join at 100 TB. One group-count over the key
    (map-side combined), then scalar aggregates over the |keys|-sized
    frequency frame; the top-5 is a distributed TakeOrdered."""
    li = table(spark, sf, "lineitem")
    freq = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("f"))
    top5 = (
        freq.orderBy(F.desc("f"), "l_orderkey")
        .limit(5)
        .agg(F.sum("f").alias("top5_rows"))
    )
    stats = freq.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("f").alias("n_rows"),
        F.max("f").alias("max_freq"),
        F.expr("percentile(f, 0.5)").alias("_p50"),
        F.expr("percentile(f, 0.99)").alias("_p99"),
    )
    return stats.crossJoin(F.broadcast(top5)).select(
        "n_keys",
        "n_rows",
        "max_freq",
        text.round4(F.col("top5_rows") / F.col("n_rows")).alias(
            "top5_share"
        ),
        text.round4(F.col("_p99") / F.col("_p50")).alias(
            "p99_over_median"
        ),
    )


def q_functional_dependency(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — functional-dependency discovery (the schema-profiling
    primitive): for candidate FDs A → B, count the violating LHS values
    (those determining > 1 distinct RHS) and the violation share.
    Checked here: o_custkey → o_orderpriority (should fail — customers
    order at many priorities) and o_orderkey → o_orderstatus (must
    hold — key determines everything). Each FD is ONE
    distinct+group-count pass over its column pair; at 100 TB you run
    the candidate lattice level-wise with exactly this shape per
    candidate. Exact counts only."""
    o = table(spark, sf, "orders")

    def fd(lhs: str, rhs: str) -> DataFrame:
        per = (
            o.select(lhs, rhs)
            .distinct()
            .groupBy(lhs)
            .agg(F.count(F.lit(1)).alias("n_rhs"))
        )
        return per.agg(
            F.lit(f"{lhs} -> {rhs}").alias("fd"),
            F.count(F.lit(1)).alias("n_lhs"),
            F.count(F.when(F.col("n_rhs") > 1, F.lit(1))).alias(
                "n_violating"
            ),
            text.round4(
                F.count(F.when(F.col("n_rhs") > 1, F.lit(1)))
                / F.count(F.lit(1))
            ).alias("violation_share"),
        )
    return (
        fd("o_custkey", "o_orderpriority")
        .unionByName(fd("o_orderkey", "o_orderstatus"))
        .orderBy("fd")
    )


def q_change_point(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — single change-point detection (AMOC) on the daily event
    count series per type: the split day t maximizing the between-
    segment score n1·n2/(n1+n2)·(mean1 − mean2)², i.e. the strongest
    mean shift. Prefix sums over the day-aggregated frame (calendar-
    bounded) give every split's segment sums in one window pass; the
    argmax is a deterministic struct-max (score 4dp-floored, day
    tiebreak). Exact bigint sums; doubles only at the two means and the
    final score — the classic offline changepoint screen you run per
    key over a 100 TB log after one daily aggregate."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(catalog.event_ts(ev)).alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    tot = Window.partitionBy("event_type")
    d = daily.select(
        "event_type",
        "day",
        F.sum("y").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("s1"),
        F.row_number().over(w).alias("n1"),
        F.sum("y").over(tot).alias("st"),
        F.count(F.lit(1)).over(tot).alias("nt"),
    ).filter(F.col("n1") < F.col("nt"))  # split AFTER day, both sides non-empty
    n1 = F.col("n1").cast("double")
    n2 = (F.col("nt") - F.col("n1")).cast("double")
    m1 = F.col("s1") / n1
    m2 = (F.col("st") - F.col("s1")) / n2
    score = text.round4(
        n1 * n2 / (n1 + n2) * (m1 - m2) * (m1 - m2)
    )
    scored = d.select(
        "event_type",
        F.struct(
            score.alias("score"),
            F.date_format("day", "yyyy-MM-dd").alias("split_day"),
        ).alias("cand"),
    )
    best = scored.groupBy("event_type").agg(F.max("cand").alias("b"))
    return best.select(
        "event_type",
        F.col("b.split_day").alias("split_day"),
        F.col("b.score").alias("score"),
    ).orderBy("event_type")


def q_pseudonymize(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — keyed pseudonymization (the third leg of the privacy
    battery next to k-anonymity and l-diversity): user ids are replaced
    by a peppered-hash pseudonym (md5 of pepper||id, 16 hex chars) that
    is CONSISTENT — the same user always maps to the same pseudonym, so
    grouping, joining, and retention analyses still work on the
    de-identified table, while the raw id never leaves the projection.
    Output proves referential consistency: top-20 pseudonyms by event
    count with the count and distinct-type count — identical to the
    per-user numbers under the hash rename. Pure scan-side expression,
    no extra shuffle beyond the aggregate."""
    ev = table(spark, sf, "events")
    pid = F.substring(
        F.md5(
            F.concat(F.lit("pepper-2026|"), F.col("user_id").cast("string"))
            .cast("binary")
        ),
        1,
        16,
    )
    return (
        ev.select(pid.alias("pid"), "event_type")
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy(F.desc("n_events"), "pid")
        .limit(20)
    )


def q_l_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the attribute-disclosure companion to q_k_anonymity:
    l-diversity requires every quasi-identifier group to contain ≥ l
    DISTINCT values of the sensitive attribute (here market segment;
    QI = nation × balance band). A group can be k-anonymous yet leak
    the sensitive value if everyone in it shares one — this returns
    the groups with fewer than 3 distinct segments, with group size.
    One two-level aggregate (distinct collapse, then group stats)."""
    c = table(spark, sf, "customer")
    qi = c.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        "c_mktsegment",
    )
    g = qi.groupBy("c_nationkey", "bal_band").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_mktsegment").alias("n_sensitive"),
    )
    return (
        g.filter(F.col("n_sensitive") < 3)
        .orderBy("c_nationkey", "bal_band")
    )


def q_t_closeness(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the third leg of the privacy trio (q_k_anonymity,
    q_l_diversity): t-closeness audits how far each quasi-identifier
    group's SENSITIVE-value distribution strays from the table-wide
    one — a group can be k-anonymous AND l-diverse yet still leak
    ('90% of this group is AUTOMOBILE, the base rate is 20%'). For the
    categorical sensitive attribute (market segment) the distance is
    total variation: t = ½ Σ_s |p_s − q_s|, evaluated EXACTLY as
    Σ_s |c_s·N − g_s·n_c| / (2·n_c·N) — integer numerators on the
    common denominator, so no float sum ever forms; one division per
    group at the end. Support grid = groups × global segments from a
    broadcast 5-row aggregate (left join fills absent cells with 0,
    which still contribute |0·N − g_s·n_c|). Returns the 20 leakiest
    groups. Two (QI)-keyed aggregates + one broadcast; map-side
    combine carries the scan."""
    c = table(spark, sf, "customer")
    qi = c.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        "c_mktsegment",
    )
    cell = qi.groupBy("c_nationkey", "bal_band", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cs")
    )
    gsize = qi.groupBy("c_nationkey", "bal_band").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    gseg = qi.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("gs")
    )
    total = qi.agg(F.count(F.lit(1)).alias("n_total"))
    grid = (
        gsize.crossJoin(F.broadcast(gseg))
        .join(cell, ["c_nationkey", "bal_band", "c_mktsegment"], "left")
        .withColumn("cs", F.coalesce("cs", F.lit(0)))
        .crossJoin(F.broadcast(total))
    )
    num = F.abs(
        F.col("cs").cast("long") * F.col("n_total")
        - F.col("gs") * F.col("n_rows")
    )
    return (
        grid.groupBy("c_nationkey", "bal_band")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.sum(num).cast("long").alias("tv_num"),
            F.max(F.col("n_rows") * F.col("n_total"))
            .cast("long")
            .alias("denom"),
        )
        .select(
            "c_nationkey",
            "bal_band",
            "n_rows",
            text.round4(
                F.col("tv_num").cast("double")
                / (F.lit(2.0) * F.col("denom").cast("double"))
            ).alias("t_closeness"),
        )
        .orderBy(
            F.desc("t_closeness"), "c_nationkey", "bal_band"
        )
        .limit(20)
    )


def q_data_quality(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — ingest-gate quality report: null counts, range violations,
    duplicate keys, and referential-integrity violations in one row."""
    from data_wrangle_openstreetmaps_data_spark.operators import quality

    orders = table(spark, sf, "orders")
    customer = table(spark, sf, "customer")
    report = quality.quality_report(
        orders,
        non_null=["o_orderkey", "o_custkey", "o_orderstatus"],
        ranges={"o_totalprice": (0.0, 1e7)},
        unique="o_orderkey",
    )
    orphans = quality.referential_violations(
        orders, customer, "o_custkey", "c_custkey"
    ).agg(F.count(F.lit(1)).alias("orphan_orders"))
    return report.crossJoin(orphans)


def q_rollup_counts(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — grouping-sets surface absent from the reference (SURVEY.md
    §2.6): ROLLUP subtotals over (returnflag, linestatus)."""
    df = table(spark, sf, "lineitem")
    return df.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def q_cube_counts(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — CUBE over (orderstatus, orderpriority)."""
    df = table(spark, sf, "orders")
    return df.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def q_intersect_keys(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — INTERSECT (set op surface; reference has only implicit union)."""
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


def q_except_keys(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — EXCEPT ALL (multiset difference) then distinct: nation keys
    whose customer-row count exceeds their supplier-row count."""
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.exceptAll(s).distinct()


def q_date_extract(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — date-part extraction + conditional aggregation by month."""
    df = table(spark, sf, "events")
    ts = catalog.event_ts(df)
    return (
        df.select(
            F.year(ts).cast("long").alias("y"),
            F.month(ts).cast("long").alias("m"),
            F.col("value"),
        )
        .groupBy("y", "m")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


def q_rank_functions(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the rank-function family (rank / dense_rank / percent_rank /
    cume_dist) over per-user spend within each event type, top-10 by
    rank. Ordering is by the decimal-exact total ONLY, so tied users get
    identical rank rows and the rank<=10 cut is a deterministic SET.
    The window partitions by event type over the pre-aggregated
    |users|·|types| frame (never raw events); at extreme user counts the
    same numbers decompose into per-value count merges."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    totals = ev.groupBy("event_type", "user_id").agg(
        _dec_sum(F.col("value")).alias("total")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("total"))
    return (
        totals.select(
            "event_type",
            "user_id",
            text.round4(F.col("total")).alias("total4"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            text.round4(F.percent_rank().over(w)).alias("prnk"),
            text.round4(F.cume_dist().over(w)).alias("cdist"),
        )
        .filter(F.col("rnk") <= 10)
    )


def q_skyline(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — 2-D Pareto frontier (skyline) of customers over (total
    spend, order count): the points no other customer weakly dominates
    on both axes — multi-objective "best customers" without collapsing
    the axes into one score. Spend is an exact decimal-cents bigint, so
    the whole query is integer-deterministic. The frontier comes from
    :func:`operators.topk.skyline2d` — the blocked two-phase prefix-max
    (driver-sampled literal x-boundaries, per-block windows, broadcast
    cross-block maxima), never a global single-partition window; the
    oracle is the classic sequential running-max formulation."""
    from data_wrangle_openstreetmaps_data_spark.operators.topk import (
        skyline2d,
    )

    cust = (
        table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(20,6)")) * 100
            )
            .cast("long")
            .alias("spend_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    # skyline2d consumes its input FOUR times (bounds count, bounds
    # sample, block maxima, prefixed join) and each consumption
    # re-executed the whole orders→agg→agg pipeline before (r13).
    # Lazy persist: the bounds count() inside skyline2d fills the cache.
    from pyspark.storagelevel import StorageLevel

    pts = (
        cust.groupBy("spend_cents", "n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return skyline2d(pts, "spend_cents", "n_orders").orderBy(
        F.desc("spend_cents")
    )


def q_winsorized_mean(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — robust mean of order value per priority after winsorizing
    at the exact p05/p95 interpolated percentiles (the outlier-tolerant
    KPI companion to q_mad_outliers / q_zscore_outliers). Two passes:
    one percentile aggregate per group (exact sort-based percentile —
    switch to approx at 100 TB), broadcast-joined back for the clamp,
    then one plain aggregate; the raw mean rides along for contrast."""
    o = table(spark, sf, "orders")
    cuts = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.95)").alias("hi"),
    )
    clamped = o.join(F.broadcast(cuts), "o_orderpriority").select(
        "o_orderpriority",
        "o_totalprice",
        F.least(
            F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi")
        ).alias("w"),
    )
    return (
        clamped.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            text.round4(F.avg("o_totalprice")).alias("raw_mean"),
            text.round4(F.avg("w")).alias("winsorized_mean"),
        )
        .orderBy("o_orderpriority")
    )


_BENFORD = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}


def q_benford(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Benford first-digit audit of order values, the classic
    fabricated-data / fraud screen: observed leading-digit shares vs
    the log10(1+1/d) expectation. The digit comes from the exact
    integer part (floor → bigint → string head — no float formatting
    anywhere), the share divides exact integer counts, and the nine
    Benford constants are Python-folded literals identical in both
    engines. One scan, a 9-row aggregate, a broadcast total."""
    o = table(spark, sf, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = o.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = o.agg(F.count(F.lit(1)).alias("n"))
    exp = F.create_map(
        *[F.lit(x) for kv in _BENFORD.items() for x in kv]
    )[F.col("digit")]
    share = F.col("cnt") / F.col("n")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "cnt",
            text.round4(share).alias("share"),
            text.round4(exp).alias("benford"),
            text.round4(share - exp).alias("deviation"),
        )
        .orderBy("digit")
    )


def q_sequence_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — gap detection in a key sequence: the top-20 longest
    event_id ranges containing NO purchase event (the testdata's
    event_ids are globally dense, so the purchase-filtered subsequence
    has real gaps — ~1.6k at sf0.01) — the data-quality audit shape
    for "did the loader drop a range" / "which id ranges miss a type".
    Deliberately NOT a global-window lead: keys fall into fixed
    4096-key blocks (block = k div 4096, a pure projection — no range
    sampling, so every consumer sees the same blocks), within-block
    gaps come from a BLOCK-PARTITIONED lead window, and the only
    global window runs over the per-block (min,max) aggregate —
    |blocks| rows, ~4100× smaller than the key count — to catch gaps
    that straddle block boundaries (empty blocks fold in naturally:
    the boundary lead skips to the next PRESENT block's min). The
    DuckDB oracle is the naive global lead — the blocked plan must
    reproduce it exactly. All-bigint arithmetic; deterministic
    (gap_len DESC, gap_start) ordering."""
    from pyspark.sql import Window

    B = 4096
    k = (
        table(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("k"))
        .distinct()
        .withColumn("blk", F.expr(f"k div {B}"))
    )
    win = Window.partitionBy("blk").orderBy("k")
    within = (
        k.withColumn("nk", F.lead("k").over(win))
        .filter(F.col("nk") > F.col("k") + 1)
        .select("k", "nk")
    )
    blocks = k.groupBy("blk").agg(
        F.min("k").alias("mn"), F.max("k").alias("mx")
    )
    bwin = Window.orderBy("blk")
    across = (
        blocks.withColumn("next_mn", F.lead("mn").over(bwin))
        .filter(F.col("next_mn") > F.col("mx") + 1)
        .select(F.col("mx").alias("k"), F.col("next_mn").alias("nk"))
    )
    gaps = within.unionByName(across)
    return (
        gaps.select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nk") - 1).alias("gap_end"),
            (F.col("nk") - F.col("k") - 1).alias("gap_len"),
        )
        .orderBy(F.desc("gap_len"), "gap_start")
        .limit(20)
    )


def q_sample_alias_bias(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — systematic-vs-hash sampling ALIAS BIAS audit, the reason
    q_sample_every_10th-style stride sampling must never feed a
    profiler at 100 TB when the data has periodic structure: the
    signal v = rowid % 10 has period 10 and the systematic rule keeps
    rowid % 10 = 0 — stride aligned with the period, so the sample
    sees exactly ONE phase and estimates the mean as 0.0. The
    md5-hash sample (portable 60-bit hash % 10 = 0, decorrelated from
    any row ordering) lands near the true mean at the same sampling
    rate. One conditional-aggregation scan computes all three
    estimators; the deltas are the audit. Means are exact-integer
    sums over exact counts, round4 at the very end."""
    li = table(spark, sf, "lineitem")
    rid = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    h = dedup.portable_token_hash(rid.cast("string"))
    base = li.select(
        (rid % 10).alias("v"),
        (rid % 10 == 0).alias("in_sys"),
        (h % 10 == 0).alias("in_hash"),
    )
    agg = base.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("in_sys"), 1)).alias("n_sys"),
        F.count(F.when(F.col("in_hash"), 1)).alias("n_hash"),
        F.sum("v").alias("sv"),
        F.coalesce(
            F.sum(F.when(F.col("in_sys"), F.col("v"))), F.lit(0)
        ).alias("ss"),
        F.coalesce(
            F.sum(F.when(F.col("in_hash"), F.col("v"))), F.lit(0)
        ).alias("sh"),
    )
    tm = F.col("sv") / F.col("n_rows")
    sm = F.col("ss") / F.col("n_sys")
    hm = F.col("sh") / F.col("n_hash")
    return agg.select(
        "n_rows",
        "n_sys",
        "n_hash",
        text.round4(tm).alias("true_mean"),
        text.round4(sm).alias("sys_mean"),
        text.round4(hm).alias("hash_mean"),
        text.round4(F.abs(sm - tm)).alias("sys_abs_err"),
        text.round4(F.abs(hm - tm)).alias("hash_abs_err"),
    )


def q_small_cell_suppression(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — statistical disclosure control beyond k-anonymity: the
    small-cell suppression a statistics office applies before
    publishing a frequency table (customers per nation × segment).
    Primary: observed cells with count < 5 are suppressed. One
    complementary round follows, because a row or column with exactly
    ONE suppressed cell leaks it through the marginal total: such a
    row (then column, counting row-pass suppressions) also suppresses
    its smallest remaining cell — argmin via a window MIN over the
    integer key cnt·32+id, no rank-among-filtered subquery, fully
    deterministic. The column key crosses segment with a planted RARE
    category (custkey % 199 = 0, ~0.5% — the rare-disease cell that
    keeps small counts present at EVERY scale, where a plain 5-segment
    grid saturates past k by sf0.01). Output is the observed-cell audit
    table (true count, published value, status ∈
    ok/primary/comp_row/comp_col); the production view drops `cnt`.
    Two windows over a |nations|·|segment×band| frame: free at any
    fact scale."""
    from pyspark.sql import Window

    c = table(spark, sf, "customer")
    band = F.when(F.col("c_custkey") % 199 == 0, "rare").otherwise(
        "common"
    )
    segi = F.array_position(
        F.array(
            F.lit("AUTOMOBILE"),
            F.lit("BUILDING"),
            F.lit("FURNITURE"),
            F.lit("HOUSEHOLD"),
            F.lit("MACHINERY"),
        ),
        F.col("c_mktsegment"),
    )
    cells = (
        c.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.concat(
                F.col("c_mktsegment"), F.lit("/"), band
            ).alias("segment"),
            (segi + F.when(band == "rare", 5).otherwise(0)).alias("si"),
        )
        .agg(F.count("*").alias("cnt"))
        .withColumn("primary", F.col("cnt") < 5)
    )
    wr = Window.partitionBy("nationkey")
    cells = cells.withColumn(
        "n_prim_row", F.sum(F.col("primary").cast("int")).over(wr)
    ).withColumn(
        "tgt_row",
        F.min(
            F.when(
                ~F.col("primary"), F.col("cnt") * 32 + F.col("si")
            )
        ).over(wr),
    )
    cells = cells.withColumn(
        "comp_row",
        (~F.col("primary"))
        & (F.col("n_prim_row") == 1)
        & (F.col("cnt") * 32 + F.col("si") == F.col("tgt_row")),
    ).withColumn("supp1", F.col("primary") | F.col("comp_row"))
    wc = Window.partitionBy("segment")
    cells = cells.withColumn(
        "n_supp1_col", F.sum(F.col("supp1").cast("int")).over(wc)
    ).withColumn(
        "tgt_col",
        F.min(
            F.when(
                ~F.col("supp1"),
                F.col("cnt") * 32 + F.col("nationkey"),
            )
        ).over(wc),
    )
    cells = cells.withColumn(
        "comp_col",
        (~F.col("supp1"))
        & (F.col("n_supp1_col") == 1)
        & (F.col("cnt") * 32 + F.col("nationkey") == F.col("tgt_col")),
    )
    status = (
        F.when(F.col("primary"), "primary")
        .when(F.col("comp_row"), "comp_row")
        .when(F.col("comp_col"), "comp_col")
        .otherwise("ok")
    )
    return cells.select(
        "nationkey",
        "segment",
        "cnt",
        F.when(
            ~(F.col("primary") | F.col("comp_row") | F.col("comp_col")),
            F.col("cnt"),
        ).alias("published"),
        status.alias("status"),
    ).orderBy("nationkey", "segment")


def q_skew_salt_planner(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — the ACTIONABLE companion of q_join_skew_metrics: a salting
    PLAN table. Given a target of ≤500 rows per join task, each key's
    salt factor is ceil(cnt/target) — pure integer arithmetic
    ((cnt + t − 1) div t), so the plan is bit-identical cross-engine —
    and the table shows per key the post-salt worst slice
    (ceil(cnt/factor), provably ≤ target) plus plan-level scalars:
    max task rows before/after and the extra tasks the salt costs.
    This is the static-control path next to AQE's runtime skew split
    (PERF.md round-10): you emit this table when you must PIN the
    layout (bucketing, repeated joins) instead of re-detecting per
    query. One map-side-combined group-count; the plan frame is
    |keys|-sized."""
    tgt = 500
    ev = table(spark, sf, "events")
    freq = _mat(  # 2 consumers: plan rows + scalars
        ev.groupBy(F.col("event_type").alias("key")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    plan = freq.select(
        "key",
        "cnt",
        F.expr(f"(cnt + {tgt} - 1) div {tgt}").alias("factor"),
    ).select(
        "key",
        "cnt",
        "factor",
        F.expr("(cnt + factor - 1) div factor").alias("max_slice"),
    )
    scal = freq.agg(
        F.max("cnt").alias("before_max_task_rows"),
        F.max(
            F.expr(
                f"(cnt + ((cnt + {tgt} - 1) div {tgt}) - 1)"
                f" div ((cnt + {tgt} - 1) div {tgt})"
            )
        ).alias("after_max_task_rows"),
        F.sum(F.expr(f"((cnt + {tgt} - 1) div {tgt}) - 1")).alias(
            "extra_tasks"
        ),
    )
    return (
        plan.crossJoin(F.broadcast(scal))  # 1-row scalar
        .orderBy(F.desc("cnt"), "key")
    )


def q_quantile_normalization(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — quantile normalization across shards (the
    batch-effect-removal transform from bioinformatics, equally the
    feature-alignment step when training data arrives from
    differently-scaled sources): rank each value within its shard
    (c_custkey % 4; cent-exact acctbal, custkey tiebreak), then replace
    it with the ACROSS-shard mean of the same rank's values. Unequal
    shard sizes use the standard generalization (mean over shards
    present at that rank). Mean = exact-bigint sum / count — one
    double division per rank, identical cross-engine — rounded only at
    output. Plan: one rank window per shard partition + one |ranks|-
    sized aggregate joined back by rank; no global sort of the facts.
    Output: ranks ≤ 10 across the 4 shards (40 rows)."""
    from pyspark.sql import Window

    c = table(spark, sf, "customer")
    base = c.select(
        (F.col("c_custkey") % 4).alias("shard"),
        "c_custkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    w = Window.partitionBy("shard").orderBy("cents", "c_custkey")
    ranked = _mat(  # 2 consumers: ref means + output rows
        base.withColumn("rnk", F.row_number().over(w))
    )
    ref = ranked.groupBy("rnk").agg(
        (F.sum("cents") / F.count("*")).alias("refmean")
    )
    return (
        ranked.filter(F.col("rnk") <= 10)
        .join(F.broadcast(ref.filter(F.col("rnk") <= 10)), "rnk")
        .select(
            "shard",
            "rnk",
            F.col("c_custkey").alias("custkey"),
            "cents",
            text.round4(F.col("refmean")).alias("norm_cents"),
        )
        .orderBy("shard", "rnk")
    )


def q_mahalanobis_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — 2-feature Mahalanobis outlier screen, the multivariate
    step past q_zscore_outliers/q_mad_outliers (a customer can be
    unremarkable per-axis but far off the joint ellipse): features per
    customer = order count x and revenue DOLLARS y (cents div 100 —
    y² sums overflow BIGINT at sf0.1 in cents; dollars keep every
    sufficient statistic an exact int64 to sf1 and beyond). The five
    sufficient statistics are exact integer sums; the 2×2 covariance
    inverse is closed-form, so d² = (dx·dx·syy − 2·dx·dy·sxy +
    dy·dy·sxx) / (sxx·syy − sxy²) is computed in doubles derived from
    exact ints with the SAME expression tree on both engines (shared
    arithmetic shape, the geohash discipline), round4 at output, rank
    tiebreak by custkey. One agg to stats, one broadcast back — no
    window over the facts. Output: top 10 by d²."""
    o = table(spark, sf, "orders")
    feats = _mat(  # 2 consumers: stats scalar + per-row scores
        o.groupBy("o_custkey").agg(
            F.count("*").alias("x"),
            F.expr(
                "cast(sum(cast(o_totalprice as decimal(20,6)) * 100)"
                " as bigint) div 100"
            ).alias("y"),
        )
    )
    st = feats.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    j = feats.crossJoin(F.broadcast(st))  # 1-row scalar
    # mirrored double arithmetic (identical shape in the oracle SQL)
    mx = F.col("sx") / F.col("n")
    my = F.col("sy") / F.col("n")
    vxx = (F.col("sxx") - F.col("sx") * mx) / (F.col("n") - 1)
    vyy = (F.col("syy") - F.col("sy") * my) / (F.col("n") - 1)
    vxy = (F.col("sxy") - F.col("sx") * my) / (F.col("n") - 1)
    dx = F.col("x") - mx
    dy = F.col("y") - my
    d2 = (dx * dx * vyy - 2 * dx * dy * vxy + dy * dy * vxx) / (
        vxx * vyy - vxy * vxy
    )
    return (
        j.select(
            F.col("o_custkey").alias("custkey"),
            "x",
            "y",
            text.round4(d2).alias("d2"),
        )
        .orderBy(F.desc("d2"), "custkey")
        .limit(10)
    )


def q_survivorship(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — golden-record SURVIVORSHIP (the MDM step after entity
    resolution): per customer, each field of the golden record is taken
    from the MOST RECENT order where that field survives (non-null),
    independently per field — the "most recent non-null wins" rule,
    with (o_orderdate, o_orderkey) as the deterministic recency key.
    The testdata has no natural nulls, so field dropout is PLANTED
    deterministically (priority void when o_orderkey % 7 = 3, status
    when % 5 = 2) — same discipline as DIRTY_CITIES / the SymSpell
    typos. One hash aggregate: each field's winner is a max(struct)
    argmax over its non-null rows, so the whole golden-record build is
    a single shuffle on the entity key regardless of field count — the
    shape that matters when survivorship runs over 10^10 records. The
    struct ranks on (date, key) which is UNIQUE, so the trailing
    payload field never influences the ordering (the cross-engine
    struct-comparison trap from the PQ argmin lesson does not arise).
    Oracle: per-field row_number() windows + left joins."""
    o = table(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.when(F.col("o_orderkey") % 7 == 3, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("prio"),
        F.when(F.col("o_orderkey") % 5 == 2, F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        (F.col("o_totalprice").cast("decimal(20,6)") * 100)
        .cast("long")
        .alias("cents"),
    )
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.count(F.when(F.col("prio").isNull(), F.lit(1)))
        .cast("long")
        .alias("null_priority"),
        F.count(F.when(F.col("status").isNull(), F.lit(1)))
        .cast("long")
        .alias("null_status"),
        F.max(
            F.when(
                F.col("prio").isNotNull(),
                F.struct("o_orderdate", "o_orderkey", "prio"),
            )
        ).alias("_p"),
        F.max(
            F.when(
                F.col("status").isNotNull(),
                F.struct("o_orderdate", "o_orderkey", "status"),
            )
        ).alias("_s"),
        F.max("cents").cast("long").alias("gold_price_cents"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias(
            "first_seen"
        ),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias(
            "last_seen"
        ),
    )
    return per.select(
        F.col("o_custkey").alias("custkey"),
        "n_records",
        "null_priority",
        "null_status",
        F.col("_p.prio").alias("gold_priority"),
        F.col("_s.status").alias("gold_status"),
        "gold_price_cents",
        "first_seen",
        "last_seen",
    ).orderBy("custkey")


ORACLES: dict[str, str | None] = {
    "q_survivorship": """
        WITH o AS (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 CASE WHEN o_orderkey % 7 = 3 THEN NULL
                      ELSE o_orderpriority END AS prio,
                 CASE WHEN o_orderkey % 5 = 2 THEN NULL
                      ELSE o_orderstatus END AS status,
                 CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 100 AS BIGINT)
                   AS cents
          FROM orders
        ),
        p AS (
          SELECT o_custkey, prio FROM (
            SELECT o_custkey, prio, row_number() OVER (
              PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM o WHERE prio IS NOT NULL
          ) WHERE rn = 1
        ),
        s AS (
          SELECT o_custkey, status FROM (
            SELECT o_custkey, status, row_number() OVER (
              PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM o WHERE status IS NOT NULL
          ) WHERE rn = 1
        ),
        base AS (
          SELECT o_custkey,
                 CAST(count(*) AS BIGINT) AS n_records,
                 CAST(count(CASE WHEN prio IS NULL THEN 1 END) AS BIGINT)
                   AS null_priority,
                 CAST(count(CASE WHEN status IS NULL THEN 1 END) AS BIGINT)
                   AS null_status,
                 CAST(max(cents) AS BIGINT) AS gold_price_cents,
                 strftime(min(o_orderdate), '%Y-%m-%d') AS first_seen,
                 strftime(max(o_orderdate), '%Y-%m-%d') AS last_seen
          FROM o GROUP BY o_custkey
        )
        SELECT b.o_custkey AS custkey, b.n_records, b.null_priority,
               b.null_status, p.prio AS gold_priority,
               s.status AS gold_status, b.gold_price_cents,
               b.first_seen, b.last_seen
        FROM base b
        LEFT JOIN p ON p.o_custkey = b.o_custkey
        LEFT JOIN s ON s.o_custkey = b.o_custkey
        ORDER BY custkey
    """,
    "q_quantile_normalization": """
        WITH base AS (
          SELECT c_custkey % 4 AS shard, c_custkey,
                 CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS cents
          FROM customer
        ),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY shard ORDER BY cents, c_custkey)
                   AS rnk
          FROM base
        ),
        ref AS (
          SELECT rnk,
                 CAST(sum(cents) AS DOUBLE) / count(*) AS refmean
          FROM ranked GROUP BY rnk
        )
        SELECT r.shard, r.rnk, r.c_custkey AS custkey, r.cents,
               floor(f.refmean * 10000 + 0.5) / 10000 AS norm_cents
        FROM ranked r JOIN ref f USING (rnk)
        WHERE r.rnk <= 10
        ORDER BY r.shard, r.rnk
    """,
    "q_mahalanobis_outliers": """
        WITH feats AS (
          SELECT o_custkey, count(*) AS x,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6)) * 100)
                      AS BIGINT) // 100 AS y
          FROM orders GROUP BY 1
        ),
        st AS (
          SELECT count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM feats
        ),
        sc AS (
          SELECT f.o_custkey AS custkey, f.x, f.y,
                 ((f.x - s.sx / s.n) * (f.x - s.sx / s.n)
                    * ((s.syy - s.sy * (s.sy / s.n)) / (s.n - 1))
                  - 2 * (f.x - s.sx / s.n) * (f.y - s.sy / s.n)
                    * ((s.sxy - s.sx * (s.sy / s.n)) / (s.n - 1))
                  + (f.y - s.sy / s.n) * (f.y - s.sy / s.n)
                    * ((s.sxx - s.sx * (s.sx / s.n)) / (s.n - 1)))
                 / (((s.sxx - s.sx * (s.sx / s.n)) / (s.n - 1))
                      * ((s.syy - s.sy * (s.sy / s.n)) / (s.n - 1))
                    - ((s.sxy - s.sx * (s.sy / s.n)) / (s.n - 1))
                      * ((s.sxy - s.sx * (s.sy / s.n)) / (s.n - 1)))
                   AS d2
          FROM feats f, st s
        )
        SELECT custkey, x, y,
               floor(d2 * 10000 + 0.5) / 10000 AS d2
        FROM sc
        ORDER BY floor(d2 * 10000 + 0.5) / 10000 DESC, custkey
        LIMIT 10
    """,
    "q_skew_salt_planner": """
        WITH freq AS (
          SELECT event_type AS key, count(*) AS cnt
          FROM events GROUP BY 1
        ),
        plan AS (
          SELECT key, cnt,
                 (cnt + 499) // 500 AS factor,
                 (cnt + ((cnt + 499) // 500) - 1)
                   // ((cnt + 499) // 500) AS max_slice
          FROM freq
        ),
        scal AS (
          SELECT CAST(max(cnt) AS BIGINT) AS before_max_task_rows,
                 CAST(max((cnt + ((cnt + 499) // 500) - 1)
                          // ((cnt + 499) // 500)) AS BIGINT)
                   AS after_max_task_rows,
                 CAST(sum(((cnt + 499) // 500) - 1) AS BIGINT)
                   AS extra_tasks
          FROM freq
        )
        SELECT p.key, p.cnt, CAST(p.factor AS BIGINT) AS factor,
               CAST(p.max_slice AS BIGINT) AS max_slice,
               s.before_max_task_rows, s.after_max_task_rows,
               s.extra_tasks
        FROM plan p, scal s
        ORDER BY p.cnt DESC, p.key
    """,
    "q_small_cell_suppression": """
        WITH segs(s, i) AS (
          VALUES ('AUTOMOBILE', 1), ('BUILDING', 2), ('FURNITURE', 3),
                 ('HOUSEHOLD', 4), ('MACHINERY', 5)
        ),
        base AS (
          SELECT c_nationkey AS nationkey, c_mktsegment AS seg,
                 CASE WHEN c_custkey % 199 = 0
                      THEN 'rare' ELSE 'common' END AS band
          FROM customer
        ),
        cells AS (
          SELECT nationkey, seg || '/' || band AS segment,
                 (SELECT i FROM segs WHERE s = seg)
                   + CASE WHEN band = 'rare' THEN 5 ELSE 0 END AS si,
                 count(*) AS cnt,
                 count(*) < 5 AS prim
          FROM base GROUP BY nationkey, seg, band
        ),
        r AS (
          SELECT *,
                 sum(CASE WHEN prim THEN 1 ELSE 0 END)
                   OVER (PARTITION BY nationkey) AS n_prim_row,
                 min(CASE WHEN NOT prim THEN cnt * 32 + si END)
                   OVER (PARTITION BY nationkey) AS tgt_row
          FROM cells
        ),
        r2 AS (
          SELECT *,
                 (NOT prim) AND n_prim_row = 1
                   AND cnt * 32 + si = tgt_row AS comp_row
          FROM r
        ),
        r3 AS (
          SELECT *, prim OR comp_row AS supp1,
                 sum(CASE WHEN prim OR comp_row THEN 1 ELSE 0 END)
                   OVER (PARTITION BY segment) AS n_supp1_col,
                 min(CASE WHEN NOT (prim OR comp_row)
                          THEN cnt * 32 + nationkey END)
                   OVER (PARTITION BY segment) AS tgt_col
          FROM r2
        ),
        r4 AS (
          SELECT *,
                 (NOT supp1) AND n_supp1_col = 1
                   AND cnt * 32 + nationkey = tgt_col AS comp_col
          FROM r3
        )
        SELECT nationkey, segment, cnt,
               CASE WHEN NOT (prim OR comp_row OR comp_col)
                    THEN cnt END AS published,
               CASE WHEN prim THEN 'primary'
                    WHEN comp_row THEN 'comp_row'
                    WHEN comp_col THEN 'comp_col'
                    ELSE 'ok' END AS status
        FROM r4
        ORDER BY nationkey, segment
    """,
    "q_sample_alias_bias": """
        WITH base AS (
          SELECT (l_orderkey * 8 + l_linenumber) % 10 AS v,
                 (l_orderkey * 8 + l_linenumber) % 10 = 0 AS in_sys,
                 (('0x' || substr(md5(CAST(l_orderkey * 8 + l_linenumber
                    AS VARCHAR)), 1, 15))::BIGINT) % 10 = 0 AS in_hash
          FROM lineitem
        ),
        agg AS (
          SELECT count(*) AS n_rows,
                 CAST(count(CASE WHEN in_sys THEN 1 END) AS BIGINT)
                   AS n_sys,
                 CAST(count(CASE WHEN in_hash THEN 1 END) AS BIGINT)
                   AS n_hash,
                 CAST(sum(v) AS BIGINT) AS sv,
                 CAST(coalesce(sum(CASE WHEN in_sys THEN v END), 0)
                      AS BIGINT) AS ss,
                 CAST(coalesce(sum(CASE WHEN in_hash THEN v END), 0)
                      AS BIGINT) AS sh
          FROM base
        )
        SELECT n_rows, n_sys, n_hash,
               floor(CAST(sv AS DOUBLE) / n_rows * 10000 + 0.5) / 10000
                 AS true_mean,
               floor(CAST(ss AS DOUBLE) / n_sys * 10000 + 0.5) / 10000
                 AS sys_mean,
               floor(CAST(sh AS DOUBLE) / n_hash * 10000 + 0.5) / 10000
                 AS hash_mean,
               floor(abs(CAST(ss AS DOUBLE) / n_sys
                         - CAST(sv AS DOUBLE) / n_rows)
                     * 10000 + 0.5) / 10000 AS sys_abs_err,
               floor(abs(CAST(sh AS DOUBLE) / n_hash
                         - CAST(sv AS DOUBLE) / n_rows)
                     * 10000 + 0.5) / 10000 AS hash_abs_err
        FROM agg
    """,
    "q_keyset_pagination": """
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 100
                    AS BIGINT) AS cents
        FROM orders
        ORDER BY cents DESC, o_orderkey
        LIMIT 20 OFFSET 40
    """,
    "q_point_in_time_features": """
        WITH ev AS (SELECT *, epoch_us(ts) AS tsn FROM events),
        spine AS (
          SELECT user_id, event_id, tsn FROM ev
          WHERE event_type = 'purchase'
        ),
        cl AS (
          SELECT user_id, tsn, max(value) AS cv, count(*) AS cnt
          FROM ev WHERE event_type = 'click' GROUP BY 1, 2
        ),
        f AS (
          SELECT s.user_id, s.event_id, s.tsn,
                 CAST(coalesce((SELECT sum(c.cnt) FROM cl c
                       WHERE c.user_id = s.user_id
                         AND c.tsn >= s.tsn - 86400000000
                         AND c.tsn < s.tsn), 0) AS BIGINT) AS clicks_24h,
                 (SELECT max(c.tsn) FROM cl c
                   WHERE c.user_id = s.user_id AND c.tsn < s.tsn) AS lt
          FROM spine s
        )
        SELECT f.user_id, f.event_id, clicks_24h,
               floor((SELECT cv FROM cl
                      WHERE cl.user_id = f.user_id AND cl.tsn = f.lt)
                     * 10000 + 0.5) / 10000 AS last_click_v,
               CAST(f.tsn - lt AS BIGINT) AS click_age_us,
               CAST(CASE WHEN lt IS NOT NULL
                          AND f.tsn - lt <= 259200000000
                    THEN 1 ELSE 0 END AS INTEGER) AS fresh
        FROM f
        ORDER BY user_id, event_id
    """,
    "q_asof_nearest": """
        WITH ev AS (SELECT *, epoch_us(ts) AS tsn FROM events),
        u AS (
          SELECT user_id, event_id, tsn AS t, 1 AS side,
                 NULL::BIGINT AS rts
          FROM ev WHERE event_type = 'click'
          UNION ALL
          SELECT DISTINCT user_id, NULL::BIGINT, tsn, 0, tsn
          FROM ev WHERE event_type = 'purchase'
        ),
        f AS (
          SELECT *,
                 last_value(rts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t, side
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS prev_t,
                 first_value(rts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t, side
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                 ) AS next_t
          FROM u
        ),
        n AS (
          SELECT user_id, event_id, t AS ts,
                 CASE WHEN prev_t IS NULL THEN next_t
                      WHEN next_t IS NULL THEN prev_t
                      WHEN t - prev_t <= next_t - t THEN prev_t
                      ELSE next_t END AS matched_time,
                 prev_t, next_t
          FROM f WHERE side = 1
        )
        SELECT user_id, event_id, ts, matched_time,
               CASE WHEN matched_time IS NULL THEN NULL
                    WHEN matched_time = prev_t THEN 'backward'
                    ELSE 'forward' END AS direction,
               abs(matched_time - ts) AS delta_us
        FROM n
    """,
    "q_target_encoding": """
        WITH per AS (
          SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) * 100
                      AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_nationkey
        ),
        tot AS (
          SELECT CAST(sum(n) AS BIGINT) AS nt,
                 CAST(sum(cents) AS BIGINT) AS ct
          FROM per
        )
        SELECT c_nationkey, n,
               floor(CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                     * 10000 + 0.5) / 10000 AS raw_mean,
               floor((CAST(cents AS DOUBLE)
                      + 10.0 * (CAST(ct AS DOUBLE) / CAST(nt AS DOUBLE)))
                     / (CAST(n AS DOUBLE) + 10.0) / 100.0
                     * 10000 + 0.5) / 10000 AS encoded
        FROM per, tot ORDER BY c_nationkey
    """,
    "q_woe_iv": """
        WITH per AS (
          SELECT c_mktsegment,
                 CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                      AS BIGINT) AS ev,
                 CAST(count(CASE WHEN o_orderstatus <> 'F' THEN 1 END)
                      AS BIGINT) AS ne
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment
        ),
        tot AS (
          SELECT CAST(sum(ev) AS BIGINT) AS evt,
                 CAST(sum(ne) AS BIGINT) AS net
          FROM per
        )
        SELECT c_mktsegment, ev, ne,
               floor(ln((CAST(ev AS DOUBLE) / CAST(evt AS DOUBLE))
                        / (CAST(ne AS DOUBLE) / CAST(net AS DOUBLE)))
                     * 10000 + 0.5) / 10000 AS woe,
               floor((CAST(ev AS DOUBLE) / CAST(evt AS DOUBLE)
                      - CAST(ne AS DOUBLE) / CAST(net AS DOUBLE))
                     * ln((CAST(ev AS DOUBLE) / CAST(evt AS DOUBLE))
                          / (CAST(ne AS DOUBLE) / CAST(net AS DOUBLE)))
                     * 10000 + 0.5) / 10000 AS iv_term
        FROM per, tot ORDER BY c_mktsegment
    """,
    "q_join_cardinality": """
        WITH per AS (
          SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
          FROM orders GROUP BY d
        ),
        agg AS (
          SELECT CAST(sum(n) AS BIGINT) AS n_rows,
                 CAST(count(*) AS BIGINT) AS n_keys,
                 sum(CAST(n AS HUGEINT) * n) AS actual_pairs,
                 CAST(max(n) AS BIGINT) AS max_key
          FROM per
        )
        SELECT n_rows, n_keys,
               CAST(actual_pairs AS BIGINT) AS actual_pairs,
               CAST(floor(CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)
                          / CAST(n_keys AS DOUBLE)) AS BIGINT)
                 AS uniform_estimate,
               floor(CAST(actual_pairs AS DOUBLE)
                     / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)
                        / CAST(n_keys AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS skew_factor,
               max_key
        FROM agg
    """,
    "q_weighted_median": """
        WITH d AS (
          SELECT p_brand AS brand,
                 CAST(CAST(l_extendedprice AS DECIMAL(20,6)) * 100
                      AS BIGINT) AS cents,
                 CAST(l_quantity AS BIGINT) AS w
          FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        h AS (
          SELECT brand, cents, CAST(sum(w) AS BIGINT) AS w
          FROM d GROUP BY brand, cents
        ),
        tot AS (
          SELECT brand, CAST(sum(w) AS BIGINT) AS wtot
          FROM h GROUP BY brand
        ),
        c AS (
          SELECT h.brand, cents, wtot,
                 sum(w) OVER (
                   PARTITION BY h.brand
                   ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cw
          FROM h JOIN tot ON h.brand = tot.brand
        )
        SELECT brand, wtot, min(cents) AS wmedian_cents
        FROM c WHERE cw * 2 >= wtot
        GROUP BY brand, wtot ORDER BY brand
    """,
    "q_t_closeness": """
        WITH qi AS (
          SELECT c_nationkey,
                 CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
                 c_mktsegment
          FROM customer
        ),
        cell AS (
          SELECT c_nationkey, bal_band, c_mktsegment, count(*) AS cs
          FROM qi GROUP BY 1, 2, 3
        ),
        gsize AS (
          SELECT c_nationkey, bal_band, count(*) AS n_rows
          FROM qi GROUP BY 1, 2
        ),
        gseg AS (SELECT c_mktsegment, count(*) AS gs FROM qi GROUP BY 1),
        tot AS (SELECT count(*) AS n_total FROM qi),
        grid AS (
          SELECT g.c_nationkey, g.bal_band, g.n_rows, s.gs,
                 coalesce(c.cs, 0) AS cs, n_total
          FROM gsize g CROSS JOIN gseg s CROSS JOIN tot
          LEFT JOIN cell c
            ON c.c_nationkey = g.c_nationkey
           AND c.bal_band = g.bal_band
           AND c.c_mktsegment = s.c_mktsegment
        ),
        agg AS (
          SELECT c_nationkey, bal_band, max(n_rows) AS n_rows,
                 CAST(sum(abs(cs * n_total - gs * n_rows)) AS BIGINT)
                   AS tv_num,
                 CAST(max(n_rows * n_total) AS BIGINT) AS denom
          FROM grid GROUP BY 1, 2
        )
        SELECT c_nationkey, bal_band, n_rows,
               floor(CAST(tv_num AS DOUBLE)
                     / (2.0 * CAST(denom AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS t_closeness
        FROM agg
        ORDER BY t_closeness DESC, c_nationkey, bal_band LIMIT 20
    """,
    "q_sequence_gaps": """
        WITH k AS (SELECT DISTINCT event_id AS k FROM events
                   WHERE event_type = 'purchase'),
        l AS (SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM k)
        SELECT k + 1 AS gap_start, nk - 1 AS gap_end,
               nk - k - 1 AS gap_len
        FROM l WHERE nk > k + 1
        ORDER BY gap_len DESC, gap_start LIMIT 20
    """,
    "q_benford": """
        WITH d AS (
          SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                  AS VARCHAR), 1, 1) AS INTEGER) AS digit
          FROM orders
        ),
        c AS (SELECT digit, count(*) AS cnt FROM d GROUP BY digit),
        t AS (SELECT count(*) AS n FROM d),
        e(digit, benford) AS (VALUES
          (1, 0.3010299956639812e0), (2, 0.17609125905568124e0),
          (3, 0.12493873660829992e0), (4, 0.09691001300805642e0),
          (5, 0.07918124604762482e0), (6, 0.06694678963061322e0),
          (7, 0.05799194697768673e0), (8, 0.05115252244738129e0),
          (9, 0.04575749056067514e0))
        SELECT c.digit, cnt,
               floor(cnt / (SELECT n FROM t) * 10000 + 0.5) / 10000 AS share,
               floor(benford * 10000 + 0.5) / 10000 AS benford,
               floor((cnt / (SELECT n FROM t) - benford) * 10000 + 0.5)
                 / 10000 AS deviation
        FROM c JOIN e ON c.digit = e.digit
        ORDER BY c.digit
    """,
    "q_skyline": """
        WITH cust AS (
          SELECT o_custkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) * 100 AS BIGINT)
                   AS spend_cents,
                 count(*) AS n_orders
          FROM orders GROUP BY o_custkey
        ),
        pts AS (
          SELECT spend_cents, n_orders, count(*) AS n_customers
          FROM cust GROUP BY spend_cents, n_orders
        ),
        sk AS (
          SELECT *,
                 max(n_orders) OVER (
                   ORDER BY spend_cents DESC, n_orders DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS p
          FROM pts
        )
        SELECT spend_cents, n_orders, n_customers FROM sk
        WHERE p IS NULL OR n_orders > p
        ORDER BY spend_cents DESC
    """,
    "q_winsorized_mean": """
        WITH cuts AS (
          SELECT o_orderpriority,
                 quantile_cont(o_totalprice, 0.05) AS lo,
                 quantile_cont(o_totalprice, 0.95) AS hi
          FROM orders GROUP BY o_orderpriority
        )
        SELECT o.o_orderpriority,
               count(*) AS n_orders,
               floor(avg(o_totalprice) * 10000 + 0.5) / 10000 AS raw_mean,
               floor(avg(least(greatest(o_totalprice, lo), hi)) * 10000 + 0.5)
                 / 10000 AS winsorized_mean
        FROM orders o JOIN cuts c ON o.o_orderpriority = c.o_orderpriority
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    "q_l_diversity": """
        WITH qi AS (
          SELECT c_nationkey,
                 CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
                 c_mktsegment
          FROM customer
        )
        SELECT c_nationkey, bal_band, count(*) AS n_rows,
               count(DISTINCT c_mktsegment) AS n_sensitive
        FROM qi GROUP BY c_nationkey, bal_band
        HAVING count(DISTINCT c_mktsegment) < 3
        ORDER BY c_nationkey, bal_band
    """,
    "q_k_anonymity": """
        WITH qi AS (
          SELECT c_mktsegment, c_nationkey,
                 CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
          FROM customer
        ),
        g AS (
          SELECT c_mktsegment, c_nationkey, bal_band, count(*) AS cnt
          FROM qi GROUP BY c_mktsegment, c_nationkey, bal_band
        ),
        n AS (SELECT count(*) AS n_total FROM customer)
        SELECT c_mktsegment, c_nationkey, bal_band, cnt,
               floor(CAST(cnt AS DOUBLE) / n_total * 10000 + 0.5) / 10000
                 AS share
        FROM g, n
        WHERE cnt < 5
        ORDER BY c_mktsegment, c_nationkey, bal_band
    """,
    "q_null_semantics": """
        SELECT o_orderkey,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status2,
               nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'O'
                 AS is_open_nullsafe,
               nullif(o_orderstatus, 'P') IS NULL AS was_pending
        FROM orders
    """,
    "q_sort_multi": """
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
        LIMIT 50
    """,
    "q_string_functions": """
        SELECT c_custkey,
               upper(c_name) AS up,
               substr(c_name, 10, 5) AS mid,
               CAST(length(c_name) AS INT) AS len,
               regexp_replace(c_name, '0', '_', 'g') AS subbed,
               reverse(c_name) AS rev,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
               'C' || '-' || c_mktsegment AS tagged
        FROM customer
    """,
    "q_array_functions": """
        WITH a AS (
          SELECT o_orderkey, string_split(o_orderpriority, '-') AS arr
          FROM orders
        )
        SELECT o_orderkey,
               CAST(len(arr) AS INT) AS n,
               list_contains(arr, 'URGENT') AS has_urgent,
               arr[-1] AS last_el,
               array_to_string(list_sort(arr), '|') AS sorted_join,
               array_to_string(list_sort(list_distinct(list_concat(arr, arr))), '|')
                 AS dedup_join
        FROM a
    """,
    "q_scalar_subquery": """
        WITH a AS (
          SELECT floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) * 10000 + 0.5) / 10000 AS avg_price
          FROM orders
        )
        SELECT count(*) AS n_above, max(avg_price) AS avg_price
        FROM orders, a WHERE o_totalprice > avg_price
    """,
    "q_correlated_subquery": """
        SELECT o_custkey, min(o_orderkey) AS orderkey,
               max(o_totalprice) AS max_price
        FROM orders o
        WHERE o_totalprice = (
          SELECT max(o_totalprice) FROM orders i
          WHERE i.o_custkey = o.o_custkey
        )
        GROUP BY o_custkey
    """,
    "q_window_functions": """
        WITH e AS (SELECT *, epoch_us(ts) AS tsn FROM events)
        SELECT event_id, user_id,
               lag(value, 1) OVER w AS prev_value,
               rank() OVER w AS rnk,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
                 PARTITION BY user_id ORDER BY tsn, event_id
                 ROWS UNBOUNDED PRECEDING
               ) AS DOUBLE) * 10000 + 0.5) / 10000 AS run_sum
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
    """,
    # time-RANGE frame (not ROWS): peers at the same tsn all included,
    # so the result is independent of tie order on both engines
    "q_rolling_window": """
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS tsn, value FROM events
        )
        SELECT user_id, event_id, tsn,
               count(*) OVER w AS roll_cnt,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w
                     AS DOUBLE) * 10000 + 0.5) / 10000 AS roll_sum
        FROM e
        WINDOW w AS (
          PARTITION BY user_id ORDER BY tsn
          RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
        )
    """,
    "q_semi_join": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q_anti_join": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
        )
    """,
    "q_asof_join": """
        WITH ev AS (SELECT *, epoch_us(ts) AS tsn FROM events),
        purchases AS (
          SELECT user_id, event_id, tsn AS ts FROM ev
          WHERE event_type = 'purchase'
        ),
        signups AS (
          SELECT user_id, tsn AS ts, max(value) AS state FROM ev
          WHERE event_type = 'signup' GROUP BY user_id, tsn
        )
        SELECT p.user_id, p.event_id, p.ts,
               s.ts AS matched_time, s.state AS matched_state
        FROM purchases p
        ASOF LEFT JOIN signups s
          ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    "q_dp_counts": """
        WITH c AS (
          SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        ),
        u AS (
          SELECT event_type, n,
                 ('0x' || substr(md5('dp:' || event_type), 1, 15))::BIGINT
                   / 1152921504606846976.0 AS u
          FROM c
        )
        SELECT event_type, n,
               floor((n + (-1.0) * sign(u - 0.5)
                          * ln(1.0 - 2.0 * abs(u - 0.5)))
                     * 10000 + 0.5) / 10000 AS n_dp
        FROM u ORDER BY event_type
    """,
    "q_grouped_ols": """
        WITH li AS (
          SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
                 CAST(l_extendedprice AS DECIMAL(20,6)) AS y
          FROM lineitem
        ),
        a AS (
          SELECT l_returnflag,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 sum(y) AS sy,
                 sum(x * y) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
          FROM li GROUP BY ROLLUP (l_returnflag)
        )
        SELECT coalesce(l_returnflag, 'ALL') AS grp, n,
               CASE WHEN (CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                            / CAST(n AS DOUBLE)) > 0 THEN
                 floor((CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       / (CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                            / CAST(n AS DOUBLE))
                       * 10000 + 0.5) / 10000
               END AS slope
        FROM a ORDER BY grp
    """,
    "q_inventory_balance": """
        WITH li AS (
          SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
                 CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_quantity AS BIGINT)
                      ELSE -CAST(l_quantity AS BIGINT) END AS mv
          FROM lineitem
        ),
        p AS (
          SELECT l_partkey,
                 sum(mv) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS pfx,
                 row_number() OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ) AS rn
          FROM li
        ),
        r AS (
          SELECT l_partkey, rn, pfx,
                 min(pfx) OVER (
                   PARTITION BY l_partkey ORDER BY rn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS rmin,
                 min(pfx) OVER (
                   PARTITION BY l_partkey ORDER BY rn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS rmin_prev
          FROM p
        ),
        f AS (
          SELECT l_partkey, rn,
                 pfx - least(0, rmin) AS w,
                 CASE WHEN pfx < 0
                       AND (rmin_prev IS NULL OR pfx < rmin_prev)
                      THEN 1 ELSE 0 END AS clamp
          FROM r
        )
        SELECT l_partkey AS partkey, count(*) AS n_mov,
               CAST(max_by(w, rn) AS BIGINT) AS final_balance,
               CAST(max(w) AS BIGINT) AS peak_balance,
               CAST(sum(clamp) AS BIGINT) AS n_clamps
        FROM f GROUP BY l_partkey
        ORDER BY n_mov DESC, partkey LIMIT 20
    """,
    "q_asof_join_forward": """
        WITH ev AS (SELECT *, epoch_us(ts) AS tsn FROM events),
        clicks AS (
          SELECT user_id, event_id, tsn AS ts FROM ev
          WHERE event_type = 'click'
        ),
        purchases AS (
          SELECT user_id, tsn AS ts, max(value) AS state FROM ev
          WHERE event_type = 'purchase' GROUP BY user_id, tsn
        )
        SELECT c.user_id, c.event_id, c.ts,
               p.ts AS matched_time, p.state AS matched_state,
               p.ts - c.ts AS wait_us
        FROM clicks c
        ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
    "q_range_join": """
        WITH intervals AS (
          SELECT n_nationkey AS interval_id,
                 n_nationkey * 4.0 AS lo,
                 n_nationkey * 4.0 + 10.0 AS hi
          FROM nation
        )
        SELECT interval_id, count(*) AS cnt
        FROM events JOIN intervals
          ON value >= lo AND value < hi
        GROUP BY interval_id
    """,
    "q_unpivot": """
        WITH wide AS (
          SELECT l_returnflag,
                 count(*) FILTER (WHERE l_linestatus = 'O') AS o_cnt,
                 count(*) FILTER (WHERE l_linestatus = 'F') AS f_cnt
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'o_cnt' AS status, o_cnt AS cnt FROM wide
        UNION ALL
        SELECT l_returnflag, 'f_cnt' AS status, f_cnt AS cnt FROM wide
    """,
    "q_topk_per_group": """
        SELECT l_returnflag, l_linestatus, cnt, rn FROM (
          SELECT l_returnflag, l_linestatus, cnt,
                 row_number() OVER (
                   PARTITION BY l_returnflag ORDER BY cnt DESC, l_linestatus
                 ) AS rn
          FROM (
            SELECT l_returnflag, l_linestatus, count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag, l_linestatus
          )
        ) WHERE rn <= 2
    """,
    # exact-distinct profiler: 4 metrics × 4 columns as UNION ALL rows,
    # min/max stringified identically (bigints/varchars only)
    "q_profile": " UNION ALL ".join(
        part
        for c in ["doc_id", "lang", "source", "n_chars"]
        for part in [
            f"SELECT '{c}:nulls' AS metric, "
            f"CAST(count(CASE WHEN {c} IS NULL THEN 1 END) AS VARCHAR) AS value "
            "FROM documents",
            f"SELECT '{c}:distinct', CAST(count(DISTINCT {c}) AS VARCHAR) "
            "FROM documents",
            f"SELECT '{c}:min', CAST(min({c}) AS VARCHAR) FROM documents",
            f"SELECT '{c}:max', CAST(max({c}) AS VARCHAR) FROM documents",
        ]
    ),
    "q_find_one": """
        SELECT o_orderkey, o_orderstatus FROM orders
        ORDER BY o_orderkey LIMIT 1
    """,
    "q_pivot_counts": """
        SELECT l_returnflag,
               count(*) FILTER (WHERE l_linestatus = 'O') AS o_cnt,
               count(*) FILTER (WHERE l_linestatus = 'F') AS f_cnt
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_percentiles": """
        SELECT o_orderstatus,
               floor(quantile_cont(o_totalprice, 0.5) * 10000 + 0.5) / 10000 AS p50,
               floor(quantile_cont(o_totalprice, 0.9) * 10000 + 0.5) / 10000 AS p90,
               floor(quantile_cont(o_totalprice, 0.99) * 10000 + 0.5) / 10000 AS p99
        FROM orders GROUP BY o_orderstatus
    """,
    "q_stats_moments": """
        SELECT floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty,
               floor(stddev_samp(l_quantity) * 10000 + 0.5) / 10000 AS sd_qty,
               min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty,
               floor(corr(l_quantity, l_extendedprice) * 10000 + 0.5) / 10000 AS corr_qp
        FROM lineitem
    """,
    "q_histogram": """
        SELECT CAST(floor(value / 10) AS BIGINT) AS bin, count(*) AS cnt
        FROM events GROUP BY bin
    """,
    "q_grouping_sets": """
        WITH e AS (
          SELECT event_type, user_id % 10 AS cohort, value FROM events
        )
        SELECT event_type, cohort, count(*) AS cnt,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS val_sum
        FROM e GROUP BY GROUPING SETS ((event_type), (cohort), ())
    """,
    "q_join_skew_metrics": """
        WITH freq AS (
          SELECT l_orderkey, count(*) AS f FROM lineitem GROUP BY 1
        ),
        t5 AS (
          SELECT CAST(sum(f) AS BIGINT) AS top5_rows
          FROM (SELECT f FROM freq ORDER BY f DESC, l_orderkey LIMIT 5)
        ),
        s AS (
          SELECT count(*) AS n_keys,
                 CAST(sum(f) AS BIGINT) AS n_rows,
                 max(f) AS max_freq,
                 quantile_cont(f, 0.5) AS p50,
                 quantile_cont(f, 0.99) AS p99
          FROM freq
        )
        SELECT n_keys, n_rows, max_freq,
               floor(top5_rows / CAST(n_rows AS DOUBLE) * 10000 + 0.5)
                 / 10000 AS top5_share,
               floor(p99 / p50 * 10000 + 0.5) / 10000 AS p99_over_median
        FROM s, t5
    """,
    "q_functional_dependency": """
        WITH v1 AS (
          SELECT o_custkey AS lhs, count(*) AS n_rhs
          FROM (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
          GROUP BY 1
        ),
        v2 AS (
          SELECT o_orderkey AS lhs, count(*) AS n_rhs
          FROM (SELECT DISTINCT o_orderkey, o_orderstatus FROM orders)
          GROUP BY 1
        ),
        f AS (
          SELECT 'o_custkey -> o_orderpriority' AS fd,
                 count(*) AS n_lhs,
                 count(CASE WHEN n_rhs > 1 THEN 1 END) AS n_violating,
                 floor(count(CASE WHEN n_rhs > 1 THEN 1 END)
                       / CAST(count(*) AS DOUBLE) * 10000 + 0.5) / 10000
                   AS violation_share
          FROM v1
          UNION ALL
          SELECT 'o_orderkey -> o_orderstatus',
                 count(*),
                 count(CASE WHEN n_rhs > 1 THEN 1 END),
                 floor(count(CASE WHEN n_rhs > 1 THEN 1 END)
                       / CAST(count(*) AS DOUBLE) * 10000 + 0.5) / 10000
          FROM v2
        )
        SELECT fd, n_lhs, n_violating, violation_share FROM f ORDER BY fd
    """,
    "q_change_point": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
          FROM events GROUP BY 1, 2
        ),
        pre AS (
          SELECT event_type, day,
                 sum(y) OVER (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS s1,
                 row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS n1,
                 sum(y) OVER (PARTITION BY event_type) AS st,
                 count(*) OVER (PARTITION BY event_type) AS nt
          FROM daily
        ),
        cand AS (
          SELECT event_type,
                 strftime(day, '%Y-%m-%d') AS split_day,
                 floor(
                   CAST(n1 AS DOUBLE) * CAST(nt - n1 AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) + CAST(nt - n1 AS DOUBLE))
                     * (s1 / CAST(n1 AS DOUBLE)
                        - (st - s1) / CAST(nt - n1 AS DOUBLE))
                     * (s1 / CAST(n1 AS DOUBLE)
                        - (st - s1) / CAST(nt - n1 AS DOUBLE))
                   * 10000 + 0.5) / 10000 AS score
          FROM pre WHERE n1 < nt
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY event_type ORDER BY score DESC, split_day DESC
          ) AS r
          FROM cand
        )
        SELECT event_type, split_day, score FROM ranked
        WHERE r = 1 ORDER BY event_type
    """,
    "q_pseudonymize": """
        SELECT substr(md5('pepper-2026|' || CAST(user_id AS VARCHAR)),
                      1, 16) AS pid,
               count(*) AS n_events,
               count(DISTINCT event_type) AS n_types
        FROM events
        GROUP BY pid
        ORDER BY n_events DESC, pid LIMIT 20
    """,
    "q_grouping_sets_ranked": """
        WITH e AS (
          SELECT event_type, user_id % 10 AS cohort, value FROM events
        ), g AS (
          SELECT event_type, cohort, count(*) AS cnt,
                 floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       * 10000 + 0.5) / 10000 AS val_sum,
                 CAST(GROUPING(event_type, cohort) AS INT) AS lvl
          FROM e GROUP BY GROUPING SETS ((event_type), (cohort), ())
        )
        SELECT event_type, cohort, lvl, cnt, val_sum,
               CAST(rank() OVER (
                 PARTITION BY lvl
                 ORDER BY cnt DESC, event_type, cohort
               ) AS INT) AS rnk
        FROM g
    """,
    "q_equidepth_histogram": """
        WITH b AS (
          SELECT list_transform(
                   quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                   x -> floor(x * 10000 + 0.5) / 10000
                 ) AS bnds
          FROM events
        ),
        a AS (
          SELECT floor(value * 10000 + 0.5) / 10000 AS v,
                 len(list_filter(bnds,
                     x -> floor(value * 10000 + 0.5) / 10000 > x)) AS bucket
          FROM events, b
        )
        SELECT bucket, count(*) AS cnt, min(v) AS lo, max(v) AS hi
        FROM a GROUP BY bucket
    """,
    "q_json_extract": """
        WITH k AS (
          SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events
        )
        SELECT event_type,
               count(*) FILTER (WHERE k IS NOT NULL) AS n_with_k,
               CAST(sum(k) AS BIGINT) AS sum_k,
               min(k) AS min_k, max(k) AS max_k
        FROM k GROUP BY event_type
    """,
    "q_data_quality": """
        WITH report AS (
          SELECT count(*) FILTER (WHERE o_orderkey IS NULL) AS null_o_orderkey,
                 count(*) FILTER (WHERE o_custkey IS NULL) AS null_o_custkey,
                 count(*) FILTER (WHERE o_orderstatus IS NULL) AS null_o_orderstatus,
                 count(*) FILTER (WHERE o_totalprice < 0.0 OR o_totalprice > 1e7)
                   AS oob_o_totalprice,
                 count(*) AS n_rows
          FROM orders
        ),
        dups AS (
          SELECT count(*) AS dup_keys_o_orderkey FROM (
            SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1
          )
        ),
        orphans AS (
          SELECT count(*) AS orphan_orders FROM orders
          WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        )
        SELECT * FROM report, dups, orphans
    """,
    "q_rollup_counts": """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q_cube_counts": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "q_intersect_keys": """
        SELECT c_nationkey AS nk FROM customer
        INTERSECT
        SELECT s_nationkey AS nk FROM supplier
    """,
    "q_except_keys": """
        SELECT DISTINCT nk FROM (
          SELECT c_nationkey AS nk FROM customer
          EXCEPT ALL
          SELECT s_nationkey AS nk FROM supplier
        )
    """,
    "q_date_extract": """
        SELECT CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
               count(*) AS cnt,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY y, m
    """,
    "q_rank_functions": """
        WITH t AS (
          SELECT event_type, user_id,
                 CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total
          FROM events GROUP BY event_type, user_id
        )
        SELECT event_type, user_id,
               floor(total * 10000 + 0.5) / 10000 AS total4,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               floor(percent_rank() OVER w * 10000 + 0.5) / 10000 AS prnk,
               floor(cume_dist() OVER w * 10000 + 0.5) / 10000 AS cdist
        FROM t
        WINDOW w AS (PARTITION BY event_type ORDER BY total DESC)
        QUALIFY rnk <= 10
    """,
}
