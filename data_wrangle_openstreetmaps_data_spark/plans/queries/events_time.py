"""Event-time analytics: sessionization, funnels, cohorts, outliers, DAU/WAU.

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
)

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403



def q_churn_labels(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — CENSORING-AWARE churn-label generation, the label-side
    companion of q_point_in_time_features: per (user, active epoch-week)
    emit the weekly activity count plus churned_14d = 1 iff the user has
    NO event in the two following weeks — computed from lead(week) over
    the user's active weeks, so it needs no self-join and no horizon
    scan. The real ML-dataset detail is RIGHT-CENSORING: a label whose
    two-week horizon extends past the corpus' last timestamp is UNKNOWN,
    not 0 — those rows carry churned_14d = NULL (observable iff
    horizon_end = (week+3)·7d ≤ max_tsn + 1 µs, exact integer test).
    Shape: one keyed aggregate, one lag-family window, one broadcast
    scalar. Oracle: identical lead + scalar max in SQL."""
    from pyspark.sql import Window

    week_us = 7 * 86_400_000_000
    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    weekly = ev.groupBy(
        "user_id", F.expr(f"tsn div {week_us}").alias("week")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    mx = ev.agg(F.max("tsn").alias("max_tsn"))
    nxt = F.lead("week").over(
        Window.partitionBy("user_id").orderBy("week")
    )
    return (
        weekly.withColumn("next_week", nxt)
        .crossJoin(F.broadcast(mx))  # 1-row scalar
        .select(
            "user_id",
            "week",
            "n_events",
            F.when(
                (F.col("week") + 3) * week_us > F.col("max_tsn") + 1,
                F.lit(None).cast("int"),
            )
            .when(
                F.col("next_week").isNull()
                | (F.col("next_week") > F.col("week") + 2),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("churned_14d"),
        )
        .orderBy("user_id", "week")
    )


def q_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — next-event transition matrix (the Markov/path-mining shape):
    per user, each event paired with its successor by a lead() over
    (event-time, id), then (src,dst) pair counts and per-src transition
    probabilities. One user-keyed shuffle for the window; the matrix
    aggregate is |types|² rows."""
    from pyspark.sql import Window

    df = table(spark, sf, "events")
    df = df.withColumn("tsn", catalog.event_ts_us(df))
    w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
    pairs = df.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    cnt = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))
    wsrc = Window.partitionBy("src")
    return cnt.select(
        "src",
        "dst",
        "cnt",
        text.round4(F.col("cnt") / F.sum("cnt").over(wsrc)).alias("prob"),
    )


def q_time_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — event-time bucketing (reference has no date/time functions):
    daily event counts from the ts column (type-adaptive via event_ts)."""
    df = table(spark, sf, "events")
    day = F.date_format(
        F.date_trunc("day", catalog.event_ts(df)), "yyyy-MM-dd"
    )
    return (
        df.groupBy(day.alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_resample_daily(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — time-series gap fill / daily resampling: every user's
    activity span is densified to one row per calendar day (zero-count
    days included) by generating the per-user day spine with
    ``sequence()`` and left-joining the daily counts — a generate, not a
    users×calendar crossJoin, so the spine is linear in Σ span days and
    partitions with the user key. The downstream shape for rolling
    features over sparse activity."""
    df = table(spark, sf, "events")
    day = F.to_date(catalog.event_ts(df))
    daily = (
        df.select("user_id", day.alias("d"))
        .groupBy("user_id", "d")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    span = daily.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("d"),
    )
    return (
        spine.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )


def q_cumulative_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — running distinct-user count per day WITHOUT a quadratic
    distinct-over-expanding-window: each user collapses to their first
    active day (one user-keyed aggregate), daily first-appearance counts
    follow, and the cumulative sum runs over the tiny |days| frame — the
    growth-curve query at any scale."""
    from pyspark.sql import Window

    df = table(spark, sf, "events")
    day = F.date_format(F.date_trunc("day", catalog.event_ts(df)), "yyyy-MM-dd")
    first = (
        df.select("user_id", day.alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("d"))
    )
    new_per_day = first.groupBy("d").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return new_per_day.select(
        "d", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )


def q_activity_streaks(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — gaps-and-islands: longest consecutive-active-day streak per
    user. Islands via the classic date-minus-row_number constant: one
    user-keyed shuffle for the (user, day) dedup + window, then two tiny
    aggregates; no self-join, no recursive walk — the retention-quality
    metric shape."""
    from pyspark.sql import Window

    df = table(spark, sf, "events")
    day = F.to_date(catalog.event_ts(df))
    ud = df.select("user_id", day.alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = ud.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("n_active_days"),
    )


def q_hopping_window(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — hopping (sliding) event-time windows: 2-day windows advancing
    by 1 day, counts and decimal value sums per window × event_type. Each
    event lands in exactly two windows — ``F.window`` emits both
    assignments in the scan (a generate, not a self-join), then one hash
    aggregate; epoch-aligned window starts keep Spark and the oracle's
    truncate-and-shift arithmetic identical."""
    df = table(spark, sf, "events")
    ts = catalog.event_ts(df)
    w = F.window(ts, "2 days", "1 day")
    return (
        df.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            text.round4(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            ).alias("val_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("w_start"),
            "event_type",
            "cnt",
            "val_sum",
        )
    )


def q_zscore_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — per-group standardization: z-score of each event's value
    against its event_type's mean/stddev, top-20 most extreme. The
    per-group moments are a 5-row aggregate broadcast back onto the fact
    scan — no window over the full table, one shuffle for the tiny stats
    side only."""
    df = table(spark, sf, "events").select("event_id", "event_type", "value")
    stats = df.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        df.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            text.round4(F.col("value")).alias("val"),
            text.round4(z).alias("z"),
        )
        .orderBy(F.desc(F.abs(F.col("z"))), "event_id")
        .limit(20)
    )


def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — batch sessionization (window lag + cumulative sum): sessions
    of events per user with 12h inactivity gap. Timestamps compared at
    MICROsecond precision (sessionize_batch normalizes ts type-adaptively;
    DuckDB's epoch_us matches at µs)."""
    from data_wrangle_openstreetmaps_data_spark.streaming.sessionize import (
        sessionize_batch,
    )

    ev = table(spark, sf, "events")
    # normalize ONCE at the read boundary: bigint downstream always means µs
    ev = ev.withColumn("ts", catalog.event_ts_us(ev))
    return sessionize_batch(ev, _SESSION_GAP_US)


def q_session_window_native(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — sessionization via Spark's NATIVE session_window grouping
    (dynamic-gap session windows in the aggregate layer, no explicit
    lag/cumsum plan) with the SAME 12h gap and output contract as
    q_sessionize — so the built-in operator is cross-checked against
    the hand-built gaps-and-islands form AND the DuckDB oracle at
    once. session_window's end is last_event + gap, so the last-event
    time is end − gap, converted back to epoch-µs. One shuffle on
    (user_id), session state merged in the aggregate — the batch twin
    of the streaming session operator."""
    ev = table(spark, sf, "events")
    ts = F.timestamp_micros(catalog.event_ts_us(ev))
    g = (
        ev.groupBy(
            "user_id",
            F.session_window(ts, "12 hours").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return g.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("session_start"),
        (F.unix_micros(F.col("w.end")) - F.lit(_SESSION_GAP_US)).alias(
            "session_end"
        ),
        "n_events",
    )


def q_debounce(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — event debouncing: suppress repeat (user, event_type)
    events arriving within 5 minutes of the previously KEPT-or-not
    predecessor (lag-based form: within 5 min of the previous raw
    event — the standard relational debounce). Output is the per-type
    keep audit: total, kept, and kept-ratio. One (user, type)-keyed
    window, no self-join; this is the dedup-adjacent cleanup step in
    front of sessionization at 100 TB."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    e = ev.select(
        "user_id", "event_type", "event_id",
        catalog.event_ts_us(ev).alias("tsn"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "tsn", "event_id"
    )
    prev = F.lag("tsn").over(w)
    keep = prev.isNull() | (F.col("tsn") - prev > F.lit(300_000_000))
    flagged = e.withColumn("keep", keep)
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("keep"), F.lit(1))).alias("n_kept"),
        )
        .withColumn(
            "keep_ratio",
            text.round4(F.col("n_kept") / F.col("n_total")),
        )
        .orderBy("event_type")
    )


def q_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — ordered-sequence funnel: per user, the first signup, then the
    first purchase strictly after it within 7 days; output one row per
    funnel stage with the user count (signup → converted). Conditional
    aggregation keyed on user_id — the min-over-filter pattern, no self
    -join of the raw events; the 7-day bound uses the µs event time."""
    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    week_us = 7 * 86400 * 10**6
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("tsn"))
        ).alias("first_signup")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("tsn").alias("p_ts")
    )
    converted = (
        per_user.filter(F.col("first_signup").isNotNull())
        .join(purchases, F.col("user_id") == F.col("p_user"))
        .filter(
            (F.col("p_ts") > F.col("first_signup"))
            & (F.col("p_ts") <= F.col("first_signup") + week_us)
        )
        .select("user_id")
        .distinct()
    )
    signed = per_user.filter(F.col("first_signup").isNotNull())
    return signed.agg(
        F.lit("signup").alias("stage"),
        F.count(F.lit(1)).alias("users"),
    ).unionByName(
        converted.agg(
            F.lit("converted_7d").alias("stage"),
            F.count(F.lit(1)).alias("users"),
        )
    )


def q_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — cohort retention matrix: users cohorted by first-active day,
    distinct active users counted per (cohort_day, active_day). The
    (user, day) dedup, the per-user min, and the join are all keyed on
    user_id — one hash partitioning reused across the three steps — then
    a final small (cohort, day) aggregation. Type-adaptive event time."""
    ev = table(spark, sf, "events")
    day = F.date_format(
        F.date_trunc("day", catalog.event_ts(ev)), "yyyy-MM-dd"
    )
    ud = ev.select("user_id", day.alias("active_day")).distinct()
    first = ud.groupBy("user_id").agg(
        F.min("active_day").alias("cohort_day")
    )
    return (
        ud.join(first, "user_id")
        .groupBy("cohort_day", "active_day")
        .agg(F.count_distinct(F.col("user_id")).alias("active_users"))
    )


def q_ltv_cohort(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — cumulative LTV matrix, the revenue companion of
    q_cohort_retention: users cohorted by first-active epoch-week
    (integer day div 7 — no engine week-of-year conventions), purchase
    revenue accumulated per (cohort_week, age_weeks) and divided by
    cohort size to give LTV-per-user at each age. Revenue stays on the
    exact 1e-4 grid (bigint) through the (cohort, age) aggregate AND
    the running cumulative (the window runs over the tiny
    cohort×age matrix, not the fact table), so the only double is the
    final per-user division. Shuffles: user-keyed dedup/min + one
    matrix aggregate."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    e = ev.select(
        "user_id",
        F.expr("(tsn div 86400000000) div 7").alias("week"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * F.lit(10000.0) + F.lit(0.5)).cast(
                "long"
            ),
        )
        .otherwise(F.lit(0))
        .alias("vi"),
    )
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    cells = (
        e.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("age_weeks"),
        )
        .agg(F.sum("vi").cast("long").alias("rev_i"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.withColumn("cum_i", F.sum("rev_i").over(w))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "cohort_users",
            text.round4(
                F.col("rev_i").cast("double") / F.lit(10000.0)
            ).alias("revenue"),
            text.round4(
                F.col("cum_i").cast("double")
                / F.lit(10000.0)
                / F.col("cohort_users").cast("double")
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


def q_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — robust (median/MAD) outlier counts per event type: values
    more than 3 MADs from the per-type median. Medians are exact
    interpolated percentiles 4-dp-floored on BOTH engines before any
    comparison, so the 3·MAD threshold cannot flip boundary rows. Three
    scan passes, each reduced by partial aggregation; the tiny per-type
    stats frames ride broadcasts back onto the fact scan (same shape as
    the z-score query — no full-table window)."""
    ev = table(spark, sf, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        text.round4(F.percentile(F.col("value"), F.lit(0.5))).alias("med")
    )
    j1 = ev.join(F.broadcast(med), "event_type")
    mad = j1.groupBy("event_type").agg(
        text.round4(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5))
        ).alias("mad")
    )
    return (
        j1.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.count(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > 3.0 * F.col("mad"),
                    1,
                )
            ).alias("n_outliers"),
        )
    )


def q_user_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Shannon entropy (nats) of each user's event-type mix, via
    the aggregate identity H = ln(n) − Σ c·ln(c)/n so one pass over the
    per-(user,type) counts suffices — no per-row probability column.
    Two keyed aggregates, both map-side combined; ≤|types| doubles per
    user make the 4-dp floor deterministic in practice."""
    ev = table(spark, sf, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        c.groupBy("user_id")
        .agg(
            F.sum("cnt").alias("n_events"),
            F.sum(F.col("cnt") * F.log(F.col("cnt"))).alias("clc"),
        )
        .select(
            "user_id",
            "n_events",
            text.round4(
                F.log(F.col("n_events")) - F.col("clc") / F.col("n_events")
            ).alias("entropy"),
        )
    )


def q_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — time-weighted average of each user's value signal
    (step-function integral / elapsed time): one keyed window produces
    the lead-timestamp interval lengths in exact integer µs, then a
    decimal-exact weighted sum divides by the exact µs total. One
    shuffle on the user key; deterministic (ts, event_id) ordering."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    tsn = catalog.event_ts_us(ev)
    w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
    seg = (
        ev.select("user_id", "event_id", "value", tsn.alias("tsn"))
        .withColumn("dt", F.lead("tsn").over(w) - F.col("tsn"))
        .filter(F.col("dt").isNotNull())
    )
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        text.round4(
            F.sum((F.col("value") * F.col("dt")).cast("decimal(38,6)")).cast(
                "double"
            )
            / F.sum("dt")
        ).alias("twa"),
    )


def q_chi_square(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — chi-square independence test of user segment (user_id % 7)
    × event type, computed relationally: the 35-cell contingency table
    is one aggregate; marginals and the grand total are broadcast
    re-aggregations of those 35 rows; per-cell terms are exact doubles
    of integer counts, decimal-cast before the final sum so partition
    order cannot wiggle the statistic."""
    ev = table(spark, sf, "events")
    cells = (
        ev.select((F.col("user_id") % 7).alias("seg"), "event_type")
        .groupBy("seg", "event_type")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    rows = cells.groupBy("seg").agg(F.sum("obs").alias("row_tot"))
    cols = cells.groupBy("event_type").agg(F.sum("obs").alias("col_tot"))
    # dof derives from the observed contingency dimensions, not a
    # hardcoded 7×5 — a testdata vintage with a different event-type
    # count must report the right degrees of freedom
    n = cells.agg(
        F.sum("obs").alias("n_tot"),
        F.countDistinct("seg").alias("n_seg"),
        F.countDistinct("event_type").alias("n_et"),
    )
    exp = (
        F.col("row_tot").cast("double")
        * F.col("col_tot")
        / F.col("n_tot")
    )
    term = F.pow(F.col("obs") - exp, F.lit(2.0)) / exp
    return (
        cells.join(F.broadcast(rows), "seg")
        .join(F.broadcast(cols), "event_type")
        .crossJoin(F.broadcast(n))
        .agg(
            text.round4(
                F.sum(term.cast("decimal(30,10)")).cast("double")
            ).alias("chi2"),
            F.count(F.lit(1)).alias("n_cells"),
            (
                (F.min("n_seg") - F.lit(1)) * (F.min("n_et") - F.lit(1))
            )
            .cast("long")
            .alias("dof"),
        )
    )


def q_event_trigrams(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — behavioral path mining: the 15 most common 3-step event-type
    paths (adjacent trigrams per user in event-time order). One user-keyed
    window produces both lookaheads in a single pass; the trigram space is
    bounded at |types|³ so the count shuffle is tiny. Extends the 2-step
    transition matrix (q_event_transitions) to path granularity."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    tsn = catalog.event_ts_us(ev)
    w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
    e = ev.select("user_id", "event_id", "event_type", tsn.alias("tsn"))
    tri = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "t1", "t2", "t3")
        .limit(15)
    )


def q_dau_wau_stickiness(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — DAU / trailing-7-day WAU stickiness per day. DISTINCT over
    a sliding window isn't supported, and the naive rewrite re-scans 7
    days per day; the scale form is FAN-OUT + DEDUP: each (user, day)
    membership row contributes the user to WAU(day..day+6) via one
    generate, then one distinct and one count — linear in |user-days|×7
    with no per-day rescans. Emitted only for days with actual activity
    (inner join), stickiness = DAU/WAU."""
    ev = table(spark, sf, "events")
    day = F.to_date(catalog.event_ts(ev))
    ud = ev.select("user_id", day.alias("d")).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("w"),
    ).distinct()
    wau = fan.groupBy("w").agg(F.count(F.lit(1)).alias("wau"))
    return (
        dau.join(wau, dau["d"] == wau["w"])
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            text.round4(F.col("dau") / F.col("wau")).alias("stickiness"),
        )
    )


def q_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — exponentially weighted moving average over each user's
    last 10 events (α=0.5, normalized). True EWMA is a recurrence Spark
    windows can't express; the bounded-window form is exact over the
    frame and fully relational: ONE user-keyed window collects the
    frame values, then array-side zip_with/aggregate apply the weights
    — no self-join fan-out, no per-row Python. α=0.5 keeps every weight
    an exact binary fraction, so both engines compute identical doubles
    (4dp-floored output). At 100 TB: one shuffle on user_id, per-row
    state bounded at 10 values."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    e = ev.select(
        "user_id", "event_id", "value",
        catalog.event_ts_us(ev).alias("tsn"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tsn", "event_id")
        .rowsBetween(-9, 0)
    )
    vals = F.collect_list("value").over(w)
    e = e.withColumn("vals", vals)
    n = F.size("vals")
    weighted = F.zip_with(
        F.col("vals"),
        F.sequence(n - 1, F.lit(0)),
        lambda v, exp: v * F.pow(F.lit(0.5), exp),
    )
    num = F.aggregate(
        weighted, F.lit(0.0), lambda acc, x: acc + x
    )
    den = F.lit(2.0) - F.pow(F.lit(0.5), (n - 1).cast("double"))
    return e.select(
        "user_id", "event_id", text.round4(num / den).alias("ewma")
    )


def _holt_coeffs() -> list[list[float]]:
    """Exact dyadic forecast weights for Holt's linear trend with
    α=β=1/2 over a window of n=1..10 values: unrolling the recursion
    ℓ_t = ½y_t + ½(ℓ+b), b_t = ½(ℓ_t−ℓ)+½b symbolically gives the
    1-step forecast ℓ+b = Σ c_i·y_i with every c_i a power-of-2
    fraction — EXACT as a double, so both engines evaluate identical
    products (the α=½ device from q_ewma, extended to a 2-state
    recursion). Weights sum to 1; old values get negative weight (the
    trend extrapolation)."""
    from fractions import Fraction as Fr

    out = []
    for n in range(1, 11):
        lvl = [Fr(0)] * n
        trd = [Fr(0)] * n
        lvl[0] = Fr(1)
        for t in range(1, n):
            lp = lvl[:]
            lvl = [(lp[i] + trd[i]) / 2 for i in range(n)]
            lvl[t] += Fr(1, 2)
            trd = [(lvl[i] - lp[i]) / 2 + trd[i] / 2 for i in range(n)]
        out.append([float(lvl[i] + trd[i]) for i in range(n)])
    return out


def q_holt_linear(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Holt's linear-trend 1-step forecast of each user's value
    stream over the last 10 events: the level+trend upgrade of q_ewma
    (which cannot follow a drifting series). The recursion is unrolled
    into EXACT dyadic weights (see _holt_coeffs) selected by frame
    length from a literal weight table, applied with one
    zip_with/aggregate fold over the same bounded collect_list window —
    fully relational, one user-keyed shuffle, per-row state ≤ 10
    values. Top-20 largest forecasts (forecast desc, ids) keep the
    output bounded."""
    from pyspark.sql import Window

    W = _holt_coeffs()
    w_spark = "array({})".format(
        ", ".join(
            "array({})".format(", ".join(repr(c) + "D" for c in row))
            for row in W
        )
    )
    ev = table(spark, sf, "events")
    e = ev.select(
        "user_id", "event_id", "value",
        catalog.event_ts_us(ev).alias("tsn"),
    )
    fw = (
        Window.partitionBy("user_id")
        .orderBy("tsn", "event_id")
        .rowsBetween(-9, 0)
    )
    e = e.withColumn("vals", F.collect_list("value").over(fw))
    forecast = F.expr(
        "aggregate(zip_with(vals, element_at("
        + w_spark
        + ", size(vals)), (v, c) -> v * c), 0.0D, (acc, x) -> acc + x)"
    )
    return (
        e.select(
            "user_id",
            "event_id",
            text.round4(forecast).alias("holt_forecast"),
        )
        .orderBy(F.desc("holt_forecast"), "user_id", "event_id")
        .limit(20)
    )


def q_session_paths(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — session path mining: the top 20 opening paths (first ≤3
    event types, '>'-joined) across gaps-and-islands sessions (12 h
    gap, the q_session_attribution islands) with session counts and
    conversion share (sessions whose path reached a purchase among the
    first 3 steps). The path prefix tree every journey-analysis tool
    draws. Deterministic end to end: the per-session order is (tsn,
    event_id), prefixes collect as sorted (rank, type) structs, and
    counts are exact. Two user-keyed windows + one path rollup."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    e = ev.select(
        "user_id", "event_id", "event_type",
        catalog.event_ts_us(ev).alias("tsn"),
    )
    w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
    new_s = F.when(
        F.lag("tsn").over(w).isNull()
        | (F.col("tsn") - F.lag("tsn").over(w) > _SESSION_GAP_US),
        1,
    ).otherwise(0)
    s = e.withColumn("sid", F.sum(new_s).over(w))
    ws = Window.partitionBy("user_id", "sid").orderBy("tsn", "event_id")
    s = s.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= 3
    )
    per = s.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return (
        per.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


def q_session_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — first-touch attribution: each session's purchases credited
    to the session's FIRST event type (the marketing-attribution shape).
    Composition is fully relational: gaps-and-islands session ids (12h
    gap), then ONE per-session aggregate (argmin-struct first touch +
    conditional purchase sums — no second window), then a |event types|-
    row rollup. Two user-keyed shuffles total; nothing global."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", "value",
        catalog.event_ts_us(ev).alias("tsn"),
    )
    w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
    new_s = F.when(
        F.lag("tsn").over(w).isNull()
        | (F.col("tsn") - F.lag("tsn").over(w) > _SESSION_GAP_US),
        1,
    ).otherwise(0)
    s = e.withColumn("sid", F.sum(new_s).over(w))
    g = s.groupBy("user_id", "sid").agg(
        F.min(F.struct("tsn", "event_id", "event_type"))["event_type"]
        .alias("first_type"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "n_purch"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .cast("decimal(18,2)")
        ).alias("rev"),
    )
    return (
        g.groupBy("first_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_purch").cast("long").alias("n_purchases"),
            text.round4(
                F.coalesce(F.sum("rev"), F.lit(0)).cast("double")
            ).alias("revenue"),
        )
        .orderBy("first_type")
    )


def q_decay_trending(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — exponentially time-decayed trending score per event type:
    Σ 0.5^(days before the corpus max date), the standard recency-
    weighted popularity ranking. The decayed sum accumulates as an
    EXACT bigint (Σ 2^(40-k), k = capped day age), so no float
    summation order exists to drift — both engines produce the same
    integer, then one exact power-of-two division (valid while
    rows·2^40 < 2^63, i.e. up to ~8M rows per type per 40-day horizon;
    shard the sum by week and re-sum at larger scale). One aggregate
    with map-side combine plus a broadcast max-date scalar."""
    ev = table(spark, sf, "events")
    day = F.to_date(catalog.event_ts(ev))
    mx = ev.agg(F.max(F.to_date(catalog.event_ts(ev))).alias("mxd"))
    k = F.least(F.datediff(F.col("mxd"), F.col("day")), F.lit(40))
    e = ev.select("event_type", day.alias("day")).crossJoin(F.broadcast(mx))
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("shiftleft(cast(1 as bigint), 40 - k)")).alias(
                "scaled"
            ),
        )
        .select(
            "event_type",
            "n_events",
            text.round4(
                F.col("scaled").cast("double") / F.lit(float(1 << 40))
            ).alias("trend"),
        )
        .orderBy(F.desc("trend"), "event_type")
    )


def q_welch_ttest(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Welch's unequal-variance t-test between purchase and click
    event values: the A/B-experiment significance primitive. Means and
    sample variances come from ONE conditional aggregate over a single
    scan (no per-arm subqueries); t and the Welch–Satterthwaite df are
    closed-form scalar arithmetic on the six aggregates. Everything
    after the scan is a 1-row frame."""
    ev = table(spark, sf, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )

    def arm(t: str, tag: str):
        v = F.when(F.col("event_type") == t, F.col("value"))
        return [
            F.count(v).cast("double").alias(f"n{tag}"),
            F.avg(v).alias(f"m{tag}"),
            F.var_samp(v).alias(f"v{tag}"),
        ]

    agg = ev.agg(*arm("purchase", "1"), *arm("click", "2"))
    se1 = F.col("v1") / F.col("n1")
    se2 = F.col("v2") / F.col("n2")
    t_stat = (F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2)
    df_w = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1)
    )
    return agg.select(
        F.col("n1").cast("long").alias("n_purchase"),
        F.col("n2").cast("long").alias("n_click"),
        text.round4(F.col("m1")).alias("mean_purchase"),
        text.round4(F.col("m2")).alias("mean_click"),
        text.round4(t_stat).alias("t_stat"),
        text.round4(df_w).alias("df_welch"),
    )


def q_interval_overlap_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — interval×interval overlap join: which users' daily
    activity spans overlap ±30-minute incident windows around
    high-severity error events — the blast-radius query of an incident
    postmortem. Hourly spans (not whole-day) and the severity filter
    keep candidate density linear in true overlaps; the join itself
    never goes quadratic regardless. Both
    interval sets explode into 1-hour buckets and meet in an EQUALITY
    join (operators/join.py::interval_overlap_join) — two overlapping
    intervals always share a covered bucket, so the residual inequality
    only filters candidates; no nested-loop cross product at any scale.
    All µs integers from the vintage-dispatching catalog contract."""
    from data_wrangle_openstreetmaps_data_spark.operators.join import (
        interval_overlap_join,
    )

    ev = table(spark, sf, "events")
    e = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.col("value").alias("val"),
        catalog.event_ts_us(ev).alias("tsn"),
    )
    # hourly activity spans, not whole-day: interval length ≈ bucket
    # width keeps candidate density linear in true overlaps — whole-day
    # spans would overlap every window that day and the pair count
    # itself would go quadratic in traffic, regardless of join strategy
    hour_us = 3_600_000_000
    spans = e.groupBy(
        "user_id", F.floor(F.col("tsn") / hour_us).alias("hr")
    ).agg(F.min("tsn").alias("a_lo"), F.max("tsn").alias("a_hi"))
    half_win = 1_800_000_000  # 30 min in µs
    wins = e.filter(
        (F.col("event_type") == "error") & (F.col("val") > 95)
    ).select(
        F.col("event_id").alias("win_id"),
        (F.col("tsn") - half_win).alias("b_lo"),
        (F.col("tsn") + half_win).alias("b_hi"),
    )
    pairs = interval_overlap_join(
        spans, wins, "a_lo", "a_hi", "b_lo", "b_hi",
        bucket=hour_us,
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count_distinct(F.col("win_id")).alias("n_overlaps"))
        .orderBy(F.desc("n_overlaps"), "user_id")
        .limit(20)
    )


def q_rolling_median(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — rolling MEDIAN over each user's last 10 events: the
    robust-smoothing companion to q_ewma (a median filter shrugs off
    the spike that drags any mean-family smoother). True streaming
    rolling medians need an order-statistic tree; the bounded-frame
    relational form is exact and cheap — ONE user-keyed window collects
    the ≤10-value frame, an array sort + interpolated middle does the
    rest array-side. Same scale shape as q_ewma: one shuffle on
    user_id, per-row state bounded at 10 values."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    e = ev.select(
        "user_id", "event_id", "value",
        catalog.event_ts_us(ev).alias("tsn"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tsn", "event_id")
        .rowsBetween(-9, 0)
    )
    vals = F.array_sort(F.collect_list("value").over(w))
    e = e.withColumn("s", vals)
    n = F.size("s")
    # integer-div indices only: double→int casts TRUNCATE in Spark but
    # ROUND in DuckDB — div/- arithmetic sidesteps the divergence
    odd = F.element_at("s", F.expr("CAST((size(s) + 1) div 2 AS INT)"))
    even = (
        F.element_at("s", F.expr("CAST(size(s) div 2 AS INT)"))
        + F.element_at("s", F.expr("CAST(size(s) div 2 + 1 AS INT)"))
    ) / F.lit(2.0)
    med = F.when(n % 2 == 1, odd).otherwise(even)
    return e.select(
        "user_id", "event_id", text.round4(med).alias("roll_median")
    )


def q_interval_union(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — interval COALESCE (union of overlapping intervals): each
    user's hourly activity spans are merged wherever they overlap or
    touch, the interval-algebra complement of the overlap JOIN. Islands
    form where an interval starts beyond the running max end of all
    prior intervals (lag-of-running-max window — one user-keyed pass,
    no self-join); output is the per-user audit (input intervals,
    merged intervals, exact covered µs). This is how you compute true
    coverage time from overlapping validity windows at 100 TB: the
    window partitions by the entity key, state is one running max."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    hour_us = 3_600_000_000
    e = ev.select("user_id", catalog.event_ts_us(ev).alias("tsn"))
    spans = e.groupBy(
        "user_id", F.floor(F.col("tsn") / hour_us).alias("hr")
    ).agg(
        F.min("tsn").alias("lo"),
        (F.max("tsn") + F.lit(1)).alias("hi"),  # half-open [lo, hi)
    )
    w = Window.partitionBy("user_id").orderBy("lo", "hi")
    prev_max = F.max("hi").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = spans.withColumn(
        "new_island",
        F.when(
            prev_max.isNull() | (F.col("lo") > prev_max), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("n_in"),
        F.min("lo").alias("mlo"),
        F.max("hi").alias("mhi"),
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.sum("n_in").alias("n_intervals"),
            F.count(F.lit(1)).alias("n_merged"),
            F.sum(F.col("mhi") - F.col("mlo")).alias("covered_us"),
        )
        .orderBy("user_id")
    )


def q_autocorrelation(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — lag-1 autocorrelation of the daily event-count series per
    type (the seasonality/burstiness diagnostic next to
    q_dow_seasonality). The row-scale work is one daily-count
    aggregate; the lag alignment is a broadcast self-join of the
    |types|·|days| frame on day+1 and the Pearson corr runs over those
    bounded pairs."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(catalog.event_ts(ev)).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    cur = daily.select(
        "event_type", "day", F.col("cnt").alias("cnt_t")
    )
    nxt = daily.select(
        F.col("event_type").alias("et2"),
        F.date_add(F.col("day"), 1).alias("day2"),
        F.col("cnt").alias("cnt_prev"),
    )
    joined = cur.join(
        F.broadcast(nxt),
        (F.col("event_type") == F.col("et2"))
        & (F.col("day") == F.col("day2")),
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            text.round4(F.corr("cnt_t", "cnt_prev")).alias("acf1"),
        )
        .orderBy("event_type")
    )


def q_seasonal_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — seasonal-baseline anomaly screen: each of the last 7 days'
    per-type counts against the average for that day-of-week over the
    earlier baseline window (the expected-vs-observed monitor that
    respects weekly seasonality, unlike the global z-score). The split
    date derives from max(observed day) — no vintage-fragile literal;
    weekday uses the locale-stable 'E'/%a token (q_dow_seasonality's
    rule). Baseline averages are exact (integer sums / day counts), so
    the only rounding is presentational. Row-scale work is one daily
    aggregate; everything after runs on |types|×|days| frames."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(catalog.event_ts(ev)).alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    mx = daily.agg(F.max("d").alias("mxd"))
    d2 = daily.crossJoin(F.broadcast(mx)).withColumn(
        "dow", F.date_format(F.col("d"), "E")
    )
    split = F.date_sub(F.col("mxd"), 7)
    base = (
        d2.filter(F.col("d") <= split)
        .groupBy("event_type", "dow")
        .agg(F.avg("cnt").alias("exp_cnt"))
    )
    obs = d2.filter(F.col("d") > split)
    ratio = F.col("cnt") / F.col("exp_cnt")
    return (
        obs.join(F.broadcast(base), ["event_type", "dow"])
        .select(
            "event_type",
            F.date_format(F.col("d"), "yyyy-MM-dd").alias("day"),
            "dow",
            "cnt",
            text.round4(F.col("exp_cnt")).alias("expected"),
            text.round4(ratio).alias("ratio"),
            text.round4(F.abs(ratio - 1)).alias("dev"),
        )
        .orderBy("event_type", "day")
    )


def q_ols_trend(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — closed-form least-squares trend fit of the daily event
    count per type: y = intercept + slope·day_index, from the classic
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) in ONE aggregate over
    the daily frame. Every sufficient statistic is an exact BIGINT
    (day index and counts are integers), so slope and intercept are
    single exact-operand divisions — bit-identical cross-engine after
    round4, no float-sum order anywhere. Day 0 derives from min(day)
    (no vintage-fragile literal) and rides a broadcast scalar. This is
    how you fit a million per-key trends on a 100 TB log: one partial-
    aggregable pass, never a per-key regression loop."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(catalog.event_ts(ev)).alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    d0 = daily.agg(F.min("day").alias("d0"))
    xy = daily.crossJoin(F.broadcast(d0)).select(
        "event_type",
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )
    s = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (
        F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / den
    intercept = (
        F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    ) / den
    return s.select(
        "event_type",
        "n_days",
        text.round4(slope).alias("slope"),
        text.round4(intercept).alias("intercept"),
    ).orderBy("event_type")


def q_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Theil–Sen ROBUST trend: per event type, the median of all
    pairwise slopes (y_j − y_i)/(x_j − x_i) of the daily count series —
    the outlier-immune companion to q_ols_trend (one corrupted day
    moves OLS arbitrarily, Theil–Sen needs 29% corruption). The
    pairwise stage runs on the DAY-AGGREGATED frame, never the fact
    table: |days|²/2 pairs per type (bounded by the calendar, not
    traffic), joined equi on event_type with the x_i < x_j residual.
    Slopes are single bigint/bigint divisions (deterministic doubles);
    the median is exact interpolated percentile over the bounded pair
    set."""
    ev = table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(catalog.event_ts(ev)).alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    d0 = daily.agg(F.min("day").alias("d0"))
    xy = daily.crossJoin(F.broadcast(d0)).select(
        "event_type",
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )
    a, b = xy.alias("a"), xy.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))
        ).alias("slope"),
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            text.round4(F.expr("percentile(slope, 0.5)")).alias(
                "theil_slope"
            ),
        )
        .orderBy("event_type")
    )


def q_time_to_convert(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — time-to-convert distribution per user segment: each user's
    first 'view' and first 'purchase' AFTER that view (one conditional
    aggregate per user — min-over-when, never a sort), converted users'
    latencies summarized as exact interpolated p50/p90 minutes. All
    latency arithmetic stays in exact epoch-µs integers until the final
    minutes division (an exact power-of-ten scale). The per-user pass
    is one user-keyed aggregate + a re-aggregate over converted users —
    the funnel-latency shape next to q_funnel_conversion's stage
    counts."""
    ev = table(spark, sf, "events")
    tsn = catalog.event_ts_us(ev)
    per_user = (
        ev.select(
            "user_id",
            F.col("event_type").alias("et"),
            tsn.alias("tsn"),
        )
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("et") == "view", F.col("tsn"))).alias(
                "first_view"
            ),
        )
    )
    purch = (
        ev.select("user_id", F.col("event_type").alias("et"), tsn.alias("tsn"))
        .join(per_user, "user_id")
        .filter(
            (F.col("et") == "purchase")
            & F.col("first_view").isNotNull()
            & (F.col("tsn") > F.col("first_view"))
        )
        .groupBy("user_id")
        .agg(
            F.min("first_view").alias("fv"),
            F.min("tsn").alias("fp"),
        )
    )
    lat = purch.select(
        (F.col("user_id") % 7).alias("seg"),
        ((F.col("fp") - F.col("fv")) / F.lit(60_000_000.0)).alias(
            "mins"
        ),
    )
    return (
        lat.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            text.round4(F.expr("percentile(mins, 0.5)")).alias("p50_min"),
            text.round4(F.expr("percentile(mins, 0.9)")).alias("p90_min"),
        )
        .orderBy("seg")
    )


def q_ks_test(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — two-sample Kolmogorov–Smirnov test between the purchase
    and click value distributions: the distribution-shift detector that
    complements q_welch_ttest (means) and q_chi_square (categories) —
    the canonical "did the metric's whole shape drift" check between an
    A/B arm or two data vintages. D = max |F₁(v) − F₂(v)| over the
    merged support. Fully integer until ONE division: values quantize
    to cents (floor ×100 — deterministic on both engines, and it bounds
    the ECDF support by the value RANGE, not the row count), per-cent
    counts pre-aggregate with map-side combine, cumulative counts
    cross-multiply — |Fp·Nc − Fc·Np| is an exact bigint (safe to ~3e9
    rows per arm), so the argmax is engine-independent; D and the
    location emerge from one broadcast scalar join. The cumulative
    window is global but runs over the cent histogram (≤ range·100
    rows); at true scale swap in the two-phase blocked cumsum with
    driver-sampled literal boundaries (operators/sample.py pattern).
    ks_at reports the SMALLEST cent where the max gap is attained
    (deterministic tiebreak)."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    h = ev.select(
        F.floor(F.col("value") * 100).cast("long").alias("vc"),
        "event_type",
    ).groupBy("vc").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("cp"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("cc"),
    )
    w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    tot = h.agg(
        F.sum("cp").cast("long").alias("np"),
        F.sum("cc").cast("long").alias("nc"),
    )
    cum = h.select(
        "vc",
        F.sum("cp").over(w).alias("fp"),
        F.sum("cc").over(w).alias("fc"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "vc",
        "np",
        "nc",
        F.abs(
            F.col("fp") * F.col("nc") - F.col("fc") * F.col("np")
        ).alias("dint"),
    )
    mx = d.agg(F.max("dint").alias("dmax"))
    hit = d.crossJoin(F.broadcast(mx)).filter(F.col("dint") == F.col("dmax"))
    return hit.agg(
        F.min("np").alias("n_purchase"),
        F.min("nc").alias("n_click"),
        text.round4(
            F.min("dmax").cast("double")
            / (F.min("np").cast("double") * F.min("nc").cast("double"))
        ).alias("ks_stat"),
        text.round4(F.min("vc").cast("double") / F.lit(100.0)).alias(
            "ks_at"
        ),
    )


def q_mann_whitney(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Mann–Whitney U rank-sum test between purchase and click
    values: the nonparametric sibling of q_welch_ttest (no normality
    assumption) and the location counterpart of q_ks_test's shape test.
    Same cent-histogram skeleton as q_ks_test — and the quantization is
    what makes tie handling EXACT: for a cent bucket with t tied values
    after c_before smaller ones, the doubled midrank is the integer
    2·c_before + t + 1, so the purchase-arm doubled rank sum
    R2 = Σ cp·(2·c_before + t + 1), the doubled statistic
    2U = R2 − n1(n1+1), and the tie correction T = Σ(t³−t) are ALL
    exact bigints in both engines (t³ bounds the exactness at ~2M rows
    per cent bucket; shard hot buckets first beyond that). Only the
    normal-approximation z touches doubles, expression-mirrored. One
    shuffle for the histogram; the cumulative window again runs over
    the cent support, not the rows."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    h = ev.select(
        F.floor(F.col("value") * 100).cast("long").alias("vc"),
        "event_type",
    ).groupBy("vc").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("cp"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("cc"),
    )
    t = (F.col("cp") + F.col("cc")).alias("t")
    h = h.select("vc", "cp", "cc", t)
    w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, -1)
    h = h.withColumn(
        "cb", F.coalesce(F.sum("t").over(w), F.lit(0)).cast("long")
    )
    agg = h.agg(
        F.sum("cp").cast("long").alias("n1"),
        F.sum("cc").cast("long").alias("n2"),
        F.sum(
            F.col("cp") * (F.lit(2) * F.col("cb") + F.col("t") + F.lit(1))
        ).cast("long").alias("r2"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("long").alias("tcorr"),
    )
    u2 = F.col("r2") - F.col("n1") * (F.col("n1") + F.lit(1))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    var = (n1d * n2d / F.lit(12.0)) * (
        (nd + F.lit(1.0))
        - F.col("tcorr").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    z = (u2.cast("double") - n1d * n2d) / (F.lit(2.0) * F.sqrt(var))
    return agg.select(
        F.col("n1").alias("n_purchase"),
        F.col("n2").alias("n_click"),
        u2.alias("u_doubled"),
        text.round4(u2.cast("double") / F.lit(2.0)).alias("u_stat"),
        text.round4(z).alias("z_stat"),
    )


def q_spearman_corr(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Spearman rank correlation between each user's purchase
    spend and their total event count: "do heavy users spend more" as
    a monotonic-association test, robust where q_ols_trend's Pearson
    is not. Ranks use the same integer doubled-midrank device as
    q_mann_whitney (2·c_before + t + 1 per tied value, from a
    histogram cumsum joined back) — and since Pearson is invariant
    under affine maps, the doubled ranks feed the correlation directly
    with no halving, keeping ALL five sufficient statistics
    (n, Σx, Σy, Σx², Σxy) exact bigints. The final combination
    n·Σxy − Σx·Σy would overflow int64 (~4n⁴), so it widens to
    DECIMAL on the Spark side and HUGEINT in DuckDB — still exact
    integers (to n ≈ 1e6; shard ranks beyond) — and only the closing
    divide/sqrt touches doubles, expression-mirrored. Spend sums as
    cent-exact decimals (never double summation). Rank histograms'
    global cumsum windows run over distinct-value counts; at scale
    use the blocked two-phase cumsum (q_sequence_gaps pattern)."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("b"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,2)"),
                )
            ),
            F.lit(0).cast("decimal(18,2)"),
        ).alias("spend"),
    )
    u = u.select(
        "user_id",
        (F.col("spend") * 100).cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
    )

    def midranks(col: str) -> DataFrame:
        h = u.groupBy(col).agg(F.count(F.lit(1)).alias("t"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return h.select(
            col,
            (
                F.lit(2) * F.coalesce(F.sum("t").over(w), F.lit(0))
                + F.col("t")
                + F.lit(1)
            ).cast("long").alias(f"r_{col}"),
        )

    j = u.join(midranks("a"), "a").join(midranks("b"), "b")
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r_a").cast("long").alias("sx"),
        F.sum("r_b").cast("long").alias("sy"),
        F.sum(F.col("r_a") * F.col("r_a")).cast("long").alias("sxx"),
        F.sum(F.col("r_b") * F.col("r_b")).cast("long").alias("syy"),
        F.sum(F.col("r_a") * F.col("r_b")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("decimal(12,0)")
    num = nd * F.col("sxy").cast("decimal(22,0)") - F.col("sx").cast(
        "decimal(16,0)"
    ) * F.col("sy").cast("decimal(16,0)")
    d1 = nd * F.col("sxx").cast("decimal(22,0)") - F.col("sx").cast(
        "decimal(16,0)"
    ) * F.col("sx").cast("decimal(16,0)")
    d2 = nd * F.col("syy").cast("decimal(22,0)") - F.col("sy").cast(
        "decimal(16,0)"
    ) * F.col("sy").cast("decimal(16,0)")
    rho = num.cast("double") / (
        F.sqrt(d1.cast("double")) * F.sqrt(d2.cast("double"))
    )
    return s.select(
        F.col("n").alias("n_users"),
        text.round4(rho).alias("rho_spearman"),
    )


def q_cross_correlation(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — lead–lag cross-correlogram between the click and purchase
    hourly series ("does click activity lead purchases, and by how
    many hours"): Pearson r between click(t−L) and purchase(t) for
    L = 0..6, the multivariate big sibling of q_autocorrelation. The
    series is DENSIFIED first (sequence over the hour span, absent
    hours = 0 — skipping this biases r toward busy hours), then each
    lag is one arm of a 7-way explode joined back on the shifted hour —
    an equijoin on (h − L), so Catalyst hashes it; the grid is
    support-sized (hours, not events) and travels broadcast. All five
    sufficient statistics per lag are exact integers (counts ×
    counts widened decimal/HUGEINT before summing), one mirrored
    double expression closes r. Scales by the hour-keyed count
    aggregate alone — the correlogram arithmetic is O(|hours|·|lags|)
    regardless of event volume."""
    ev = table(spark, sf, "events")
    us = catalog.event_ts_us(ev)
    e = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        us.alias("tsn"), "event_type"
    )
    cnt = (
        e.select(F.expr("tsn div 3600000000").alias("h"), "event_type")
        .groupBy("h")
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("c"),
            F.count(
                F.when(F.col("event_type") == "purchase", 1)
            ).alias("p"),
        )
    )
    bounds = cnt.agg(F.min("h").alias("mh"), F.max("h").alias("xh"))
    grid = bounds.select(
        F.explode(F.sequence(F.col("mh"), F.col("xh"))).alias("h")
    )
    g = (
        grid.join(cnt, "h", "left")
        .select(
            "h",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            F.coalesce(F.col("p"), F.lit(0)).alias("p"),
        )
    )
    y = g.select(
        "h",
        F.col("p").alias("y"),
        F.explode(F.array(*[F.lit(i) for i in range(7)])).alias("lag"),
    )
    x = g.select(F.col("h").alias("hx"), F.col("c").alias("x"))
    j = y.join(
        F.broadcast(x), F.col("hx") == F.col("h") - F.col("lag")
    )
    xb = F.col("x").cast("decimal(19,0)")
    yb = F.col("y").cast("decimal(19,0)")
    st = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((xb * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((xb * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((yb * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )

    def d(c: str) -> F.Column:
        return F.col(c).cast("double")

    cov = d("n") * d("sxy") - d("sx") * d("sy")
    varx = d("n") * d("sxx") - d("sx") * d("sx")
    vary = d("n") * d("syy") - d("sy") * d("sy")
    r = F.when(
        (varx > 0) & (vary > 0), cov / F.sqrt(varx * vary)
    ).otherwise(F.lit(0.0))
    return st.select(
        "lag",
        F.col("n").alias("n_pairs"),
        text.round4(r).alias("r"),
    ).orderBy("lag")


def q_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Kaplan–Meier product-limit survival curve for user churn:
    lifetime = hours between a user's first and last event, death =
    churn (no activity within the final 12 h of the observation window,
    the same inactivity gap as the sessionizers), everyone else
    right-censored at their observed lifetime. The estimator runs
    entirely on the lifetime-hour SUPPORT: one user-keyed aggregate →
    an |hours|-sized histogram of (deaths, censored), risk sets by a
    prefix-sum window (n_t = total − exits before t), and the product
    Π(1 − d/n) as exp of a running Σ ln(1 − d/n) — the log-sum trick
    keeps the cross-engine arithmetic a mirrored sum like the entropy
    queries, never a float product fold. A terminal n = d step yields
    ln 0 = −inf → S = 0 identically in both engines. Only death steps
    are emitted (the standard KM table). Windows run over the support,
    not users; scales by the user-keyed shuffle alone."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    us = catalog.event_ts_us(ev)
    e = ev.select("user_id", us.alias("tsn"))
    pu = e.groupBy("user_id").agg(
        F.min("tsn").alias("f"), F.max("tsn").alias("l")
    )
    te = e.agg(F.max("tsn").alias("te"))
    gap = F.lit(_SESSION_GAP_US)
    d = (
        pu.crossJoin(F.broadcast(te))
        .select(
            F.expr("(l - f) div 3600000000").alias("hr"),
            F.when(F.col("te") - F.col("l") >= gap, 1)
            .otherwise(0)
            .alias("dead"),
        )
        .groupBy("hr")
        .agg(
            F.count(F.when(F.col("dead") == 1, 1)).alias("deaths"),
            F.count(F.when(F.col("dead") == 0, 1)).alias("censored"),
        )
    )
    wp = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, -1)
    ws = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, 0)
    tot = d.agg(F.sum(F.col("deaths") + F.col("censored")).alias("nu"))
    r = (
        d.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("nu")
            - F.coalesce(
                F.sum(F.col("deaths") + F.col("censored")).over(wp),
                F.lit(0),
            ),
        )
        .withColumn(
            "lnterm",
            F.when(
                F.col("deaths") > 0,
                F.log(
                    F.lit(1.0)
                    - F.col("deaths").cast("double")
                    / F.col("n_risk").cast("double")
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("ls", F.sum("lnterm").over(ws))
    )
    return (
        r.filter(F.col("deaths") > 0)
        .select(
            "hr",
            "n_risk",
            "deaths",
            "censored",
            text.round4(F.exp(F.col("ls"))).alias("survival"),
        )
        .orderBy("hr")
    )


def q_multitouch_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — position-based (U-shaped) multi-touch attribution, the
    fractional-credit companion to q_session_attribution's first-touch
    winner-take-all: every click/view before a user's FIRST purchase
    earns credit 1.0 (solo), 0.5/0.5 (two touches), else 0.4 first +
    0.4 last + 0.2/(n−2) split across middles, rolled up by channel
    (props.k mod 7). Per-row credit is an IEEE double computed by the
    identical expression on both engines, then summed through an exact
    decimal(20,10) cast — the double-sum-order trap never reaches the
    4dp boundary. All windows partition by user; the rollup is one
    bounded-key aggregate."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("tsn").alias("fp_ts"))
    )
    touches = (
        ev.where(F.col("event_type").isin("click", "view"))
        .join(fp, "user_id")
        .where(F.col("tsn") < F.col("fp_ts"))
        .select(
            "user_id",
            "tsn",
            "event_id",
            (F.get_json_object("props", "$.k").cast("long") % 7).alias(
                "channel"
            ),
        )
    )
    wu = Window.partitionBy("user_id")
    wo = wu.orderBy("tsn", "event_id")
    t = touches.withColumn("rn", F.row_number().over(wo)).withColumn(
        "n", F.count(F.lit(1)).over(wu)
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2).cast("double"))
    )
    return (
        t.withColumn("credit", credit)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum(F.col("credit").cast("decimal(20,10)"))
            .cast("double")
            .alias("credit_raw"),
        )
        .select(
            "channel",
            "n_touches",
            "n_users",
            text.round4(F.col("credit_raw")).alias("credit"),
        )
        .orderBy("channel")
    )


def q_runs_test(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Wald–Wolfowitz runs test for serial randomness of the daily
    purchase-revenue series: days classified above/below the overall
    daily mean, runs counted from sign changes, z-score against the
    analytic E[R] and Var[R]. The above-mean indicator is FLOAT-FREE —
    rev·n_days > total compared in exact decimals (cross-multiplication,
    never rev > total/n in doubles) — so both engines classify every
    boundary day identically. The data-sized work is one day-keyed
    aggregate; the lag/agg runs over the bounded calendar-day dimension
    (one row per day, not per event)."""
    from pyspark.sql import Window

    df = table(spark, sf, "events")
    daily = (
        df.where(F.col("event_type") == "purchase")
        .select(F.to_date(catalog.event_ts(df)).alias("d"), "value")
        .groupBy("d")
        .agg(F.sum(F.col("value").cast("decimal(20,6)")).alias("rev"))
    )
    tot = daily.agg(
        F.sum("rev").alias("total"), F.count(F.lit(1)).alias("nd")
    )
    s = daily.crossJoin(F.broadcast(tot)).withColumn(
        "sgn",
        F.when(F.col("rev") * F.col("nd") > F.col("total"), 1).otherwise(
            0
        ),
    )
    s = s.withColumn(
        "chg",
        F.when(
            F.lag("sgn").over(Window.orderBy("d")).isNotNull()
            & (F.lag("sgn").over(Window.orderBy("d")) != F.col("sgn")),
            1,
        ).otherwise(0),
    )
    a = s.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("sgn").cast("long").alias("n_above"),
        (F.count(F.lit(1)) - F.sum("sgn")).cast("long").alias("n_below"),
        (F.lit(1) + F.sum("chg")).cast("long").alias("runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    nd = F.col("n_days").cast("double")
    e = F.lit(2.0) * n1 * n2 / nd + F.lit(1.0)
    var = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - nd)
        / (nd * nd * (nd - F.lit(1.0)))
    )
    return a.select(
        "n_days",
        "n_above",
        "n_below",
        "runs",
        text.round4(e).alias("e_runs"),
        text.round4(
            F.when(
                var > 0,
                (F.col("runs").cast("double") - e) / F.sqrt(var),
            )
        ).alias("z"),
    )


def q_activity_bitmap(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — weekly activity bitmaps: each user folds to a 28-bit
    pattern (bit 4·d+s set iff the user has any event on epoch-day ≡ d
    mod 7 in six-hour slot s — pure integer day/hour arithmetic, NEVER
    an engine dayofweek() whose week-start convention differs across
    engines), then the pattern distribution: n_users per bitmap with
    its popcount. The bitmap-index/engagement-segmentation shape: two
    key-equality aggregates (user → bit_or, pattern → count), and the
    bitmap itself is what a roaring-style index would store per user at
    100 TB. ``shiftleft`` + ``bit_or`` + ``bit_count`` keep everything
    in exact integer bit math cross-engine."""
    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    b = F.expr(
        "CAST(((tsn div 86400000000) % 7) * 4"
        " + ((tsn div 3600000000) % 24) div 6 AS INT)"
    )
    per_user = (
        ev.select("user_id", b.alias("b"))
        .withColumn("bit", F.expr("shiftleft(1L, b)"))
        .groupBy("user_id")
        .agg(F.bit_or("bit").alias("pattern"))
    )
    return (
        per_user.groupBy("pattern")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "pattern",
            F.bit_count("pattern").alias("n_slots"),
            "n_users",
        )
        .orderBy(F.desc("n_users"), "pattern")
        .limit(20)
    )


def q_forecast_backtest(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — walk-forward backtest of the Holt linear forecaster on the
    daily event-count series: each day is predicted from the trailing
    ≤10 days EXCLUDING itself (frame -10..-1 — no leakage), using the
    same exact dyadic weight table as q_holt_linear, and scored with
    its absolute percentage error. THE eval loop that must exist before
    any forecast ships; per-day rows keep every float op a mirrored
    per-row expression (no error-sum crosses engines). The window runs
    over the |days|-row DAILY AGGREGATE, not the fact table."""
    from pyspark.sql import Window

    W = _holt_coeffs()
    w_spark = "array({})".format(
        ", ".join(
            "array({})".format(", ".join(repr(c) + "D" for c in row))
            for row in W
        )
    )
    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    daily = (
        ev.select(F.expr("tsn div 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    fw = Window.orderBy("day").rowsBetween(-10, -1)
    d = daily.withColumn("vals", F.collect_list("c").over(fw)).filter(
        F.size("vals") >= 1
    )
    forecast = F.expr(
        "aggregate(zip_with(vals, element_at("
        + w_spark
        + ", size(vals)), (v, c) -> v * c), 0.0D, (acc, x) -> acc + x)"
    )
    return (
        d.select(
            "day",
            F.col("c").cast("long").alias("actual"),
            text.round4(forecast).alias("forecast"),
            text.round4(
                F.abs(forecast - F.col("c")) / F.col("c")
            ).alias("ape"),
        )
        .orderBy("day")
        .limit(60)
    )


def q_new_vs_returning(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — daily new-vs-returning split, the first product-analytics
    chart on any dashboard: a user is NEW on their first-event day
    (one per-user min aggregate), returning on every later active day.
    Plan: (user) min-day aggregate joined back to the (user, day)
    distinct activity — both key-equality shuffles with map-side
    combine — then a |days|-row rollup. Pure integer day arithmetic."""
    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    ud = ev.select(
        "user_id", F.expr("tsn div 86400000000").alias("day")
    ).distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        ud.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.when(F.col("day") == F.col("first_day"), 1))
            .cast("long")
            .alias("new_users"),
            F.count(F.when(F.col("day") != F.col("first_day"), 1))
            .cast("long")
            .alias("returning_users"),
        )
        .orderBy("day")
        .limit(40)
    )


def q_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — STL-lite decomposition of the daily event-count series
    with a FLOAT-SUM-FREE trick: the centered 7-day moving average
    enters in units of 1/7 (t7 = Σ±3 days of counts, an exact bigint
    window sum), so the detrended series 7·c − t7 is an exact INTEGER
    per day and the day-of-week seasonal component is an exact-integer
    ratio Σ(7c − t7) / (7·n_dow) — no double is ever summed, the
    failure mode every naive decomposition has cross-engine. Output:
    per day-of-week (epoch-day mod 7, engine-neutral), the seasonal
    offset and its share of the mean. One day aggregate + one 7-row
    rollup; the MA window is a 7-row frame over |days| rows."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    daily = (
        ev.select(F.expr("tsn div 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    d = (
        daily.withColumn("t7", F.sum("c").over(w))
        .withColumn("nw", F.count("c").over(w))
        .filter(F.col("nw") == 7)  # full centered window only
    )
    det = d.select(
        F.pmod(F.col("day"), F.lit(7)).cast("int").alias("dow"),
        (F.lit(7) * F.col("c") - F.col("t7")).alias("d7"),
        "c",
    )
    return (
        det.groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("d7").cast("long").alias("sd7"),
            F.sum("c").cast("long").alias("sc"),
        )
        .select(
            "dow",
            "n_days",
            text.round4(
                F.col("sd7").cast("double")
                / (F.lit(7.0) * F.col("n_days").cast("double"))
            ).alias("seasonal"),
            text.round4(
                F.col("sd7").cast("double")
                / (F.lit(7.0) * F.col("sc").cast("double"))
            ).alias("seasonal_share"),
        )
        .orderBy("dow")
    )


def q_sax_symbolic(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — SAX (Symbolic Aggregate approXimation) of the daily
    event-count series: zero-filled day spine → 5-day PAA segment
    means → z-normalization against the whole series → 4-letter
    alphabet by the Gaussian quartile breakpoints ±0.6745 — the
    time-series-mining representation that turns a series into a
    string for motif/novelty search. Every sufficient statistic
    (daily counts, segment sums, ΣC, ΣC², D) is an EXACT bigint off
    the zero-filled spine; mean/std/z are mirrored double expressions
    and the letter CASE compares the 4-dp-rounded z so a boundary ulp
    can't flip symbols cross-engine. The day spine is a generated
    sequence off two broadcast scalars — no row-order dependence
    anywhere."""
    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    daily = (
        ev.select(F.expr("tsn div 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bounds = daily.agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.lit(0), (F.col("mx") - F.col("mn")).cast("int"))
        ).alias("idx"),
        "mn",
    )
    filled = (
        spine.join(
            daily,
            spine.idx + spine.mn == daily.day,
            "left",
        )
        .select("idx", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    glob = filled.agg(
        F.count(F.lit(1)).cast("long").alias("d_days"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    seg = (
        filled.groupBy(F.expr("idx div 5").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("c").cast("long").alias("seg_c"),
        )
    )
    dd = F.col("d_days").cast("double")
    mean = F.col("sc").cast("double") / dd
    std = (
        F.sqrt(
            (
                F.col("d_days") * F.col("s2")
                - F.col("sc") * F.col("sc")
            ).cast("double")
        )
        / dd
    )
    paa = F.col("seg_c").cast("double") / F.col("n_days").cast("double")
    z4 = text.round4((paa - mean) / std)
    sym = (
        F.when(z4 < -0.6745, "a")
        .when(z4 < 0.0, "b")
        .when(z4 < 0.6745, "c")
        .otherwise("d")
    )
    return (
        seg.crossJoin(F.broadcast(glob))
        .select(
            "segment",
            "n_days",
            text.round4(paa).alias("paa"),
            z4.alias("z"),
            sym.alias("symbol"),
        )
        .orderBy("segment")
    )


def q_freshness_sla(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — data FRESHNESS dashboard, per event feed: last event seen,
    lag behind the corpus watermark (max ts anywhere — the "now" an
    offline corpus can honestly use), event count, and a staleness flag
    at a 24 h SLA. The ops view that tells you which upstream feed
    silently stopped. One grouped aggregate + one broadcast scalar;
    lag stays an exact µs integer until the single round4'd hour
    division; timestamps render as strings (the cross-engine date rule).
    At scale this reads the per-partition max from the table manifest
    instead of scanning — the shape (group-max vs global-max) is the
    same."""
    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    per = ev.groupBy("event_type").agg(
        F.max("tsn").alias("last_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    wm = ev.agg(F.max("tsn").alias("wm_us"))
    lag_us = F.col("wm_us") - F.col("last_us")
    return (
        per.crossJoin(F.broadcast(wm))  # 1-row scalar
        .select(
            "event_type",
            F.date_format(
                F.expr("timestamp_micros(last_us)"),  # exact, no /1e6 float
                "yyyy-MM-dd HH:mm:ss",
            ).alias("last_seen"),
            "n_events",
            lag_us.cast("long").alias("lag_us"),
            text.round4(lag_us / F.lit(3_600_000_000.0)).alias("lag_hours"),
            F.when(lag_us > 24 * 3_600_000_000, 1)
            .otherwise(0)
            .cast("int")
            .alias("stale_24h"),
        )
        .orderBy("event_type")
    )


def q_out_of_order_audit(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — event-time disorder audit, the measurement that SIZES a
    streaming watermark: events land on 8 ingest shards (portable md5
    of user_id — the bounded Kafka-partition topology a real source
    has; the watermark is a per-source-partition property, so 8 is the
    data's shape, not a scale cap) and each ARRIVES at its event time
    plus a planted per-event delay (portable md5 of event_id, 0..2 h —
    the testdata itself ships perfectly ordered, so the jitter is the
    deterministic disorder harness, exactly like the DIRTY_CITIES typo
    planting). Lateness = running max of EVENT time seen so far on the
    shard in ARRIVAL order minus own event time; the histogram buckets
    it by bit length in ms (0 = in order; bucket b covers
    [2^(b-1), 2^b) ms) — the top occupied bucket is the
    allowed-lateness to configure. One shard-partitioned window + a
    ≤64-row aggregate; pure integer µs/ms arithmetic cross-engine."""
    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    arrival = F.col("tsn") + F.pmod(
        portable_token_hash(F.col("event_id").cast("string")),
        F.lit(7_200_000_000),
    )
    shard = F.pmod(
        portable_token_hash(F.col("user_id").cast("string")), F.lit(8)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late_ms = F.expr("(rmax - tsn) div 1000")
    d = ev.select(
        shard.alias("shard"),
        "event_id",
        "tsn",
        arrival.alias("arr"),
    ).withColumn("rmax", F.max("tsn").over(w))
    bucket = F.when(late_ms == 0, F.lit(0)).otherwise(
        F.length(F.bin(late_ms)).cast("int")
    )
    return (
        d.groupBy(bucket.alias("late_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(late_ms).cast("long").alias("max_late_ms"),
        )
        .orderBy("late_bucket")
    )


def q_fano_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — per-user burstiness as the Fano factor of daily event
    counts over the full observed span: F = var/mean of the D daily
    counts (zero days included — they add nothing to Σc or Σc², and D
    comes from the global min/max day as a broadcast scalar), computed
    as (D·Σc² − (Σc)²) / (Σc·D) from EXACT bigint sufficient statistics
    with ONE double division (the grid-integer discipline — float sums
    never cross engines). F≈1 is Poisson traffic; F≫1 flags bursty
    bot-like users — the rate-anomaly screen. Plan: (user,day) count
    aggregate → user aggregate → top-20; all key-equality shuffles with
    map-side combine."""
    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    day = F.expr("tsn div 86400000000")
    daily = (
        ev.select("user_id", day.alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    span = ev.select(day.alias("day")).agg(
        (F.max("day") - F.min("day") + 1).alias("d_days")
    )
    per = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("active_days"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sc2"),
    )
    return (
        per.crossJoin(F.broadcast(span))
        .select(
            "user_id",
            "active_days",
            F.col("sc").alias("n_events"),
            text.round4(
                (
                    F.col("d_days") * F.col("sc2")
                    - F.col("sc") * F.col("sc")
                ).cast("double")
                / (F.col("sc") * F.col("d_days")).cast("double")
            ).alias("fano"),
        )
        .orderBy(F.desc("fano"), "user_id")
        .limit(20)
    )


def q_peak_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — peak concurrent users per day via the classic +1/−1
    boundary sweep: each user's daily presence interval is
    [min ts, max ts] of their events, boundaries collapse to one row
    per (day, ts) carrying (net delta, #starts), and the peak candidate
    at each instant is cumsum(net before this ts) + starts(this ts) —
    starts are applied before ends at the same instant, so touching
    intervals count as concurrent and zero-length (single-event)
    intervals still register. Collapsing to per-instant NET deltas
    before the window removes any within-timestamp ordering ambiguity —
    the peak is exact integer arithmetic, deterministic cross-engine.
    At 100 TB this is two key-equality aggregates plus one per-day
    window over distinct instants (bounded by events/day), the standard
    capacity-planning sweep over session logs."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    iv = ev.groupBy(
        F.expr("tsn div 86400000000").alias("day"), "user_id"
    ).agg(F.min("tsn").alias("lo"), F.max("tsn").alias("hi"))
    pts = iv.select(
        "day", F.col("lo").alias("tsn"), F.lit(1).alias("d")
    ).unionAll(iv.select("day", F.col("hi").alias("tsn"), F.lit(-1).alias("d")))
    per_ts = pts.groupBy("day", "tsn").agg(
        F.sum("d").alias("net"),
        F.count(F.when(F.col("d") == 1, F.lit(1))).alias("starts"),
    )
    w = (
        Window.partitionBy("day")
        .orderBy("tsn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = per_ts.withColumn(
        "peak_here",
        F.coalesce(F.sum("net").over(w), F.lit(0)) + F.col("starts"),
    )
    peaks = run.groupBy("day").agg(
        F.max("peak_here").alias("peak_concurrency")
    )
    n_users = iv.groupBy("day").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        peaks.join(n_users, "day")
        .select("day", "n_users", "peak_concurrency")
        .orderBy(F.desc("peak_concurrency"), "day")
        .limit(20)
    )


def q_attribution_shapley(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — EXACT set-Shapley conversion attribution, the principled
    companion of q_session_attribution's first-touch rule: each
    converter (user with a purchase) credits the distinct channel set S
    they touched strictly before their FIRST purchase; with the
    reachability value function v(T)=1 iff T∩S≠∅, the Shapley value of
    each touched channel is exactly 1/|S|. |S| ≤ 4 channels here, so
    credit is carried as exact integer TWELFTHS (12 div |S| — lcm of
    1..4; Σ over channels = 12·converters, no float ever sums). Also
    emits last-touch credit (argmax struct, deterministic event_id
    tiebreak) and the removal-effect numerator (converters whose ONLY
    channel was c — drop c and they are unreachable). Plan: one keyed
    agg for first purchases, one distinct, two hash aggs — no window,
    no self-pair; the channel rollup is |channels| rows."""
    ev = table(spark, sf, "events")
    e = ev.select(
        "user_id",
        "event_id",
        "event_type",
        catalog.event_ts_us(ev).alias("tsn"),
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("tsn").alias("ft"))
    )
    pre = _mat(  # 2 consumers: per-user shape + per-(user,channel) rows
        e.join(fp, "user_id").filter(
            (F.col("tsn") < F.col("ft"))
            & (F.col("event_type") != "purchase")
        )
    )
    uu = _mat(  # 2 consumers: channel rollup + converter-count scalar
        pre.groupBy("user_id").agg(
            F.countDistinct("event_type").alias("s_size"),
            F.max(F.struct("tsn", "event_id", "event_type"))[
                "event_type"
            ].alias("last_type"),
        )
    )
    n_conv = uu.agg(F.count("*").alias("n_converters"))
    uc = pre.select("user_id", "event_type").distinct()
    return (
        uc.join(uu, "user_id")
        .groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count("*").alias("users_touched"),
            F.count(
                F.when(F.col("last_type") == F.col("event_type"), 1)
            ).alias("last_touch_users"),
            F.count(F.when(F.col("s_size") == 1, 1)).alias(
                "only_channel_users"
            ),
            F.sum(F.expr("12 div s_size")).alias("shapley_twelfths"),
        )
        .crossJoin(F.broadcast(n_conv))  # 1-row scalar
        .select(
            "channel",
            "users_touched",
            "last_touch_users",
            "only_channel_users",
            "shapley_twelfths",
            "n_converters",
            text.round4(
                F.col("shapley_twelfths")
                / (F.lit(12) * F.col("n_converters"))
            ).alias("shapley_pct"),
        )
        .orderBy("channel")
    )


def q_max_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — peak concurrent sessions via the sweep line, the capacity
    metric the interval-union query can't answer (union measures
    covered TIME, this measures simultaneous LOAD): gaps-and-islands
    sessions (12h gap) become (start,+1)/(end,−1) deltas; the running
    sum over the global delta order is the live-session count and its
    max is the peak. Tie rule at equal µs: ends before starts (delta
    ascending), then user — so back-to-back sessions never double
    count. A single-event session (start == end) is half-open with
    minimal extent: its −1 delta moves to end+1 µs, so the session IS
    live at its own instant instead of closing before it opens (the
    running sum can never dip negative). Both rules are part of the
    contract and identical in the oracle. The running sum is the
    two-phase blocked prefix sum (curation._blocked_prefix_sum over
    driver-sampled literal t-boundaries): per-block running sums stay
    partitioned and only the ≤ #blocks block TOTALS pass through a
    single task — no Exchange SinglePartition over the 2·|sessions|
    delta rows, so the sweep line survives a 100× session count.
    Output: peak, its earliest instant, session count."""
    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_spark.operators.curation import (
        _blocked_prefix_sum,
    )
    from data_wrangle_openstreetmaps_data_spark.operators.sample import (
        _range_block_bounds,
    )

    ev = table(spark, sf, "events")
    e = ev.select(
        "user_id",
        "event_id",
        catalog.event_ts_us(ev).alias("tsn"),
    )
    w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
    new_s = F.when(
        F.lag("tsn").over(w).isNull()
        | (F.col("tsn") - F.lag("tsn").over(w) > _SESSION_GAP_US),
        1,
    ).otherwise(0)
    sess = (
        e.withColumn("sid", F.sum(new_s).over(w))
        .groupBy("user_id", "sid")
        .agg(F.min("tsn").alias("s"), F.max("tsn").alias("e"))
    )
    deltas = _mat(  # 3 consumers: block bounds sample + sums + totals
        sess.select(
            F.col("s").alias("t"), F.lit(1).alias("d"), "user_id"
        ).unionByName(
            sess.select(
                # half-open minimal extent for point sessions
                F.when(F.col("e") == F.col("s"), F.col("e") + 1)
                .otherwise(F.col("e"))
                .alias("t"),
                F.lit(-1).alias("d"),
                "user_id",
            )
        )
    )
    bounds = _range_block_bounds(deltas, "t", 32)
    blk = F.lit(0)
    for b in bounds:
        blk = blk + (F.col("t") > F.lit(b)).cast("int")
    run = _mat(  # 2 consumers: peak scalar + earliest-peak instant
        _blocked_prefix_sum(
            deltas.withColumn("_blk", blk),
            "_blk",
            [F.asc("t"), F.asc("d"), F.asc("user_id")],
            "d",
            "_before",
        ).withColumn("live", F.col("_before") + F.col("d"))
    )
    peak = run.agg(F.max("live").alias("peak_concurrency"))
    out = (
        run.join(
            F.broadcast(peak),
            F.col("live") == F.col("peak_concurrency"),
        )
        .agg(
            F.min("t").alias("at_us"),
            F.max("peak_concurrency").alias("peak_concurrency"),
        )
    )
    # n_sessions from the MATERIALIZED deltas (each session contributes
    # exactly one +1 row), not sess.agg(count) — that form re-executed
    # the whole scan→sessionize-window→groupBy subtree a second time
    # (r13; Spark does not reuse identical non-exchange subtrees)
    n = deltas.filter(F.col("d") == 1).agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    return out.crossJoin(F.broadcast(n)).select(
        "peak_concurrency", "at_us", "n_sessions"
    )


def q_funnel_steps(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — three-stage STRICT-ORDER funnel (signup → first click
    after it → first purchase after that), extending
    q_funnel_conversion's two stages with per-step median lag: each
    stage is a min-over-filter against the PREVIOUS stage's instant —
    three user-keyed hash joins, no window over the facts, no
    event-pair explosion. Lags are exact µs integers; the median
    (Spark percentile ↔ DuckDB quantile_cont) converts to hours only
    at output (round4). Stage 1 has no predecessor → NULL lag, typed
    double on both engines."""
    ev = table(spark, sf, "events")
    e = _mat(  # 3 consumers, one per funnel stage
        ev.select(
            "user_id", "event_type", catalog.event_ts_us(ev).alias("tsn")
        )
    )
    s1 = e.filter(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("tsn").alias("t1"))
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("tsn") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("tsn").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("tsn") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("tsn").alias("t3"), F.min("t2").alias("t2"))
    )
    r1 = s1.agg(
        F.lit("1_signup").alias("stage"),
        F.count("*").alias("users"),
        F.lit(None).cast("double").alias("median_lag_h"),
    )
    r2 = s2.agg(
        F.lit("2_click").alias("stage"),
        F.count("*").alias("users"),
        text.round4(
            F.expr("percentile(t2 - t1, 0.5)") / F.lit(3600000000.0)
        ).alias("median_lag_h"),
    )
    r3 = s3.agg(
        F.lit("3_purchase").alias("stage"),
        F.count("*").alias("users"),
        text.round4(
            F.expr("percentile(t3 - t2, 0.5)") / F.lit(3600000000.0)
        ).alias("median_lag_h"),
    )
    return r1.unionByName(r2).unionByName(r3).orderBy("stage")


def q_control_chart(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — XmR (individuals + moving-range) process-control chart
    over daily revenue, the SPC screen that flags special-cause days
    without assuming any distribution: MR̄ = mean |day-over-day
    difference| of cent-exact daily sums, limits = mean ± 2.66·MR̄
    (the standard d2-derived constant). Sums and |diffs| are exact
    bigints; the two means are single double divisions mirrored
    cross-engine; a day is out-of-control iff its cents fall outside
    the limits (strict inequality, evaluated on the SAME doubles both
    sides). Output: the out-of-control days (+ scalars: center, UCL,
    LCL, n_days, n_ooc) — one day-grain agg, one lag window over
    |days| rows, one fold."""
    from pyspark.sql import Window

    o = table(spark, sf, "orders")
    daily = (
        o.groupBy(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(20,6)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("day")
    mr = _mat(  # 2 consumers: limit scalars + per-day flags
        daily.withColumn(
            "mrange", F.abs(F.col("cents") - F.lag("cents").over(w))
        )
    )
    lim = mr.agg(
        (F.sum("cents") / F.count("*")).alias("center"),
        (F.sum("mrange") / F.count("mrange")).alias("mrbar"),
        F.count("*").alias("n_days"),
    ).select(
        "center",
        "n_days",
        (F.col("center") + 2.66 * F.col("mrbar")).alias("ucl"),
        (F.col("center") - 2.66 * F.col("mrbar")).alias("lcl"),
    )
    flagged = mr.crossJoin(F.broadcast(lim)).filter(
        (F.col("cents") > F.col("ucl")) | (F.col("cents") < F.col("lcl"))
    )
    n_ooc = flagged.groupBy().agg(F.count("*").alias("n_ooc"))
    return (
        flagged.select(
            "day",
            "cents",
            text.round4(F.col("center")).alias("center"),
            text.round4(F.col("ucl")).alias("ucl"),
            text.round4(F.col("lcl")).alias("lcl"),
            "n_days",
        )
        .crossJoin(F.broadcast(n_ooc))  # 1-row scalar
        .orderBy("day")
    )


def q_topk_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — trailing-7-day top-3 event types per day (the sliding
    leaderboard): the dau_wau fan-out discipline applied to ranked
    counts — each (day, type, cnt) daily aggregate replicates to the ≤7
    anchor days it contributes to (explode over a 7-literal sequence —
    rows grow 7× the DAILY AGGREGATE, never 7× the events), one hash
    re-aggregate per anchor, then rank ≤ 3 inside each day partition
    (bounded frame: |event types| rows per day). Count-desc, type-asc
    deterministic tiebreak. Anchors only at days that exist."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    ev = ev.withColumn("tsn", catalog.event_ts_us(ev))
    daily = (
        ev.select(
            F.expr("tsn div 86400000000").alias("day"), "event_type"
        )
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    days = daily.select("day").distinct()
    fan = (
        daily.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
            "day",
            "event_type",
            "c",
        )
        .select(
            (F.col("day") + F.col("off")).alias("day"), "event_type", "c"
        )
        .join(days, "day")
        .groupBy("day", "event_type")
        .agg(F.sum("c").cast("long").alias("cnt7"))
    )
    w = Window.partitionBy("day").orderBy(
        F.col("cnt7").desc(), F.col("event_type")
    )
    return (
        fan.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("day", "rk", "event_type", "cnt7")
        .orderBy("day", "rk")
    )


ORACLES: dict[str, str | None] = {
    "q_topk_sliding": """
        WITH ev AS (
          SELECT epoch_us(ts) // 86400000000 AS day, event_type
          FROM events
        ),
        daily AS (
          SELECT day, event_type, CAST(count(*) AS BIGINT) AS c
          FROM ev GROUP BY day, event_type
        ),
        days AS (SELECT DISTINCT day FROM ev),
        fan AS (
          SELECT d.day AS day, x.event_type,
                 CAST(sum(x.c) AS BIGINT) AS cnt7
          FROM days d
          JOIN daily x ON x.day BETWEEN d.day - 6 AND d.day
          GROUP BY d.day, x.event_type
        ),
        ranked AS (
          SELECT day, event_type, cnt7,
                 row_number() OVER (
                   PARTITION BY day ORDER BY cnt7 DESC, event_type
                 ) AS rk
          FROM fan
        )
        SELECT day, rk, event_type, cnt7
        FROM ranked WHERE rk <= 3 ORDER BY day, rk
    """,
    "q_control_chart": """
        WITH daily AS (
          SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) * 100
                      AS BIGINT) AS cents
          FROM orders GROUP BY 1
        ),
        mr AS (
          SELECT *, abs(cents - lag(cents) OVER (ORDER BY day))
                      AS mrange
          FROM daily
        ),
        lim AS (
          SELECT CAST(sum(cents) AS DOUBLE) / count(*) AS center,
                 count(*) AS n_days,
                 CAST(sum(cents) AS DOUBLE) / count(*)
                   + 2.66 * (CAST(sum(mrange) AS DOUBLE)
                             / count(mrange)) AS ucl,
                 CAST(sum(cents) AS DOUBLE) / count(*)
                   - 2.66 * (CAST(sum(mrange) AS DOUBLE)
                             / count(mrange)) AS lcl
          FROM mr
        ),
        flagged AS (
          SELECT m.day, m.cents, l.center, l.ucl, l.lcl, l.n_days
          FROM mr m, lim l
          WHERE m.cents > l.ucl OR m.cents < l.lcl
        )
        SELECT day, cents,
               floor(center * 10000 + 0.5) / 10000 AS center,
               floor(ucl * 10000 + 0.5) / 10000 AS ucl,
               floor(lcl * 10000 + 0.5) / 10000 AS lcl,
               n_days,
               (SELECT count(*) FROM flagged) AS n_ooc
        FROM flagged
        ORDER BY day
    """,
    "q_funnel_steps": """
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS tsn FROM events
        ),
        s1 AS (
          SELECT user_id, min(tsn) AS t1 FROM e
          WHERE event_type = 'signup' GROUP BY 1
        ),
        s2 AS (
          SELECT e.user_id, min(e.tsn) AS t2, min(s1.t1) AS t1
          FROM e JOIN s1 USING (user_id)
          WHERE e.event_type = 'click' AND e.tsn > s1.t1
          GROUP BY 1
        ),
        s3 AS (
          SELECT e.user_id, min(e.tsn) AS t3, min(s2.t2) AS t2
          FROM e JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.tsn > s2.t2
          GROUP BY 1
        )
        SELECT '1_signup' AS stage, count(*) AS users,
               CAST(NULL AS DOUBLE) AS median_lag_h
        FROM s1
        UNION ALL
        SELECT '2_click', count(*),
               floor(quantile_cont(t2 - t1, 0.5) / 3600000000.0
                     * 10000 + 0.5) / 10000
        FROM s2
        UNION ALL
        SELECT '3_purchase', count(*),
               floor(quantile_cont(t3 - t2, 0.5) / 3600000000.0
                     * 10000 + 0.5) / 10000
        FROM s3
        ORDER BY stage
    """,
    "q_max_concurrency": f"""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS tsn FROM events
        ),
        l AS (
          SELECT user_id, tsn,
                 lag(tsn) OVER (PARTITION BY user_id
                                ORDER BY tsn, event_id) AS prev
          FROM e
        ),
        f AS (
          SELECT user_id, tsn,
                 CASE WHEN prev IS NULL
                        OR tsn - prev > {_SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS new_s
          FROM l
        ),
        s AS (
          SELECT user_id, tsn,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY tsn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
          FROM f
        ),
        sess AS (
          SELECT user_id, sid, min(tsn) AS st, max(tsn) AS en
          FROM s GROUP BY 1, 2
        ),
        deltas AS (
          SELECT st AS t, 1 AS d, user_id FROM sess
          UNION ALL
          -- point sessions are half-open with minimal extent (end+1µs)
          SELECT CASE WHEN en = st THEN en + 1 ELSE en END AS t,
                 -1 AS d, user_id
          FROM sess
        ),
        run AS (
          SELECT t, d, user_id,
                 sum(d) OVER (ORDER BY t, d, user_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS live
          FROM deltas
        ),
        pk AS (SELECT max(live) AS peak_concurrency FROM run)
        SELECT CAST(p.peak_concurrency AS BIGINT) AS peak_concurrency,
               (SELECT min(t) FROM run
                 WHERE live = p.peak_concurrency) AS at_us,
               (SELECT count(*) FROM sess) AS n_sessions
        FROM pk p
    """,
    "q_attribution_shapley": """
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS tsn
          FROM events
        ),
        fp AS (
          SELECT user_id, min(tsn) AS ft FROM ev
          WHERE event_type = 'purchase' GROUP BY 1
        ),
        pre AS (
          SELECT e.* FROM ev e JOIN fp USING (user_id)
          WHERE e.tsn < fp.ft AND e.event_type <> 'purchase'
        ),
        uu AS (
          SELECT user_id,
                 count(DISTINCT event_type) AS s_size,
                 (SELECT p.event_type FROM pre p
                   WHERE p.user_id = pre.user_id
                   ORDER BY p.tsn DESC, p.event_id DESC LIMIT 1)
                   AS last_type
          FROM pre GROUP BY user_id
        ),
        uc AS (SELECT DISTINCT user_id, event_type FROM pre)
        SELECT uc.event_type AS channel,
               count(*) AS users_touched,
               CAST(count(CASE WHEN u.last_type = uc.event_type
                          THEN 1 END) AS BIGINT) AS last_touch_users,
               CAST(count(CASE WHEN u.s_size = 1 THEN 1 END) AS BIGINT)
                 AS only_channel_users,
               CAST(sum(12 // u.s_size) AS BIGINT) AS shapley_twelfths,
               (SELECT count(*) FROM uu) AS n_converters,
               floor(CAST(sum(12 // u.s_size) AS DOUBLE)
                     / (12 * (SELECT count(*) FROM uu))
                     * 10000 + 0.5) / 10000 AS shapley_pct
        FROM uc JOIN uu u USING (user_id)
        GROUP BY uc.event_type
        ORDER BY channel
    """,
    "q_freshness_sla": """
        WITH ev AS (
          SELECT event_type, epoch_us(ts) AS tsn FROM events
        ),
        per AS (
          SELECT event_type, max(tsn) AS last_us,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM ev GROUP BY event_type
        ),
        wm AS (SELECT max(tsn) AS wm_us FROM ev)
        SELECT event_type,
               strftime(make_timestamp(last_us), '%Y-%m-%d %H:%M:%S')
                 AS last_seen,
               n_events,
               CAST(wm_us - last_us AS BIGINT) AS lag_us,
               floor((wm_us - last_us) / 3600000000.0 * 10000 + 0.5)
                 / 10000 AS lag_hours,
               CAST(CASE WHEN wm_us - last_us > 86400000000
                    THEN 1 ELSE 0 END AS INTEGER) AS stale_24h
        FROM per, wm
        ORDER BY event_type
    """,
    "q_churn_labels": """
        WITH ev AS (SELECT user_id, epoch_us(ts) AS tsn FROM events),
        weekly AS (
          SELECT user_id, tsn // 604800000000 AS week,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM ev GROUP BY 1, 2
        ),
        mx AS (SELECT max(tsn) AS max_tsn FROM ev),
        lab AS (
          SELECT user_id, week, n_events,
                 lead(week) OVER (
                   PARTITION BY user_id ORDER BY week
                 ) AS next_week
          FROM weekly
        )
        SELECT user_id, week, n_events,
               CAST(CASE
                 WHEN (week + 3) * 604800000000 > max_tsn + 1 THEN NULL
                 WHEN next_week IS NULL OR next_week > week + 2 THEN 1
                 ELSE 0 END AS INTEGER) AS churned_14d
        FROM lab, mx
        ORDER BY user_id, week
    """,
    "q_peak_concurrency": """
        WITH iv AS (
          SELECT epoch_us(ts) // 86400000000 AS day, user_id,
                 min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
          FROM events GROUP BY 1, 2
        ),
        pts AS (
          SELECT day, lo AS tsn, 1 AS d FROM iv
          UNION ALL
          SELECT day, hi, -1 FROM iv
        ),
        per_ts AS (
          SELECT day, tsn, CAST(sum(d) AS BIGINT) AS net,
                 count(CASE WHEN d = 1 THEN 1 END) AS starts
          FROM pts GROUP BY day, tsn
        ),
        run AS (
          SELECT day,
                 coalesce(sum(net) OVER (
                   PARTITION BY day ORDER BY tsn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) + starts AS peak_here
          FROM per_ts
        ),
        peaks AS (
          SELECT day, CAST(max(peak_here) AS BIGINT) AS peak_concurrency
          FROM run GROUP BY day
        ),
        nu AS (SELECT day, count(*) AS n_users FROM iv GROUP BY day)
        SELECT peaks.day AS day, n_users, peak_concurrency
        FROM peaks JOIN nu ON peaks.day = nu.day
        ORDER BY peak_concurrency DESC, peaks.day LIMIT 20
    """,
    "q_activity_bitmap": """
        WITH per_user AS (
          SELECT user_id,
                 bit_or(1::BIGINT <<
                   CAST(((epoch_us(ts) // 86400000000) % 7) * 4
                        + ((epoch_us(ts) // 3600000000) % 24) // 6
                        AS INT)) AS pattern
          FROM events GROUP BY user_id
        )
        SELECT pattern,
               CAST(bit_count(pattern) AS INT) AS n_slots,
               count(*) AS n_users
        FROM per_user GROUP BY pattern
        ORDER BY n_users DESC, pattern LIMIT 20
    """,
    "q_session_paths": f"""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS tsn
          FROM events
        ),
        m AS (
          SELECT *,
                 CASE WHEN lag(tsn) OVER w IS NULL
                        OR tsn - lag(tsn) OVER w > {{gap}}
                      THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
        ),
        s AS (
          SELECT *, sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY tsn, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS sid
          FROM m
        ),
        r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id, sid ORDER BY tsn, event_id
                 ) AS rn
          FROM s
        ),
        per AS (
          SELECT user_id, sid,
                 array_to_string(list(event_type ORDER BY rn), '>')
                   AS path,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
          FROM r WHERE rn <= 3 GROUP BY user_id, sid
        )
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(converted) AS BIGINT) AS n_converted
        FROM per GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 20
    """.format(gap=_SESSION_GAP_US),
    "q_forecast_backtest": """
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
                 CAST(count(*) AS DOUBLE) AS c
          FROM events GROUP BY day
        ),
        l AS (
          SELECT day, c,
                 list(c) OVER (ORDER BY day
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS vals
          FROM daily
        ),
        f AS (
          SELECT day, c,
                 list_sum(list_transform(vals,
                   (x, i) -> x * ({weights}[len(vals)])[i])) AS fc
          FROM l WHERE len(vals) >= 1
        )
        SELECT day, CAST(c AS BIGINT) AS actual,
               floor(fc * 10000 + 0.5) / 10000 AS forecast,
               floor(abs(fc - c) / c * 10000 + 0.5) / 10000 AS ape
        FROM f ORDER BY day LIMIT 60
    """.format(
        weights="[{}]".format(
            ", ".join(
                "[{}]".format(", ".join(repr(c) for c in row))
                for row in _holt_coeffs()
            )
        )
    ),
    "q_ltv_cohort": """
        WITH e AS (
          SELECT user_id,
                 (epoch_us(ts) // 86400000000) // 7 AS week,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(value * 10000.0 + 0.5) AS BIGINT)
                      ELSE 0 END AS vi
          FROM events
        ),
        f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
        sz AS (
          SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
          FROM f GROUP BY 1
        ),
        cells AS (
          SELECT cohort_week, week - cohort_week AS age_weeks,
                 CAST(sum(vi) AS BIGINT) AS rev_i
          FROM e JOIN f USING (user_id)
          GROUP BY 1, 2
        ),
        cum AS (
          SELECT cohort_week, age_weeks, rev_i,
                 sum(rev_i) OVER (
                   PARTITION BY cohort_week ORDER BY age_weeks
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cum_i
          FROM cells
        )
        SELECT cohort_week, age_weeks, cohort_users,
               floor(CAST(rev_i AS DOUBLE) / 10000.0 * 10000 + 0.5)
                 / 10000 AS revenue,
               floor(CAST(cum_i AS DOUBLE) / 10000.0
                     / CAST(cohort_users AS DOUBLE) * 10000 + 0.5)
                 / 10000 AS ltv_per_user
        FROM cum JOIN sz USING (cohort_week)
        ORDER BY cohort_week, age_weeks
    """,
    "q_new_vs_returning": """
        WITH ud AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
          FROM events
        ),
        f AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1)
        SELECT day,
               count(CASE WHEN day = first_day THEN 1 END) AS new_users,
               count(CASE WHEN day <> first_day THEN 1 END)
                 AS returning_users
        FROM ud JOIN f USING (user_id)
        GROUP BY day ORDER BY day LIMIT 40
    """,
    "q_seasonal_decompose": """
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY day
        ),
        ma AS (
          SELECT day, c,
                 sum(c) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7,
                 count(c) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nw
          FROM daily
        ),
        det AS (
          SELECT CAST(day % 7 AS INT) AS dow, 7 * c - t7 AS d7, c
          FROM ma WHERE nw = 7
        )
        SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
               floor(CAST(sum(d7) AS DOUBLE)
                     / (7.0 * CAST(count(*) AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS seasonal,
               floor(CAST(sum(d7) AS DOUBLE)
                     / (7.0 * CAST(sum(c) AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS seasonal_share
        FROM det GROUP BY dow ORDER BY dow
    """,
    "q_sax_symbolic": """
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
          FROM events GROUP BY day
        ),
        b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        spine AS (
          SELECT unnest(range(0, CAST(mx - mn + 1 AS BIGINT))) AS idx, mn
          FROM b
        ),
        filled AS (
          SELECT idx, CAST(coalesce(c, 0) AS BIGINT) AS c
          FROM spine LEFT JOIN daily ON spine.idx + spine.mn = daily.day
        ),
        gstats AS (
          SELECT CAST(count(*) AS BIGINT) AS d_days,
                 CAST(sum(c) AS BIGINT) AS sc,
                 CAST(sum(c * c) AS BIGINT) AS s2
          FROM filled
        ),
        seg AS (
          SELECT idx // 5 AS segment, count(*) AS n_days,
                 CAST(sum(c) AS BIGINT) AS seg_c
          FROM filled GROUP BY segment
        ),
        sz AS (
          SELECT segment, n_days,
                 CAST(seg_c AS DOUBLE) / CAST(n_days AS DOUBLE) AS paa,
                 floor((CAST(seg_c AS DOUBLE) / CAST(n_days AS DOUBLE)
                        - CAST(sc AS DOUBLE) / CAST(d_days AS DOUBLE))
                       / (sqrt(CAST(d_days * s2 - sc * sc AS DOUBLE))
                          / CAST(d_days AS DOUBLE))
                       * 10000 + 0.5) / 10000 AS z
          FROM seg, gstats
        )
        SELECT segment, n_days,
               floor(paa * 10000 + 0.5) / 10000 AS paa,
               z,
               CASE WHEN z < -0.6745 THEN 'a'
                    WHEN z < 0.0 THEN 'b'
                    WHEN z < 0.6745 THEN 'c'
                    ELSE 'd' END AS symbol
        FROM sz ORDER BY segment
    """,
    "q_out_of_order_audit": """
        WITH e AS (
          SELECT event_id, epoch_us(ts) AS tsn,
                 epoch_us(ts)
                   + ((('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                               1, 15))::BIGINT % 7200000000)
                      + 7200000000) % 7200000000 AS arr,
                 ((('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                            1, 15))::BIGINT % 8) + 8) % 8 AS shard
          FROM events
        ),
        d AS (
          SELECT event_id, tsn,
                 max(tsn) OVER (
                   PARTITION BY shard ORDER BY arr, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS rmax
          FROM e
        ),
        lt AS (
          SELECT (rmax - tsn) // 1000 AS late_ms FROM d
        )
        SELECT CASE WHEN late_ms = 0 THEN 0
                    ELSE CAST(length(bin(late_ms)) AS INT)
               END AS late_bucket,
               count(*) AS n_events,
               CAST(max(late_ms) AS BIGINT) AS max_late_ms
        FROM lt GROUP BY late_bucket ORDER BY late_bucket
    """,
    "q_fano_burstiness": """
        WITH daily AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                 count(*) AS c
          FROM events GROUP BY user_id, day
        ),
        span AS (
          SELECT max(day) - min(day) + 1 AS d_days
          FROM (SELECT epoch_us(ts) // 86400000000 AS day FROM events)
        ),
        per AS (
          SELECT user_id, count(*) AS active_days,
                 CAST(sum(c) AS BIGINT) AS sc,
                 CAST(sum(c * c) AS BIGINT) AS sc2
          FROM daily GROUP BY user_id
        )
        SELECT user_id, active_days, sc AS n_events,
               floor(CAST(d_days * sc2 - sc * sc AS DOUBLE)
                     / CAST(sc * d_days AS DOUBLE) * 10000 + 0.5) / 10000
                 AS fano
        FROM per, span
        ORDER BY fano DESC, user_id LIMIT 20
    """,
    "q_multitouch_attribution": """
        WITH ev AS (SELECT *, epoch_us(ts) AS tsn FROM events),
        fp AS (
          SELECT user_id, min(tsn) AS fp_ts
          FROM ev WHERE event_type = 'purchase' GROUP BY user_id
        ),
        touches AS (
          SELECT ev.user_id, tsn, event_id,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) % 7
                   AS channel
          FROM ev JOIN fp ON ev.user_id = fp.user_id
          WHERE event_type IN ('click', 'view') AND tsn < fp_ts
        ),
        t AS (
          SELECT channel, user_id,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY tsn, event_id
                 ) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM touches
        ),
        c AS (
          SELECT channel, user_id,
                 CASE WHEN n = 1 THEN 1.0
                      WHEN n = 2 THEN 0.5
                      WHEN rn = 1 OR rn = n THEN 0.4
                      ELSE 0.2 / CAST(n - 2 AS DOUBLE) END AS credit
          FROM t
        )
        SELECT channel, count(*) AS n_touches,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               floor(CAST(sum(CAST(credit AS DECIMAL(20,10))) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS credit
        FROM c GROUP BY channel ORDER BY channel
    """,
    "q_runs_test": """
        WITH daily AS (
          SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                 sum(CAST(value AS DECIMAL(20,6))) AS rev
          FROM events WHERE event_type = 'purchase' GROUP BY d
        ),
        t AS (SELECT sum(rev) AS total, count(*) AS nd FROM daily),
        s AS (
          SELECT d,
                 CASE WHEN rev * nd > total THEN 1 ELSE 0 END AS sgn
          FROM daily, t
        ),
        c AS (
          SELECT sgn,
                 CASE WHEN lag(sgn) OVER (ORDER BY d) IS NOT NULL
                       AND lag(sgn) OVER (ORDER BY d) <> sgn
                      THEN 1 ELSE 0 END AS chg
          FROM s
        ),
        a AS (
          SELECT CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(sgn) AS BIGINT) AS n_above,
                 CAST(count(*) - sum(sgn) AS BIGINT) AS n_below,
                 CAST(1 + sum(chg) AS BIGINT) AS runs
          FROM c
        ),
        f AS (
          SELECT n_days, n_above, n_below, runs,
                 2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                   / CAST(n_days AS DOUBLE) + 1.0 AS e,
                 2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                   * (2.0 * CAST(n_above AS DOUBLE)
                        * CAST(n_below AS DOUBLE)
                      - CAST(n_days AS DOUBLE))
                   / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
                      * (CAST(n_days AS DOUBLE) - 1.0)) AS var
          FROM a
        )
        SELECT n_days, n_above, n_below, runs,
               floor(e * 10000 + 0.5) / 10000 AS e_runs,
               CASE WHEN var > 0 THEN
                 floor((CAST(runs AS DOUBLE) - e) / sqrt(var)
                       * 10000 + 0.5) / 10000
               END AS z
        FROM f
    """,
    "q_cross_correlation": """
        WITH e AS (
          SELECT epoch_us(ts) // 3600000000 AS h, event_type
          FROM events WHERE event_type IN ('click', 'purchase')
        ),
        cnt AS (
          SELECT h,
                 count(CASE WHEN event_type = 'click' THEN 1 END) AS c,
                 count(CASE WHEN event_type = 'purchase' THEN 1 END) AS p
          FROM e GROUP BY h
        ),
        b AS (SELECT min(h) AS mh, max(h) AS xh FROM cnt),
        grid AS (SELECT unnest(range(mh, xh + 1)) AS h FROM b),
        g AS (
          SELECT grid.h, coalesce(c, 0) AS c, coalesce(p, 0) AS p
          FROM grid LEFT JOIN cnt ON grid.h = cnt.h
        ),
        l AS (SELECT unnest(range(0, 7)) AS lag),
        j AS (
          SELECT l.lag, y.p AS y, x.c AS x
          FROM l CROSS JOIN g AS y
          INNER JOIN g AS x ON x.h = y.h - l.lag
        ),
        st AS (
          SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(CAST(x AS HUGEINT) * y) AS sxy,
                 sum(CAST(x AS HUGEINT) * x) AS sxx,
                 sum(CAST(y AS HUGEINT) * y) AS syy
          FROM j GROUP BY lag
        )
        SELECT CAST(lag AS INT) AS lag, n AS n_pairs,
               floor(CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                               > 0
                          AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                               > 0
                          THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                               / sqrt((CAST(n AS DOUBLE)
                                       * CAST(sxx AS DOUBLE)
                                       - CAST(sx AS DOUBLE)
                                         * CAST(sx AS DOUBLE))
                                      * (CAST(n AS DOUBLE)
                                         * CAST(syy AS DOUBLE)
                                         - CAST(sy AS DOUBLE)
                                           * CAST(sy AS DOUBLE)))
                          ELSE 0.0 END * 10000 + 0.5) / 10000 AS r
        FROM st
        ORDER BY lag
    """,
    "q_kaplan_meier": f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS tsn FROM events),
        pu AS (
          SELECT user_id, min(tsn) AS f, max(tsn) AS l FROM e GROUP BY 1
        ),
        te AS (SELECT max(tsn) AS te FROM e),
        h AS (
          SELECT (l - f) // 3600000000 AS hr,
                 count(CASE WHEN te - l >= {_SESSION_GAP_US} THEN 1 END)
                   AS deaths,
                 count(CASE WHEN te - l < {_SESSION_GAP_US} THEN 1 END)
                   AS censored
          FROM pu, te GROUP BY 1
        ),
        tot AS (SELECT sum(deaths + censored) AS nu FROM h),
        r AS (
          SELECT hr, deaths, censored,
                 CAST(nu - coalesce(sum(deaths + censored) OVER (
                   ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS n_risk
          FROM h, tot
        ),
        s AS (
          SELECT hr, deaths, censored, n_risk,
                 sum(CASE WHEN deaths > 0
                          THEN ln(1.0 - CAST(deaths AS DOUBLE)
                                  / CAST(n_risk AS DOUBLE))
                          ELSE 0.0 END) OVER (
                   ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS ls
          FROM r
        )
        SELECT hr, n_risk, deaths, censored,
               floor(exp(ls) * 10000 + 0.5) / 10000 AS survival
        FROM s
        WHERE deaths > 0
        ORDER BY hr
    """,
    "q_spearman_corr": """
        WITH u AS (
          SELECT user_id,
                 CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                        THEN CAST(value AS DECIMAL(18,2))
                                   END), 0) * 100 AS BIGINT) AS a,
                 count(*) AS b
          FROM events GROUP BY user_id
        ),
        ha AS (SELECT a, count(*) AS t FROM u GROUP BY a),
        ra AS (
          SELECT a,
                 CAST(2 * coalesce(sum(t) OVER (
                        ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + t + 1 AS BIGINT) AS r_a
          FROM ha
        ),
        hb AS (SELECT b, count(*) AS t FROM u GROUP BY b),
        rb AS (
          SELECT b,
                 CAST(2 * coalesce(sum(t) OVER (
                        ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + t + 1 AS BIGINT) AS r_b
          FROM hb
        ),
        j AS (
          SELECT r_a, r_b FROM u JOIN ra USING (a) JOIN rb USING (b)
        ),
        s AS (
          SELECT count(*) AS n,
                 CAST(sum(r_a) AS BIGINT) AS sx,
                 CAST(sum(r_b) AS BIGINT) AS sy,
                 CAST(sum(r_a * r_a) AS BIGINT) AS sxx,
                 CAST(sum(r_b * r_b) AS BIGINT) AS syy,
                 CAST(sum(r_a * r_b) AS BIGINT) AS sxy
          FROM j
        )
        SELECT n AS n_users,
               floor(CAST(CAST(n AS HUGEINT) * sxy
                            - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                     / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                                    - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                        * sqrt(CAST(CAST(n AS HUGEINT) * syy
                                      - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
                     * 10000 + 0.5) / 10000 AS rho_spearman
        FROM s
    """,
    "q_mann_whitney": """
        WITH e AS (
          SELECT CAST(floor(value * 100) AS BIGINT) AS vc, event_type
          FROM events WHERE event_type IN ('purchase', 'click')
        ),
        h AS (
          SELECT vc,
                 count(CASE WHEN event_type = 'purchase' THEN 1 END) AS cp,
                 count(CASE WHEN event_type = 'click' THEN 1 END) AS cc
          FROM e GROUP BY vc
        ),
        h2 AS (
          SELECT vc, cp, cc, cp + cc AS t,
                 CAST(coalesce(sum(cp + cc) OVER (
                   ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS cb
          FROM h
        ),
        a AS (
          SELECT CAST(sum(cp) AS BIGINT) AS n1,
                 CAST(sum(cc) AS BIGINT) AS n2,
                 CAST(sum(cp * (2 * cb + t + 1)) AS BIGINT) AS r2,
                 CAST(sum(t * t * t - t) AS BIGINT) AS tcorr
          FROM h2
        ),
        u AS (SELECT *, r2 - n1 * (n1 + 1) AS u2 FROM a),
        v AS (
          SELECT *,
                 (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                 * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                    - CAST(tcorr AS DOUBLE)
                      / (CAST(n1 + n2 AS DOUBLE)
                         * (CAST(n1 + n2 AS DOUBLE) - 1.0))) AS var
          FROM u
        )
        SELECT n1 AS n_purchase, n2 AS n_click,
               u2 AS u_doubled,
               floor(CAST(u2 AS DOUBLE) / 2.0 * 10000 + 0.5) / 10000
                 AS u_stat,
               floor((CAST(u2 AS DOUBLE)
                        - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                     / (2.0 * sqrt(var)) * 10000 + 0.5) / 10000 AS z_stat
        FROM v
    """,
    "q_ks_test": """
        WITH e AS (
          SELECT CAST(floor(value * 100) AS BIGINT) AS vc, event_type
          FROM events WHERE event_type IN ('purchase', 'click')
        ),
        h AS (
          SELECT vc,
                 count(CASE WHEN event_type = 'purchase' THEN 1 END) AS cp,
                 count(CASE WHEN event_type = 'click' THEN 1 END) AS cc
          FROM e GROUP BY vc
        ),
        t AS (
          SELECT CAST(sum(cp) AS BIGINT) AS np,
                 CAST(sum(cc) AS BIGINT) AS nc
          FROM h
        ),
        c AS (
          SELECT vc,
                 CAST(sum(cp) OVER (ORDER BY vc) AS BIGINT) AS fp,
                 CAST(sum(cc) OVER (ORDER BY vc) AS BIGINT) AS fc
          FROM h
        ),
        d AS (
          SELECT vc, np, nc, abs(fp * nc - fc * np) AS dint
          FROM c, t
        ),
        m AS (SELECT max(dint) AS dmax FROM d)
        SELECT CAST(min(np) AS BIGINT) AS n_purchase,
               CAST(min(nc) AS BIGINT) AS n_click,
               floor(CAST(min(dmax) AS DOUBLE)
                       / (CAST(min(np) AS DOUBLE) * CAST(min(nc) AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS ks_stat,
               floor(CAST(min(vc) AS DOUBLE) / 100.0 * 10000 + 0.5)
                 / 10000 AS ks_at
        FROM d, m WHERE dint = dmax
    """,
    "q_ols_trend": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
          FROM events GROUP BY 1, 2
        ),
        d0 AS (SELECT min(day) AS d0 FROM daily),
        xy AS (
          SELECT event_type,
                 CAST(date_diff('day', d0, day) AS BIGINT) AS x,
                 CAST(y AS BIGINT) AS y
          FROM daily, d0
        ),
        s AS (
          SELECT event_type, count(*) AS n_days,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
          FROM xy GROUP BY event_type
        )
        SELECT event_type, n_days,
               floor((n_days * sxy - sx * sy)
                     / CAST(n_days * sxx - sx * sx AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS slope,
               floor((sy * sxx - sx * sxy)
                     / CAST(n_days * sxx - sx * sx AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS intercept
        FROM s ORDER BY event_type
    """,
    "q_rolling_median": """
        WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS tsn
                   FROM events),
        l AS (
          SELECT user_id, event_id,
                 list_sort(list(value) OVER (
                   PARTITION BY user_id ORDER BY tsn, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
                 )) AS s
          FROM e
        )
        SELECT user_id, event_id,
               floor(
                 CASE WHEN len(s) % 2 = 1
                      THEN s[(len(s) + 1) // 2]
                      ELSE (s[len(s) // 2] + s[len(s) // 2 + 1]) / 2.0
                 END * 10000 + 0.5) / 10000 AS roll_median
        FROM l
    """,
    "q_interval_union": """
        WITH e AS (SELECT user_id, epoch_us(ts) AS tsn FROM events),
        spans AS (
          SELECT user_id, min(tsn) AS lo, max(tsn) + 1 AS hi
          FROM e GROUP BY user_id, tsn // 3600000000
        ),
        flagged AS (
          SELECT user_id, lo, hi,
                 CASE WHEN max(hi) OVER (
                        PARTITION BY user_id ORDER BY lo, hi
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ) IS NULL
                      OR lo > max(hi) OVER (
                        PARTITION BY user_id ORDER BY lo, hi
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      )
                      THEN 1 ELSE 0 END AS new_island
          FROM spans
        ),
        islands AS (
          SELECT user_id, lo, hi,
                 sum(new_island) OVER (
                   PARTITION BY user_id ORDER BY lo, hi
                   ROWS UNBOUNDED PRECEDING
                 ) AS island
          FROM flagged
        ),
        merged AS (
          SELECT user_id, island, count(*) AS n_in,
                 min(lo) AS mlo, max(hi) AS mhi
          FROM islands GROUP BY user_id, island
        )
        SELECT user_id,
               CAST(sum(n_in) AS BIGINT) AS n_intervals,
               count(*) AS n_merged,
               CAST(sum(mhi - mlo) AS BIGINT) AS covered_us
        FROM merged GROUP BY user_id ORDER BY user_id
    """,
    "q_theil_sen": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
          FROM events GROUP BY 1, 2
        ),
        d0 AS (SELECT min(day) AS d0 FROM daily),
        xy AS (
          SELECT event_type,
                 CAST(date_diff('day', d0, day) AS BIGINT) AS x,
                 CAST(y AS BIGINT) AS y
          FROM daily, d0
        ),
        p AS (
          SELECT a.event_type,
                 (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS slope
          FROM xy a JOIN xy b
            ON a.event_type = b.event_type AND a.x < b.x
        )
        SELECT event_type, count(*) AS n_pairs,
               floor(quantile_cont(slope, 0.5) * 10000 + 0.5) / 10000
                 AS theil_slope
        FROM p GROUP BY event_type ORDER BY event_type
    """,
    "q_time_to_convert": """
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS tsn FROM events
        ),
        fv AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN tsn END) AS first_view
          FROM e GROUP BY user_id
        ),
        conv AS (
          SELECT e.user_id, min(fv.first_view) AS fvv, min(e.tsn) AS fp
          FROM e JOIN fv USING (user_id)
          WHERE e.event_type = 'purchase'
            AND fv.first_view IS NOT NULL AND e.tsn > fv.first_view
          GROUP BY e.user_id
        ),
        lat AS (
          SELECT user_id % 7 AS seg, (fp - fvv) / 60000000.0 AS mins
          FROM conv
        )
        SELECT seg, count(*) AS n_converted,
               floor(quantile_cont(mins, 0.5) * 10000 + 0.5) / 10000 AS p50_min,
               floor(quantile_cont(mins, 0.9) * 10000 + 0.5) / 10000 AS p90_min
        FROM lat GROUP BY seg ORDER BY seg
    """,
    "q_seasonal_anomaly": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS cnt
          FROM events GROUP BY event_type, d
        ),
        mx AS (SELECT max(d) AS mxd FROM daily),
        d2 AS (
          SELECT event_type, d, cnt, strftime(d, '%a') AS dow
          FROM daily
        ),
        base AS (
          SELECT event_type, dow, avg(cnt) AS exp_cnt
          FROM d2, mx WHERE d <= mxd - 7 GROUP BY event_type, dow
        ),
        obs AS (SELECT d2.* FROM d2, mx WHERE d > mxd - 7)
        SELECT o.event_type,
               strftime(o.d, '%Y-%m-%d') AS day,
               o.dow,
               o.cnt,
               floor(exp_cnt * 10000 + 0.5) / 10000 AS expected,
               floor(o.cnt / exp_cnt * 10000 + 0.5) / 10000 AS ratio,
               floor(abs(o.cnt / exp_cnt - 1) * 10000 + 0.5) / 10000
                 AS dev
        FROM obs o
        JOIN base b ON o.event_type = b.event_type AND o.dow = b.dow
        ORDER BY o.event_type, day
    """,
    "q_interval_overlap_join": """
        WITH e AS (
          SELECT user_id, event_type, event_id, value AS val,
                 epoch_us(ts) AS tsn
          FROM events
        ),
        spans AS (
          SELECT user_id, CAST(floor(tsn / 3600000000) AS BIGINT) AS hr,
                 min(tsn) AS a_lo, max(tsn) AS a_hi
          FROM e GROUP BY user_id, hr
        ),
        wins AS (
          SELECT event_id AS win_id,
                 tsn - 1800000000 AS b_lo, tsn + 1800000000 AS b_hi
          FROM e WHERE event_type = 'error' AND val > 95
        ),
        pairs AS (
          SELECT user_id, hr, win_id
          FROM spans JOIN wins ON a_lo <= b_hi AND b_lo <= a_hi
        )
        SELECT user_id, count(DISTINCT win_id) AS n_overlaps
        FROM pairs GROUP BY user_id
        ORDER BY n_overlaps DESC, user_id LIMIT 20
    """,
    "q_autocorrelation": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
          FROM events GROUP BY event_type, day
        )
        SELECT a.event_type,
               count(*) AS n_pairs,
               floor(corr(a.cnt, b.cnt) * 10000 + 0.5) / 10000 AS acf1
        FROM daily a
        JOIN daily b ON a.event_type = b.event_type AND a.day = b.day + 1
        GROUP BY a.event_type ORDER BY a.event_type
    """,
    "q_decay_trending": """
        WITH e AS (
          SELECT event_type, CAST(ts AS DATE) AS day FROM events
        ),
        mx AS (SELECT max(day) AS mxd FROM e),
        s AS (
          SELECT event_type, count(*) AS n_events,
                 (sum(1::BIGINT << (40 - least(date_diff('day', day, mxd), 40))))::BIGINT AS scaled
          FROM e, mx GROUP BY event_type
        )
        SELECT event_type, n_events,
               floor(CAST(scaled AS DOUBLE) / 1099511627776.0 * 10000 + 0.5)
                 / 10000 AS trend
        FROM s ORDER BY trend DESC, event_type
    """,
    "q_welch_ttest": """
        WITH a AS (
          SELECT CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE) AS n1,
                 avg(CASE WHEN event_type = 'purchase' THEN value END) AS m1,
                 var_samp(CASE WHEN event_type = 'purchase' THEN value END) AS v1,
                 CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE) AS n2,
                 avg(CASE WHEN event_type = 'click' THEN value END) AS m2,
                 var_samp(CASE WHEN event_type = 'click' THEN value END) AS v2
          FROM events WHERE event_type IN ('purchase', 'click')
        )
        SELECT CAST(n1 AS BIGINT) AS n_purchase,
               CAST(n2 AS BIGINT) AS n_click,
               floor(m1 * 10000 + 0.5) / 10000 AS mean_purchase,
               floor(m2 * 10000 + 0.5) / 10000 AS mean_click,
               floor((m1 - m2) / sqrt(v1 / n1 + v2 / n2) * 10000 + 0.5)
                 / 10000 AS t_stat,
               floor((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                     / (v1 / n1 * (v1 / n1) / (n1 - 1)
                        + v2 / n2 * (v2 / n2) / (n2 - 1))
                     * 10000 + 0.5) / 10000 AS df_welch
        FROM a
    """,
    # same islands construction; first touch via rn=1 inside the
    # session (arg_min rejects composite keys in DuckDB 1.0); outer
    # count-sum cast back to BIGINT (DuckDB sums of BIGINT widen to
    # HUGEINT, which pandas surfaces as float — the cast keeps both
    # engines integer)
    "q_session_attribution": f"""
        WITH e AS (SELECT user_id, event_id, event_type, value,
                          epoch_us(ts) AS tsn
                   FROM events),
        l AS (
          SELECT *, lag(tsn) OVER (PARTITION BY user_id
                                   ORDER BY tsn, event_id) AS prev
          FROM e
        ),
        f AS (
          SELECT *, CASE WHEN prev IS NULL
                           OR tsn - prev > {{gap}} THEN 1 ELSE 0 END AS ns
          FROM l
        ),
        s AS (
          SELECT *, sum(ns) OVER (PARTITION BY user_id
                                  ORDER BY tsn, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM f
        ),
        s2 AS (
          SELECT *, row_number() OVER (PARTITION BY user_id, sid
                                       ORDER BY tsn, event_id) AS rn
          FROM s
        ),
        g AS (
          SELECT user_id, sid,
                 max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
                 count(CASE WHEN event_type = 'purchase' THEN 1 END)
                   AS n_purch,
                 sum(CASE WHEN event_type = 'purchase'
                          THEN CAST(value AS DECIMAL(18,2)) END) AS rev
          FROM s2 GROUP BY user_id, sid
        )
        SELECT first_type,
               count(*) AS n_sessions,
               CAST(sum(n_purch) AS BIGINT) AS n_purchases,
               floor(CAST(coalesce(sum(rev), 0) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS revenue
        FROM g GROUP BY first_type ORDER BY first_type
    """.replace("{gap}", str(_SESSION_GAP_US)),
    # same bounded-window EWMA: DuckDB's indexed list lambda applies
    # weight 0.5^(len-i) (i is 1-based → newest weight 1), same
    # normalizer, same exact binary weights
    "q_holt_linear": """
        WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS tsn
                   FROM events),
        l AS (
          SELECT user_id, event_id,
                 list(value) OVER (
                   PARTITION BY user_id ORDER BY tsn, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
                 ) AS vals
          FROM e
        )
        SELECT user_id, event_id,
               floor(
                 list_sum(list_transform(vals,
                   (x, i) -> x * ({weights}[len(vals)])[i]))
                 * 10000 + 0.5) / 10000 AS holt_forecast
        FROM l
        ORDER BY holt_forecast DESC, user_id, event_id LIMIT 20
    """.format(
        weights="[{}]".format(
            ", ".join(
                "[{}]".format(", ".join(repr(c) for c in row))
                for row in _holt_coeffs()
            )
        )
    ),
    "q_ewma": """
        WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS tsn
                   FROM events),
        l AS (
          SELECT user_id, event_id,
                 list(value) OVER (
                   PARTITION BY user_id ORDER BY tsn, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
                 ) AS vals
          FROM e
        )
        SELECT user_id, event_id,
               floor(
                 list_sum(list_transform(vals,
                   (x, i) -> x * pow(0.5, len(vals) - i)))
                 / (2 - pow(0.5, len(vals) - 1))
                 * 10000 + 0.5) / 10000 AS ewma
        FROM l
    """,
    "q_event_transitions": """
        WITH e AS (SELECT *, epoch_us(ts) AS tsn FROM events),
        p AS (
          SELECT event_type AS src,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY tsn, event_id
                 ) AS dst
          FROM e
        ),
        c AS (
          SELECT src, dst, count(*) AS cnt FROM p
          WHERE dst IS NOT NULL GROUP BY src, dst
        )
        SELECT src, dst, cnt,
               floor(cnt / sum(cnt) OVER (PARTITION BY src)
                     * 10000 + 0.5) / 10000 AS prob
        FROM c
    """,
    "q_time_bucket": """
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(*) AS cnt
        FROM events GROUP BY day
    """,
    "q_resample_daily": """
        WITH daily AS (
          SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
                 count(*) AS cnt
          FROM events GROUP BY user_id, d
        ),
        span AS (
          SELECT user_id, min(d) AS d0, max(d) AS d1
          FROM daily GROUP BY user_id
        ),
        spine AS (
          SELECT user_id,
                 CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS d
          FROM span
        )
        SELECT s.user_id, strftime(s.d, '%Y-%m-%d') AS day,
               coalesce(daily.cnt, 0) AS cnt
        FROM spine s
        LEFT JOIN daily ON daily.user_id = s.user_id AND daily.d = s.d
    """,
    "q_cumulative_distinct": """
        WITH f AS (
          SELECT user_id,
                 min(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS d
          FROM events GROUP BY user_id
        ),
        n AS (SELECT d, count(*) AS new_users FROM f GROUP BY d)
        SELECT d, new_users,
               CAST(sum(new_users) OVER (
                 ORDER BY d ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_users
        FROM n
    """,
    "q_activity_streaks": """
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
          FROM events
        ),
        isl AS (
          SELECT user_id, d,
                 d - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d
                 ) AS INT) AS island
          FROM ud
        ),
        st AS (
          SELECT user_id, island, count(*) AS len
          FROM isl GROUP BY user_id, island
        )
        SELECT user_id, max(len) AS longest_streak,
               count(*) AS n_streaks,
               CAST(sum(len) AS BIGINT) AS n_active_days
        FROM st GROUP BY user_id
    """,
    "q_hopping_window": """
        WITH ev AS (
          SELECT date_trunc('day', ts) AS d1, event_type, value FROM events
        ),
        assign AS (
          SELECT event_type, value,
                 unnest([d1, d1 - INTERVAL 1 DAY]) AS w_start
          FROM ev
        )
        SELECT strftime(w_start, '%Y-%m-%d') AS w_start, event_type,
               count(*) AS cnt,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS val_sum
        FROM assign GROUP BY w_start, event_type
    """,
    "q_zscore_outliers": """
        WITH stats AS (
          SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
          FROM events GROUP BY event_type
        )
        SELECT event_id, event_type,
               floor(value * 10000 + 0.5) / 10000 AS val,
               floor((value - mu) / sigma * 10000 + 0.5) / 10000 AS z
        FROM events JOIN stats USING (event_type)
        ORDER BY abs(z) DESC, event_id LIMIT 20
    """,
    "q_sessionize": f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS tsn FROM events),
        flagged AS (
          SELECT user_id, tsn,
                 CASE WHEN tsn - lag(tsn) OVER (
                        PARTITION BY user_id ORDER BY tsn
                      ) > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS new_sess
          FROM e
        ),
        sess AS (
          SELECT user_id, tsn,
                 sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY tsn
                   ROWS UNBOUNDED PRECEDING
                 ) AS sess_id
          FROM flagged
        )
        SELECT user_id, min(tsn) AS session_start, max(tsn) AS session_end,
               count(*) AS n_events
        FROM sess GROUP BY user_id, sess_id
    """,
    "q_session_window_native": f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS tsn FROM events),
        flagged AS (
          SELECT user_id, tsn,
                 CASE WHEN tsn - lag(tsn) OVER (
                        PARTITION BY user_id ORDER BY tsn
                      ) >= {_SESSION_GAP_US} THEN 1 ELSE 0 END AS new_sess
          FROM e
        ),
        sess AS (
          SELECT user_id, tsn,
                 sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY tsn
                   ROWS UNBOUNDED PRECEDING
                 ) AS sess_id
          FROM flagged
        )
        SELECT user_id, min(tsn) AS session_start, max(tsn) AS session_end,
               count(*) AS n_events
        FROM sess GROUP BY user_id, sess_id
    """,
    "q_debounce": """
        WITH e AS (
          SELECT user_id, event_type, event_id, epoch_us(ts) AS tsn
          FROM events
        ),
        flagged AS (
          SELECT event_type,
                 CASE WHEN lag(tsn) OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY tsn, event_id
                      ) IS NULL
                      OR tsn - lag(tsn) OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY tsn, event_id
                      ) > 300000000
                      THEN 1 END AS keep
          FROM e
        )
        SELECT event_type,
               count(*) AS n_total,
               count(keep) AS n_kept,
               floor(count(keep) / CAST(count(*) AS DOUBLE) * 10000 + 0.5)
                 / 10000 AS keep_ratio
        FROM flagged GROUP BY event_type ORDER BY event_type
    """,
    "q_funnel_conversion": """
        WITH pu AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'signup'
                          THEN epoch_us(ts) END) AS first_signup
          FROM events GROUP BY user_id
        ),
        signed AS (SELECT * FROM pu WHERE first_signup IS NOT NULL),
        conv AS (
          SELECT DISTINCT s.user_id
          FROM signed s JOIN events e ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase'
            AND epoch_us(e.ts) > s.first_signup
            AND epoch_us(e.ts) <= s.first_signup
                + CAST(604800000000 AS BIGINT)
        )
        SELECT 'signup' AS stage, count(*) AS users FROM signed
        UNION ALL
        SELECT 'converted_7d' AS stage, count(*) AS users FROM conv
    """,
    "q_cohort_retention": """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 strftime(date_trunc('day', ts), '%Y-%m-%d') AS active_day
          FROM events
        ),
        first AS (
          SELECT user_id, min(active_day) AS cohort_day
          FROM ud GROUP BY user_id
        )
        SELECT f.cohort_day, u.active_day,
               count(DISTINCT u.user_id) AS active_users
        FROM ud u JOIN first f ON u.user_id = f.user_id
        GROUP BY 1, 2
    """,
    "q_mad_outliers": """
        WITH med AS (
          SELECT event_type,
                 floor(quantile_cont(value, 0.5) * 10000 + 0.5) / 10000 AS med
          FROM events GROUP BY event_type
        ),
        j1 AS (
          SELECT e.event_type, e.value, m.med
          FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
          SELECT event_type,
                 floor(quantile_cont(abs(value - med), 0.5) * 10000 + 0.5) / 10000 AS mad
          FROM j1 GROUP BY event_type
        )
        SELECT j1.event_type, any_value(j1.med) AS med,
               any_value(mad.mad) AS mad,
               count(CASE WHEN abs(value - j1.med) > 3.0 * mad.mad
                     THEN 1 END) AS n_outliers
        FROM j1 JOIN mad USING (event_type)
        GROUP BY j1.event_type
    """,
    "q_user_entropy": """
        WITH c AS (
          SELECT user_id, event_type, count(*) AS cnt
          FROM events GROUP BY user_id, event_type
        )
        SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events,
               floor((ln(CAST(sum(cnt) AS DOUBLE))
                      - sum(cnt * ln(CAST(cnt AS DOUBLE)))
                        / CAST(sum(cnt) AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS entropy
        FROM c GROUP BY user_id
    """,
    "q_time_weighted_avg": """
        WITH e AS (
          SELECT user_id, event_id, value, epoch_us(ts) AS tsn FROM events
        ),
        seg AS (
          SELECT user_id, value,
                 lead(tsn) OVER (
                   PARTITION BY user_id ORDER BY tsn, event_id
                 ) - tsn AS dt
          FROM e
        )
        SELECT user_id, count(*) AS n_intervals,
               floor(CAST(sum(CAST(value * dt AS DECIMAL(38,6))) AS DOUBLE)
                     / CAST(sum(dt) AS DOUBLE) * 10000 + 0.5) / 10000 AS twa
        FROM seg WHERE dt IS NOT NULL
        GROUP BY user_id
    """,
    "q_chi_square": """
        WITH cells AS (
          SELECT user_id % 7 AS seg, event_type, count(*) AS obs
          FROM events GROUP BY seg, event_type
        ),
        r AS (SELECT seg, sum(obs) AS row_tot FROM cells GROUP BY seg),
        c AS (SELECT event_type, sum(obs) AS col_tot FROM cells GROUP BY event_type),
        n AS (SELECT sum(obs) AS n_tot,
                     count(DISTINCT seg) AS n_seg,
                     count(DISTINCT event_type) AS n_et
              FROM cells)
        SELECT floor(CAST(sum(CAST(
                 pow(obs - CAST(row_tot AS DOUBLE) * col_tot / n_tot, 2)
                 / (CAST(row_tot AS DOUBLE) * col_tot / n_tot)
               AS DECIMAL(30,10))) AS DOUBLE) * 10000 + 0.5) / 10000 AS chi2,
               count(*) AS n_cells,
               CAST((min(n_seg) - 1) * (min(n_et) - 1) AS BIGINT) AS dof
        FROM cells
        JOIN r USING (seg)
        JOIN c USING (event_type), n
    """,
    "q_event_trigrams": """
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS tsn
          FROM events
        ),
        tri AS (
          SELECT event_type AS t1,
                 lead(event_type, 1) OVER w AS t2,
                 lead(event_type, 2) OVER w AS t3
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
        )
        SELECT t1, t2, t3, count(*) AS cnt
        FROM tri WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        GROUP BY t1, t2, t3
        ORDER BY cnt DESC, t1, t2, t3 LIMIT 15
    """,
    "q_dau_wau_stickiness": """
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
        fan AS (
          SELECT DISTINCT user_id,
                 CAST(d + x * INTERVAL '1 day' AS DATE) AS w
          FROM ud, (SELECT unnest(generate_series(0, 6)) AS x)
        ),
        wau AS (SELECT w, count(*) AS wau FROM fan GROUP BY w)
        SELECT strftime(d, '%Y-%m-%d') AS day, dau, wau,
               floor(CAST(dau AS DOUBLE) / wau * 10000 + 0.5) / 10000
                 AS stickiness
        FROM dau JOIN wau ON d = w
    """,
}
