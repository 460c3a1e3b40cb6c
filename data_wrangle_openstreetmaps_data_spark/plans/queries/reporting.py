"""Business reporting battery: RFM, revenue concentration, MoM growth, seasonality.

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
)

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403



def q_customer_rfm(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — RFM (recency/frequency/monetary) customer segmentation, the
    classic CRM rollup, in the scale-safe shape: per-customer metrics in
    one aggregate, quintile boundaries as ONE broadcast percentile row
    (4-dp-floored on both engines), scores by boundaries-exceeded count —
    the same no-ntile pattern as the equi-depth histogram, so no global
    sort ever touches the |customers| frame. Output: segment cube with
    customer counts."""
    orders = table(spark, sf, "orders")
    asof = _ts("2001-08-01")
    base = orders.groupBy("o_custkey").agg(
        F.min(F.datediff(asof, F.col("o_orderdate"))).alias("recency"),
        F.count(F.lit(1)).alias("frequency"),
        _dec_sum(F.col("o_totalprice")).alias("monetary"),
    )
    qs = [0.2, 0.4, 0.6, 0.8]
    bounds = base.agg(
        *[
            text.round4(F.percentile(F.col(c), F.lit(q))).alias(
                f"{c[0]}b{i}"
            )
            for c in ("recency", "frequency", "monetary")
            for i, q in enumerate(qs)
        ]
    )

    def score(col: str, prefix: str, invert: bool) -> F.Column:
        s = F.lit(1)
        for i in range(4):
            s = s + F.when(
                F.col(col) > F.col(f"{prefix}b{i}"), 1
            ).otherwise(0)
        # high recency (days since last order) is BAD → invert the scale
        return (F.lit(6) - s) if invert else s

    return (
        base.crossJoin(F.broadcast(bounds))
        .select(
            score("recency", "r", True).alias("r_score"),
            score("frequency", "f", False).alias("f_score"),
            score("monetary", "m", False).alias("m_score"),
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q_revenue_mom_growth(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — month-over-month revenue growth: monthly decimal-exact
    totals (one aggregate; the shuffle carries |months| partial rows),
    then lag() over the TINY months frame — the window never sees fact
    rows. First month's growth is NULL by definition."""
    from pyspark.sql import Window

    orders = table(spark, sf, "orders")
    month = F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
    monthly = orders.groupBy(month.alias("month")).agg(
        _dec_sum(F.col("o_totalprice")).alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        text.round4(F.col("revenue")).alias("revenue"),
        text.round4((F.col("revenue") - prev) / prev * 100.0).alias(
            "mom_pct"
        ),
    )


def q_brand_rank_movers(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — month-over-month RANK MOVERS: which part brands climbed or
    fell the revenue leaderboard between the corpus' last two months —
    the "top movers" panel of a category-management report (rank
    dynamics, not growth: q_revenue_mom_growth covers growth). Brand
    revenue is cent-exact (decimal sum → bigint cents) so ranks have no
    float ties; rank windows partition by month over the |brands|-sized
    aggregate, never over lineitem. The two months are derived
    deterministically (max month, max month before it). Output: every
    brand present in both months, rank_prev/rank_curr/delta (positive =
    climbed), ordered by (delta desc, brand), top 10."""
    from pyspark.sql import Window

    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    month = F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), month.alias("month"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(20,6)")) * 100)
            .cast("long")
            .alias("cents")
        )
        .transform(_mat)  # 3 consumers: m2, m1, ranks
    )
    m2 = rev.agg(F.max("month").alias("m2"))
    m1 = (
        rev.crossJoin(F.broadcast(m2))
        .filter(F.col("month") < F.col("m2"))
        .agg(F.max("month").alias("m1"))
    )
    ranked = (
        rev.crossJoin(F.broadcast(m2))
        .crossJoin(F.broadcast(m1))
        .filter((F.col("month") == F.col("m1")) | (F.col("month") == F.col("m2")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("month").orderBy(
                    F.desc("cents"), F.col("brand")
                )
            ),
        )
    )
    prev = ranked.filter(F.col("month") == F.col("m1")).select(
        "brand", F.col("rk").alias("rank_prev")
    )
    curr = ranked.filter(F.col("month") == F.col("m2")).select(
        "brand", F.col("rk").alias("rank_curr")
    )
    return (
        prev.join(curr, "brand")
        .select(
            "brand",
            "rank_prev",
            "rank_curr",
            (F.col("rank_prev") - F.col("rank_curr"))
            .cast("int")
            .alias("delta"),
        )
        .orderBy(F.desc("delta"), "brand")
        .limit(10)
    )


def q_dow_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — day-of-week × event-type seasonality with row share: one
    grouped count plus a broadcast grand total. Weekday comes from
    date_format 'E' (locale-stable three-letter token, identical to
    DuckDB's %a) — NOT dayofweek(), whose 1..7 anchor differs between
    engines."""
    ev = table(spark, sf, "events")
    dow = F.date_format(catalog.event_ts(ev), "E")
    cells = ev.groupBy(dow.alias("dow"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = ev.agg(F.count(F.lit(1)).alias("n_total"))
    return cells.crossJoin(F.broadcast(total)).select(
        "dow",
        "event_type",
        "cnt",
        text.round4(F.col("cnt") / F.col("n_total") * 100.0).alias("pct"),
    )


def q_revenue_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — revenue concentration by customer decile (the Pareto / 'top
    10% of customers carry X%' audit) in the scale-safe shape: decile
    boundaries as ONE broadcast 4dp-floored percentile row, assignment
    by boundaries-exceeded count, then a 10-row share rollup against the
    broadcast grand total — no ntile, no global sort."""
    orders = table(spark, sf, "orders")
    base = orders.groupBy("o_custkey").agg(
        _dec_sum(F.col("o_totalprice")).alias("monetary")
    )
    qs = [i / 10.0 for i in range(1, 10)]
    bounds = base.agg(
        *[
            text.round4(F.percentile(F.col("monetary"), F.lit(q))).alias(
                f"b{i}"
            )
            for i, q in enumerate(qs)
        ]
    )
    decile = F.lit(1)
    for i in range(9):
        decile = decile + F.when(
            F.col("monetary") > F.col(f"b{i}"), 1
        ).otherwise(0)
    total = base.agg(
        F.sum(F.col("monetary").cast("decimal(24,6)"))
        .cast("double")
        .alias("grand")
    )
    return (
        base.crossJoin(F.broadcast(bounds))
        .select(decile.alias("decile"), "monetary")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("monetary").cast("decimal(24,6)"))
            .cast("double")
            .alias("rev"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            text.round4(F.col("rev")).alias("revenue"),
            text.round4(F.col("rev") / F.col("grand") * 100.0).alias(
                "rev_pct"
            ),
        )
    )


def q_market_basket(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — market-basket item affinity: part pairs co-purchased in the
    same order, scored by cosine n_ab/√(n_a·n_b), support ≥ 3, top-20.
    The self-join is keyed on the ORDER (bounded fan-out: C(lines,2) per
    order, lines per order is a small constant — never an item-item
    cross product), marginals are a |parts|-row broadcast. The classic
    recommendation co-occurrence shape at fact-table scale."""
    li = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    marg = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n")
    )
    scored = (
        pairs.join(
            F.broadcast(marg.select(F.col("p").alias("p1"),
                                    F.col("n").alias("n_a"))), "p1"
        )
        .join(
            F.broadcast(marg.select(F.col("p").alias("p2"),
                                    F.col("n").alias("n_b"))), "p2"
        )
        .select(
            "p1", "p2", "n_ab",
            text.round4(
                F.col("n_ab") / F.sqrt(F.col("n_a") * F.col("n_b"))
            ).alias("cosine"),
        )
    )
    return scored.orderBy(
        F.desc("cosine"), F.desc("n_ab"), "p1", "p2"
    ).limit(20)


def q_conversion_ci(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — purchase-conversion rate per user segment with a Wilson
    95% confidence interval (the binomial interval that behaves at
    small n and extreme p, unlike the normal approximation): n =
    distinct active users, k = distinct purchasers, and the interval is
    a closed-form expression of the two exact integers — so beyond the
    one distinct-user aggregate there is no row-scale work, and every
    float op is a single-expression function of exact operands
    (bit-identical cross-engine after round4). The A/B-readout shape:
    at 100 TB the distinct counts are the only shuffle, the statistics
    are free."""
    ev = table(spark, sf, "events")
    per_seg = (
        ev.select(
            (F.col("user_id") % 7).alias("seg"),
            "user_id",
            F.col("event_type").alias("et"),
        )
        .groupBy("seg")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(
                F.when(F.col("et") == "purchase", F.col("user_id"))
            ).alias("n_converted"),
        )
    )
    z = F.lit(1.96)
    n = F.col("n_users").cast("double")
    p = F.col("n_converted") / n
    denom = F.lit(1.0) + z * z / n
    center = (p + z * z / (F.lit(2.0) * n)) / denom
    half = (
        z
        * F.sqrt(p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n))
        / denom
    )
    return per_seg.select(
        "seg",
        "n_users",
        "n_converted",
        text.round4(p).alias("rate"),
        text.round4(center - half).alias("ci_lo"),
        text.round4(center + half).alias("ci_hi"),
    ).orderBy("seg")


def q_gini_inequality(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — per-nation Gini coefficient of customer revenue: the
    inequality KPI of a revenue-concentration report (0 = everyone
    spends the same, →1 = one whale owns the nation). Uses the exact
    rank-sum identity G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over revenues
    sorted ascending — every term (ranks, cent-exact decimal revenues,
    their products) stays integer-exact in BOTH engines; the only
    float op is the final scalar division, mirrored expression-for-
    expression. The rank window is PARTITIONED by nation (never a
    global sort); per-customer revenue pre-aggregates with map-side
    combine before the window, so the windowed frame is |customers|,
    not |orders|. Tied revenues are rank-order-invariant in the sum
    (equal x swaps i·x contributions), so the custkey tiebreak is for
    determinism of the plan, not the value."""
    from pyspark.sql import Window

    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    nat = table(spark, sf, "nation")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    j = (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select("n_name", "o_custkey", "rev")
    )
    w = Window.partitionBy("n_name").orderBy("rev", "o_custkey")
    ranked = j.withColumn("i", F.row_number().over(w))
    g = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").alias("s"),
        F.sum(F.col("i") * F.col("rev")).alias("t"),
    )
    nd = F.col("n_customers").cast("double")
    gini = (
        F.lit(2.0)
        * F.col("t").cast("double")
        / (nd * F.col("s").cast("double"))
        - (nd + F.lit(1.0)) / nd
    )
    return g.select(
        "n_name",
        "n_customers",
        text.round4(F.col("s").cast("double")).alias("total_rev"),
        text.round4(gini).alias("gini"),
    ).orderBy("n_name")


def q_segment_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — audience overlap matrix: for every pair of event-type
    segments, how many users belong to both and the Jaccard overlap —
    the "how much does my click audience overlap my purchase audience"
    report behind campaign targeting. Distinct (type,user) memberships
    self-join on user_id with a t1 < t2 predicate: each user emits at
    most C(|types|,2) pairs, so the join output is LINEAR in users
    (never quadratic — the segment count, not the audience size, bounds
    the fan-out, which is exactly why the user-keyed self-join is safe
    where a segment-keyed one would explode). Segment sizes are a
    |types|-row broadcast; Jaccard's one division is the only double."""
    ev = table(spark, sf, "events")
    m = ev.select("event_type", "user_id").distinct()
    sizes = m.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = m.select(F.col("event_type").alias("t1"), "user_id")
    b = m.select(F.col("event_type").alias("t2"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    s1 = sizes.select(F.col("event_type").alias("t1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("event_type").alias("t2"), F.col("n").alias("n2"))
    j = inter.join(F.broadcast(s1), "t1").join(F.broadcast(s2), "t2")
    return j.select(
        "t1",
        "t2",
        "n1",
        "n2",
        "n_both",
        text.round4(
            F.col("n_both").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_both")).cast("double")
        ).alias("jaccard"),
    ).orderBy("t1", "t2")


def q_srm_check(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — sample-ratio-mismatch (SRM) check, the first gate of any
    A/B readout: allocate users to two arms by user_id parity and test
    the observed split against the intended 50/50 with a 1-df
    chi-square, which for equal expectations collapses to
    (n0 − n1)² / n — an exact bigint numerator over one double
    division. The flag applies the standard p<0.05 threshold
    (chi² > 3.841, emitted as 0/1 int for cross-engine hashing).
    One distinct-user aggregate; everything after is a 1-row frame."""
    ev = table(spark, sf, "events")
    users = ev.select("user_id").distinct()
    agg = users.agg(
        F.count(F.when(F.col("user_id") % 2 == 0, 1)).alias("n0"),
        F.count(F.when(F.col("user_id") % 2 == 1, 1)).alias("n1"),
    )
    diff = F.col("n0") - F.col("n1")
    chi2 = (diff * diff).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    return agg.select(
        F.col("n0").alias("n_arm0"),
        F.col("n1").alias("n_arm1"),
        text.round4(chi2).alias("chi2"),
        F.when(chi2 > 3.841, 1).otherwise(0).alias("srm_flag"),
    )


def q_cramers_v(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Cramér's V effect size for the lang×source association:
    the companion to q_chi_square (significance says "not independent";
    V says "by how much", normalized to [0,1] across table shapes) and
    the numeric sibling of q_mutual_information over the SAME cells.
    Uses the algebraic identity chi² = n·(Σ c_xy²/(c_x·c_y) − 1): the
    per-cell term is one rational from exact bigint counts (c_xy² is
    exact to ~3e9 rows/cell), summed over only |langs|×|sources| cells
    so the 4-dp floor absorbs order ulp; V = sqrt(chi²/(n·(min(r,c)−1)))
    closes in mirrored doubles. Broadcast marginals; one joint shuffle."""
    d = table(spark, sf, "documents")
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    joint = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("cxy"))
    mlang = d.groupBy("lang").agg(F.count(F.lit(1)).alias("cx"))
    msrc = d.groupBy("source").agg(F.count(F.lit(1)).alias("cy"))
    nl = mlang.agg(F.count(F.lit(1)).alias("r"))
    ns = msrc.agg(F.count(F.lit(1)).alias("c"))
    j = (
        joint.join(F.broadcast(mlang), "lang")
        .join(F.broadcast(msrc), "source")
    )
    phi = j.agg(
        F.sum(
            (F.col("cxy") * F.col("cxy")).cast("double")
            / (F.col("cx") * F.col("cy")).cast("double")
        ).alias("phi_sum")
    )
    out = (
        phi.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(ns))
    )
    nd = F.col("n").cast("double")
    chi2 = nd * (F.col("phi_sum") - F.lit(1.0))
    v = F.sqrt(
        chi2
        / (nd * (F.least(F.col("r"), F.col("c")) - F.lit(1)).cast("double"))
    )
    return out.select(
        F.col("n").alias("n_docs"),
        F.col("r").alias("n_langs"),
        F.col("c").alias("n_sources"),
        text.round4(chi2).alias("chi2"),
        text.round4(v).alias("cramers_v"),
    )


def q_cuped(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — CUPED variance reduction (Deng et al. 2013), the third leg of
    the experiment-readout battery (with q_srm_check and q_conversion_ci):
    per-user pre-period covariate X = event count before the time midpoint,
    post-period metric Y = value sum after it, arms by user_id parity.
    θ = cov(X,Y)/var(X) pooled, and the per-arm adjusted mean closes in
    sufficient statistics — mean(Y_adj)_a = (ΣY_a − θ·(ΣX_a − n_a·mean X))
    / n_a — so NO second pass over users is needed. All sums are exact:
    value lands on a 1e-4 integer grid (the float-sum-free trick; value ≤
    ~560 and per-user counts ≤ ~1e6 keep y² under the bigint/decimal(38)
    ceiling), Spark sums in decimal(38,0) vs DuckDB HUGEINT, and the
    double arithmetic after is mirrored expression-for-expression. One
    user-keyed shuffle + a 2-row arm rollup; the midpoint and pooled stats
    travel as broadcast scalars. var_reduction = θ²·var(X)/var(Y) is the
    fraction of metric variance the covariate removes."""
    ev = table(spark, sf, "events")
    e = ev.select(
        "user_id",
        catalog.event_ts_us(ev).alias("tsn"),
        F.floor(F.col("value") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("vi"),
    )
    bounds = e.agg(
        F.min("tsn").alias("mn"), F.max("tsn").alias("mx")
    ).select(F.expr("(mn + mx) div 2").alias("mid"))
    pu = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("tsn") < F.col("mid"), 1)).alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("tsn") >= F.col("mid"), F.col("vi"))),
                F.lit(0),
            ).alias("y"),
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
    )
    ybig = F.col("y").cast("decimal(19,0)")
    st = pu.agg(
        F.count(F.lit(1)).alias("nu"),
        F.sum("x").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum(ybig).alias("sy"),
        F.sum((F.col("x") * ybig).cast("decimal(38,0)")).alias("sxy"),
        F.sum((ybig * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    j = (
        pu.groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("na"),
            F.sum("x").alias("sxa"),
            F.sum(ybig).alias("sya"),
        )
        .crossJoin(F.broadcast(st))
    )

    def d(c: str) -> F.Column:
        return F.col(c).cast("double")

    cov = d("nu") * d("sxy") - d("sx") * d("sy")
    varx = d("nu") * d("sxx") - d("sx") * d("sx")
    vary = d("nu") * d("syy") - d("sy") * d("sy")
    theta = F.when(varx > 0, cov / varx).otherwise(F.lit(0.0))
    meanx = d("sx") / d("nu")
    adj = (d("sya") - theta * (d("sxa") - d("na") * meanx)) / d("na")
    vr = F.when(vary > 0, theta * theta * varx / vary).otherwise(F.lit(0.0))
    return j.select(
        "arm",
        F.col("na").alias("n_users"),
        text.round4(d("sya") / d("na") / F.lit(10000.0)).alias("mean_y"),
        text.round4(adj / F.lit(10000.0)).alias("mean_y_adj"),
        text.round4(theta / F.lit(10000.0)).alias("theta"),
        text.round4(vr).alias("var_reduction"),
    ).orderBy("arm")


def q_decile_lift(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — decile lift / gains table, the standard scoring-model
    readout: users bucketed into activity deciles (score = total event
    count) vs an "above-average purchaser" outcome, reporting per-decile
    conversion rate and lift over the global rate. Deciles use the
    RFM-style no-ntile pattern — 9 percentile boundaries as ONE
    4-dp-floored broadcast row, decile = boundaries-exceeded count — so
    no global sort ever touches the |users| frame. The outcome threshold
    is scale-free AND float-free: purchases > mean purchases/user is
    evaluated as the exact bigint cross-multiplication pc·nu > tp. One
    user-keyed shuffle, then ≤10-row arithmetic."""
    ev = table(spark, sf, "events")
    pu = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("score"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("pc"),
    )
    gt = pu.agg(F.count(F.lit(1)).alias("nu"), F.sum("pc").alias("tp"))
    pu = pu.crossJoin(F.broadcast(gt)).withColumn(
        "conv",
        F.when(F.col("pc") * F.col("nu") > F.col("tp"), 1).otherwise(0),
    )
    qs = [i / 10.0 for i in range(1, 10)]
    bounds = pu.agg(
        *[
            text.round4(F.percentile(F.col("score"), F.lit(q))).alias(
                f"b{i}"
            )
            for i, q in enumerate(qs)
        ]
    )
    dec = F.lit(1)
    for i in range(9):
        dec = dec + F.when(F.col("score") > F.col(f"b{i}"), 1).otherwise(0)
    per = (
        pu.crossJoin(F.broadcast(bounds))
        .select(dec.alias("decile"), "conv")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count(F.when(F.col("conv") == 1, 1)).alias("n_conv"),
        )
    )
    tot = per.agg(F.sum("n_users").alias("tu"), F.sum("n_conv").alias("tc"))
    j = per.crossJoin(F.broadcast(tot))
    rate = F.col("n_conv").cast("double") / F.col("n_users").cast("double")
    grate = F.col("tc").cast("double") / F.col("tu").cast("double")
    return j.select(
        "decile",
        "n_users",
        "n_conv",
        text.round4(rate).alias("conv_rate"),
        text.round4(rate / grate).alias("lift"),
    ).orderBy("decile")


def q_apportionment(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Hamilton largest-remainder apportionment: allocate a fixed
    budget of 1000 units across nations proportionally to revenue, with
    EXACT integer arithmetic throughout (the float-free allocation
    pattern): revenue as exact decimal cents, quota = cents·1000 with
    integer DIV/%, leftover seats to the largest remainders (tiebreak
    nationkey). Guarantees Σseats = 1000 bit-exactly on any engine — a
    float quota would not. The per-nation aggregate is the only
    data-sized shuffle; totals ride 1-row broadcasts and the remainder
    rank is a window over the bounded nation dimension (≤25 rows).
    Headroom: cents·1000 needs Σrevenue < 9.2e16 cents (~920 T$) before
    the bigint quota overflows — switch to decimal(38,0) beyond that."""
    from pyspark.sql import Window

    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    nat = table(spark, sf, "nation")
    rev = (
        orders.select("o_custkey", "o_totalprice")
        .join(
            cust.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(20,6)")).alias("rev")
        )
        .withColumn("cents", (F.col("rev") * 100).cast("long"))
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("total"))
    f = rev.crossJoin(F.broadcast(tot)).select(
        "c_nationkey",
        "cents",
        F.expr("CAST(cents * 1000 DIV total AS BIGINT)").alias(
            "floor_seats"
        ),
        F.expr("CAST(cents * 1000 % total AS BIGINT)").alias("rem"),
    )
    used = f.agg(F.sum("floor_seats").cast("long").alias("used"))
    r = f.crossJoin(F.broadcast(used)).withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.desc("rem"), F.asc("c_nationkey"))
        ),
    )
    return (
        r.join(
            F.broadcast(nat),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("cents").alias("rev_cents"),
            "floor_seats",
            (
                F.col("floor_seats")
                + F.when(
                    F.col("rn") <= F.lit(1000) - F.col("used"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("seats"),
        )
        .orderBy(F.desc("seats"), "nation")
    )


def q_rank_movers(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — month-over-month rank movers: nations ranked by monthly
    revenue, then each nation's rank delta vs its previous month; top 15
    biggest absolute moves. Ranks are deterministic because the ranking
    key is the EXACT decimal revenue (tiebreak nation name) — a double
    sum could order ties differently per engine/partitioning. Two
    bounded windows: rank partitions by month (≤25 rows each), lag
    partitions by nation (≤ #months rows each); the data-sized work is
    the one (nation, month) aggregate."""
    from pyspark.sql import Window

    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    nat = table(spark, sf, "nation")
    rev = (
        orders.select("o_custkey", "o_totalprice", "o_orderdate")
        .join(
            cust.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(20,6)")).alias("rev")
        )
    )
    wm = Window.partitionBy("month").orderBy(F.desc("rev"), "nation")
    wn = Window.partitionBy("nation").orderBy("month")
    r = rev.withColumn("rnk", F.row_number().over(wm)).withColumn(
        "prev_rnk", F.lag("rnk").over(wn)
    )
    return (
        r.where(F.col("prev_rnk").isNotNull())
        .select(
            "month",
            "nation",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("prev_rnk").cast("long").alias("prev_rnk"),
            (F.col("prev_rnk") - F.col("rnk")).cast("long").alias("delta"),
        )
        .orderBy(F.abs(F.col("delta")).desc(), "month", "nation")
        .limit(15)
    )


# Poisson(1) CDF thresholds for the deterministic Poisson bootstrap:
# P(X <= k) for k = 0..5; counts cap at 6 (P > 0.9999). Built once in
# Python so the Spark literals and the oracle SQL literals are the SAME
# doubles — the inverse-CDF comparison is then bit-identical per engine.
import math as _math

_POIS_CDF: list[float] = []
_acc = 0.0
for _k in range(6):
    _acc += _math.exp(-1.0) / _math.factorial(_k)
    _POIS_CDF.append(_acc)


def q_poisson_bootstrap(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Poisson bootstrap confidence intervals, THE resampling
    scheme that scales (classic bootstrap needs n-sized samples drawn
    WITH replacement — impossible distributed; Poisson bootstrap gives
    each row an independent Poisson(1) weight per replicate, one
    streaming pass, no global state). B=200 replicates of the per-type
    mean event value: weight = inverse-CDF of Poisson(1) at a portable
    uniform u = md5(event_id#b)/2^60, replicate means from EXACT decimal
    weighted sums (so replicate ordering is cross-engine deterministic),
    CI = 5th / 196th order statistic of the 200 means. The 200× row
    fan-out collapses map-side into G×B partial aggregates — at 100 TB
    the shuffle carries #groups·200 rows, not n·200."""
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )
    from pyspark.sql import Window

    B = 200
    ev = table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    rep = ev.withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(B - 1)))
    ).withColumn(
        "u",
        portable_token_hash(
            F.concat_ws(
                "#",
                F.col("event_id").cast("string"),
                F.col("b").cast("string"),
            )
        )
        / F.lit(float(1 << 60)),
    )
    w = F.when(F.col("u") < F.lit(_POIS_CDF[0]), 0)
    for k in range(1, 6):
        w = w.when(F.col("u") < F.lit(_POIS_CDF[k]), k)
    rep = rep.withColumn("w", w.otherwise(6))
    m = (
        rep.groupBy("event_type", "b")
        .agg(
            F.sum(F.col("w") * F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("s"),
            F.sum("w").cast("long").alias("n"),
        )
        .where(F.col("n") > 0)
        .withColumn("mean_b", F.col("s") / F.col("n").cast("double"))
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("mean_b", "b")
    )
    ci = (
        m.withColumn("rn", rn)
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("rn") == 5, F.col("mean_b"))).alias("lo"),
            F.max(F.when(F.col("rn") == 196, F.col("mean_b"))).alias(
                "hi"
            ),
        )
    )
    pt = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_v"),
    )
    return (
        pt.join(F.broadcast(ci), "event_type")
        .select(
            "event_type",
            "n_events",
            text.round4(F.col("mean_v")).alias("mean_value"),
            text.round4(F.col("lo")).alias("ci_lo"),
            text.round4(F.col("hi")).alias("ci_hi"),
        )
        .orderBy("event_type")
    )


def q_diff_in_diff(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — difference-in-differences estimator, the fourth leg of the
    experiment-readout battery (q_srm_check / q_conversion_ci /
    q_cuped): arms by user-id parity, periods split at the time
    midpoint, DiD = (T̄post − T̄pre) − (C̄post − C̄pre) from the four
    cell means. Cell sums are EXACT — value on the 1e-4 integer grid
    (the q_cuped float-sum-free trick) in bigint — and the four means
    + DiD are mirrored double expressions, so the estimate is
    bit-identical cross-engine. One (arm, period) aggregate (4 groups,
    full map-side combine) + 4-row arithmetic; the midpoint travels as
    a broadcast scalar."""
    ev = table(spark, sf, "events")
    e = ev.select(
        "user_id",
        catalog.event_ts_us(ev).alias("tsn"),
        F.floor(F.col("value") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("vi"),
    )
    bounds = e.agg(
        F.min("tsn").alias("mn"), F.max("tsn").alias("mx")
    ).select(F.expr("(mn + mx) div 2").alias("mid"))
    cells = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy(
            (F.col("user_id") % 2).cast("int").alias("arm"),
            F.when(F.col("tsn") < F.col("mid"), "pre")
            .otherwise("post")
            .alias("period"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vi").cast("long").alias("s"),
        )
    )

    def cell(arm: int, period: str, col: str) -> F.Column:
        return F.max(
            F.when(
                (F.col("arm") == arm) & (F.col("period") == period),
                F.col(col),
            )
        )

    one = cells.agg(
        cell(0, "pre", "n").alias("n_c_pre"),
        cell(0, "post", "n").alias("n_c_post"),
        cell(1, "pre", "n").alias("n_t_pre"),
        cell(1, "post", "n").alias("n_t_post"),
        cell(0, "pre", "s").alias("s_c_pre"),
        cell(0, "post", "s").alias("s_c_post"),
        cell(1, "pre", "s").alias("s_t_pre"),
        cell(1, "post", "s").alias("s_t_post"),
    )

    def mean(tag: str) -> F.Column:
        return (
            F.col(f"s_{tag}").cast("double")
            / F.lit(10000.0)
            / F.col(f"n_{tag}").cast("double")
        )

    did = (mean("t_post") - mean("t_pre")) - (
        mean("c_post") - mean("c_pre")
    )
    return one.select(
        "n_c_pre",
        "n_c_post",
        "n_t_pre",
        "n_t_post",
        text.round4(mean("c_pre")).alias("m_c_pre"),
        text.round4(mean("c_post")).alias("m_c_post"),
        text.round4(mean("t_pre")).alias("m_t_pre"),
        text.round4(mean("t_post")).alias("m_t_post"),
        text.round4(did).alias("did"),
    )


def q_sla_aging(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — fulfilment SLA aging report: order→ship latency
    (ship − order date, integer days) bucketed into the standard
    aging bands (≤7, 8–30, 31–90, >90 days) per order priority, with
    the per-priority share of each band — the ops dashboard every
    fulfilment team runs, here as one broadcast-dimensioned fact
    aggregate (20 output rows) over exact day-diff integers. The
    latency histogram is computed once; shares divide exact counts."""
    li = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    d = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias(
            "days"
        ),
    )
    band = (
        F.when(F.col("days") <= 7, "a_0_7")
        .when(F.col("days") <= 30, "b_8_30")
        .when(F.col("days") <= 90, "c_31_90")
        .otherwise("d_90_plus")
    )
    per = d.groupBy(
        F.col("o_orderpriority").alias("priority"), band.alias("band")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = per.groupBy("priority").agg(
        F.sum("n").cast("long").alias("nt")
    )
    return (
        per.join(F.broadcast(tot), "priority")
        .select(
            "priority",
            "band",
            "n",
            text.round4(
                F.col("n").cast("double") / F.col("nt").cast("double")
            ).alias("share"),
        )
        .orderBy("priority", "band")
    )


def q_mde_power(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — minimum detectable effect at 80% power / 5% two-sided α
    for the standing experiment split (user-id parity arms): MDE =
    (z_{α/2} + z_β)·√(σ²_pooled·(1/n_a + 1/n_b)), the pre-registration
    number every experiment readout starts from (and the fifth leg of
    the battery: q_srm_check → q_mde_power → q_conversion_ci → q_cuped
    → q_diff_in_diff). Sufficient statistics are exact 1e-4-grid bigint
    sums per arm; pooled variance, the z constants (hardcoded double
    literals, identical both engines), and the final √ are mirrored
    double expressions. One 2-group aggregate; 1 output row."""
    Z = 1.959963984540054 + 0.8416212335729143  # z_{.975} + z_{.80}
    ev = table(spark, sf, "events")
    e = ev.select(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.floor(F.col("value") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("vi"),
    )
    arms = e.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vi").cast("long").alias("s1"),
        F.sum(
            F.col("vi").cast("decimal(19,0)")
            * F.col("vi").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("s2"),
    )

    def pick(arm: int, col: str):
        return F.max(F.when(F.col("arm") == arm, F.col(col)))

    one = arms.agg(
        pick(0, "n").alias("n_a"),
        pick(1, "n").alias("n_b"),
        pick(0, "s1").alias("s1_a"),
        pick(1, "s1").alias("s1_b"),
        pick(0, "s2").alias("s2_a"),
        pick(1, "s2").alias("s2_b"),
    )

    def ss(tag: str):
        # within-arm sum of squared deviations, grid² units, exact
        n38 = F.col(f"n_{tag}").cast("decimal(38,0)")
        return (
            n38 * F.col(f"s2_{tag}")
            - F.col(f"s1_{tag}").cast("decimal(38,0)")
            * F.col(f"s1_{tag}").cast("decimal(38,0)")
        ).cast("double") / F.col(f"n_{tag}").cast("double")

    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    var_pooled = (ss("a") + ss("b")) / (na + nb - F.lit(2.0)) / F.lit(
        1.0e8
    )
    mde = F.lit(Z) * F.sqrt(
        var_pooled * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    mean_ctl = F.col("s1_a").cast("double") / F.lit(10000.0) / na
    return one.select(
        "n_a",
        "n_b",
        text.round4(F.sqrt(var_pooled)).alias("sd_pooled"),
        text.round4(mde).alias("mde_abs"),
        text.round4(mde / mean_ctl).alias("mde_rel"),
    )


def q_psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Population Stability Index between the first and second
    half of the event stream (split at the time midpoint, the
    q_diff_in_diff broadcast scalar): values bucket into 10 fixed-width
    bins (floor(value/50), capped at 9), and each bin contributes
    (p_a − p_b)·ln(p_a/p_b) with Laplace smoothing p = (c+1)/(n+10) so
    an empty side stays finite. PSI is THE industry drift gate on model
    features (rule of thumb: <0.1 stable, >0.25 shifted); emitting the
    per-bin terms (not just the sum) keeps every float op a mirrored
    per-row expression — no cross-engine float SUM ordering anywhere —
    and shows which bins moved. Plan: one (bin)-keyed conditional
    aggregate over the stream + a broadcast 1-row total; 10 output
    rows."""
    ev = table(spark, sf, "events")
    e = ev.select(
        catalog.event_ts_us(ev).alias("tsn"),
        F.least(
            F.floor(F.col("value") / F.lit(50.0)).cast("int"), F.lit(9)
        ).alias("bin"),
    )
    bounds = e.agg(
        F.min("tsn").alias("mn"), F.max("tsn").alias("mx")
    ).select(F.expr("(mn + mx) div 2").alias("mid"))
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("tsn") < F.col("mid"), 1))
            .cast("long")
            .alias("n_a"),
            F.count(F.when(F.col("tsn") >= F.col("mid"), 1))
            .cast("long")
            .alias("n_b"),
        )
    )
    tot = cnt.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    pa = (F.col("n_a") + 1).cast("double") / (
        F.col("ta") + 10
    ).cast("double")
    pb = (F.col("n_b") + 1).cast("double") / (
        F.col("tb") + 10
    ).cast("double")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_a",
            "n_b",
            text.round4((pa - pb) * F.log(pa / pb)).alias("psi_term"),
        )
        .orderBy("bin")
    )


def q_hhi_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — Herfindahl–Hirschman market-concentration index per
    region: HHI = Σᵢ sᵢ² over nation revenue shares, computed as
    Σ centsᵢ² / (Σ cents)² with the squares in EXACT decimal(38,0)
    (Spark) vs HUGEINT (DuckDB) — the q_cuped big-integer pattern —
    and ONE double division at the end. Also reports the top nation's
    share (max/total, exact integers → double). The data-sized work is
    the (region, nation) aggregate; region totals are a 25-row rollup.
    HHI ranges 1/n (perfect competition) to 1 (monopoly)."""
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    nat = table(spark, sf, "nation")
    reg = table(spark, sf, "region")
    cents = (
        orders.select("o_custkey", "o_totalprice")
        .join(
            cust.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_regionkey", "c_nationkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(20,6)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    c19 = F.col("cents").cast("decimal(19,0)")
    per = cents.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.sum("cents").cast("long").alias("tot"),
        F.sum(c19 * c19).cast("decimal(38,0)").alias("sumsq"),
        F.max("cents").cast("long").alias("top"),
    )
    totd = F.col("tot").cast("double")
    return (
        per.join(
            F.broadcast(reg),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select(
            F.col("r_name").alias("region"),
            "n_nations",
            text.round4(
                F.col("sumsq").cast("double") / (totd * totd)
            ).alias("hhi"),
            text.round4(F.col("top").cast("double") / totd).alias(
                "top_share"
            ),
        )
        .orderBy("region")
    )


def q_abc_classification(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — ABC inventory classification over brand×type categories:
    rank categories by revenue, classify A (cumulative share ≤ 80%),
    B (≤ 95%), C (rest), and report each class's category count and
    revenue share — the Pareto companion to q_revenue_concentration's
    customer deciles. Revenue is floored to an exact 1e-6 grid BIGINT
    per line item (100 TB note: grid-bigint sums overflow around 1e9
    high-value rows — swap to decimal sums there; the thresholds stay
    exact either way), so the cumulative window, the 80/95% thresholds
    (cum·5 ≤ total·4, cum·20 ≤ total·19 — integer cross-multiplication,
    no float boundary), and the class rollup are all exact integer
    arithmetic. The cumulative window runs over the AGGREGATED
    brand×type dimension (bounded ≤ |brands|·|types|, never fact-sized),
    the grand total rides a 1-row broadcast."""
    from pyspark.sql import Window

    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    r6 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    cat = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type")
        .agg(F.sum(r6).alias("rev6"))
    )
    w = Window.orderBy(F.desc("rev6"), "p_brand", "p_type").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = cat.agg(F.sum("rev6").alias("total6"))
    classed = (
        cat.withColumn("cum6", F.sum("rev6").over(w))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "abc_class",
            F.when(F.col("cum6") * 5 <= F.col("total6") * 4, F.lit("A"))
            .when(F.col("cum6") * 20 <= F.col("total6") * 19, F.lit("B"))
            .otherwise(F.lit("C")),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_categories"),
            F.sum("rev6").alias("class_rev6"),
            F.max("total6").alias("total6"),
        )
        .select(
            "abc_class",
            "n_categories",
            text.round4(
                F.col("class_rev6").cast("double")
                / F.col("total6").cast("double")
            ).alias("rev_share"),
        )
        .orderBy("abc_class")
    )


_POIS_CASE_SQL = "CASE {} ELSE 6 END".format(
    " ".join(
        f"WHEN u < {cdf!r} THEN {k}" for k, cdf in enumerate(_POIS_CDF)
    )
)

def q_calibration_bins(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — model-calibration reliability table + expected calibration
    error (ECE), the serving-side companion of q_auc / q_decile_lift:
    score = l_discount·10 (a deterministic stand-in prediction in
    [0,1]), outcome = returnflag 'R'. Ten fixed-width bins by
    floor(score·10) capped at 9; per bin the row count, mean score
    (decimal-exact sum → one double division, round4) and observed
    rate; ECE = Σ n·|mean−rate| / N from the same exact pieces, so
    both engines derive identical doubles before the final round4.
    One hash agg over the facts + a 10-row fold — the reliability
    report costs one scan at any scale."""
    li = table(spark, sf, "lineitem")
    score = F.col("l_discount") * 10
    b = F.least(F.floor(score * 10), F.lit(9)).cast("int")
    bins = _mat(  # 2 consumers: report rows + the ECE scalar
        li.groupBy(b.alias("bin")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("l_discount") * 10).cast("decimal(18,2)")
            ).alias("_ssum"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias(
                "_pos"
            ),
        )
    )
    mean_s = F.col("_ssum").cast("double") / F.col("n")
    rate = F.col("_pos").cast("double") / F.col("n")
    ece = bins.agg(
        (
            F.sum(
                F.col("n")
                * F.abs(
                    F.col("_ssum").cast("double") / F.col("n")
                    - F.col("_pos").cast("double") / F.col("n")
                )
            )
            / F.sum("n")
        ).alias("_e")
    ).select(text.round4(F.col("_e")).alias("ece"))
    return (
        bins.select(
            "bin",
            "n",
            text.round4(mean_s).alias("mean_score"),
            text.round4(rate).alias("obs_rate"),
        )
        .crossJoin(F.broadcast(ece))  # 1-row scalar
        .orderBy("bin")
    )


def q_raking(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — survey raking / iterative proportional fitting, ONE round
    (row pass then column pass), calibrating the nation × segment
    customer table to UNIFORM target marginals (total/25 per nation,
    total/5 per segment — the design-weight shape when a sample
    over-represents some strata). Weights are doubles derived from
    exact integer counts, and the weights are FIXED-POINT (1e-6
    micro-units, floor(x·1e6+0.5)) so every cross-cell sum in the
    pipeline is an exact int64 — a float Σ cnt·w over a window has no
    defined summation order cross-engine, which is precisely the
    nondeterminism this query refuses to ship. After the column pass
    the column marginals are met up to quantization; the row residual
    is the classic IPF one-round gap, reported as max_row_err (in
    persons). Output: the 10 largest per-cell weights (tiebreaks
    nationkey, segment) + the residual scalar — two |cells|-frame
    windows, one scan of the facts."""
    from pyspark.sql import Window

    c = table(spark, sf, "customer")
    cells = c.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count("*").alias("cnt"))
    tot = F.sum("cnt").over(Window.partitionBy())
    rowsum = F.sum("cnt").over(Window.partitionBy("nationkey"))
    w1u = F.floor((tot / 25) / rowsum * 1000000 + F.lit(0.5)).cast(
        "long"
    )  # micro-weight after the row pass
    step1 = _mat(  # 2 consumers: col sums + final weights
        cells.select(
            "nationkey",
            "segment",
            "cnt",
            tot.alias("tot"),
            w1u.alias("w1u"),
        )
    )
    colsum_u = F.sum(F.col("cnt") * F.col("w1u")).over(
        Window.partitionBy("segment")
    )  # exact int64 micro-person column marginal
    wu = F.floor(
        F.col("w1u")
        * ((F.col("tot") * 1000000 / 5) / colsum_u)
        + F.lit(0.5)
    ).cast("long")
    step2 = _mat(  # 2 consumers: top rows + residual scalar
        step1.select("nationkey", "segment", "cnt", "tot", wu.alias("wu"))
    )
    resid = (
        step2.groupBy("nationkey")
        .agg(
            F.abs(
                F.sum(F.col("cnt") * F.col("wu"))
                - F.max(F.col("tot") * 1000000 / 25)
            ).alias("_e")
        )
        .agg(F.max("_e").alias("_m"))
        .select(
            text.round4(F.col("_m") / 1000000).alias("max_row_err")
        )
    )
    return (
        step2.select(
            "nationkey",
            "segment",
            "cnt",
            text.round4(F.col("wu") / 1000000).alias("weight"),
        )
        .orderBy(F.desc("weight"), "nationkey", "segment")
        .limit(10)
        .crossJoin(F.broadcast(resid))  # 1-row scalar
    )


def q_fulfillment_lag(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — order-to-last-shipment lag percentiles per order
    priority: per order the lag in whole days from o_orderdate to the
    LAST line shipment (max l_shipdate — exact integer days from µs
    epochs), then p50/p90/max per priority (Spark percentile ↔ DuckDB
    quantile_cont, the established cross-engine pair). One join
    aggregated order-side, then a |priorities|-row rollup."""
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    last = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    lag = (
        o.join(last, o["o_orderkey"] == last["l_orderkey"])
        .select(
            "o_orderpriority",
            (
                F.unix_micros(F.col("last_ship").cast("timestamp"))
                - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            ).alias("_us"),
        )
        # integer day division on BOTH engines: double->bigint CASTs
        # round in DuckDB but truncate in Spark — never rely on them
        .select("o_orderpriority", F.expr("_us div 86400000000").alias("lag_days"))
    )
    return (
        lag.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            text.round4(F.expr("percentile(lag_days, 0.5)")).alias(
                "p50_days"
            ),
            text.round4(F.expr("percentile(lag_days, 0.9)")).alias(
                "p90_days"
            ),
            F.max("lag_days").alias("max_days"),
        )
        .orderBy("priority")
    )


def q_dq_expectations(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — DATA-QUALITY EXPECTATION SUITE (the Great-Expectations /
    dbt-test shape): one row per declared rule with checked/failed
    counts and the failure rate, across tables — the audit a 100 TB
    ingest runs before promoting a batch. Each rule is ONE scan-bound
    aggregate (count(when(...))); the referential-integrity rule is a
    broadcast left-anti count; uniqueness is count − count(distinct).
    No rule collects rows — violations are COUNTED engine-side, the
    row-level drill-down being a filter the operator already expresses.

    Rules: not-null, accepted-values, numeric range, cross-column
    order, key uniqueness, and FK integrity (orders.o_custkey →
    customer, lineitem.l_orderkey → orders)."""
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    cust = table(spark, sf, "customer")

    def rule(name: str, df: DataFrame, fail_cond) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
            F.count(F.when(fail_cond, F.lit(1))).alias("n_failed"),
        )

    checks = [
        rule(
            "orders.o_custkey not_null",
            orders,
            F.col("o_custkey").isNull(),
        ),
        rule(
            "orders.o_orderstatus accepted_values",
            orders,
            ~F.col("o_orderstatus").isin("O", "F", "P"),
        ),
        rule(
            "lineitem.l_quantity range_1_50",
            li,
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        rule(
            "lineitem.ship_after_order",
            li.join(
                orders.select("o_orderkey", "o_orderdate"),
                li["l_orderkey"] == F.col("o_orderkey"),
            ),
            F.col("l_shipdate") < F.col("o_orderdate"),
        ),
        rule(
            "lineitem.l_discount range_0_0.1",
            li,
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
        ),
    ]
    uniq = orders.agg(
        F.lit("orders.o_orderkey unique").alias("rule"),
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "n_failed"
        ),
    )
    fk_oc = (
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.lit("orders.o_custkey fk_customer").alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
            F.count(F.when(F.col("c_custkey").isNull(), F.lit(1))).alias(
                "n_failed"
            ),
        )
    )
    fk_lo = (
        li.join(
            orders.select("o_orderkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.lit("lineitem.l_orderkey fk_orders").alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
            F.count(F.when(F.col("o_orderkey").isNull(), F.lit(1))).alias(
                "n_failed"
            ),
        )
    )
    out = checks[0]
    for c in checks[1:] + [uniq, fk_oc, fk_lo]:
        out = out.unionByName(c)
    return out.select(
        "rule",
        "n_checked",
        "n_failed",
        text.round4(
            F.col("n_failed") / F.col("n_checked")
        ).alias("fail_rate"),
    ).orderBy("rule")


def q_ipw_ate(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — stratified inverse-propensity (Horvitz–Thompson) average
    treatment effect: treated = urgent/high-priority orders, outcome =
    order value, strata = customer nation. Within a stratum the
    estimated propensity is nt/n, so the IPW estimate collapses to the
    exact stratification estimator ATE = Σ_s (n_s/N)·(ȳt_s − ȳc_s) —
    computed engine-side with ONE broadcast dim join and ONE hash
    aggregate onto ≤25 nation strata; no per-row weights ever
    materialize, which is what makes the estimator a single shuffle at
    100 TB. The naive (unstratified) difference is reported next to it:
    the gap is the confounding the stratification removes.

    Cross-engine determinism: money in exact decimal cents; the
    per-stratum arm difference is ONE double expression tree
    (sum_t/nt − sum_c/nc)/100 → round4, identical on both engines;
    those round4 values go back onto the 1e-4 integer grid
    (floor(d·1e4+0.5)·n_s, exact BIGINT) before the cross-stratum sum,
    so no float sum with undefined order ever occurs. Strata lacking
    either arm are excluded from the estimate and counted."""
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    j = orders.join(
        F.broadcast(cust.select("c_custkey", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        F.col("c_nationkey").alias("stratum"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .alias("treated"),
        (F.col("o_totalprice").cast("decimal(20,6)") * 100)
        .cast("long")
        .alias("cents"),
    )
    per = j.groupBy("stratum").agg(
        F.count(F.when(F.col("treated"), F.lit(1))).alias("nt"),
        F.count(F.when(~F.col("treated"), F.lit(1))).alias("nc"),
        F.coalesce(
            F.sum(F.when(F.col("treated"), F.col("cents"))), F.lit(0)
        ).alias("st"),
        F.coalesce(
            F.sum(F.when(~F.col("treated"), F.col("cents"))), F.lit(0)
        ).alias("sc"),
    )
    ok = F.col("nt") > 0
    ok = ok & (F.col("nc") > 0)
    d4 = text.round4(
        (
            F.col("st") / F.col("nt") - F.col("sc") / F.col("nc")
        )
        / F.lit(100.0)
    )
    g = per.select(
        "nt",
        "nc",
        F.when(ok, F.lit(1)).otherwise(F.lit(0)).alias("used"),
        F.when(
            ok,
            F.floor(d4 * 10000 + F.lit(0.5)).cast("long")
            * (F.col("nt") + F.col("nc")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("grid"),
        F.when(ok, F.col("nt") + F.col("nc"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("nw"),
        F.col("st").alias("st"),
        F.col("sc").alias("sc"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("used").cast("long").alias("strata_used"),
        F.sum("nt").cast("long").alias("n_treated"),
        F.sum("nc").cast("long").alias("n_control"),
        text.round4(F.sum("grid") / (F.sum("nw") * F.lit(10000.0))).alias(
            "ate_dollars"
        ),
        text.round4(
            (
                F.sum("st") / F.sum("nt") - F.sum("sc") / F.sum("nc")
            )
            / F.lit(100.0)
        ).alias("naive_dollars"),
    )


def q_observe_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """EXT — pipeline observability via Spark's NATIVE Observation API
    (CollectMetrics): a quality gate over documents instrumented with
    df.observe(...) so the INPUT-side audit metrics (docs, chars,
    English share) are collected in the SAME pass that computes the
    gated output — zero extra scans. At 100 TB this is the difference
    between a free audit row and a second full-table aggregation; the
    observe node is a streaming-safe accumulator, not a shuffle.

    The query executes its one action internally (the kept-side
    aggregate), then returns the combined 1-row report (documented
    driver-side 1-row materialization, same class as the decorrelated
    scalar sites). Oracle: the identical aggregates as plain SQL —
    which is exactly the second pass observe() avoids."""
    from pyspark.sql import Observation

    docs = table(spark, sf, "documents")
    obs = Observation("ingest_audit")
    kept = docs.observe(
        obs,
        F.count(F.lit(1)).alias("in_docs"),
        F.sum("n_chars").alias("in_chars"),
        F.count(F.when(F.col("lang") == "en", F.lit(1))).alias("in_en"),
    ).filter(F.col("n_chars") >= 200)
    row = kept.agg(
        F.count(F.lit(1)).cast("long").alias("kept_docs"),
        F.coalesce(F.sum("n_chars"), F.lit(0))
        .cast("long")
        .alias("kept_chars"),
    ).collect()[0]
    m = obs.get
    out = [
        (
            int(m["in_docs"]),
            int(m["in_chars"]),
            int(m["in_en"]),
            int(row["kept_docs"]),
            int(row["kept_chars"]),
        )
    ]
    res = spark.createDataFrame(
        out, "in_docs long, in_chars long, in_en long, kept_docs long, "
        "kept_chars long",
    )
    return res.withColumn(
        "kept_ratio",
        text.round4(F.col("kept_docs") / F.col("in_docs")),
    )


ORACLES: dict[str, str | None] = {
    "q_ipw_ate": """
        WITH j AS (
          SELECT c.c_nationkey AS stratum,
                 o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS treated,
                 CAST(CAST(o.o_totalprice AS DECIMAL(20,6)) * 100 AS BIGINT)
                   AS cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        per AS (
          SELECT stratum,
                 CAST(count(CASE WHEN treated THEN 1 END) AS BIGINT) AS nt,
                 CAST(count(CASE WHEN NOT treated THEN 1 END) AS BIGINT) AS nc,
                 CAST(coalesce(sum(CASE WHEN treated THEN cents END), 0)
                      AS BIGINT) AS st,
                 CAST(coalesce(sum(CASE WHEN NOT treated THEN cents END), 0)
                      AS BIGINT) AS sc
          FROM j GROUP BY stratum
        ),
        g AS (
          SELECT nt, nc, st, sc,
                 CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END AS used,
                 CASE WHEN nt > 0 AND nc > 0 THEN
                   CAST(floor(
                     (floor(((CAST(st AS DOUBLE) / nt
                              - CAST(sc AS DOUBLE) / nc) / 100.0)
                            * 10000 + 0.5) / 10000)
                     * 10000 + 0.5) AS BIGINT) * (nt + nc)
                 ELSE 0 END AS grid,
                 CASE WHEN nt > 0 AND nc > 0 THEN nt + nc ELSE 0 END AS nw
          FROM per
        )
        SELECT CAST(count(*) AS BIGINT) AS n_strata,
               CAST(sum(used) AS BIGINT) AS strata_used,
               CAST(sum(nt) AS BIGINT) AS n_treated,
               CAST(sum(nc) AS BIGINT) AS n_control,
               floor((CAST(sum(grid) AS DOUBLE)
                      / (CAST(sum(nw) AS DOUBLE) * 10000.0))
                     * 10000 + 0.5) / 10000 AS ate_dollars,
               floor(((CAST(sum(st) AS DOUBLE) / sum(nt)
                       - CAST(sum(sc) AS DOUBLE) / sum(nc)) / 100.0)
                     * 10000 + 0.5) / 10000 AS naive_dollars
        FROM g
    """,
    "q_observe_metrics": """
        SELECT CAST(count(*) AS BIGINT) AS in_docs,
               CAST(sum(n_chars) AS BIGINT) AS in_chars,
               CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT)
                 AS in_en,
               CAST(count(CASE WHEN n_chars >= 200 THEN 1 END) AS BIGINT)
                 AS kept_docs,
               CAST(coalesce(sum(CASE WHEN n_chars >= 200 THEN n_chars END),
                             0) AS BIGINT) AS kept_chars,
               floor((CAST(count(CASE WHEN n_chars >= 200 THEN 1 END)
                           AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000
                 AS kept_ratio
        FROM documents
    """,
    "q_dq_expectations": """
        WITH checks AS (
          SELECT 'orders.o_custkey not_null' AS rule,
                 CAST(count(*) AS BIGINT) AS n_checked,
                 CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END)
                      AS BIGINT) AS n_failed
          FROM orders
          UNION ALL
          SELECT 'orders.o_orderstatus accepted_values',
                 CAST(count(*) AS BIGINT),
                 CAST(count(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                            THEN 1 END) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'lineitem.l_quantity range_1_50',
                 CAST(count(*) AS BIGINT),
                 CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50
                            THEN 1 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'lineitem.ship_after_order',
                 CAST(count(*) AS BIGINT),
                 CAST(count(CASE WHEN l_shipdate < o_orderdate
                            THEN 1 END) AS BIGINT)
          FROM lineitem l2 JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
          UNION ALL
          SELECT 'lineitem.l_discount range_0_0.1',
                 CAST(count(*) AS BIGINT),
                 CAST(count(CASE WHEN l_discount < 0 OR l_discount > 0.1
                            THEN 1 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'orders.o_orderkey unique',
                 CAST(count(*) AS BIGINT),
                 CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'orders.o_custkey fk_customer',
                 CAST(count(*) AS BIGINT),
                 CAST(count(CASE WHEN c.c_custkey IS NULL THEN 1 END)
                      AS BIGINT)
          FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          UNION ALL
          SELECT 'lineitem.l_orderkey fk_orders',
                 CAST(count(*) AS BIGINT),
                 CAST(count(CASE WHEN o.o_orderkey IS NULL THEN 1 END)
                      AS BIGINT)
          FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT rule, n_checked, n_failed,
               floor(CAST(n_failed AS DOUBLE) / n_checked * 10000 + 0.5)
                 / 10000 AS fail_rate
        FROM checks ORDER BY rule
    """,
    "q_raking": """
        WITH cells AS (
          SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
                 count(*) AS cnt
          FROM customer GROUP BY 1, 2
        ),
        step1 AS (
          SELECT nationkey, segment, cnt,
                 CAST(sum(cnt) OVER () AS BIGINT) AS tot,
                 CAST(floor((sum(cnt) OVER () / 25)
                            / sum(cnt) OVER (PARTITION BY nationkey)
                            * 1000000 + 0.5) AS BIGINT) AS w1u
          FROM cells
        ),
        step2 AS (
          SELECT nationkey, segment, cnt, tot,
                 CAST(floor(w1u * ((tot * 1000000 / 5)
                        / sum(cnt * w1u) OVER (PARTITION BY segment))
                      + 0.5) AS BIGINT) AS wu
          FROM step1
        ),
        resid AS (
          SELECT floor(max(e) / 1000000 * 10000 + 0.5) / 10000
                   AS max_row_err
          FROM (
            SELECT abs(sum(cnt * wu) - max(tot * 1000000 / 25)) AS e
            FROM step2 GROUP BY nationkey
          )
        )
        SELECT t.nationkey, t.segment, t.cnt,
               floor(t.wu / 1000000 * 10000 + 0.5) / 10000 AS weight,
               r.max_row_err
        FROM (SELECT * FROM step2
              ORDER BY floor(wu / 1000000 * 10000 + 0.5) / 10000 DESC,
                       nationkey, segment
              LIMIT 10) t, resid r
        ORDER BY weight DESC, t.nationkey, t.segment
    """,
    "q_fulfillment_lag": """
        WITH last AS (
          SELECT l_orderkey, max(l_shipdate) AS last_ship
          FROM lineitem GROUP BY 1
        ),
        lag AS (
          SELECT o.o_orderpriority,
                 (epoch_us(l.last_ship) - epoch_us(o.o_orderdate))
                   // 86400000000 AS lag_days
          FROM orders o JOIN last l ON l.l_orderkey = o.o_orderkey
        )
        SELECT o_orderpriority AS priority,
               count(*) AS n_orders,
               floor(quantile_cont(lag_days, 0.5) * 10000 + 0.5)
                 / 10000 AS p50_days,
               floor(quantile_cont(lag_days, 0.9) * 10000 + 0.5)
                 / 10000 AS p90_days,
               max(lag_days) AS max_days
        FROM lag GROUP BY 1 ORDER BY priority
    """,
    "q_calibration_bins": """
        WITH bins AS (
          SELECT least(CAST(floor(l_discount * 10 * 10) AS INT), 9)
                   AS bin,
                 count(*) AS n,
                 sum(CAST(l_discount * 10 AS DECIMAL(18,2))) AS ssum,
                 CAST(count(CASE WHEN l_returnflag = 'R' THEN 1 END)
                      AS BIGINT) AS pos
          FROM lineitem GROUP BY 1
        ),
        e AS (
          SELECT floor(sum(n * abs(CAST(ssum AS DOUBLE) / n
                                   - CAST(pos AS DOUBLE) / n))
                       / sum(n) * 10000 + 0.5) / 10000 AS ece
          FROM bins
        )
        SELECT b.bin, b.n,
               floor(CAST(b.ssum AS DOUBLE) / b.n * 10000 + 0.5)
                 / 10000 AS mean_score,
               floor(CAST(b.pos AS DOUBLE) / b.n * 10000 + 0.5)
                 / 10000 AS obs_rate,
               e.ece
        FROM bins b, e
        ORDER BY b.bin
    """,
    "q_abc_classification": """
        WITH cat AS (
          SELECT p_brand, p_type,
                 CAST(sum(CAST(floor(
                   l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5
                 ) AS BIGINT)) AS BIGINT) AS rev6
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand, p_type
        ),
        tot AS (SELECT CAST(sum(rev6) AS BIGINT) AS total6 FROM cat),
        classed AS (
          SELECT p_brand, p_type, rev6, total6,
                 CAST(sum(rev6) OVER (
                   ORDER BY rev6 DESC, p_brand, p_type
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum6
          FROM cat CROSS JOIN tot
        )
        SELECT CASE WHEN cum6 * 5 <= total6 * 4 THEN 'A'
                    WHEN cum6 * 20 <= total6 * 19 THEN 'B'
                    ELSE 'C' END AS abc_class,
               count(*) AS n_categories,
               floor(CAST(sum(rev6) AS DOUBLE) / CAST(max(total6) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS rev_share
        FROM classed
        GROUP BY 1 ORDER BY abc_class
    """,
    "q_sla_aging": """
        WITH d AS (
          SELECT o_orderpriority AS priority,
                 date_diff('day', o_orderdate, l_shipdate) AS days
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        per AS (
          SELECT priority,
                 CASE WHEN days <= 7 THEN 'a_0_7'
                      WHEN days <= 30 THEN 'b_8_30'
                      WHEN days <= 90 THEN 'c_31_90'
                      ELSE 'd_90_plus' END AS band,
                 CAST(count(*) AS BIGINT) AS n
          FROM d GROUP BY 1, 2
        ),
        tot AS (
          SELECT priority, CAST(sum(n) AS BIGINT) AS nt
          FROM per GROUP BY priority
        )
        SELECT per.priority AS priority, band, n,
               floor(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS share
        FROM per JOIN tot ON per.priority = tot.priority
        ORDER BY priority, band
    """,
    "q_mde_power": """
        WITH e AS (
          SELECT CAST(user_id % 2 AS INT) AS arm,
                 CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vi
          FROM events
        ),
        arms AS (
          SELECT arm, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(vi) AS BIGINT) AS s1,
                 sum(CAST(vi AS HUGEINT) * vi) AS s2
          FROM e GROUP BY arm
        ),
        one AS (
          SELECT
            max(CASE WHEN arm = 0 THEN n END) AS n_a,
            max(CASE WHEN arm = 1 THEN n END) AS n_b,
            max(CASE WHEN arm = 0 THEN s1 END) AS s1_a,
            max(CASE WHEN arm = 1 THEN s1 END) AS s1_b,
            max(CASE WHEN arm = 0 THEN s2 END) AS s2_a,
            max(CASE WHEN arm = 1 THEN s2 END) AS s2_b
          FROM arms
        ),
        v AS (
          SELECT n_a, n_b, s1_a,
                 (CAST(CAST(n_a AS HUGEINT) * s2_a
                       - CAST(s1_a AS HUGEINT) * s1_a AS DOUBLE)
                    / CAST(n_a AS DOUBLE)
                  + CAST(CAST(n_b AS HUGEINT) * s2_b
                         - CAST(s1_b AS HUGEINT) * s1_b AS DOUBLE)
                    / CAST(n_b AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0)
                 / 1.0e8 AS var_pooled
          FROM one
        )
        SELECT n_a, n_b,
               floor(sqrt(var_pooled) * 10000 + 0.5) / 10000
                 AS sd_pooled,
               floor(2.8015852181129683
                     * sqrt(var_pooled * (1.0 / CAST(n_a AS DOUBLE)
                                          + 1.0 / CAST(n_b AS DOUBLE)))
                     * 10000 + 0.5) / 10000 AS mde_abs,
               floor(2.8015852181129683
                     * sqrt(var_pooled * (1.0 / CAST(n_a AS DOUBLE)
                                          + 1.0 / CAST(n_b AS DOUBLE)))
                     / (CAST(s1_a AS DOUBLE) / 10000.0
                        / CAST(n_a AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS mde_rel
        FROM v
    """,
    "q_psi_drift": """
        WITH e AS (
          SELECT epoch_us(ts) AS tsn,
                 least(CAST(floor(value / 50.0) AS INT), 9) AS bin
          FROM events
        ),
        b AS (SELECT (min(tsn) + max(tsn)) // 2 AS mid FROM e),
        cnt AS (
          SELECT bin,
                 count(CASE WHEN tsn < mid THEN 1 END) AS n_a,
                 count(CASE WHEN tsn >= mid THEN 1 END) AS n_b
          FROM e, b GROUP BY bin
        ),
        tot AS (
          SELECT CAST(sum(n_a) AS BIGINT) AS ta,
                 CAST(sum(n_b) AS BIGINT) AS tb
          FROM cnt
        )
        SELECT bin, CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               floor((CAST(n_a + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE)
                      - CAST(n_b + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE))
                     * ln((CAST(n_a + 1 AS DOUBLE)
                             / CAST(ta + 10 AS DOUBLE))
                          / (CAST(n_b + 1 AS DOUBLE)
                             / CAST(tb + 10 AS DOUBLE)))
                     * 10000 + 0.5) / 10000 AS psi_term
        FROM cnt, tot ORDER BY bin
    """,
    "q_diff_in_diff": """
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS tsn,
                 CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vi
          FROM events
        ),
        b AS (SELECT (min(tsn) + max(tsn)) // 2 AS mid FROM e),
        cells AS (
          SELECT CAST(user_id % 2 AS INT) AS arm,
                 CASE WHEN tsn < mid THEN 'pre' ELSE 'post' END AS period,
                 count(*) AS n, CAST(sum(vi) AS BIGINT) AS s
          FROM e, b GROUP BY 1, 2
        ),
        one AS (
          SELECT
            max(CASE WHEN arm = 0 AND period = 'pre' THEN n END) AS n_c_pre,
            max(CASE WHEN arm = 0 AND period = 'post' THEN n END) AS n_c_post,
            max(CASE WHEN arm = 1 AND period = 'pre' THEN n END) AS n_t_pre,
            max(CASE WHEN arm = 1 AND period = 'post' THEN n END) AS n_t_post,
            max(CASE WHEN arm = 0 AND period = 'pre' THEN s END) AS s_c_pre,
            max(CASE WHEN arm = 0 AND period = 'post' THEN s END) AS s_c_post,
            max(CASE WHEN arm = 1 AND period = 'pre' THEN s END) AS s_t_pre,
            max(CASE WHEN arm = 1 AND period = 'post' THEN s END) AS s_t_post
          FROM cells
        )
        SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
               floor(CAST(s_c_pre AS DOUBLE) / 10000.0
                     / CAST(n_c_pre AS DOUBLE) * 10000 + 0.5) / 10000
                 AS m_c_pre,
               floor(CAST(s_c_post AS DOUBLE) / 10000.0
                     / CAST(n_c_post AS DOUBLE) * 10000 + 0.5) / 10000
                 AS m_c_post,
               floor(CAST(s_t_pre AS DOUBLE) / 10000.0
                     / CAST(n_t_pre AS DOUBLE) * 10000 + 0.5) / 10000
                 AS m_t_pre,
               floor(CAST(s_t_post AS DOUBLE) / 10000.0
                     / CAST(n_t_post AS DOUBLE) * 10000 + 0.5) / 10000
                 AS m_t_post,
               floor(((CAST(s_t_post AS DOUBLE) / 10000.0
                         / CAST(n_t_post AS DOUBLE)
                       - CAST(s_t_pre AS DOUBLE) / 10000.0
                         / CAST(n_t_pre AS DOUBLE))
                      - (CAST(s_c_post AS DOUBLE) / 10000.0
                           / CAST(n_c_post AS DOUBLE)
                         - CAST(s_c_pre AS DOUBLE) / 10000.0
                           / CAST(n_c_pre AS DOUBLE)))
                     * 10000 + 0.5) / 10000 AS did
        FROM one
    """,
    "q_hhi_concentration": """
        WITH cents AS (
          SELECT n_regionkey, c_nationkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) * 100
                      AS BIGINT) AS cents
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_regionkey, c_nationkey
        ),
        per AS (
          SELECT n_regionkey,
                 CAST(count(*) AS BIGINT) AS n_nations,
                 CAST(sum(cents) AS BIGINT) AS tot,
                 sum(CAST(cents AS HUGEINT) * cents) AS sumsq,
                 CAST(max(cents) AS BIGINT) AS top
          FROM cents GROUP BY n_regionkey
        )
        SELECT r_name AS region, n_nations,
               floor(CAST(sumsq AS DOUBLE)
                     / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS hhi,
               floor(CAST(top AS DOUBLE) / CAST(tot AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS top_share
        FROM per JOIN region ON r_regionkey = n_regionkey
        ORDER BY region
    """,
    "q_apportionment": """
        WITH rev AS (
          SELECT c_nationkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) * 100
                      AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_nationkey
        ),
        t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM rev),
        f AS (
          SELECT c_nationkey, cents,
                 CAST((cents * 1000) // total AS BIGINT) AS floor_seats,
                 CAST((cents * 1000) % total AS BIGINT) AS rem
          FROM rev, t
        ),
        u AS (SELECT CAST(sum(floor_seats) AS BIGINT) AS used FROM f),
        r AS (
          SELECT f.*, used,
                 row_number() OVER (ORDER BY rem DESC, c_nationkey) AS rn
          FROM f, u
        )
        SELECT n_name AS nation, cents AS rev_cents, floor_seats,
               CAST(floor_seats
                    + CASE WHEN rn <= 1000 - used THEN 1 ELSE 0 END
                    AS BIGINT) AS seats
        FROM r JOIN nation ON n_nationkey = c_nationkey
        ORDER BY seats DESC, nation
    """,
    "q_rank_movers": """
        WITH rev AS (
          SELECT n_name AS nation,
                 strftime(o_orderdate, '%Y-%m') AS month,
                 sum(CAST(o_totalprice AS DECIMAL(20,6))) AS rev
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON n_nationkey = c_nationkey
          GROUP BY n_name, strftime(o_orderdate, '%Y-%m')
        ),
        r1 AS (
          SELECT month, nation,
                 row_number() OVER (
                   PARTITION BY month ORDER BY rev DESC, nation
                 ) AS rnk
          FROM rev
        ),
        r AS (
          SELECT month, nation, rnk,
                 lag(rnk) OVER (
                   PARTITION BY nation ORDER BY month
                 ) AS prev_rnk
          FROM r1
        )
        SELECT month, nation, CAST(rnk AS BIGINT) AS rnk,
               CAST(prev_rnk AS BIGINT) AS prev_rnk,
               CAST(prev_rnk - rnk AS BIGINT) AS delta
        FROM r WHERE prev_rnk IS NOT NULL
        ORDER BY abs(prev_rnk - rnk) DESC, month, nation
        LIMIT 15
    """,
    "q_poisson_bootstrap": f"""
        WITH rep AS (
          SELECT event_type, b, value,
                 ('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#'
                                     || CAST(b AS VARCHAR)), 1, 15))::BIGINT
                   / 1152921504606846976.0 AS u
          FROM events
          CROSS JOIN (SELECT unnest(generate_series(0, 199)) AS b) bs
        ),
        wt AS (SELECT event_type, b, value, {_POIS_CASE_SQL} AS w FROM rep),
        m AS (
          SELECT event_type, b,
                 CAST(sum(w * CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS s,
                 CAST(sum(w) AS BIGINT) AS n
          FROM wt GROUP BY event_type, b
        ),
        mm AS (
          SELECT event_type, b, s / CAST(n AS DOUBLE) AS mean_b
          FROM m WHERE n > 0
        ),
        r AS (
          SELECT event_type, mean_b,
                 row_number() OVER (
                   PARTITION BY event_type ORDER BY mean_b, b
                 ) AS rn
          FROM mm
        ),
        ci AS (
          SELECT event_type,
                 max(CASE WHEN rn = 5 THEN mean_b END) AS lo,
                 max(CASE WHEN rn = 196 THEN mean_b END) AS hi
          FROM r GROUP BY event_type
        ),
        pt AS (
          SELECT event_type, count(*) AS n_events,
                 CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS mean_v
          FROM events GROUP BY event_type
        )
        SELECT pt.event_type, CAST(n_events AS BIGINT) AS n_events,
               floor(mean_v * 10000 + 0.5) / 10000 AS mean_value,
               floor(lo * 10000 + 0.5) / 10000 AS ci_lo,
               floor(hi * 10000 + 0.5) / 10000 AS ci_hi
        FROM pt JOIN ci USING (event_type)
        ORDER BY event_type
    """,
    "q_decile_lift": """
        WITH pu AS (
          SELECT user_id, count(*) AS score,
                 count(CASE WHEN event_type = 'purchase' THEN 1 END) AS pc
          FROM events GROUP BY user_id
        ),
        gt AS (SELECT count(*) AS nu, sum(pc) AS tp FROM pu),
        pc AS (
          SELECT score,
                 CASE WHEN pc * nu > tp THEN 1 ELSE 0 END AS conv
          FROM pu, gt
        ),
        b AS (
          SELECT floor(quantile_cont(score, 0.1) * 10000 + 0.5) / 10000 AS b0,
                 floor(quantile_cont(score, 0.2) * 10000 + 0.5) / 10000 AS b1,
                 floor(quantile_cont(score, 0.3) * 10000 + 0.5) / 10000 AS b2,
                 floor(quantile_cont(score, 0.4) * 10000 + 0.5) / 10000 AS b3,
                 floor(quantile_cont(score, 0.5) * 10000 + 0.5) / 10000 AS b4,
                 floor(quantile_cont(score, 0.6) * 10000 + 0.5) / 10000 AS b5,
                 floor(quantile_cont(score, 0.7) * 10000 + 0.5) / 10000 AS b6,
                 floor(quantile_cont(score, 0.8) * 10000 + 0.5) / 10000 AS b7,
                 floor(quantile_cont(score, 0.9) * 10000 + 0.5) / 10000 AS b8
          FROM pu
        ),
        per AS (
          SELECT 1 + (CASE WHEN score > b0 THEN 1 ELSE 0 END)
                   + (CASE WHEN score > b1 THEN 1 ELSE 0 END)
                   + (CASE WHEN score > b2 THEN 1 ELSE 0 END)
                   + (CASE WHEN score > b3 THEN 1 ELSE 0 END)
                   + (CASE WHEN score > b4 THEN 1 ELSE 0 END)
                   + (CASE WHEN score > b5 THEN 1 ELSE 0 END)
                   + (CASE WHEN score > b6 THEN 1 ELSE 0 END)
                   + (CASE WHEN score > b7 THEN 1 ELSE 0 END)
                   + (CASE WHEN score > b8 THEN 1 ELSE 0 END) AS decile,
                 count(*) AS n_users,
                 count(CASE WHEN conv = 1 THEN 1 END) AS n_conv
          FROM pc, b
          GROUP BY 1
        ),
        tot AS (SELECT sum(n_users) AS tu, sum(n_conv) AS tc FROM per)
        SELECT decile, n_users, n_conv,
               floor(CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS conv_rate,
               floor((CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
                     / (CAST(tc AS DOUBLE) / CAST(tu AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS lift
        FROM per, tot
        ORDER BY decile
    """,
    "q_cuped": """
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS tsn,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vi
          FROM events
        ),
        b AS (SELECT (min(tsn) + max(tsn)) // 2 AS mid FROM e),
        pu AS (
          SELECT user_id,
                 count(CASE WHEN tsn < mid THEN 1 END) AS x,
                 coalesce(sum(CASE WHEN tsn >= mid THEN vi END), 0) AS y,
                 CAST(user_id % 2 AS INT) AS arm
          FROM e, b GROUP BY user_id
        ),
        st AS (
          SELECT count(*) AS nu, sum(x) AS sx,
                 sum(CAST(x AS HUGEINT) * x) AS sxx,
                 sum(CAST(y AS HUGEINT)) AS sy,
                 sum(CAST(x AS HUGEINT) * y) AS sxy,
                 sum(CAST(y AS HUGEINT) * y) AS syy
          FROM pu
        ),
        arms AS (
          SELECT arm, count(*) AS na, sum(x) AS sxa,
                 sum(CAST(y AS HUGEINT)) AS sya
          FROM pu GROUP BY arm
        ),
        calc AS (
          SELECT arm, na, sxa, sya, nu, sx,
                 CAST(nu AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
                 CAST(nu AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
                 CAST(nu AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
          FROM arms, st
        ),
        th AS (
          SELECT arm, na, sxa, sya, nu, sx, varx, vary,
                 CASE WHEN varx > 0 THEN cov / varx ELSE 0.0 END AS theta
          FROM calc
        )
        SELECT arm, na AS n_users,
               floor(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) / 10000.0
                     * 10000 + 0.5) / 10000 AS mean_y,
               floor((CAST(sya AS DOUBLE)
                      - theta * (CAST(sxa AS DOUBLE)
                                 - CAST(na AS DOUBLE)
                                   * (CAST(sx AS DOUBLE)
                                      / CAST(nu AS DOUBLE))))
                     / CAST(na AS DOUBLE) / 10000.0
                     * 10000 + 0.5) / 10000 AS mean_y_adj,
               floor(theta / 10000.0 * 10000 + 0.5) / 10000 AS theta,
               floor(CASE WHEN vary > 0
                          THEN theta * theta * varx / vary
                          ELSE 0.0 END * 10000 + 0.5) / 10000
                 AS var_reduction
        FROM th
        ORDER BY arm
    """,
    "q_srm_check": """
        WITH u AS (SELECT DISTINCT user_id FROM events),
        a AS (
          SELECT count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n0,
                 count(CASE WHEN user_id % 2 = 1 THEN 1 END) AS n1
          FROM u
        )
        SELECT n0 AS n_arm0, n1 AS n_arm1,
               floor(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                     / CAST(n0 + n1 AS DOUBLE) * 10000 + 0.5) / 10000
                 AS chi2,
               CASE WHEN CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                         / CAST(n0 + n1 AS DOUBLE) > 3.841
                    THEN 1 ELSE 0 END AS srm_flag
        FROM a
    """,
    "q_cramers_v": """
        WITH t AS (SELECT count(*) AS n FROM documents),
        joint AS (
          SELECT lang, source, count(*) AS cxy
          FROM documents GROUP BY lang, source
        ),
        mlang AS (SELECT lang, count(*) AS cx FROM documents GROUP BY lang),
        msrc AS (
          SELECT source, count(*) AS cy FROM documents GROUP BY source
        ),
        dims AS (
          SELECT (SELECT count(*) FROM mlang) AS r,
                 (SELECT count(*) FROM msrc) AS c
        ),
        phi AS (
          SELECT sum(CAST(cxy * cxy AS DOUBLE)
                     / CAST(cx * cy AS DOUBLE)) AS phi_sum
          FROM joint JOIN mlang USING (lang) JOIN msrc USING (source)
        )
        SELECT CAST(n AS BIGINT) AS n_docs, r AS n_langs, c AS n_sources,
               floor(CAST(n AS DOUBLE) * (phi_sum - 1.0) * 10000 + 0.5)
                 / 10000 AS chi2,
               floor(sqrt(CAST(n AS DOUBLE) * (phi_sum - 1.0)
                          / (CAST(n AS DOUBLE)
                             * CAST(least(r, c) - 1 AS DOUBLE)))
                     * 10000 + 0.5) / 10000 AS cramers_v
        FROM phi, t, dims
    """,
    "q_segment_overlap": """
        WITH m AS (SELECT DISTINCT event_type, user_id FROM events),
        sizes AS (
          SELECT event_type, count(*) AS n FROM m GROUP BY event_type
        ),
        inter AS (
          SELECT a.event_type AS t1, b.event_type AS t2,
                 count(*) AS n_both
          FROM m a JOIN m b USING (user_id)
          WHERE a.event_type < b.event_type
          GROUP BY t1, t2
        )
        SELECT t1, t2, s1.n AS n1, s2.n AS n2, n_both,
               floor(CAST(n_both AS DOUBLE)
                       / CAST(s1.n + s2.n - n_both AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.event_type = t1
        JOIN sizes s2 ON s2.event_type = t2
        ORDER BY t1, t2
    """,
    "q_gini_inequality": """
        WITH rev AS (
          SELECT o_custkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DECIMAL(18,2)) AS rev
          FROM orders GROUP BY o_custkey
        ),
        j AS (
          SELECT n_name, o_custkey, rev
          FROM rev
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        ),
        ranked AS (
          SELECT n_name, rev,
                 row_number() OVER (PARTITION BY n_name
                                    ORDER BY rev, o_custkey) AS i
          FROM j
        ),
        g AS (
          SELECT n_name, count(*) AS n_customers,
                 sum(rev) AS s, sum(i * rev) AS t
          FROM ranked GROUP BY n_name
        )
        SELECT n_name,
               n_customers,
               floor(CAST(s AS DOUBLE) * 10000 + 0.5) / 10000 AS total_rev,
               floor((2.0 * CAST(t AS DOUBLE)
                        / (CAST(n_customers AS DOUBLE) * CAST(s AS DOUBLE))
                      - (CAST(n_customers AS DOUBLE) + 1.0)
                        / CAST(n_customers AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS gini
        FROM g ORDER BY n_name
    """,
    "q_conversion_ci": """
        WITH per AS (
          SELECT user_id % 7 AS seg,
                 count(DISTINCT user_id) AS n_users,
                 count(DISTINCT CASE WHEN event_type = 'purchase'
                                     THEN user_id END) AS n_converted
          FROM events GROUP BY 1
        ),
        w AS (
          SELECT seg, n_users, n_converted,
                 CAST(n_users AS DOUBLE) AS n,
                 n_converted / CAST(n_users AS DOUBLE) AS p
          FROM per
        ),
        c AS (
          SELECT *,
                 (p + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (2.0 * n))
                   / (1.0 + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / n) AS center,
                 CAST(1.96 AS DOUBLE)
                   * sqrt(p * (1.0 - p) / n
                          + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (4.0 * n * n))
                   / (1.0 + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / n) AS half
          FROM w
        )
        SELECT seg, n_users, n_converted,
               floor(p * 10000 + 0.5) / 10000 AS rate,
               floor((center - half) * 10000 + 0.5) / 10000 AS ci_lo,
               floor((center + half) * 10000 + 0.5) / 10000 AS ci_hi
        FROM c ORDER BY seg
    """,
    "q_market_basket": """
        WITH li AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
        ),
        pairs AS (
          SELECT a.p AS p1, b.p AS p2, count(*) AS n_ab
          FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
          GROUP BY a.p, b.p
          HAVING count(*) >= 3
        ),
        marg AS (SELECT p, count(*) AS n FROM li GROUP BY p)
        SELECT p1, p2, n_ab,
               floor(n_ab / sqrt(CAST(ma.n AS DOUBLE) * mb.n)
                     * 10000 + 0.5) / 10000 AS cosine
        FROM pairs
        JOIN marg ma ON ma.p = p1
        JOIN marg mb ON mb.p = p2
        ORDER BY cosine DESC, n_ab DESC, p1, p2 LIMIT 20
    """,
    "q_customer_rfm": """
        WITH base AS (
          SELECT o_custkey,
                 min(datediff('day', o_orderdate,
                     TIMESTAMP '2001-08-01 00:00:00')) AS recency,
                 count(*) AS frequency,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
                   AS monetary
          FROM orders GROUP BY o_custkey
        ),
        b AS (
          SELECT
            floor(quantile_cont(recency, 0.2) * 10000 + 0.5) / 10000 AS rb0,
            floor(quantile_cont(recency, 0.4) * 10000 + 0.5) / 10000 AS rb1,
            floor(quantile_cont(recency, 0.6) * 10000 + 0.5) / 10000 AS rb2,
            floor(quantile_cont(recency, 0.8) * 10000 + 0.5) / 10000 AS rb3,
            floor(quantile_cont(frequency, 0.2) * 10000 + 0.5) / 10000 AS fb0,
            floor(quantile_cont(frequency, 0.4) * 10000 + 0.5) / 10000 AS fb1,
            floor(quantile_cont(frequency, 0.6) * 10000 + 0.5) / 10000 AS fb2,
            floor(quantile_cont(frequency, 0.8) * 10000 + 0.5) / 10000 AS fb3,
            floor(quantile_cont(monetary, 0.2) * 10000 + 0.5) / 10000 AS mb0,
            floor(quantile_cont(monetary, 0.4) * 10000 + 0.5) / 10000 AS mb1,
            floor(quantile_cont(monetary, 0.6) * 10000 + 0.5) / 10000 AS mb2,
            floor(quantile_cont(monetary, 0.8) * 10000 + 0.5) / 10000 AS mb3
          FROM base
        )
        SELECT 6 - (1 + CASE WHEN recency > rb0 THEN 1 ELSE 0 END
                      + CASE WHEN recency > rb1 THEN 1 ELSE 0 END
                      + CASE WHEN recency > rb2 THEN 1 ELSE 0 END
                      + CASE WHEN recency > rb3 THEN 1 ELSE 0 END)
                 AS r_score,
               1 + CASE WHEN frequency > fb0 THEN 1 ELSE 0 END
                 + CASE WHEN frequency > fb1 THEN 1 ELSE 0 END
                 + CASE WHEN frequency > fb2 THEN 1 ELSE 0 END
                 + CASE WHEN frequency > fb3 THEN 1 ELSE 0 END AS f_score,
               1 + CASE WHEN monetary > mb0 THEN 1 ELSE 0 END
                 + CASE WHEN monetary > mb1 THEN 1 ELSE 0 END
                 + CASE WHEN monetary > mb2 THEN 1 ELSE 0 END
                 + CASE WHEN monetary > mb3 THEN 1 ELSE 0 END AS m_score,
               count(*) AS n_customers
        FROM base, b
        GROUP BY r_score, f_score, m_score
    """,
    "q_brand_rank_movers": """
        WITH rev AS (
          SELECT p_brand AS brand,
                 strftime(date_trunc('month', l_shipdate), '%Y-%m')
                   AS month,
                 CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6)))
                      AS DECIMAL(22,6)) * 100 AS BIGINT) AS cents
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2
        ),
        m2 AS (SELECT max(month) AS m2 FROM rev),
        m1 AS (
          SELECT max(month) AS m1 FROM rev, m2 WHERE month < m2.m2
        ),
        ranked AS (
          SELECT brand, month,
                 row_number() OVER (
                   PARTITION BY month ORDER BY cents DESC, brand
                 ) AS rk
          FROM rev, m1, m2 WHERE month = m1.m1 OR month = m2.m2
        ),
        prev AS (
          SELECT brand, rk AS rank_prev FROM ranked, m1
          WHERE month = m1.m1
        ),
        curr AS (
          SELECT brand, rk AS rank_curr FROM ranked, m2
          WHERE month = m2.m2
        )
        SELECT p.brand, rank_prev, rank_curr,
               CAST(rank_prev - rank_curr AS INTEGER) AS delta
        FROM prev p JOIN curr c ON p.brand = c.brand
        ORDER BY delta DESC, p.brand
        LIMIT 10
    """,
    "q_revenue_mom_growth": """
        WITH m AS (
          SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
                   AS revenue
          FROM orders GROUP BY month
        )
        SELECT month,
               floor(revenue * 10000 + 0.5) / 10000 AS revenue,
               floor((revenue - lag(revenue) OVER (ORDER BY month))
                     / lag(revenue) OVER (ORDER BY month) * 100.0
                     * 10000 + 0.5) / 10000 AS mom_pct
        FROM m
    """,
    "q_dow_seasonality": """
        WITH t AS (SELECT count(*) AS n_total FROM events)
        SELECT strftime(ts, '%a') AS dow, event_type, count(*) AS cnt,
               floor(CAST(count(*) AS DOUBLE) / n_total * 100.0
                     * 10000 + 0.5) / 10000 AS pct
        FROM events, t
        GROUP BY dow, event_type, n_total
    """,
    "q_revenue_concentration": """
        WITH base AS (
          SELECT o_custkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
                   AS monetary
          FROM orders GROUP BY o_custkey
        ),
        b AS (
          SELECT
            floor(quantile_cont(monetary, 0.1) * 10000 + 0.5) / 10000 AS b0,
            floor(quantile_cont(monetary, 0.2) * 10000 + 0.5) / 10000 AS b1,
            floor(quantile_cont(monetary, 0.3) * 10000 + 0.5) / 10000 AS b2,
            floor(quantile_cont(monetary, 0.4) * 10000 + 0.5) / 10000 AS b3,
            floor(quantile_cont(monetary, 0.5) * 10000 + 0.5) / 10000 AS b4,
            floor(quantile_cont(monetary, 0.6) * 10000 + 0.5) / 10000 AS b5,
            floor(quantile_cont(monetary, 0.7) * 10000 + 0.5) / 10000 AS b6,
            floor(quantile_cont(monetary, 0.8) * 10000 + 0.5) / 10000 AS b7,
            floor(quantile_cont(monetary, 0.9) * 10000 + 0.5) / 10000 AS b8
          FROM base
        ),
        t AS (
          SELECT CAST(sum(CAST(monetary AS DECIMAL(24,6))) AS DOUBLE)
            AS grand FROM base
        ),
        d AS (
          SELECT 1 + CASE WHEN monetary > b0 THEN 1 ELSE 0 END
                   + CASE WHEN monetary > b1 THEN 1 ELSE 0 END
                   + CASE WHEN monetary > b2 THEN 1 ELSE 0 END
                   + CASE WHEN monetary > b3 THEN 1 ELSE 0 END
                   + CASE WHEN monetary > b4 THEN 1 ELSE 0 END
                   + CASE WHEN monetary > b5 THEN 1 ELSE 0 END
                   + CASE WHEN monetary > b6 THEN 1 ELSE 0 END
                   + CASE WHEN monetary > b7 THEN 1 ELSE 0 END
                   + CASE WHEN monetary > b8 THEN 1 ELSE 0 END AS decile,
                 monetary
          FROM base, b
        )
        SELECT decile, count(*) AS n_customers,
               floor(CAST(sum(CAST(monetary AS DECIMAL(24,6))) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS revenue,
               floor(CAST(sum(CAST(monetary AS DECIMAL(24,6))) AS DOUBLE)
                     / grand * 100.0 * 10000 + 0.5) / 10000 AS rev_pct
        FROM d, t
        GROUP BY decile, grand
    """,
}
