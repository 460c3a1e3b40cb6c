"""All 22 TPC-H query shapes (adapted to the partsupp-less schema).

Registry family module — split from the single-file registry; each
family defines its ``q_*`` callables plus the matching ``ORACLES``
entries, aggregated in ``__init__``."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.functions import text
from data_wrangle_openstreetmaps_data_spark.operators import (
    dedup,
)

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403



def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) adapted to the testdata schema —
    the canonical scan-heavy aggregate; exact decimal arithmetic.

    Money sums use the µ-UNIT BIGINT form (r13): sum exact integer
    micro-units, then ONE int64→double conversion + one division —
    both correctly-rounded IEEE ops on identical inputs in both
    engines. The direct decimal-sum→DOUBLE cast diverged by 1 ulp at
    sf1 (sum_charge ≈ 2.8e10: DuckDB's int128-scaled DECIMAL→DOUBLE
    double-rounds where Spark's BigDecimal.doubleValue is correctly
    rounded) — the first scale-only value bug the sf1 oracle sweep
    caught.

    Per-row µ-units come from the FLOOR trick (r14, the round4
    discipline): floor(x·1e6 + 0.5) stays inside whole-stage codegen as
    primitive double/long ops, where the cast-to-DECIMAL(20,6) route
    allocated two BigDecimals per row per column (8/row total). On
    this data the two are value-IDENTICAL: every input sits on a
    2/4/6-dp grid with |x| ≤ ~1.2e5, so x·1e6 is within ~1e-5 of the
    grid integer — never near a .5 tie — and both engines' double→
    decimal casts land on the same grid point. Machine-checked, not
    assumed: scripts/ab_q1_forms.py collects the decimal and floor
    forms and asserts exact equality at sf0.001/0.01/0.1 and the
    .tmp/sf1 ladder (A/B at sf0.1: 1.14 → 0.44 s best-of-4). The avgs
    use the same µ-unit sums (round4(Σµ/1e6/count) ≡ the decimal-sum
    average on the same grid argument, same 4-SF equality check)."""
    li = table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def _mu(c):
        return F.sum(F.floor(c * 1000000 + F.lit(0.5)).cast("long"))

    def _mu_sum(c):
        return _mu(c) / F.lit(1000000.0)

    out = (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _mu_sum(F.col("l_quantity")).alias("sum_qty"),
            _mu_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _mu_sum(disc_price).alias("sum_disc_price"),
            _mu_sum(charge).alias("sum_charge"),
            text.round4(
                _mu(F.col("l_quantity"))
                / F.lit(1000000.0)
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            text.round4(
                _mu(F.col("l_discount"))
                / F.lit(1000000.0)
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out


def q_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): selective join + top-10 by revenue."""
    cust = table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf, "orders").filter(
        F.col("o_orderdate") < _ts("1995-03-15")
    )
    li = table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > _ts("1995-03-15")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec_sum(revenue).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-way join, broadcast dims."""
    region = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf, "nation")
    cust = table(spark, sf, "customer")
    supp = table(spark, sf, "supplier")
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = table(spark, sf, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(_dec_sum(revenue).alias("revenue"))
    )


def q_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue): pure pushdown-filter aggregate."""
    li = table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            )
        )
    )


def q_tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 (order priority checking) adapted to the testdata schema:
    orders in a quarter with at least one late-shipped line (shipdate more
    than 60 days after the order date — the testdata has no commit/receipt
    dates). The EXISTS becomes a LEFT SEMI join: equi on the order key so it
    shuffles (or broadcasts) hash-partitioned, with the non-equi lateness
    predicate evaluated inside the join — no row explosion, no distinct."""
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): promo revenue share over one month.
    Part is a broadcast dim; the single aggregate row carries two decimal
    sums, so the fact scan never shuffles."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    part = table(spark, sf, "part").select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            text.round4(
                F.lit(100.0) * _dec_sum(promo) / _dec_sum(disc_price)
            ).alias("promo_revenue_pct")
        )
    )


def q_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 300. The HAVING runs as a partial+final hash aggregate on the
    fact table BEFORE any join, so only the ~0.3% qualifying order keys
    survive; that tiny aggregated side carries an explicit broadcast hint
    so orders/customer never shuffle regardless of their absolute size —
    the direction that still holds when orders is 100 TB."""
    li = table(spark, sf, "lineitem")
    big = F.broadcast(
        li.groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three
    brand/size/quantity bands OR-ed together across the part join. The
    equi key join stays a single broadcast hash join; the disjunction is
    a post-join filter inside whole-stage codegen — no union-of-three-scans
    rewrite needed."""
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(band)
        .agg(_dec_sum(revenue).alias("revenue"))
    )


def q_tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations): the fact table
    shuffles exactly once (lineitem⋈orders on the order key); supplier,
    customer, and both nation sides ride broadcasts, so the two-nation
    pair filter prunes early on broadcast-joined columns."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n1 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_dec_sum(revenue).alias("revenue"))
    )


def q_tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 (national market share): share of ASIA-region PROMO-part
    revenue supplied by NATION_2, by order year. The conditional decimal
    sum and the total ride the same aggregate pass — one shuffle for the
    2-row year group, every dimension broadcast."""
    part = table(spark, sf, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    sn = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    cn = table(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    region = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = table(spark, sf, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_2", revenue).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cn), cust["c_nationkey"] == cn["n_nationkey"])
        .join(F.broadcast(region), cn["n_regionkey"] == region["r_regionkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            text.round4(_dec_sum(target) / _dec_sum(revenue)).alias("mkt_share")
        )
    )


def q_tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) adapted: the testdata has no
    partsupp/supplycost, so profit is the discounted revenue of 'gear'
    parts, by supplier nation and order year. Filtered part is the
    pre-join prune (broadcast semi shape); the only shuffle is
    lineitem⋈orders plus the tiny nation×year aggregate."""
    part = table(spark, sf, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey")
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf, "nation").select("n_nationkey", "n_name")
    orders = table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_dec_sum(profit).alias("sum_profit"))
    )


def q_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by returned
    revenue in a quarter. The quarter filter prunes orders at the scan;
    lineitem⋈orders is the one big shuffle, customer/nation broadcast,
    and the top-20 is a partial top-k under the final sort."""
    orders = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = table(spark, sf, "customer")
    nation = table(spark, sf, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dec_sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority) adapted: the testdata has no
    ship mode or commit/receipt dates, so lines group into LATE / ONTIME
    classes (shipped >90 days after order) and the aggregate counts
    critical- vs normal-priority lines per class. count(when()) keeps the
    conditional counts in one codegen aggregate pass."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    orders = table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit("LATE"),
    ).otherwise(F.lit("ONTIME"))
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(late.alias("ship_class"))
        .agg(
            F.count(F.when(critical, 1)).alias("high_line_count"),
            F.count(F.when(~critical, 1)).alias("low_line_count"),
        )
    )


def q_tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution) adapted: orders are
    counted per customer excluding '4-NOT SPECIFIED' priority (stand-in
    for the comment filter the testdata lacks). Orders aggregate to
    per-custkey counts BEFORE touching customer — the shuffle carries
    |customers| partial-combined rows, not |orders| — then the left join
    keeps zero-order customers and a second tiny aggregate builds the
    distribution."""
    counts = (
        table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cust = table(spark, sf, "customer").select("c_custkey")
    return (
        cust.join(counts, cust["c_custkey"] == counts["o_custkey"], "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q_tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 (top supplier): suppliers whose quarterly revenue equals
    the maximum. The per-supplier aggregate is map-side combined; the max
    is a 1-row broadcast cross join (the decorrelated scalar subquery),
    so no second pass over the fact table. Decimal-exact sums make the
    double equality deterministic across engines."""
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(_dec_sum(revenue).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 (supplier-part relationship count) adapted: the observed
    distinct (partkey, suppkey) pairs in lineitem stand in for partsupp,
    and the 'customer complaints' exclusion becomes a deterministic
    suppkey rule. Pair dedup is one shuffle on the composite key; part is
    a broadcast; the distinct-supplier count per (brand, type, size) is
    the only other exchange."""
    pairs = (
        table(spark, sf, "lineitem")
        .filter(F.col("l_suppkey") % 10 != 0)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(F.broadcast(part), pairs["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): average yearly revenue
    lost if small orders of Brand#3 parts were dropped. The correlated
    avg-quantity subquery decorrelates into a per-part aggregate joined
    back; both sides first prune to the brand's parts via a broadcast, so
    the fact table is read once and only brand rows move. The avg is an
    exact decimal sum over an exact count — bit-identical across engines,
    so the 0.2× threshold cannot flip boundary rows."""
    part = table(spark, sf, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    li = (
        table(spark, sf, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (_dec_sum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            text.round4(
                _dec_sum(F.col("l_extendedprice")) / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


def q_tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) adapted: 'late' is
    shipped >90 days after the order date (no receipt/commit dates in the
    testdata). The classic EXISTS/NOT-EXISTS double self-join rewrites to
    ONE per-order aggregate — distinct suppliers vs distinct late
    suppliers — so the fact table shuffles once on the order key; a late
    line counts when its multi-supplier order has exactly one late
    supplier. Supplier names ride a broadcast."""
    orders = table(spark, sf, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = (
        table(spark, sf, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("is_late"),
        )
    )
    # two-level aggregate instead of two COUNT(DISTINCT)s: the pair
    # dedup combines map-side and avoids the Expand that a multi-distinct
    # aggregate plans (which would double every fact row)
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("any_late")
    )
    stats = (
        per_supp.groupBy(F.col("l_orderkey").alias("g_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.count(F.when(F.col("any_late"), 1)).alias("n_late_supp"),
        )
    )
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        li.filter(F.col("is_late"))
        .join(stats, F.col("l_orderkey") == F.col("g_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def q_tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity) adapted: nation keys stand in
    for phone country codes, and 'no orders' means none since 1999 (every
    testdata customer has SOME order, matching the spec's 7-year dormancy
    intent). The average is a 1-row broadcast cross join, the NOT EXISTS
    a left-anti join on the customer key against the date-pruned
    one-column orders projection."""
    codes = [1, 3, 5, 7, 9, 11, 13]
    cust = table(spark, sf, "customer").filter(
        F.col("c_nationkey").isin(codes)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    avg_row = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            _dec_sum(F.col("c_acctbal")) / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    orders = (
        table(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dec_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


def q_tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 (best supplier per part) adapted: no partsupp/supplycost,
    so 'best' is the EUROPE-region supplier with the highest account
    balance among those observed supplying the part (distinct lineitem
    pairs). The correlated min-cost subquery decorrelates into a per-part
    max joined back on (part, balance); every dimension side is broadcast
    and the pair dedup is the single fact shuffle."""
    pairs = (
        table(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = table(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    region = table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    nation = table(spark, sf, "nation")
    supp = (
        table(spark, sf, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        pairs.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    best = cand.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.max("s_acctbal").alias("best_bal")
    )
    return (
        cand.join(
            F.broadcast(best),
            (F.col("p_partkey") == F.col("b_partkey"))
            & (F.col("s_acctbal") == F.col("best_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 (important stock identification) adapted: per-part
    'value' is the decimal sum of quantity × retail price shipped by
    NATION_3 suppliers, kept when above 0.1% of the grand total. The
    threshold is the decorrelated 1-row broadcast; the per-part aggregate
    is map-side combined; supplier/part are broadcasts."""
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    part = table(spark, sf, "part").select("p_partkey", "p_retailprice")
    li = (
        table(spark, sf, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            (F.col("l_quantity") * F.col("p_retailprice")).alias("v"),
        )
    )
    per_part = li.groupBy("l_partkey").agg(_dec_sum(F.col("v")).alias("value"))
    total = per_part.agg(
        (F.sum(F.col("value").cast("decimal(24,6)")).cast("double") * 0.001)
        .alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


def q_tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) adapted: suppliers in two
    nations who shipped more than 50 units of 'red' parts during 1996
    (shipped volume stands in for availqty/supplycost the testdata
    lacks). The nested IN-chain is two broadcast prunes plus one
    per-(supplier, part) aggregate; the final supplier list is a semi
    join against the qualifying aggregate."""
    part = table(spark, sf, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(_dec_sum(F.col("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 50.0)
        .select("l_suppkey")
        .distinct()
    )
    nation = table(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_5")
    )
    supp = table(spark, sf, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(
            shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name", "n_name")
    )


ORACLES: dict[str, str | None] = {
    "q_tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(CAST(l_quantity AS DECIMAL(20,6)) * 1000000 AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_qty,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(20,6)) * 1000000 AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_base_price,
               CAST(sum(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6)) * 1000000 AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
               CAST(sum(CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(20,6)) * 1000000 AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
               floor(CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_qty,
               floor(CAST(sum(CAST(l_discount AS DECIMAL(20,6))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_tpch_q3": """
        SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate, o_orderpriority,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "q_tpch_q5": """
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    "q_tpch_q6": """
        SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(20,6))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q_tpch_q4": """
        SELECT o_orderpriority, count(*) AS cnt
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q_tpch_q14": """
        SELECT floor(
                 100.0
                 * CAST(sum(CASE WHEN p_type = 'PROMO'
                            THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))
                            ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    "q_tpch_q18": """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum_qty > 300
        )
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS odate,
               o_totalprice, sum_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "q_tpch_q19": """
        SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE)
               AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q_tpch_q7": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q_tpch_q8": """
        SELECT year(o_orderdate) AS o_year,
               floor(
                 CAST(sum(CASE WHEN sn.n_name = 'NATION_2'
                          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))
                          ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_year
    """,
    "q_tpch_q9": """
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
        GROUP BY n_name, year(o_orderdate)
    """,
    "q_tpch_q10": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "q_tpch_q12": """
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
               count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 END) AS high_line_count,
               count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 END) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY ship_class
    """,
    "q_tpch_q13": """
        WITH counts AS (
          SELECT o_custkey, count(*) AS cnt
          FROM orders WHERE o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY o_custkey
        )
        SELECT coalesce(cnt, 0) AS c_count, count(*) AS custdist
        FROM customer LEFT JOIN counts ON c_custkey = o_custkey
        GROUP BY c_count
    """,
    "q_tpch_q15": """
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        ),
        mx AS (SELECT max(total_revenue) AS max_revenue FROM rev)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev, mx
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = max_revenue
    """,
    "q_tpch_q16": """
        WITH pairs AS (
          SELECT DISTINCT l_partkey, l_suppkey
          FROM lineitem WHERE l_suppkey % 10 <> 0
        )
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM pairs JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        GROUP BY p_brand, p_type, p_size
    """,
    "q_tpch_q17": """
        WITH li AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#3'
        ),
        avgq AS (
          SELECT l_partkey AS a_partkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS avg_qty
          FROM li GROUP BY l_partkey
        )
        SELECT floor(
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) / 7.0
                 * 10000 + 0.5) / 10000 AS avg_yearly
        FROM li JOIN avgq ON l_partkey = a_partkey
        WHERE l_quantity < 0.2 * avg_qty
    """,
    "q_tpch_q21": """
        WITH li AS (
          SELECT l_orderkey, l_suppkey,
                 l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
        ),
        stats AS (
          SELECT l_orderkey AS g_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
          FROM li GROUP BY l_orderkey
        )
        SELECT s_name, count(*) AS numwait
        FROM li
        JOIN stats ON l_orderkey = g_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE is_late AND n_supp > 1 AND n_late_supp = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name LIMIT 20
    """,
    "q_tpch_q22": """
        WITH cust AS (
          SELECT c_custkey, c_nationkey, c_acctbal
          FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        ),
        avg_bal AS (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS avg_bal
          FROM cust WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey AS cntrycode, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) AS totacctbal
        FROM cust, avg_bal
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
          )
        GROUP BY cntrycode
    """,
    "q_tpch_q2": """
        WITH pairs AS (
          SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ),
        cand AS (
          SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
          FROM pairs
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
        ),
        best AS (
          SELECT p_partkey AS b_partkey, max(s_acctbal) AS best_bal
          FROM cand GROUP BY p_partkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM cand JOIN best
          ON p_partkey = b_partkey AND s_acctbal = best_bal
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
    "q_tpch_q11": """
        WITH per_part AS (
          SELECT l_partkey,
                 CAST(sum(CAST(l_quantity * p_retailprice AS DECIMAL(20,6))) AS DOUBLE) AS value
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN part ON l_partkey = p_partkey
          WHERE n_name = 'NATION_3'
          GROUP BY l_partkey
        ),
        total AS (
          SELECT CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE) * 0.001 AS threshold
          FROM per_part
        )
        SELECT l_partkey, value
        FROM per_part, total
        WHERE value > threshold
    """,
    "q_tpch_q20": """
        WITH shipped AS (
          SELECT l_suppkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) > 50.0
        )
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_0', 'NATION_5')
          AND s_suppkey IN (SELECT l_suppkey FROM shipped)
    """,
}
