"""Join operators (EXT-J1 — the reference has NO joins, SURVEY.md §2.6).

The natural capability-parity join is resolving way→node refs
(ways.node_refs exploded, equi-joined to nodes on id). On the test star
schema the same shape is fact→dimension: orders→customer→nation→region.

Scale strategy: dimensions are broadcast (``F.broadcast``) so the 100 TB
fact table never shuffles for the join; only the final small groupBy
shuffles grouped partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_refs(ways: DataFrame, nodes: DataFrame, ref_col: str = "node_refs",
                 id_col: str = "id") -> DataFrame:
    """EXT-J1 on OSM-shaped data: explode way refs and join to nodes.
    Nodes side is the big one → plain shuffle hash join (AQE picks);
    positions come back for geometry assembly."""
    exploded = ways.select(
        F.col(id_col).alias("way_id"),
        F.posexplode(ref_col).alias("seq", "ref"),
    )
    return exploded.join(
        nodes.select(F.col(id_col).alias("ref"), "pos"), on="ref", how="left"
    ).select("way_id", "seq", "ref", "pos")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: tuple[str, ...] = ("state",),
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_time <= left_time within the same `by` key ("backward", the
    default), or the earliest right row with right_time >= left_time
    ("forward" — next-quote-after-trade / time-to-next-event shape).

    Spark has no native as-of join; the scalable composition is the
    union + last_value(ignorenulls) window trick: tag both sides, sort by
    (key, time, side) — right rows sort before left rows at equal
    timestamps so the match is inclusive — and forward-fill the right
    values. ONE shuffle on the by-key, no range cross-join, state is one
    row per partition during the window scan. (This is how you as-of join
    100 TB of trades to quotes.)

    Right side must be unique per (by, right_time) — pre-aggregate if not.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join direction must be backward|forward, got {direction!r}")
    reserved = {"_t", "_side", "_rt"} | {f"_r_{v}" for v in value_cols}
    # output names clash too: the result adds matched_<value> / matched_time
    reserved |= {"matched_time"} | {f"matched_{v}" for v in value_cols}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserved working columns in input: {clash}")
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    carry = [c for c in left.columns if c != by]  # left payload columns

    l_tagged = left.select(
        F.col(by),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in carry],
        *[F.lit(None).cast(rtypes[v]).alias(f"_r_{v}") for v in value_cols],
        F.lit(None).cast(rtypes[right_time]).alias("_rt"),
    )
    r_tagged = right.select(
        F.col(by),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in carry],
        *[F.col(v).alias(f"_r_{v}") for v in value_cols],
        F.col(right_time).alias("_rt"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # scan order: time ascending (backward) or descending (forward); at
    # equal timestamps right rows (_side 0) precede left rows so the
    # equal-time match is inclusive in BOTH directions.
    tkey = F.col("_t") if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(by)
        .orderBy(tkey, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        F.col(by),
        "_side",
        *[F.col(c) for c in carry],
        *[
            F.last(f"_r_{v}", ignorenulls=True).over(w).alias(f"matched_{v}")
            for v in value_cols
        ],
        F.last("_rt", ignorenulls=True).over(w).alias("matched_time"),
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 10.0,
) -> DataFrame:
    """Range join: left rows matched to intervals with lo <= value < hi.

    Naive inequality joins plan as BroadcastNestedLoopJoin (O(n·m)); the
    scale path buckets the domain: each interval explodes into the
    buckets it overlaps, the join is EQUALITY on bucket (hash join,
    shuffle-friendly), and the exact range predicate filters residuals.
    Cost: O(n + m·avg_buckets_per_interval)."""
    if "_bucket" in left.columns or "_bucket" in intervals.columns:
        raise ValueError("range_join reserved working column _bucket in input")
    lb = left.withColumn(
        "_bucket", F.floor(F.col(value_col) / bucket_width).cast("long")
    )
    # hi <= lo would make F.sequence count DOWN (default step -1), exploding
    # the interval across every bucket between the two values; empty is the
    # correct match set for an inverted/empty interval, so drop them first.
    intervals = intervals.filter(F.col(hi_col) > F.col(lo_col))
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / bucket_width).cast("long"),
            )
        ),
    )
    return lb.join(ib, "_bucket").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    ).drop("_bucket")


def orders_by_nation(orders: DataFrame, customer: DataFrame,
                     nation: DataFrame) -> DataFrame:
    """Star join with broadcast dimensions: order count + exact revenue per
    nation. Revenue is summed as decimal (exact, associative — deterministic
    across any partitioning) then surfaced as double."""
    dim = F.broadcast(
        customer.select("c_custkey", "c_nationkey").join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
    )
    return (
        orders.join(dim, orders["o_custkey"] == dim["c_custkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


def merge_upsert(
    snapshot: DataFrame, changes: DataFrame, key: str
) -> DataFrame:
    """MERGE INTO semantics as a batch operator: upsert ``changes`` into
    ``snapshot`` by ``key`` — matched keys take the change row's values,
    unmatched change keys insert, untouched snapshot rows pass through.

    One full-outer equi-join on the key; a change row wins WHOLESALE on a
    key match (decided by a row-presence marker, not per-column coalesce —
    so a change row may legitimately carry NULLs). At scale both sides
    hash-partition on the key (or the changes side broadcasts when small —
    AQE decides from runtime size), so the cost is one shuffle of the
    delta plus one of the snapshot — the lakehouse CDC-apply shape
    (cf. Delta/Iceberg MERGE)."""
    cols = [c for c in snapshot.columns if c != key]
    assert changes.columns == snapshot.columns, "schemas must align"
    chg = changes.select(
        F.col(key).alias("_ck"),
        F.lit(True).alias("_has_chg"),
        *[F.col(c).alias(f"_c_{c}") for c in cols],
    )
    joined = snapshot.join(chg, F.col(key) == F.col("_ck"), "full_outer")
    take_chg = F.col("_has_chg").isNotNull()
    return joined.select(
        F.when(take_chg, F.col("_ck")).otherwise(F.col(key)).alias(key),
        *[
            F.when(take_chg, F.col(f"_c_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in cols
        ],
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bucket: int,
) -> DataFrame:
    """Interval×interval OVERLAP join (closed intervals over an integer
    domain, e.g. epoch-µs): pairs where a.lo ≤ b.hi AND b.lo ≤ a.hi.

    The inequality pair would plan as a nested-loop cross product; the
    scale path is the same domain-bucketing as :func:`range_join`, on
    BOTH sides: each interval explodes into the fixed-width buckets it
    covers, the join is EQUALITY on bucket (hash join), and because two
    overlapping intervals share at least one covered bucket, the
    bucket-equality candidates are a superset — the exact predicate
    filters residuals and a distinct collapses multi-bucket duplicate
    pairs. Cost: O(Σ buckets-per-interval), never O(n·m). Pick
    ``bucket`` near the typical interval length: too small explodes the
    long side, too large packs unrelated intervals together."""
    for c in (a.columns + b.columns):
        if c == "_bucket":
            raise ValueError(
                "interval_overlap_join reserved working column _bucket"
            )
    dup = set(a.columns) & set(b.columns)
    if dup:
        raise ValueError(f"ambiguous columns across sides: {sorted(dup)}")

    def blow(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.filter(F.col(hi) >= F.col(lo)).withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / bucket).cast("long"),
                    F.floor(F.col(hi) / bucket).cast("long"),
                )
            ),
        )

    cand = blow(a, a_lo, a_hi).join(blow(b, b_lo, b_hi), "_bucket")
    return (
        cand.filter(
            (F.col(a_lo) <= F.col(b_hi)) & (F.col(b_lo) <= F.col(a_hi))
        )
        .drop("_bucket")
        .distinct()
    )
