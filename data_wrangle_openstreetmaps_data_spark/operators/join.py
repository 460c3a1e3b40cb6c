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
