"""Geospatial: bbox filter, haversine distance, grid binning.

Registry family module — split from the single-file registry; each
family defines its ``q_*`` callables plus the matching ``ORACLES``
entries, aggregated in ``__init__``."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.functions import text

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403



def q_geo_bbox(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-G — bounding-box filter count (the geospatial surface the
    reference reserved pos=[lat,lon] for; openstreet_kolkata.py:410-412)."""
    from data_wrangle_openstreetmaps_data_spark.functions import geo

    pts = _fake_latlon(table(spark, sf, "events"))
    return pts.filter(
        geo.in_bbox(F.col("lat"), F.col("lon"), 22.2, 88.2, 22.7, 88.7)
    ).agg(F.count(F.lit(1)).alias("cnt"))


def q_geo_distance(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-G — haversine distance from a fixed point, top-20 nearest."""
    from data_wrangle_openstreetmaps_data_spark.functions import geo

    pts = _fake_latlon(table(spark, sf, "events"))
    d = text.round4(
        geo.haversine_km(F.col("lat"), F.col("lon"), F.lit(22.5726), F.lit(88.3639))
    )
    return (
        pts.select("event_id", d.alias("dist_km"))
        .orderBy("dist_km", "event_id")
        .limit(20)
    )


def q_geo_grid(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-G — grid-cell binning counts (the partitionable spatial index)."""
    from data_wrangle_openstreetmaps_data_spark.functions import geo

    pts = _fake_latlon(table(spark, sf, "events"))
    return pts.groupBy(
        geo.grid_cell(F.col("lat"), F.col("lon"), 0.1).alias("cell")
    ).agg(F.count(F.lit(1)).alias("cnt"))


ORACLES: dict[str, str | None] = {
    "q_geo_bbox": """
        WITH pts AS (
          SELECT event_id, 22.0 + value / 100.0 AS lat,
                 88.0 + (user_id % 100) / 100.0 AS lon
          FROM events
        )
        SELECT count(*) AS cnt FROM pts
        WHERE lat >= 22.2 AND lat <= 22.7 AND lon >= 88.2 AND lon <= 88.7
    """,
    "q_geo_distance": """
        WITH pts AS (
          SELECT event_id, 22.0 + value / 100.0 AS lat,
                 88.0 + (user_id % 100) / 100.0 AS lon
          FROM events
        ),
        d AS (
          SELECT event_id,
                 floor((2 * 6371.0088 * asin(sqrt(
                   sin(radians(22.5726 - lat) / 2) * sin(radians(22.5726 - lat) / 2)
                   + cos(radians(lat)) * cos(radians(22.5726))
                     * sin(radians(88.3639 - lon) / 2) * sin(radians(88.3639 - lon) / 2)
                 ))) * 10000 + 0.5) / 10000 AS dist_km
          FROM pts
        )
        SELECT event_id, dist_km FROM d ORDER BY dist_km, event_id LIMIT 20
    """,
    "q_geo_grid": """
        WITH pts AS (
          SELECT 22.0 + value / 100.0 AS lat,
                 88.0 + (user_id % 100) / 100.0 AS lon
          FROM events
        )
        SELECT CAST(CAST(floor(lon / 0.1) AS BIGINT) AS VARCHAR) || ':' ||
               CAST(CAST(floor(lat / 0.1) AS BIGINT) AS VARCHAR) AS cell,
               count(*) AS cnt
        FROM pts GROUP BY cell
    """,
}
