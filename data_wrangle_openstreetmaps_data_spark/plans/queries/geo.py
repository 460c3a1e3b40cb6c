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


_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_sql(div: str) -> dict[str, str]:
    """Geohash-6 encode as THREE engine-shared SQL stages (the Hilbert
    device: ONE text generates both the Spark withColumn chain and the
    DuckDB CTE chain, so the bit math cannot drift between engines).
    Integer-only after the two floor quantizations: 15-bit lon/lat
    cells, bit-interleaved MSB-first (lon leads, per the geohash spec),
    then 6 base-32 characters off the 30-bit code."""
    quant = {
        "xlon": "least(CAST(floor((lon + 180.0) / 360.0 * 32768.0) "
        "AS BIGINT), 32767)",
        "xlat": "least(CAST(floor((lat + 90.0) / 180.0 * 32768.0) "
        "AS BIGINT), 32767)",
    }
    terms = []
    for i in range(15):
        terms.append(f"((xlon {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((xlat {div} {1 << i}) % 2) * {1 << (2 * i)}")
    code = " + ".join(terms)
    chars = " || ".join(
        f"substr('{_GH32}', CAST((code {div} {1 << (25 - 5 * k)}) % 32 "
        "AS INT) + 1, 1)"
        for k in range(6)
    )
    return {**quant, "code": code, "geohash": chars}


def q_geohash(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-G — geohash-6 cell counts: the prefix-friendly spatial key
    (truncate the string = coarsen the cell; neighbors usually share
    prefixes) that spatial stores shard on. Encode is pure per-row
    integer bit interleaving + base-32 lookup from ONE SQL text shared
    by both engines (see _geohash_sql); the only shuffle is the cell
    aggregate. Top-20 cells by count."""
    stages = _geohash_sql("div")
    d = _fake_latlon(table(spark, sf, "events"))
    for name in ("xlon", "xlat", "code", "geohash"):
        d = d.withColumn(name, F.expr(stages[name]))
    return (
        d.groupBy("geohash")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("code").cast("long").alias("code"),
        )
        .orderBy(F.desc("n_points"), "geohash")
        .limit(20)
    )


def q_geo_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-G — grid-bucketed spatial nearest-neighbor JOIN: every
    purchase point assigned to its nearest supplier "store", the
    demand-allocation / nearest-facility query. NEVER an all-pairs
    distance product: stores explode into their 3×3 neighbor cells
    (9 rows each, cell = 0.1°) and meet points in an EQUALITY join on
    the cell key, so candidates are bounded by local density and a
    point's true nearest within one cell radius is always a candidate
    (points with no store that close drop out — documented semantics).
    Winner per point by (d², s_suppkey) — squared euclidean degrees,
    no trig, the identical double expression on both engines — then a
    per-store rollup reporting COUNT/MIN/MAX only (order-independent
    aggregates; a mean of doubles would be summation-order-dependent
    cross-engine). Store side is dimension-sized → broadcast; at scale
    both sides shuffle on the cell key."""
    from pyspark.sql import Window

    ev = _fake_latlon(
        table(spark, sf, "events").filter(F.col("event_type") == "purchase")
    ).select(
        "event_id",
        "lat",
        "lon",
        F.floor(F.col("lon") / 0.1).cast("long").alias("cx"),
        F.floor(F.col("lat") / 0.1).cast("long").alias("cy"),
    )
    st = table(spark, sf, "supplier").select(
        "s_suppkey",
        (F.lit(22.0) + (F.col("s_suppkey") % 70) / 100.0).alias("slat"),
        (F.lit(88.0) + (F.col("s_suppkey") * 7 % 100) / 100.0).alias("slon"),
    )
    d = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    st9 = (
        st.withColumn("dx", d)
        .withColumn("dy", d)
        .select(
            "s_suppkey",
            "slat",
            "slon",
            (F.floor(F.col("slon") / 0.1).cast("long") + F.col("dx")).alias(
                "cx"
            ),
            (F.floor(F.col("slat") / 0.1).cast("long") + F.col("dy")).alias(
                "cy"
            ),
        )
    )
    cand = ev.join(F.broadcast(st9), ["cx", "cy"]).select(
        "event_id",
        "s_suppkey",
        (
            (F.col("lat") - F.col("slat")) * (F.col("lat") - F.col("slat"))
            + (F.col("lon") - F.col("slon"))
            * (F.col("lon") - F.col("slon"))
        ).alias("d2"),
    )
    w = Window.partitionBy("event_id").orderBy("d2", "s_suppkey")
    near = cand.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        near.groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            text.round4(F.sqrt(F.min("d2"))).alias("min_dist_deg"),
            text.round4(F.sqrt(F.max("d2"))).alias("max_dist_deg"),
        )
        .orderBy(F.desc("n_assigned"), "s_suppkey")
        .limit(20)
    )


def _geohash_oracle() -> str:
    s = _geohash_sql("//")
    return f"""
        WITH pts AS (
          SELECT event_id,
                 22.0 + value / 100.0 AS lat,
                 88.0 + (user_id % 100) / 100.0 AS lon
          FROM events
        ),
        q AS (
          SELECT *, {s["xlon"]} AS xlon, {s["xlat"]} AS xlat FROM pts
        ),
        c AS (SELECT *, {s["code"]} AS code FROM q),
        g AS (SELECT *, {s["geohash"]} AS geohash FROM c)
        SELECT geohash, count(*) AS n_points,
               CAST(min(code) AS BIGINT) AS code
        FROM g GROUP BY geohash
        ORDER BY n_points DESC, geohash LIMIT 20
    """


ORACLES: dict[str, str | None] = {
    "q_geohash": _geohash_oracle(),
    "q_geo_nearest": """
        WITH ev AS (
          SELECT event_id,
                 22.0 + value / 100.0 AS lat,
                 88.0 + (user_id % 100) / 100.0 AS lon
          FROM events WHERE event_type = 'purchase'
        ),
        evc AS (
          SELECT *, CAST(floor(lon / 0.1) AS BIGINT) AS cx,
                    CAST(floor(lat / 0.1) AS BIGINT) AS cy
          FROM ev
        ),
        st AS (
          SELECT s_suppkey,
                 22.0 + (s_suppkey % 70) / 100.0 AS slat,
                 88.0 + (s_suppkey * 7 % 100) / 100.0 AS slon
          FROM supplier
        ),
        st9 AS (
          SELECT s_suppkey, slat, slon,
                 CAST(floor(slon / 0.1) AS BIGINT) + dx.d AS cx,
                 CAST(floor(slat / 0.1) AS BIGINT) + dy.d AS cy
          FROM st,
               (SELECT unnest([-1, 0, 1]) AS d) dx,
               (SELECT unnest([-1, 0, 1]) AS d) dy
        ),
        cand AS (
          SELECT event_id, s_suppkey,
                 (lat - slat) * (lat - slat)
                 + (lon - slon) * (lon - slon) AS d2
          FROM evc JOIN st9 USING (cx, cy)
        ),
        near AS (
          SELECT event_id, s_suppkey, d2,
                 row_number() OVER (PARTITION BY event_id
                                    ORDER BY d2, s_suppkey) AS rn
          FROM cand
        )
        SELECT s_suppkey, count(*) AS n_assigned,
               floor(sqrt(min(d2)) * 10000 + 0.5) / 10000 AS min_dist_deg,
               floor(sqrt(max(d2)) * 10000 + 0.5) / 10000 AS max_dist_deg
        FROM near WHERE rn = 1
        GROUP BY s_suppkey
        ORDER BY n_assigned DESC, s_suppkey LIMIT 20
    """,
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
