"""Core OSM-derived surface: filters, audits, scalar cleaning, reshape (SURVEY.md S2.1-2.5).

Registry family module — split from the single-file registry; each
family defines its ``q_*`` callables plus the matching ``ORACLES``
entries, aggregated in ``__init__``."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.functions import cleaning, text
from data_wrangle_openstreetmaps_data_spark.operators import (
    audit,
    dedup,
    join as join_ops,
    sample,
    similarity,
    topk,
)

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403



# ---------------------------------------------------------------------------
# Core relational surface (SURVEY.md §2.1-2.3)
# ---------------------------------------------------------------------------


def q_topk_group_count(spark: SparkSession, sf: str) -> DataFrame:
    """A9 flagship — $match/$group/$sort/$limit (openstreet_kolkata.py:629-639)."""
    return topk.topk_group_count(
        table(spark, sf, "events"), "event_type", k=10, require_col="event_type"
    )


def q_topk_group_count_ways(spark: SparkSession, sf: str) -> DataFrame:
    """A9 second instance — highway pipeline (openstreet_kolkata.py:642-652)."""
    return topk.topk_group_count(
        table(spark, sf, "orders"), "o_orderpriority", k=10,
        require_col="o_orderpriority",
    )


def q_filter_count(spark: SparkSession, sf: str) -> DataFrame:
    """A8 — find(filter).count() (openstreet_kolkata.py:605-616)."""
    df = table(spark, sf, "orders")
    return df.filter(F.col("o_orderstatus") == "O").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def q_amenity_counts(spark: SparkSession, sf: str) -> DataFrame:
    """A8 multi — the per-amenity counts in ONE pass instead of the
    reference's 7 separate find().count() round-trips
    (openstreet_kolkata.py:610-616); one count-if column per category."""
    df = table(spark, sf, "events")
    return df.agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"cnt_{t}")
            for t in EVENT_TYPES
        ]
    )


def q_total_count(spark: SparkSession, sf: str) -> DataFrame:
    """S6 — db.maps.count() (openstreet_kolkata.py:592)."""
    return table(spark, sf, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


def q_group_count(spark: SparkSession, sf: str) -> DataFrame:
    """A1 — histogram of element tags (openstreet_kolkata.py:87-95)."""
    return audit.count_tags(table(spark, sf, "lineitem"), "l_returnflag")


def q_group_count_user(spark: SparkSession, sf: str) -> DataFrame:
    """A3 — contribution count per user (openstreet_kolkata.py:149-166)."""
    df = table(spark, sf, "events")
    return df.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))


def q_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """A3 — len(users) distinct count (openstreet_kolkata.py:163)."""
    return audit.distinct_count(table(spark, sf, "events"), "user_id")


def q_countdistinct_nested(spark: SparkSession, sf: str) -> DataFrame:
    """A7 — distinct('created.user') on a nested struct (openstreet_kolkata.py:601)."""
    df = table(spark, sf, "events").select(
        F.struct(F.col("user_id").alias("usr")).alias("created")
    )
    return df.agg(F.countDistinct(F.col("created.usr")).alias("cnt"))


def q_filter_isin(spark: SparkSession, sf: str) -> DataFrame:
    """F1 — element-type isin filter (openstreet_kolkata.py:153,334,466)."""
    df = table(spark, sf, "lineitem")
    return (
        df.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_filter_eq(spark: SparkSession, sf: str) -> DataFrame:
    """F2 — key-equality predicate (openstreet_kolkata.py:177-178)."""
    df = table(spark, sf, "orders")
    return df.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus"
    )


def q_filter_prefix_suffix(spark: SparkSession, sf: str) -> DataFrame:
    """F3 — startswith/endswith predicate (openstreet_kolkata.py:271-273)."""
    df = table(spark, sf, "part")
    return (
        df.filter(F.col("p_type").startswith("S") & F.col("p_type").endswith("L"))
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_regex_classify_count(spark: SparkSession, sf: str) -> DataFrame:
    """F4/A2 — 4-way regex key classification + count (openstreet_kolkata.py:114-137)."""
    df = table(spark, sf, "documents").select(_derived_key().alias("k"))
    return audit.audit_keys(df, "k")


def q_conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    """A2 — fixed 4-bucket conditional aggregate (openstreet_kolkata.py:130-137)."""
    df = table(spark, sf, "documents").select(_derived_key().alias("k"))
    return audit.audit_keys_wide(df, "k")


def q_filter_notnull(spark: SparkSession, sf: str) -> DataFrame:
    """F6 — validity filter intent: keep rows with a user (openstreet_kolkata.py:455-461)."""
    df = table(spark, sf, "events")
    usr = F.when(F.col("user_id") % 10 == 0, F.lit(None)).otherwise(
        F.col("user_id")
    )
    return df.select(usr.alias("usr")).filter(F.col("usr").isNotNull()).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def q_distinct_values(spark: SparkSession, sf: str) -> DataFrame:
    """A5 — global distinct value set (openstreet_kolkata.py:250-251)."""
    return (
        table(spark, sf, "orders")
        .select(F.col("o_orderstatus").alias("status"))
        .distinct()
    )


def q_union_types(spark: SparkSession, sf: str) -> DataFrame:
    """Set op — union of the node and way element streams (openstreet_kolkata.py:153)."""
    orders = table(spark, sf, "orders").select(F.lit("order").alias("type"))
    events = table(spark, sf, "events").select(F.lit("event").alias("type"))
    return (
        orders.unionByName(events)
        .groupBy("type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_sample_every_10th(spark: SparkSession, sf: str) -> DataFrame:
    """S3 — deterministic every-10th sampler (openstreet_kolkata.py:67-77)."""
    return sample.every_nth(
        table(spark, sf, "orders").select("o_orderkey", "o_orderstatus"),
        "o_orderkey",
        10,
    )


def q_collect_set_grouped(spark: SparkSession, sf: str) -> DataFrame:
    """A4 — street-type audit: grouped collect_set (openstreet_kolkata.py:175-190)."""
    audited = audit.audit_street_types(_supplier_streets(spark, sf), "street")
    return audited.select(
        "stype", F.concat_ws(",", "streets").alias("streets_csv"), "cnt"
    )


def q_collect_set_derived_key(spark: SparkSession, sf: str) -> DataFrame:
    """A6 — postcode audit: collect_set under derived bucket key
    (openstreet_kolkata.py:270-289)."""
    df = table(spark, sf, "customer").select(
        F.when(F.col("c_custkey") % 2 == 0, F.lit("addr:postcode"))
        .otherwise(F.lit("addr:postal_code"))
        .alias("k"),
        _pick(F.col("c_custkey"), DIRTY_POSTCODES).alias("v"),
    )
    audited = audit.audit_postcodes(df, "k", "v")
    return audited.select(
        "bucket", F.concat_ws(",", "codes").alias("codes_csv"), "any_valid"
    )


# ---------------------------------------------------------------------------
# Scalar cleaning ops (X1-X8) on derived dirty data
# ---------------------------------------------------------------------------


def q_string_normalize_join(spark: SparkSession, sf: str) -> DataFrame:
    """X2 — dictionary-normalize street type (openstreet_kolkata.py:217-226)."""
    df = _supplier_streets(spark, sf)
    return df.select(
        "s_suppkey",
        F.col("street").alias("street_in"),
        cleaning.normalize_street_type("street").alias("street_fixed"),
    )


def q_regex_split_column(spark: SparkSession, sf: str) -> DataFrame:
    """X3 — leading house-number split: 1 col in → 2 cols out
    (openstreet_kolkata.py:228-237)."""
    df = _supplier_streets(spark, sf)
    housenum, remainder = cleaning.split_housenumber("street")
    return df.select(
        "s_suppkey", housenum.alias("housenum"), remainder.alias("name_out")
    )


def q_lookup_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """X4 — city-name dictionary normalize (openstreet_kolkata.py:261-268),
    intent-level (multi-word keys reachable)."""
    df = table(spark, sf, "customer").select(
        "c_custkey", _pick(F.col("c_custkey"), DIRTY_CITIES).alias("city_in")
    )
    return df.select(
        "c_custkey",
        "city_in",
        cleaning.fix_city_name("city_in").alias("city_fixed"),
    )


# ---------------------------------------------------------------------------
# Reshape / nested construction (R1-R6)
# ---------------------------------------------------------------------------


def q_struct_assembly(spark: SparkSession, sf: str) -> DataFrame:
    """R1 — created-struct assembly then dotted-path projection
    (openstreet_kolkata.py:477-480,527-528)."""
    df = table(spark, sf, "events").select(
        "event_id",
        F.struct(
            F.col("user_id").alias("usr"), F.col("event_type").alias("etype")
        ).alias("created"),
    )
    return df.select(
        "event_id",
        F.col("created.usr").alias("usr"),
        F.col("created.etype").alias("etype"),
    )


def q_array_assembly(spark: SparkSession, sf: str) -> DataFrame:
    """R2 — pos=[lat,lon] ordered array assembly (openstreet_kolkata.py:483-487)."""
    df = table(spark, sf, "events").select(
        "event_id",
        F.array(F.col("value"), F.col("value") * 2).alias("pos"),
    )
    return df.select(
        "event_id",
        F.element_at("pos", 1).alias("lat"),
        F.element_at("pos", 2).alias("lon"),
    )


def q_map_assembly_filtered(spark: SparkSession, sf: str) -> DataFrame:
    """R3+R4 — key-filtered address-map assembly + residual tag map
    (openstreet_kolkata.py:497-520): problemchars dropped, addr: prefix
    stripped, addr:x:y dropped, non-addr keys to the residual map."""
    df = table(spark, sf, "customer").select(
        "c_custkey",
        _pick(F.col("c_custkey"), DIRTY_STREETS).alias("street_in"),
        _pick(F.col("c_custkey"), DIRTY_CITIES).alias("city_in"),
        _pick(F.col("c_custkey"), AMENITIES).alias("amenity_in"),
    )
    entries = F.array(
        F.struct(F.lit("addr:street").alias("k"), F.col("street_in").alias("v")),
        F.struct(F.lit("addr:city").alias("k"), F.col("city_in").alias("v")),
        F.struct(F.lit("addr:street:name").alias("k"), F.lit("dropme").alias("v")),
        F.struct(F.lit("amenity").alias("k"), F.col("amenity_in").alias("v")),
        F.struct(F.lit("bad key").alias("k"), F.lit("dropme").alias("v")),
    )
    ok = F.filter(entries, lambda t: ~t["k"].rlike(cleaning.PROBLEMCHARS_RE))
    addr_entries = F.transform(
        F.filter(ok, lambda t: t["k"].startswith("addr:")),
        lambda t: F.struct(
            F.regexp_replace(t["k"], r"^addr:", "").alias("k"), t["v"].alias("v")
        ),
    )
    address = F.map_from_entries(
        F.filter(addr_entries, lambda t: ~t["k"].rlike(cleaning.LOWER_COLON_RE))
    )
    tags = F.map_from_entries(
        F.filter(ok, lambda t: ~t["k"].startswith("addr:"))
    )
    return df.select(
        "c_custkey",
        F.element_at(address, F.lit("street")).alias("street"),
        F.element_at(address, F.lit("city")).alias("city"),
        F.element_at(tags, F.lit("amenity")).alias("amenity"),
    )


def q_map_residual(spark: SparkSession, sf: str) -> DataFrame:
    """R4 — residual tag map: per-key access, absent key → NULL
    (openstreet_kolkata.py:519-520; Mongo-style field access)."""
    df = table(spark, sf, "events")
    tags = F.map_from_arrays(
        F.array(F.lit("etype"), F.lit("props")),
        F.array(F.col("event_type"), F.col("props")),
    )
    return df.select(
        "event_id",
        F.element_at(tags, F.lit("etype")).alias("etype"),
        F.element_at(tags, F.lit("props")).alias("props"),
        F.element_at(tags, F.lit("missing")).alias("missing"),
    )


def q_array_transform(spark: SparkSession, sf: str) -> DataFrame:
    """R5 — ordered child-array extraction via transform (openstreet_kolkata.py:523-526)."""
    df = table(spark, sf, "orders")
    path = F.array_join(
        F.transform(F.split("o_orderpriority", "-"), lambda x: F.lower(x)), "|"
    )
    return df.select("o_orderkey", path.alias("prio_path"))


def q_conditional_update(spark: SparkSession, sf: str) -> DataFrame:
    """R6 — conditional field update, pure column derivation
    (openstreet_kolkata.py:305-326 intent)."""
    df = table(spark, sf, "events")
    etype = F.when(F.col("value") > 50, F.lit("high_value")).otherwise(
        F.col("event_type")
    )
    return df.select("event_id", etype.alias("etype"))


# ---------------------------------------------------------------------------
# EXT — joins, windows, dedup, text, similarity (SURVEY.md §2.6-2.7)
# ---------------------------------------------------------------------------


def q_join_resolve_refs(spark: SparkSession, sf: str) -> DataFrame:
    """EXT-J1 — fact→dim broadcast join + grouped rollup."""
    return join_ops.orders_by_nation(
        table(spark, sf, "orders"),
        table(spark, sf, "customer"),
        table(spark, sf, "nation"),
    )


def q_fuzzy_street_match(spark: SparkSession, sf: str) -> DataFrame:
    """EXT of X2 — fuzzy street-type normalization table: every distinct
    observed trailing token matched to its nearest canonical street type
    by Levenshtein distance ≤ 2 (catches misspellings the reference's
    dictionary never cataloged — its dict is the HAND-built version of
    exactly this table). One distinct-token scan + a bounded broadcast
    cross join vs the 15-entry whitelist; deterministic (dist, canonical)
    tiebreak."""
    return cleaning.fuzzy_match_street_type(_supplier_streets(spark, sf))


ORACLES: dict[str, str | None] = {
    "q_topk_group_count": """
        SELECT event_type, count(*) AS cnt FROM events
        WHERE event_type IS NOT NULL
        GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 10
    """,
    "q_topk_group_count_ways": """
        SELECT o_orderpriority, count(*) AS cnt FROM orders
        WHERE o_orderpriority IS NOT NULL
        GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority LIMIT 10
    """,
    "q_filter_count": "SELECT count(*) AS cnt FROM orders WHERE o_orderstatus = 'O'",
    "q_amenity_counts": "SELECT "
    + ", ".join(
        f"count(*) FILTER (WHERE event_type = '{t}') AS cnt_{t}"
        for t in EVENT_TYPES
    )
    + " FROM events",
    "q_total_count": "SELECT count(*) AS cnt FROM lineitem",
    "q_group_count": (
        "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag"
    ),
    "q_group_count_user": (
        "SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id"
    ),
    "q_count_distinct": "SELECT count(DISTINCT user_id) AS cnt FROM events",
    "q_countdistinct_nested": "SELECT count(DISTINCT user_id) AS cnt FROM events",
    "q_filter_isin": """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
        WHERE l_returnflag IN ('A', 'R') GROUP BY l_returnflag, l_linestatus
    """,
    "q_filter_eq": """
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderpriority = '1-URGENT'
    """,
    "q_filter_prefix_suffix": """
        SELECT p_type, count(*) AS cnt FROM part
        WHERE p_type LIKE 'S%' AND p_type LIKE '%L' GROUP BY p_type
    """,
    "q_regex_classify_count": f"""
        WITH keyed AS (SELECT {DERIVED_KEY_SQL} AS k FROM documents)
        SELECT {KEY_CLASS_SQL} AS key_class, count(*) AS cnt
        FROM keyed GROUP BY key_class
    """,
    "q_conditional_agg": f"""
        WITH keyed AS (SELECT {DERIVED_KEY_SQL} AS k FROM documents),
        classed AS (SELECT {KEY_CLASS_SQL} AS kc FROM keyed)
        SELECT
          count(*) FILTER (WHERE kc = 'lower') AS lower,
          count(*) FILTER (WHERE kc = 'lower_colon') AS lower_colon,
          count(*) FILTER (WHERE kc = 'problemchars') AS problemchars,
          count(*) FILTER (WHERE kc = 'other') AS other
        FROM classed
    """,
    "q_filter_notnull": """
        SELECT count(*) AS cnt FROM events
        WHERE (CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END) IS NOT NULL
    """,
    "q_distinct_values": "SELECT DISTINCT o_orderstatus AS status FROM orders",
    "q_union_types": """
        SELECT type, count(*) AS cnt FROM (
          SELECT 'order' AS type FROM orders
          UNION ALL SELECT 'event' AS type FROM events
        ) GROUP BY type
    """,
    "q_sample_every_10th": """
        SELECT o_orderkey, o_orderstatus FROM (
          SELECT o_orderkey, o_orderstatus,
                 row_number() OVER (ORDER BY o_orderkey) AS rn
          FROM orders
        ) WHERE (rn - 1) % 10 = 0
    """,
    "q_collect_set_grouped": f"""
        WITH s AS (SELECT {_STREET_SQL} AS street FROM supplier),
        typed AS (
          SELECT street,
                 CASE WHEN {_STYPE_SQL} = '' THEN 'UNKNOWN'
                      ELSE {_STYPE_SQL} END AS stype
          FROM s
        )
        SELECT stype,
               array_to_string(list_sort(list(DISTINCT street)), ',') AS streets_csv,
               count(*) AS cnt
        FROM typed WHERE stype NOT IN ({_EXPECTED_SQL})
        GROUP BY stype
    """,
    "q_collect_set_derived_key": rf"""
        WITH src AS (
          SELECT CASE WHEN c_custkey % 2 = 0 THEN 'addr:postcode'
                      ELSE 'addr:postal_code' END AS k,
                 {_PCODE_SQL} AS v
          FROM customer
        ),
        ext AS (
          SELECT k, v, regexp_extract(v, '\d+', 0) AS digits FROM src
        )
        SELECT k || CAST(length(digits) AS VARCHAR) AS bucket,
               array_to_string(list_sort(list(DISTINCT
                 CASE WHEN digits = '' THEN v ELSE digits END)), ',') AS codes_csv,
               max(length(digits) = 6) AS any_valid
        FROM ext GROUP BY bucket
    """,
    "q_string_normalize_join": f"""
        WITH s AS (SELECT s_suppkey, {_STREET_SQL} AS street FROM supplier),
        toks AS (SELECT s_suppkey, street, {_STYPE_SQL} AS tok FROM s),
        canon AS (SELECT *, {_STREET_CANON_SQL} AS canonical FROM toks)
        SELECT s_suppkey, street AS street_in,
               CASE WHEN canonical IS NOT NULL AND tok <> ''
                    THEN left(street, length(street) - length(tok)) || canonical
                    ELSE street END AS street_fixed
        FROM canon
    """,
    "q_regex_split_column": rf"""
        WITH s AS (SELECT s_suppkey, {_STREET_SQL} AS street FROM supplier),
        m AS (SELECT s_suppkey, street, {_HOUSENUM_MATCH_SQL} AS mat FROM s)
        SELECT s_suppkey,
               CASE WHEN mat = '' THEN NULL
                    ELSE regexp_replace(regexp_replace(regexp_replace(
                           mat, '\s+$', ''), ',$', ''), '^\s+', '')
               END AS housenum,
               CASE WHEN mat = '' THEN street
                    ELSE substr(street, length(mat) + 1) END AS name_out
        FROM m
    """,
    "q_lookup_normalize": f"""
        WITH c AS (SELECT c_custkey, {_CITY_SQL} AS city_in FROM customer)
        SELECT c_custkey, city_in,
               coalesce({_CITY_FULL_SQL}, {_CITY_FIRST_SQL}, city_in) AS city_fixed
        FROM c
    """,
    "q_struct_assembly": (
        "SELECT event_id, user_id AS usr, event_type AS etype FROM events"
    ),
    "q_array_assembly": (
        "SELECT event_id, value AS lat, value * 2 AS lon FROM events"
    ),
    "q_map_assembly_filtered": f"""
        SELECT c_custkey,
               {_STREET_SQL.replace('s_suppkey', 'c_custkey')} AS street,
               {_CITY_SQL} AS city,
               {_AMENITY_SQL} AS amenity
        FROM customer
    """,
    "q_map_residual": """
        SELECT event_id, event_type AS etype, props,
               CAST(NULL AS VARCHAR) AS missing
        FROM events
    """,
    "q_array_transform": """
        SELECT o_orderkey,
               array_to_string(list_transform(
                 string_split(o_orderpriority, '-'), x -> lower(x)), '|') AS prio_path
        FROM orders
    """,
    "q_conditional_update": """
        SELECT event_id,
               CASE WHEN value > 50 THEN 'high_value' ELSE event_type END AS etype
        FROM events
    """,
    "q_join_resolve_refs": """
        SELECT n_name, count(*) AS cnt,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q_fuzzy_street_match": f"""
        WITH s AS (SELECT {_STREET_SQL} AS street FROM supplier),
        tk AS (
          SELECT DISTINCT
                 lower(regexp_replace({_STYPE_SQL}, '\\.$', '')) AS token
          FROM s WHERE {_STYPE_SQL} <> ''
        ),
        cand AS (
          SELECT token, canonical,
                 levenshtein(token, lower(canonical)) AS dist
          FROM tk CROSS JOIN (
            SELECT unnest([{_EXPECTED_SQL}]) AS canonical
          )
          WHERE levenshtein(token, lower(canonical)) <= 2
        ),
        best AS (
          SELECT token, canonical, dist,
                 row_number() OVER (
                   PARTITION BY token ORDER BY dist, canonical
                 ) AS rn
          FROM cand
        )
        SELECT token, canonical, CAST(dist AS BIGINT) AS dist
        FROM best WHERE rn = 1
    """,
}
