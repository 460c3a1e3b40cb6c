"""SQL-surface parity: every capability is reachable through
``spark.sql`` over registered views, not just the DataFrame API — the
same declarative plan feeds Catalyst either way."""

from __future__ import annotations

from data_wrangle_openstreetmaps_data_spark.catalog import register_views
from data_wrangle_openstreetmaps_data_spark.plans import queries as Q
from tests.conftest import SF_SMALL


def test_flagship_in_pure_sql_matches_dataframe(spark):
    register_views(spark, SF_SMALL)
    sql = spark.sql(
        """
        SELECT event_type, count(*) AS cnt FROM events
        WHERE event_type IS NOT NULL
        GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 10
        """
    ).collect()
    df = Q.REGISTRY["q_topk_group_count"].spark(spark, SF_SMALL).collect()
    assert [tuple(r) for r in sql] == [tuple(r) for r in df]


def test_cleaning_exprs_work_in_sql(spark):
    from data_wrangle_openstreetmaps_data_spark.functions import cleaning

    # the mapping logic compiles to a plain CASE chain usable in SQL text
    df = spark.createDataFrame([("Park st",), ("MG Rd.",)], ["street"])
    df.createOrReplaceTempView("streets")
    got = spark.sql(
        "SELECT street, regexp_extract(street, r'(?i)\\b\\S+\\.?$', 0) AS tok "
        "FROM streets"
    ).collect()
    toks = {r["street"]: r["tok"] for r in got}
    assert toks == {"Park st": "st", "MG Rd.": "Rd."}


def test_tpch_in_pure_sql_matches_dataframe(spark):
    """A sample of the TPC-H family expressed as literal spark.sql text
    over the registered views must return exactly the DataFrame-API
    results — same Catalyst plan space either way."""
    register_views(spark, SF_SMALL)
    cases = {
        "q_tpch_q6": """
            SELECT CAST(sum(CAST(l_extendedprice * l_discount
                     AS DECIMAL(20,6))) AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q_tpch_q5": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(20,6))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'
            GROUP BY n_name
        """,
        "q_tpch_q13": """
            WITH counts AS (
              SELECT o_custkey, count(*) AS cnt FROM orders
              WHERE o_orderpriority <> '4-NOT SPECIFIED'
              GROUP BY o_custkey
            )
            SELECT coalesce(cnt, 0) AS c_count, count(*) AS custdist
            FROM customer LEFT JOIN counts ON c_custkey = o_custkey
            GROUP BY c_count
        """,
    }
    for name, sql in cases.items():
        got = sorted(map(tuple, spark.sql(sql).collect()))
        want = sorted(
            map(tuple, Q.REGISTRY[name].spark(spark, SF_SMALL).collect())
        )
        assert got == want, name
