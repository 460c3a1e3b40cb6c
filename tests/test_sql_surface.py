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


def _tsn_sql(spark) -> str:
    """Event-time normalizer as literal SQL text, mirroring
    catalog.event_ts_us for the two shipped vintages."""
    from data_wrangle_openstreetmaps_data_spark.catalog import table

    dt = dict(table(spark, SF_SMALL, "events").dtypes)["ts"]
    if dt == "bigint":
        return "CAST(CAST(ts AS DECIMAL(38,0)) / 1000 AS BIGINT)"
    return "unix_micros(CAST(ts AS TIMESTAMP))"


def _assert_sql_matches(spark, name: str, sql: str) -> None:
    def key(t):  # None-safe total order (grouping sets emit NULL keys)
        return [(v is None, str(v)) for v in t]

    want_df = Q.REGISTRY[name].spark(spark, SF_SMALL)
    got_df = spark.sql(sql)
    assert sorted(got_df.columns) == sorted(want_df.columns), name
    got = sorted(map(tuple, got_df.select(*want_df.columns).collect()), key=key)
    want = sorted(map(tuple, want_df.collect()), key=key)
    assert got == want, name


def test_window_functions_in_pure_sql(spark):
    """lag/rank/decimal running sum as literal SQL (named WINDOW clause)
    must match the DataFrame window query exactly."""
    register_views(spark, SF_SMALL)
    tsn = _tsn_sql(spark)
    _assert_sql_matches(spark, "q_window_functions", f"""
        SELECT event_id, user_id,
               lag(value, 1) OVER w AS prev_value,
               rank() OVER w AS rnk,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY {tsn}, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS DOUBLE) * 10000 + 0.5) / 10000 AS run_sum
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY {tsn}, event_id)
    """)


def test_rank_family_in_pure_sql(spark):
    register_views(spark, SF_SMALL)
    _assert_sql_matches(spark, "q_rank_functions", """
        WITH totals AS (
          SELECT event_type, user_id,
                 CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total
          FROM events GROUP BY event_type, user_id
        ), ranked AS (
          SELECT event_type, user_id,
                 floor(total * 10000 + 0.5) / 10000 AS total4,
                 rank() OVER w AS rnk,
                 dense_rank() OVER w AS drnk,
                 floor(percent_rank() OVER w * 10000 + 0.5) / 10000 AS prnk,
                 floor(cume_dist() OVER w * 10000 + 0.5) / 10000 AS cdist
          FROM totals
          WINDOW w AS (PARTITION BY event_type ORDER BY total DESC)
        )
        SELECT * FROM ranked WHERE rnk <= 10
    """)


def test_grouping_sets_in_pure_sql(spark):
    """GROUP BY GROUPING SETS literal syntax must match the DataFrame
    groupingSets API (one Expand + one aggregate either way)."""
    register_views(spark, SF_SMALL)
    _assert_sql_matches(spark, "q_grouping_sets", """
        SELECT event_type, cohort, count(*) AS cnt,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS val_sum
        FROM (SELECT event_type, user_id % 10 AS cohort, value FROM events)
        GROUP BY GROUPING SETS ((event_type), (cohort), ())
    """)


def test_rollup_in_pure_sql(spark):
    register_views(spark, SF_SMALL)
    _assert_sql_matches(spark, "q_rollup_counts", """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """)


def test_merge_shape_in_pure_sql(spark):
    """The MERGE/CDC-apply semantics as literal SQL. Spark's MERGE INTO
    statement needs a row-level-operation catalog (Delta/Iceberg), which
    plain parquet views don't provide — the portable SQL form is the
    full-outer join with change-rows-win, which is exactly what
    merge_upsert plans; both sides must agree row for row."""
    register_views(spark, SF_SMALL)
    _assert_sql_matches(spark, "q_cdc_merge", """
        WITH snap AS (
          SELECT o_orderkey, o_orderstatus AS status,
                 o_totalprice AS totalprice
          FROM orders
        ), chg AS (
          SELECT o_orderkey, 'X' AS status,
                 floor(totalprice * 1.1 * 10000 + 0.5) / 10000 AS totalprice
          FROM snap WHERE o_orderkey % 7 = 0
          UNION ALL
          SELECT o_orderkey + 10000000 AS o_orderkey, status, totalprice
          FROM snap WHERE o_orderkey % 97 = 0
        )
        SELECT coalesce(c.o_orderkey, s.o_orderkey) AS o_orderkey,
               CASE WHEN c.o_orderkey IS NOT NULL
                    THEN c.status ELSE s.status END AS status,
               floor(CASE WHEN c.o_orderkey IS NOT NULL
                          THEN c.totalprice ELSE s.totalprice END
                     * 10000 + 0.5) / 10000 AS tp
        FROM snap s FULL OUTER JOIN chg c ON s.o_orderkey = c.o_orderkey
    """)


def test_latest_per_key_in_pure_sql(spark):
    """The argmax-aggregate compaction (max over struct) is expressible
    as literal SQL too — same partial+final aggregate plan."""
    register_views(spark, SF_SMALL)
    tsn = _tsn_sql(spark)
    _assert_sql_matches(spark, "q_latest_per_key", f"""
        WITH e AS (
          SELECT user_id, {tsn} AS tsn, event_id, event_type FROM events
        ), m AS (
          SELECT user_id,
                 max(struct(tsn, event_id, event_type)) AS m
          FROM e GROUP BY user_id
        )
        SELECT user_id, m.tsn AS tsn, m.event_id AS event_id,
               m.event_type AS event_type
        FROM m
    """)


def test_sessionize_in_pure_sql(spark):
    """Gaps-and-islands sessionization as literal SQL (lag + running
    sum + island aggregate) must equal sessionize_batch."""
    register_views(spark, SF_SMALL)
    tsn = _tsn_sql(spark)
    gap = 43_200_000_000  # 12h in us, the q_sessionize constant
    _assert_sql_matches(spark, "q_sessionize", f"""
        WITH e AS (SELECT user_id, {tsn} AS ts FROM events),
        l AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          FROM e
        ), f AS (
          SELECT user_id, ts,
                 CASE WHEN prev IS NULL OR ts - prev > {gap}
                      THEN 1 ELSE 0 END AS new_s
          FROM l
        ), s AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM f
        )
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events
        FROM s GROUP BY user_id, sid
    """)
