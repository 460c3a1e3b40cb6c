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


def test_ewma_in_pure_sql(spark):
    """The bounded-window EWMA — collect_list window + zip_with/
    aggregate HOFs — is expressible as literal SQL (the batch form of
    q_streaming_ewma's state contract)."""
    register_views(spark, SF_SMALL)
    tsn = _tsn_sql(spark)
    _assert_sql_matches(spark, "q_ewma", f"""
        WITH e AS (
          SELECT user_id, event_id, value, {tsn} AS tsn FROM events
        ), v AS (
          SELECT user_id, event_id,
                 collect_list(value) OVER (
                   PARTITION BY user_id ORDER BY tsn, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
                 ) AS vals
          FROM e
        )
        SELECT user_id, event_id,
               floor(
                 aggregate(
                   zip_with(vals, sequence(size(vals) - 1, 0),
                            (x, k) -> x * pow(0.5D, k)),
                   CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
                 / (2.0D - pow(0.5D, CAST(size(vals) - 1 AS DOUBLE)))
                 * 10000 + 0.5) / 10000 AS ewma
        FROM v
    """)


def test_interval_overlap_join_in_pure_sql(spark):
    """The bucketed interval×interval overlap join (explode to covered
    buckets, equality join, residual predicate, distinct) as literal
    SQL — no nested-loop cross product in either formulation."""
    register_views(spark, SF_SMALL)
    tsn = _tsn_sql(spark)
    hour = 3_600_000_000
    half = 1_800_000_000
    _assert_sql_matches(spark, "q_interval_overlap_join", f"""
        WITH e AS (
          SELECT user_id, event_type, event_id, value AS val,
                 {tsn} AS tsn
          FROM events
        ), spans AS (
          SELECT user_id, min(tsn) AS a_lo, max(tsn) AS a_hi
          FROM e GROUP BY user_id, floor(tsn / {hour})
        ), wins AS (
          SELECT event_id AS win_id,
                 tsn - {half} AS b_lo, tsn + {half} AS b_hi
          FROM e WHERE event_type = 'error' AND val > 95
        ), sa AS (
          SELECT user_id, a_lo, a_hi,
                 explode(sequence(CAST(floor(a_lo / {hour}) AS BIGINT),
                                  CAST(floor(a_hi / {hour}) AS BIGINT)))
                   AS _bucket
          FROM spans
        ), sb AS (
          SELECT win_id, b_lo, b_hi,
                 explode(sequence(CAST(floor(b_lo / {hour}) AS BIGINT),
                                  CAST(floor(b_hi / {hour}) AS BIGINT)))
                   AS _bucket
          FROM wins
        ), pairs AS (
          SELECT DISTINCT user_id, win_id
          FROM sa JOIN sb USING (_bucket)
          WHERE a_lo <= b_hi AND b_lo <= a_hi
        )
        SELECT user_id, count(DISTINCT win_id) AS n_overlaps
        FROM pairs GROUP BY user_id
        ORDER BY n_overlaps DESC, user_id LIMIT 20
    """)


def test_asof_join_in_pure_sql(spark):
    """As-of join via the union + last(ignoreNulls) forward-fill window
    as literal SQL — one shuffle, no range cross-join."""
    register_views(spark, SF_SMALL)
    tsn = _tsn_sql(spark)
    _assert_sql_matches(spark, "q_asof_join", f"""
        WITH e AS (
          SELECT user_id, event_id, event_type, value, {tsn} AS tsn
          FROM events
        ), p AS (
          SELECT user_id, event_id, tsn AS ts FROM e
          WHERE event_type = 'purchase'
        ), s AS (
          SELECT user_id, tsn AS ts, max(value) AS state FROM e
          WHERE event_type = 'signup' GROUP BY user_id, tsn
        ), u AS (
          SELECT user_id, ts AS _t, 1 AS _side, event_id, ts,
                 CAST(NULL AS DOUBLE) AS _r_state,
                 CAST(NULL AS BIGINT) AS _rt
          FROM p
          UNION ALL
          SELECT user_id, ts, 0, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                 state, ts
          FROM s
        ), f AS (
          SELECT user_id, _side, event_id, ts,
                 last(_rt, true) OVER w AS matched_time,
                 last(_r_state, true) OVER w AS matched_state
          FROM u
          WINDOW w AS (PARTITION BY user_id ORDER BY _t, _side
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, event_id, ts, matched_time, matched_state
        FROM f WHERE _side = 1
    """)


def test_hopping_window_in_pure_sql(spark):
    """Hopping event-time windows via the SQL window() table-valued
    grouping expression (the batch form of q_streaming_hopping_counts)."""
    register_views(spark, SF_SMALL)
    tsn = _tsn_sql(spark)
    _assert_sql_matches(spark, "q_hopping_window", f"""
        SELECT date_format(window.start, 'yyyy-MM-dd') AS w_start,
               event_type, count(*) AS cnt,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS val_sum
        FROM (SELECT timestamp_micros({tsn}) AS ts2, event_type, value
              FROM events)
        GROUP BY window(ts2, '2 days', '1 day'), event_type
    """)


def test_grouping_sets_window_combo_in_pure_sql(spark):
    """GROUPING SETS composed with a rank window in one literal SQL
    statement — the combo shape: Expand + aggregate + per-level
    window."""
    register_views(spark, SF_SMALL)
    _assert_sql_matches(spark, "q_grouping_sets_ranked", """
        WITH e AS (
          SELECT event_type, user_id % 10 AS cohort, value FROM events
        ), g AS (
          SELECT event_type, cohort, count(*) AS cnt,
                 floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       * 10000 + 0.5) / 10000 AS val_sum,
                 CAST(grouping_id() AS INT) AS lvl
          FROM e GROUP BY GROUPING SETS ((event_type), (cohort), ())
        )
        SELECT event_type, cohort, lvl, cnt, val_sum,
               rank() OVER (PARTITION BY lvl
                            ORDER BY cnt DESC, event_type, cohort) AS rnk
        FROM g
    """)


def test_lateral_join_in_pure_sql(spark):
    """Correlated LATERAL subquery with per-group ORDER BY + LIMIT —
    the SQL-standard alternative spelling of top-k-per-group — must
    match the window-function DataFrame form exactly."""
    register_views(spark, SF_SMALL)
    _assert_sql_matches(spark, "q_topk_per_group", """
        WITH counted AS (
          SELECT l_returnflag, l_linestatus, count(*) AS cnt
          FROM lineitem GROUP BY 1, 2
        ), grps AS (SELECT DISTINCT l_returnflag FROM counted)
        SELECT t.l_returnflag, t.l_linestatus, t.cnt, CAST(t.rn AS INT) AS rn
        FROM grps g,
        LATERAL (
          SELECT c.l_returnflag, c.l_linestatus, c.cnt,
                 row_number() OVER (ORDER BY c.cnt DESC, c.l_linestatus)
                   AS rn
          FROM counted c WHERE c.l_returnflag = g.l_returnflag
          ORDER BY c.cnt DESC, c.l_linestatus LIMIT 2
        ) t
    """)


def test_recursive_cte_in_pure_sql(spark):
    """Spark 4 ``WITH RECURSIVE`` as literal SQL text must reproduce the
    registry's plan-literal unrolled hierarchy walk exactly (the DuckDB
    oracle runs the very same CTE with `//` in place of `div`)."""
    from data_wrangle_openstreetmaps_data_spark.plans.queries.graphs import (
        RECURSIVE_HIERARCHY_SQL,
    )

    register_views(spark, SF_SMALL)
    _assert_sql_matches(
        spark,
        "q_recursive_hierarchy",
        RECURSIVE_HIERARCHY_SQL.format(div="div"),
    )


def test_weighted_median_in_pure_sql(spark):
    """Weighted median as one literal SQL statement — the
    cumulative-weight-crossing argmin shape (running sum window +
    row_number over the crossing rows), matching the DataFrame form
    exactly."""
    register_views(spark, SF_SMALL)
    _assert_sql_matches(spark, "q_weighted_median", """
        WITH d AS (
          SELECT p_brand AS brand,
                 CAST(CAST(l_extendedprice AS DECIMAL(20,6)) * 100
                      AS BIGINT) AS cents,
                 CAST(l_quantity AS BIGINT) AS w,
                 l_orderkey, l_linenumber
          FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        tot AS (
          SELECT brand, CAST(sum(w) AS BIGINT) AS wtot
          FROM d GROUP BY brand
        ),
        c AS (
          SELECT d.brand, cents, l_orderkey, l_linenumber, wtot,
                 sum(w) OVER (
                   PARTITION BY d.brand
                   ORDER BY cents, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cw
          FROM d JOIN tot ON d.brand = tot.brand
        ),
        hit AS (
          SELECT brand, wtot, cents,
                 row_number() OVER (
                   PARTITION BY brand
                   ORDER BY cents, l_orderkey, l_linenumber
                 ) AS rn
          FROM c WHERE cw * 2 >= wtot
        )
        SELECT brand, wtot, cents AS wmedian_cents
        FROM hit WHERE rn = 1 ORDER BY brand
    """)


def test_repeated_spans_in_pure_sql(spark):
    """Span-level substring dedup as one literal SQL statement — proves
    the interval-union ISLAND MERGE shape (running-max window gap flags
    + running-sum island ids + per-island extent agg) plus windowed
    span fingerprinting (LATERAL VIEW explode + slice) are reachable
    through spark.sql, matching q_repeated_spans exactly."""
    register_views(spark, SF_SMALL)
    _assert_sql_matches(spark, "q_repeated_spans", r"""
        WITH toked AS (
          SELECT doc_id,
                 filter(split(lower(text), '\\s+'), t -> t != '') AS toks
          FROM documents
        ),
        sized AS (
          SELECT doc_id, toks, size(toks) AS n_tokens
          FROM toked WHERE size(toks) >= 8
        ),
        wins AS (
          SELECT doc_id, n_tokens, start,
                 md5(array_join(slice(toks, start, 8), ' ')) AS h
          FROM sized LATERAL VIEW explode(sequence(1, n_tokens - 7)) AS start
        ),
        dup AS (
          SELECT h, count(*) AS occ FROM wins GROUP BY h
          HAVING count(*) >= 2
        ),
        dw AS (
          SELECT w.doc_id, w.n_tokens, w.start, w.start + 7 AS e, w.h
          FROM wins w JOIN dup USING (h)
        ),
        isl AS (
          SELECT doc_id, start, e,
                 CASE WHEN start > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ), -1) THEN 1 ELSE 0 END AS ni
          FROM dw
        ),
        isl2 AS (
          SELECT doc_id, start, e,
                 sum(ni) OVER (
                   PARTITION BY doc_id ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS island
          FROM isl
        ),
        cov AS (
          SELECT doc_id, CAST(sum(mx - mn + 1) AS BIGINT) AS covered_tokens
          FROM (
            SELECT doc_id, island, max(e) AS mx, min(start) AS mn
            FROM isl2 GROUP BY doc_id, island
          ) GROUP BY doc_id
        ),
        perdoc AS (
          SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS dup_windows,
                 CAST(count(DISTINCT h) AS BIGINT) AS dup_spans
          FROM dw GROUP BY doc_id, n_tokens
        ),
        scal AS (
          SELECT CAST(count(*) AS BIGINT) AS corpus_dup_spans,
                 CAST(coalesce(sum(occ), 0) AS BIGINT) AS corpus_dup_windows
          FROM dup
        ),
        top AS (
          SELECT p.doc_id, n_tokens, dup_windows, dup_spans, covered_tokens,
                 floor(covered_tokens / n_tokens * 10000 + 0.5) / 10000
                   AS coverage
          FROM perdoc p JOIN cov USING (doc_id)
          ORDER BY coverage DESC, covered_tokens DESC, doc_id
          LIMIT 50
        )
        SELECT top.*, corpus_dup_spans, corpus_dup_windows FROM top, scal
    """)


def test_shapley_attribution_in_pure_sql(spark):
    """Exact set-Shapley attribution (integer twelfths, argmax-struct
    last touch, scalar converter count) as literal SQL — parity shape
    20: the whole credit model is one declarative statement."""
    register_views(spark, SF_SMALL)
    tsn = _tsn_sql(spark)
    _assert_sql_matches(spark, "q_attribution_shapley", f"""
        WITH e AS (
          SELECT user_id, event_id, event_type, {tsn} AS tsn FROM events
        ),
        fp AS (
          SELECT user_id, min(tsn) AS ft FROM e
          WHERE event_type = 'purchase' GROUP BY user_id
        ),
        pre AS (
          SELECT e.* FROM e JOIN fp USING (user_id)
          WHERE e.tsn < fp.ft AND e.event_type <> 'purchase'
        ),
        uu AS (
          SELECT user_id, count(DISTINCT event_type) AS s_size,
                 max(struct(tsn, event_id, event_type)).event_type
                   AS last_type
          FROM pre GROUP BY user_id
        ),
        uc AS (SELECT DISTINCT user_id, event_type FROM pre),
        n AS (SELECT count(*) AS n_converters FROM uu)
        SELECT uc.event_type AS channel,
               count(*) AS users_touched,
               count(CASE WHEN u.last_type = uc.event_type THEN 1 END)
                 AS last_touch_users,
               count(CASE WHEN u.s_size = 1 THEN 1 END)
                 AS only_channel_users,
               sum(12 div u.s_size) AS shapley_twelfths,
               min(n.n_converters) AS n_converters,
               floor(sum(12 div u.s_size)
                     / (12 * min(n.n_converters)) * 10000 + 0.5) / 10000
                 AS shapley_pct
        FROM uc JOIN uu u USING (user_id) CROSS JOIN n
        GROUP BY uc.event_type
    """)


def test_small_cell_suppression_in_pure_sql(spark):
    """Small-cell suppression with one complementary round (window
    sums + window argmin keys) as literal SQL — parity shape 21."""
    register_views(spark, SF_SMALL)
    _assert_sql_matches(spark, "q_small_cell_suppression", """
        WITH base AS (
          SELECT c_nationkey AS nationkey, c_mktsegment AS seg,
                 CASE WHEN c_custkey % 199 = 0
                      THEN 'rare' ELSE 'common' END AS band
          FROM customer
        ),
        cells AS (
          SELECT nationkey, concat(seg, '/', band) AS segment,
                 array_position(
                   array('AUTOMOBILE','BUILDING','FURNITURE',
                         'HOUSEHOLD','MACHINERY'), seg)
                   + CASE WHEN band = 'rare' THEN 5 ELSE 0 END AS si,
                 count(*) AS cnt,
                 count(*) < 5 AS prim
          FROM base GROUP BY nationkey, seg, band
        ),
        r AS (
          SELECT *,
                 sum(CASE WHEN prim THEN 1 ELSE 0 END)
                   OVER (PARTITION BY nationkey) AS n_prim_row,
                 min(CASE WHEN NOT prim THEN cnt * 32 + si END)
                   OVER (PARTITION BY nationkey) AS tgt_row
          FROM cells
        ),
        r2 AS (
          SELECT *, (NOT prim) AND n_prim_row = 1
                     AND cnt * 32 + si = tgt_row AS comp_row
          FROM r
        ),
        r3 AS (
          SELECT *, prim OR comp_row AS supp1,
                 sum(CASE WHEN prim OR comp_row THEN 1 ELSE 0 END)
                   OVER (PARTITION BY segment) AS n_supp1_col,
                 min(CASE WHEN NOT (prim OR comp_row)
                          THEN cnt * 32 + nationkey END)
                   OVER (PARTITION BY segment) AS tgt_col
          FROM r2
        ),
        r4 AS (
          SELECT *, (NOT supp1) AND n_supp1_col = 1
                     AND cnt * 32 + nationkey = tgt_col AS comp_col
          FROM r3
        )
        SELECT nationkey, segment, cnt,
               CASE WHEN NOT (prim OR comp_row OR comp_col)
                    THEN cnt END AS published,
               CASE WHEN prim THEN 'primary'
                    WHEN comp_row THEN 'comp_row'
                    WHEN comp_col THEN 'comp_col'
                    ELSE 'ok' END AS status
        FROM r4
    """)


def test_bitemporal_asof_in_pure_sql(spark):
    """Bitemporal as-of (versions table + one max(struct) argmax for
    both knowledge epochs, cent-exact restatements) as literal SQL —
    parity shape 22."""
    register_views(spark, SF_SMALL)
    _assert_sql_matches(spark, "q_bitemporal_asof", """
        WITH c AS (
          SELECT o_orderkey, date_format(o_orderdate, 'yyyy-MM') AS month,
                 CAST(CAST(o_totalprice AS DECIMAL(20,6)) * 100
                      AS BIGINT) AS cents
          FROM orders
        ),
        vers AS (
          SELECT o_orderkey, month, cents, 0 AS tx FROM c
          UNION ALL
          SELECT o_orderkey, month, cents + cents div 10, 1 FROM c
          WHERE o_orderkey % 11 = 0
        ),
        per_key AS (
          SELECT o_orderkey, month,
                 max(CASE WHEN tx <= 0
                     THEN struct(tx, cents) END).cents AS c_asof0,
                 max(struct(tx, cents)).cents AS c_asof1,
                 max(tx) AS maxtx
          FROM vers GROUP BY 1, 2
        )
        SELECT month,
               sum(c_asof0) AS cents_asof0,
               sum(c_asof1) AS cents_asof1,
               sum(c_asof1) - sum(c_asof0) AS restatement_cents,
               count(CASE WHEN maxtx = 1 THEN 1 END) AS n_restated
        FROM per_key GROUP BY month
    """)
