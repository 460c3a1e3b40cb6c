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
