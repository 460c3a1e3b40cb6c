"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (A9 top-k group count — the
reference's Mongo $match/$group/$sort/$limit pipeline,
openstreet_kolkata.py:629-652) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented SURVEY.md §2 operator with its
DuckDB oracle. Implementations live in the
``data_wrangle_openstreetmaps_data_spark`` package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from data_wrangle_openstreetmaps_data_spark.plans import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_topk_group_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for approximate /
    non-SQL-expressible operators → rows-only check)."""
    return Q.oracle_queries()
