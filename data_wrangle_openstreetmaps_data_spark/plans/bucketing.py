"""Bucketed co-located joins (100 TB design tool; no reference analog).

A fact table repeatedly joined on the same key should be *bucketed* on
that key: both sides hash-partitioned into N buckets at WRITE time, so
every subsequent join is a zero-shuffle sort-merge of co-located buckets.
This is the storage-level answer to "minimize shuffles" — pay the
partitioning once, reuse it for every downstream join.

``save_bucketed`` + ``bucketed_join_plan_has_no_exchange`` demonstrate and
*verify* the property (the test asserts the physical plan contains no
Exchange on the bucketed key).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table_name: str, key: str,
                  n_buckets: int = 8) -> None:
    spark = df.sparkSession
    # idempotent: a prior session's in-memory catalog may be gone while the
    # managed location survives — drop both before writing
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name)
    if os.path.exists(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def join_bucketed(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Sort-merge join of two bucketed tables. The merge hint keeps the
    planner from choosing broadcast on small test data — on real data the
    bucketed sort-merge IS the plan of record (both sides pre-hashed and
    pre-sorted on disk → zero shuffle, streaming merge)."""
    left = spark.table(left_table).hint("merge")
    return left.join(spark.table(right_table), on=key)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True iff the executed plan repartitions anything (shuffle Exchange;
    broadcast exchanges don't move the big side and don't count)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
