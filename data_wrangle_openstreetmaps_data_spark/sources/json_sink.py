"""JSON-lines sink (SURVEY.md §2.1 S4) + parquet store (S5).

The reference writes one JSON object per line with json.dumps
(reshape_data, openstreet_kolkata.py:565-584) and then row-at-a-time
inserts into MongoDB (insert_maps, :587-593). Spark-side:

- ``write_json``: ``df.write.json`` — each task writes its partition
  directly; Spark's JSON writer omits null fields, matching the
  reference's "only attach keys when non-empty" document shape (R7).
- ``write_store``: parquet is the idiomatic analytical store standing in
  for the MongoDB collection; a partitionBy on element type mirrors the
  type-filtered access pattern of every downstream query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("ignoreNullFields", "true").json(path)


def read_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)


def write_store(df: DataFrame, path: str, partition_by: str | None = "type",
                mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)


def read_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
