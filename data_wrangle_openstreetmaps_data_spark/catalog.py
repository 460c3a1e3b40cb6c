"""Table catalog for the driver-generated test data (TESTDATA.md).

At 100 TB scale these reads would point at a partitioned data lake; the
important property preserved here is that each table is an independent
parquet scan so Catalyst gets per-table column pruning and filter pushdown
(verify with ``df.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one named table from an sf directory.

    The test data stores timestamps as TIMESTAMP(NANOS), which Spark's
    parquet reader rejects by default; ``nanosAsLong`` is a runtime SQL conf,
    set here (not only in our session factory) so the operators also work
    under an externally-provided SparkSession (e.g. the driver harness).
    Nanos columns surface as LongType — use ``nanos_to_ts`` when event-time
    semantics are needed."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def nanos_to_ts(c):
    """Convert a nanos-as-long column to a proper TimestampType.

    EXACT integer division to micros — `(col / 1000).cast("long")` would
    widen the epoch-nanos long to double (ulp ≈ 256 ns at ~1.7e18) and can
    land on the wrong microsecond vs the integer `div` path the DuckDB
    oracles use. Decimal division is exact and overflow-free here."""
    from pyspark.sql import functions as F

    col = F.col(c) if isinstance(c, str) else c
    micros = (col.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    return F.timestamp_micros(micros)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every table; lazy — nothing is scanned until an action runs."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` mirrors the
    DuckDB oracle environment (same table names)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
