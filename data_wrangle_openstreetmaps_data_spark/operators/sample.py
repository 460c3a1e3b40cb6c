"""Sampling operators.

S3 — the reference writes every 10th top-level element to a sample file
(sample_elements, openstreet_kolkata.py:67-77). The deterministic analog
numbers rows by a stable key and keeps i % n == 0 (0-indexed like the
reference's ``enumerate``).

Scale note: ``row_number`` over a global ORDER BY is a single-partition
window — fine for producing a small sample file, wrong as a general
pattern at 100 TB. For scale sampling use ``probabilistic_sample``
(per-row hash, no shuffle, fully parallel) — included as the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def every_nth(df: DataFrame, order_col: str, n: int = 10) -> DataFrame:
    """Deterministic systematic sample: rows 0, n, 2n, … in order_col order."""
    w = Window.orderBy(order_col)
    return (
        df.withColumn("_i", F.row_number().over(w) - 1)
        .filter(F.col("_i") % n == 0)
        .drop("_i")
    )


def probabilistic_sample(df: DataFrame, key_col: str, n: int = 10) -> DataFrame:
    """Scale path: keep rows whose stable key hashes into 1/n of the space.
    No shuffle, no global ordering, identical results on any cluster size."""
    return df.filter(F.pmod(F.xxhash64(F.col(key_col)), F.lit(n)) == 0)
