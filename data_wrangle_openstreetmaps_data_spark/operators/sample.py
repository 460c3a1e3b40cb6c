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


def sample_per_group(
    df: DataFrame,
    n: int,
    strata_col: str,
    id_col: str,
) -> DataFrame:
    """Exact-n deterministic sample per stratum: rank rows inside each
    stratum by the portable md5 hash of their id (tie-broken by id) and
    keep the first n — a fixed-size stratified sample that is
    reproducible across runs, engines, and cluster sizes (no rand(), no
    reservoir state).

    One shuffle keyed by the stratum; the per-stratum sort is the cost.
    At 100 TB with huge strata, swap the full window sort for the
    two-phase top-n pattern (per-partition top-n, then merge — see
    operators/topk.py): the semantics stay identical because the ranking
    key is a pure function of the row."""
    from pyspark.sql import Window

    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )

    if "_rk" in df.columns:
        raise ValueError("input already has a _rk column")
    h = portable_token_hash(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )
