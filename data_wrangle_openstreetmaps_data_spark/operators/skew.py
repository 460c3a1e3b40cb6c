"""Skew-handling join (100 TB design tool; no reference analog).

AQE's skew-join splitting handles most skew automatically, but a join
whose hot keys are KNOWN (e.g. the empty/default user, a mega-city key)
can be salted explicitly so no single task ever owns a hot key's whole
partition:

- big side: salt = pmod(xxhash64(whole row id), R) — deterministic,
  no rand() (reproducible across retries, which rand() is not).
- small side: replicated R× with an exploded salt column.
- join on (key, salt) → hot keys spread over R tasks.

R multiplies the small side, so keep it modest (8-32) and only salt
joins whose build side is genuinely small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_cols: "list[str] | None" = None,
) -> DataFrame:
    """Equi-join big⋈small on `on`, salted into `salt_buckets` sub-keys.

    Result equals ``big.join(small, on, how)`` exactly for inner/left
    joins; right/full outer are rejected — the replicated small side
    would emit one row per salt bucket for unmatched keys.

    `salt_cols` picks which big-side columns seed the per-row salt hash
    (pass a stable row-id column when you have one). Default: every
    hashable column — map columns are excluded because xxhash64 rejects
    them, and hashing a narrow stable subset beats hashing wide payloads
    anyway."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "unmatched small-side rows would be duplicated per salt bucket"
        )
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError("input already has a _salt column")
    if salt_cols is None:
        # xxhash64 rejects maps at ANY nesting depth (array<map<...>>,
        # struct with a map field) — match the type token "map<" exactly
        # so struct FIELD NAMES containing "map" (remap:string) stay
        # hashable
        salt_cols = [c for c, t in big.dtypes if "map<" not in t]
        if not salt_cols:
            salt_cols = [on]
    else:
        missing = set(salt_cols) - set(big.columns)
        if missing:
            raise ValueError(f"salt_cols not in big frame: {sorted(missing)}")
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets)).cast("int"),
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_big.join(salted_small, on=[on, "_salt"], how=how).drop("_salt")


def skewed_group_count(df: DataFrame, key: str,
                       salt_buckets: int = 16) -> DataFrame:
    """Two-phase count for a skewed group key: partial count per
    (key, salt) then final sum per key. Spark's partial aggregation makes
    this redundant for plain count — included as the explicit pattern for
    aggregates WITHOUT a map-side partial (e.g. exact distinct lists)."""
    return (
        df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
        )
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(key)
        .agg(F.sum("c").alias("cnt"))
    )
