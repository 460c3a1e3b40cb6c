"""Data-quality validation operators (expectations-style).

A training-data pipeline gates every ingest batch on cheap invariants;
each check here is a conditional aggregate (one pass, partial-agg
friendly) or an anti-join (referential integrity), returning violation
COUNTS — never failing row-by-row, never collecting rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_non_null(df: DataFrame, cols: list[str]) -> list[Column]:
    return [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}") for c in cols
    ]


def check_range(df: DataFrame, col: str, lo: float, hi: float) -> Column:
    c = F.col(col)
    return F.count(F.when((c < lo) | (c > hi), 1)).alias(f"oob_{col}")


def check_unique(df: DataFrame, col: str) -> DataFrame:
    """Rows whose key occurs more than once (0 rows = unique)."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Child rows with no matching parent (anti join — one shuffle,
    broadcast when the parent is small)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)),
        on=child_key,
        how="left_anti",
    )


def profile(df: DataFrame, cols: list[str] | None = None,
            exact: bool = False) -> DataFrame:
    """Per-column profile in ONE pass: nulls, distinct, min/max.
    Long format (column, metric, value-as-string) so heterogeneous column
    types coexist; the single agg keeps it one scan regardless of column
    count (vs one job per column).

    ``exact=False`` (default) uses approx_count_distinct — the 100 TB
    path (HLL sketch, no distinct-expand). ``exact=True`` swaps in exact
    count(DISTINCT) for cross-engine-checkable output (the oracle path);
    Spark plans multiple distincts via one Expand, acceptable at audit
    scale."""
    cols = cols or df.columns
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        for m in ("nulls", "distinct", "min", "max"):
            stack_args += [F.lit(f"{c}:{m}"), F.col(f"{c}__{m}").cast("string")]
    n = len(cols) * 4
    return wide.select(
        F.stack(F.lit(n), *stack_args).alias("metric", "value")
    )


def quality_report(
    df: DataFrame,
    non_null: list[str] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
    unique: str | None = None,
) -> DataFrame:
    """One-row violation report; 0 everywhere = batch passes the gate."""
    aggs = list(check_non_null(df, list(non_null)))
    for col, (lo, hi) in (ranges or {}).items():
        aggs.append(check_range(df, col, lo, hi))
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    report = df.agg(*aggs)
    if unique is not None:
        dup = check_unique(df, unique).agg(
            F.count(F.lit(1)).alias(f"dup_keys_{unique}")
        )
        report = report.crossJoin(dup)
    return report
