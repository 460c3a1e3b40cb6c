"""Audit operators (reference §"Audit ... by SAX parsing", SURVEY.md §2.3).

The reference folds each audit into a driver-side dict over 4+ full XML
re-parses (openstreet_kolkata.py:87-166,328-349). Here every audit is a
grouped aggregation returning a DataFrame: Spark's partial aggregation
(map-side combine) + shuffle replaces the single-threaded fold, and one
cached source DataFrame replaces the re-parses. No driver-side state —
this is what makes the audits valid at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.functions.cleaning import (
    EXPECTED_STREET_TYPES,
    key_class,
    postcode_bucket,
    postcode_digits,
    postcode_valid,
    street_type,
)


def count_tags(df: DataFrame, tag_col: str = "tag") -> DataFrame:
    """A1 — histogram of element tags (count_tags, openstreet_kolkata.py:87-95)."""
    return df.groupBy(tag_col).agg(F.count(F.lit(1)).alias("cnt"))


def audit_keys(df: DataFrame, key_col: str = "k") -> DataFrame:
    """A2/F4 — count of keys per regex class (audit_keys/key_type,
    openstreet_kolkata.py:114-137). Returns (key_class, cnt) rows."""
    return (
        df.select(key_class(key_col).alias("key_class"))
        .groupBy("key_class")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def audit_keys_wide(df: DataFrame, key_col: str = "k") -> DataFrame:
    """A2 variant matching the reference's fixed 4-bucket dict shape
    (openstreet_kolkata.py:131): one row, four columns. Uses count(when(...))
    so partial aggregation applies and types match the oracle (bigint)."""
    cls = key_class(key_col)
    return df.agg(
        *[
            F.count(F.when(cls == b, 1)).alias(b)
            for b in ("lower", "lower_colon", "problemchars", "other")
        ]
    )


def audit_users(
    df: DataFrame, user_col: str = "user", type_col: str = "type"
) -> DataFrame:
    """A3 — contribution count per user over node+way elements
    (audit_users, openstreet_kolkata.py:149-166)."""
    return (
        df.filter(F.col(type_col).isin("node", "way"))
        .groupBy(user_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def distinct_count(df: DataFrame, col: str | Column) -> DataFrame:
    """A7 — countDistinct, incl. dotted paths into struct columns
    (db.maps.distinct("created.user"), openstreet_kolkata.py:601-602)."""
    c = F.col(col) if isinstance(col, str) else col
    return df.agg(F.countDistinct(c).alias("cnt"))


def approx_distinct_count(df: DataFrame, col: str | Column,
                          rsd: float = 0.02) -> DataFrame:
    """Scale variant of A7: HyperLogLog++ approximate distinct. Exact
    countDistinct shuffles every distinct value; the sketch shuffles a
    fixed ~1.5KB state per partition — the difference between feasible
    and not at 100 TB user-id cardinalities. Deterministic for a given
    input multiset (sketch merge is commutative/associative)."""
    c = F.col(col) if isinstance(col, str) else col
    return df.agg(F.approx_count_distinct(c, rsd).alias("cnt"))


def audit_street_types(df: DataFrame, street_col: str = "street") -> DataFrame:
    """A4 — collect full street names per non-whitelisted street-type token
    (audit_street_type, openstreet_kolkata.py:175-190). Unmatched names land
    in the 'UNKNOWN' bucket.  Set output is sorted for determinism."""
    stype = street_type(street_col)
    keyed = df.select(
        F.when(stype == "", F.lit("UNKNOWN")).otherwise(stype).alias("stype"),
        F.col(street_col).alias("street"),
    ).filter(~F.col("stype").isin(*EXPECTED_STREET_TYPES))
    return keyed.groupBy("stype").agg(
        F.array_sort(F.collect_set("street")).alias("streets"),
        F.count(F.lit(1)).alias("cnt"),
    )


def audit_city_names(df: DataFrame, city_col: str = "city") -> DataFrame:
    """A5 — global distinct city-name set (audit_city_name,
    openstreet_kolkata.py:250-251) as a distinct projection."""
    return df.select(F.col(city_col).alias("city")).distinct()


def audit_postcodes(
    df: DataFrame, key_col: str = "k", value_col: str = "v"
) -> DataFrame:
    """A6 — distinct postcodes per derived bucket key
    (audit_postcode, openstreet_kolkata.py:270-289).

    bucket = key ++ len(digit run) (or ++'0' with the raw value kept when no
    digits); validity = any 6-digit code in the bucket."""
    digits = postcode_digits(value_col)
    code = F.when(digits == "", F.col(value_col)).otherwise(digits)
    keyed = df.select(
        postcode_bucket(key_col, value_col).alias("bucket"),
        code.alias("code"),
        postcode_valid(value_col).alias("valid"),
    )
    return keyed.groupBy("bucket").agg(
        F.array_sort(F.collect_set("code")).alias("codes"),
        F.max("valid").alias("any_valid"),
    )
