"""End-to-end wrangle pipeline — the ``wrangle_maps`` equivalent
(openstreet_kolkata.py:657-683), Spark-first.

Reference shape: 6 sequential full re-parses of the same XML file (4
audits + clean + reshape), driver-side dict accumulators, then row-at-a-
time Mongo inserts and server-side query pipelines (SURVEY.md §3.1).

Spark shape: ONE cached raw-elements DataFrame feeds every audit; clean +
reshape is a single narrow ``select`` (no shuffle); sinks are bulk writes;
queries are DataFrame aggregations on the reshaped store. ``df.cache()``
replaces the 6-scan pattern — at 100 TB you'd swap cache() for a
persisted bronze table, which is the same plan with a different storage
level.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.operators import audit as audit_ops
from data_wrangle_openstreetmaps_data_spark.operators.reshape import shape_elements
from data_wrangle_openstreetmaps_data_spark.operators.topk import topk_group_count
from data_wrangle_openstreetmaps_data_spark.sources import json_sink, osm


@dataclass
class WrangleResult:
    """DataFrames for every phase output; all lazy except the cached source."""

    raw: DataFrame
    docs: DataFrame
    audits: dict[str, DataFrame] = field(default_factory=dict)
    queries: dict[str, DataFrame] = field(default_factory=dict)


def wrangle_maps(
    spark: SparkSession,
    osm_path: str,
    out_json: str | None = None,
    out_store: str | None = None,
) -> WrangleResult:
    """audit → clean+reshape → sink → query, one cached scan."""
    raw = osm.read_osm(spark, osm_path).cache()

    exploded_tags = raw.select(
        "type", F.explode_outer("tags").alias("t")
    ).select("type", F.col("t.k").alias("k"), F.col("t.v").alias("v"))

    audits = {
        # audit_tags (openstreet_kolkata.py:97-101)
        "tags": audit_ops.count_tags(raw, "type"),
        # audit_keys (:130-137)
        "keys": audit_ops.audit_keys_wide(
            exploded_tags.filter(F.col("k").isNotNull()), "k"
        ),
        # audit_users (:149-166)
        "users": audit_ops.audit_users(raw),
        # audit_addresses (:351-354)
        "street_types": audit_ops.audit_street_types(
            exploded_tags.filter(F.col("k") == "addr:street").select(
                F.col("v").alias("street")
            )
        ),
        "city_names": audit_ops.audit_city_names(
            exploded_tags.filter(F.col("k") == "addr:city").select(
                F.col("v").alias("city")
            )
        ),
        "postcodes": audit_ops.audit_postcodes(
            exploded_tags.filter(
                F.col("k").startswith("addr:post") & F.col("k").endswith("code")
            )
        ),
    }

    # clean phase (openstreet_kolkata.py:665): audits re-run over cleaned
    # values — the reference re-parses + re-cleans; here it's the same
    # cached scan with the cleaning expression applied
    from data_wrangle_openstreetmaps_data_spark.operators.reshape import clean_tags

    cleaned_tags = clean_tags(raw).select(
        "type", F.explode_outer("tags").alias("t")
    ).select("type", F.col("t.k").alias("k"), F.col("t.v").alias("v"))
    audits["street_types_after_clean"] = audit_ops.audit_street_types(
        cleaned_tags.filter(F.col("k") == "addr:street").select(
            F.col("v").alias("street")
        )
    )
    audits["city_names_after_clean"] = audit_ops.audit_city_names(
        cleaned_tags.filter(F.col("k") == "addr:city").select(
            F.col("v").alias("city")
        )
    )

    docs = shape_elements(raw, clean=True)

    if out_json:
        json_sink.write_json(docs, out_json)
    if out_store:
        json_sink.write_store(docs, out_store)

    # Query the MATERIALIZED store when one was written: each query is
    # then a pruned parquet scan (+ partition pruning on type) instead of
    # re-evaluating the clean+reshape expressions over the cached raw per
    # query — measured 15.1s → 1.4s for the 5-query reference set at the
    # 560k-doc pipeline scale (PERF.md). This is also the production
    # shape: analytics read the silver table, not the ingest expression.
    docs_q = json_sink.read_store(spark, out_store) if out_store else docs

    tags_map = F.col("tags")  # noqa: E501  (queries below mirror query_data)
    queries = {
        # query_data (openstreet_kolkata.py:596-655)
        "unique_users": audit_ops.distinct_count(docs_q, "created.user"),
        "type_counts": docs_q.groupBy("type").agg(
            F.count(F.lit(1)).alias("cnt")
        ),
        "amenity_counts": docs_q.groupBy(
            tags_map.getItem("amenity").alias("amenity")
        ).agg(F.count(F.lit(1)).alias("cnt")),
        "top_shops": topk_group_count(
            docs_q.filter(F.col("type") == "node").select(
                tags_map.getItem("shop").alias("shop")
            ),
            "shop",
            k=10,
            require_col="shop",
        ),
        "top_highways": topk_group_count(
            docs_q.filter(F.col("type") == "way").select(
                tags_map.getItem("highway").alias("highway")
            ),
            "highway",
            k=10,
            require_col="highway",
        ),
    }
    return WrangleResult(raw=raw, docs=docs, audits=audits, queries=queries)


def main(argv: list[str] | None = None) -> None:
    """CLI mirroring the reference's __main__ (openstreet_kolkata.py:694-702):

        python -m data_wrangle_openstreetmaps_data_spark.plans.pipeline \\
            <osm_file_or_glob> [out_dir]

    Prints each audit and query result (the reference pprints its
    accumulators); writes JSON-lines + parquet store when out_dir given.
    """
    import sys

    from data_wrangle_openstreetmaps_data_spark.session import get_spark

    args = sys.argv[1:] if argv is None else argv
    if not args:
        print(__doc__)
        raise SystemExit(2)
    osm_path = args[0]
    out_dir = args[1] if len(args) > 1 else None
    spark = get_spark("wrangle-maps")
    spark.sparkContext.setLogLevel("ERROR")
    res = wrangle_maps(
        spark,
        osm_path,
        out_json=f"{out_dir}/docs_json" if out_dir else None,
        out_store=f"{out_dir}/docs_store" if out_dir else None,
    )
    for name, df in res.audits.items():
        print(f"\n== audit: {name}")
        df.show(20, truncate=False)
    for name, df in res.queries.items():
        print(f"\n== query: {name}")
        df.show(20, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
