"""OSM XML source (SURVEY.md §2.1 S1/S2).

The reference streams OSM XML through a SAX parser one element at a time
(ET.iterparse call sites, openstreet_kolkata.py:60,90,133,152,333,572) and
hand-extracts .bz2 archives to disk first (find_file,
openstreet_kolkata.py:15-35).

Spark-first replacements:
- S1 (archive handling) is a NO-OP: Hadoop codecs decompress ``.bz2``
  transparently inside the scan, and bzip2 is a *splittable* codec, so a
  100 TB planet file still fans out across executors. No extract step, no
  temp copies.
- S2 (streaming parse) is the native Spark 4 XML datasource
  (``spark.read.format("xml")``): the file is split into per-rowTag
  partitions and parsed in parallel — the "event stream" becomes a
  partitioned scan with column pruning.

``read_elements`` normalizes the datasource's attribute-prefixed schema to
the engine's raw element schema (FIXTURES.md §1/§2):

    id type lat lon visible version changeset timestamp user uid : string
    tags: array<struct<k,v>>       nds: array<struct<ref>>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ATTRS = ("id", "lat", "lon", "visible", "version", "changeset",
         "timestamp", "user", "uid")


def _norm(df: DataFrame, element_type: str) -> DataFrame:
    """Map the XML datasource's raw schema to the engine's element schema,
    tolerating absent attributes/children (they become NULL columns)."""
    cols = {f.name for f in df.schema.fields}

    def attr(name: str):
        raw = f"_{name}"
        if raw in cols:
            return F.col(raw).cast("string").alias(name)
        return F.lit(None).cast("string").alias(name)

    if "tag" in cols:
        tags = F.transform(
            "tag",
            lambda t: F.struct(
                t["_k"].cast("string").alias("k"),
                t["_v"].cast("string").alias("v"),
            ),
        ).alias("tags")
    else:
        tags = F.lit(None).cast("array<struct<k:string,v:string>>").alias("tags")

    if "nd" in cols:
        nds = F.transform(
            "nd", lambda n: F.struct(n["_ref"].cast("string").alias("ref"))
        ).alias("nds")
    else:
        nds = F.lit(None).cast("array<struct<ref:string>>").alias("nds")

    member_type = "array<struct<mtype:string,ref:string,role:string>>"
    if "member" in cols:
        members = F.transform(
            "member",
            lambda m: F.struct(
                m["_type"].cast("string").alias("mtype"),
                m["_ref"].cast("string").alias("ref"),
                m["_role"].cast("string").alias("role"),
            ),
        ).alias("members")
    else:
        members = F.lit(None).cast(member_type).alias("members")

    return df.select(
        attr("id"),
        F.lit(element_type).alias("type"),
        *[attr(a) for a in ATTRS if a != "id"],
        tags,
        nds,
        members,
    )


def read_elements(
    spark: SparkSession, path: str, element_type: str
) -> DataFrame:
    """One DataFrame per element type ('node' | 'way' | 'relation').

    A single <tag>/<nd> child arrives as a struct, not array — wrap for a
    uniform schema via the datasource's schema inference over arrays."""
    df = (
        spark.read.format("xml")
        .option("rowTag", element_type)
        .option("attributePrefix", "_")
        .load(path)
    )
    # normalize single-child structs to arrays
    for child in ("tag", "nd", "member"):
        if child in df.columns:
            dt = dict(df.dtypes)[child]
            if not dt.startswith("array"):
                df = df.withColumn(child, F.array(F.col(child)))
    return _norm(df, element_type)


def write_osm_sample(df: DataFrame, path: str, row_tag: str = "node",
                     root_tag: str = "osm") -> None:
    """S3 second half: persist sampled elements back to OSM-shaped XML
    (the reference wraps every-10th elements in an <osm> envelope,
    sample_elements openstreet_kolkata.py:67-77). Uses the native XML
    writer; one file per partition — coalesce(1) upstream for a single
    sample file if needed."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .option("attributePrefix", "_")
        .mode("overwrite")
        .save(path)
    )


def read_osm(spark: SparkSession, path: str,
             element_types: tuple[str, ...] = ("node", "way")) -> DataFrame:
    """Union of all requested element types in one raw-elements DataFrame —
    the analog of the reference's single iterparse stream filtered to
    node/way (openstreet_kolkata.py:153,334,466)."""
    dfs = [read_elements(spark, path, t) for t in element_types]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
