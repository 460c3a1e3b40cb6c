"""Reshape: raw OSM-shaped elements → nested documents (SURVEY.md §2.5).

The reference's ``shape_element`` (openstreet_kolkata.py:463-537; spec in
its docstring :364-449) converts one XML element dict at a time. Here the
whole reshape is ONE ``select`` of native column expressions over a
DataFrame with the raw schema (FIXTURES.md §1/§2):

    id, lat, lon, visible, version, changeset, timestamp, user, uid: string
    type: string ('node'|'way')
    tags: array<struct<k:string, v:string>>     -- <tag> children
    nds:  array<struct<ref:string>>             -- <nd> children (ways)

Output schema (FIXTURES.md §3): id, type, visible, created struct,
pos array<double>, address map, tags map, node_refs array<string>.

Implementation notes:
- R1 created struct: openstreet_kolkata.py:453,477-480,527-528.
- R2 pos = [lat, lon] as doubles: openstreet_kolkata.py:483-487.
- R3 address map: addr:* keys, problemchars dropped (:503-504),
  addr:x:y (lower_colon remainder) dropped (:510-515).
- R4 residual tags map: non-addr keys incl. colons (:519-520).
- R5 node_refs: ordered refs from nd children (:523-526) — document order
  is preserved because the array column preserves element order; no sort,
  no window, no shuffle.
- R6 cleaning fused in (clean_address is invoked per element during reshape,
  :496): street/city values normalized, extracted house numbers lifted into
  address['housenumber'] (overwriting an existing one, :318-325 intent).
- Validity gate (is_valid, :455-461): the reference's node/way check is a
  tautology bug; the intent — keep only node/way elements that have a user —
  is implemented.

The whole thing is narrow (no shuffle at all): at 100 TB this reshape is a
single map stage fused into the scan by whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.functions.cleaning import (
    LOWER_COLON_RE,
    PROBLEMCHARS_RE,
    fix_city_name,
    normalize_street_type,
    split_housenumber,
)

CREATED_FIELDS = ("version", "changeset", "timestamp", "user", "uid")


def _clean_tag_entries(tags: Column) -> Column:
    """Apply clean_address semantics (openstreet_kolkata.py:305-326) to a
    tags array: fix street values (type normalize + housenumber split),
    fix city values, and append a lifted addr:housenumber entry when a
    street value contained one."""
    # last addr:street value (dict last-wins semantics; no map build, so
    # duplicate keys can't trip the session's mapKeyDedupPolicy)
    street_val = F.try_element_at(
        F.filter(tags, lambda t: t["k"] == F.lit("addr:street")), F.lit(-1)
    )["v"]
    norm_street = normalize_street_type(street_val)
    lifted_housenum, fixed_street = split_housenumber(norm_street)

    def fix_value(t: Column) -> Column:
        return F.struct(
            t["k"].alias("k"),
            F.when(t["k"] == "addr:street", fixed_street)
            .when(t["k"] == "addr:city", fix_city_name(t["v"]))
            .otherwise(t["v"])
            .alias("v"),
        )

    cleaned = F.transform(tags, fix_value)
    # Lift extracted house number: drop any pre-existing housenumber entry,
    # then append the lifted one (reference intent :318-325 — overwrite).
    without_hn = F.filter(cleaned, lambda t: t["k"] != F.lit("addr:housenumber"))
    existing_hn = F.filter(cleaned, lambda t: t["k"] == F.lit("addr:housenumber"))
    hn_entry = F.array(
        F.struct(
            F.lit("addr:housenumber").alias("k"), lifted_housenum.alias("v")
        )
    )
    return (
        F.when(lifted_housenum.isNotNull(), F.concat(without_hn, hn_entry))
        .otherwise(F.concat(without_hn, existing_hn))
    )


def _entries_last_wins(entries: Column) -> Column:
    """Drop earlier duplicates of a key, keeping the LAST occurrence —
    the reference's dict-assignment semantics (node[key]=val overwrites,
    openstreet_kolkata.py:515,520). Explicit, so the reshape does not
    depend on the session's spark.sql.mapKeyDedupPolicy (default throws).
    O(tags²) per element, but tag lists are tiny."""
    return F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, i + 2, F.size(entries)),
            lambda later: later["k"] == e["k"],
        ),
    )


def clean_tags(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """Standalone clean phase (clean_addresses, openstreet_kolkata.py:356-359):
    returns the frame with its tags column cleaned in place, so audits can
    run over post-clean values (audit_clean_addresses cleanup=True path)."""
    tags = F.coalesce(
        F.col(tags_col), F.array().cast("array<struct<k:string,v:string>>")
    )
    return df.withColumn(tags_col, _clean_tag_entries(tags))


def shape_elements(
    df: DataFrame,
    clean: bool = True,
    tags_col: str = "tags",
    nds_col: str | None = "nds",
) -> DataFrame:
    """Vectorized shape_element over a raw elements DataFrame."""
    tags = F.coalesce(F.col(tags_col), F.array().cast("array<struct<k:string,v:string>>"))
    if clean:
        tags = _clean_tag_entries(tags)

    # problemchars keys are ignored everywhere (:503-504)
    ok = F.filter(tags, lambda t: ~t["k"].rlike(PROBLEMCHARS_RE))

    addr = F.filter(ok, lambda t: t["k"].startswith("addr:"))
    addr_stripped = F.transform(
        addr,
        lambda t: F.struct(
            F.regexp_replace(t["k"], r"^addr:", "").alias("k"), t["v"].alias("v")
        ),
    )
    # drop addr:x:y — remainder still matching lower_colon (:510-515)
    addr_kept = F.filter(addr_stripped, lambda t: ~t["k"].rlike(LOWER_COLON_RE))
    address = F.map_from_entries(_entries_last_wins(addr_kept))

    residual = F.map_from_entries(
        _entries_last_wins(F.filter(ok, lambda t: ~t["k"].startswith("addr:")))
    )

    created = F.struct(*[F.col(f).alias(f) for f in CREATED_FIELDS])
    # try_cast: under ANSI mode (Spark 4 default) a malformed coordinate
    # would otherwise kill the whole ingest; bad values become NULL
    pos = F.array(
        F.col("lat").try_cast("double"), F.col("lon").try_cast("double")
    )

    node_refs = (
        F.transform(F.col(nds_col), lambda n: n["ref"])
        if nds_col is not None and nds_col in df.columns
        else F.lit(None).cast("array<string>")
    )

    shaped = (
        # validity gate: node/way with a user (is_valid intent, :455-461)
        df.filter(F.col("type").isin("node", "way") & F.col("user").isNotNull())
        .select(
            F.col("id"),
            F.col("type"),
            F.col("visible"),
            created.alias("created"),
            F.when(F.col("lat").isNotNull() & F.col("lon").isNotNull(), pos)
            .alias("pos"),
            F.when(F.size(address) > 0, address).alias("address"),
            F.when(F.size(residual) > 0, residual).alias("tags"),
            node_refs.alias("node_refs"),
        )
    )
    return shaped


def gaps_and_islands(
    df: DataFrame, idx_col: str, max_step: int
) -> DataFrame:
    """Coalesce integer indexes into contiguous ISLANDS: adds ``grp``
    (1-based island id over ascending ``idx_col``), breaking wherever
    the step between successive rows exceeds ``max_step``. The window
    runs over the (already filtered/aggregated) index rows — callers
    keep the frame bounded (q_backfill_plan: |failed days|; the
    registry-wide allowlist in tests/test_plans.py documents this).

    Contract (property-tested in tests/test_property.py):
    islands partition the input rows; within an island every
    consecutive step is <= max_step; between islands the step is
    > max_step (so the island count is MINIMAL for that rule)."""
    w = Window.orderBy(idx_col)
    return df.withColumn(
        "brk",
        F.when(
            F.lag(idx_col).over(w).isNull()
            | (F.col(idx_col) - F.lag(idx_col).over(w) > max_step),
            1,
        ).otherwise(0),
    ).withColumn(
        "grp",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("brk")
