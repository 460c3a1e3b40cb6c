"""Testdata physical-contract guards.

Round 5 died because the driver testdata changed a physical type
(events.ts: TIMESTAMP(NANOS) → TIMESTAMP_NTZ micros) and part of the
breakage was SILENT (unit mis-scaling, not an error). These tests pin the
contract the engine adapts over — if a future vintage ships a type or
unit outside the adaptive envelope, pytest fails loudly instead of the
driver gate failing quietly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import (
    event_ts_us,
    table,
)
from tests.conftest import SF_SMALL

# epoch-µs bounds: 2000-01-01 .. 2100-01-01. A seconds- or millis-encoded
# ts column slipping through the dtype dispatch would land ~1e3-1e6× off
# and fail this range check.
_US_LO = 946_684_800 * 10**6
_US_HI = 4_102_444_800 * 10**6


def test_events_ts_is_an_adaptive_type_and_us_range_sane(spark):
    ev = table(spark, SF_SMALL, "events")
    dt = dict(ev.dtypes)["ts"]
    assert dt == "bigint" or dt.startswith("timestamp"), dt
    lo, hi = ev.select(
        F.min(event_ts_us(ev)), F.max(event_ts_us(ev))
    ).first()
    assert _US_LO < lo <= hi < _US_HI, (lo, hi)


def test_order_and_ship_dates_are_timestamp_family(spark):
    o = dict(table(spark, SF_SMALL, "orders").dtypes)["o_orderdate"]
    l = dict(table(spark, SF_SMALL, "lineitem").dtypes)["l_shipdate"]
    for dt in (o, l):
        # date is fine too — every comparison uses timestamp literals,
        # which Spark coerces; bigint here would need a new adaptive path
        assert dt.startswith("timestamp") or dt == "date", dt


def test_core_table_shapes(spark):
    docs = dict(table(spark, SF_SMALL, "documents").dtypes)
    assert docs["doc_id"] == "bigint" and docs["text"] == "string"
    emb = dict(table(spark, SF_SMALL, "embeddings").dtypes)
    assert emb["embedding"].startswith("array<")
    ev = dict(table(spark, SF_SMALL, "events").dtypes)
    assert ev["event_id"] == "bigint" and ev["user_id"] == "bigint"
    assert ev["value"] == "double" and ev["event_type"] == "string"


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_ts_encoding_consistent_across_sfs(spark, sf):
    """All sf dirs must share one ts encoding — a mixed-vintage testdata
    tree would make sf0.001 tests green while the sf0.1 bench breaks."""
    small = dict(table(spark, SF_SMALL, "events").dtypes)["ts"]
    other = dict(table(spark, sf, "events").dtypes)["ts"]
    assert small == other, (small, other)


def test_embeddings_are_64_dim_floats(spark):
    """q_embedding_dim_stats / the ANN oracles inline dim=64 (range(0,64)
    in DuckDB, seeded 64-dim hyperplanes) — a testdata vintage changing
    the embedding dimension must fail HERE, in pytest, not in the driver
    gate."""
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_spark.catalog import table
    from tests.conftest import SF_SMALL

    emb = table(spark, SF_SMALL, "embeddings")
    assert dict(emb.dtypes)["embedding"] == "array<float>"
    dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [64], dims
