"""Round-13 dynamic SRP sizing (r12 verdict item 1) + size-dispatched
connected components.

auto_rows_per_band derives r from the corpus count (2^r ≈ n·b → noise
candidates ≈ n/2 at every scale); the DuckDB oracle derives the SAME r
in SQL and computes the md5-seeded hyperplanes EXACTLY in SQL, so the
static oracle text stays valid at any SF. These tests pin every joint
the two engines must agree on:

  1. the Python and SQL r-formulas are equal over a wide n range,
  2. the SQL-computed plane values are bit-identical to
     similarity._seeded_projections (the hi/2^32 + lo/2^64 split makes
     every step a single correctly-rounded IEEE op on both engines),
  3. rows_per_band=None produces exactly the pairs of the explicit
     derived r,
  4. dup_clusters' driver union-find (small regime) produces labels
     identical to the distributed pointer-jumping loop.
"""

from __future__ import annotations

import duckdb
import pytest

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.operators import dedup
from data_wrangle_openstreetmaps_data_spark.operators.similarity import (
    _seeded_projections,
)
from tests.conftest import SF_SMALL


def test_auto_rows_per_band_formula():
    assert dedup.auto_rows_per_band(0) == 4
    assert dedup.auto_rows_per_band(1) == 4  # floor
    assert dedup.auto_rows_per_band(500, 8) == 12  # bitlen(4000)
    assert dedup.auto_rows_per_band(2000, 8) == 14  # bitlen(16000)
    assert dedup.auto_rows_per_band(10**10, 8) == 37
    assert dedup.auto_rows_per_band(2**70, 8) == 63  # ceiling


def test_auto_r_python_equals_sql():
    """The oracle's LEAST(63, GREATEST(4, length(bin(n*b)))) must equal
    auto_rows_per_band for every count — sampled over 6 decades plus the
    clamp edges."""
    con = duckdb.connect()
    ns = [0, 1, 3, 7, 8, 499, 500, 2000, 65535, 65536, 10**6, 10**9,
          10**12, 2**59]
    for n in ns:
        (r_sql,) = con.execute(
            "SELECT CAST(LEAST(63, GREATEST(4, "
            f"length(bin(CAST({n} AS BIGINT) * 8)))) AS INTEGER)"
        ).fetchone()
        assert r_sql == dedup.auto_rows_per_band(n, 8), n


def test_sql_planes_bit_identical():
    """The md5-seeded hyperplanes computed in DuckDB SQL (hexdigit sums
    split hi/lo so every step is exact or single-rounded) must round-trip
    bit-for-bit against similarity._seeded_projections."""
    con = duckdb.connect()
    n_planes, dim = 24, 64
    rows = con.execute(f"""
        SELECT p.range AS p, i.range AS i,
          (( list_sum(list_transform(range(1, 9),
               k -> CAST(strpos('0123456789abcdef', substr(md5('42|' || CAST(p.range AS VARCHAR) || '|' || CAST(i.range AS VARCHAR)), k, 1)) - 1 AS DOUBLE) * power(16.0, 8 - k)))
             / 4294967296.0
           + list_sum(list_transform(range(9, 17),
               k -> CAST(strpos('0123456789abcdef', substr(md5('42|' || CAST(p.range AS VARCHAR) || '|' || CAST(i.range AS VARCHAR)), k, 1)) - 1 AS DOUBLE) * power(16.0, 16 - k)))
             / 18446744073709551616.0
          ) * 2.0 - 1.0) AS val
        FROM range({n_planes}) p, range({dim}) i
        ORDER BY p, i
    """).fetchall()
    planes = _seeded_projections(dim, n_planes, seed=42)
    assert len(rows) == n_planes * dim
    for p, i, val in rows:
        assert planes[p][i] == val, (p, i, planes[p][i], val)


def test_rows_per_band_none_matches_explicit(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    r = dedup.auto_rows_per_band(n, 8)
    auto = sorted(
        (x["id_a"], x["id_b"], x["cos_sim"])
        for x in dedup.embedding_near_dup_pairs(
            emb, threshold=0.4, bands=8, rows_per_band=None
        ).collect()
    )
    explicit = sorted(
        (x["id_a"], x["id_b"], x["cos_sim"])
        for x in dedup.embedding_near_dup_pairs(
            emb, threshold=0.4, bands=8, rows_per_band=r
        ).collect()
    )
    assert auto == explicit and len(auto) > 0


def test_driver_cc_equals_distributed_loop(spark):
    """Size dispatch must be invisible: the driver union-find labels and
    the pointer-jumping loop labels are the same component-min fixpoint."""
    pairs = dedup.dedup_minhash_lsh(
        table(spark, SF_SMALL, "documents"),
        n_hashes=16, bands=8, shingle_k=3, threshold=0.5,
    ).localCheckpoint(eager=True)
    stats_drv: dict = {}
    drv = sorted(
        (r["id"], r["cluster_id"])
        for r in dedup.dup_clusters(pairs, stats=stats_drv).collect()
    )
    loop = sorted(
        (r["id"], r["cluster_id"])
        for r in dedup.dup_clusters(pairs, driver_cc_max=0).collect()
    )
    assert stats_drv.get("driver_cc") is True
    assert drv == loop and len(drv) > 0


def test_driver_cc_empty_edges(spark):
    import pyspark.sql.functions as F

    empty = (
        spark.range(0)
        .select(F.col("id").alias("id_a"), F.col("id").alias("id_b"))
    )
    assert dedup.dup_clusters(empty).count() == 0
