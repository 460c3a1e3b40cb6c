"""Type-adaptive event-time regression tests.

The driver testdata has shipped ``events.ts`` in two physical forms across
rounds: TIMESTAMP(NANOS) (which Spark surfaces as an epoch-nanos long under
``nanosAsLong``) and TIMESTAMP_NTZ micros. Round 5 broke because the code
assumed one of them. These tests build FOUR fixtures from the same logical
instants — the two shipped encodings plus the remaining plausible ones
(TIMESTAMP_LTZ micros and a plain epoch-millis int64 column) — and pin
that the normalizers and the operators built on them produce identical
results, so the next testdata format flip is a no-op instead of a repair
round.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import (
    event_ts,
    event_ts_us,
)
from data_wrangle_openstreetmaps_data_spark.streaming.sessionize import (
    sessionize_batch,
)

# epoch-µs instants: 2 users, gaps straddling a 1h session gap
_US = [
    1_700_000_000_000_000,
    1_700_000_060_000_000,  # +60s       → same session
    1_700_007_200_000_000,  # +2h        → new session
    1_700_007_260_000_000,
]
_ROWS = [(uid, us) for uid in (1, 2) for us in _US]
GAP_US = 3600 * 10**6


_TS_BUILDERS = {
    # TIMESTAMP(NANOS) → bigint under nanosAsLong (round ≤4 vintage)
    "ns": lambda us: pa.array([u * 1000 for u in us], pa.timestamp("ns")),
    # TIMESTAMP_NTZ micros (current vintage)
    "us": lambda us: pa.array(us, pa.timestamp("us")),
    # TIMESTAMP_LTZ micros (isAdjustedToUTC) → Spark TimestampType
    "ltz": lambda us: pa.array(us, pa.timestamp("us", tz="UTC")),
    # plain epoch-millis int64 column (no timestamp logical type at all)
    "ms": lambda us: pa.array([u // 1000 for u in us], pa.int64()),
}


def _write(path: str, unit: str) -> str:
    us_vals = [r[1] for r in _ROWS]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": _TS_BUILDERS[unit](us_vals),
            "value": pa.array(
                [float(i) for i in range(len(_ROWS))], pa.float64()
            ),
        }
    )
    pq.write_table(tbl, path)
    return path


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("event_time")
    return {
        unit: _write(os.path.join(d, f"ev_{unit}.parquet"), unit)
        for unit in _TS_BUILDERS
    }


def _read(spark, path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(path)


def test_fixture_dtypes_cover_all_formats(spark, fixtures):
    dt = {u: dict(_read(spark, p).dtypes)["ts"] for u, p in fixtures.items()}
    assert dt["ns"] == "bigint"          # nanosAsLong surfaces a long
    assert dt["us"] == "timestamp_ntz"
    assert dt["ltz"] == "timestamp"      # LTZ → TimestampType
    assert dt["ms"] == "bigint"          # same dtype as ns, other unit


def test_event_ts_us_identical_across_formats(spark, fixtures):
    got = {}
    for name, path in fixtures.items():
        df = _read(spark, path)
        got[name] = sorted(
            (r["user_id"], r["us"])
            for r in df.select(
                "user_id", event_ts_us(df).alias("us")
            ).collect()
        )
    assert all(g == got["us"] for g in got.values()), got
    assert got["us"] == sorted(_ROWS)


def test_event_ts_identical_across_formats(spark, fixtures):
    got = {}
    for name, path in fixtures.items():
        df = _read(spark, path)
        got[name] = sorted(
            (r["user_id"], r["day"])
            for r in df.select(
                "user_id",
                F.date_format(
                    F.date_trunc("day", event_ts(df)), "yyyy-MM-dd HH:mm:ss"
                ).alias("day"),
            ).collect()
        )
    assert all(g == got["us"] for g in got.values()), got


def test_sessionize_batch_identical_across_formats(spark, fixtures):
    got = {}
    for name, path in fixtures.items():
        # callers normalize raw reads once at the boundary (bigint ⇒ µs
        # is the sessionize contract — see q_sessionize)
        df = _read(spark, path)
        sess = sessionize_batch(
            df.withColumn("ts", event_ts_us(df)), GAP_US
        )
        got[name] = sorted(map(tuple, sess.collect()))
    assert all(g == got["us"] for g in got.values()), got
    # 2 sessions per user, session boundaries at the 2h gap
    assert len(got["us"]) == 4
    assert all(n == 2 for (_, _, _, n) in got["us"])


def test_streaming_normalizer_identical_across_formats(spark, fixtures, tmp_path_factory):
    """read_events_stream must surface the SAME normalized epoch-µs longs
    for both physical encodings (schema inferred from the footer)."""
    from data_wrangle_openstreetmaps_data_spark.streaming import events as se

    got = {}
    for name, path in fixtures.items():
        d = tmp_path_factory.mktemp(f"stream_{name}")
        os.link(path, os.path.join(d, "part-0.parquet"))
        stream = se.read_events_stream(spark, str(d))
        assert dict(stream.dtypes)["ts"] == "bigint"
        se.run_to_memory(
            stream.select("user_id", "ts"), f"evt_{name}"
        )
        got[name] = sorted(
            (r["user_id"], r["ts"])
            for r in spark.table(f"evt_{name}").collect()
        )
    assert all(g == got["us"] for g in got.values()), got
    assert got["us"] == sorted(_ROWS)


def test_hopping_window_identical_across_formats(spark, fixtures):
    """F.window over event_ts must assign identical 2-day/1-day hopping
    windows for both physical ts encodings (the q_hopping_window shape)."""
    got = {}
    for name, path in fixtures.items():
        df = _read(spark, path)
        w = F.window(event_ts(df), "2 days", "1 day")
        got[name] = sorted(
            (r["ws"], r["cnt"])
            for r in df.groupBy(w.alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd").alias("ws"), "cnt"
            )
            .collect()
        )
    assert all(g == got["us"] for g in got.values()), got
    # every event falls in exactly two windows
    assert sum(c for _, c in got["us"]) == 2 * len(_ROWS)
