"""Query registry: every implemented SURVEY.md §2 operator as a
(Spark callable, DuckDB oracle SQL) pair.

The Spark side exercises the engine's operators (package modules); the
oracle side is independent ANSI SQL over the same parquet tables. Column
names and value determinism are aligned on both sides (SURVEY.md §7):
explicit aliases, explicit tiebreaks, sorted set-joins, decimal-exact sums,
portable md5 hashing, rounded floating-point outputs.

Queries marked ``oracle=None`` are genuinely approximate / non-SQL
operators (LSH ANN, simhash) → the driver records a rows-only check;
their correctness is pinned by unit tests with planted duplicates instead
(tests/test_dedup.py, tests/test_similarity.py).

The registry is split into per-family modules (one file per query
family); this package aggregates their ``q_*`` callables and ``ORACLES``
entries into the same ``REGISTRY`` / ``spark_queries()`` /
``oracle_queries()`` surface the single-file registry exposed.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import *  # noqa: F401,F403
from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import QuerySpec
from data_wrangle_openstreetmaps_data_spark.plans.queries import (
    osm_core,
    relational,
    textdata,
    neardup,
    vectors,
    curate,
    tpch,
    events_time,
    sketches,
    streams,
    storage,
    multimedia,
    reporting,
    geo,
    graphs,
)

_FAMILIES = (osm_core, relational, textdata, neardup, vectors, curate, tpch, events_time, sketches, streams, storage, multimedia, reporting, geo, graphs)

ORACLES: dict[str, str | None] = {}
for _m in _FAMILIES:
    for _k, _v in _m.ORACLES.items():
        assert _k not in ORACLES, f"duplicate oracle entry {_k}"
        ORACLES[_k] = _v

_QUERY_FNS: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
for _m in _FAMILIES:
    for _name, _fn in vars(_m).items():
        if (
            _name.startswith("q_")
            and callable(_fn)
            and _fn.__module__ == _m.__name__
        ):
            assert _name not in _QUERY_FNS, f"duplicate query {_name}"
            _QUERY_FNS[_name] = _fn

_orphans = set(ORACLES) - set(_QUERY_FNS)
assert not _orphans, f"oracles without queries: {_orphans}"

# preserve flat attribute access (Q.q_topk_group_count) from the
# single-file era
globals().update(_QUERY_FNS)

REGISTRY: dict[str, QuerySpec] = {
    name: QuerySpec(spark=fn, oracle=ORACLES.get(name), doc=fn.__doc__ or "")
    for name, fn in sorted(_QUERY_FNS.items())
}


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle
    }
