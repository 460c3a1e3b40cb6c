"""Driver-contract smoke: every queries() entry runs and every oracle_sql()
string is valid DuckDB SQL producing the same (rowcount, columns, values)
at sf0.001. This mirrors scripts/check_oracle.py inside pytest so
`pytest tests/ -x -q` guards the whole contract."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from data_wrangle_openstreetmaps_data_spark.catalog import TABLES
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(round(v, 9))
    return str(v)


def _fingerprint(df):
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(_canon(r[c]) for c in cols) for _, r in df[cols].iterrows()
    )
    return len(df), cols, rows


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_against_oracle(spark, ddb, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_SMALL).toPandas()
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(sdf) >= 0  # rows-only contract
        return
    odf = ddb.execute(oracle).fetchdf()
    assert _fingerprint(sdf) == _fingerprint(odf)


# queries whose semantics are genuinely not SQL-expressible may be listed
# here to run rows-only; everything else MUST ship its oracle in the same
# commit (the round-3 verdict's driver-window hygiene rule)
ROWS_ONLY_ALLOWED: set[str] = set()


def test_every_query_has_an_oracle():
    missing = (
        set(entry_mod.queries()) - set(entry_mod.oracle_sql())
        - ROWS_ONLY_ALLOWED
    )
    assert not missing, f"queries shipped without oracle_sql(): {missing}"


def test_sweep_artifact_current_at_head():
    """The newest committed ORACLE_r*.txt sweep must cover every registry
    query — i.e. nobody added a query without re-running the sweep. This
    is what let q_streaming_minhash ship unverified in round 3."""
    import glob
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(glob.glob(os.path.join(repo, "ORACLE_r*.txt")))
    assert arts, "no ORACLE_r*.txt sweep artifact committed"
    text = open(arts[-1]).read()
    swept = set(re.findall(r"^(?:PASS|FAIL) (q_\w+):", text, re.M))
    missing = set(entry_mod.queries()) - swept
    assert not missing, (
        f"{os.path.basename(arts[-1])} does not cover: {missing} — "
        "re-run scripts/check_oracle.py and commit the artifact"
    )
    failed = set(re.findall(r"^FAIL (q_\w+):", text, re.M))
    assert not failed, f"committed sweep artifact records failures: {failed}"
