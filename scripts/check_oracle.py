"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, then
compare row count, sorted column names, and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from data_wrangle_openstreetmaps_data_spark.catalog import TABLES
from data_wrangle_openstreetmaps_data_spark.session import get_spark


def canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def frame_fingerprint(df) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(canon(r[c]) for c in cols) for _, r in df[cols].iterrows()
    )
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(df), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("check-oracle")
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single files; make_sfN (Spark) writes
        # directories of part files — glob those for DuckDB
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows [{dt:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sn, sc, sh = frame_fingerprint(sdf)
        on, oc, oh = frame_fingerprint(odf)
        if (sn, sc, sh) == (on, oc, oh):
            print(f"PASS {name}: {sn} rows [{dt:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: spark=({sn},{sc},{sh}) oracle=({on},{oc},{oh})")
            if sc != oc:
                print(f"  column diff: spark={sc} oracle={oc}")
            elif sn != on:
                print(f"  rowcount diff: spark={sn} oracle={on}")
            else:
                merged = sdf[sorted(sdf.columns)].copy()
                om = odf[sorted(odf.columns)].copy()
                srows = sorted(
                    "|".join(canon(r[c]) for c in sorted(sdf.columns))
                    for _, r in merged.iterrows()
                )
                orows = sorted(
                    "|".join(canon(r[c]) for c in sorted(om.columns))
                    for _, r in om.iterrows()
                )
                diffs = [
                    (a, b) for a, b in zip(srows, orows) if a != b
                ][:3]
                for a, b in diffs:
                    print(f"  spark : {a[:200]}")
                    print(f"  oracle: {b[:200]}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
