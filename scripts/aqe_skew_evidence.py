"""Round-10 AQE skew-join evidence (r9 verdict item 6a).

The repo's skew story so far is the SALTED join (operators/skew.py,
measured crossover in STRESS_r07) — the hand-rolled mitigation. This
script demonstrates the engine-native path the 100-TB design actually
leans on: `spark.sql.adaptive.skewJoin` splitting a planted-whale
sort-merge join AT RUNTIME, no code change, and records the executed
plan delta + wall times.

Setup: sf1-scale planted whale — a 24M-row fact whose key space is
100k keys except key 0 holds 50% of all rows (12M), sort-merge-joined
(broadcast disabled) to a 100k-row dim. Without skew handling the key-0
partition is one straggler task ~300x the median; with
skewJoin.enabled AQE splits it into advisory-sized sub-partitions
(visible as `skew=true` on the SMJ and N splits in AQEShuffleRead).

Thresholds are lowered (4MB skewed-partition threshold, 2MB advisory)
because local[32] shuffle partitions are far smaller than the 256MB
cluster default — the DETECTION RULE exercised is the same one that
fires untuned at cluster scale.

Writes the measurements into STRESS_r10.json and prints the executed
plan excerpts. Usage: python scripts/aqe_skew_evidence.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F
from pyspark.sql.functions import md5

from data_wrangle_openstreetmaps_data_spark.session import get_spark

N_FACT = 24_000_000
N_KEYS = 100_000
WHALE_SHARE = 2  # every 2nd row -> key 0 (a 12M-row whale partition)


def build(spark):
    fact = spark.range(N_FACT).select(
        F.when(
            F.col("id") % WHALE_SHARE != 0,
            F.pmod(F.hash(F.col("id")), F.lit(N_KEYS)).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("k"),
        # incompressible payload: a constant-key whale partition of
        # cyclic small ints lz4-compresses below any skew threshold and
        # the detector (which reads COMPRESSED map-output sizes) never
        # fires — the first run of this script proved that with an
        # (id % 97) payload. Hash payloads model real wide fact rows.
        F.hash(F.col("id")).cast("long").alias("v"),
        md5(F.col("id").cast("string")).alias("pad"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )
    return fact.join(dim, "k").agg(
        F.sum(F.col("v") * F.col("w")).alias("s"),
        F.sum(F.length("pad")).alias("padlen"),
        F.count(F.lit(1)).alias("n"),
    )


def run(spark, skew_enabled: bool):
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
    t0 = time.perf_counter()
    df = build(spark)
    row = df.collect()[0]
    wall = round(time.perf_counter() - t0, 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return wall, (row["s"], row["padlen"], row["n"]), plan


def main() -> int:
    spark = get_spark("aqe-skew-evidence")
    spark.sparkContext.setLogLevel("ERROR")
    # force SMJ (dim would broadcast) and make local-scale skew detectable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB"
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB"
    )

    w_off, res_off, plan_off = run(spark, False)
    w_on, res_on, plan_on = run(spark, True)
    # second interleaved round (warm JVM) — never trust single runs
    w_off2, _, _ = run(spark, False)
    w_on2, _, _ = run(spark, True)

    assert res_off == res_on, (res_off, res_on)
    skew_marks = len(re.findall(r"skew=true", plan_on))
    m = re.search(r"AQEShuffleRead (?:coalesced and )?skewed", plan_on)
    entry = {
        "n_fact": N_FACT,
        "n_keys": N_KEYS,
        "whale_rows": N_FACT // WHALE_SHARE,
        "result_identical": True,
        "wall_off_s": [w_off, w_off2],
        "wall_on_s": [w_on, w_on2],
        "plan_on_skew_marks": skew_marks,
        "plan_off_skew_marks": len(re.findall(r"skew=true", plan_off)),
        "aqe_shuffle_read_skewed": bool(m),
    }
    path = "STRESS_r10.json"
    prev = json.load(open(path)) if os.path.exists(path) else {}
    prev["aqe_skew_join"] = entry
    with open(path, "w") as f:
        json.dump(prev, f, indent=2, sort_keys=True)
    print(json.dumps(entry, indent=2))
    print("--- skewed-plan excerpt ---")
    for line in plan_on.splitlines():
        if "skew" in line.lower() or "SortMergeJoin" in line:
            print(line.strip()[:160])
    return 0


if __name__ == "__main__":
    sys.exit(main())
