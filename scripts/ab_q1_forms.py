"""A/B q_tpch_q1's µ-unit arithmetic forms (r13 verdict item 7).

Forms (all produce sum(per-row µ-unit BIGINT)/1e6 — the semantics the
sf1 oracle sweep mandated):
  A (current): per-row double -> cast DECIMAL(20,6) -> *1e6 -> cast long
  B: per-row floor(double*1e6 + 0.5) -> long (no decimal anywhere in
     the money sums; avgs keep the decimal path)
  C: B plus float-floor µ-unit avgs (no decimal anywhere at all)

Outputs are collected and compared EXACTLY (python values) before any
timing; run at the SF dir given (repeat for all four SFs).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark import catalog
from data_wrangle_openstreetmaps_data_spark.functions import text
from data_wrangle_openstreetmaps_data_spark.plans.queries._shared import (
    _dec_sum,
    _ts,
)
from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TIME = os.environ.get("AB_TIME", "1") == "1"


def _mu_dec(c):
    return F.sum((c.cast("decimal(20,6)") * 1000000).cast("long")) / F.lit(
        1000000.0
    )


def _mu_float(c):
    return F.sum(F.floor(c * 1000000 + F.lit(0.5)).cast("long")) / F.lit(
        1000000.0
    )


def q1(spark, mu, avg_float=False):
    li = catalog.table(spark, SF, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    if avg_float:
        avg_qty = text.round4(
            F.sum(F.floor(F.col("l_quantity") * 1000000 + F.lit(0.5)).cast("long"))
            / F.lit(1000000.0)
            / F.count(F.lit(1))
        )
        avg_disc = text.round4(
            F.sum(F.floor(F.col("l_discount") * 1000000 + F.lit(0.5)).cast("long"))
            / F.lit(1000000.0)
            / F.count(F.lit(1))
        )
    else:
        avg_qty = text.round4(_dec_sum(F.col("l_quantity")) / F.count(F.lit(1)))
        avg_disc = text.round4(_dec_sum(F.col("l_discount")) / F.count(F.lit(1)))
    return (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            mu(F.col("l_quantity")).alias("sum_qty"),
            mu(F.col("l_extendedprice")).alias("sum_base_price"),
            mu(disc_price).alias("sum_disc_price"),
            mu(charge).alias("sum_charge"),
            avg_qty.alias("avg_qty"),
            avg_disc.alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def main():
    spark = get_spark("ab_q1")
    spark.sparkContext.setLogLevel("ERROR")
    forms = {
        "A_decimal": lambda: q1(spark, _mu_dec),
        "B_floor": lambda: q1(spark, _mu_float),
        "C_floor_avgs": lambda: q1(spark, _mu_float, avg_float=True),
    }
    outs = {
        n: sorted(map(tuple, f().collect())) for n, f in forms.items()
    }
    same = all(v == outs["A_decimal"] for v in outs.values())
    print(f"{SF}: values identical across forms: {same}")
    if not same:
        for n, v in outs.items():
            print(n, v[:2])
        sys.exit(1)
    if not TIME:
        spark.stop()
        return
    for _ in range(4):
        line = []
        for n, f in forms.items():
            t0 = time.perf_counter()
            f().write.format("noop").mode("overwrite").save()
            line.append(f"{n}={time.perf_counter() - t0:6.3f}s")
        print("  ".join(line), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
