"""Round-10 stress: the newly-capped BASE pairing queries under a
planted whale key (r9 verdict item 2 'done' criterion).

q_supplier_similarity / q_resource_allocation now run their
customer-keyed pair self-join over graph.cap_degree(cap=64) edges.
This script plants a deg-10⁴ whale customer into a bulk-degree-40
synthetic co-purchase graph (the whales-only regime: bulk 40 < cap 64,
so every normal key keeps ALL its edges and only the whale is capped)
and measures, for the exact q_supplier_similarity pairing shape:

  - pair counts: exact C(10⁴,2) ≈ 5·10⁷ whale pairs vs capped
    C(64,2) = 2016 — the bound the cap exists to enforce,
  - wall times for both,
  - top-20 Jaccard recall of the capped estimator vs the exact graph.

Writes STRESS_r10.json (merged into by later round-10 stress entries).

Usage: python scripts/stress_whale_cap.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.operators.graph import cap_degree
from data_wrangle_openstreetmaps_data_spark.session import get_spark


def jaccard_top20(edges, min_support=5):
    """The q_supplier_similarity pairing shape (Q/graphs.py): supplier
    Jaccard through shared customers, support >= min_support, top-20 by
    (rounded score, s1, s2)."""
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    a = edges.select("c", F.col("s").alias("s1"))
    b = edges.select("c", F.col("s").alias("s2"))
    pairs = (
        a.join(b, "c")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    d1 = deg.select(F.col("s").alias("s1"), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("deg").alias("deg2"))
    scored = (
        pairs.filter(F.col("n_ab") >= min_support)
        .join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .select(
            "s1",
            "s2",
            "n_ab",
            F.floor(
                F.col("n_ab")
                / (F.col("deg1") + F.col("deg2") - F.col("n_ab"))
                * 10000
                + 0.5
            ).alias("j4"),
        )
    )
    return pairs, scored


def main() -> int:
    spark = get_spark("stress-whale-cap")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    n_cust, bulk_deg, n_supp, whale_deg, cap = 50_000, 40, 10_000, 10_000, 64
    base = (
        spark.range(n_cust)
        .select(F.col("id").alias("c"))
        .withColumn(
            "j", F.explode(F.array(*[F.lit(i) for i in range(bulk_deg)]))
        )
        .select(
            "c",
            F.pmod(F.hash(F.col("c"), F.col("j")), F.lit(n_supp))
            .cast("long")
            .alias("s"),
        )
    )
    whale = spark.range(whale_deg).select(
        F.lit(n_cust).cast("long").alias("c"), F.col("id").alias("s")
    )
    edges = base.unionByName(whale).distinct().localCheckpoint(eager=True)
    n_edges = edges.count()

    t0 = time.perf_counter()
    pairs_x, scored_x = jaccard_top20(edges)
    px = pairs_x.localCheckpoint(eager=True)
    n_pairs_exact = px.count()
    # whale-only pair contribution: pairs both of whose endpoints the
    # whale connects (for the planted whale that is ALL supplier pairs
    # it touches) minus what the base graph already produced
    exact_top = [
        (r["s1"], r["s2"])
        for r in scored_x.orderBy(F.desc("j4"), "s1", "s2")
        .limit(20)
        .collect()
    ]
    t_exact = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    capped = cap_degree(edges, "c", "s", cap=cap).localCheckpoint(eager=True)
    n_capped_edges = capped.count()
    pairs_c, scored_c = jaccard_top20(capped)
    pc = pairs_c.localCheckpoint(eager=True)
    n_pairs_capped = pc.count()
    capped_top = [
        (r["s1"], r["s2"])
        for r in scored_c.orderBy(F.desc("j4"), "s1", "s2")
        .limit(20)
        .collect()
    ]
    t_capped = round(time.perf_counter() - t0, 2)

    whale_pairs_exact = whale_deg * (whale_deg - 1) // 2
    whale_pairs_capped = cap * (cap - 1) // 2
    out["capped_base_pairing_whale"] = {
        "n_cust": n_cust,
        "bulk_deg": bulk_deg,
        "whale_deg": whale_deg,
        "cap": cap,
        "n_edges": n_edges,
        "n_capped_edges": n_capped_edges,
        "whale_pairs_exact_bound": whale_pairs_exact,
        "whale_pairs_capped_bound": whale_pairs_capped,
        "n_pairs_exact": n_pairs_exact,
        "n_pairs_capped": n_pairs_capped,
        "t_exact_s": t_exact,
        "t_capped_s": t_capped,
        "top20_recall": len(set(exact_top) & set(capped_top)),
    }

    path = "STRESS_r10.json"
    prev = json.load(open(path)) if os.path.exists(path) else {}
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=2, sort_keys=True)
    print(json.dumps(out, indent=2, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
