"""A/B q_bfs_frontier's in-loop materialization (r13 verdict item 6):
the 3-hop loop _mat's (lazy-persists) each hop's `new` and `visited`
frames — the one _mat pattern that sits inside an iteration loop.
Variants, outputs asserted identical before timing:

  lazy    — _mat as shipped (lazy persist; hop h+1's plan references
            hop h's unfilled cache, so branches of one action can race
            to fill it)
  eager   — persist + count() per hop (one scheduled job per hop, but
            every downstream consumer sees a filled cache)
  localck — localCheckpoint(eager=True) per hop (lineage CUT per hop;
            row-format blocks)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from data_wrangle_openstreetmaps_data_spark import catalog
from data_wrangle_openstreetmaps_data_spark.operators import graph
from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def bfs(spark, mode):
    def outer_mat(df):
        if mode in ("lazy", "eager", "mixed"):
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            if mode == "eager":
                df.count()
            return df
        return df.localCheckpoint(eager=True)

    def mat(df):
        if mode == "lazy":
            return df.persist(StorageLevel.MEMORY_AND_DISK)
        if mode == "eager":
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            df.count()
            return df
        return df.localCheckpoint(eager=True)

    edges = outer_mat(
        graph.copurchase_part_edges(
            catalog.table(spark, SF, "lineitem"), min_orders=2
        )
    )
    und = outer_mat(
        edges.select(F.col("s1").alias("src"), F.col("s2").alias("dst"))
        .unionByName(
            edges.select(F.col("s2").alias("src"), F.col("s1").alias("dst"))
        )
    )
    seeds = und.select("src").distinct().filter(F.col("src") % 50 == 0)
    visited = mat(seeds.select(F.col("src").alias("id"), F.lit(0).alias("hop")))
    frontier = visited.select("id")
    for h in (1, 2, 3):
        nxt = (
            und.join(frontier, und["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new = mat(
            nxt.join(visited.select("id"), "id", "left_anti").select(
                "id", F.lit(h).alias("hop")
            )
        )
        visited = mat(visited.unionByName(new))
        frontier = new.select("id")
    from pyspark.sql import Window

    w = Window.orderBy("hop").rowsBetween(Window.unboundedPreceding, 0)
    per = visited.groupBy("hop").agg(
        F.count(F.lit(1)).cast("long").alias("frontier_n")
    )
    return per.withColumn(
        "cum_n", F.sum("frontier_n").over(w).cast("long")
    ).orderBy("hop")


def main():
    spark = get_spark("ab_bfs")
    spark.sparkContext.setLogLevel("ERROR")
    modes = ["lazy", "mixed", "localck"]
    outs = {}
    for m in modes:
        spark.catalog.clearCache()
        outs[m] = [tuple(r) for r in bfs(spark, m).collect()]
    assert outs["lazy"] == outs["mixed"] == outs["localck"], outs
    print("outputs identical:", outs["lazy"])
    for _ in range(4):
        line = []
        for m in modes:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            bfs(spark, m).write.format("noop").mode("overwrite").save()
            line.append(f"{m}={time.perf_counter() - t0:6.2f}s")
        print("  ".join(line), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
