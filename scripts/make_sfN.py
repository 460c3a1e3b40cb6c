"""Generate a larger-SF dataset by replicating an existing sf dir with
CONSISTENT foreign-key shifts, so every join in the registry still
resolves (copy i shifts orderkey/custkey/suppkey/partkey/event_id/
user_id/doc_id/vec_id by i*100M; nation/region stay as-is — they are
the genuinely-small dimensions at any scale). Timestamps are kept, so a
10x copy densifies the same time range — the realistic shape for more
traffic over the same period.

Usage: python scripts/make_sfN.py [factor=10] [src=/root/testdata/sf0.1]
       [out=.tmp/sf1]

The output feeds bench.py via SPARK_GRAFT_SF_DIR for the scaling ladder;
it is NOT oracle-grade data (replicated documents/embeddings are exact
copies, which inflates dup clusters deliberately).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import TABLES, table
from data_wrangle_openstreetmaps_data_spark.session import get_spark

# Copy i shifts every key by i*SHIFT, so replicated keys reach
# factor*1e8 (1e10 at the sf10 factor-100 rung). Queries that PLANT
# synthetic ids (e.g. q_entity_resolution's name variants) must allocate
# them ABOVE this ceiling — they use 1e12+ — or planted ids collide with
# replicated real keys on ladder data (ADVICE r12).
SHIFT = 100_000_000

KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else ".tmp/sf1"
    spark = get_spark("make-sfN")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        df = table(spark, src, name)
        keys = KEYS.get(name)
        if keys:
            rep = df.withColumn(
                "_copy",
                F.explode(F.array(*[F.lit(i) for i in range(factor)])),
            )
            for k in keys:
                # long arithmetic: at factor 100 the shift reaches
                # 9.9e9 — an int32 _copy * SHIFT overflows under ANSI
                rep = rep.withColumn(
                    k,
                    F.col(k).cast("long")
                    + F.col("_copy").cast("long") * F.lit(SHIFT),
                )
            df = rep.drop("_copy")
        n_out = max(1, factor // 2) if keys else 1
        df.repartition(n_out).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: {'x' + str(factor) if keys else 'as-is'}")
    spark.stop()


if __name__ == "__main__":
    main()
