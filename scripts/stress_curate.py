"""End-to-end curation stress (r8 verdict item 7a): run the COMPOSED
curate_v2 pipeline — not its pieces — at 100× sf0.1 documents (~500k
docs) with wall + per-stage accounting.

Corpus: copy-replication with shifted doc ids (scripts/stress.py's
`replicate`), i.e. every text appears ~100×. That makes the run a
worst-case for the two reduction stages and the accounting tells the
story honestly: exact dedup collapses ~97:1 (100 copies, ~96.6 in the
train split), and because the benchmark split is id-based, almost
every distinct text leaks some copy into the benchmark — P(no bench
copy) = (28/29)^100 ≈ 3% — so decontamination removes nearly all
representatives. Both stages therefore do their FULL work at 500k-doc
scale; the per-stage walls are the deliverable.

Prints one JSON object: {"curate_e2e_100x": {...}} — merged into
STRESS_r09.json next to scripts/stress.py's entries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.plans.datapipe import curate_v2
from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("STRESS_FACTOR", "100"))


def main() -> None:
    spark = get_spark("stress-curate")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        table(spark, SF_DIR, "documents")
        .withColumn(
            "_copy",
            F.explode(F.array(*[F.lit(i) for i in range(FACTOR)])),
        )
        .withColumn(
            "doc_id", F.col("doc_id") + F.col("_copy") * 10_000_000
        )
        .drop("_copy")
    )

    stage_wall: dict[str, float] = {}
    t0 = time.perf_counter()
    res = curate_v2(docs, stage_wall=stage_wall)
    t_write0 = time.perf_counter()
    res.curated.write.format("noop").mode("overwrite").save()
    stage_wall["final_write"] = round(time.perf_counter() - t_write0, 2)
    total = round(time.perf_counter() - t0, 2)
    for c in res.caches or []:
        c.unpersist()

    print(
        json.dumps(
            {
                "curate_e2e_100x": {
                    "metric": "curate_v2_wall",
                    "unit": "sec",
                    "sf_dir": SF_DIR,
                    "factor": FACTOR,
                    "total_wall": total,
                    "stage_wall": stage_wall,
                    "stage_counts": res.stats,
                }
            }
        )
    )


if __name__ == "__main__":
    main()
