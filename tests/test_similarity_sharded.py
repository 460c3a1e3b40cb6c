"""knn_graph_sharded (grid-blocked cogroup, no driver collect) must produce
the EXACT edge set of knn_graph_arrow (broadcast corpus in the closure) —
same (src, dst, sim) triples, since both floor sims to the 4-dp grid before
the top-k cut and break ties by dst asc."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.operators import similarity
from tests.conftest import SF_SMALL


def _edges(df):
    return sorted(
        (r["src"], r["dst"], round(r["sim"], 4)) for r in df.collect()
    )


def test_sharded_equals_broadcast_kernel(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    corpus = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.select("vec_id", "embedding").collect()
    ]
    src = emb.filter(F.col("vec_id") < 60)
    ref = _edges(similarity.knn_graph_arrow(src, corpus, k=5))
    for n_shards, n_src_blocks in [(1, 1), (4, 1), (3, 2), (7, 3)]:
        got = _edges(
            similarity.knn_graph_sharded(
                src, emb, k=5, n_shards=n_shards, n_src_blocks=n_src_blocks
            )
        )
        assert got == ref, (n_shards, n_src_blocks)


def test_sharded_self_graph_excludes_self_edges(spark):
    emb = table(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 40)
    g = similarity.knn_graph_sharded(emb, emb, k=3, n_shards=4)
    rows = g.collect()
    assert all(r["src"] != r["dst"] for r in rows)
    per_src = {}
    for r in rows:
        per_src.setdefault(r["src"], []).append(r)
    assert all(len(v) == 3 for v in per_src.values())
    assert len(per_src) == 40
