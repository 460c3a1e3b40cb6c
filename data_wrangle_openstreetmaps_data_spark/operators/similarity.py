"""Similarity search over embedding columns (EXT, SURVEY.md §2.7).

- ``cosine_topk``: brute-force exact top-k against a query vector. The
  query is a broadcast literal folded into a narrow projection —
  no shuffle at all except the final TakeOrderedAndProject (partial top-k
  per partition). This IS the correct 100 TB plan for one query vector.
- ``lsh_bucket_topk``: the scale path for *batched* queries — sign-random-
  projection LSH buckets both sides, joins on bucket, ranks within. The
  projection matrix is generated from a seed, so results are deterministic.
- ``knn_join``: all-pairs k-NN between two embedding tables via bucketing.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.functions.text import round4
from data_wrangle_openstreetmaps_data_spark.functions.vectors import cosine, dot


_BLAS_CAPPED = False


def _cap_blas_threads(n: int = 1) -> None:
    """Pin the in-worker OpenBLAS pool to ``n`` threads. numpy's bundled
    OpenBLAS defaults to one thread PER CORE, so 32 concurrent Arrow
    kernels on a 32-core host spawn 1024 BLAS threads — measured 50×
    slowdown on the sharded kNN matmul (104 s → 24 s for the same 64
    cells once capped). Spark already parallelizes across workers; inside
    a kernel, single-threaded BLAS is the right setting. No-op if the
    symbol isn't found (e.g. MKL builds)."""
    global _BLAS_CAPPED
    if _BLAS_CAPPED:
        return
    _BLAS_CAPPED = True
    try:
        import ctypes
        import glob as _glob
        import os as _os

        libs_dir = _os.path.join(
            _os.path.dirname(_os.path.dirname(np.__file__)), "numpy.libs"
        )
        for so in _glob.glob(_os.path.join(libs_dir, "libopenblas*.so*")):
            lib = ctypes.CDLL(so)
            for fn in (
                "openblas_set_num_threads64_",
                "openblas_set_num_threads",
            ):
                f = getattr(lib, fn, None)
                if f is not None:
                    f(n)
                    return
    except Exception:
        pass


def _seeded_projections(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5(seed, plane, i):
    no numpy RNG state, reproducible everywhere."""
    planes = []
    for p in range(n_planes):
        vec = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{i}".encode()).digest()[:8]
            (u,) = struct.unpack(">Q", h)
            vec.append((u / 2**64) * 2.0 - 1.0)  # uniform [-1, 1)
        planes.append(vec)
    return planes


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k. Sim is rounded to 4 dp for stable
    cross-engine comparison; ties broken by id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = round4(cosine(F.col(vec_col), q))
    return (
        embeddings.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def cosine_topk_arrow(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-vectorized variant of ``cosine_topk``: a pandas_udf computes
    the whole batch's similarities as one numpy matrix product.

    The built-in-expression fold is a per-element interpreted loop over the
    array; for wide embeddings (768-4096 dims) the Arrow batch transfer +
    BLAS dot is the faster path — this is the one hot spot where a
    (vectorized, batched) UDF beats native expressions. Same plan shape:
    narrow projection + TakeOrderedAndProject, zero shuffle."""
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    @pandas_udf("double")
    def _sim(v: pd.Series) -> pd.Series:
        m = np.vstack(v.map(lambda x: np.asarray(x, dtype=np.float64)).values)
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(np.floor(dots / (norms * qn) * 10000 + 0.5) / 10000)

    return (
        embeddings.select(F.col(id_col), _sim(F.col(vec_col)).alias("sim"))
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def gram_partial(
    embeddings: DataFrame,
    dims: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Gram/covariance sufficient statistics over the first
    ``dims`` embedding components: each Arrow batch contributes ONE
    dims+1-square integer matrix (the map-side combine a 100 TB
    covariance/PCA pass lives on — executors ship O(d²) numbers, never
    rows), reduced by a (i,j)-keyed sum.

    Components quantize to the 1e-4 grid (floor(x·1e4+0.5) in float64 —
    float32→float64 is exact, so both engines see identical doubles)
    and the matrix product runs in int64: sums are EXACT and
    order-independent, the float-sum-free discipline. The vector is
    augmented with a constant 1 column, so one product yields Σxᵢxⱼ
    (i,j<dims), the per-dim sums Σxᵢ (j=dims), and the count n
    (i=j=dims) — mean-centering needs no second pass.

    Returns rows (i, j, s) for i ≤ j ≤ dims."""
    from pyspark.sql import types as T
    from typing import Iterator

    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("s", T.LongType()),
        ]
    )
    iu = np.triu_indices(dims + 1)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _cap_blas_threads(1)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.vstack(
                pdf[vec_col]
                .map(lambda x: np.asarray(x[:dims], dtype=np.float64))
                .values
            )
            vi = np.floor(m * 10000.0 + 0.5).astype(np.int64)
            aug = np.hstack(
                [vi, np.ones((vi.shape[0], 1), dtype=np.int64)]
            )
            g = aug.T @ aug
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "s": g[iu],
                }
            )

    return (
        embeddings.select(vec_col)
        .mapInPandas(kernel, schema)
        .groupBy("i", "j")
        .agg(F.sum("s").cast("long").alias("s"))
    )


def knn_graph_arrow(
    sources: DataFrame,
    corpus: list[tuple[int, list[float]]],
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN graph edges (src, dst, sim) from each source vector to
    its k nearest corpus vectors by cosine — the navigable-graph BUILD
    step of a graph-ANN index (HNSW's layer-0 ancestor). One Arrow
    ``mapInPandas`` kernel: a batch of sources crosses the boundary
    once, similarities come from a single BLAS matmul against the
    broadcast corpus matrix, scores round to the 4-dp grid BEFORE the
    top-k cut (ties break by dst id), so the graph is deterministic and
    cross-engine checkable. The corpus rides the closure (n·d doubles —
    fine to ~10⁵ vectors; beyond that you shard the corpus side and
    merge per-shard top-k, the same partial-top-k merge as cosine_topk)."""
    from pyspark.sql import types as T
    from typing import Iterator

    ids = np.asarray([i for i, _ in corpus], dtype=np.int64)
    m = np.asarray([v for _, v in corpus], dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))

    schema = T.StructType(
        [
            T.StructField("src", T.LongType()),
            T.StructField("dst", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _cap_blas_threads(1)
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.vstack(
                pdf[vec_col]
                .map(lambda x: np.asarray(x, dtype=np.float64))
                .values
            )
            qn = np.sqrt((q * q).sum(axis=1))
            sims = (q @ m.T) / (qn[:, None] * norms[None, :])
            s4 = np.floor(sims * 10000 + 0.5) / 10000
            out_src, out_dst, out_sim = [], [], []
            for r, src in enumerate(pdf[id_col].values):
                row = s4[r]
                mask = ids != src
                cand_ids, cand = ids[mask], row[mask]
                # top-k by (sim desc, id asc): lexsort on (-sim, id)
                order = np.lexsort((cand_ids, -cand))[:k]
                out_src.extend([src] * len(order))
                out_dst.extend(cand_ids[order])
                out_sim.extend(cand[order])
            yield pd.DataFrame(
                {"src": out_src, "dst": out_dst, "sim": out_sim}
            )

    return sources.select(id_col, vec_col).mapInPandas(kernel, schema)


def knn_graph_sharded(
    sources: DataFrame,
    corpus: DataFrame,
    k: int = 8,
    n_shards: int = 4,
    n_src_blocks: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN graph with BOTH sides as DataFrames — the shard+merge
    scale path ``knn_graph_arrow``'s docstring promises. Nothing is
    collected to the driver; per-task memory is bounded by
    |sources|/n_src_blocks + |corpus|/n_shards rows.

    Plan: a grid-blocked matrix multiply. Sources get a query-block id
    ``qb = pmod(id, n_src_blocks)`` and are replicated across all
    ``cb`` shard ids via ``explode`` (a generator, NOT a cartesian
    join); corpus gets ``cb = pmod(id, n_shards)`` and is replicated
    across all ``qb``. A cogrouped ``applyInPandas`` on (qb, cb) runs
    one BLAS matmul per grid cell and keeps each source's LOCAL top-k
    (4-dp-floored sim, ties by dst asc — identical discipline to the
    broadcast kernel). The merge is a src-keyed window over the
    n_shards·k per-shard candidates: every global top-k edge ranks ≤ k
    inside its own shard, so local-top-k ∪ window-top-k is EXACT, and
    the edge set is bit-identical to ``knn_graph_arrow``
    (tests/test_similarity_sharded.py proves it). At 100 TB: pick
    n_shards so each corpus shard broadcasts into executor memory and
    n_src_blocks to bound the query matrix; the shuffle volume is
    sources×n_shards + corpus×n_src_blocks rows — linear in each side."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("src", T.LongType()),
            T.StructField("dst", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )
    src_g = (
        sources.select(id_col, vec_col)
        .withColumn(
            "qb", F.pmod(F.col(id_col), F.lit(n_src_blocks)).cast("int")
        )
        .withColumn(
            "cb",
            F.explode(F.array(*[F.lit(i) for i in range(n_shards)])),
        )
    )
    cor_g = (
        corpus.select(id_col, vec_col)
        .withColumn(
            "cb", F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
        )
        .withColumn(
            "qb",
            F.explode(F.array(*[F.lit(i) for i in range(n_src_blocks)])),
        )
    )

    def kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left) or not len(right):
            return pd.DataFrame({"src": [], "dst": [], "sim": []}).astype(
                {"src": "int64", "dst": "int64", "sim": "float64"}
            )
        _cap_blas_threads(1)
        q = np.vstack(
            left[vec_col]
            .map(lambda x: np.asarray(x, dtype=np.float64))
            .values
        )
        m = np.vstack(
            right[vec_col]
            .map(lambda x: np.asarray(x, dtype=np.float64))
            .values
        )
        q_ids = left[id_col].values.astype(np.int64)
        c_ids = right[id_col].values.astype(np.int64)
        qn = np.sqrt((q * q).sum(axis=1))
        cn = np.sqrt((m * m).sum(axis=1))
        mt = np.ascontiguousarray(m.T)
        nc = m.shape[0]
        kk = min(k, nc)
        colmap = {int(cid): j for j, cid in enumerate(c_ids)}
        # Composite key sim4·2^40 − id orders by (sim desc, id asc) in one
        # argpartition — no per-row Python loop. Sentinel is −2^62, NOT
        # int64 min: the kernel negates comp and -(int64 min) wraps back
        # to itself, floating the sentinel to the top. Query rows stream
        # through in chunks with in-place elementwise ops so intermediates
        # stay ~cache-sized instead of materializing five |q|×|shard|
        # float64 temporaries (the memory-traffic half of the measured
        # 10k×500k slowdown; the BLAS-thread cap is the other half).
        sentinel = -(np.int64(1) << 62)
        out_src, out_dst, out_sim = [], [], []
        chunk = max(1, (1 << 21) // max(nc, 1))  # ~16 MB f64 per chunk
        for lo in range(0, q.shape[0], chunk):
            hi = min(lo + chunk, q.shape[0])
            s = q[lo:hi] @ mt
            np.divide(s, qn[lo:hi, None] * cn[None, :], out=s)
            np.multiply(s, 10000.0, out=s)
            np.add(s, 0.5, out=s)
            np.floor(s, out=s)
            s4i = s.astype(np.int64)
            comp = np.multiply(s4i, np.int64(1) << 40)
            np.subtract(comp, c_ids[None, :], out=comp)
            for r in range(lo, hi):
                j = colmap.get(int(q_ids[r]))
                if j is not None:
                    comp[r - lo, j] = sentinel
            if nc > kk:
                idx = np.argpartition(-comp, kk - 1, axis=1)[:, :kk]
            else:
                idx = np.tile(np.arange(nc), (hi - lo, 1))
            part = np.take_along_axis(comp, idx, axis=1)
            order = np.argsort(-part, axis=1)
            idx = np.take_along_axis(idx, order, axis=1)
            picked = np.take_along_axis(part, order, axis=1)
            valid = (picked != sentinel).ravel()
            out_src.append(np.repeat(q_ids[lo:hi], kk)[valid])
            out_dst.append(c_ids[idx].ravel()[valid])
            out_sim.append(
                np.take_along_axis(s4i, idx, axis=1).ravel()[valid]
                / 10000.0
            )
        return pd.DataFrame(
            {
                "src": np.concatenate(out_src),
                "dst": np.concatenate(out_dst),
                "sim": np.concatenate(out_sim),
            }
        )

    local = (
        src_g.groupBy("qb", "cb")
        .cogroup(cor_g.groupBy("qb", "cb"))
        .applyInPandas(kernel, schema)
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-random-projection bucket id (one long per vector): bit p = sign
    of <v, plane_p>. Pure column expr — vectorizable, no UDF."""
    bucket = None
    for p, plane in enumerate(planes):
        pv = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec_col, pv) >= 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bit if bucket is None else bucket.bitwiseOR(bit)
    return bucket


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: rank only vectors falling in the query's LSH
    bucket. At scale the bucket column is precomputed/partitioned-by, making
    a query a partition-pruned scan instead of a full sweep."""
    planes = _seeded_projections(dim, n_planes, seed)
    bucketed = embeddings.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    # compute the query's bucket driver-side (tiny, deterministic)
    qb = 0
    for p, plane in enumerate(planes):
        d = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if d >= 0:
            qb |= 2**p
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = round4(cosine(F.col(vec_col), q))
    return (
        bucketed.filter(F.col("_bucket") == qb)
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def ivf_index(
    embeddings: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF coarse quantizer: KMeans over the corpus; returns
    (assigned_df with `_list` column, fitted model). At scale you persist
    ``assigned_df`` partitioned by ``_list`` — a query then scans only its
    nprobe nearest lists (partition pruning does the index lookup)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.withColumn(
        "_features", array_to_vector(F.transform(vec_col, lambda x: x.cast("double")))
    )
    model = KMeans(
        k=n_lists, seed=seed, featuresCol="_features", predictionCol="_list"
    ).fit(feats)
    assigned = model.transform(feats).drop("_features")
    return assigned, model


def ivf_probe_lists(
    centers, query_vec: list[float], nprobe: int
) -> list[int]:
    """The IVF probe set: indices of the ``nprobe`` centroids nearest
    the query by cosine. Driver-side on purpose — centroids are tiny
    (n_lists × dim floats) regardless of corpus size; this list is what
    partition pruning keys on when the assigned table is stored
    partitioned by ``_list``."""
    q = [float(x) for x in query_vec]

    def _cos(c) -> float:
        dp = sum(a * b for a, b in zip(q, c))
        nq = sum(a * a for a in q) ** 0.5
        nc = sum(float(b) * float(b) for b in c) ** 0.5
        return dp / (nq * nc) if nq and nc else 0.0

    return sorted(range(len(centers)), key=lambda i: -_cos(centers[i]))[
        :nprobe
    ]


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via IVF: rank only vectors in the nprobe
    centroid lists nearest the query (``nprobe == n_lists`` degrades to
    exact brute force — the oracle-checkable configuration)."""
    assigned, model = ivf_index(embeddings, n_lists, id_col, vec_col, seed)
    probe = ivf_probe_lists(model.clusterCenters(), query_vec, nprobe)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = round4(cosine(F.col(vec_col), qcol))
    return (
        assigned.filter(F.col("_list").isin(*[int(p) for p in probe]))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def tfidf_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    caches: list | None = None,
) -> DataFrame:
    """Keyword search: rank documents by tf-idf overlap with the query.

    One explode + two aggregations: df(t) counted over the corpus, tf per
    (doc, term), score = Σ tf · ln(N/df). The per-term idf table is tiny
    (≤ |query| rows) and broadcast; the corpus is scanned once. This is
    the inverted-index probe pattern — at rest you'd precompute the
    (term, doc, tf) table and partition by term."""
    from data_wrangle_openstreetmaps_data_spark.functions.text import (
        round4,
        tokens,
    )

    n_docs = docs.count()  # scalar corpus size (one cheap job)
    # persisted: df(t) and tf below each re-ran the tokenize+explode
    # over the whole corpus otherwise (r13); post-filter this is
    # query-term occurrences only — tiny at any scale
    from pyspark.storagelevel import StorageLevel

    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok")
    ).filter(F.col("tok").isin(*query_terms)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if caches is not None:
        caches.append(toks)
    df_t = toks.groupBy("tok").agg(
        F.countDistinct("id").alias("df")
    )
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .withColumn("w", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
        .groupBy("id")
        .agg(round4(F.sum("w")).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.col("id")).limit(k)


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    caches: list | None = None,
) -> DataFrame:
    """BM25 ranking (Robertson/Sparck-Jones idf, doc-length normalized tf)
    for a fixed term query — the production cousin of ``tfidf_search``.

    Same inverted-index probe shape: one token explode filtered to the
    query terms, tiny broadcast df(t) table, per-doc length table joined
    on the doc key, and the corpus-level (N, avgdl) scalars attached as a
    broadcast single-row crossJoin so no driver-side collect happens for
    them. Score = Σ_t idf(t) · tf(k1+1) / (tf + k1(1 − b + b·dl/avgdl)),
    idf = ln((N − df + ½)/(df + ½) + 1)."""
    from pyspark.storagelevel import StorageLevel

    from data_wrangle_openstreetmaps_data_spark.functions.text import (
        round4,
        tokens,
    )

    # ONE persisted tokenization pass feeds everything below. The four
    # consumers (doc lengths ×2: avgdl scalar + per-doc join; the
    # inverted-index probe ×2: df(t) + tf) each re-ran the regex
    # tokenizer over the whole corpus before (Spark does not reuse
    # identical non-exchange subtrees) — 4 tokenize scans for one
    # query. The count() that materializes the cache IS the n_docs
    # scalar (one row per doc). Blocks are LRU-evicted; at real scale
    # dl and the inverted index are written once as bronze tables.
    tk = docs.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("_tk")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if caches is not None:
        caches.append(tk)
    n_docs = tk.count()
    dl = tk.select("id", F.size("_tk").alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"))  # 1 row → broadcast
    toks = tk.select(
        "id", F.explode("_tk").alias("tok")
    ).filter(F.col("tok").isin(*query_terms))
    df_t = toks.groupBy("tok").agg(F.countDistinct("id").alias("df"))
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n = F.lit(float(n_docs))
    idf = F.log((n - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    norm_tf = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .withColumn("w", idf * norm_tf)
        .groupBy("id")
        .agg(round4(F.sum("w")).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.col("id")).limit(k)


class AnnIndex:
    """'Index once, query many' ANN session (cf. incremental top-k search
    in interactive sessions, EDBT 2020): the LSH bucketing is computed and
    persisted ONCE; each query is a bucket-pruned scan of the cached
    table. At rest this is a table partitioned by bucket (``write_store``
    / ``from_store``); interactively it's a persisted DataFrame."""

    def __init__(self, embeddings: DataFrame, n_planes: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int = 64, seed: int = 42, persist: bool = True):
        """``persist=True`` (default) caches the bucketed table — the
        index-once/query-many shape. Pass ``persist=False`` for a
        one-shot query so nothing outlives the call (callers that keep
        the default own calling ``unpersist()``)."""
        from pyspark.storagelevel import StorageLevel

        self.planes = _seeded_projections(dim, n_planes, seed)
        self.id_col, self.vec_col = id_col, vec_col
        self._meta = {
            "n_planes": n_planes, "dim": dim, "seed": seed,
            "id_col": id_col, "vec_col": vec_col,
        }
        self.bucketed = embeddings.withColumn(
            "_bucket", lsh_bucket(F.col(vec_col), self.planes)
        )
        if persist:
            self.bucketed = self.bucketed.persist(StorageLevel.MEMORY_AND_DISK)

    def write_store(self, path: str) -> None:
        """Materialize the index as a parquet table PARTITIONED BY the
        bucket id — the at-rest form of index-once/query-many: a query
        against ``from_store`` becomes a partition-pruned scan of its
        probe buckets' directories (no full sweep, no recompute). A
        ``_ann_meta.json`` sidecar pins the plane parameters so a loaded
        index can never silently disagree with the stored bucketing."""
        import json
        import os

        self.bucketed.write.mode("overwrite").partitionBy("_bucket").parquet(
            path
        )
        with open(os.path.join(path, "_ann_meta.json"), "w") as fh:
            json.dump(self._meta, fh)

    @classmethod
    def from_store(cls, spark, path: str) -> "AnnIndex":
        """Reopen a ``write_store`` index: bucketing read from disk
        (never recomputed), planes regenerated from the sidecar params —
        queries are partition-pruned reads of the probe buckets."""
        import json
        import os

        with open(os.path.join(path, "_ann_meta.json")) as fh:
            meta = json.load(fh)
        idx = cls.__new__(cls)
        idx.planes = _seeded_projections(
            meta["dim"], meta["n_planes"], meta["seed"]
        )
        idx.id_col, idx.vec_col = meta["id_col"], meta["vec_col"]
        idx._meta = meta
        idx.bucketed = spark.read.parquet(path)
        return idx

    def query(self, query_vec: list[float], k: int = 10,
              probes: int = 1) -> DataFrame:
        """Top-k from the query's bucket (probes>1 additionally scans the
        buckets at Hamming distance 1 in bucket-bit space, trading cost
        for recall)."""
        qb = 0
        for p, plane in enumerate(self.planes):
            d = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
            if d >= 0:
                qb |= 2 ** p
        buckets = {qb}
        if probes > 1:
            buckets |= {qb ^ (1 << i) for i in range(len(self.planes))}
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        sim = round4(cosine(F.col(self.vec_col), q))
        return (
            self.bucketed.filter(F.col("_bucket").isin(*[int(b) for b in buckets]))
            .select(F.col(self.id_col), sim.alias("sim"))
            .orderBy(F.desc("sim"), F.col(self.id_col))
            .limit(k)
        )

    def unpersist(self) -> None:
        self.bucketed.unpersist()


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    n_planes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Bucketed approximate k-NN join: bucket both sides with the same
    hyperplanes, join on bucket, keep top-k neighbours per left row via a
    window. Join cost is sum of per-bucket products, not |L|×|R|."""
    from pyspark.sql import Window

    planes = _seeded_projections(dim, n_planes, seed)
    lb = left.select(
        F.col(id_col).alias("lid"), F.col(vec_col).alias("lvec")
    ).withColumn("_bucket", lsh_bucket(F.col("lvec"), planes))
    rb = right.select(
        F.col(id_col).alias("rid"), F.col(vec_col).alias("rvec")
    ).withColumn("_bucket", lsh_bucket(F.col("rvec"), planes))
    pairs = lb.join(rb, "_bucket").filter(F.col("lid") != F.col("rid"))
    sim = round4(cosine(F.col("lvec"), F.col("rvec")))
    w = Window.partitionBy("lid").orderBy(F.desc("sim"), F.col("rid"))
    return (
        pairs.select("lid", "rid", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("lid", "rid", "sim", "rn")
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    rounded: bool = True,
) -> DataFrame:
    """Per-label embedding centroid in LONG form — (label, pos, centroid)
    with one row per vector dimension. Element-wise mean via posexplode +
    (label, pos) aggregation: fully relational, partial aggregation
    map-side-combines each partition, and the shuffle carries
    labels × dim rows regardless of corpus size — the semantic-cluster
    profile pass of an embedding-curation pipeline at any scale.

    Long form deliberately: array re-assembly needs an order-sensitive
    collect, while downstream consumers (centroid similarity, nearest-
    centroid assignment) all want the long form anyway."""
    long = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "x"),
    )
    c = F.avg(F.col("x").cast("double"))
    agg = long.groupBy("label", "pos").agg(
        (round4(c) if rounded else c).alias("centroid")
    )
    return agg


def centroid_similarity(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise cosine similarity between label centroids — the
    inter-cluster separation diagnostic (labels whose centroids are too
    close are candidates for merging / semantic dedup across sources).

    Works on the long-form centroids: dot products via a (pos)-equality
    self-join over labels² × dim rows (tiny — label count is bounded),
    norms from one more aggregation. Output (label_a, label_b, cos_sim),
    a < b.

    The centroid frame feeds three plan branches (both join sides and the
    norms agg); Spark does not reuse identical non-exchange subtrees, so
    it is persisted — it is labels × dim rows, i.e. tiny."""
    from pyspark.storagelevel import StorageLevel

    cent = label_centroids(df, label_col, vec_col, rounded=False).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a, b = cent.alias("a"), cent.alias("b")
    dots = (
        a.join(b, (F.col("a.pos") == F.col("b.pos"))
               & (F.col("a.label") < F.col("b.label")))
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(F.sum(F.col("a.centroid") * F.col("b.centroid")).alias("dot"))
    )
    norms = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("centroid") * F.col("centroid"))).alias("nrm")
    )
    return (
        dots.join(norms.select(F.col("label").alias("label_a"),
                               F.col("nrm").alias("na")), "label_a")
        .join(norms.select(F.col("label").alias("label_b"),
                           F.col("nrm").alias("nb")), "label_b")
        .select(
            "label_a", "label_b",
            round4(F.col("dot") / (F.col("na") * F.col("nb"))).alias("cos_sim"),
        )
    )


def assign_nearest(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector nearest-centroid assignment — (vid, label, assigned),
    one row per vector: every vector goes to the label centroid it is
    most cosine-similar to.

    Fully relational: long-form centroids (labels × dim rows, broadcast),
    dot products via a pos-equality join + (vec, label) aggregation — the
    shuffle carries |vectors| × |labels| score rows, never an all-pairs
    vector join. The vector's own norm is a positive constant per vector,
    so it cannot change the argmax and is never computed. Scores are
    rounded to 4 dp BEFORE the argmax (portable floor trick) so summation
    -order ulps can't flip near-ties across engines; exact ties break by
    label. The tiny centroid frame feeds two branches and is persisted
    (Spark does not reuse identical non-exchange subtrees)."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    cent = label_centroids(df, label_col, vec_col, rounded=False).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    v = df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "x"),
    )
    dots = (
        v.join(
            F.broadcast(
                cent.select(
                    F.col("label").alias("assigned"), "pos", "centroid"
                )
            ),
            "pos",
        )
        .groupBy("vid", "label", "assigned")
        .agg(
            F.sum(F.col("x").cast("double") * F.col("centroid")).alias("dot")
        )
    )
    cnorm = cent.groupBy(F.col("label").alias("assigned")).agg(
        F.sqrt(F.sum(F.col("centroid") * F.col("centroid"))).alias("cn")
    )
    scored = dots.join(F.broadcast(cnorm), "assigned").withColumn(
        "cp", round4(F.col("dot") / F.col("cn"))
    )
    w = Window.partitionBy("vid").orderBy(F.desc("cp"), F.col("assigned"))
    best = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return best.select("vid", "label", "assigned")


def centroid_margin(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector cluster-separation margin — (vid, label, m4): the gap
    between the best and second-best centroid similarity, in EXACT
    1e-4-grid integer units (this corpus is unit-normalized, so
    dot/|c| IS the cosine score; both scores are round4-floored BEFORE
    the subtraction, making the margin an integer no float-sum ordering
    can perturb). The silhouette-style statistic: m≈0 flags vectors
    sitting on a cluster boundary. Same plan as :func:`assign_nearest`
    (broadcast long-form centroids, pos-equality join, (vec,label)
    aggregation), keeping window ranks 1 AND 2."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    cent = label_centroids(df, label_col, vec_col, rounded=False).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    v = df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "x"),
    )
    dots = (
        v.join(
            F.broadcast(
                cent.select(
                    F.col("label").alias("assigned"), "pos", "centroid"
                )
            ),
            "pos",
        )
        .groupBy("vid", "label", "assigned")
        .agg(
            F.sum(F.col("x").cast("double") * F.col("centroid")).alias("dot")
        )
    )
    cnorm = cent.groupBy(F.col("label").alias("assigned")).agg(
        F.sqrt(F.sum(F.col("centroid") * F.col("centroid"))).alias("cn")
    )
    scored = dots.join(F.broadcast(cnorm), "assigned").withColumn(
        "c4",
        F.floor(F.col("dot") / F.col("cn") * 10000 + F.lit(0.5)).cast(
            "long"
        ),
    )
    w = Window.partitionBy("vid").orderBy(F.desc("c4"), F.col("assigned"))
    ranked = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 2
    )
    return (
        ranked.groupBy("vid", "label")
        .agg(
            (
                F.max(F.when(F.col("rn") == 1, F.col("c4")))
                - F.max(F.when(F.col("rn") == 2, F.col("c4")))
            ).alias("m4")
        )
    )


def nearest_centroid(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment audit (the semantic-cluster coherence
    check of an embedding-curation pipeline): the (label, assigned, cnt)
    confusion counts of :func:`assign_nearest` — off-diagonal mass flags
    sources whose embeddings bleed into another label's cluster."""
    return (
        assign_nearest(df, label_col, vec_col, id_col)
        .groupBy("label", "assigned")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def kmeans_iteration(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One Lloyd iteration of k-means on the embedding column, seeded by
    the label centroids: assign every vector to its nearest centroid
    (:func:`assign_nearest`), then recompute the centroids from the new
    assignment — output (assigned, pos, centroid, n) in long form.

    This is the iterative-ML-on-DataFrames shape: each iteration is two
    relational passes (a broadcast-join score + argmax, then a
    posexplode + (cluster, pos) mean whose shuffle is clusters × dim
    partial rows thanks to map-side combine). No driver-side vectors, no
    RDD loop — iterate by re-applying the operator."""
    asg = assign_nearest(df, label_col, vec_col, id_col).select(
        "vid", "assigned"
    )
    v = df.select(
        F.col(id_col).alias("vid"), F.posexplode(vec_col).alias("pos", "x")
    )
    return (
        v.join(asg, "vid")
        .groupBy("assigned", "pos")
        .agg(
            round4(F.avg(F.col("x").cast("double"))).alias("centroid"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def quantize_stats(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric int quantization summary — (id, scale,
    max_abs_err): scale = max|x|, each component quantized to
    round(x/scale * (2^(bits-1)-1)), and the reconstruction error
    reported. The storage-sizing diagnostic you run before deciding to
    keep a 100 TB embedding column as int8 instead of float32 (4×
    smaller, cache-friendlier ANN scans).

    Column-expression HOFs over the array — one pass, no shuffle, no
    UDF; rounding is the portable floor(x+0.5) so an external engine
    reproduces the arithmetic bit-for-bit. Zero vectors quantize to zero
    error by convention."""
    qmax = float((1 << (bits - 1)) - 1)
    # materialize the double array and its scale as COLUMNS first: a
    # captured expression inside a later lambda re-evaluates per element
    # (PERF.md §1) — a captured column reference is free
    staged = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_xd"),
    ).withColumn(
        "_scale",
        F.array_max(F.transform(F.col("_xd"), lambda x: F.abs(x))),
    )
    # err_i = |x_i - round(x_i/scale*qmax) * scale/qmax|
    err = F.array_max(
        F.transform(
            F.col("_xd"),
            lambda x: F.abs(
                x
                - F.floor(x / F.col("_scale") * qmax + 0.5)
                * F.col("_scale") / qmax
            ),
        )
    )
    return staged.select(
        F.col(id_col),
        round4(F.col("_scale")).alias("scale"),
        round4(
            F.when(F.col("_scale") > 0, err).otherwise(F.lit(0.0))
        ).alias("max_abs_err"),
    )
