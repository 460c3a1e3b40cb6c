"""Streaming MinHash-LSH near-duplicate detection.

The batch tier (operators/dedup.py::dedup_minhash_lsh) needs the whole
corpus; a continuously-ingesting pipeline wants pairs AS DOCUMENTS
ARRIVE: each incoming document is checked against the previously-seen
members of its LSH band buckets and verified-Jaccard pairs are emitted
immediately — the streaming analog of the banded self-join, with the
band buckets as keyed state.

Design:
- Per-ROW signature computation (no windows/aggregations, which a
  streaming frame cannot host before keyed state): shingle → xxhash64 →
  the SAME (h·a+b) mod P permutation arithmetic as the batch
  ``minhash_signatures``, folded with array HOFs. Interpreted HOFs are
  the slow path per PERF.md, but here each document is touched exactly
  once at ingest — there is no corpus-sized hot loop to amortize.
- ``applyInPandasWithState`` keyed by (band, band_sig): state holds the
  (id, shingle-hash set) of every seen member of the bucket; a new
  arrival is exact-Jaccard-verified against them (candidates only —
  never across buckets), emitted if >= threshold, then appended.
- State is bounded by bucket occupancy. Production streams put a
  TTL on it (GroupStateTimeout.ProcessingTimeTimeout) so cold buckets
  age out — kept NoTimeout here because the drain contract below needs
  full history.

Determinism contract (what the oracle checks): an availableNow drain
over ONE staged file is a single micro-batch, so every bucket sees all
its members at once and emits exactly the within-bucket verified pairs —
across buckets, the union of emissions equals the batch LSH pair set,
which at the recall-1.0 banding config equals the exact trigram-Jaccard
pair set (same contract as q_dedup_minhash). Pairs found by several
bands are emitted once per band; the caller dedups (batch-side, after
the drain).
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_wrangle_openstreetmaps_data_spark.functions.text import shingles
from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
    _MINHASH_P,
    _minhash_params,
)

OUT_SCHEMA = "id_a bigint, id_b bigint, jaccard double"
STATE_SCHEMA = "ids array<bigint>, sets array<array<bigint>>"


def _row_band_sigs(text_col: str, n_hashes: int, bands: int,
                   shingle_k: int) -> tuple:
    """(shingle-hash array expr, band-signature array expr) computed
    per row with the EXACT batch arithmetic: xxhash64 on the shingle
    string, h = pmod(s, P), sig_j = min((h·a_j + b_j) mod P), band sig =
    hash(concat_ws(',', sig slice))."""
    rows_per_band = n_hashes // bands
    hs = F.array_distinct(
        F.transform(shingles(text_col, shingle_k), lambda s: F.xxhash64(s))
    )
    h = F.transform(hs, lambda x: F.pmod(x, F.lit(_MINHASH_P)))

    def _perm(a: int, b: int):
        # closure factory, NOT a default-arg lambda: a 2-arg lambda would
        # make Spark bind (element, index) — see CLAUDE.md HOF rule
        return lambda x: (x * a + b) % _MINHASH_P

    sigs = [
        F.array_min(F.transform(h, _perm(a, b)))
        for a, b in _minhash_params(n_hashes)
    ]
    band_sigs = F.array(
        *[
            F.hash(
                F.concat_ws(
                    ",",
                    *[
                        sigs[bi * rows_per_band + i].cast("string")
                        for i in range(rows_per_band)
                    ],
                )
            )
            for bi in range(bands)
        ]
    )
    return hs, band_sigs


def minhash_pairs_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Streaming near-dup pairs (id_a < id_b, jaccard >= threshold, the
    jaccard exact) — each micro-batch's documents verified against their
    band buckets' full history. May emit the same pair once per agreeing
    band: dedup after the sink (see module docstring)."""
    if bands <= 0 or n_hashes % bands != 0:
        raise ValueError(f"bands={bands} must divide n_hashes={n_hashes}")
    hs, band_sigs = _row_band_sigs(text_col, n_hashes, bands, shingle_k)
    keyed = docs.select(
        F.col(id_col).alias("id"),
        hs.alias("hs"),
        F.posexplode(band_sigs).alias("band", "band_sig"),
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, sets = state.get
            ids = list(ids)
            sets = [set(s) for s in sets]
        else:
            ids, sets = [], []
        out_a, out_b, out_j = [], [], []
        for pdf in pdfs:
            # id order makes multi-row batches deterministic
            for _, row in pdf.sort_values("id").iterrows():
                nid = int(row["id"])
                nset = set(int(x) for x in row["hs"])
                for oid, oset in zip(ids, sets):
                    if oid == nid:
                        continue
                    inter = len(nset & oset)
                    union = len(nset) + len(oset) - inter
                    jac = (
                        math.floor(inter / union * 10000 + 0.5) / 10000
                        if union
                        else 0.0
                    )
                    if jac >= threshold:
                        out_a.append(min(oid, nid))
                        out_b.append(max(oid, nid))
                        out_j.append(jac)
                ids.append(nid)
                sets.append(nset)
        state.update((ids, [list(s) for s in sets]))
        if out_a:
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "jaccard": out_j}
            )

    return keyed.groupBy("band", "band_sig").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
