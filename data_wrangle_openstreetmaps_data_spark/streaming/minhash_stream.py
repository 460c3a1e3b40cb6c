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
- State is bounded two ways (both OFF by default so the oracle's
  full-history drain contract holds):
  * ``max_bucket`` caps bucket occupancy — the streaming analog of the
    batch tier's max-df stop-shingle cut. A boilerplate-heavy stream
    concentrates thousands of docs in one band bucket; without a cap
    that is O(members) state and O(members) Python work PER ARRIVAL.
    Arrivals into a saturated bucket are neither verified nor stored;
    each emits one saturation marker row ``(id, -1, NULL)`` so the
    caller can count what the cap skipped (and e.g. route those ids
    to a batch reconciliation pass).
  * ``ttl_minutes`` ages cold buckets out via
    GroupStateTimeout.ProcessingTimeTimeout — the production posture
    for unbounded streams where bucket keys keep arriving forever.
    Only for REAL triggers (processing-time/continuous ingest): an
    availableNow drain never terminates under a processing-time
    timeout — after the data is drained the engine keeps a "cleaning
    up state" trigger alive waiting for timers — so the oracle /
    drain path must keep the NoTimeout default.

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

#: id_b of a saturation marker row (max_bucket reached; arrival skipped)
SATURATED = -1


def _bucket_step(
    ids: list,
    sets: list,
    arrivals: list,
    threshold: float,
    max_bucket: int | None = None,
):
    """One micro-batch's worth of arrivals folded into a bucket's state.

    ``arrivals`` is a list of (id, shingle-hash set) sorted by id;
    mutates ``ids``/``sets`` in place and returns the emission rows
    (id_a, id_b, jaccard). Saturated arrivals emit (id, SATURATED, None)
    and leave state untouched — O(1) instead of O(members). Module-level
    (not a closure) so the cap/evict logic is unit-testable without a
    streaming harness."""
    out = []
    for nid, nset in arrivals:
        if max_bucket is not None and len(ids) >= max_bucket:
            out.append((nid, SATURATED, None))
            continue
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
                out.append((min(oid, nid), max(oid, nid), jac))
        ids.append(nid)
        sets.append(nset)
    return out


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
    max_bucket: int | None = None,
    ttl_minutes: float | None = None,
) -> DataFrame:
    """Streaming near-dup pairs (id_a < id_b, jaccard >= threshold, the
    jaccard exact) — each micro-batch's documents verified against their
    band buckets' full history. May emit the same pair once per agreeing
    band: dedup after the sink (see module docstring).

    ``max_bucket`` / ``ttl_minutes`` bound hot/cold bucket state — see
    the module docstring; both default OFF, which is the oracle-checked
    full-history configuration."""
    if bands <= 0 or n_hashes % bands != 0:
        raise ValueError(f"bands={bands} must divide n_hashes={n_hashes}")
    if max_bucket is not None and max_bucket < 1:
        raise ValueError(f"max_bucket={max_bucket} must be >= 1")
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
        if ttl_minutes is not None and state.hasTimedOut:
            # cold bucket aged out: drop its member history entirely
            state.remove()
            return
        if state.exists:
            ids, sets = state.get
            ids = list(ids)
            sets = [set(s) for s in sets]
        else:
            ids, sets = [], []
        rows = []
        for pdf in pdfs:
            # id order makes multi-row batches deterministic
            for _, row in pdf.sort_values("id").iterrows():
                rows.append(
                    (int(row["id"]), set(int(x) for x in row["hs"]))
                )
        out = _bucket_step(ids, sets, rows, threshold, max_bucket)
        state.update((ids, [list(s) for s in sets]))
        if ttl_minutes is not None:
            state.setTimeoutDuration(int(ttl_minutes * 60_000))
        if out:
            yield pd.DataFrame(
                out, columns=["id_a", "id_b", "jaccard"]
            )

    return keyed.groupBy("band", "band_sig").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_minutes is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
