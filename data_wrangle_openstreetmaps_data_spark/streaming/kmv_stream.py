"""Streaming KMV distinct sketch: per-key (event_type) state holding the
k smallest DISTINCT portable hashes seen so far (``applyInPandasWithState``),
emitting the running distinct estimate each micro-batch.

Why this shape: exact streaming COUNT(DISTINCT user) needs state linear
in the distinct count; the KMV state is a bounded k-long sorted list per
key, and because min-k merge is exact (any global min-k element is min-k
in every batch that contains it), the final emission equals the batch
sketch regardless of how the stream was chopped — pinned by a 3-batch
test and by the DuckDB oracle on the estimate itself (portable md5
hashes make even the ESTIMATE engine-independent).
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
    portable_token_hash,
)

OUT_SCHEMA = "event_type string, kc bigint, kmv_est double"
STATE_SCHEMA = "mins array<bigint>"

_NORM = float(1 << 60)


def kmv_stream(
    events: DataFrame,
    key_col: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Running per-key KMV distinct estimate over `id_col`. Emits one row
    per key per micro-batch (update mode); the LAST emission per key is
    the whole-stream sketch."""
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col(key_col).alias("event_type"),
        portable_token_hash(F.col(id_col).cast("string")).alias("h"),
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        mins = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            mins.update(int(h) for h in pdf["h"])
        top = sorted(mins)[:k]
        state.update((top,))
        kc = len(top)
        if kc >= k:
            est = float(k - 1) / (top[-1] / _NORM)
        else:
            est = float(kc)
        est4 = math.floor(est * 10000 + 0.5) / 10000
        yield pd.DataFrame(
            {"event_type": [etype], "kc": [kc], "kmv_est": [est4]}
        )

    return keyed.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
