"""Streaming exact dedup: emit only the FIRST occurrence of each document
fingerprint across the whole stream history.

The batch dedup operators handle a static corpus; a continuously-ingesting
pipeline needs the streaming form: per-fingerprint keyed state
(``applyInPandasWithState``) remembering "seen", emitting a document only
when its key has no state yet. State is one tiny tuple per DISTINCT
fingerprint — the streaming analog of the hash-groupBy, and the stream
shuffles once on the fingerprint key.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_wrangle_openstreetmaps_data_spark.functions.text import fingerprint

OUT_SCHEMA = "doc_id bigint, fp string"
STATE_SCHEMA = "first_id bigint"


def dedup_stream(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Streaming first-occurrence filter keyed by content fingerprint."""
    keyed = docs.select(
        fingerprint(text_col).alias("fp"), docs[id_col].alias("doc_id")
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (fp,) = key
        if state.exists:
            return  # already seen in an earlier batch → emit nothing
        first_id = None
        for pdf in pdfs:
            batch_min = int(pdf["doc_id"].min())
            first_id = batch_min if first_id is None else min(first_id, batch_min)
        if first_id is not None:
            state.update((first_id,))
            yield pd.DataFrame({"doc_id": [first_id], "fp": [fp]})

    return keyed.groupBy("fp").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
