"""Custom stateful streaming operator: per-user EWMA (recurrence form).

The UNBOUNDED exponentially weighted moving average e_i = α·x_i +
(1−α)·e_{i−1} is a recurrence no Spark window or built-in streaming
aggregate expresses — but it is the canonical streaming-state shape:
two numbers of state per key, O(1) update per event. This is the
``applyInPandasWithState`` path, the numeric-state companion to
``sessionize.py``'s timeout-state operator.

Determinism contract: events are sorted by (ts, event_id) WITHIN each
micro-batch, and micro-batches must arrive in time order per user for
the recurrence to equal the batch closed form (single-file staging ⇒
one batch trivially satisfies this; the multi-batch test stages
time-range-split files). With α = 0.5, every weight is an exact binary
fraction and scaling by powers of two commutes with IEEE rounding, so
the streamed recurrence equals the oracle's left-to-right weighted sum
BIT FOR BIT — the estimate itself is value-oracled.

Scale properties: one shuffle on user_id; state is (ewma, n) per user —
O(users), independent of stream length.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n bigint, ewma double"
STATE_SCHEMA = "e double, n bigint"


def ewma_stream(events: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Streaming per-user EWMA over (user_id, ts, event_id, value).
    Emits the key's CURRENT (n, ewma) each micro-batch (update mode —
    the latest row per user is the live estimate). Same epoch-µs ``ts``
    contract as the sessionizers."""
    from data_wrangle_openstreetmaps_data_spark.catalog import event_ts_us

    if dict(events.dtypes)["ts"] != "bigint":
        events = events.withColumn("ts", event_ts_us(events))

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        e, n = state.get if state.exists else (0.0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for v in rows["value"]:
            e = alpha * float(v) + (1.0 - alpha) * e
            n += 1
        state.update((e, n))
        yield pd.DataFrame([(user_id, n, e)],
                           columns=["user_id", "n", "ewma"])

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
