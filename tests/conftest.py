from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_wrangle_openstreetmaps_data_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"

# deeper fuzzing on demand: HYPOTHESIS_PROFILE=deep pytest tests/test_property.py
try:
    import os as _os

    from hypothesis import settings as _settings

    _settings.register_profile("default", max_examples=25, deadline=None)
    _settings.register_profile("deep", max_examples=200, deadline=None)
    _settings.load_profile(_os.environ.get("HYPOTHESIS_PROFILE", "default"))
except ImportError:
    pass


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def stage_time_split_events(spark, sf_dir: str, subdir: str, n: int = 3) -> str:
    """Stage the events table as ``n`` parquet files split by time range,
    with strictly increasing mtimes — a file-source stream over the result
    replays them as ``n`` in-time-order micro-batches (maxFilesPerTrigger=1),
    so per-key streaming state genuinely carries across batches. Returns
    the glob to stream from."""
    import os
    import time as _time

    from data_wrangle_openstreetmaps_data_spark.catalog import table as _table

    from data_wrangle_openstreetmaps_data_spark.catalog import event_ts_us

    d = os.path.join(os.path.dirname(__file__), "..", ".tmp", subdir)
    os.makedirs(d, exist_ok=True)
    ev = _table(spark, sf_dir, "events")
    # normalized epoch-µs long ts: the canonical stream shape (matches
    # EVENTS_SCHEMA / read_events_stream output) and approxQuantile-able
    ev = ev.withColumn("ts", event_ts_us(ev))
    splits = ev.approxQuantile(
        "ts", [i / n for i in range(1, n)], 0.001
    )
    bounds = [float("-inf")] + splits + [float("inf")]
    base = _time.time()
    for i in range(n):
        out = os.path.join(d, f"batch{i}")
        ev.filter(
            (F.col("ts") > bounds[i]) & (F.col("ts") <= bounds[i + 1])
        ).coalesce(1).write.mode("overwrite").parquet(out)
        t = base + 2 * i
        for root, _, files in os.walk(out):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    return os.path.join(d, "batch*")


from pyspark.sql import functions as F  # noqa: E402  (used by the helper)
