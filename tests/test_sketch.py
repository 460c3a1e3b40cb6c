"""Count-min sketch invariants: estimates never undercount, and two
partial sketches merged by summation equal the sketch of the union —
the property that lets per-day/per-partition sketches roll up without
touching raw data."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
    cms_build,
    cms_estimate,
)


def _events(spark, n=400, users=37):
    rows = [(i, i % users) for i in range(n)]
    # plant one heavy hitter
    rows += [(n + i, 7) for i in range(60)]
    return spark.createDataFrame(rows, ["event_id", "user_id"])


def test_cms_never_undercounts(spark):
    df = _events(spark)
    cms = cms_build(df, "user_id", depth=4, width=16)
    est = cms_estimate(df, cms, "user_id", depth=4, width=16)
    exact = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    joined = exact.join(est, "user_id").collect()
    assert len(joined) == 37
    assert all(r["cms_est"] >= r["exact"] for r in joined), joined


def test_cms_merges_by_summation(spark):
    df = _events(spark)
    a = df.filter(F.col("event_id") % 2 == 0)
    b = df.filter(F.col("event_id") % 2 == 1)
    merged = (
        cms_build(a, "user_id", depth=4, width=16)
        .unionByName(cms_build(b, "user_id", depth=4, width=16))
        .groupBy("cms_row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(df, "user_id", depth=4, width=16)
    m = {(r["cms_row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    w = {(r["cms_row"], r["bucket"]): r["cnt"] for r in whole.collect()}
    assert m == w


def test_streaming_cms_multibatch_equals_batch(spark, tmp_path_factory):
    """cms_build over a 3-micro-batch stream (complete mode) must equal
    cms_build over the same data in batch — streaming sketch maintenance
    is just the running (row,bucket) count."""
    import os

    from data_wrangle_openstreetmaps_data_spark.catalog import table
    from data_wrangle_openstreetmaps_data_spark.streaming import events as se
    from tests.conftest import SF_SMALL

    d = str(tmp_path_factory.mktemp("cms_stream"))
    ev = table(spark, SF_SMALL, "events")
    # three files → three micro-batches under maxFilesPerTrigger=1
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"b{i}"))
    files = [
        os.path.join(d, f"b{i}", f)
        for i in range(3)
        for f in os.listdir(os.path.join(d, f"b{i}"))
        if f.endswith(".parquet")
    ]
    stage = os.path.join(d, "stage")
    os.makedirs(stage)
    for i, f in enumerate(files):
        os.rename(f, os.path.join(stage, f"part-{i}.parquet"))

    stream = se.read_events_stream(spark, stage)
    assert stream.isStreaming
    se.run_to_memory(
        cms_build(stream, "user_id", depth=4, width=16),
        "cms_stream_t",
        output_mode="complete",
    )
    got = {
        (r["cms_row"], r["bucket"]): r["cnt"]
        for r in spark.table("cms_stream_t").collect()
    }
    want = {
        (r["cms_row"], r["bucket"]): r["cnt"]
        for r in cms_build(ev, "user_id", depth=4, width=16).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_kmv_multibatch_last_emission_equals_batch(spark, tmp_path):
    """kmv_stream over 3 micro-batches: the LAST emission per key must
    equal the from-scratch batch sketch (min-k merge is exact), and
    earlier emissions must be partial (kc non-decreasing)."""
    import os

    from data_wrangle_openstreetmaps_data_spark.catalog import table
    from data_wrangle_openstreetmaps_data_spark.operators.dedup import (
        portable_token_hash,
    )
    from data_wrangle_openstreetmaps_data_spark.streaming import events as se
    from data_wrangle_openstreetmaps_data_spark.streaming.kmv_stream import (
        kmv_stream,
    )
    from tests.conftest import SF_SMALL

    ev = table(spark, SF_SMALL, "events")
    stage = str(tmp_path / "kmv_stage")
    os.makedirs(stage)
    i = 0
    for b in range(3):
        part = str(tmp_path / f"b{b}")
        ev.filter(F.col("event_id") % 3 == b).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part)
        for f in os.listdir(part):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(part, f),
                    os.path.join(stage, f"part-{i}.parquet"),
                )
                i += 1
    stream = se.read_events_stream(spark, stage)
    se.run_to_memory(kmv_stream(stream, k=8), "kmv_mb", output_mode="update")
    rows = spark.table("kmv_mb").collect()
    # 3 emissions per key (update mode, one per batch); memory sink keeps
    # arrival order, so the max-kc row is the final state
    by_key = {}
    for r in rows:
        by_key.setdefault(r["event_type"], []).append((r["kc"], r["kmv_est"]))
    batch = (
        ev.select(
            "event_type",
            portable_token_hash(F.col("user_id").cast("string")).alias("h"),
        )
        .distinct()
    )
    import math

    want = {}
    for t, hs in (
        batch.groupBy("event_type").agg(F.collect_list("h").alias("hs"))
        .collect()
    ):
        top = sorted(set(hs))[:8]
        kc = len(top)
        est = (7.0 / (top[-1] / float(1 << 60))) if kc >= 8 else float(kc)
        want[t] = (kc, math.floor(est * 10000 + 0.5) / 10000)
    for t, ems in by_key.items():
        assert len(ems) == 3, ems
        kcs = [kc for kc, _ in ems]
        assert kcs == sorted(kcs), kcs  # state only grows
        assert ems[-1] == want[t], (t, ems[-1], want[t])


def test_bloom_prune_no_false_negatives_and_multiplicity(spark):
    """Every build-side key must pass its own filter (no false
    negatives), and duplicate probe rows must survive pruning with
    their multiplicity intact (semi-join membership, not a group gate)."""
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
        bloom_bits,
        bloom_prune,
    )

    build = spark.createDataFrame([(k,) for k in range(50)], ["k"])
    bits = bloom_bits(build, "k", m=256, k=3)
    # probe: every build key twice, plus foreign keys
    probe = spark.createDataFrame(
        [(k,) for k in range(50) for _ in range(2)]
        + [(k,) for k in range(1000, 1400)],
        ["k"],
    )
    kept = bloom_prune(probe, "k", bits, m=256, k=3)
    counts = {
        r["k"]: r["n"]
        for r in kept.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for k in range(50):
        assert counts.get(k) == 2, (k, counts.get(k))  # kept, twice
    # the m=256 filter over 50 keys must actually prune most foreigners
    n_foreign = sum(n for k, n in counts.items() if k >= 1000)
    assert n_foreign < 200, n_foreign


def test_hll_merge_equals_direct_build(spark):
    """max-merging per-group HLL registers must reproduce the registers
    (and therefore the estimate) of a direct build over all rows — the
    mergeability contract q_hll_merge's '__all__' row relies on."""
    from pyspark.sql import functions as F

    from data_wrangle_openstreetmaps_data_spark.operators.sketch import (
        hll_registers,
        hll_registers_by,
    )

    df = spark.createDataFrame(
        [(i % 5, f"user-{i % 37}") for i in range(400)], ["g", "u"]
    )
    merged = (
        hll_registers_by(df, "g", "u", p=8)
        .groupBy("bucket")
        .agg(F.max("m").alias("m"))
    )
    direct = hll_registers(df, "u", p=8)
    got = {(r["bucket"], r["m"]) for r in merged.collect()}
    want = {(r["bucket"], r["m"]) for r in direct.collect()}
    assert got == want
