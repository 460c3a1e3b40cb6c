"""osmpbf Python DataSource: blob-index partition planning + parity
with the binaryFile/mapInPandas route, and the one-file fan-out that
route cannot do (sources/pbf_datasource.py)."""

from __future__ import annotations

import os

import pytest

from data_wrangle_openstreetmaps_data_spark.sources import pbf, pbf_datasource
from tests.pbf_encoder import encode_pbf
from tests.test_pbf import NODES, RELATIONS, WAYS

TMP = os.path.join(os.path.dirname(__file__), "..", ".tmp")


@pytest.fixture(scope="module")
def single_blob_file():
    os.makedirs(TMP, exist_ok=True)
    path = os.path.join(TMP, "ds_fixture.osm.pbf")
    with open(path, "wb") as f:
        f.write(encode_pbf(NODES, WAYS, RELATIONS))
    return path


@pytest.fixture(scope="module")
def multi_blob_file():
    # three concatenated (header+data) segments = three OSMData blobs in
    # ONE file — the planet.pbf shape the binaryFile route can't split
    os.makedirs(TMP, exist_ok=True)
    path = os.path.join(TMP, "ds_multi.osm.pbf")
    batches = [
        [dict(n, id=n["id"] + off * 10**9) for n in NODES]
        for off in range(3)
    ]
    with open(path, "wb") as f:
        for b in batches:
            f.write(encode_pbf(b, [], []))
    return path


def test_index_blobs_walks_framing(single_blob_file):
    blobs = pbf_datasource.index_blobs(single_blob_file)
    types = [t for _, _, t in blobs]
    assert types.count("OSMData") >= 1
    # offsets must tile the file: re-read every indexed range and decode
    with open(single_blob_file, "rb") as f:
        data = f.read()
    rows = []
    for off, ln, t in blobs:
        if t != "OSMData":
            continue
        raw = pbf_datasource._decode_blob(data[off : off + ln])
        rows.extend(pbf.decode_primitive_block(raw))
    whole = pbf.decode_pbf_bytes(data)
    assert rows == whole


def test_datasource_parity_with_mapinpandas_route(spark, single_blob_file):
    pbf_datasource.register(spark)
    ds = (
        spark.read.format("osmpbf")
        .load(single_blob_file)
        .orderBy("type", "id")
        .collect()
    )
    ref = (
        pbf.read_pbf(spark, single_blob_file,
                     element_types=("node", "way", "relation"))
        .orderBy("type", "id")
        .collect()
    )
    assert [r.asDict(recursive=True) for r in ds] == [
        r.asDict(recursive=True) for r in ref
    ]


def test_one_file_fans_out_across_partitions(spark, multi_blob_file):
    pbf_datasource.register(spark)
    df = (
        spark.read.format("osmpbf")
        .option("blobspertask", "1")
        .load(multi_blob_file)
    )
    # one task per OSMData blob — the single-file parallelism claim
    assert df.rdd.getNumPartitions() == 3
    ids = sorted(int(r["id"]) for r in df.collect())
    want = sorted(
        n["id"] + off * 10**9 for off in range(3) for n in NODES
    )
    assert ids == want


def test_streaming_blob_log_incremental(spark):
    """Append-only blob-log streaming: drain, append a blob, re-drain
    against the SAME checkpoint — only the new blob's rows arrive
    (offset = end of last complete blob; exactly-once with the
    checkpoint)."""
    import shutil

    pbf_datasource.register(spark)
    path = os.path.join(TMP, "ds_stream.osm.pbf")
    ckpt = os.path.join(TMP, "ds_stream_ckpt")
    out = os.path.join(TMP, "ds_stream_out")
    for d in (ckpt, out):
        shutil.rmtree(d, ignore_errors=True)
    b1 = [dict(n) for n in NODES]
    b2 = [dict(n, id=n["id"] + 5 * 10**9) for n in NODES]
    with open(path, "wb") as f:
        f.write(encode_pbf(b1, [], []))

    def drain():
        # parquet sink: the fault-tolerant sink the checkpoint contract
        # needs (memory sink refuses checkpoint recovery)
        q = (
            spark.readStream.format("osmpbf")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            int(r["id"]) for r in spark.read.parquet(out).collect()
        )

    assert drain() == sorted(n["id"] for n in b1)
    with open(path, "ab") as f:
        f.write(encode_pbf(b2, [], []))
    # same checkpoint: the appended blob arrives, the first is NOT
    # re-emitted — sink now holds exactly one copy of each batch
    assert drain() == sorted(n["id"] for n in b1 + b2)


def test_streaming_backlog_capped_per_trigger(spark):
    """maxblobspertrigger backpressure (r10 advice): a pre-existing
    multi-blob backlog is consumed in CAPPED micro-batches — each
    availableNow run takes exactly one capped batch (a Simple stream
    reader's prefetched read() IS the batch), so the 4-segment backlog
    needs 4 runs instead of materializing whole on the driver; rows and
    exactly-once semantics identical to the uncapped drain."""
    import shutil

    pbf_datasource.register(spark)
    path = os.path.join(TMP, "ds_stream_cap.osm.pbf")
    ckpt = os.path.join(TMP, "ds_stream_cap_ckpt")
    out = os.path.join(TMP, "ds_stream_cap_out")
    for d in (ckpt, out):
        shutil.rmtree(d, ignore_errors=True)
    batches = [
        [dict(n, id=n["id"] + off * 10**9) for n in NODES]
        for off in range(4)
    ]
    with open(path, "wb") as f:
        for b in batches:
            f.write(encode_pbf(b, [], []))

    def drain_once() -> int:
        q = (
            spark.readStream.format("osmpbf")
            # each segment = 1 OSMHeader + 1 OSMData blob → 2 framed
            # blobs, so cap=2 admits exactly one segment per batch
            .option("maxblobspertrigger", "2")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sum(p["numInputRows"] for p in q.recentProgress)

    per_run = []
    for _ in range(8):
        n = drain_once()
        if n == 0:
            break
        per_run.append(n)
    got = sorted(int(r["id"]) for r in spark.read.parquet(out).collect())
    assert got == sorted(n["id"] for b in batches for n in b)
    seg = len(NODES)
    assert per_run == [seg] * 4, f"expected 4 capped batches, got {per_run}"


def test_read_osm_dispatches_pbf_to_datasource(spark, single_blob_file):
    """osm.read_osm on a .pbf path must route through the osmpbf
    DataSource (r11) and return the same raw-elements rows the
    mapInPandas route decodes — so wrangle_maps is format-agnostic."""
    from data_wrangle_openstreetmaps_data_spark.sources import osm

    df = osm.read_osm(spark, single_blob_file)
    via_kernel = pbf.read_pbf(spark, single_blob_file)
    got = {(r["id"], r["type"], r["user"]) for r in df.collect()}
    want = {
        (r["id"], r["type"], r["user"])
        for r in via_kernel.collect()
        if r["type"] in ("node", "way")
    }
    assert got == want and got
