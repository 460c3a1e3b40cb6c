"""OSM PBF as a Spark 4 Python DataSource (``spark.read.format("osmpbf")``).

Closes the scale caveat documented in ``sources/pbf.py``: the
``binaryFile`` route hands ONE planet.pbf to ONE task, because a binary
file is a single un-splittable row there. PBF itself is a sequence of
independently-decodable blobs, so the right Spark shape is a custom
source whose ``partitions()`` is a driver-side INDEX PASS over blob
framing (seek + 4-byte length + BlobHeader per blob — no payload bytes
are read, a few KB of I/O per ~8 MB blob) and whose ``read()`` decodes
only its own blob ranges executor-side. One 100 TB file fans out across
every executor, the same blob independence argument the pbf.py
docstring makes — now implemented instead of promised.

Reference parity: the reference streams one element at a time through
SAX (openstreet_kolkata.py:60,90) and never parallelizes one file; this
source keeps its semantics (same raw-elements schema as the XML route)
at cluster scale.

Environment note: the index pass and partition reads open paths through
plain ``open()`` — local/NFS paths (this environment). A production
deployment swaps ``_open`` for the Hadoop-FS/fsspec opener; the
partition planning logic is unchanged.
"""

from __future__ import annotations

import glob as _glob
import os
import struct
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from data_wrangle_openstreetmaps_data_spark.sources.pbf import (
    RAW_DDL,
    _fields,
    arrow_schema,
    decode_primitive_block,
    elements_to_arrow,
)


def _open(path: str):
    return open(path, "rb")


def index_blobs(path: str) -> list[tuple[int, int, str]]:
    """Walk ONLY the blob framing of one file: per blob, read the
    4-byte header length + the BlobHeader (which carries the payload
    size), then seek past the payload. Returns (offset, length, type)
    of each raw Blob payload. I/O is O(#blobs) small reads."""
    out: list[tuple[int, int, str]] = []
    with _open(path) as f:
        size = os.fstat(f.fileno()).st_size
        pos = 0
        while pos + 4 <= size:
            head = f.read(4)
            if len(head) < 4:
                break
            (hlen,) = struct.unpack(">I", head)
            header = f.read(hlen)
            if len(header) < hlen:
                raise ValueError(f"truncated BlobHeader at {pos}")
            btype, datasize = "", 0
            for field, _, val in _fields(header):
                if field == 1:
                    btype = val.decode()
                elif field == 3:
                    datasize = val
            blob_off = pos + 4 + hlen
            if blob_off + datasize > size:
                raise ValueError(f"truncated blob at {blob_off}")
            out.append((blob_off, datasize, btype))
            pos = blob_off + datasize
            f.seek(pos)
    return out


def index_blobs_from(
    path: str, start_pos: int
) -> tuple[list[tuple[int, int, str]], int]:
    """Streaming variant of ``index_blobs``: walk framing from
    ``start_pos``, STOP (don't raise) at a truncated tail — a partially
    appended blob simply isn't visible yet. Returns (blobs, next_pos)
    where next_pos is the end of the last COMPLETE blob."""
    out: list[tuple[int, int, str]] = []
    with _open(path) as f:
        size = os.fstat(f.fileno()).st_size
        pos = start_pos
        f.seek(pos)
        while pos + 4 <= size:
            head = f.read(4)
            if len(head) < 4:
                break
            (hlen,) = struct.unpack(">I", head)
            if pos + 4 + hlen > size:
                break
            header = f.read(hlen)
            btype, datasize = "", 0
            for field, _, val in _fields(header):
                if field == 1:
                    btype = val.decode()
                elif field == 3:
                    datasize = val
            blob_off = pos + 4 + hlen
            if blob_off + datasize > size:
                break
            out.append((blob_off, datasize, btype))
            pos = blob_off + datasize
            f.seek(pos)
    return out, pos


def _decode_blob(blob: bytes) -> bytes | None:
    """Blob proto → raw PrimitiveBlock bytes (field 1 uncompressed,
    field 3 zlib) — the same two encodings pbf.iter_blocks accepts."""
    import zlib

    raw = None
    for field, _, val in _fields(blob):
        if field == 1:
            raw = val
        elif field == 3:
            raw = zlib.decompress(val)
    return raw


@dataclass
class PbfBlobsPartition(InputPartition):
    path: str
    ranges: tuple[tuple[int, int], ...]  # (offset, length) per blob


class OsmPbfReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("osmpbf: .load(path) is required")
        # blobs per task: small fixture blobs batch up; huge planet
        # blobs (~8 MB) get one task each by setting this to 1.
        # Default 2 (was 4): with Arrow-batch emission a blob decode is
        # pure CPU, so finer tasks win slots — warm A/B on the 560k
        # bench corpus: per=2 1.3s, per=4 1.6s full-scan wall
        self._per_task = int(options.get("blobspertask", "2"))

    def partitions(self) -> list[PbfBlobsPartition]:
        paths = sorted(_glob.glob(self._path)) or [self._path]
        parts: list[PbfBlobsPartition] = []
        for p in paths:
            data_ranges = [
                (off, ln)
                for off, ln, btype in index_blobs(p)
                if btype == "OSMData"
            ]
            for i in range(0, len(data_ranges), self._per_task):
                parts.append(
                    PbfBlobsPartition(
                        p, tuple(data_ranges[i : i + self._per_task])
                    )
                )
        return parts

    _COLS = (
        "id", "type", "lat", "lon", "visible", "version", "changeset",
        "timestamp", "user", "uid", "tags", "nds", "members",
    )

    def read(self, partition: PbfBlobsPartition):
        """Yield ONE Arrow RecordBatch per blob (Spark 4's vectorized
        DataSource ingest). The row-at-a-time tuple path this replaces
        pickled 560k individual rows through the Python worker —
        measured as the whole 2× pipeline gap vs the JVM XML route;
        columnar hand-off makes decode cost ≈ the profiled kernel."""
        schema = arrow_schema()
        with _open(partition.path) as f:
            for off, ln in partition.ranges:
                f.seek(off)
                raw = _decode_blob(f.read(ln))
                if raw is None:
                    continue
                rows = decode_primitive_block(raw)
                if rows:
                    yield elements_to_arrow(rows, schema)


class OsmPbfStreamReader(SimpleDataSourceStreamReader):
    """Streaming PBF ingest: the file is an append-only blob log (the
    OSM replication-feed shape). Offsets are byte positions of the last
    fully framed blob, so a half-appended blob is invisible until its
    bytes complete, each micro-batch decodes only the new blobs, and
    `readBetweenOffsets` replays any committed range bit-for-bit on
    recovery — exactly-once composition with the checkpoint, proven in
    tests/test_pbf_datasource.py by appending a batch and re-draining
    against the same checkpoint."""

    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("osmpbf: .load(path) is required")
        # Backpressure: a Simple stream reader decodes on the DRIVER, so
        # starting from {pos: 0} against a large pre-existing file would
        # otherwise materialize the whole backlog in ONE micro-batch
        # (r10 advice). Cap the blobs consumed per trigger; the offset
        # returned is the end of the LAST blob kept, so the remaining
        # backlog arrives over subsequent triggers with exactly-once
        # semantics unchanged (readBetweenOffsets replays committed
        # ranges bit-for-bit regardless of how they were batched).
        self._max_blobs = int(options.get("maxblobspertrigger", "64"))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, blobs) -> list[tuple]:
        cols = OsmPbfReader._COLS
        out: list[tuple] = []
        with _open(self._path) as f:
            for off, ln, btype in blobs:
                if btype != "OSMData":
                    continue
                f.seek(off)
                raw = _decode_blob(f.read(ln))
                if raw is None:
                    continue
                for el in decode_primitive_block(raw):
                    out.append(tuple(el.get(c) for c in cols))
        return out

    def read(self, start: dict):
        blobs, next_pos = index_blobs_from(self._path, start["pos"])
        if self._max_blobs > 0 and len(blobs) > self._max_blobs:
            blobs = blobs[: self._max_blobs]
            last_off, last_len, _ = blobs[-1]
            next_pos = last_off + last_len
        return iter(self._rows(blobs)), {"pos": next_pos}

    def readBetweenOffsets(self, start: dict, end: dict):
        blobs, _ = index_blobs_from(self._path, start["pos"])
        blobs = [b for b in blobs if b[0] < end["pos"]]
        return iter(self._rows(blobs))


class OsmPbfDataSource(DataSource):
    """``spark.dataSource.register(OsmPbfDataSource)`` then
    ``spark.read.format("osmpbf").load(path)`` (batch, blob fan-out)
    or ``spark.readStream.format("osmpbf").load(path)`` (append-only
    blob-log streaming)."""

    @classmethod
    def name(cls) -> str:
        return "osmpbf"

    def schema(self) -> str:
        return RAW_DDL

    def reader(self, schema) -> OsmPbfReader:
        return OsmPbfReader(self.options)

    def simpleStreamReader(self, schema) -> OsmPbfStreamReader:
        return OsmPbfStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(OsmPbfDataSource)
