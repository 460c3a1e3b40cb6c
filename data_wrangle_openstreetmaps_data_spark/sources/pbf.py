"""OSM PBF source (the binary OpenStreetMap format).

The PBF file format (https://wiki.openstreetmap.org/wiki/PBF_Format) is a
sequence of blobs::

    [4-byte big-endian length][BlobHeader proto][Blob proto]...

where each OSMData Blob holds a zlib-compressed PrimitiveBlock: a string
table plus primitive groups of dense nodes / ways / relations with
delta-coded packed integers.

This module implements a minimal protobuf *wire-format* decoder in pure
stdlib Python (varint + zigzag + packed fields — no protobuf dependency,
which this environment doesn't ship) and exposes the result as the same
raw-elements DataFrame schema as the XML source (``osm.read_osm``), so the
whole downstream engine (audits, reshape, queries) is format-agnostic.

Spark integration: ``spark.read.format("binaryFile")`` parallelizes across
files; blob decode runs executor-side in ``mapInPandas`` (Arrow batches of
file splits). Scale note: one huge planet.pbf is a single binaryFile row —
the production refinement is a first pass that indexes blob offsets and
explodes (file, offset, length) tasks so one file fans out across
executors; blob independence makes that safe. The decoder itself is
per-blob and already executor-side.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

# --- protobuf wire format (decode) -----------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:  # 64-bit
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _packed_varints(buf: bytes, signed: bool = False) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(_zigzag(v) if signed else v)
    return out


# --- PBF blob framing -------------------------------------------------------


def iter_blocks(data: bytes) -> Iterator[tuple[str, bytes]]:
    """Yield (blob_type, raw PrimitiveBlock/HeaderBlock bytes)."""
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        (hlen,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if pos + hlen > n:
            raise ValueError(
                f"truncated PBF: BlobHeader of {hlen} bytes at offset {pos} "
                f"exceeds file size {n}"
            )
        header = data[pos:pos + hlen]
        pos += hlen
        btype, datasize = "", 0
        for field, _, val in _fields(header):
            if field == 1:
                btype = val.decode()
            elif field == 3:
                datasize = val
        if pos + datasize > n:
            raise ValueError(
                f"truncated PBF: blob of {datasize} bytes at offset {pos} "
                f"exceeds file size {n}"
            )
        blob = data[pos:pos + datasize]
        pos += datasize
        raw = None
        for field, _, val in _fields(blob):
            if field == 1:  # uncompressed
                raw = val
            elif field == 3:  # zlib_data
                raw = zlib.decompress(val)
        if raw is not None:
            yield btype, raw


# --- PrimitiveBlock decode --------------------------------------------------


def _decode_dense_nodes(dense: bytes, strings: list[str], gran: int,
                        lat_off: int, lon_off: int, date_gran: int) -> list[dict]:
    ids: list[int] = []
    lats: list[int] = []
    lons: list[int] = []
    keys_vals: list[int] = []
    info: dict[int, list[int]] = {}
    for field, _, val in _fields(dense):
        if field == 1:
            ids = _packed_varints(val, signed=True)
        elif field == 5:
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    info["version"] = _packed_varints(v2)
                elif f2 == 2:
                    info["timestamp"] = _packed_varints(v2, signed=True)
                elif f2 == 3:
                    info["changeset"] = _packed_varints(v2, signed=True)
                elif f2 == 4:
                    info["uid"] = _packed_varints(v2, signed=True)
                elif f2 == 5:
                    info["user_sid"] = _packed_varints(v2, signed=True)
        elif field == 8:
            lats = _packed_varints(val, signed=True)
        elif field == 9:
            lons = _packed_varints(val, signed=True)
        elif field == 10:
            keys_vals = _packed_varints(val)

    # undelta
    def undelta(xs):
        out, acc = [], 0
        for x in xs:
            acc += x
            out.append(acc)
        return out

    ids_a = undelta(ids)
    lats_a = undelta(lats)
    lons_a = undelta(lons)
    ts_a = undelta(info.get("timestamp", []))
    cs_a = undelta(info.get("changeset", []))
    uid_a = undelta(info.get("uid", []))
    usid_a = undelta(info.get("user_sid", []))
    ver_a = info.get("version", [])

    # split interleaved keys_vals on 0 sentinels
    tag_lists: list[list[tuple[str, str]]] = []
    cur: list[tuple[str, str]] = []
    i = 0
    while i < len(keys_vals):
        if keys_vals[i] == 0:
            tag_lists.append(cur)
            cur = []
            i += 1
        else:
            cur.append((strings[keys_vals[i]], strings[keys_vals[i + 1]]))
            i += 2
    if cur:
        # lenient encoders may omit the final 0 sentinel — flush, don't drop
        tag_lists.append(cur)
    while len(tag_lists) < len(ids_a):
        tag_lists.append([])

    out = []
    for i, nid in enumerate(ids_a):
        out.append(
            _element(
                "node",
                nid,
                lat=1e-9 * (lat_off + gran * lats_a[i]),
                lon=1e-9 * (lon_off + gran * lons_a[i]),
                version=ver_a[i] if i < len(ver_a) else None,
                timestamp=ts_a[i] * date_gran if i < len(ts_a) else None,
                changeset=cs_a[i] if i < len(cs_a) else None,
                uid=uid_a[i] if i < len(uid_a) else None,
                user=strings[usid_a[i]] if i < len(usid_a) else None,
                tags=tag_lists[i],
            )
        )
    return out


def _decode_info(buf: bytes, strings: list[str], date_gran: int) -> dict:
    out: dict = {}
    for field, _, val in _fields(buf):
        if field == 1:
            out["version"] = val
        elif field == 2:
            out["timestamp"] = val * date_gran
        elif field == 3:
            out["changeset"] = val
        elif field == 4:
            out["uid"] = val
        elif field == 5:
            out["user"] = strings[val]
    return out


def _iso(ts_ms) -> str | None:
    if ts_ms is None:
        return None
    import datetime as dt

    t = dt.datetime.fromtimestamp(ts_ms / 1000, dt.timezone.utc)
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def _element(etype: str, eid: int, lat=None, lon=None, tags=(), nds=None,
             members=None, **info) -> dict:
    return {
        "id": str(eid),
        "type": etype,
        "lat": None if lat is None else repr(lat),
        "lon": None if lon is None else repr(lon),
        "visible": None,
        "version": None if info.get("version") is None else str(info["version"]),
        "changeset": None if info.get("changeset") is None else str(info["changeset"]),
        "timestamp": _iso(info.get("timestamp")),
        "user": info.get("user"),
        "uid": None if info.get("uid") is None else str(info["uid"]),
        "tags": [{"k": k, "v": v} for k, v in tags] or None,
        "nds": None if nds is None else [{"ref": str(r)} for r in nds],
        "members": members,
    }


def _decode_way(buf: bytes, strings: list[str], date_gran: int) -> dict:
    wid = 0
    keys: list[int] = []
    vals: list[int] = []
    refs: list[int] = []
    info: dict = {}
    for field, _, val in _fields(buf):
        if field == 1:
            wid = val
        elif field == 2:
            keys = _packed_varints(val)
        elif field == 3:
            vals = _packed_varints(val)
        elif field == 4:
            info = _decode_info(val, strings, date_gran)
        elif field == 8:
            acc, refs = 0, []
            for d in _packed_varints(val, signed=True):
                acc += d
                refs.append(acc)
    tags = [(strings[k], strings[v]) for k, v in zip(keys, vals)]
    return _element("way", wid, tags=tags, nds=refs, **info)


_MEMBER_TYPES = {0: "node", 1: "way", 2: "relation"}


def _decode_relation(buf: bytes, strings: list[str], date_gran: int) -> dict:
    rid = 0
    keys: list[int] = []
    vals: list[int] = []
    roles: list[int] = []
    memids: list[int] = []
    types: list[int] = []
    info: dict = {}
    for field, _, val in _fields(buf):
        if field == 1:
            rid = val
        elif field == 2:
            keys = _packed_varints(val)
        elif field == 3:
            vals = _packed_varints(val)
        elif field == 4:
            info = _decode_info(val, strings, date_gran)
        elif field == 8:
            roles = _packed_varints(val)
        elif field == 9:
            acc, memids = 0, []
            for d in _packed_varints(val, signed=True):
                acc += d
                memids.append(acc)
        elif field == 10:
            types = _packed_varints(val)
    tags = [(strings[k], strings[v]) for k, v in zip(keys, vals)]
    members = [
        {"mtype": _MEMBER_TYPES.get(t, "node"), "ref": str(m),
         "role": strings[r] if r < len(strings) else ""}
        for t, m, r in zip(types, memids, roles)
    ]
    el = _element("relation", rid, tags=tags, members=members, **info)
    return el


def decode_primitive_block(raw: bytes) -> list[dict]:
    strings: list[str] = []
    groups: list[bytes] = []
    gran, lat_off, lon_off, date_gran = 100, 0, 0, 1000
    for field, _, val in _fields(raw):
        if field == 1:
            strings = [
                v.decode("utf-8", "replace")
                for f, _, v in _fields(val)
                if f == 1
            ]
        elif field == 2:
            groups.append(val)
        elif field == 17:
            gran = val
        elif field == 18:
            date_gran = val
        elif field == 19:
            lat_off = val
        elif field == 20:
            lon_off = val
    out: list[dict] = []
    for g in groups:
        for field, _, val in _fields(g):
            if field == 2:  # dense nodes
                out.extend(
                    _decode_dense_nodes(val, strings, gran, lat_off, lon_off,
                                        date_gran)
                )
            elif field == 3:  # way
                out.append(_decode_way(val, strings, date_gran))
            elif field == 4:  # relation
                out.append(_decode_relation(val, strings, date_gran))
    return out


def decode_pbf_bytes(data: bytes) -> list[dict]:
    out: list[dict] = []
    for btype, raw in iter_blocks(data):
        if btype == "OSMData":
            out.extend(decode_primitive_block(raw))
    return out


# --- Spark integration ------------------------------------------------------

RAW_DDL = (
    "id string, type string, lat string, lon string, visible string, "
    "version string, changeset string, timestamp string, user string, "
    "uid string, tags array<struct<k:string,v:string>>, "
    "nds array<struct<ref:string>>, "
    "members array<struct<mtype:string,ref:string,role:string>>"
)


def read_pbf(spark: SparkSession, path: str,
             element_types: tuple[str, ...] = ("node", "way")) -> DataFrame:
    """PBF → the engine's raw-elements DataFrame (same schema as
    ``osm.read_osm``). Parallel across files; decode is executor-side."""
    import pandas as pd

    types = set(element_types)
    files = spark.read.format("binaryFile").load(path).select("content")

    def kernel(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(
                    r for r in decode_pbf_bytes(bytes(blob))
                    if r["type"] in types
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "type", "lat", "lon", "visible", "version",
                    "changeset", "timestamp", "user", "uid", "tags", "nds",
                    "members",
                ],
            )

    return files.mapInPandas(kernel, RAW_DDL)
