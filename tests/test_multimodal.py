"""Multimodal plumbing: binary columns + Arrow-batched decode stubs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.catalog import table
from data_wrangle_openstreetmaps_data_spark.multimodal import media
from tests.conftest import SF_SMALL


def _media_df(spark, n=20):
    docs = table(spark, SF_SMALL, "documents").limit(n)
    return media.attach_fake_media(docs)


def test_schema_and_metadata_only_projection(spark):
    df = _media_df(spark)
    assert dict(df.dtypes)["media"] == "binary"
    # metadata-only query never touches blob bytes (column pruning)
    meta = df.select("doc_id", "media_meta.media_type").collect()
    assert all(r["media_type"] == "image" for r in meta)


def test_decode_features_deterministic(spark):
    feats = media.decode_features(_media_df(spark)).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
        assert len(r["content_hash"]) == 32
    # re-run → identical (deterministic kernel)
    again = media.decode_features(_media_df(spark)).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_decode_matches_local_hash(spark):
    df = _media_df(spark, n=3)
    rows = {r["doc_id"]: bytes(r["media"]) for r in df.collect()}
    feats = {r["doc_id"]: r for r in media.decode_features(df).collect()}
    for doc_id, blob in rows.items():
        assert feats[doc_id]["content_hash"] == hashlib.md5(blob).hexdigest()
        assert feats[doc_id]["n_bytes"] == len(blob)


def test_unknown_media_type_raises(spark):
    with pytest.raises(NotImplementedError):
        media.decode_features(_media_df(spark), media_type="hologram")


def test_resize_updates_metadata_and_shrinks_blob(spark):
    df = _media_df(spark, n=5)
    before = {r["doc_id"]: len(bytes(r["media"])) for r in df.collect()}
    out = media.resize(df, width=32, height=32).collect()
    assert len(out) == 5
    for r in out:
        assert r["media_meta"]["width"] == 32
        assert r["media_meta"]["height"] == 32
        assert len(bytes(r["media"])) <= before[r["doc_id"]]


def test_frame_sample_expansion(spark):
    frames = media.frame_sample(_media_df(spark, n=5), every_n_bytes=32,
                                max_frames=3).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 5
    for rows in by_doc.values():
        assert 1 <= len(rows) <= 3
        assert [r["frame_idx"] for r in sorted(rows, key=lambda x: x["frame_idx"])] == list(range(len(rows)))
        assert all(len(bytes(r["frame"])) <= 32 for r in rows)


# --------------------------------------------------------------------------
# Real stdlib codecs (BMP via struct, WAV via wave)
# --------------------------------------------------------------------------


def test_bmp_round_trip_brute_force():
    """decode_bmp_stats must equal a brute-force pixel walk for
    geometries covering every row-padding residue (3*w mod 4)."""
    for w in (4, 5, 6, 7, 8):
        for h in (3, 4, 5):
            base = (w * h) % 100
            blob = media.encode_bmp(w, h, base)
            gw, gh, sb, sg, sr = media.decode_bmp_stats(blob)
            eb = sum(base + x + y for x in range(w) for y in range(h))
            eg = sum(2 * base + x for x in range(w) for y in range(h))
            er = sum(base + x * y for x in range(w) for y in range(h))
            assert (gw, gh, sb, sg, sr) == (w, h, eb, eg, er)


def test_bmp_decoder_rejects_non_bmp():
    import pytest

    with pytest.raises(ValueError, match="magic"):
        media.decode_bmp_stats(b"PNG\x00" + b"\x00" * 60)
    # valid magic but 8-bit depth must be refused, not mis-summed
    blob = bytearray(media.encode_bmp(4, 3, 10))
    blob[28] = 8
    with pytest.raises(ValueError, match="bpp"):
        media.decode_bmp_stats(bytes(blob))


def test_wav_round_trip():
    import struct as _struct
    import wave as _wave
    import io as _io

    blob = media.encode_wav(23, 700, rate=16000)
    n, rate, s, lo, hi = media.decode_wav_stats(blob)
    assert (n, rate) == (23, 16000)
    want = [700 - 500 + 13 * i for i in range(23)]
    assert (s, lo, hi) == (sum(want), min(want), max(want))
    # the bytes are a genuine WAV any reader opens
    with _wave.open(_io.BytesIO(blob), "rb") as w:
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        raw = w.readframes(23)
    assert list(_struct.unpack("<23h", raw)) == want


def test_synthesize_decode_media_stats_distributed(spark):
    """The full executor-side path: synthesize real BMPs and WAVs over
    a 2-partition frame, decode with the real codecs, check a known
    doc's stats exactly."""
    docs = spark.range(0, 40).select(
        F.col("id").alias("doc_id")
    ).repartition(2)
    got = {
        (r["doc_id"], r["fmt"]): r
        for fmt in ("bmp", "wav")
        for r in media.decode_media_stats(
            media.synthesize_media(docs, fmt)
        ).collect()
    }
    assert len(got) == 80
    r = got[(7, "bmp")]
    assert (r["dim1"], r["dim2"]) == (6, 6)
    assert (r["stat1"], r["stat2"], r["stat3"]) == (432, 594, 477)
    r = got[(7, "wav")]
    assert (r["dim1"], r["dim2"]) == (23, 8000)
    assert (r["stat1"], r["stat2"], r["stat3"]) == (-8050, -493, -207)


def test_synthesize_media_unknown_format_fails_fast(spark):
    import pytest

    docs = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(NotImplementedError, match="mp4"):
        media.synthesize_media(docs, "mp4")


def test_resize_bmp_nearest_neighbor_brute_force():
    """resize_bmp must equal a brute-force NN resample for geometries
    covering every padding residue, and the output must itself be a
    valid BMP the decoder accepts."""
    for w, h in ((4, 3), (5, 4), (6, 6), (7, 5), (8, 3)):
        base = (w + h) % 50
        small = media.resize_bmp(media.encode_bmp(w, h, base), 4, 3)
        gw, gh, sb, sg, sr = media.decode_bmp_stats(small)
        pts = [(x * w // 4, y * h // 3) for x in range(4) for y in range(3)]
        assert (gw, gh) == (4, 3)
        assert sb == sum(base + ix + iy for ix, iy in pts)
        assert sg == sum(2 * base + ix for ix, _ in pts)
        assert sr == sum(base + ix * iy for ix, iy in pts)


def test_resize_media_distributed(spark):
    docs = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    out = media.decode_media_stats(
        media.resize_media(media.synthesize_media(docs, "bmp"), 4, 3)
    ).collect()
    assert len(out) == 20
    assert all(r["dim1"] == 4 and r["dim2"] == 3 for r in out)
    with pytest.raises(Exception, match="wav"):
        media.resize_media(
            media.synthesize_media(docs, "wav"), 4, 3
        ).collect()


def test_resample_wav_decimation():
    blob = media.encode_wav(9, 700, rate=16000)
    half = media.resample_wav(blob, 2)
    n, rate, s, lo, hi = media.decode_wav_stats(half)
    want = [700 - 500 + 13 * i for i in range(9)][::2]
    assert (n, rate) == (5, 8000)
    assert (s, lo, hi) == (sum(want), min(want), max(want))
