"""Multimodal plumbing: binary columns + Arrow-batched decode stubs."""

from __future__ import annotations

import hashlib

import pytest

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
