"""Multimodal (binary) column operators.

Pattern: a 100 TB multimodal corpus is a table
``(doc_id, media: binary, media_meta: struct)`` where the binary blobs
dominate storage. The rules that make this workable at scale:

- NEVER collect blobs; all decode happens executor-side in Arrow batches
  via ``mapInPandas`` — one Python worker per core, zero per-row pickling.
- Column pruning must keep blob bytes out of queries that only need
  metadata — metadata lives in its own struct column, so a
  metadata-only query never touches the binary bytes (parquet column
  projection).
- Batch size is bounded by bytes not rows:
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` should be sized so
  batch_rows × avg_blob ≤ executor-memory headroom.

Real decoders (PIL/ffmpeg/torchaudio) are not in this container — the
kernel bodies are deterministic fakes registered in ``FAKE_DECODERS``;
swapping in real codecs changes ONE function, none of the Spark plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _fake_image_features(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding': normalized md5 bytes. A real
    implementation decodes the image and runs a vision encoder here."""
    d = hashlib.md5(blob).digest()
    return [b / 255.0 for b in d[:dim]]


FAKE_DECODERS = {
    "image": _fake_image_features,
    "audio": _fake_image_features,
    "video": _fake_image_features,
}


def attach_fake_media(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Test fixture builder: derive a deterministic binary column + typed
    metadata from an existing table (blob = utf8 bytes of the text)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("media_meta"),
    )


def decode_features(df: DataFrame, media_type: str = "image") -> DataFrame:
    """Arrow-batched decode → fixed-dim feature vector per blob.

    ``mapInPandas`` so a batch of blobs crosses the JVM↔Python boundary
    once as Arrow buffers; the kernel is the pluggable decoder."""
    decoder = FAKE_DECODERS.get(media_type)
    if decoder is None:
        raise NotImplementedError(
            f"no decoder for media_type={media_type!r}; real codecs are "
            "stubbed in this environment (see module docstring)"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "content_hash": blobs.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": blobs.map(lambda b: decoder(bytes(b))),
                }
            )

    return df.select("doc_id", "media").mapInPandas(kernel, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize plumbing: blob → smaller blob + updated metadata struct.

    Stub kernel: deterministic byte truncation proportional to the pixel
    reduction (a real implementation decodes, resamples, re-encodes).
    Demonstrates the metadata-consistency contract: the output struct
    reflects the transform, so downstream filters on dimensions stay
    correct without touching blob bytes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_media = []
            out_meta = []
            for blob, meta in zip(pdf["media"], pdf["media_meta"]):
                b = bytes(blob)
                ow = meta["width"] or width
                oh = meta["height"] or height
                scale = (width * height) / max(1, ow * oh)
                n = max(1, int(len(b) * min(1.0, scale)))
                out_media.append(b[:n])
                out_meta.append(
                    {
                        "media_type": meta["media_type"],
                        "format": meta["format"],
                        "width": width,
                        "height": height,
                        "duration_ms": meta["duration_ms"],
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out_media,
                    "media_meta": out_meta,
                }
            )

    return df.select("doc_id", "media", "media_meta").mapInPandas(
        kernel, RESIZED_SCHEMA
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 4) -> DataFrame:
    """'Frame sampling' plumbing: emit up to max_frames byte-slices per
    blob (a real implementation seeks keyframes with a video codec).
    Demonstrates the 1→N mapInPandas expansion shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_frames.append(b[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return df.select("doc_id", "media").mapInPandas(kernel, FRAME_SCHEMA)
