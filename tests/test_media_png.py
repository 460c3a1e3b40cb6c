"""PNG codec property + corruption tests (round 8).

The PNG tier completes the image-format story next to BMP: a real
stdlib-zlib codec (chunk walk, CRC32, inflate/deflate, all five
scanline filters). Pure-Python kernels — no SparkSession needed, so
example counts can be generous; the Spark-side plumbing is covered by
q_media_decode_png / q_media_resize_png in tests/test_queries_oracle.py.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_wrangle_openstreetmaps_data_spark.multimodal import media


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    base=st.integers(min_value=0, max_value=150),
)
def test_png_codec_round_trip_property(w, h, base):
    """encode→decode over arbitrary geometry reproduces the closed-form
    channel sums exactly; since row filter type is y % 5, any h ≥ 5
    exercises every PNG filter (None/Sub/Up/Average/Paeth)."""
    if base + w + h > 255 or base + (w - 1) * (h - 1) > 255 or 2 * base + w > 256:
        return
    gw, gh, sb, sg, sr = media.decode_png_stats(media.encode_png(w, h, base))
    assert (gw, gh) == (w, h)
    assert sb == sum(base + x + y for x in range(w) for y in range(h))
    assert sg == sum(2 * base + x for x in range(w) for y in range(h))
    assert sr == sum(base + x * y for x in range(w) for y in range(h))


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=2, max_value=24),
    h=st.integers(min_value=2, max_value=24),
    ow=st.integers(min_value=1, max_value=8),
    oh=st.integers(min_value=1, max_value=8),
)
def test_png_resize_property(w, h, ow, oh):
    """NN resize samples exactly (x*w//ow, y*h//oh) and re-encodes a
    decodable PNG — the same contract as resize_bmp."""
    base = 10
    if base + (w - 1) * (h - 1) > 255:
        return
    small = media.resize_png(media.encode_png(w, h, base), ow, oh)
    gw, gh, sb, _, _ = media.decode_png_stats(small)
    pts = [(x * w // ow, y * h // oh) for x in range(ow) for y in range(oh)]
    assert (gw, gh) == (ow, oh)
    assert sb == sum(base + ix + iy for ix, iy in pts)


def test_png_bmp_same_pixels():
    """The PNG and BMP fixtures share pixel formulas, so at identical
    geometry the two REAL codecs must agree on every channel sum —
    a cross-codec differential test."""
    for doc_id in (0, 7, 13, 42):
        w, h, base = 5, 6, 10 + doc_id
        png = media.decode_png_stats(media.encode_png(w, h, base))
        bmp = media.decode_bmp_stats(media.encode_bmp(w, h, base))
        assert png == bmp


def test_png_rejects_bad_signature():
    blob = media.encode_png(4, 4, 9)
    with pytest.raises(ValueError, match="bad signature"):
        media.decode_png_stats(b"XX" + blob[2:])


def test_png_rejects_bad_crc():
    blob = bytearray(media.encode_png(4, 4, 9))
    # flip one byte inside the IDAT payload (after the 8-byte sig +
    # 25-byte IHDR chunk + 8-byte IDAT length/type)
    blob[8 + 25 + 8] ^= 0xFF
    with pytest.raises(ValueError, match="bad CRC"):
        media.decode_png_stats(bytes(blob))


def test_png_rejects_unsupported_ihdr():
    # rebuild with a 16-bit-depth IHDR (CRC valid, shape unsupported)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + media._png_chunk(b"IHDR", ihdr)
        + media._png_chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + media._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        media.decode_png_stats(blob)


def test_png_rejects_truncated_idat():
    # valid chunks, but IDAT inflates to the wrong length
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + media._png_chunk(b"IHDR", ihdr)
        + media._png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + media._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT length"):
        media.decode_png_stats(blob)


def test_png_multi_idat_concatenation():
    """A PNG with its filtered stream split across several IDAT chunks
    must decode identically — the spec allows arbitrary splits."""
    w, h, base = 5, 6, 20
    blob = media.encode_png(w, h, base)
    # re-split: extract the single IDAT payload, re-chunk in 7-byte pieces
    off = 8
    pre, idat, post = b"", b"", b""
    while off < len(blob):
        (length,) = struct.unpack_from(">I", blob, off)
        ctype = blob[off + 4: off + 8]
        chunk = blob[off: off + 12 + length]
        if ctype == b"IDAT":
            idat = blob[off + 8: off + 8 + length]
        elif not idat:
            pre += chunk
        else:
            post += chunk
        off += 12 + length
    rechunked = b"\x89PNG\r\n\x1a\n" + pre + b"".join(
        media._png_chunk(b"IDAT", idat[i: i + 7])
        for i in range(0, len(idat), 7)
    ) + post
    assert media.decode_png_stats(rechunked) == media.decode_png_stats(blob)
