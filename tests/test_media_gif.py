"""GIF codec property + corruption tests (round 9).

GIF completes the palette-image story next to BMP/PNG: a from-scratch
stdlib LZW codec (variable code width 9→12 with dictionary growth,
CLEAR on overflow, the cScSc code==next_code case, LSB-first packing,
sub-block framing, extension walking). Pure-Python kernels — no
SparkSession needed; the Spark-side plumbing is covered by
q_media_decode_gif in tests/test_queries_oracle.py.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_wrangle_openstreetmaps_data_spark.multimodal import media


def _unblock(comp: bytes) -> tuple[int, bytes]:
    """Strip the GIF sub-block framing → (min_code_size, code bytes)."""
    mcs = comp[0]
    data = bytearray()
    off = 1
    while comp[off] != 0:
        ln = comp[off]
        data += comp[off + 1: off + 1 + ln]
        off += 1 + ln
    return mcs, bytes(data)


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    base=st.integers(min_value=0, max_value=150),
)
def test_gif_codec_round_trip_property(w, h, base):
    """encode→decode over arbitrary geometry reproduces the closed-form
    channel sums exactly (palette idx = base + x*y, entry i =
    (i, i+17, 255-i))."""
    if base + (w - 1) * (h - 1) > 238:  # keep idx AND idx+17 wrap-free
        return
    gw, gh, sb, sg, sr = media.decode_gif_stats(media.encode_gif(w, h, base))
    assert (gw, gh) == (w, h)
    want_r = sum(base + x * y for x in range(w) for y in range(h))
    assert sr == want_r
    assert sg == want_r + 17 * w * h
    assert sb == 255 * w * h - want_r


@settings(max_examples=50, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000), n=st.integers(min_value=1, max_value=6000))
def test_gif_lzw_random_round_trip(seed, n):
    """LZW compress→decompress is the identity on arbitrary index
    streams — random data maximizes dictionary growth (width bumps) and,
    past ~4k entries, forces CLEAR resets."""
    rng = random.Random(seed)
    idx = bytes(rng.randrange(256) for _ in range(n))
    mcs, data = _unblock(media._gif_lzw_compress(idx))
    assert media._gif_lzw_decompress(data, mcs, n) == idx


def test_gif_lzw_repetitive_exercises_cscsc():
    """Highly repetitive input drives the decoder's code==next_code
    (cScSc) branch and deep dictionary chains; compression must be
    real (far below 1 byte/pixel)."""
    idx = (b"abcabcabcabd" * 700)[:8000]
    comp = media._gif_lzw_compress(idx)
    mcs, data = _unblock(comp)
    assert media._gif_lzw_decompress(data, mcs, len(idx)) == idx
    assert len(comp) < len(idx) // 4


def test_gif_width_growth_and_clear():
    """A 128x128 random image needs >4096 dictionary entries: every
    width bump (9→10→11→12) and at least one mid-stream CLEAR happen,
    and the round trip is still exact."""
    rng = random.Random(7)
    idx = bytes(rng.randrange(256) for _ in range(128 * 128))
    mcs, data = _unblock(media._gif_lzw_compress(idx))
    assert media._gif_lzw_decompress(data, mcs, len(idx)) == idx


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=10),
    h=st.integers(min_value=1, max_value=8),
    base=st.integers(min_value=0, max_value=120),
    nf=st.integers(min_value=1, max_value=8),
)
def test_gif_anim_frames_property(w, h, base, nf):
    """Animated round trip: every frame decodes in stream order with
    sum_r(t) = sum_r(0) + t·N — both values and temporal order proven.
    The NETSCAPE application extension must be walked over."""
    if base + (w - 1) * (h - 1) + nf - 1 > 238:
        return
    frames = media.decode_gif_frames(media.encode_gif_anim(w, h, base, nf))
    assert [f[0] for f in frames] == list(range(nf))
    n = w * h
    r0 = sum(base + x * y for x in range(w) for y in range(h))
    for t, fw, fh, sb, sg, sr in frames:
        assert (fw, fh) == (w, h)
        assert sr == r0 + t * n
        assert sg == sr + 17 * n
        assert sb == 255 * n - sr


def test_gif_single_frame_stats_match_frames_head():
    """decode_gif_stats on an animated blob returns exactly frame 0 of
    decode_gif_frames — the two walkers agree."""
    blob = media.encode_gif_anim(5, 4, 33, 4)
    w, h, sb, sg, sr = media.decode_gif_stats(blob)
    f0 = media.decode_gif_frames(blob)[0]
    assert (f0[1], f0[2], f0[3], f0[4], f0[5]) == (w, h, sb, sg, sr)


def test_gif_rejects_bad_magic():
    blob = bytearray(media.encode_gif(5, 4, 10))
    blob[0] = ord("X")
    with pytest.raises(ValueError, match="bad signature"):
        media.decode_gif_stats(bytes(blob))


def test_gif_rejects_truncated_lzw():
    """Dropping the tail of the code stream must fail loudly (pixel
    count mismatch or stream end), never return partial stats."""
    blob = media.encode_gif(9, 6, 90)
    with pytest.raises(ValueError):
        media.decode_gif_stats(blob[:-10] + b"\x00\x3b")


def test_gif_extension_blocks_are_walked():
    """The fixture embeds a Graphic Control Extension; the decoder must
    skip it (and any other extension) to reach the image descriptor."""
    blob = media.encode_gif(4, 3, 7)
    assert b"\x21\xf9" in blob  # GCE present
    w, h, *_ = media.decode_gif_stats(blob)
    assert (w, h) == (4, 3)


def test_gif_unknown_block_rejected():
    """A corrupt block introducer (not extension/image/trailer) raises."""
    blob = media.encode_gif(4, 3, 7)
    # corrupt the image-descriptor introducer 0x2C -> 0x7E; its offset
    # is fixed by the fixture layout (header 13 + palette 768 + GCE 8) —
    # searching for the byte would hit 0x2C inside the palette
    i = 13 + 768 + 8
    assert blob[i] == 0x2C
    bad = blob[:i] + b"\x7e" + blob[i + 1:]
    with pytest.raises(ValueError, match="unknown GIF block"):
        media.decode_gif_stats(bad)
