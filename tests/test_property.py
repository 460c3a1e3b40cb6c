"""Property-based tests (hypothesis) for the pure-Python kernels whose
correctness the oracles lean on: the stdlib media codecs and the
event-time magnitude dispatch. These run without a SparkSession, so the
example counts can be generous."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_wrangle_openstreetmaps_data_spark.multimodal import media


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    base=st.integers(min_value=0, max_value=150),
)
def test_bmp_codec_round_trip_property(w, h, base):
    """encode→decode over arbitrary geometry (every stride residue and
    aspect) must reproduce the closed-form channel sums exactly —
    requires base + coords < 256 so no channel wraps."""
    if base + w + h > 255 or base + (w - 1) * (h - 1) > 255 or 2 * base + w > 256:
        return
    gw, gh, sb, sg, sr = media.decode_bmp_stats(media.encode_bmp(w, h, base))
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
def test_bmp_resize_property(w, h, ow, oh):
    """NN resize to any output geometry samples exactly
    (x*w//ow, y*h//oh) and re-encodes a decodable BMP."""
    base = 10
    if base + (w - 1) * (h - 1) > 255:  # fixture channel-range contract
        return
    small = media.resize_bmp(media.encode_bmp(w, h, base), ow, oh)
    gw, gh, sb, _, _ = media.decode_bmp_stats(small)
    pts = [(x * w // ow, y * h // oh) for x in range(ow) for y in range(oh)]
    assert (gw, gh) == (ow, oh)
    assert sb == sum(base + ix + iy for ix, iy in pts)


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=200),
    base=st.integers(min_value=0, max_value=999),
    rate=st.sampled_from([8000, 16000, 44100]),
    factor=st.integers(min_value=1, max_value=5),
)
def test_wav_codec_and_resample_property(n, base, rate, factor):
    blob = media.encode_wav(n, base, rate=rate)
    got = media.decode_wav_stats(blob)
    want = [base - 500 + 13 * i for i in range(n)]
    assert got == (n, rate, sum(want), min(want), max(want))
    half = media.resample_wav(blob, factor)
    kept = want[::factor]
    assert media.decode_wav_stats(half) == (
        len(kept), rate // factor, sum(kept), min(kept), max(kept)
    )


@settings(max_examples=300, deadline=None)
@given(
    us=st.integers(
        min_value=1_000_000_000_000_000,   # ~2001 in µs
        max_value=7_000_000_000_000_000,   # ~2191 in µs
    ),
    unit=st.sampled_from(["ns", "us", "ms", "s"]),
)
def test_event_ts_magnitude_dispatch_property(us, unit):
    """The bigint magnitude dispatch of catalog.event_ts_us must map an
    epoch in ANY of the four units back to the same µs instant (seconds
    and millis inputs quantize to their unit's precision)."""
    scale = {"ns": 1000, "us": 1, "ms": 1 / 1000, "s": 1 / 1_000_000}[unit]
    if unit == "ns":
        raw, expect = us * 1000, us
    elif unit == "us":
        raw, expect = us, us
    elif unit == "ms":
        raw, expect = us // 1000, us // 1000 * 1000
    else:
        raw, expect = us // 1_000_000, us // 1_000_000 * 1_000_000
    # replicate the dispatch arithmetic exactly as the Column expression
    # computes it (decimal div for nanos, integer multiplies otherwise)
    if raw >= 10**17:
        got = raw // 1000
    elif raw >= 10**14:
        got = raw
    elif raw >= 10**11:
        got = raw * 1000
    else:
        got = raw * 1_000_000
    assert got == expect, (unit, raw, got, expect)
