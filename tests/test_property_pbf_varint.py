"""Property tests (hypothesis) for the round-12 PBF varint kernels:
the three packed-varint decode paths — scalar loop, numpy vectorized,
and the size dispatcher — must agree bit-for-bit on arbitrary value
streams, signed and unsigned, across the 1 KB dispatch crossover.

Pure-Python round-trip against the test encoder (tests/pbf_encoder.py
writes protobuf wire format independently of the decoder under test)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from data_wrangle_openstreetmaps_data_spark.sources.pbf import (
    _packed_auto,
    _packed_varints,
    _packed_varints_np,
)
from tests.pbf_encoder import _varint, _zz

U64 = st.integers(min_value=0, max_value=(1 << 64) - 1)
S64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


def _pack_unsigned(vals: list[int]) -> bytes:
    return b"".join(_varint(v) for v in vals)


def _pack_signed(vals: list[int]) -> bytes:
    return b"".join(_varint(_zz(v)) for v in vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(U64, max_size=400))
def test_unsigned_decode_paths_agree(vals):
    buf = _pack_unsigned(vals)
    # protobuf 64-bit semantics: values wrap mod 2^64 into int64 view
    want = [v - (1 << 64) if v >= (1 << 63) else v for v in vals]
    assert _packed_varints(buf) == want
    assert _packed_varints_np(buf).tolist() == want
    assert _packed_auto(buf) == want


@settings(max_examples=200, deadline=None)
@given(st.lists(S64, max_size=400))
def test_signed_zigzag_decode_paths_agree(vals):
    buf = _pack_signed(vals)
    assert _packed_varints(buf, signed=True) == vals
    assert _packed_varints_np(buf, signed=True).tolist() == vals
    assert _packed_auto(buf, signed=True) == vals


@settings(max_examples=20, deadline=None)
@given(st.lists(S64, min_size=200, max_size=600))
def test_dispatch_crossover_consistent(vals):
    """Buffers straddling the 1024-byte numpy dispatch boundary decode
    identically whichever side of the crossover they land on."""
    buf = _pack_signed(vals)
    assert _packed_auto(buf, signed=True) == _packed_varints(
        buf, signed=True
    )
