"""Property-based codec tests (hypothesis): the Gorilla XOR and
delta-of-delta streams must round-trip BIT-EXACTLY for arbitrary inputs —
NaN payloads, ±inf, subnormals, constants, empty and single-element series,
and wildly non-monotone timestamps (the flat block codec concatenates
series, so boundary deltas are arbitrary int64s)."""

import numpy as np
import numpy.testing as npt
from hypothesis import given, settings
from hypothesis import strategies as st

from hdstats_spark.compression.gorilla import (
    decode_dod_timestamps,
    decode_xor_floats,
    encode_dod_timestamps,
    encode_xor_floats,
)

_floats = st.floats(allow_nan=True, allow_infinity=True, width=64)


@settings(max_examples=80, deadline=None)
@given(st.lists(_floats, min_size=0, max_size=300))
def test_xor_roundtrip_bitexact(vals):
    v = np.asarray(vals, dtype=np.float64)
    back = decode_xor_floats(encode_xor_floats(v))
    assert back.shape == v.shape
    # bit-level equality (NaN payloads included)
    npt.assert_array_equal(back.view(np.uint64), v.view(np.uint64))


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62 - 1),
        min_size=0,
        max_size=300,
    )
)
def test_dod_roundtrip_exact(ts):
    t = np.asarray(ts, dtype=np.int64)
    back = decode_dod_timestamps(encode_dod_timestamps(t))
    npt.assert_array_equal(back, t)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=200), st.integers(min_value=0, max_value=2**32))
def test_dod_monotone_series_compresses(n, start):
    """Regular 60s-step series (the 1m tier shape) must beat 8 B/point."""
    t = start + 60 * np.arange(n, dtype=np.int64)
    blob = encode_dod_timestamps(t)
    npt.assert_array_equal(decode_dod_timestamps(blob), t)
    if n >= 32:
        assert len(blob) < 8 * n * 0.25  # ≥4× on perfectly regular stamps


def test_ts_blob_version_header_roundtrip_and_reject():
    """Versioned ts_blob wrapper: µs blobs round-trip through the header;
    an unversioned (pre-µs, epoch-seconds) blob or an unknown version is
    rejected explicitly instead of silently decoding 10^6× too small."""
    import pytest

    from hdstats_spark.compression.tiercodec import (
        _TS_MAGIC, _TS_VER_US, _ts_decode_us, _ts_encode_us,
    )

    ts = np.datetime64("2025-03-01T12:00:00.250", "us").astype("int64") + 60_000_000 * np.arange(
        50, dtype=np.int64
    )
    blob = _ts_encode_us(ts)
    assert blob[:2] == _TS_MAGIC and blob[2] == _TS_VER_US
    npt.assert_array_equal(_ts_decode_us(blob), ts)

    legacy = encode_dod_timestamps(ts // 1_000_000)  # old headerless format
    with pytest.raises(ValueError, match="unversioned"):
        _ts_decode_us(legacy)
    with pytest.raises(ValueError, match="version"):
        _ts_decode_us(_TS_MAGIC + bytes([9]) + encode_dod_timestamps(ts))
