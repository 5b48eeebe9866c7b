"""Property-based DTW tests (hypothesis): the padded mixed-length batch
kernels must be bit-identical to the serial per-series oracle for ANY
combination of series values, lengths, window widths and batch composition —
including constants, extremes, single-point series and windows wider than
the grid.  This fuzzes the corner-capture logic (distance read at diagonal
d=2L, backtrack from (L-1, L-1)) and the band-compact storage layout."""

import numpy as np
import numpy.testing as npt
from hypothesis import given, settings
from hypothesis import strategies as st

import hdstats_oracle as hdo
from hdstats_spark.kernels_np import dtw_dist_batch, dtw_path_batch

finite32 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)


@st.composite
def mixed_batch(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    G = draw(st.integers(min_value=1, max_value=6))
    lens = [draw(st.integers(min_value=1, max_value=n)) for _ in range(G)]
    ref = np.array(
        [draw(finite32) for _ in range(n)], dtype=np.float32
    )
    X = np.zeros((G, n), dtype=np.float32)
    for g, L in enumerate(lens):
        for t in range(L):
            X[g, t] = draw(finite32)
    window = draw(
        st.one_of(st.none(), st.integers(min_value=0, max_value=n + 2))
    )
    return X, ref, np.asarray(lens, np.int64), window


@given(mixed_batch())
@settings(max_examples=60, deadline=None)
def test_dtw_dist_matches_serial_any_batch(batch):
    X, ref, lens, window = batch
    got = dtw_dist_batch(X, ref, window, lengths=lens)
    for g, L in enumerate(lens):
        a = ref[:L].astype(np.float64).reshape(-1, 1)
        b = X[g, :L].astype(np.float64).reshape(-1, 1)
        want = hdo.dtw_dist(a, b) if window is None else hdo.local_dtw(a, b, window)[0]
        npt.assert_array_equal(got[g], np.float32(want))


@given(mixed_batch())
@settings(max_examples=40, deadline=None)
def test_dtw_path_matches_serial_any_batch(batch):
    X, ref, lens, window = batch
    dist, plens, ii, jj = dtw_path_batch(X, ref, window, lengths=lens)
    off = 0
    for g, L in enumerate(lens):
        a = ref[:L].astype(np.float64).reshape(-1, 1)
        b = X[g, :L].astype(np.float64).reshape(-1, 1)
        ds, _D, ps = hdo.dtw(a, b) if window is None else hdo.local_dtw(a, b, window)
        P = int(plens[g])
        npt.assert_array_equal(dist[g], np.float32(ds))
        npt.assert_array_equal(ii[off : off + P], ps[0])
        npt.assert_array_equal(jj[off : off + P], ps[1])
        off += P
