"""Exact DTW goldens ported from /root/reference/tests/test_dtw.py:8-77."""

import numpy as np
import numpy.testing as npt

from hdstats_oracle import dtw, dtw_dist, local_dtw
from tests.fixtures import DTW_X, DTW_Y

D0 = np.array(
    [
        [1.0, 2.0, 3.0, 5.0, 7.0, 9.0, 11.0, 14.0, 16.0, 16.0],
        [2.0, 2.0, 3.0, 5.0, 7.0, 9.0, 11.0, 14.0, 16.0, 16.0],
        [2.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 8.0, 9.0, 10.0],
        [2.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 8.0, 9.0, 10.0],
        [3.0, 3.0, 3.0, 2.0, 2.0, 2.0, 2.0, 3.0, 3.0, 5.0],
        [6.0, 6.0, 6.0, 4.0, 4.0, 4.0, 4.0, 3.0, 5.0, 7.0],
        [7.0, 7.0, 7.0, 4.0, 4.0, 4.0, 4.0, 4.0, 3.0, 5.0],
        [7.0, 7.0, 7.0, 5.0, 5.0, 5.0, 5.0, 6.0, 4.0, 4.0],
        [8.0, 8.0, 8.0, 5.0, 5.0, 5.0, 5.0, 6.0, 4.0, 6.0],
        [9.0, 9.0, 9.0, 7.0, 7.0, 7.0, 7.0, 8.0, 6.0, 4.0],
    ]
)

PATH0 = np.array(
    [
        [0, 1, 2, 3, 4, 4, 4, 4, 5, 6, 7, 8, 9],
        [0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 8, 8, 9],
    ]
)

LOCAL_D0 = np.array(
    [
        [1.0, 2.0, 3.0, np.inf, np.inf, np.inf, np.inf, np.inf, np.inf, np.inf],
        [2.0, 2.0, 3.0, 5.0, np.inf, np.inf, np.inf, np.inf, np.inf, np.inf],
        [2.0, 2.0, 2.0, 3.0, 4.0, np.inf, np.inf, np.inf, np.inf, np.inf],
        [np.inf, 2.0, 2.0, 3.0, 4.0, 5.0, np.inf, np.inf, np.inf, np.inf],
        [np.inf, np.inf, 3.0, 2.0, 2.0, 2.0, 2.0, np.inf, np.inf, np.inf],
        [np.inf, np.inf, np.inf, 4.0, 4.0, 4.0, 4.0, 3.0, np.inf, np.inf],
        [np.inf, np.inf, np.inf, np.inf, 4.0, 4.0, 4.0, 4.0, 3.0, np.inf],
        [np.inf, np.inf, np.inf, np.inf, np.inf, 5.0, 5.0, 6.0, 4.0, 4.0],
        [np.inf, np.inf, np.inf, np.inf, np.inf, np.inf, 5.0, 6.0, 4.0, 6.0],
        [np.inf, np.inf, np.inf, np.inf, np.inf, np.inf, np.inf, 8.0, 6.0, 4.0],
    ]
)


def test_dtw_full():
    dist1, D1, path1 = dtw(DTW_X, DTW_Y)
    npt.assert_almost_equal(0.2, dist1)
    npt.assert_equal(D0, D1)
    npt.assert_equal(PATH0, path1)


def test_local_dtw():
    dist1, D1, path1 = local_dtw(DTW_X, DTW_Y, 2)
    npt.assert_equal(LOCAL_D0, D1)
    npt.assert_equal(PATH0, path1)


def test_dtw_dist():
    npt.assert_almost_equal(0.2, dtw_dist(DTW_X, DTW_Y))


def test_dtw_vector_valued():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(6, 4))
    b = rng.normal(size=(9, 4))
    d, D, path = dtw(a, b)
    assert d == D[-1, -1] / (6 + 9)
    assert path[0, 0] == 0 and path[1, 0] == 0
    assert path[0, -1] == 5 and path[1, -1] == 8
