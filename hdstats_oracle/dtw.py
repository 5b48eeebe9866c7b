"""Dynamic time warping — NumPy oracle.

Reference semantics: /root/reference/hdstats/dtw.pyx
  * dtw        — dtw.pyx:89-107  (full DP, ∞-bordered float32 cost matrix,
                 L1 point cost, distance normalized by r+c)
  * local_dtw  — dtw.pyx:35-53   (Sakoe-Chiba band, window widened to |r−c|)
  * dtw_dist   — dtw.pyx:69-86   (distance only)
  * optimalpath — dtw.pyx:109-121 (greedy backtrack preferring the diagonal)

Exact-equality goldens live in /root/reference/tests/test_dtw.py:8-77 and are
replicated in tests/test_oracle_dtw.py.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def _point_cost(a, b):
    """L1 distance between two (possibly vector-valued) samples
    (dtw.pyx:103)."""
    return np.linalg.norm(a - b, ord=1)


def _fill_dp(x, y, D, lo, hi):
    """Fill the bordered DP matrix in place; cell (i+1,j+1) gets
    cost(i,j) + min of the three predecessors (dtw.pyx:101-104)."""
    for i in range(x.shape[0]):
        for j in range(lo(i), hi(i)):
            c = _point_cost(x[i], y[j])
            best = D[i, j + 1]
            if D[i + 1, j] < best:
                best = D[i + 1, j]
            if D[i, j] < best:
                best = D[i, j]
            D[i + 1, j + 1] = c + best


def dtw_dist(x, y):
    """Normalized DTW distance (dtw.pyx:69-86)."""
    x = np.asarray(x)
    y = np.asarray(y)
    r, c = x.shape[0], y.shape[0]
    D = np.zeros((r + 1, c + 1), dtype=F32)
    D[1:, 0] = np.inf
    D[0, 1:] = np.inf
    _fill_dp(x, y, D, lambda i: 0, lambda i: c)
    return D[r, c] / (r + c)


def dtw(x, y):
    """Full DTW: (normalized distance, cost matrix, optimal path)
    (dtw.pyx:89-107)."""
    x = np.asarray(x)
    y = np.asarray(y)
    r, c = x.shape[0], y.shape[0]
    D = np.zeros((r + 1, c + 1), dtype=F32)
    D[1:, 0] = np.inf
    D[0, 1:] = np.inf
    _fill_dp(x, y, D, lambda i: 0, lambda i: c)
    return D[r, c] / (r + c), D[1:, 1:], optimalpath(D)


def local_dtw(s, t, window=4):
    """Sakoe-Chiba banded DTW (dtw.pyx:35-53): the band half-width is widened
    to at least |r−c|; cells outside the band stay +∞."""
    s = np.asarray(s)
    t = np.asarray(t)
    r, c = s.shape[0], t.shape[0]
    w = int(max(window, abs(r - c)))
    D = np.full((r + 1, c + 1), np.inf, dtype=F32)
    D[0, 0] = 0.0
    _fill_dp(s, t, D, lambda i: max(0, i - w), lambda i: min(c, i + w + 1))
    return D[r, c] / (r + c), D[1:, 1:], optimalpath(D)


def optimalpath(D):
    """Greedy backtrack over the bordered DP matrix, diagonal preferred on
    ties, then the i-decrement (dtw.pyx:109-121).  Returns a (2, L) index
    array in forward order."""
    i = D.shape[0] - 2
    j = D.shape[1] - 2
    steps = [(i, j)]
    while i > 0 or j > 0:
        diag = D[i, j]
        up = D[i, j + 1]
        left = D[i + 1, j]
        if diag <= up and diag <= left:
            i -= 1
            j -= 1
        elif up <= left and up <= diag:
            i -= 1
        else:
            j -= 1
        steps.append((i, j))
    steps.reverse()
    return np.asarray(steps).T
