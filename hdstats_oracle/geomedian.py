"""Weiszfeld / Vardi-Zhang geometric median — NumPy oracle.

Reference semantics: /root/reference/hdstats/geomedian.pyx
  * geomedian            (geomedian.pyx:379-395, kernels :74-145, :147-218)
  * nangeomedian         (geomedian.pyx:398-428, kernels :221-297, :300-376)
  * nangeomedian_pcm     (geomedian.pyx:472-517)
  * __bad_mask           (geomedian.pyx:431-441)

Float discipline (see geomedian.pyx:33-72): distances and sums accumulate in
float64 but every elementwise product / difference of float32 operands rounds
to float32 first (C `float op float` yields float), and every stored scalar is
cast back to float32.  The vectorized expressions below reproduce exactly
that rounding order.
"""

from __future__ import annotations

import warnings

import numpy as np

F32 = np.float32
_ZERO = np.float32(0.0)
_ONE = np.float32(1.0)


def _coldist(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Euclidean distance of every column of X (p,n) to y (p,).

    Mirrors dist_euclidean (geomedian.pyx:58-65): the subtraction rounds to
    float32, the squares accumulate in float64, the sqrt result is stored as
    float32.
    """
    diff = (X - y[:, None]).astype(np.float64)  # X,y float32 → f32 subtract
    return np.sqrt(np.einsum("pn,pn->n", diff, diff)).astype(F32)


def _dist(a: np.ndarray, b: np.ndarray) -> np.float32:
    """dist_euclidean of two float32 vectors (geomedian.pyx:58-65)."""
    d = (a - b).astype(np.float64)
    return F32(np.sqrt(np.dot(d, d)))


def _norm(x: np.ndarray) -> np.float32:
    """norm_euclidean (geomedian.pyx:67-72): note the square itself rounds to
    float32 (`d += x[i]*x[i]` with float32 x) before float64 accumulation."""
    sq = (x * x).astype(np.float64)
    return F32(np.sqrt(sq.sum()))


def _vardi_zhang_step(T, y, Dinvs, nzeros, anchor_eps):
    """Shared VZ anchor-point update (geomedian.pyx:127-136 / :276-285)."""
    R = (T - y) * Dinvs  # all float32
    r = _norm(R)
    if r > anchor_eps:
        rinv = F32(nzeros) / r  # size_t/float32 → float32 division
    else:
        rinv = _ZERO
    a = np.maximum(_ZERO, _ONE - rinv)
    b = np.minimum(_ONE, rinv)
    return a * T + b * y  # float32


def _geomedian_axis_one(X, eps=F32(1e-7), maxiters=500):
    """geomedian_axis_one (geomedian.pyx:147-218): NaN-free variant where
    points within `eps` of the current estimate are anchor points."""
    p, n = X.shape
    y = np.mean(X, axis=1)  # float32 (numpy mean, as the reference)
    if n == 1:
        return y
    y1 = y.copy()
    with np.errstate(all="ignore"):
        for _ in range(maxiters):
            D = _coldist(X, y)
            far = np.abs(D) > eps
            Dinv = np.where(far, (1.0 / D.astype(np.float64)).astype(F32), _ZERO)
            Dinvs = F32(np.sum(Dinv, dtype=np.float64))
            W = Dinv / Dinvs  # f32/f32
            prod = W[None, :] * X  # f32 products
            T = np.sum(prod[:, far].astype(np.float64), axis=1).astype(F32)
            nzeros = int(n - np.count_nonzero(far))
            if nzeros == 0:
                y1 = T
            elif nzeros == n:
                break
            else:
                y1 = _vardi_zhang_step(T, y, Dinvs, nzeros, eps)
            if _dist(y, y1) < eps:
                break
            y = y1.copy()
    return y1


def _nangeomedian_axis_one(X, eps=F32(1e-7), maxiters=500):
    """nangeomedian_axis_one (geomedian.pyx:300-376): NaN-aware variant —
    anchor threshold is exact zero, invalid observations carry NaN weight and
    are skipped by the nansum accumulators (geomedian.pyx:331,336-342)."""
    p, n = X.shape
    with warnings.catch_warnings():
        # reference silences FP noise via np.seterr(all='ignore')
        # (geomedian.pyx:497); all-NaN rows legitimately yield NaN means
        warnings.simplefilter("ignore", RuntimeWarning)
        y = np.nanmean(X, axis=1).astype(F32, copy=False)
    y1 = y.copy()
    with np.errstate(all="ignore"):
        for _ in range(maxiters):
            D = _coldist(X, y)
            far = np.abs(D) > 0.0  # NaN compares False → NaN weight below
            Dinv = np.where(far, (1.0 / D.astype(np.float64)).astype(F32), F32(np.nan))
            Dinvs = F32(np.nansum(Dinv, dtype=np.float64))
            W = Dinv / Dinvs
            prod = W[None, :] * X  # NaN products are skipped by nansum
            T = np.nansum(prod.astype(np.float64), axis=1).astype(F32)
            nzeros = int(np.count_nonzero(~np.isnan(D) & (np.abs(D) == 0.0)))
            if nzeros == 0:
                y1 = T
            elif nzeros == n:
                break
            else:
                y1 = _vardi_zhang_step(T, y, Dinvs, nzeros, _ZERO)
            d = _dist(y, y1)
            if d < eps:  # NaN d compares False → keep iterating (as reference)
                break
            y = y1.copy()
    return y1


def geomedian(X, axis=1, eps=1e-8, maxiters=1000):
    """Geometric median of (p,n) float32 matrix (geomedian.pyx:379-395)."""
    X = np.ascontiguousarray(X, dtype=F32)
    eps = F32(eps)
    if axis == 0:
        # axis-0 kernel (geomedian.pyx:74-145) is the axis-1 recursion on the
        # transpose; its only guard is p == 0 → return column mean.
        if X.shape[0] == 0:
            return np.mean(X, axis=0)
        return _geomedian_axis_one(np.ascontiguousarray(X.T), eps, maxiters)
    if axis == 1:
        return _geomedian_axis_one(X, eps, maxiters)
    raise IndexError(f"axis {axis} out of bounds")


def nangeomedian(X, axis=1, eps=1e-7, maxiters=1000):
    """NaN-aware geometric median (geomedian.pyx:398-428): 0 clean
    observations → ValueError, <3 → nanmedian fallback."""
    X = np.ascontiguousarray(X, dtype=F32)
    eps = F32(eps)
    if axis not in (0, 1):
        raise IndexError(f"axis {axis} out of bounds")
    # an observation is a row (axis=0) / column (axis=1); it is clean when no
    # component is NaN (geomedian.pyx:409,419)
    ngood = int(np.count_nonzero(~np.isnan(X).any(axis=1 - axis)))
    if ngood == 0:
        raise ValueError("All-NaN slice encountered")
    if ngood < 3:
        return np.nanmedian(X, axis=axis)
    if axis == 0:
        return _nangeomedian_axis_one(np.ascontiguousarray(X.T), eps, maxiters)
    return _nangeomedian_axis_one(X, eps, maxiters)


def bad_mask(X):
    """__bad_mask (geomedian.pyx:431-441): pixel invalid ⇔ every observation
    has at least one NaN band (observation invalid ⇔ any band NaN)."""
    return np.isnan(X.sum(axis=2)).all(axis=2)


def nangeomedian_pcm(X, eps=1e-7, maxiters=1000, num_threads=1, nodata=None, nocheck=False):
    """Per-pixel nangeomedian over an (m,q,p,n) stack → (m,q,p)
    (geomedian.pyx:472-517).

    Faithful quirks: the int16 path casts each pixel to float32 and calls the
    kernel with its *defaults* (eps=1e-7, maxiters=500 — geomedian.pyx:467,
    ignoring the arguments), truncates the float32 result to int16 C-style,
    and never applies the bad-data mask; the float path masks all-bad pixels
    to NaN unless nocheck (geomedian.pyx:511-513).
    """
    m, q, p, n = X.shape
    with np.errstate(all="ignore"):
        if X.dtype == np.int16:
            out = np.empty((m, q, p), dtype=np.int16)
            for row in range(m):
                for col in range(q):
                    vs = np.array(X[row, col], dtype=F32)
                    out[row, col] = _nangeomedian_axis_one(vs).astype(np.int16)
            return out
        Xf = np.ascontiguousarray(X, dtype=F32)
        out = np.empty((m, q, p), dtype=F32)
        for row in range(m):
            for col in range(q):
                out[row, col] = _nangeomedian_axis_one(Xf[row, col], F32(eps), maxiters)
        if not nocheck:
            out[bad_mask(Xf)] = np.nan
        return out
