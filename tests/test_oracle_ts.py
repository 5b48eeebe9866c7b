"""Feature-kernel invariants (tests/test_ts.py shapes + semantics checks)."""

import numpy as np
import numpy.testing as npt
import pytest

from hdstats_oracle import (
    area_warp_similarity,
    complexity,
    completion,
    discordance,
    fourier_mean,
    fourier_median,
    fourier_std,
    mean_abs_change,
    mean_central_diff,
    mean_change,
    median_change,
    smooth,
    symmetry,
)
from tests.fixtures import landchar_like, scalar_stack


@pytest.fixture(scope="module")
def X():
    return scalar_stack()


@pytest.fixture(scope="module")
def Xnan():
    return scalar_stack(with_nans=True)


def test_completion_no_nans(Xnan):
    out = completion(Xnan)
    assert out.shape == Xnan.shape
    assert not np.isnan(out).any()  # test_ts.py:24-26
    # forward-fill: a hole takes the most recent valid value
    arr = np.array([[[1.0, np.nan, np.nan, 4.0, np.nan]]], dtype=np.float32)
    npt.assert_allclose(completion(arr)[0, 0], [1, 1, 1, 4, 4])
    # leading NaNs take the mean of the forward-filled series
    arr = np.array([[[np.nan, 2.0, np.nan, 4.0]]], dtype=np.float32)
    npt.assert_allclose(completion(arr)[0, 0], [(2 + 2 + 4) / 3, 2, 2, 4], rtol=1e-6)


def test_smooth_wiener_semantics(X):
    out = smooth(X, k=3)
    assert out.shape == X.shape
    # wiener shrinks toward the local mean: variance must not increase
    assert np.nanvar(out - X.mean()) <= np.nanvar(X - X.mean()) * 1.05


def test_smooth_matches_direct_formula():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 4, 11))
    k = 3
    h = k // 2
    pad = np.pad(x, [(0, 0), (0, 0), (h, h)])
    lmean = np.stack([pad[..., i : i + k].sum(-1) for i in range(x.shape[-1])], -1) / k
    lvar = (
        np.stack([(pad[..., i : i + k] ** 2).sum(-1) for i in range(x.shape[-1])], -1) / k
        - lmean**2
    )
    noise = lvar.mean()
    res = (x - lmean) * (1 - noise / lvar) + lmean
    expect = np.where(lvar < noise, lmean, res)
    npt.assert_allclose(smooth(x, k), expect, rtol=1e-12)


def test_discordance(X):
    out = discordance(X, n=5)
    assert out.shape == X.shape[:2]
    assert out.dtype == np.float32
    # the area-mean pixel's low-pass curve ≈ |area curve| → near-zero residual
    flat = np.broadcast_to(X.mean(axis=(0, 1)), X.shape).astype(np.float32).copy()
    d = discordance(flat, n=5)
    assert np.all(np.abs(d) < 0.05)


def test_fourier_shapes(X):
    for fn in (fourier_mean, fourier_std, fourier_median):
        out = fn(X, n=3, step=5)
        assert out.shape == X.shape[:2] + (3,)
        assert out.dtype == np.float32


def test_change_features(X):
    m, q, n = X.shape
    assert mean_change(X).shape == (m, q)
    # mean(diff) telescopes to (last-first)/(n-1)
    npt.assert_allclose(
        mean_change(X), (X[..., -1] - X[..., 0]) / (n - 1), rtol=1e-4, atol=1e-6
    )
    npt.assert_allclose(median_change(X), np.median(np.diff(X), axis=-1))
    npt.assert_allclose(mean_abs_change(X), np.mean(np.abs(np.diff(X)), axis=-1))
    mcd = mean_central_diff(X)
    assert mcd.shape == (m, q)
    lin = np.broadcast_to(np.arange(n, dtype=np.float32), X.shape).copy()
    npt.assert_allclose(mean_central_diff(lin), 0.0, atol=1e-6)


def test_complexity(X):
    out = complexity(X)
    assert out.shape == X.shape[:2]
    assert out.dtype == np.float32  # float32 einsum accumulation (ts.pyx:219)
    # unnormalized complexity of a straight line = sum of squared unit steps
    lin = np.broadcast_to(np.arange(10, dtype=np.float32), (2, 2, 10)).copy()
    npt.assert_allclose(complexity(lin, normalize=False), 9.0)


def test_symmetry(stack=landchar_like()):
    out = symmetry(stack)
    assert out.shape == stack.shape[:2]
    # time-mean equals gm in a constant stack → zero cosine distance
    const = np.full((3, 3, 4, 6), 0.5, dtype=np.float32)
    npt.assert_allclose(symmetry(const), 0.0, atol=1e-6)


def test_area_warp_similarity(X):
    out = area_warp_similarity(X)
    assert out.shape == X.shape[:2]
    assert out.dtype == np.float32
    # series equal to the area median → distance 0
    med = np.median(X, axis=(0, 1))
    flat = np.broadcast_to(med, X.shape).astype(np.float32).copy()
    npt.assert_allclose(area_warp_similarity(flat), 0.0, atol=1e-6)
    # semantics: (1,n) vs (1,n) DTW is L1/2 (ts.pyx:254 reshape)
    npt.assert_allclose(
        out[0, 0], np.abs(med - X[0, 0]).sum(dtype=np.float32) / 2.0, rtol=1e-5
    )
