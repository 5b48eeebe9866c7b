"""Time-series feature kernels — NumPy oracle.

Reference semantics: /root/reference/hdstats/ts.pyx and tsslow.py
  * cosdist / eucdist          — ts.pyx:26-71 / :74-114
  * completion (gap-fill)      — tsslow.py:10-26 (≡ fast_completion ts.pyx:117-133)
  * smooth (Wiener filter)     — tsslow.py:29-30 → scipy.signal.wiener((1,1,k));
                                 scipy is absent in the sandbox so the filter
                                 is re-derived here with identical arithmetic
  * discordance                — ts.pyx:140-156 (NB deliberate asymmetry: the
                                 area curve takes |ifft| while per-pixel curves
                                 take Re(ifft); truncation keeps bins [0,n) only,
                                 i.e. NOT conjugate-symmetric)
  * fourier_mean/std/median    — ts.pyx:159-192
  * mean/median/abs change     — ts.pyx:195-204
  * mean_central_diff          — ts.pyx:207-209
  * complexity                 — ts.pyx:212-219 (float32 einsum accumulation)
  * symmetry                   — ts.pyx:231-243
  * area_warp_similarity       — ts.pyx:246-256 (each series enters DTW as a
                                 single n-dimensional point → L1/2)
"""

from __future__ import annotations

import numpy as np

from .dtw import dtw_dist
from .geomedian import nangeomedian_pcm

F32 = np.float32
F64 = np.float64


def cosdist(X, gm, num_threads=None):
    """Per-timestep cosine distance of stack to composite → (m,q,n)
    (ts.pyx:26-71).  float32 products, float64 accumulators."""
    Xf = np.asarray(X, dtype=F32)
    g = np.asarray(gm, dtype=F32)
    with np.errstate(all="ignore"):
        numer = np.einsum("mqpn->mqn", (Xf * g[..., None]).astype(F64))
        norma = np.einsum("mqpn->mqn", (Xf * Xf).astype(F64))
        normb = np.einsum("mqp->mq", (g * g).astype(F64))
        res = 1.0 - numer / (np.sqrt(norma) * np.sqrt(normb)[..., None])
    return res.astype(F32)


def eucdist(X, gm, num_threads=None):
    """Per-timestep euclidean distance → (m,q,n) (ts.pyx:74-114)."""
    Xf = np.asarray(X, dtype=F32)
    g = np.asarray(gm, dtype=F32)
    with np.errstate(all="ignore"):
        diff = (Xf - g[..., None]).astype(F64)
        total = np.einsum("mqpn,mqpn->mqn", diff, diff)
    return np.sqrt(total).astype(F32)


def completion(arr):
    """Gap-fill along the last axis (tsslow.py:10-26): forward-fill each
    series; any residual leading NaNs are replaced by the per-series mean of
    the *filled* series, sweeping timesteps forward until one is clean."""
    arr = np.asarray(arr)
    nan_at = np.isnan(arr)
    # index of the most recent valid timestep at or before t
    reach = np.where(nan_at, 0, np.arange(arr.shape[-1]))
    np.maximum.accumulate(reach, axis=-1, out=reach)
    dat = np.take_along_axis(arr, reach, axis=-1)
    if np.isnan(dat[..., 0]).any():
        fill = np.nanmean(dat, axis=-1)
        for t in range(dat.shape[-1]):
            holes = np.isnan(dat[..., t])
            if not holes.any():
                break
            dat[..., t][holes] = fill[holes]
    return dat


def _sliding_sum(x, k):
    """Zero-padded centered moving sum of width k (odd) along the last axis —
    the ``correlate(x, ones(k), 'same')`` that scipy's wiener uses."""
    h = k // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(h, h)]
    xp = np.pad(np.asarray(x, dtype=F64), pad)
    win = np.lib.stride_tricks.sliding_window_view(xp, k, axis=-1)
    return win.sum(axis=-1)


def smooth(arr, k=3):
    """Wiener filter with window (1,1,k) along time (tsslow.py:29-30).

    Re-derivation of scipy.signal.wiener semantics: local mean and variance
    in a zero-padded k-window, noise = mean of local variances, and the
    filtered value lMean + (1 - noise/lVar)·(x - lMean), falling back to the
    local mean wherever lVar < noise.
    """
    if k % 2 != 1:
        raise ValueError("window size k must be odd")
    arr64 = np.asarray(arr, dtype=F64)
    size = float(k)
    lmean = _sliding_sum(arr64, k) / size
    lvar = _sliding_sum(arr64 * arr64, k) / size - lmean * lmean
    noise = np.mean(lvar)
    with np.errstate(all="ignore"):
        res = (arr64 - lmean) * (1.0 - noise / lvar) + lmean
        out = np.where(lvar < noise, lmean, res)
    return out


def discordance(x, n=10):
    """Low-pass residual mean vs area curve → (y,x) (ts.pyx:140-156)."""
    x = np.asarray(x, dtype=F32)
    nt = x.shape[-1]
    m_curve = np.mean(x, axis=(0, 1))
    Y = np.fft.fft(m_curve)
    Y[n:nt] = 0.0
    m_lp = np.abs(np.fft.ifft(Y)).astype(F32)  # area curve: |ifft| (ts.pyx:146)
    Yp = np.fft.fft(x, axis=-1)
    Yp[..., n:nt] = 0.0
    x_lp = np.real(np.fft.ifft(Yp, axis=-1)).astype(F32)  # pixels: Re (ts.pyx:152)
    return np.mean(x_lp - m_lp[None, None, :], axis=-1)


def _fourier_bands(x, n, step, reduce_fn):
    """Shared |FFT| band reduction (ts.pyx:159-192); band k covers
    coefficients [1+k·step, (k+1)·step] inclusive (DC skipped)."""
    mag = np.abs(np.fft.fft(np.asarray(x), axis=-1))
    out = np.empty(x.shape[:2] + (n,), dtype=F32)
    for k in range(n):
        stop = (k + 1) * step + 1
        out[..., k] = reduce_fn(mag[..., 1 + k * step : stop or None], axis=-1)
    return out


def fourier_mean(x, n=3, step=5):
    return _fourier_bands(x, n, step, np.mean)


def fourier_std(x, n=3, step=5):
    return _fourier_bands(x, n, step, np.std)


def fourier_median(x, n=3, step=5):
    return _fourier_bands(x, n, step, np.median)


def mean_change(x):
    """mean(diff) over time (ts.pyx:195-196)."""
    return np.mean(np.diff(x), axis=-1)


def median_change(x):
    """median(diff) over time (ts.pyx:199-200)."""
    return np.median(np.diff(x), axis=-1)


def mean_abs_change(x):
    """mean(|diff|) over time (ts.pyx:203-204)."""
    return np.mean(np.abs(np.diff(x)), axis=-1)


def mean_central_diff(x):
    """Mean second-order central difference over interior timesteps
    (ts.pyx:207-209)."""
    x = np.asarray(x)
    second = (np.roll(x, 1, axis=2) - 2 * x + np.roll(x, -1, axis=2)) / 2.0
    return np.mean(second[:, :, 1:-1], axis=2)


def complexity(x, normalize=True):
    """tsfresh-style CID without the sqrt (ts.pyx:212-219).  All arithmetic —
    including the final einsum accumulation — stays in float32 when the input
    is float32, as in the reference."""
    x = np.asarray(x)
    if normalize:
        s = np.std(x, axis=2)
        x = (x - np.mean(x, axis=2)[:, :, None]) / s[:, :, None]
    z = np.diff(x)
    return np.einsum("ijk,ijk->ij", z, z)


def symmetry(x, gm=None, num_threads=None):
    """Cosine distance between the per-pixel time-mean spectrum and the
    geometric median (ts.pyx:231-243)."""
    if gm is None:
        gm = nangeomedian_pcm(x)
    mm = np.nanmean(x, axis=3)
    cd = cosdist(mm[:, :, :, None], gm)
    return cd.reshape(cd.shape[:2])


def area_warp_similarity(x, areats=None):
    """DTW distance of each pixel series to the area median series
    (ts.pyx:246-256).  Both series are reshaped to (1, n) — a single
    n-dimensional point each — so the DTW collapses to L1/2; we call the
    real dtw_dist to preserve that semantics exactly."""
    x = np.asarray(x)
    if areats is None:
        areats = np.median(x, axis=(0, 1))
    a = areats.reshape(1, -1)
    out = np.empty(x.shape[:2], dtype=F32)
    for i in range(x.shape[0]):
        for j in range(x.shape[1]):
            out[i, j] = dtw_dist(a, x[i, j, :].reshape(1, -1))
    return out
