"""Deterministic synthetic fixtures (FIXTURES.md F2/F3).

The reference's own test pickle (data/landchar-small.pkl, a (200,200,8,18)
float32 stack — /root/reference/tests/test_pcm.py:13-14) is absent from the
snapshot, so a seeded synthetic stack with the same structure and NaN
patterns stands in for it.
"""

from __future__ import annotations

import numpy as np


def landchar_like(m=12, q=10, p=8, n=18, seed=42, dropout=0.15, with_nans=True):
    """Smooth seasonal per-pixel curves in the reference's reflectance range
    (nanmean ≈ 0.14 regime) with ~15% any-band observation dropouts, one
    all-NaN pixel band [1,1,0,:], and a 2-step temporal blackout."""
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64) / n
    phase = rng.uniform(0, 1, size=(m, q, p))
    amp = rng.uniform(0.02, 0.08, size=(m, q, p))
    base = rng.uniform(0.05, 0.25, size=(m, q, p))
    X = base[..., None] + amp[..., None] * np.sin(
        2 * np.pi * (t[None, None, None, :] + phase[..., None])
    )
    X = X + rng.normal(0, 0.004, size=X.shape)
    X = X.astype(np.float32)
    if not with_nans:
        return X
    # observation dropouts: an invalid observation is NaN in every band
    drop = rng.random(size=(m, q, n)) < dropout
    X[np.broadcast_to(drop[:, :, None, :], X.shape)] = np.nan
    # one all-NaN band for one pixel (tests/test_pcm.py:41)
    X[1, 1, 0, :] = np.nan
    # temporal blackout (docs/temporal.ipynb cell 5 analogue)
    X[:, :, :, 7:9] = np.nan
    return X


def scalar_stack(m=12, q=10, n=18, seed=7, with_nans=False):
    """A (y,x,n) single-channel stack for the ts.pyx feature kernels."""
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    phase = rng.uniform(0, 2 * np.pi, size=(m, q))
    X = 0.3 + 0.2 * np.sin(2 * np.pi * t[None, None, :] / n + phase[..., None])
    X = (X + rng.normal(0, 0.01, size=X.shape)).astype(np.float32)
    if with_nans:
        holes = rng.random(size=X.shape) < 0.12
        X[holes] = np.nan
        X[0, 0, :3] = np.nan  # leading gap → mean backfill path
    return X


# exact DTW golden inputs (reference tests/test_dtw.py:9-10)
DTW_X = np.array([0, 0, 1, 1, 2, 4, 2, 1, 2, 0], dtype=np.float64).reshape(-1, 1)
DTW_Y = np.array([1, 1, 1, 2, 2, 2, 2, 3, 2, 0], dtype=np.float64).reshape(-1, 1)
