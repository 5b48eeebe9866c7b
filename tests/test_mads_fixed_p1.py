"""Boundary-safety property behind the mads_fixed_p1 hash-green mirror.

The f32 Weiszfeld iterate does NOT land exactly on the 1-D median anchor
(f32 fixed points sit a few ulp off), so the DuckDB oracle absorbs the
residual by 2-dp rounding.  q_mads_fixed_p1's docstring carries the proof
that the 4n+1 value transform makes that rounding tie-free; this test pins
the three measurable legs of the argument on randomized cohorts through the
REAL kernels (kernels_np.nangeomedian_batch → mads_batch):

1. |gm − median| stays ≪ 0.005 (the 2-dp guard band);
2. kernel emad/bcmad round-match the oracle algebra computed from the
   EXACT median (what DuckDB evaluates);
3. every exact bcmad ratio sits ≥ 4e-5 from a 2-dp half-boundary (odd
   reduced denominators ≤ 101 — the (mod 4) engineering).
"""

import numpy as np

from hdstats_spark.kernels_np import mads_batch, nangeomedian_batch

L = 15  # odd: unique integer anchor


def _cohort(G, rng):
    counts = np.minimum(rng.poisson(3, size=(G, 1, L)), 25)
    return (4 * counts + 1).astype(np.float32)


def test_p1_gm_within_2dp_guard_band():
    rng = np.random.default_rng(11)
    X = _cohort(60000, rng)
    gm = nangeomedian_batch(X, eps=1e-7, maxiters=1000)
    med = np.median(X[:, 0, :], axis=1)
    delta = np.abs(gm[:, 0].astype(np.float64) - med)
    assert delta.max() < 5e-4  # observed ≤ 2.1e-5 over 300k; 0.005 is the band


def test_p1_mads_round_match_exact_median_algebra():
    rng = np.random.default_rng(12)
    X = _cohort(60000, rng)
    gm = nangeomedian_batch(X, eps=1e-7, maxiters=1000)
    out = mads_batch(X, gm)
    x = X[:, 0, :].astype(np.float64)
    m = np.median(X[:, 0, :], axis=1)[:, None]
    emad_o = np.median(np.abs(x - m).astype(np.float32), axis=1)
    bc_o = np.median((np.abs(x - m) / np.abs(x + m)).astype(np.float32), axis=1)
    assert np.array_equal(np.round(out["emad"].astype(np.float64), 2), np.round(emad_o.astype(np.float64), 2))
    assert np.array_equal(np.round(out["bcmad"].astype(np.float64), 2), np.round(bc_o.astype(np.float64), 2))
    # gm itself rounds onto the integer anchor
    assert np.array_equal(np.round(gm[:, 0].astype(np.float64), 2), m[:, 0])


def test_p1_ratios_far_from_rounding_boundaries():
    # exhaustive over the whole value domain, not sampled: v, m ∈ 4n+1,
    # n ≤ 25 — every possible bcmad ratio the cohort can produce
    vals = 4 * np.arange(26) + 1
    v, m = np.meshgrid(vals, vals)
    r = np.abs(v - m) / np.abs(v + m).astype(np.float64)
    # distance to nearest (2k+1)/200 half-boundary
    dist = np.abs(r - (np.floor(r * 100) + 0.5) / 100)
    assert dist.min() > 4e-5
