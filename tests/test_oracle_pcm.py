"""Reference pcm/MAD invariants (tests/test_pcm.py) on the synthetic F2 stack."""

import numpy as np
import numpy.testing as npt
import pytest

from hdstats_oracle import (
    bad_mask,
    bcmad_pcm,
    cosdist,
    emad_pcm,
    eucdist,
    geomedian,
    nangeomedian,
    nangeomedian_pcm,
    smad_pcm,
)
from tests.fixtures import landchar_like


@pytest.fixture(scope="module")
def stack():
    return landchar_like()


@pytest.fixture(scope="module")
def gm(stack):
    return nangeomedian_pcm(stack, nodata=np.nan)


def test_shape_and_dtype(stack, gm):
    m, q, p, n = stack.shape
    assert gm.shape == (m, q, p)
    assert gm.dtype == np.float32


def test_pcm_equals_per_pixel(stack, gm):
    """nangeomedian_pcm[i,j] ≡ nangeomedian(stack[i,j]) (test_pcm.py:20-22)."""
    for i, j in [(0, 0), (3, 4), (11, 9)]:
        npt.assert_allclose(
            gm[i, j, :], nangeomedian(stack[i, j, :, :]), rtol=1e-4, atol=1e-4
        )


def test_fixed_point_matches_float(stack):
    """int16 ×10000 path matches the float path to 4 significant figures
    (test_pcm.py:25-31)."""
    clean = np.nan_to_num(stack, nan=0.0)  # int path treats NaN via nodata=0 sentinel
    fixed = (clean * 10000).astype(np.int16)
    fgm = nangeomedian_pcm(fixed)
    gm16 = (nangeomedian_pcm(clean) * 10000).astype(np.int16)
    npt.assert_approx_equal(np.nanmean(fgm), np.nanmean(gm16), significant=4)


def test_input_readonly(stack):
    data = stack.copy()
    data.setflags(write=False)
    out = nangeomedian_pcm(data)
    assert out.shape == stack.shape[:3]


def test_allnan_band_gives_nan(stack):
    """An all-NaN band poisons every observation of that pixel → NaN composite
    (test_pcm.py:39-44)."""
    bad = stack[:3, :3].copy()
    bad[1, 1, 0, :] = np.nan
    out = nangeomedian_pcm(bad)
    assert np.isnan(out[1, 1, 0])
    assert bad_mask(bad)[1, 1]
    assert not bad_mask(bad)[0, 0]


def test_mads_shapes_and_allnan(stack, gm):
    for fn in (emad_pcm, smad_pcm, bcmad_pcm):
        out = fn(stack, gm)
        assert out.shape == stack.shape[:2]
        assert out.dtype == np.float32
        assert np.isnan(out[1, 1])  # all-NaN pixel propagates (test_pcm.py:64-69)
        assert np.isfinite(out[0, 0])


def test_mad_uint16_matches_float(stack, gm):
    """uint16 ×10000 affine decode matches the float path to 4 sig. figs
    (test_pcm.py:55-62,75-82,94-101)."""
    # keep strictly positive: an exact 0.0 would encode to the uint16 nodata
    # sentinel and be skipped only by the euclidean kernel (geomad.pyx:72)
    clean = landchar_like(with_nans=False) + np.float32(0.1)
    gmc = nangeomedian_pcm(clean, nocheck=True)
    fixed = (clean * 10000).astype(np.uint16)
    emad_f = emad_pcm(fixed, gmc, scale=1e-4, offset=0.0, nocheck=True)
    npt.assert_approx_equal(
        np.nanmean(emad_f), np.nanmean(emad_pcm(clean, gmc, nocheck=True)), significant=4
    )
    # cosine / Bray-Curtis distances on this fixture are ~1e-2, so the ±1e-4
    # uint16 truncation noise bounds agreement at ~1e-3 relative
    for fn in (smad_pcm, bcmad_pcm):
        f = fn(fixed, gmc, scale=1e-4, offset=0.0, nocheck=True)
        g = fn(clean, gmc, nocheck=True)
        npt.assert_allclose(np.nanmean(f), np.nanmean(g), rtol=1e-3)


def test_distance_stacks(stack, gm):
    cd = cosdist(stack, gm)
    ed = eucdist(stack, gm)
    n = stack.shape[3]
    assert cd.shape == stack.shape[:2] + (n,)
    assert ed.shape == stack.shape[:2] + (n,)
    # identical observation → zero distance (pixel [1,1] is all-bad → NaN gm)
    one = np.broadcast_to(gm[..., None], stack.shape).copy()
    npt.assert_allclose(eucdist(one, gm)[0, 0], 0.0, atol=1e-6)
    npt.assert_allclose(cosdist(one, gm)[0, 0], 0.0, atol=1e-6)
    assert np.isnan(eucdist(one, gm)[1, 1]).all()


def test_geomedian_basic():
    """Plain geomedian: exact median of collinear symmetric points, and the
    component-median bound check on a random cloud."""
    X = np.array([[1, 2, 3, 4, 100]], dtype=np.float32)  # (p=1, n=5)
    med = geomedian(X, axis=1)
    npt.assert_allclose(med, [3.0], atol=1e-3)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(3, 101)).astype(np.float32)
    g = geomedian(pts, axis=1)
    assert np.all(np.abs(g) < 0.5)


def test_geomedian_axis0_equals_transposed_axis1():
    """Reference handles both axes (geomedian.pyx:379-395): axis=0 must equal
    the axis=1 recursion on the transpose, for geomedian and nangeomedian."""
    rng = np.random.default_rng(5)
    X = rng.normal(0.5, 0.2, size=(7, 12)).astype(np.float32)
    npt.assert_array_equal(geomedian(X, axis=0), geomedian(X.T.copy(), axis=1))
    Xn = X.copy()
    Xn[2, 3] = np.nan  # NaN-aware path too
    npt.assert_array_equal(nangeomedian(Xn, axis=0), nangeomedian(Xn.T.copy(), axis=1))
    # shape contract: axis=0 reduces rows → one value per column
    assert geomedian(X, axis=0).shape == (12,)
    with pytest.raises(IndexError):
        geomedian(X, axis=2)


def test_nangeomedian_guards():
    X = np.full((4, 6), np.nan, dtype=np.float32)
    with pytest.raises(ValueError):
        nangeomedian(X)
    # <3 clean observations → nanmedian fallback (geomedian.pyx:421-423)
    X = np.arange(8, dtype=np.float32).reshape(4, 2)
    X2 = np.concatenate([X, np.full((4, 3), np.nan, np.float32)], axis=1)
    npt.assert_allclose(nangeomedian(X2), np.nanmedian(X2, axis=1))
