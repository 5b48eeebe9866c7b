"""Geometric-median absolute deviation composites — NumPy oracle.

Reference semantics: /root/reference/hdstats/geomad.pyx
  * emad  (Euclidean MAD)    — geomad.pyx:200-247, kernels :28-47, :50-75
  * smad  (cosine MAD)       — geomad.pyx:250-300, kernels :78-106, :109-141
  * bcmad (Bray-Curtis MAD)  — geomad.pyx:303-350, kernels :144-167, :170-197

Each computes a per-timestep distance between the (m,q,p,n) stack and the
(m,q,p) geometric median, then reduces over time with nanmedian (median if
``nocheck``).  uint16 inputs are affine-decoded ``v*scale + offset``
(defaults 1e-4 / 0.0); only the *Euclidean* uint16 kernel skips nodata
components (geomad.pyx:72) — the cosine / Bray-Curtis uint16 kernels accept a
nodata argument but never use it, a quirk preserved here.
"""

from __future__ import annotations

import warnings

import numpy as np

F32 = np.float32
F64 = np.float64


def _decode_u16(X, scale, offset):
    """uint16 → float32 affine decode; the C expression rounds to float32
    before any accumulation (geomad.pyx:73,136,193)."""
    return (X.astype(F32) * F32(scale) + F32(offset)).astype(F32)


def _euclid_tsdist(Xf, gm, invalid=None):
    """(m,q,n) euclidean distance per timestep; f32 differences squared and
    accumulated in f64 (geomad.pyx:43-47)."""
    diff = (Xf - gm[..., None]).astype(F64)
    if invalid is not None:
        diff = np.where(invalid, 0.0, diff)
    total = np.einsum("mqpn,mqpn->mqn", diff, diff)
    return np.sqrt(total).astype(F32)


def _cosine_tsdist(Xf, gm, f32_products=True):
    """(m,q,n) cosine distance per timestep (geomad.pyx:89-106).

    In the float32 kernel every product rounds to float32 before the float64
    accumulation; in the uint16 kernel the decoded value is held in a C
    double, so products there are float64 (geomad.pyx:120-139).
    """
    if f32_products:
        numer = np.einsum("mqpn->mqn", (Xf * gm[..., None]).astype(F64))
        norma = np.einsum("mqpn->mqn", (Xf * Xf).astype(F64))
        normb = np.einsum("mqp->mq", (gm * gm).astype(F64))
    else:
        X64 = Xf.astype(F64)
        g64 = gm.astype(F64)
        numer = np.einsum("mqpn,mqp->mqn", X64, g64)
        norma = np.einsum("mqpn,mqpn->mqn", X64, X64)
        normb = np.einsum("mqp,mqp->mq", g64, g64)
    res = 1.0 - numer / (np.sqrt(norma) * np.sqrt(normb)[..., None])
    return res.astype(F32)


def _braycurtis_tsdist(Xf, gm, f32_terms=True):
    """(m,q,n) Bray-Curtis per timestep (geomad.pyx:155-167): f32 sums and
    differences, |·| taken in f64, accumulated in f64."""
    if f32_terms:
        numer = np.abs((Xf - gm[..., None]).astype(F64)).sum(axis=2)
        denom = np.abs((Xf + gm[..., None]).astype(F64)).sum(axis=2)
    else:
        X64 = Xf.astype(F64)
        g64 = gm[..., None].astype(F64)
        numer = np.abs(X64 - g64).sum(axis=2)
        denom = np.abs(X64 + g64).sum(axis=2)
    return (numer / denom).astype(F32)


def _reduce_time(res, nocheck):
    """Final time reduction (geomad.pyx:244-247)."""
    if nocheck:
        return np.median(res, axis=2)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN pixels → NaN
        return np.nanmedian(res, axis=2)


def emad_pcm(X, gm, num_threads=None, nocheck=False, nodata=None, scale=1e-4, offset=0.0):
    """Euclidean MAD composite (geomad.pyx:200-247)."""
    gm = np.asarray(gm, dtype=F32)
    with np.errstate(all="ignore"):
        if X.dtype == np.uint16:
            nodata = 0 if nodata is None else nodata
            Xf = _decode_u16(X, scale, offset)
            # nodata components contribute nothing to the squared sum
            # (geomad.pyx:71-74)
            res = _euclid_tsdist(Xf, gm, invalid=(X == nodata))
        else:
            res = _euclid_tsdist(np.asarray(X, dtype=F32), gm)
        return _reduce_time(res, nocheck)


def smad_pcm(X, gm, num_threads=None, nocheck=False, nodata=None, scale=1e-4, offset=0.0):
    """Spectral (cosine) MAD composite (geomad.pyx:250-300)."""
    gm = np.asarray(gm, dtype=F32)
    with np.errstate(all="ignore"):
        if X.dtype == np.uint16:
            res = _cosine_tsdist(_decode_u16(X, scale, offset), gm, f32_products=False)
        else:
            res = _cosine_tsdist(np.asarray(X, dtype=F32), gm, f32_products=True)
        return _reduce_time(res, nocheck)


def bcmad_pcm(X, gm, num_threads=None, nocheck=False, nodata=None, scale=1e-4, offset=0.0):
    """Bray-Curtis MAD composite (geomad.pyx:303-350)."""
    gm = np.asarray(gm, dtype=F32)
    with np.errstate(all="ignore"):
        if X.dtype == np.uint16:
            res = _braycurtis_tsdist(_decode_u16(X, scale, offset), gm, f32_terms=False)
        else:
            res = _braycurtis_tsdist(np.asarray(X, dtype=F32), gm, f32_terms=True)
        return _reduce_time(res, nocheck)
