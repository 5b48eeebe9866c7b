"""hdstats_oracle — executable pure-NumPy reference semantics.

This package is the correctness anchor for the Spark engine: a from-scratch
NumPy implementation of every public operator of the reference library
``daleroberts/hdstats`` (snapshot at /root/reference, Cython+OpenMP).  The
sandbox has no Cython/scipy, so this oracle *is* the reference executable.

Numeric discipline is preserved exactly (float32 storage, float64
accumulators, float32 rounding of intermediate products where the reference's
C arithmetic rounds) so the Spark kernels can be matched at the reference's
own test tolerances (rtol=1e-4, atol=1e-4, 4 significant figures —
/root/reference/tests/test_pcm.py:22-23,31).
"""

from .geomedian import (
    geomedian,
    nangeomedian,
    nangeomedian_pcm,
    bad_mask,
)
from .geomad import emad_pcm, smad_pcm, bcmad_pcm
from .ts import (
    cosdist,
    eucdist,
    completion,
    smooth,
    discordance,
    fourier_mean,
    fourier_std,
    fourier_median,
    mean_change,
    median_change,
    mean_abs_change,
    mean_central_diff,
    complexity,
    symmetry,
    area_warp_similarity,
)
from .dtw import dtw, local_dtw, dtw_dist, optimalpath
from .peaks import find_peaks_cwt, number_peaks

__all__ = [
    "geomedian",
    "nangeomedian",
    "nangeomedian_pcm",
    "bad_mask",
    "emad_pcm",
    "smad_pcm",
    "bcmad_pcm",
    "cosdist",
    "eucdist",
    "completion",
    "smooth",
    "discordance",
    "fourier_mean",
    "fourier_std",
    "fourier_median",
    "mean_change",
    "median_change",
    "mean_abs_change",
    "mean_central_diff",
    "complexity",
    "symmetry",
    "area_warp_similarity",
    "dtw",
    "local_dtw",
    "dtw_dist",
    "optimalpath",
    "find_peaks_cwt",
    "number_peaks",
]
