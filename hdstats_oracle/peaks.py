"""number_peaks — CWT ridge-line peak counting (reference ts.pyx:222-228).

The reference delegates to scipy.signal.find_peaks_cwt (ricker wavelet,
widths 1..n); SciPy is absent in this sandbox, so the ridge-line algorithm
(Du, Kibbe & Lin 2006, as implemented in scipy.signal._peak_finding) is
re-derived here in NumPy: CWT rows per width → relative maxima per row →
greedy ridge-line linkage (closest previous column within width/4, gap
tolerance ceil(widths[0])) → filter by ridge length ≥ ceil(n_widths/4) and
SNR ≥ 1 against a windowed 10th-percentile noise floor of the smallest
scale.

NB the reference's own number_peaks test is disabled
(/root/reference/tests/test_ts.py:60-63), so the contract here is
behavioral (sane counts on planted peaks) rather than golden-value parity.
"""

from __future__ import annotations

import numpy as np


def ricker(points: int, a: float) -> np.ndarray:
    """Ricker (mexican-hat) wavelet, scipy.signal.ricker semantics."""
    A = 2 / (np.sqrt(3 * a) * np.pi**0.25)
    wsq = a**2
    vec = np.arange(0, points) - (points - 1.0) / 2
    xsq = vec**2
    return A * (1 - xsq / wsq) * np.exp(-xsq / (2 * wsq))


def cwt(data: np.ndarray, widths) -> np.ndarray:
    """Continuous wavelet transform rows per width (ricker)."""
    out = np.empty((len(widths), len(data)))
    for i, w in enumerate(widths):
        n = int(min(10 * w, len(data)))
        out[i] = np.convolve(data, ricker(n, w), mode="same")
    return out


def _rel_maxima(matr: np.ndarray, order: int = 1) -> np.ndarray:
    """Boolean mask of strict relative maxima along axis 1 (clip mode)."""
    n = matr.shape[1]
    locs = np.arange(n)
    res = np.ones(matr.shape, dtype=bool)
    for shift in range(1, order + 1):
        plus = matr[:, np.clip(locs + shift, 0, n - 1)]
        minus = matr[:, np.clip(locs - shift, 0, n - 1)]
        res &= matr > plus
        res &= matr > minus
        if not res.any():
            return res
    return res


def _ridge_lines(matr: np.ndarray, max_distances: np.ndarray, gap_thresh: float):
    """Greedy ridge-line linkage from the largest scale downward."""
    maxima = _rel_maxima(matr)
    rows_with = np.nonzero(maxima.any(axis=1))[0]
    if len(rows_with) == 0:
        return []
    start = rows_with[-1]
    active = [[[start], [c], 0] for c in np.nonzero(maxima[start])[0]]
    finished = []
    for row in range(start - 1, -1, -1):
        for line in active:
            line[2] += 1
        cols_here = np.nonzero(maxima[row])[0]
        prev_cols = np.array([line[1][-1] for line in active])
        for col in cols_here:
            attach = None
            if len(prev_cols) > 0:
                diffs = np.abs(prev_cols - col)
                best = int(np.argmin(diffs))
                if diffs[best] <= max_distances[row]:
                    attach = active[best]
            if attach is not None:
                attach[0].append(row)
                attach[1].append(col)
                attach[2] = 0
            else:
                active.append([[row], [col], 0])
                prev_cols = np.append(prev_cols, col)
        still = []
        for line in active:
            if line[2] > gap_thresh:
                finished.append(line)
            else:
                still.append(line)
        active = still
    out = []
    for rows_, cols_, _ in finished + active:
        order = np.argsort(rows_)
        out.append((np.asarray(rows_)[order], np.asarray(cols_)[order]))
    return out


def find_peaks_cwt(
    vector: np.ndarray,
    widths,
    min_snr: float = 1.0,
    noise_perc: float = 10.0,
    min_length: int | None = None,
    gap_thresh: float | None = None,
) -> np.ndarray:
    widths = np.asarray(widths, dtype=float)
    if gap_thresh is None:
        gap_thresh = np.ceil(widths[0])
    max_distances = widths / 4.0
    mat = cwt(np.asarray(vector, dtype=float), widths)
    lines = _ridge_lines(mat, max_distances, gap_thresh)
    num_points = mat.shape[1]
    if min_length is None:
        min_length = int(np.ceil(mat.shape[0] / 4))
    window = max(int(np.ceil(num_points / 20)), 1)
    half, odd = divmod(window, 2)
    row0 = mat[0]
    # noise floor: windowed percentile of the smallest scale.  The interior
    # positions all see a full `window`-wide slice — one vectorized
    # percentile over a sliding-window view (this loop was ~90% of
    # find_peaks_cwt's runtime when done per-position); only the ≤window
    # clipped edge positions keep the per-slice calls.  Values are identical
    # to the per-position formulation (same slice → same percentile).
    noise = np.empty(num_points)
    lo = half  # first i with i - half >= 0
    hi = num_points - half - odd  # last i with i + half + odd <= num_points
    if hi >= lo and num_points >= window:
        sw = np.lib.stride_tricks.sliding_window_view(row0, window)
        noise[lo : hi + 1] = np.percentile(sw[: hi - lo + 1], noise_perc, axis=1)
    else:
        lo, hi = num_points, num_points - 1  # degenerate: loop everything
    for i in range(min(lo, num_points)):
        noise[i] = np.percentile(row0[max(i - half, 0) : min(i + half + odd, num_points)], noise_perc)
    for i in range(hi + 1, num_points):
        noise[i] = np.percentile(row0[max(i - half, 0) : min(i + half + odd, num_points)], noise_perc)
    peaks = []
    for rows_, cols_ in lines:
        if len(rows_) < min_length:
            continue
        with np.errstate(all="ignore"):
            snr = abs(mat[rows_[0], cols_[0]] / noise[cols_[0]])
        if not snr >= min_snr:  # NaN (0/0) fails, like scipy
            continue
        peaks.append(int(cols_[0]))
    return np.asarray(sorted(peaks))


def number_peaks(x: np.ndarray, n: int = 10) -> np.ndarray:
    """Per-pixel CWT peak count → int8 (ts.pyx:222-228)."""
    x = np.asarray(x)
    out = np.empty(x.shape[:2], dtype=np.int8)
    widths = np.arange(1, n + 1)
    for i in range(x.shape[0]):
        for j in range(x.shape[1]):
            out[i, j] = len(find_peaks_cwt(x[i, j, :], widths))
    return out
