"""Winnowing fingerprint properties (Schleimer et al. 2003)."""

import numpy as np
import numpy.testing as npt

from hdstats_spark.operators.textstats import _kgram_hashes, winnow


def test_kgram_hash_matches_direct():
    text = "hello winnowing world"
    k = 5
    h = _kgram_hashes(text, k)
    raw = text.encode()
    M, B = (1 << 31) - 1, 257
    for i in range(len(raw) - k + 1):
        direct = 0
        for ch in raw[i : i + k]:
            direct = (direct * B + ch) % M
        assert h[i] == direct


def test_winnow_properties():
    a = "the quick brown fox jumps over the lazy dog" * 3
    fa = winnow(a)
    # deterministic + distinct
    npt.assert_array_equal(fa, winnow(a))
    assert len(np.unique(fa)) == len(fa)
    # guarantee: every window of w consecutive k-grams contributes ≥1 pick,
    # so a long text yields many fingerprints but fewer than all k-grams
    n_grams = len(_kgram_hashes(a, 8))
    assert 0 < len(fa) < n_grams
    # local change only perturbs nearby fingerprints: large overlap remains
    b = a.replace("lazy", "hazy")
    fb = winnow(b)
    inter = len(np.intersect1d(fa, fb))
    assert inter / min(len(fa), len(fb)) > 0.6


def test_winnow_short_inputs():
    assert winnow("").size == 0
    assert winnow("abc", k=8).size == 0  # shorter than one k-gram
    one = winnow("abcdefgh", k=8)  # exactly one k-gram
    assert one.size == 1
