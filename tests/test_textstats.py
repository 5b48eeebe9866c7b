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


# ------------------------------------------------------- repetition filters


def test_repetition_stats_planted(spark):
    """Gopher-style metrics on hand-computable documents."""
    from collections import Counter

    from hdstats_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b c"),  # 2-grams: ab,ba,ab,ba,ab,bc
            (2, "x y z w"),        # all n-grams distinct
            (3, "q"),              # shorter than every n
            (4, "m m m m m"),      # maximally repetitive
        ],
        "doc_id int, text string",
    )
    d = {r.doc_id: r for r in repetition_stats(docs).collect()}

    def brute(words, n):
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        if not grams:
            return None, None
        c = Counter(grams)
        total = len(grams)
        return max(c.values()) / total, sum(v for v in c.values() if v > 1) / total

    for doc_id, text in [(1, "a b a b a b c"), (2, "x y z w"), (4, "m m m m m")]:
        for n in (2, 3, 4):
            top, dup = brute(text.split(), n)
            assert d[doc_id][f"top{n}_frac"] == top, (doc_id, n)
            assert d[doc_id][f"dup{n}_frac"] == dup, (doc_id, n)
    # doc 1: top2 = 3/6 over Gopher's 0.20 ceiling -> dropped
    assert d[1].keep == 0 and d[4].keep == 0
    # short doc restored by the left join, metrics NULL, trivially kept
    assert d[3].top2_frac is None and d[3].n_words == 1 and d[3].keep == 1
    # doc 2 has no repetition but tiny-doc top fractions (1/3) still exceed
    # the ceilings -- the documented Gopher behavior (it targets long docs)
    assert d[2].keep == 0


def test_repetition_stats_custom_thresholds(spark):
    from hdstats_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame([(1, "x y z w v u t s")], "doc_id int, text string")
    keep_all = repetition_stats(docs, thresholds={2: 1.0, 3: 1.0, 4: 1.0})
    drop_all = repetition_stats(docs, thresholds={2: 0.0})
    assert keep_all.first().keep == 1
    assert drop_all.first().keep == 0


def test_repetition_maponly_equals_shuffle(spark):
    """The zero-shuffle mapInPandas plan must be bit-identical to the
    relational plan — same IEEE divisions of the same exact integers."""
    from hdstats_spark.operators.textstats import repetition_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [
            (9001, ""),
            (9002, "solo"),
            (9003, "a a a"),
            (9004, "  padded   text  "),
            # non-space whitespace: Spark trim strips only U+0020 and Java
            # \s is ASCII-only, so the Python side must use strip(' ') +
            # re.ASCII to agree (the r6 ADVICE divergence)
            (9005, "\ta b\t"),
            (9006, "x y x y x y"),
            (9007, "a\tb a\tb \n c c"),
            (9008, " \t mixed ws mixed ws \t "),
            (9010, "nb\u00a0sp nb\u00a0sp nb\u00a0sp\u00a0"),
        ],
        "doc_id long, text string",
    )
    docs = docs.unionByName(edge)
    a = repetition_stats(docs, method="shuffle")
    b = repetition_stats(docs, method="maponly")
    assert a.columns == b.columns
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb  # exact, including the raw double fractions
