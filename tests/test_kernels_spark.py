"""Spark kernels vs the NumPy oracle at the reference's own tolerances
(rtol=1e-4, atol=1e-4 — /root/reference/tests/test_pcm.py:22)."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

import hdstats_oracle as hdo
from hdstats_spark.operators.channels import channelize
from hdstats_spark.operators.features import change_features, complexity
from hdstats_spark.operators.gapfill import completion, densify
from hdstats_spark.operators.kernels import (
    discordance_agg,
    dtw_to_area_median,
    fourier_features,
    geomedian_agg,
    mad_agg,
    symmetry_agg,
)
from hdstats_spark.operators.rollup import rollup_raw
from hdstats_spark.schema import CHANNELS


@pytest.fixture(scope="module")
def dense(spark, transcripts):
    tier = rollup_raw(channelize(transcripts), "1m")
    d = completion(densify(tier, "1m")).cache()
    d.count()
    return d


def _series_matrices(dense_pdf, channels=CHANNELS):
    """conv_id → (p, n) float32 matrix, ordered by bucket."""
    out = {}
    for cid, g in dense_pdf.groupby("conv_id"):
        g = g.sort_values("bucket")
        out[cid] = g[list(channels)].to_numpy(dtype=np.float32, na_value=np.nan).T
    return out


def test_completion_leaves_no_nulls(dense):
    for c in CHANNELS:
        assert dense.filter(f"{c} IS NULL").count() == 0


def test_completion_matches_oracle(spark, transcripts, dense):
    """Spark window-function gap-fill ≡ reference completion on every series."""
    sparse = densify(rollup_raw(channelize(transcripts), "1m"), "1m").toPandas()
    filled = dense.toPandas()
    for cid, g in list(sparse.groupby("conv_id"))[:30]:
        g = g.sort_values("bucket")
        raw = g[["turn_rate"]].to_numpy(dtype=np.float32, na_value=np.nan).T
        expect = hdo.completion(raw[None, :, :])[0, 0]  # (1,1,n) per reference
        got = (
            filled[filled.conv_id == cid]
            .sort_values("bucket")["turn_rate"]
            .to_numpy(dtype=np.float32)
        )
        npt.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_geomedian_matches_oracle(dense):
    gm = geomedian_agg(dense, CHANNELS).toPandas().set_index("conv_id")
    mats = _series_matrices(dense.toPandas())
    for cid, X in list(mats.items())[:25]:
        expect = hdo.nangeomedian(X) if X.shape[1] >= 3 else None
        if expect is None:
            continue
        got = gm.loc[cid, [f"gm_{c}" for c in CHANNELS]].to_numpy(dtype=np.float32)
        npt.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_mads_match_oracle(dense):
    gm_df = geomedian_agg(dense, CHANNELS)
    mads = mad_agg(dense, gm_df, CHANNELS).toPandas().set_index("conv_id")
    gm = gm_df.toPandas().set_index("conv_id")
    mats = _series_matrices(dense.toPandas())
    for cid, X in list(mats.items())[:15]:
        g = gm.loc[cid].to_numpy(dtype=np.float32)
        X4 = X[None, None, :, :]
        g3 = g[None, None, :]
        npt.assert_allclose(
            mads.loc[cid, "emad"], hdo.emad_pcm(X4, g3)[0, 0], rtol=1e-4, atol=1e-4
        )
        npt.assert_allclose(
            mads.loc[cid, "smad"], hdo.smad_pcm(X4, g3)[0, 0], rtol=1e-4, atol=1e-4
        )
        npt.assert_allclose(
            mads.loc[cid, "bcmad"], hdo.bcmad_pcm(X4, g3)[0, 0], rtol=1e-4, atol=1e-4
        )


def test_change_features_match_oracle(dense):
    feats = (
        change_features(dense, "turn_rate").toPandas().set_index("conv_id")
    )
    comp = complexity(dense, "turn_rate").toPandas().set_index("conv_id")
    mats = _series_matrices(dense.toPandas(), ["turn_rate"])
    for cid, X in list(mats.items())[:20]:
        x = X[0][None, None, :].astype(np.float32)  # (1,1,n)
        if x.shape[-1] < 3:
            continue
        npt.assert_allclose(
            feats.loc[cid, "mean_change"], hdo.mean_change(x)[0, 0], rtol=1e-4, atol=1e-4
        )
        npt.assert_allclose(
            feats.loc[cid, "median_change"], hdo.median_change(x)[0, 0], rtol=1e-4, atol=1e-4
        )
        npt.assert_allclose(
            feats.loc[cid, "mean_abs_change"], hdo.mean_abs_change(x)[0, 0], rtol=1e-4, atol=1e-4
        )
        npt.assert_allclose(
            feats.loc[cid, "mean_central_diff"],
            hdo.mean_central_diff(x)[0, 0],
            rtol=1e-4,
            atol=1e-4,
        )
        with np.errstate(all="ignore"):
            expect_c = hdo.complexity(x.astype(np.float64))[0, 0]
        got_c = comp.loc[cid, "complexity"]
        if np.isnan(expect_c):
            assert got_c is None or np.isnan(got_c)
        else:
            npt.assert_allclose(got_c, expect_c, rtol=1e-3, atol=1e-4)


def test_fourier_matches_oracle(dense):
    ff = fourier_features(dense, "turn_rate", n=2, step=3).toPandas().set_index("conv_id")
    mats = _series_matrices(dense.toPandas(), ["turn_rate"])
    for cid, X in list(mats.items())[:15]:
        x = X[0][None, None, :]
        if x.shape[-1] < 8:
            continue
        npt.assert_allclose(
            ff.loc[cid, ["fmean_0", "fmean_1"]].to_numpy(np.float32),
            hdo.fourier_mean(x, n=2, step=3)[0, 0],
            rtol=1e-4,
            atol=1e-3,
        )
        npt.assert_allclose(
            ff.loc[cid, ["fstd_0", "fstd_1"]].to_numpy(np.float32),
            hdo.fourier_std(x, n=2, step=3)[0, 0],
            rtol=1e-4,
            atol=1e-3,
        )


def test_wiener_smooth_matches_oracle(spark, dense):
    """Spark window-function Wiener ≡ reference smooth per series.
    The reference pools noise over the whole stacked array; restrict to
    equal-length series so the oracle can stack them identically."""
    from hdstats_spark.operators.smooth import wiener_smooth

    pdf = dense.toPandas()
    lens = pdf.groupby("conv_id").size()
    keep = lens[lens == lens.mode()[0]].index
    sub = dense.filter(dense.conv_id.isin(list(keep)))
    got = (
        wiener_smooth(sub, "turn_rate", k=3)
        .orderBy("conv_id", "bucket")
        .toPandas()
    )
    sp = pdf[pdf.conv_id.isin(keep)]
    mats = _series_matrices(sp, ["turn_rate"])
    cids = sorted(mats)
    stack = np.stack([mats[c][0] for c in cids])[:, None, :].astype(np.float64)
    expect = hdo.smooth(stack, 3)[:, 0, :]
    got_m = got.pivot(index="conv_id", columns="bucket", values="turn_rate_smooth")
    for i, cid in enumerate(cids):
        g = got_m.loc[cid].dropna().to_numpy()
        npt.assert_allclose(g, expect[i], rtol=1e-4, atol=1e-4)


def test_symmetry_zero_for_constant(spark):
    rows = [
        ("a", i, 2.0, 4.0, 6.0, 8.0, 1.0, 1.0, 1.0, 1.0) for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["conv_id", "bucket", *CHANNELS])
    gm = geomedian_agg(df, CHANNELS, order_col="bucket")
    s = symmetry_agg(df, gm, CHANNELS).collect()[0]["symmetry"]
    assert abs(s) < 1e-5


def test_mads_cogrouped_equals_broadcast(dense):
    """cogroup() stack × gm alignment ≡ the broadcast-join mad_agg (the
    big-composite variant for 10^9-conversation tables), bit-for-bit; the
    unhinted-join variant too."""
    from hdstats_spark.operators.kernels import mads_cogrouped

    gm = geomedian_agg(dense, CHANNELS, order_col="bucket")
    a = mad_agg(dense, gm, CHANNELS).toPandas().set_index("conv_id").sort_index()
    b = (
        mads_cogrouped(dense, gm, CHANNELS)
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    c = (
        mad_agg(dense, gm, CHANNELS, broadcast_gm=False)
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    cols = ["emad", "smad", "bcmad"]
    npt.assert_array_equal(a[cols].to_numpy(np.float32), b[cols].to_numpy(np.float32))
    npt.assert_array_equal(a[cols].to_numpy(np.float32), c[cols].to_numpy(np.float32))


def test_symmetry_matches_oracle(dense):
    """Full engine≡oracle parity for symmetry (ts.pyx:231-243): Spark's
    avg+gm-join expression vs hdstats_oracle.ts.symmetry per series, at the
    reference tolerances."""
    gm = geomedian_agg(dense, CHANNELS, order_col="bucket")
    got = (
        symmetry_agg(dense, gm, CHANNELS)
        .toPandas()
        .set_index("conv_id")["symmetry"]
    )
    mats = _series_matrices(dense.toPandas())
    for cid, M in mats.items():
        expect = hdo.symmetry(M[None, None, :, :])[0, 0]
        npt.assert_allclose(got[cid], expect, rtol=1e-4, atol=1e-4)


def test_number_peaks_spark_matches_oracle(dense):
    """Spark wrapper (number_peaks_agg over series_table) ≡ the oracle CWT
    ridge-line count per series — exact integer equality."""
    from hdstats_spark.operators.series import number_peaks_agg, series_table

    st = series_table(dense, ["turn_rate"])
    got = (
        number_peaks_agg(st, "turn_rate", n=10)
        .toPandas()
        .set_index("conv_id")["n_peaks"]
    )
    mats = _series_matrices(dense.toPandas(), ["turn_rate"])
    assert len(got) == len(mats)
    for cid, M in mats.items():
        expect = hdo.number_peaks(M[None, :, :], n=10)[0, 0]
        assert got[cid] == expect, cid


def test_geomedian_flat_equals_series_table(dense):
    """Flat mapInArrow path (sort-within-partitions + cross-batch group
    stitching) ≡ the series_table path for the full gm+MAD output."""
    from hdstats_spark.operators.series import (
        geomedian_mads_batched,
        geomedian_mads_flat,
        series_table,
    )

    a = (
        geomedian_mads_batched(series_table(dense, CHANNELS), CHANNELS)
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    b = geomedian_mads_flat(dense, CHANNELS).toPandas().set_index("conv_id").sort_index()
    cols = ["n"] + [f"gm_{c}" for c in CHANNELS] + ["emad", "smad", "bcmad"]
    npt.assert_array_equal(
        a[cols].to_numpy(np.float64), b[cols].to_numpy(np.float64)
    )


def test_geomedian_axis0_matches_oracle(dense):
    """Engine axis-0 surface (geomedian.pyx:379-395): per-series length-n gm
    vector ≡ oracle nangeomedian(M, axis=0) — the axis0 ≡ axis1-of-transpose
    identity at the Spark level."""
    from hdstats_spark.operators.series import geomedian_mads_batched, series_table

    st = series_table(dense, CHANNELS)
    out = (
        geomedian_mads_batched(st, CHANNELS, with_mads=False, axis=0)
        .toPandas()
        .set_index("conv_id")
    )
    mats = _series_matrices(dense.toPandas())
    assert len(out) == len(mats)
    for cid, M in list(mats.items())[:40]:
        expect = hdo.nangeomedian(M, axis=0)
        got = np.asarray(out.loc[cid, "gm"], dtype=np.float32)
        assert out.loc[cid, "n"] == M.shape[1]
        npt.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)
        # the identity itself: axis0(M) == axis1(Mᵀ)
        npt.assert_allclose(
            got, hdo.nangeomedian(M.T, axis=1), rtol=1e-4, atol=1e-4
        )


def test_fourier_batched_equals_per_group(dense):
    """Series-table batched FFT path ≡ the per-group applyInPandas path
    (which test_fourier_matches_oracle pins to the oracle)."""
    from hdstats_spark.operators.series import fourier_features_batched, series_table

    per_group = (
        fourier_features(dense, "turn_rate", n=2, step=3).toPandas().set_index("conv_id")
    )
    st = series_table(dense, ["turn_rate"])
    batched = (
        fourier_features_batched(st, "turn_rate", n=2, step=3)
        .toPandas()
        .set_index("conv_id")
    )
    cids = sorted(per_group.index)
    cols = [f"{s}_{k}" for s in ("fmean", "fstd", "fmedian") for k in range(2)]
    a = per_group.loc[cids, cols].to_numpy(np.float32)
    b = batched.loc[cids, cols].to_numpy(np.float32)
    npt.assert_allclose(b, a, rtol=1e-5, atol=1e-5, equal_nan=True)


def test_discordance_batched_equals_per_group(dense):
    import pandas as _pd

    from hdstats_spark.operators.series import discordance_batched, series_table

    area = (
        dense.groupby("t")
        .agg({"turn_rate": "avg"})
        .withColumnRenamed("avg(turn_rate)", "mv")
        .orderBy("t")
        .toPandas()
    )
    curve = area["mv"].to_numpy(dtype=np.float32)
    Y = np.fft.fft(curve)
    Y[3:] = 0.0
    area_lp = np.abs(np.fft.ifft(Y)).astype(np.float32)
    per_group = discordance_agg(dense, "turn_rate", n=3).toPandas().set_index("conv_id")
    st = series_table(dense, ["turn_rate"])
    batched = (
        discordance_batched(st, "turn_rate", area_lp, n=3).toPandas().set_index("conv_id")
    )
    cids = sorted(per_group.index)
    npt.assert_allclose(
        batched.loc[cids, "discordance"].to_numpy(np.float32),
        per_group.loc[cids, "discordance"].to_numpy(np.float32),
        rtol=1e-4,
        atol=1e-5,
    )


def test_discordance_and_dtw(dense):
    # align on the bucket index; restrict to equal-length series for an exact
    # oracle comparison (the reference's stacks share one time axis)
    pdf = dense.toPandas()
    lens = pdf.groupby("conv_id").size()
    nmode = lens.mode()[0]
    keep = lens[lens == nmode].index
    sub = dense.filter(dense.conv_id.isin([str(k) for k in keep]))
    disc = discordance_agg(sub, "turn_rate", n=3).toPandas().set_index("conv_id")
    dtwd = dtw_to_area_median(sub, "turn_rate", true_dtw=False).toPandas().set_index("conv_id")

    sp = pdf[pdf.conv_id.isin(keep)]
    mats = _series_matrices(sp, ["turn_rate"])
    cids = sorted(mats)
    stack = np.stack([mats[c][0] for c in cids])[:, None, :]  # (Y,1,n)
    o_disc = hdo.discordance(stack.astype(np.float32), n=3)[:, 0]
    o_warp = hdo.area_warp_similarity(stack.astype(np.float32))[:, 0]
    got_disc = disc.loc[cids, "discordance"].to_numpy(np.float32)
    got_warp = dtwd.loc[cids, "dtw_dist"].to_numpy(np.float32)
    npt.assert_allclose(got_disc, o_disc, rtol=1e-3, atol=1e-3)
    npt.assert_allclose(got_warp, o_warp, rtol=1e-3, atol=1e-3)
