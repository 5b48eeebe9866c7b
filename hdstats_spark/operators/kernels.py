"""hdstats reduction kernels as grouped Arrow UDF continuous aggregates.

Each reference kernel reduces a dense per-pixel (p,n) matrix along time
(SURVEY.md §2.1).  Here a "pixel" is a conversation: rows (conv_id, t,
channel columns) are shuffled once on ``conv_id``, pivoted to the (p,n)
float32 matrix inside a grouped-map pandas UDF, and reduced with the exact
NumPy kernels from ``hdstats_oracle`` (float32 storage / float64 accumulate
discipline preserved).  Catalyst prunes columns through the
FlatMapGroupsInPandas node, so only the channel columns reach Python.

Scale notes:
  * one group = one conversation — a hot 10^4-turn conversation is a ~10^4×8
    float32 matrix (~320 KB), far below Arrow batch limits, so per-series
    skew cannot OOM an executor;
  * every kernel shares the same ``groupBy(conv_id)`` partitioning, so a
    feature pipeline over N kernels still shuffles once (SURVEY.md §3.3);
  * reductions that SQL can express (changes, complexity, MAD-vs-composite)
    also exist as pure column-expression variants in features.py / mad.py —
    the UDF forms exist for exact reference parity.

Reference citations: geomedian.pyx:300-376 (Weiszfeld), ts.pyx:140-156
(discordance), ts.pyx:159-192 (fourier bands), dtw.pyx:69-86.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import CHANNELS

_F32 = np.float32


def _matrix(pdf: pd.DataFrame, channels: Sequence[str], order_col: str) -> np.ndarray:
    """Stable-ordered (p, n) float32 matrix for one conversation; SQL NULL →
    NaN at the Arrow boundary."""
    pdf = pdf.sort_values(order_col, kind="mergesort")
    return pdf[list(channels)].to_numpy(dtype=_F32, na_value=np.nan).T


def _result_schema(channels: Sequence[str], prefix: str) -> T.StructType:
    fields = [T.StructField("conv_id", T.StringType(), False)]
    fields += [T.StructField(f"{prefix}{c}", T.FloatType(), True) for c in channels]
    return T.StructType(fields)


def geomedian_agg(
    tier_df: DataFrame,
    channels: Sequence[str] = CHANNELS,
    eps: float = 1e-7,
    maxiters: int = 1000,
    order_col: str = "bucket",
    nan_aware: bool = True,
) -> DataFrame:
    """Per-conversation geometric median composite → one row per conv_id with
    gm_<channel> float columns (flagship aggregate, geomedian.pyx:472-517)."""
    schema = _result_schema(channels, "gm_")
    chans = list(channels)
    epsf = _F32(eps)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from hdstats_oracle.geomedian import _geomedian_axis_one, _nangeomedian_axis_one

        X = _matrix(pdf, chans, order_col)
        kern = _nangeomedian_axis_one if nan_aware else _geomedian_axis_one
        gm = kern(X, epsf, maxiters)
        row = {"conv_id": pdf["conv_id"].iloc[0]}
        row.update({f"gm_{c}": np.float32(gm[i]) for i, c in enumerate(chans)})
        return pd.DataFrame([row])

    return tier_df.groupBy("conv_id").applyInPandas(fn, schema)


def mad_agg(
    tier_df: DataFrame,
    gm_df: DataFrame,
    channels: Sequence[str] = CHANNELS,
    kinds: Sequence[str] = ("emad", "smad", "bcmad"),
    order_col: str = "bucket",
    broadcast_gm: bool = False,
) -> DataFrame:
    """Per-conversation MAD discordance vs the geomedian composite
    (geomad.pyx:200-350): join the composite table onto the tier rows,
    compute the per-bucket distances vectorized, reduce with nanmedian — all
    inside one grouped pass.

    The gm join is UNHINTED by default (broadcast_gm=False): the composite
    has one row per conversation, so at 10^9 conversations it is itself a
    big table — AQE picks a shuffled join (both sides hash-partition on
    conv_id, so the downstream groupBy reuses that partitioning
    exchange-free) and still broadcasts when genuinely small.
    ``broadcast_gm=True`` forces the hint for composites known to be tiny.
    See also mads_cogrouped for the cogroup formulation of the same
    stack × gm align."""
    gm_cols = [f"gm_{c}" for c in channels]
    joined = tier_df.join(F.broadcast(gm_df) if broadcast_gm else gm_df, "conv_id")
    fields = [T.StructField("conv_id", T.StringType(), False)]
    fields += [T.StructField(k, T.FloatType(), True) for k in kinds]
    schema = T.StructType(fields)
    chans = list(channels)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import warnings

        X = _matrix(pdf, chans, order_col)  # (p, n)
        gm = pdf[gm_cols].iloc[0].to_numpy(dtype=_F32)  # (p,)
        out = {"conv_id": pdf["conv_id"].iloc[0]}
        with np.errstate(all="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            if "emad" in kinds:
                d = (X - gm[:, None]).astype(np.float64)
                out["emad"] = _F32(np.nanmedian(np.sqrt(np.einsum("pn,pn->n", d, d)).astype(_F32)))
            if "smad" in kinds:
                numer = np.einsum("pn->n", (X * gm[:, None]).astype(np.float64))
                norma = np.einsum("pn->n", (X * X).astype(np.float64))
                normb = np.sum((gm * gm).astype(np.float64))
                cd = (1.0 - numer / (np.sqrt(norma) * np.sqrt(normb))).astype(_F32)
                out["smad"] = _F32(np.nanmedian(cd))
            if "bcmad" in kinds:
                numer = np.abs((X - gm[:, None]).astype(np.float64)).sum(axis=0)
                denom = np.abs((X + gm[:, None]).astype(np.float64)).sum(axis=0)
                out["bcmad"] = _F32(np.nanmedian((numer / denom).astype(_F32)))
        return pd.DataFrame([out])

    return joined.groupBy("conv_id").applyInPandas(fn, schema)


def mads_cogrouped(
    tier_df: DataFrame,
    gm_df: DataFrame,
    channels: Sequence[str] = CHANNELS,
    kinds: Sequence[str] = ("emad", "smad", "bcmad"),
    order_col: str = "bucket",
) -> DataFrame:
    """The stack × composite alignment as a COGROUP (SURVEY §2.2 joins:
    ``cogroup(...).applyInPandas`` when both sides are large): tier rows and
    gm rows are co-partitioned on conv_id and each key's two frames meet in
    one Python call — no broadcast, no pre-join materialization of gm columns
    onto every tier row (the widest table in the pipeline stays narrow).

    Semantically identical to mad_agg (pytest-pinned); the right variant when
    the composite has one row per conversation at 10^9 conversations."""
    gm_cols = [f"gm_{c}" for c in channels]
    fields = [T.StructField("conv_id", T.StringType(), False)]
    fields += [T.StructField(k, T.FloatType(), True) for k in kinds]
    schema = T.StructType(fields)
    chans = list(channels)

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import warnings

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({f.name: [] for f in fields})
        X = _matrix(left, chans, order_col)  # (p, n)
        gm = right[gm_cols].iloc[0].to_numpy(dtype=_F32)  # (p,)
        out = {"conv_id": left["conv_id"].iloc[0]}
        with np.errstate(all="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            if "emad" in kinds:
                d = (X - gm[:, None]).astype(np.float64)
                out["emad"] = _F32(np.nanmedian(np.sqrt(np.einsum("pn,pn->n", d, d)).astype(_F32)))
            if "smad" in kinds:
                numer = np.einsum("pn->n", (X * gm[:, None]).astype(np.float64))
                norma = np.einsum("pn->n", (X * X).astype(np.float64))
                normb = np.sum((gm * gm).astype(np.float64))
                cd = (1.0 - numer / (np.sqrt(norma) * np.sqrt(normb))).astype(_F32)
                out["smad"] = _F32(np.nanmedian(cd))
            if "bcmad" in kinds:
                numer = np.abs((X - gm[:, None]).astype(np.float64)).sum(axis=0)
                denom = np.abs((X + gm[:, None]).astype(np.float64)).sum(axis=0)
                out["bcmad"] = _F32(np.nanmedian((numer / denom).astype(_F32)))
        return pd.DataFrame([out])

    return (
        tier_df.groupBy("conv_id")
        .cogroup(gm_df.groupBy("conv_id"))
        .applyInPandas(fn, schema)
    )


def fourier_features(
    dense_df: DataFrame,
    value_col: str,
    n: int = 3,
    step: int = 5,
    order_col: str = "bucket",
) -> DataFrame:
    """fourier_mean/std/median bands of one channel per conversation
    (ts.pyx:159-192)."""
    fields = [T.StructField("conv_id", T.StringType(), False)]
    for stat in ("fmean", "fstd", "fmedian"):
        fields += [T.StructField(f"{stat}_{k}", T.FloatType(), True) for k in range(n)]
    schema = T.StructType(fields)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=_F32, na_value=np.nan)
        mag = np.abs(np.fft.fft(x))
        row = {"conv_id": pdf["conv_id"].iloc[0]}
        for k in range(n):
            sl = mag[1 + k * step : (k + 1) * step + 1]
            row[f"fmean_{k}"] = _F32(np.mean(sl)) if sl.size else None
            row[f"fstd_{k}"] = _F32(np.std(sl)) if sl.size else None
            row[f"fmedian_{k}"] = _F32(np.median(sl)) if sl.size else None
        return pd.DataFrame([row])

    return dense_df.groupBy("conv_id").applyInPandas(fn, schema)


def discordance_agg(
    dense_df: DataFrame,
    value_col: str,
    n: int = 10,
    order_col: str = "t",
) -> DataFrame:
    """Reference ``discordance`` (ts.pyx:140-156) over per-conversation series
    aligned on the bucket index ``t``.

    Two phases, one shuffle: (1) the area-mean curve is a tiny groupBy(t)
    aggregate collected and FFT-low-passed on the driver (|ifft| — the
    reference's asymmetric choice), broadcast back as a literal array;
    (2) each conversation low-passes its own series with Re(ifft) and
    averages the residual vs the area curve."""
    area = (
        dense_df.groupBy(order_col)
        .agg(F.avg(F.col(value_col).cast("float")).alias("mv"))
        .orderBy(order_col)
        .collect()
    )
    curve = np.asarray([r["mv"] for r in area], dtype=_F32)
    Y = np.fft.fft(curve)
    Y[n:] = 0.0
    area_lp = np.abs(np.fft.ifft(Y)).astype(_F32)  # |ifft| (ts.pyx:146)

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("discordance", T.FloatType(), True),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=_F32, na_value=np.nan)
        t_idx = pdf[order_col].to_numpy()
        Yp = np.fft.fft(x)
        Yp[n:] = 0.0
        x_lp = np.real(np.fft.ifft(Yp)).astype(_F32)  # Re (ts.pyx:152)
        resid = x_lp - area_lp[t_idx]
        return pd.DataFrame(
            [{"conv_id": pdf["conv_id"].iloc[0], "discordance": _F32(np.mean(resid))}]
        )

    return dense_df.groupBy("conv_id").applyInPandas(fn, schema)


def dtw_to_area_median(
    dense_df: DataFrame,
    value_col: str,
    order_col: str = "t",
    window: int | None = None,
    true_dtw: bool = True,
) -> DataFrame:
    """DTW distance of each conversation's series to the area-median series.

    ``true_dtw=True`` runs the full O(n²) DP per series (dtw.pyx:69-86);
    False reproduces the reference's ``area_warp_similarity`` literally —
    each series enters as a single n-dim point, collapsing to L1/2
    (ts.pyx:254)."""
    area = (
        dense_df.groupBy(order_col)
        .agg(F.expr(f"percentile(cast({value_col} as double), 0.5)").alias("mv"))
        .orderBy(order_col)
        .collect()
    )
    med_curve = np.asarray([r["mv"] for r in area], dtype=np.float64)

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("dtw_dist", T.FloatType(), True),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from hdstats_oracle.dtw import dtw_dist, local_dtw

        pdf = pdf.sort_values(order_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        a = med_curve[pdf[order_col].to_numpy()]
        if not true_dtw:
            d = dtw_dist(a.reshape(1, -1), x.reshape(1, -1))
        elif window is not None:
            d = local_dtw(a.reshape(-1, 1), x.reshape(-1, 1), window)[0]
        else:
            d = dtw_dist(a.reshape(-1, 1), x.reshape(-1, 1))
        return pd.DataFrame([{"conv_id": pdf["conv_id"].iloc[0], "dtw_dist": _F32(d)}])

    return dense_df.groupBy("conv_id").applyInPandas(fn, schema)


def symmetry_agg(
    tier_df: DataFrame,
    gm_df: DataFrame,
    channels: Sequence[str] = CHANNELS,
) -> DataFrame:
    """Reference ``symmetry`` (ts.pyx:231-243): cosine distance between each
    conversation's time-mean channel vector and its geomedian composite.
    Pure built-in expressions: per-channel avg, equi-join, arithmetic.

    The gm join is UNHINTED: the composite has one row per conversation, so
    a forced broadcast grows linearly with the corpus (the mad_agg
    broadcast_gm=False rationale); both sides are keyed on conv_id, so a
    shuffled join co-partitions, and AQE still broadcasts when small."""
    means = tier_df.groupBy("conv_id").agg(
        *[F.avg(F.col(c).cast("float")).alias(f"mm_{c}") for c in channels]
    )
    j = means.join(gm_df, "conv_id")
    numer = sum((F.col(f"mm_{c}") * F.col(f"gm_{c}") for c in channels[1:]),
                F.col(f"mm_{channels[0]}") * F.col(f"gm_{channels[0]}"))
    norma = sum((F.col(f"mm_{c}") * F.col(f"mm_{c}") for c in channels[1:]),
                F.col(f"mm_{channels[0]}") * F.col(f"mm_{channels[0]}"))
    normb = sum((F.col(f"gm_{c}") * F.col(f"gm_{c}") for c in channels[1:]),
                F.col(f"gm_{channels[0]}") * F.col(f"gm_{channels[0]}"))
    return j.select(
        "conv_id",
        (F.lit(1.0) - F.try_divide(numer, F.sqrt(norma) * F.sqrt(normb)))
        .cast("float")
        .alias("symmetry"),
    )
