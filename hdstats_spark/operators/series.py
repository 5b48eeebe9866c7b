"""Series-table primitive + batched kernel aggregates.

``series_table`` compacts a tier table to ONE row per conversation — the
stable-ordered channel matrix as arrays — with a single JVM-side shuffle
(groupBy + sort_array(collect_list)).  Every downstream kernel then runs as
``mapInPandas`` over these compact rows, stacking all series of an Arrow
batch into one padded (G, p, n) tensor and reducing them simultaneously
(kernels_np).  Compared to per-group applyInPandas this amortizes both the
Python-dispatch and the Weiszfeld iteration overhead across series
(~50×+ on many-small-series workloads) while keeping results identical.

Skew note: one row per series bounds group size at the hot-conversation
length (10^4 buckets ≈ 320 KB — far under Arrow limits); padded-tensor blowup
from mixing one hot series with many short ones in a batch is bounded by
length-sorted chunking (_chunks_by_cells).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels_np import dtw_dist_batch, mads_batch, nangeomedian_batch
from ..schema import CHANNELS

_CELL_BUDGET = 16_000_000  # f32 cells per padded tensor chunk (~64 MB)


def series_table(
    tier_df: DataFrame,
    channels: Sequence[str] = CHANNELS,
    order_col: str = "bucket",
    key_col: str = "conv_id",
) -> DataFrame:
    """One row per series: (conv_id, n, buckets array, one float array per
    channel), stably ordered by the bucket timestamp."""
    struct = F.struct(
        F.col(order_col).alias("_o"), *[F.col(c).cast("float").alias(c) for c in channels]
    )
    agg = tier_df.groupBy(key_col).agg(F.sort_array(F.collect_list(struct)).alias("_s"))
    return agg.select(
        key_col,
        F.size("_s").alias("n"),
        F.col("_s._o").alias("buckets"),
        *[F.col(f"_s.{c}").alias(c) for c in channels],
    )


def _chunks_by_cells(lens: np.ndarray, p: int, budget: int = _CELL_BUDGET):
    """Yield index arrays sorted by series length such that each chunk's
    padded tensor stays under the cell budget."""
    order = np.argsort(lens, kind="mergesort")
    start = 0
    while start < len(order):
        end = start + 1
        nmax = lens[order[start]]
        while end < len(order):
            cand = max(nmax, lens[order[end]])
            if (end - start + 1) * p * cand > budget:
                break
            nmax = cand
            end += 1
        yield order[start:end]
        start = end


def _stack_chunk(pdf: pd.DataFrame, idx: np.ndarray, channels) -> tuple[np.ndarray, np.ndarray]:
    lens = pdf["n"].to_numpy()[idx]
    nmax = int(lens.max())
    X = np.full((len(idx), len(channels), nmax), np.nan, dtype=np.float32)
    cols = [pdf[c].to_numpy() for c in channels]
    for gi, row in enumerate(idx):
        ln = lens[gi]
        for j, col in enumerate(cols):
            X[gi, j, :ln] = col[row][:ln]
    return X, lens


def geomedian_mads_batched(
    series_df: DataFrame,
    channels: Sequence[str] = CHANNELS,
    eps: float = 1e-7,
    maxiters: int = 1000,
    with_mads: bool = True,
    key_col: str = "conv_id",
) -> DataFrame:
    """Geometric-median composite (+ optional MAD trio) for every series in
    one mapInPandas pass — the engine's flagship continuous aggregate
    (nangeomedian_pcm + emad/smad/bcmad fused: SURVEY.md §3.1-3.2)."""
    chans = list(channels)
    fields = [f"{key_col} string", "n int"] + [f"gm_{c} float" for c in chans]
    if with_mads:
        fields += ["emad float", "smad float", "bcmad float"]
    schema = ", ".join(fields)

    # CPU-heavy Python stage: AQE's size-based coalescing fuses the
    # small-byte series rows into one task, and a hash repartition on the
    # series key is elided as redundant (the upstream agg already hashes it).
    # Round-robin repartition survives optimization and balances series count
    # per task regardless of key skew.
    sc = series_df.sparkSession.sparkContext
    series_df = series_df.repartition(sc.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            all_lens = pdf["n"].to_numpy()
            for idx in _chunks_by_cells(all_lens, len(chans)):
                X, lens = _stack_chunk(pdf, idx, chans)
                gm = nangeomedian_batch(X, eps, maxiters, lengths=lens)
                out = {key_col: pdf[key_col].to_numpy()[idx], "n": lens.astype("int32")}
                for j, c in enumerate(chans):
                    out[f"gm_{c}"] = gm[:, j]
                if with_mads:
                    out.update(mads_batch(X, gm))
                yield pd.DataFrame(out)

    return series_df.mapInPandas(gen, schema)


def number_peaks_agg(
    series_df: DataFrame,
    value_col: str,
    n: int = 10,
    key_col: str = "conv_id",
) -> DataFrame:
    """CWT ridge-line peak count per series (ts.pyx:222-228); the ridge
    linkage is inherently sequential per series, so this is a per-series
    NumPy call inside mapInPandas spread round-robin across cores."""
    sc = series_df.sparkSession.sparkContext
    series_df = series_df.repartition(sc.defaultParallelism)

    def gen(batches):
        from hdstats_oracle.peaks import find_peaks_cwt

        widths = np.arange(1, n + 1)
        for pdf in batches:
            counts = [
                len(find_peaks_cwt(np.asarray(v[: int(ln)], dtype=np.float64), widths))
                for v, ln in zip(pdf[value_col], pdf["n"])
            ]
            yield pd.DataFrame(
                {key_col: pdf[key_col], "n_peaks": np.asarray(counts, dtype=np.int32)}
            )

    return series_df.mapInPandas(gen, f"{key_col} string, n_peaks int")


def dtw_area_batched(
    series_df: DataFrame,
    value_col: str,
    ref: np.ndarray,
    window: int | None = None,
    key_col: str = "conv_id",
    l1_mode: bool = False,
    cell_budget_bytes: int = 64_000_000,
) -> DataFrame:
    """DTW distance of every series to a broadcast reference curve, batched
    by exact series length so the wavefront kernel runs padding-free.

    ``l1_mode=True`` reproduces the reference's area_warp_similarity
    literally — each series enters DTW as ONE n-dimensional point, collapsing
    to L1/2 (ts.pyx:254); False runs the real (optionally Sakoe-Chiba banded)
    DTW, the engine's extension."""
    refd = np.asarray(ref, dtype=np.float64)
    sc = series_df.sparkSession.sparkContext
    bref = sc.broadcast(refd)
    series_df = series_df.repartition(sc.defaultParallelism)

    def gen(batches):
        rv = bref.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf[value_col].to_numpy()
            lens = pdf["n"].to_numpy()
            ids = pdf[key_col].to_numpy()
            out_ids, out_d = [], []
            for L in np.unique(lens):
                idx = np.nonzero(lens == L)[0]
                X = np.stack([np.asarray(vals[i][: int(L)], dtype=np.float64) for i in idx])
                if l1_mode:
                    d = (np.abs(rv[: int(L)][None, :] - X).sum(axis=1) / 2.0).astype(np.float32)
                else:
                    step = max(1, cell_budget_bytes // (4 * (int(L) + 1) ** 2))
                    parts = [
                        dtw_dist_batch(X[s : s + step], rv[: int(L)], window)
                        for s in range(0, len(idx), step)
                    ]
                    d = np.concatenate(parts)
                out_ids.append(ids[idx])
                out_d.append(d)
            yield pd.DataFrame(
                {key_col: np.concatenate(out_ids), "dtw_dist": np.concatenate(out_d)}
            )

    return series_df.mapInPandas(gen, f"{key_col} string, dtw_dist float")
