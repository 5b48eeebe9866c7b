"""Tier-table block compression: long-format tier rows ⇄ per-series
compressed blocks.

A block row is one conversation's series: delta-of-delta-encoded bucket
timestamps + one Gorilla-XOR-encoded blob per channel.  Encode and decode are
mapInPandas over series rows; inside each call the codec work is vectorized
NumPy per series (gorilla.py) — the only Python loop is over series blocks,
never over data points.

This is the storage format for cold retention tiers: the 1m tier of a
10^12-turn corpus shrinks ~5-30× (timestamps ~30×, smooth channels ~2-10×)
and decompression is a single XOR prefix scan per channel.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..schema import CHANNELS
from .gorilla import (
    decode_dod_timestamps,
    decode_xor_floats,
    encode_dod_timestamps,
    encode_xor_floats,
)


def compress_tier(series_df: DataFrame, channels: Sequence[str] = CHANNELS) -> DataFrame:
    """series_table output → block rows
    (conv_id, n, ts_blob, <channel>_blob …)."""
    chans = list(channels)
    schema = "conv_id string, n int, ts_blob binary, " + ", ".join(
        f"{c}_blob binary" for c in chans
    )

    def gen(batches):
        for pdf in batches:
            out = {
                "conv_id": pdf["conv_id"],
                "n": pdf["n"].astype("int32"),
                "ts_blob": [
                    encode_dod_timestamps(
                        np.asarray(b, dtype="datetime64[us]").astype("int64") // 1_000_000
                    )
                    for b in pdf["buckets"]
                ],
            }
            for c in chans:
                out[f"{c}_blob"] = [
                    encode_xor_floats(np.asarray(v, dtype=np.float64)) for v in pdf[c]
                ]
            yield pd.DataFrame(out)

    return series_df.mapInPandas(gen, schema)


def decompress_tier(blocks_df: DataFrame, channels: Sequence[str] = CHANNELS) -> DataFrame:
    """Block rows → long-format tier rows (conv_id, bucket, channels…),
    rebuilt with vectorized repeat/concat (no per-point Python)."""
    chans = list(channels)
    schema = "conv_id string, bucket timestamp, " + ", ".join(f"{c} double" for c in chans)

    def gen(batches):
        for pdf in batches:
            ids, buckets = [], []
            vals: dict[str, list] = {c: [] for c in chans}
            for i in range(len(pdf)):
                ts = decode_dod_timestamps(pdf["ts_blob"].iloc[i])
                ids.append(np.repeat(pdf["conv_id"].iloc[i], len(ts)))
                buckets.append(ts)
                for c in chans:
                    vals[c].append(decode_xor_floats(pdf[f"{c}_blob"].iloc[i]))
            if not ids:
                continue
            out = {
                "conv_id": np.concatenate(ids),
                "bucket": pd.to_datetime(np.concatenate(buckets), unit="s"),
            }
            for c in chans:
                out[c] = np.concatenate(vals[c])
            yield pd.DataFrame(out)

    return blocks_df.mapInPandas(gen, schema)
