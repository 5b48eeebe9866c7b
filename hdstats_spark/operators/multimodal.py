"""Multimodal asset plumbing: image/audio/video as opaque binary columns.

The container ships no image/audio codecs, so the *decode* step is stubbed
behind ``FakeDecoder`` (deterministic bytes→array expansion) or raises
NotImplementedError when a real decode is requested — but everything Spark
cares about is real and tested: the asset schema, binary-column handling
through Arrow, batch shapes, partitioning, and the mapInPandas feature
extractors.  Swapping FakeDecoder for Pillow/torchaudio is a one-function
change on the workers.

Operators:
  * asset_table schema (asset_id, kind, payload binary, meta map)
  * extract_features — mapInPandas: payload → fixed-dim float vector
  * sample_frames    — video stub: byte-range "frames" with typed metadata
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


class FakeDecoder:
    """Deterministic stand-in for a media codec: expands bytes into a fake
    'pixel' array whose values are a pure function of the payload.  Real
    deployments replace decode() with Pillow / soundfile / pyav."""

    @staticmethod
    def decode(payload: bytes, kind: str) -> np.ndarray:
        if payload is None:
            return np.zeros(0, dtype=np.float32)
        raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        if kind == "image":
            side = max(int(np.sqrt(raw.size)), 1)
            return np.resize(raw, (side, side)) / 255.0
        if kind == "audio":
            return (raw - 128.0) / 128.0
        if kind == "video":
            n_frames = max(raw.size // 64, 1)
            return np.resize(raw, (n_frames, 64)) / 255.0
        raise NotImplementedError(f"no decoder for kind={kind!r}")


def gen_assets(spark, n: int = 100, seed: int = 3) -> DataFrame:
    """Deterministic synthetic asset table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = [
        (
            i,
            kinds[i % 3],
            rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8).tobytes(),
            {"src": f"synthetic/{i}", "bytes": "varies"},
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def extract_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """payload → fixed-dim feature vector (histogram of decoded values) via
    mapInPandas.  The Arrow plumbing (binary in, array<float> out) is the
    real contract; only the decode is fake."""

    def gen(batches):
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                arr = FakeDecoder.decode(payload, kind).ravel()
                if arr.size == 0:
                    feats.append(np.zeros(dim, dtype=np.float32))
                    continue
                hist, _ = np.histogram(arr, bins=dim, range=(-1.0, 1.0))
                feats.append((hist / max(arr.size, 1)).astype(np.float32))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "kind": pdf["kind"], "features": feats}
            )

    return assets.mapInPandas(gen, "asset_id long, kind string, features array<float>")


def sample_frames(assets: DataFrame, every: int = 4) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame with frame
    index + a 64-float frame vector (the decode is FakeDecoder; the exploded
    row shape and partitioning are production-true)."""
    videos = assets.filter(F.col("kind") == "video")

    def gen(batches):
        for pdf in batches:
            ids, fidx, frames = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                arr = FakeDecoder.decode(payload, "video")
                for j in range(0, arr.shape[0], every):
                    ids.append(aid)
                    fidx.append(j)
                    frames.append(arr[j].astype(np.float32))
            yield pd.DataFrame({"asset_id": ids, "frame_idx": fidx, "frame": frames})

    return videos.mapInPandas(gen, "asset_id long, frame_idx int, frame array<float>")
