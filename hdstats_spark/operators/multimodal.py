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


def assets_from_docs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic asset table derived from a text corpus: payload = the
    UTF-8 bytes of the document, kind round-robins by id.  Because the
    'media' bytes come from a registered table, the whole decode→histogram
    feature pipeline is DuckDB-expressible and driver-hash-checkable."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col(id_col).cast("long").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(F.lit("src"), F.concat(F.lit("doc/"), F.col(id_col))).alias("meta"),
    )


def extract_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """payload → fixed-dim feature columns (histogram of decoded values) via
    mapInPandas.  The Arrow plumbing (binary in, scalar floats out) is the
    real contract; only the decode is fake.

    Output is one DOUBLE column per histogram bin (f_0..f_{dim-1}, rounded to
    6 dp) — scalar columns, not array<float>, so downstream hash/canonical
    comparators (and plain SQL consumers) handle the rows directly."""
    from .partitioning import ensure_min_partitions

    # decode + histogram run in the scan stage — widen a narrow input
    assets = ensure_min_partitions(assets)

    def gen(batches):
        for pdf in batches:
            feats = np.zeros((len(pdf), dim), dtype=np.float64)
            for i, (payload, kind) in enumerate(zip(pdf["payload"], pdf["kind"])):
                arr = FakeDecoder.decode(payload, kind).ravel()
                if arr.size == 0:
                    continue
                hist, _ = np.histogram(arr, bins=dim, range=(-1.0, 1.0))
                feats[i] = hist / max(arr.size, 1)
            out = {"asset_id": pdf["asset_id"], "kind": pdf["kind"]}
            for j in range(dim):
                # half-away-from-zero (SQL ROUND semantics), not np.round's
                # banker's rounding: exact halves like 3360/4096 = 0.8203125
                # must round the way the relational side does
                out[f"f_{j}"] = np.floor(feats[:, j] * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(out)

    schema = "asset_id long, kind string, " + ", ".join(f"f_{j} double" for j in range(dim))
    return assets.mapInPandas(gen, schema)


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
