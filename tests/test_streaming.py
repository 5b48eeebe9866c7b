"""Streaming 1m tier: streamed buckets ≡ batch rollup for on-time data;
late-beyond-watermark turns are dropped from the append stream."""

import glob
import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hdstats_spark.operators.channels import channelize
from hdstats_spark.operators.rollup import rollup_raw
from hdstats_spark.schema import CHANNELS
from hdstats_spark.streaming.stream import run_stream_to_memory


def test_streaming_equals_batch(spark, transcripts, tmp_path):
    src = str(tmp_path / "arrivals")
    ckpt = str(tmp_path / "ckpt")
    # arrange arrivals in event-time order (files = micro-batches)
    ordered = transcripts.orderBy("ts")
    ordered.coalesce(4).write.mode("overwrite").parquet(src)
    # FileStreamSource processes files in MODIFICATION-TIME order, but the 4
    # part files are written in parallel with nondeterministic mtimes; a file
    # processed out of event-time order would have all rows dropped as late
    # under watermark '0 seconds'.  Pin strictly increasing mtimes in
    # part-index (= event-time) order.
    parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    base = time.time()
    for i, p in enumerate(parts):
        os.utime(p, (base + i, base + i))

    q = run_stream_to_memory(spark, src, ckpt, name="t1m_stream", watermark="0 seconds")
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()

    got = spark.table("t1m_stream").toPandas()
    expect = rollup_raw(channelize(transcripts), "1m").toPandas()
    # append mode only emits windows whose watermark has passed; with
    # watermark 0s everything before the max event time is final
    max_ts = transcripts.agg(F.max("ts")).collect()[0][0]
    expect = expect[expect.bucket + pd.Timedelta(minutes=1) <= max_ts]
    got = got[got.bucket + pd.Timedelta(minutes=1) <= max_ts]

    a = got.sort_values(["conv_id", "bucket"]).reset_index(drop=True)
    b = expect.sort_values(["conv_id", "bucket"]).reset_index(drop=True)
    b = b[a.columns]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_streaming_to_icelite_commits(spark, transcripts, tmp_path):
    """foreachBatch → icelite: streamed finalized buckets land as per-micro-
    batch snapshot commits with lineage, and equal the batch rollup."""
    from hdstats_spark.icelite import IceliteTable
    from hdstats_spark.streaming.stream import run_stream_to_icelite

    src = str(tmp_path / "arrivals_ice")
    ckpt = str(tmp_path / "ckpt_ice")
    root = str(tmp_path / "tier_1m_stream")
    transcripts.orderBy("ts").coalesce(4).write.mode("overwrite").parquet(src)
    parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    base = time.time()
    for i, p in enumerate(parts):
        os.utime(p, (base + i, base + i))

    q = run_stream_to_icelite(spark, src, ckpt, root, watermark="0 seconds")
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()

    tbl = IceliteTable(root)
    snaps = tbl.snapshots()
    assert snaps and all("micro_batch" in s.lineage for s in snaps)
    got = tbl.read(spark).drop("day").toPandas()
    expect = rollup_raw(channelize(transcripts), "1m").toPandas()
    max_ts = transcripts.agg(F.max("ts")).collect()[0][0]
    expect = expect[expect.bucket + pd.Timedelta(minutes=1) <= max_ts]
    got = got[got.bucket + pd.Timedelta(minutes=1) <= max_ts]
    a = got.sort_values(["conv_id", "bucket"]).reset_index(drop=True)
    b = expect.sort_values(["conv_id", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False)


def test_streaming_gapfill_equals_batch_locf(spark, transcripts, tmp_path):
    """Stateful online gap-fill (applyInPandasWithState) ≡ batch densify+locf:
    the causal half of the reference's completion, computed incrementally."""
    from hdstats_spark.operators.gapfill import densify, locf
    from hdstats_spark.streaming.stream import streaming_gapfill

    tier = rollup_raw(channelize(transcripts), "1m").cache()
    src = str(tmp_path / "tier_arrivals")
    ckpt = str(tmp_path / "gf_ckpt")
    tier.orderBy("bucket").coalesce(4).write.mode("overwrite").parquet(src)
    parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    base = time.time()
    for i, p in enumerate(parts):
        os.utime(p, (base + i, base + i))

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_gapfill(stream, CHANNELS, step_seconds=60)
    q = (
        out.writeStream.format("memory")
        .queryName("gf_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()

    got = (
        spark.table("gf_stream")
        .toPandas()
        .sort_values(["conv_id", "bucket"])
        .reset_index(drop=True)
    )
    expect = (
        locf(densify(tier, "1m", CHANNELS), "bucket", CHANNELS)
        .drop("t")
        .toPandas()
        .sort_values(["conv_id", "bucket"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expect), (len(got), len(expect))
    assert (got.conv_id.values == expect.conv_id.values).all()
    assert (got.bucket.values == expect.bucket.values).all()
    for c in CHANNELS:
        pd.testing.assert_series_equal(
            got[c].astype("float64"), expect[c].astype("float64"), check_names=False
        )
    # gap rows are flagged and carry the previous observation
    assert (got.is_gap.isin([0, 1])).all() and got.is_gap.sum() > 0
