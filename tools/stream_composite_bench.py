"""Steady-state cost of the STREAMING flagship composite at scale (r6
verdict item 7): replay a deterministic transcript corpus through
run_stream_to_icelite(composite=True) as B micro-batches, record per-batch
durations + throughput, and verify streamed ≡ batch at the end.

The composite re-roll is the expensive streaming path by design (the
geometric median has no mergeable partial state, so each micro-batch
recomputes its touched hash buckets from full committed 1m history) —
this harness pins its points/sec so superlinear creep is caught per-round.

Usage: python tools/stream_composite_bench.py [--convs 20000] [--batches 8]
       [--out BENCH/stream_composite_r6.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORK = "/tmp/hdstats_stream_bench"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=20000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "stream_composite_r6.json"))
    args = ap.parse_args()

    import pandas as pd

    from hdstats_spark.datagen import gen_transcripts
    from hdstats_spark.icelite import IceliteTable
    from hdstats_spark.operators.series import geomedian_mads_flat
    from hdstats_spark.schema import CHANNELS
    from hdstats_spark.session import get_spark
    from hdstats_spark.streaming.stream import run_stream_to_icelite

    shutil.rmtree(WORK, ignore_errors=True)
    src = os.path.join(WORK, "arrivals")
    ckpt = os.path.join(WORK, "ckpt")
    root = os.path.join(WORK, "tier_1m")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="stream-composite-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    df = gen_transcripts(spark, n_convs=args.convs, seed=42)
    # time-ordered arrival files = realistic micro-batches (each covers a
    # contiguous slice of event time, so watermarks finalize monotonically)
    df.orderBy("ts").coalesce(args.batches).write.mode("overwrite").parquet(src)
    parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    base = time.time()
    for i, p in enumerate(parts):
        os.utime(p, (base + i, base + i))
    n_points = spark.read.parquet(src).count()

    t0 = time.time()
    q = run_stream_to_icelite(
        spark, src, ckpt, root, watermark="0 seconds",
        composite=True, composite_buckets=args.buckets,
    )
    try:
        deadline = time.time() + 3600
        while time.time() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()
    wall = time.time() - t0

    prog = [
        {
            "batch": p["batchId"],
            "rows": p["numInputRows"],
            "s": p["batchDuration"] / 1000.0,
        }
        for p in (json.loads(x.json if hasattr(x, "json") else x) for x in q.recentProgress)
        if p["numInputRows"] > 0
    ]
    steady = sorted(p["s"] for p in prog[1:]) if len(prog) > 1 else [wall]
    steady_median = steady[len(steady) // 2]

    # streamed ≡ batch (the correctness gate riding along with the bench)
    m1 = IceliteTable(root).read(spark).drop("day")
    got = (
        IceliteTable(root + "_gm").read(spark)
        .orderBy("conv_id").toPandas().reset_index(drop=True)
    )
    expect = (
        geomedian_mads_flat(m1, CHANNELS, maxiters=20)
        .orderBy("conv_id").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect[got.columns], check_dtype=False)

    out = {
        "metric": "stream_composite_pts_per_s",
        "value": round(n_points / wall, 1),
        "unit": "points/sec",
        "convs": args.convs,
        "points": n_points,
        "batches": len(prog),
        "composite_buckets": args.buckets,
        "stream_wall_s": round(wall, 2),
        "steady_state_batch_s": round(steady_median, 2),
        "per_batch": [{**p, "s": round(p["s"], 2)} for p in prog],
        "streamed_equals_batch": True,
        "cpus": cpus,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "per_batch"}))
    spark.stop()


if __name__ == "__main__":
    main()
