"""Merge-on-read upsert vs copy-on-write: commit cost + read overhead.

The r6 MOR surface (IceliteTable.upsert / delete_by_keys) exists so a keyed
update batch costs O(batch) at commit time instead of rewriting every file
that contains an updated key.  This harness pins the tradeoff with numbers:

  - mor_upsert_s      one upsert() commit (new data files + key files)
  - cow_merge_s       the pre-MOR equivalent: read affected partitions,
                      anti-join the batch keys, union, overwrite_partitions
  - read_pending_s    full-scan aggregate WITH the delete backlog pending
                      (broadcast anti-join path)
  - compact_s         materializing the backlog (all partitions)
  - read_compacted_s  the same aggregate on the zero-join fast path
  - checksum match    MOR table content ≡ COW table content (xxhash64 sum)

At 100 TB the COW side scales with table size (every partition holds some
updated key), the MOR side with batch size — the measured gap at bench
scale is the floor of the real one.

Usage: python tools/upsert_bench.py [--rows 4000000] [--days 8]
       [--batch 40000] [--out BENCH/upsert_mor_r6.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORK = "/tmp/hdstats_upsert_bench"


def checksum(df):
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    return df.select(
        # decimal sum: 4M xxhash64 longs overflow a bigint sum under ANSI
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--days", type=int, default=8)
    ap.add_argument("--batch", type=int, default=40_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "upsert_mor_r6.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hdstats_spark.icelite import IceliteTable
    from hdstats_spark.session import get_spark

    shutil.rmtree(WORK, ignore_errors=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="upsert-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # keyed base table: k uniquely identifies a row; keys interleave across
    # days so an update batch touches EVERY partition (COW's worst case and
    # the realistic shape of a conv-keyed tier table)
    base = (
        spark.range(args.rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2654435761 % 1000003).cast("double").alias("v"),
            F.concat(F.lit("d"), (F.col("id") % args.days).cast("string")).alias("day"),
        )
    )
    step = max(1, args.rows // args.batch)
    batch = (
        spark.range(0, args.rows, step)
        .select(
            F.col("id").alias("k"),
            F.lit(-1.0).alias("v"),
            F.concat(F.lit("d"), (F.col("id") % args.days).cast("string")).alias("day"),
        )
    )
    batch.cache().count()

    mor = IceliteTable(os.path.join(WORK, "mor"))
    cow = IceliteTable(os.path.join(WORK, "cow"))
    for t in (mor, cow):
        t.append(base, partition_col="day", cluster="bypart")

    t0 = time.time()
    mor.upsert(batch, key_cols=["k"], partition_col="day", cluster="bypart")
    mor_upsert_s = time.time() - t0

    # pre-MOR equivalent: rewrite every affected partition
    t0 = time.time()
    cur = cow.read(spark)
    # read() strips the partition col; rebuild it from k (same formula)
    merged = (
        cur.join(F.broadcast(batch.select("k")), on="k", how="left_anti")
        .unionByName(batch.drop("day"))
        .withColumn(
            "day", F.concat(F.lit("d"), (F.col("k") % args.days).cast("string"))
        )
    )
    cow.overwrite_partitions(merged, partition_col="day", cluster="bypart")
    cow_merge_s = time.time() - t0

    t0 = time.time()
    pending = checksum(mor.read(spark))
    read_pending_s = time.time() - t0

    t0 = time.time()
    for d in range(args.days):
        mor.compact_partition(spark, "day", f"d{d}")
    compact_s = time.time() - t0
    assert mor.pending_deletes() == {}

    t0 = time.time()
    compacted = checksum(mor.read(spark))
    read_compacted_s = time.time() - t0

    cow_sum = checksum(cow.read(spark))
    ok = (
        pending["h"] == compacted["h"] == cow_sum["h"]
        and pending["n"] == compacted["n"] == cow_sum["n"] == args.rows
    )

    rec = {
        "metric": "upsert_mor_vs_cow",
        "rows": args.rows,
        "days": args.days,
        "batch_keys": int(batch.count()),
        "cpus": cpus,
        "mor_upsert_s": round(mor_upsert_s, 2),
        "cow_merge_s": round(cow_merge_s, 2),
        "commit_speedup": round(cow_merge_s / mor_upsert_s, 2),
        "read_pending_s": round(read_pending_s, 2),
        "read_compacted_s": round(read_compacted_s, 2),
        "read_overhead_x": round(read_pending_s / max(read_compacted_s, 1e-9), 2),
        "compact_s": round(compact_s, 2),
        "content_match": bool(ok),
    }
    print(json.dumps(rec))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)
    if not ok:
        sys.exit("CONTENT MISMATCH: MOR pending / compacted / COW disagree")


if __name__ == "__main__":
    main()
