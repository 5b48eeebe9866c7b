"""Micro-bench for the round-6 storage faces: the data-source writer
(``df.write.format("icelite")``) vs the native ``IceliteTable.append``
path at two sizes (does the Arrow-writer face keep up, and does either
degrade super-linearly?), plus batch changelog (CDC) read throughput
over a mixed append/upsert history.

Writes one JSON line; record lives at BENCH/storage_faces_r6.json.
Usage: python tools/storage_bench.py [rows_small] [rows_big]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hdstats_spark.icelite import IceliteTable  # noqa: E402
from hdstats_spark.icelite_source import register  # noqa: E402
from hdstats_spark.session import get_spark  # noqa: E402


def mkdf(spark, n):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 977).cast("double").alias("value"),
        F.concat(F.lit("d"), (F.col("id") % 16).cast("string")).alias("pt"),
    )


def bench_write(spark, scratch, n, face):
    root = os.path.join(scratch, f"w_{face}_{n}")
    df = mkdf(spark, n)
    df.count()  # warm the input plan
    t0 = time.time()
    if face == "datasource":
        df.write.format("icelite").mode("append").option("partition_col", "pt").save(root)
    elif face == "native_direct":
        IceliteTable(root).append(df, partition_col="pt", cluster="direct")
    else:
        IceliteTable(root).append(df, partition_col="pt", cluster="asis")
    dt = time.time() - t0
    t = IceliteTable(root)
    assert t.rows() == n
    return {"rows": n, "sec": round(dt, 2), "rows_per_sec": int(n / dt)}


def bench_cdc(spark, scratch, n, commits=8):
    root = os.path.join(scratch, f"cdc_{n}")
    t = IceliteTable(root)
    s1 = t.append(mkdf(spark, n), partition_col="pt", cluster="asis")
    per = max(n // (commits * 4), 1)
    for i in range(commits):
        batch = mkdf(spark, n).filter(F.col("event_id") % (commits * 4) == i).select(
            "event_id", (-F.col("value")).alias("value"), "pt"
        )
        t.upsert(batch, key_cols=["event_id"], partition_col="pt", cluster="asis")
    t0 = time.time()
    ch = t.changes_between(spark, s1.snapshot_id)
    out = ch.groupBy("_change_type").count().collect()
    dt = time.time() - t0
    rows = {r["_change_type"]: r["count"] for r in out}
    total = sum(rows.values())
    return {
        "base_rows": n,
        "upsert_commits": commits,
        "changelog_rows": rows,
        "sec": round(dt, 2),
        "changelog_rows_per_sec": int(total / dt),
    }


def main():
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    spark = get_spark()
    register(spark)
    scratch = tempfile.mkdtemp(prefix="storage_bench_")
    try:
        # throwaway warmup: the first Spark write pays JVM/Arrow/codegen
        # startup (~4 s) that would otherwise distort the small-size number
        bench_write(spark, scratch, 100_000, "datasource")
        bench_write(spark, scratch, 100_000, "native")
        res = {
            "write_datasource": [bench_write(spark, scratch, n, "datasource") for n in (small, big)],
            "write_native": [bench_write(spark, scratch, n, "native") for n in (small, big)],
            "write_native_direct": [bench_write(spark, scratch, n, "native_direct") for n in (small, big)],
            "cdc_read": bench_cdc(spark, scratch, small),
        }
        for k in ("write_datasource", "write_native", "write_native_direct"):
            a, b = res[k]
            res[k + "_scale_ratio"] = round((b["sec"] / a["sec"]) / (b["rows"] / a["rows"]), 3)
        print(json.dumps(res))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
